package graft

import org.apache.spark.sql.functions._
import graft.queries.Serving

/** Serving-layer pins that need no oracle: the reliable-checkpoint escape
  * hatch for [[Serving.ranked]] (cluster fault tolerance — the
  * localCheckpoint caveat from round 3). */
class ServingSpec extends SparkSpec {

  private def board = {
    import spark.implicits._
    Seq(("u3", 30L), ("u1", 50L), ("u2", 30L), ("u4", 10L))
      .toDF("username", "messages")
  }

  private val expected = Seq(
    Seq("u1", 50L, 1L), Seq("u2", 30L, 2L), Seq("u3", 30L, 3L),
    Seq("u4", 10L, 4L))

  test("ranked assigns dense global ranks (metric DESC, key ASC)") {
    val r = Serving.ranked(board, "messages", "username")
      .orderBy(col("rank"))
    assert(r.collect().map(_.toSeq).toSeq === expected)
  }

  test("ranked with spark.graft.reliableCheckpoint=true uses a reliable checkpoint") {
    val ckptDir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    spark.sparkContext.setCheckpointDir(ckptDir)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      val r = Serving.ranked(board, "messages", "username").orderBy(col("rank"))
      assert(r.collect().map(_.toSeq).toSeq === expected)
      // The reliable checkpoint actually wrote recoverable blocks to the
      // checkpoint dir (that is what survives an executor loss).
      def hasFiles(d: java.io.File): Boolean = {
        val kids = Option(d.listFiles()).getOrElse(Array.empty)
        kids.exists(_.isFile) || kids.exists(hasFiles)
      }
      assert(hasFiles(new java.io.File(ckptDir)),
        "reliable checkpoint must persist blocks under the checkpoint dir")
    } finally spark.conf.unset("spark.graft.reliableCheckpoint")
  }
}
