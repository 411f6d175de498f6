package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the test suite. One session per JVM
  * (tests fork once); small shuffle-partition count keeps tiny-fixture
  * jobs fast. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def sortedRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map(v => if (v == null) "" else v.toString))
      .sortBy(_.mkString("|")).toSeq

  def assertSameRows(a: DataFrame, b: DataFrame): Unit = {
    assert(a.columns.sorted.toSeq === b.columns.sorted.toSeq)
    val cols = a.columns.sorted.map(org.apache.spark.sql.functions.col).toSeq
    assert(sortedRows(a.select(cols: _*)) === sortedRows(b.select(cols: _*)))
  }

  /** Simulate a crash between a sink's write and the streaming checkpoint
    * commit: delete the newest batch-commit file so a restart replays that
    * micro-batch (foreachBatch's at-least-once contract made concrete). */
  def rollbackLastCommit(ckptDir: String): Unit = {
    val commits = java.nio.file.Paths.get(ckptDir, "commits")
    val listing = java.nio.file.Files.list(commits)
    try {
      var last: java.nio.file.Path = null
      var lastId = -1L
      val it = listing.iterator()
      while (it.hasNext) {
        val p = it.next()
        val n = p.getFileName.toString
        if (n.forall(_.isDigit) && n.toLong > lastId) { lastId = n.toLong; last = p }
      }
      assert(last != null, s"no batch commits under $commits")
      java.nio.file.Files.delete(last)
      // The local ChecksumFs keeps a `.<name>.crc` sibling; leaving it
      // behind fails the re-commit rename on restart.
      java.nio.file.Files.deleteIfExists(
        last.resolveSibling("." + last.getFileName.toString + ".crc"))
    } finally listing.close()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
