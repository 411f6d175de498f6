package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profile of the x157 incremental-cluster fold (r11
  * verdict ask #5: where do its ~9 s go?). Times each batch's
  * incrementalNearDup (forced with a count-fence) separately from the
  * mergeComponents fold and the final labeling, on the same sf0.1 input
  * and scratch layout the bench uses. Test scope. */
object ProfileX157 {
  private def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 2).foreach { round =>
      println(s"[profile] === pass $round (pass 2 is the warm read) ===")
      val idx = graft.Scratch.dir(s"profx157-$round").toString
      val docs = graft.Tables.documents(spark, dir)
      val empty = docs
        .select(col("doc_id").as("node"), col("doc_id").as("label"))
        .limit(0)
      var labels = empty
      (0 until 3).foreach { b =>
        val pairs = t(s"batch$b incrementalNearDup(+index append)") {
          val p = operators.Dedup.incrementalNearDup(
            docs.where(col("doc_id") % 3 === b),
            "doc_id", "text", 3, 0.8, idx + "/index")
          p.count() // pairs are eagerly checkpointed inside; count is a fence
          p
        }
        labels = t(s"batch$b mergeComponents") {
          val l = operators.Dedup.mergeComponents(labels, pairs,
            "id_a", "id_b").localCheckpoint(eager = true)
          l.count()
          l
        }
      }
      t("labelClusters + noop write") {
        operators.Dedup.labelClusters(docs, labels, "doc_id")
          .orderBy(col("doc_id"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
