package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only decomposition probe for j49-shaped lineitem aggregates:
  * times the scan, the rebalance, and the aggregate separately so the
  * dominant term is measured, not guessed (guide §1.1). */
object ProbeJ49 {
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
    def t(name: String)(df: => org.apache.spark.sql.DataFrame): Unit =
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    val raw = spark.read.parquet(s"$dir/lineitem.parquet")
    t("scan_raw")(raw)
    t("scan_5cols")(raw.select("l_returnflag", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax"))
    t("scan_repart")(Tables.lineitem(spark, dir))
    t("agg_raw")(raw
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col("l_quantity")), 2).as("q")))
    t("agg_repart")(Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(sum(col("l_quantity")), 2).as("q")))
    t("j49_full")(SparkEntry.queries("j49_unpivot")(spark, dir))
    spark.stop()
  }
}
