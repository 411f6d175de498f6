package graft

import org.apache.spark.sql.SparkSession

/** Dev-only warm-run timer for a single registered query (mirrors Bench's
  * measurement: noop-format write, repeated in one session). Test scope —
  * not part of the driver contract. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    // Default matches graft.Bench (floors are frozen at sf0.1): the old
    // sf0.01 default silently timed the WRONG tier whenever the env var
    // was unset (r11 caught two interim freezes taken that way).
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    println(s"[benchone] sf dir: $dir")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        println(f"[benchone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
