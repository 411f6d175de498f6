package graft

import org.apache.spark.sql.SparkSession

/** Dev-only growth-ladder timer (r11 verdict ask #6): times the heavy
  * families at several scale points and records output row counts, so
  * the documented growth exponents can be asserted END-TO-END instead of
  * from a single sf0.1 reading plus synthetic probes. Protocol: one
  * fresh JVM per scale dir (run this main once per dir, exclusively),
  * warmup pass then min-of-2 warm, noop sink — the BenchOne discipline.
  * Usage: LadderBench <sfDir> <query> [<query>...] */
object LadderBench {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: LadderBench <sfDir> <query>...")
    val dir = args.head
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"[ladder] dir: $dir")
    args.tail.foreach { name =>
      val fn = SparkEntry.queries(name)
      val rows = fn(spark, dir).count()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[ladder] $name dir=$dir rows=$rows min=${times.min}%.2f s")
    }
    spark.stop()
  }
}
