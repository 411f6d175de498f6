package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf0.1 runtime pin for the heavy dedup family (VERDICT r6 ask #5) —
  * catches an ALGORITHMIC regression (lost prefix filter, lost exact-dup
  * collapse, lost localCheckpoint) in a dev run before the driver bench
  * sees it. Test scope, `Test/runMain graft.BenchGuard` — minutes at
  * sf0.1, so not part of the sbt test suite; run it after touching
  * Dedup.scala.
  *
  * Budget: 2× the frozen per-query min from BASELINE_local.json —
  * loose enough that contention cannot double a min-of-3 on a warm JVM,
  * tight enough that an algorithmic loss lands outside it (the built-in
  * negative probe demonstrates this every run by timing a deliberately
  * unpruned x6 twin against the same budget: measured 2.3× the pruned
  * runtime at sf0.1, versus ≤1.2× run-to-run noise on mins).
  * Exit 1 on any pinned query over budget or if the negative probe fails
  * to fire. */
object BenchGuard {

  val Heavy = Seq("x2_near_dedup", "x6_ngram_jaccard",
    "x25b_neardup_clusters_star", "x38_incremental_neardup",
    "x41_overlap_dedup")

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
    val baseline = Bench.loadBaseline(Bench.repoRoot.resolve("BASELINE_local.json"))
    require(Heavy.forall(baseline.contains),
      s"BASELINE_local.json must carry frozen mins for ${Heavy.mkString(", ")}")

    def timeNoop(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    var failed = List.empty[String]
    Heavy.foreach { name =>
      val fn = SparkEntry.queries(name)
      timeNoop(fn(spark, dir)) // warmup
      val t = (1 to 3).map(_ => timeNoop(fn(spark, dir))).min
      val budget = baseline(name) * 2
      val ok = t <= budget
      println(f"[benchguard] $name: min-of-3 $t%.2f s, budget $budget%.2f s -> ${if (ok) "PASS" else "FAIL"}")
      if (!ok) failed ::= name
    }

    // Negative probe: the UNPRUNED x6 twin — full inverted index (no
    // exact-dup collapse, no prefix cut, no size filter), same exact
    // verification. If this stays under x6's budget the guard has no
    // teeth (budget too loose or fixture too small) and the run fails.
    val unprunedT = timeNoop {
      val shingled = graft.operators.Dedup.shingles(
        Tables.documents(spark, dir), "doc_id", "text", 3)
        .localCheckpoint(eager = false)
      val cand = shingled.select(col("shingle"), col("doc_id").as("id_a"))
        .join(shingled.select(col("shingle"), col("doc_id").as("id_b")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val sets = shingled.groupBy(col("doc_id"))
        .agg(collect_set(col("shingle")).as("sset"))
      cand
        .join(sets.select(col("doc_id").as("id_a"), col("sset").as("set_a")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("sset").as("set_b")), Seq("id_b"))
        .withColumn("_i", size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard", col("_i").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("_i")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
    }
    val x6Budget = baseline("x6_ngram_jaccard") * 2
    val fired = unprunedT > x6Budget
    println(f"[benchguard] negative probe (unpruned x6): $unprunedT%.2f s vs budget $x6Budget%.2f s -> ${if (fired) "DETECTOR FIRES (good)" else "DETECTOR SILENT (bad)"}")
    if (!fired) failed ::= "negative_probe"

    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[benchguard] FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("[benchguard] all heavy-family runtimes within budget; detector verified")
  }
}
