package graft

import org.apache.spark.sql.functions._
import graft.operators.Overlap

/** Sweep-line concurrency (operators/Overlap.scala): the step function must
  * match a hand-computed fixture including boundary ties, carry correctly
  * across the coarse carry-in buckets, and be partitioning-independent. */
class OverlapSpec extends SparkSpec {

  test("concurrency: hand-computed step function with ties and bucket-crossing intervals") {
    import spark.implicits._
    val day = 86400000L
    // Intervals (epoch ms): two overlapping on day 0, one starting exactly
    // where another ends (net 0 at that ts), one spanning days 0→2 so
    // days 1 and 2 depend on carry-in, one entirely on day 2.
    val iv = Seq(
      (100L, 500L),
      (200L, 500L),            // ends tie with the first
      (500L, 900L),            // start ties with two ends: net -1 at 500
      (800L, 2 * day + 100L),  // spans two bucket boundaries
      (2 * day + 50L, 2 * day + 600L)
    ).toDF("s", "e")
    val got = Overlap.concurrency(iv, "s", "e")
      .orderBy(col("t")).as[(Long, Long)].collect().toSeq
    val want = Seq(
      (100L, 1L), (200L, 2L), (500L, 1L), (800L, 2L), (900L, 1L),
      (2 * day + 50L, 2L), (2 * day + 100L, 1L), (2 * day + 600L, 0L))
    assert(got === want)
    // Partitioning independence (carry-ins recomputed from any layout).
    val got13 = Overlap.concurrency(iv.repartition(13), "s", "e")
      .orderBy(col("t")).as[(Long, Long)].collect().toSeq
    assert(got13 === want)
    // Tiny buckets force MANY carry-ins — same curve.
    val gotSmall = Overlap.concurrency(iv, "s", "e", bucketMs = 100L)
      .orderBy(col("t")).as[(Long, Long)].collect().toSeq
    assert(gotSmall === want)
  }

  test("concurrency: curve ends at zero and peaks at the true max overlap") {
    import spark.implicits._
    // 50 random-ish but deterministic intervals.
    val iv = (1 to 50).map { i =>
      val s = (i * 137L) % 1000L
      (s, s + 50L + (i % 7) * 100L)
    }.toDF("s", "e")
    val curve = Overlap.concurrency(iv, "s", "e")
      .orderBy(col("t")).as[(Long, Long)].collect()
    assert(curve.last._2 === 0L, "all intervals eventually close")
    val ivs = iv.as[(Long, Long)].collect()
    // Ground-truth max concurrency by brute force at every boundary.
    val truthMax = ivs.flatMap(x => Seq(x._1, x._2)).distinct.map { t =>
      ivs.count(x => x._1 <= t && t < x._2)
    }.max
    assert(curve.map(_._2).max === truthMax.toLong)
  }

  test("coveredTime: overlaps collapse, gaps drop, keys are independent") {
    import graft.operators.Overlap
    import spark.implicits._
    // Key a: [0,10) ∪ [5,15) = [0,15) → 15; plus disjoint [20,25) → 5;
    // total 20. Key b: nested [0,100) ⊇ [10,20) → 100.
    val iv = Seq(("a", 0L, 10L), ("a", 5L, 15L), ("a", 20L, 25L),
      ("b", 0L, 100L), ("b", 10L, 20L)).toDF("k", "s", "e")
    val out = Overlap.coveredTime(iv, Seq("k"), "s", "e")
      .collect().map(r => r.getString(0) -> r.getAs[Long]("covered_ms")).toMap
    assert(out("a") === 20L)
    assert(out("b") === 100L)
  }

  test("coveredTime: touching intervals merge without double counting the boundary") {
    import graft.operators.Overlap
    import spark.implicits._
    // [0,10) and [10,20) touch at 10: union = [0,20) → 20 exactly.
    val iv = Seq(("k", 0L, 10L), ("k", 10L, 20L)).toDF("k", "s", "e")
    val out = Overlap.coveredTime(iv, Seq("k"), "s", "e").collect().head
    assert(out.getAs[Long]("covered_ms") === 20L)
  }
}
