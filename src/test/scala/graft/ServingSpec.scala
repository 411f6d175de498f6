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

  test("cumulated: prefix sums are exact across partition boundaries; ties break on the key") {
    import spark.implicits._
    // Hand case with a tie: values 5, 3(a), 3(b), 2 → cums 5, 8, 11, 13.
    val small = Serving.cumulated(
        Seq(("b", 3.0), ("a", 3.0), ("c", 5.0), ("d", 2.0)).toDF("k", "v"),
        "v", "k")
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getDouble(3)))
    assert(small.toSeq === Seq(("c", 1L, 5.0), ("a", 2L, 8.0),
      ("b", 3L, 11.0), ("d", 4L, 13.0)))
    // 500 distinct values across many range partitions: the two-pass
    // offset fold must agree with the closed form k(k+1)/2 at EVERY row
    // (an off-by-one partition offset breaks a contiguous span).
    val big = Serving.cumulated(
        (1 to 500).map(i => (i.toLong, i.toDouble)).toDF("k", "v"),
        "v", "k")
      .collect().map(r => (r.getLong(2), r.getDouble(3))).sortBy(_._1)
    big.foreach { case (rank, cum) =>
      val topV = 500 - rank + 1 // rank 1 is the largest value
      val want = (500L * 501 / 2) - (topV - 1) * topV / 2
      assert(cum === want.toDouble, s"rank $rank")
    }
  }

  test("cumulated: a scaled decimal grid folds bit-identically to a sequential Long fold (the j59 contract)") {
    import spark.implicits._
    // IEEE-nasty 4-dp values (0.1-style non-representable decimals): raw
    // double prefix sums differ across associations in the last ulp, but
    // scaled to 1e-4 grid units they are integer-valued doubles, which
    // add exactly in ANY association — so the distributed two-pass fold
    // must equal a driver-side sequential Long fold bit-for-bit, at
    // every rank, regardless of how range partitioning splits the frame.
    val vals = (1 to 300).map(i => ((i * 7919 % 1000) + i / 10.0 + 0.1))
      .map(v => math.rint(v * 10000) / 10000) // snap to the 4-dp grid
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("k", "v")
      .withColumn("vu", round(col("v") * 10000, 0))
    val got = Serving.cumulated(df, "vu", "k")
      .select(col("k"), col("vu"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // Sequential exact fold in rank order (vu DESC, k ASC) on Longs.
    val seq = got.map { case (k, vu, _) => (k, vu) }
      .sortBy { case (k, vu) => (-vu, k) }
    var acc = 0L
    val want = seq.map { case (k, vu) => acc += vu.toLong; (k, acc) }.toMap
    got.foreach { case (k, _, cum) =>
      assert(cum === want(k).toDouble, s"key $k")
    }
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

  test("rollingFeatures: trailing frames per key, no future leakage, ties aggregate together, one Exchange") {
    import spark.implicits._
    val ev = Seq(
      (1L, "u1", 0L, 1.0), (2L, "u1", 10L, 2.0), (3L, "u1", 100L, 4.0),
      (4L, "u2", 10L, 8.0), (5L, "u2", 10L, 16.0)) // u2: tied event times
      .toDF("event_id", "k", "ts", "v")
    val out = Serving.rollingFeatures(ev, "k", "ts", "v", Seq(("s", 50L)))
      .orderBy($"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 1.0),   // nothing before t=0
      (2L, 2L, 3.0),   // t=10 sees t=0 (frame [-39, 10])
      (3L, 1L, 4.0),   // t=100: t=10 is outside [51, 100] — no future, no stale
      (4L, 2L, 24.0),  // tied ts: the whole tie group aggregates together
      (5L, 2L, 24.0)))
    // All frames ride ONE key clustering: a two-span call still plans a
    // single Exchange (both Window nodes reuse the (k, ts) sort order).
    val plan = Serving.rollingFeatures(ev, "k", "ts", "v",
      Seq(("a", 50L), ("b", 20L))).queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, s"one Exchange:\n$plan")
  }

  test("medianAbsoluteDeviation: hand-computed; outlier moves mean-family stats but not MAD") {
    import spark.implicits._
    // Group a: 1..9 → median 5, |x-5| = 4,3,2,1,0,1,2,3,4 → MAD 2.
    // Group b: same but 9 replaced by 1000 — median 5 (discrete, ceil(4.5)=5th
    // of sorted 1..8,1000), MAD still 2: the outlier is invisible.
    val rows = (1 to 9).map(i => ("a", i.toDouble)) ++
      ((1 to 8).map(i => ("b", i.toDouble)) :+ (("b", 1000.0)))
    val out = Serving.medianAbsoluteDeviation(rows.toDF("g", "v"), Seq("g"), "v")
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 5.0, 2.0), ("b", 5.0, 2.0)))
  }

  test("weightedMedian: hand-computed under skewed weights; both windows share one Exchange") {
    import spark.implicits._
    // Group a: values 1,2,3 with weights 1,1,10 → half of 12 is 6, first
    // value whose running weight reaches 6 is 3 (weight dominates).
    // Group b: 10,20 with weights 1,1 → cum hits 1 >= 2/2=1 at 10 (lower
    // median). Group c: single row.
    val df = Seq(
      ("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 10.0),
      ("b", 10.0, 1.0), ("b", 20.0, 1.0),
      ("c", 7.0, 5.0)).toDF("g", "v", "w")
    val out = Serving.weightedMedian(df, Seq("g"), "v", "w")
      .orderBy($"g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq === Seq(("a", 3.0), ("b", 10.0), ("c", 7.0)))
    // Unweighted degenerates to the lower median.
    val unif = Seq(("u", 1.0, 1.0), ("u", 2.0, 1.0), ("u", 3.0, 1.0),
      ("u", 4.0, 1.0)).toDF("g", "v", "w")
    val med = Serving.weightedMedian(unif, Seq("g"), "v", "w").head().getDouble(1)
    assert(med === 2.0)
    // Plan: the cumsum window and the total window reuse one Exchange.
    val plan = Serving.weightedMedian(df, Seq("g"), "v", "w")
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 === 1, s"one Exchange:\n$plan")
  }

  test("keysetPage: resumes exactly after the cursor, ties split by id") {
    import spark.implicits._
    // Scores: 9,8,8,8,7 for ids 1..5. Cursor = (8, 3) — mid-tie: the
    // page must start at the REMAINING tied row (8, id 4), then 7.
    val df = Seq((1L, 9.0), (2L, 8.0), (3L, 8.0), (4L, 8.0), (5L, 7.0))
      .toDF("id", "score")
    val out = Serving.keysetPage(df, "score", "id", (8.0, 3L), 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((4L, 8.0), (5L, 7.0)))
    // Page size truncates.
    val one = Serving.keysetPage(df, "score", "id", (9.0, 1L), 1)
      .collect().map(_.getLong(0))
    assert(one.toSeq === Seq(2L))
  }

  test("dowHourProfile: cells land on the 1=Sunday convention and shares sum to 1") {
    import spark.implicits._
    // 2024-06-02 was a Sunday. Two events Sunday 05h, one Monday 23h.
    val ev = Seq("2024-06-02 05:10:00", "2024-06-02 05:50:00",
      "2024-06-03 23:00:00")
      .map(java.sql.Timestamp.valueOf).map(Tuple1(_)).toDF("ts")
    val out = Serving.dowHourProfile(ev, "ts")
      .orderBy($"dow", $"hod").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 5L, 2L, 0.666667), (2L, 23L, 1L,
      0.333333)))
  }

  test("rankMovers: the split is at the range midpoint and deltas track rank, not counts") {
    import spark.implicits._
    val ts = (m: Int) => new java.sql.Timestamp(60000L * m)
    // Range [0, 100] min → mid 50. First half: a×3, b×1 (a rank 1).
    // Second half: a×1, b×2 (b rank 1). a falls 1→2 (delta −1), b rises
    // 2→1 (delta +1). The boundary event at exactly mid counts as PREV.
    val ev = Seq(("a", 0), ("a", 10), ("a", 50), ("b", 20),
      ("a", 60), ("b", 70), ("b", 100))
      .map { case (k, m) => (k, ts(m)) }.toDF("k", "ts")
    val out = Serving.rankMovers(ev, "k", "ts")
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(("a", 3L, 1L, 1L, 2L, -1L),
      ("b", 1L, 2L, 2L, 1L, 1L)))
  }

  test("rfmSegments: five spread customers land in five distinct quintile cells") {
    import spark.implicits._
    // Customer i: last order 10·i days before the anchor, i orders of
    // 100 each — recency scores run 5..1 while frequency and monetary
    // run 1..5 together, each customer alone in its segment cell.
    val day0 = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
    def daysAgo(d: Int) = new java.sql.Timestamp(day0.getTime - d * 86400000L)
    val orders = (1 to 5).flatMap { i =>
      (1 to i).map(_ => (i.toLong, daysAgo(10 * i), 100.0))
    }.toDF("cust", "dt", "price")
    val out = Serving.rfmSegments(orders, "cust", "dt", "price")
      .orderBy($"r_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 5L, 5L, 1L, 500.0), (2L, 4L, 4L, 1L, 400.0),
      (3L, 3L, 3L, 1L, 300.0), (4L, 2L, 2L, 1L, 200.0),
      (5L, 1L, 1L, 1L, 100.0)))
  }
}
