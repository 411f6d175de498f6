package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("autocorrelation: a strictly alternating series has acf1 = -1, acf2 = 1") {
    import spark.implicits._
    val s = (0 until 10).map(i => ("k", i.toLong, if (i % 2 == 0) 10L else 20L))
      .toDF("key", "t", "n")
    val out = TimeSeries.autocorrelation(s, Seq("key"), "t", "n", 2)
      .collect().head
    assert(out.getAs[Double]("acf1") === -1.0)
    assert(out.getAs[Double]("acf2") === 1.0)
  }

  test("autocorrelation: partitions are independent per key") {
    import spark.implicits._
    val s = ((0 until 8).map(i => ("up", i.toLong, i.toLong)) ++
      (0 until 8).map(i => ("alt", i.toLong, if (i % 2 == 0) 1L else 5L)))
      .toDF("key", "t", "n")
    val out = TimeSeries.autocorrelation(s, Seq("key"), "t", "n", 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("acf1")).toMap
    assert(out("up") === 1.0)   // linear ramp: perfect lag-1 correlation
    assert(out("alt") === -1.0)
  }

  test("ewma: a constant series is its own EWMA at every point") {
    import spark.implicits._
    val s = (0 until 20).map(i => ("k", i.toLong, 7L)).toDF("key", "t", "n")
    val out = TimeSeries.ewma(s, Seq("key"), "t", "n", 0.3, 14)
      .select("ewma").collect().map(_.getDouble(0))
    // Renormalized truncated EWMA of a constant is exactly the constant,
    // including the first rows where the frame is shorter than the span.
    assert(out.forall(_ == 7.0))
  }

  test("ewma: hand-computed two-point frame") {
    import spark.implicits._
    // alpha .5, span 14; second row frame = [10, 20]:
    // (.5*.5*10 + .5*20) / (.5*.5 + .5) = 12.5 / .75 = 16.6667
    val s = Seq(("k", 0L, 10L), ("k", 1L, 20L)).toDF("key", "t", "n")
    val out = TimeSeries.ewma(s, Seq("key"), "t", "n", 0.5, 14)
      .orderBy(col("t")).select("ewma").collect().map(_.getDouble(0))
    assert(out(0) === 10.0)
    assert(out(1) === 16.6667)
  }

  test("interarrival: gaps are per (key, entity) and percentiles are exact") {
    import spark.implicits._
    // entity a: events at 0, 10, 30 → gaps 10, 20
    // entity b: events at 5, 105    → gap 100
    val e = Seq(("k", "a", 0L, 1L), ("k", "a", 10L, 2L), ("k", "a", 30L, 3L),
      ("k", "b", 5L, 4L), ("k", "b", 105L, 5L))
      .toDF("key", "ent", "ms", "eid")
    val out = TimeSeries.interarrivalStats(e, Seq("key"), "ent", "ms", "eid")
      .collect().head
    assert(out.getAs[Long]("n_gaps") === 3L)
    assert(out.getAs[Long]("min_ms") === 10L)
    assert(out.getAs[Long]("p50_ms") === 20L)  // exact interpolated median of {10,20,100}
    assert(out.getAs[Long]("max_ms") === 100L)
  }

  test("seasonalDecompose: pure weekly pattern is fully explained (residual 0)") {
    import spark.implicits._
    // value depends ONLY on day-of-week: trend = weekly mean (constant),
    // seasonal absorbs the phase offsets, residual must be exactly 0 on
    // every row that has a full centered window.
    val pattern = Seq(10.0, 20.0, 30.0, 40.0, 30.0, 20.0, 10.0) // sums to 160
    val s = (0 until 28).map(i =>
      ("k", i.toLong * 86400000L, pattern(i % 7))).toDF("key", "t", "n")
    val out = TimeSeries.seasonalDecompose(s, Seq("key"), "t", "n", 7)
      .where(col("trend").isNotNull).collect()
    assert(out.length === 22) // 28 minus 3 edge days each side
    assert(out.forall(_.getAs[Double]("residual") == 0.0))
    val mean4dp = 22.8571 // round(160/7, 4) — the operator's 4 dp grain
    assert(out.forall(r => r.getAs[Double]("trend") == mean4dp))
  }

  test("cusumChangepoint: locates a planted level shift") {
    import spark.implicits._
    // 10 days at 10, then 10 days at 50: |CUSUM| peaks at the last
    // low-level day (index 9) — the classic single-change signature.
    val s = (0 until 20).map(i =>
      ("k", i.toLong * 86400000L, if (i < 10) 10L else 50L)).toDF("key", "t", "n")
    val out = TimeSeries.cusumChangepoint(s, Seq("key"), "t", "n").collect().head
    assert(out.getAs[Long]("change_point") === 9L * 86400000L)
    assert(out.getAs[Double]("max_cusum") < 0.0) // low-side excursion
  }

  test("ksDistance: identical samples give 0, disjoint supports give 1") {
    import spark.implicits._
    val same = ((1 to 50).map(i => ("k", i.toDouble, 0)) ++
      (1 to 50).map(i => ("k", i.toDouble, 1))).toDF("key", "v", "side")
    assert(TimeSeries.ksDistance(same, Seq("key"), "v", "side")
      .collect().head.getAs[Double]("ks_d") === 0.0)
    val disjoint = ((1 to 50).map(i => ("k", i.toDouble, 0)) ++
      (1 to 50).map(i => ("k", 100.0 + i, 1))).toDF("key", "v", "side")
    assert(TimeSeries.ksDistance(disjoint, Seq("key"), "v", "side")
      .collect().head.getAs[Double]("ks_d") === 1.0)
  }

  test("ksDistance: tied values resolve peer-inclusively (order-independent)") {
    import spark.implicits._
    // All mass on the SAME value on both sides: any row-order-dependent
    // ecdf would see a spurious mid-tie gap; the RANGE frame must not.
    val tied = (Seq.fill(10)(("k", 5.0, 0)) ++ Seq.fill(10)(("k", 5.0, 1)))
      .toDF("key", "v", "side")
    assert(TimeSeries.ksDistance(tied, Seq("key"), "v", "side")
      .collect().head.getAs[Double]("ks_d") === 0.0)
  }

  test("mannWhitney: hand-computed U and tie-corrected z; identical sides read z = 0") {
    import spark.implicits._
    // side0 {1,3}, side1 {2,3}: ranks 1, 2, {3,4}->3.5 avg; R1 = 2 + 3.5
    // = 5.5, U1 = 5.5 - 3 = 2.5; ties Σ(t³-t) = 6 (the value-3 block);
    // var = (4/12)·(5 - 6/12) = 1.5; z = 0.5/√1.5 = 0.408248.
    val g = Seq(("k", 1.0, 0), ("k", 3.0, 0), ("k", 2.0, 1), ("k", 3.0, 1))
      .toDF("key", "v", "side")
    val out = TimeSeries.mannWhitney(g, Seq("key"), "v", "side")
      .collect().head
    assert((out.getLong(1), out.getLong(2), out.getDouble(3),
      out.getDouble(4)) === ((2L, 2L, 2.5, 0.408248)))
    // Identical distributions on both sides: U1 = n0·n1/2 exactly, z = 0.
    val same = Seq(("k", 1.0, 0), ("k", 2.0, 0), ("k", 1.0, 1),
      ("k", 2.0, 1)).toDF("key", "v", "side")
    val s = TimeSeries.mannWhitney(same, Seq("key"), "v", "side")
      .collect().head
    assert((s.getDouble(3), s.getDouble(4)) === ((2.0, 0.0)))
  }

  test("theilSen: median slope shrugs off the outlier OLS would chase; hand-computed intercept") {
    import spark.implicits._
    // Perfect slope-2 line with a wild last point: 6 of 10 pairwise
    // slopes are exactly 2, so the median IS 2 — the outlier moves only
    // the 4 pairs it touches. Intercepts y - 2x = (0,0,0,0,992),
    // median 0.
    val g = Seq(("k", 0L, 0.0), ("k", 1L, 2.0), ("k", 2L, 4.0),
      ("k", 3L, 6.0), ("k", 4L, 1000.0)).toDF("key", "x", "y")
    val out = TimeSeries.theilSen(g, Seq("key"), "x", "y").collect().head
    assert((out.getLong(1), out.getLong(2), out.getDouble(3),
      out.getDouble(4)) === ((5L, 10L, 2.0, 0.0)))
    // Even pair count interpolates the two middle slopes: (0,0),(1,1),
    // (2,4) -> slopes 1,2,3, median 2; intercepts (0,-1,0) -> median 0.
    val h = Seq(("k", 0L, 0.0), ("k", 1L, 1.0), ("k", 2L, 4.0))
      .toDF("key", "x", "y")
    val o2 = TimeSeries.theilSen(h, Seq("key"), "x", "y").collect().head
    assert((o2.getDouble(3), o2.getDouble(4)) === ((2.0, 0.0)))
  }

  test("kruskalWallis: hand-computed H with and without ties; identical cohorts read exactly 0") {
    import spark.implicits._
    // a={1,2}, b={3,4}: ranks 1..4, R_a=3, R_b=7; H = 12/20·(9/2+49/2)
    // − 15 = 2.4; no ties so the corrected value is identical.
    val clean = Seq(("k", 1.0, "a"), ("k", 2.0, "a"), ("k", 3.0, "b"),
      ("k", 4.0, "b")).toDF("key", "v", "g")
    val c = TimeSeries.kruskalWallis(clean, Seq("key"), "v", "g")
      .collect().head
    assert((c.getLong(1), c.getLong(2), c.getDouble(3), c.getDouble(4))
      === ((2L, 4L, 2.4, 2.4)))
    // a={1,3}, b={3,5}: pooled ranks 1, 2.5, 2.5, 4 → R_a=3.5, R_b=6.5;
    // H = 0.6·27.25 − 15 = 1.35; tie block t=2 → correction
    // 1 − 6/60 = 0.9 → H' = 1.5.
    val tied = Seq(("k", 1.0, "a"), ("k", 3.0, "a"), ("k", 3.0, "b"),
      ("k", 5.0, "b")).toDF("key", "v", "g")
    val t = TimeSeries.kruskalWallis(tied, Seq("key"), "v", "g")
      .collect().head
    assert((t.getDouble(3), t.getDouble(4)) === ((1.35, 1.5)))
    // Three identical cohorts: every R_g equal → H exactly 0 even under
    // heavy ties (the correction divides a true zero).
    val same = Seq("a", "b", "c").flatMap(g =>
      Seq(("k", 1.0, g), ("k", 2.0, g))).toDF("key", "v", "g")
    val s = TimeSeries.kruskalWallis(same, Seq("key"), "v", "g")
      .collect().head
    assert((s.getLong(1), s.getDouble(3), s.getDouble(4)) ===
      ((3L, 0.0, 0.0)))
  }

  test("interarrival: simultaneous events tie-break on the id column") {
    import spark.implicits._
    val e = Seq(("k", "a", 10L, 2L), ("k", "a", 10L, 1L), ("k", "a", 25L, 3L))
      .toDF("key", "ent", "ms", "eid")
    val out = TimeSeries.interarrivalStats(e, Seq("key"), "ent", "ms", "eid")
      .collect().head
    // Order is (10,eid1), (10,eid2), (25): gaps 0 and 15 — deterministic.
    assert(out.getAs[Long]("n_gaps") === 2L)
    assert(out.getAs[Long]("min_ms") === 0L)
    assert(out.getAs[Long]("max_ms") === 15L)
  }

  test("theilSen: outlier day leaves the pairwise median untouched (legacy slope grid)") {
    import spark.implicits._
    // y = x on days 1-3 plus a wild spike on day 4: pairwise slopes are
    // [1, 1, 1, 33, 49, 97] -> even count, median = (1+33)/2 = 17;
    // without the spike the median is exactly 1.
    val sp = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 3L), ("a", 4L, 100L))
      .toDF("k", "x", "y")
    val out = TimeSeries.theilSen(sp, Seq("k"), "x", "y", Some(6))
      .collect().head
    assert(out.getAs[Long]("n_pairs") === 6L)
    assert(out.getAs[Double]("slope") === 17.0)
    val clean = sp.filter($"y" < 100L)
    assert(TimeSeries.theilSen(clean, Seq("k"), "x", "y", Some(6))
      .collect().head.getAs[Double]("slope") === 1.0)
  }

  test("theilSen: odd pair count picks the single middle slope per key") {
    import spark.implicits._
    // slopes 1, 1.5, 2 -> median 1.5; second key checks per-key windows.
    val sp = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 4L),
      ("b", 1L, 10L), ("b", 2L, 8L), ("b", 3L, 6L)).toDF("k", "x", "y")
    val out = TimeSeries.theilSen(sp, Seq("k"), "x", "y", Some(6))
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("slope")))
    assert(out.toSeq === Seq(("a", 3L, 1.5), ("b", 3L, -2.0)))
  }

  test("mannWhitneyVsRest: full separation gives extreme U; an exact tie credits half and zeroes z") {
    import spark.implicits._
    // a = {1,2,3} entirely below b = {4,5,6}: U_a = 0, U_b = 9,
    // z = ∓4.5/√5.25 = ∓1.964.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L), ("b", 6L)).toDF("g", "v")
    val out = TimeSeries.mannWhitneyVsRest(df, "g", "v")
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(("a", 3L, 0.0, -1.964), ("b", 3L, 9.0, 1.964)))
    // One tied value on each side: U = 0.5 each (half credit), z = 0.
    val tie = Seq(("a", 1L), ("b", 1L)).toDF("g", "v")
    val t = TimeSeries.mannWhitneyVsRest(tie, "g", "v")
      .orderBy($"g").collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(t.toSeq === Seq((0.5, 0.0), (0.5, 0.0)))
  }

  test("mannWhitney: a degenerate key (one side empty or all values tied) emits NULL z, never NaN") {
    import spark.implicits._
    val df = Seq(("empty0", 1.0, 1), ("empty0", 2.0, 1),
      ("tied", 5.0, 0), ("tied", 5.0, 1)).toDF("k", "v", "side")
    val out = TimeSeries.mannWhitney(df, Seq("k"), "v", "side")
      .orderBy($"k").collect()
    assert(out.forall(_.isNullAt(4)))
  }

  test("kruskalWallis with NO keys: textbook no-tie case gives H=7.2; all-tied table NULLs the correction") {
    import spark.implicits._
    // Groups {1,2,3}, {4,5,6}, {7,8,9}: rank sums 6, 15, 24 →
    // H = 12/90·(12+75+192) − 30 = 7.2; no ties so corrected == raw.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L),
      ("b", 6L), ("c", 7L), ("c", 8L), ("c", 9L)).toDF("g", "v")
    val r = TimeSeries.kruskalWallis(df, Seq(), "v", "g").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
      === (3L, 9L, 7.2, 7.2))
    // Every value identical: correction denominator hits zero → NULL
    // h_tie_corrected (h itself is 0: all rank sums equal) — keyed too.
    val const = Seq(("a", 5L), ("a", 5L), ("b", 5L), ("b", 5L))
      .toDF("g", "v")
    val c = TimeSeries.kruskalWallis(const, Seq(), "v", "g").collect().head
    assert(c.getDouble(2) === 0.0 && c.isNullAt(3))
    val ck = TimeSeries.kruskalWallis(const.withColumn("kk", lit(1)),
      Seq("kk"), "v", "g").collect().head
    assert(ck.getDouble(3) === 0.0 && ck.isNullAt(4))
  }

  test("olsTrend: exact line recovers slope/intercept with r2 = 1; flat series r2 = 0") {
    import spark.implicits._
    // y = 3x + 2 on x in 10..13 (shift by the global min makes the sums
    // small-exact); a flat second key has zero slope and zero explained
    // variance.
    val sp = Seq(("a", 10L, 32L), ("a", 11L, 35L), ("a", 12L, 38L),
      ("a", 13L, 41L), ("b", 10L, 7L), ("b", 11L, 7L), ("b", 12L, 7L))
      .toDF("k", "x", "y")
    val out = TimeSeries.olsTrend(sp, "k", "x", "y")
      .orderBy($"k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    // Key a: slope 3, intercept at the SHIFTED origin (x0 = 10) is 32.
    assert(out(0) === (("a", 4L, 3.0, 32.0, 1.0)))
    assert(out(1)._3 === 0.0)  // flat slope
    assert(out(1)._5 === 0.0)  // flat y: c = 0 -> r2 defined as 0
  }

  test("leadLagCorr: a shifted copy correlates perfectly at exactly its shift") {
    import spark.implicits._
    // y is x delayed by 2 buckets: corr must be +1 at lag 2 and weaker
    // elsewhere; overlap n shrinks by |lag - 2| relative to the peak.
    val xs = Seq(3L, 9L, 4L, 12L, 5L, 11L, 2L, 8L, 6L, 10L)
    val x = xs.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("b", "v")
    val y = xs.zipWithIndex.map { case (v, i) => (i + 2L, v) }.toDF("b", "v")
    val out = TimeSeries.leadLagCorr(x, y, "b", "v", "v", 3)
      .orderBy($"lag").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq
    val atPeak = out.find(_._1 == 2L).get
    assert(atPeak._2 === 10L && atPeak._3 === 1.0)
    assert(out.filter(_._1 != 2L).forall(_._3 < 1.0))
  }

  test("leadLagCorr: constant overlap yields NULL, not an ANSI divide error") {
    import spark.implicits._
    val x = (0L to 5L).map((_, 7L)).toDF("b", "v")
    val y = (0L to 5L).map(i => (i, i * 2L)).toDF("b", "v")
    val out = TimeSeries.leadLagCorr(x, y, "b", "v", "v", 1)
      .orderBy($"lag").collect()
    assert(out.nonEmpty && out.forall(_.isNullAt(2)))
  }

  test("holtForecast: a perfect ramp is a fixed point; a level shift splits into level and trend") {
    import spark.implicits._
    // Linear series 10,12,14,16: l stays on the line, b stays 2 ->
    // forecast_2 = 16 + 2*2 = 20 with zero smoothing error.
    val ramp = Seq(("a", 1L, 10L), ("a", 2L, 12L), ("a", 3L, 14L), ("a", 4L, 16L))
      .toDF("k", "day", "n")
    val r = graft.operators.TimeSeries.holtForecast(
      ramp, Seq("k"), "day", "n", 0.45, 0.35, 2).collect().head
    assert((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)) ===
      ((4L, 16.0, 2.0, 20.0)))
    // Flat 10,10,10 then a jump to 20 (alpha .45, beta .35):
    // l4 = .45*20 + .55*10 = 14.5, b4 = .35*4.5 = 1.575 ->
    // forecast_2 = 14.5 + 3.15 = 17.65.
    val shift = Seq(("a", 1L, 10L), ("a", 2L, 10L), ("a", 3L, 10L), ("a", 4L, 20L))
      .toDF("k", "day", "n")
    val s = graft.operators.TimeSeries.holtForecast(
      shift, Seq("k"), "day", "n", 0.45, 0.35, 2).collect().head
    assert((s.getDouble(2), s.getDouble(3), s.getDouble(4)) === ((14.5, 1.575, 17.65)))
  }

  test("clampedBalance: the clamp applies at every step, not once at the end") {
    import spark.implicits._
    val ts = (i: Int) => new java.sql.Timestamp(1000L * i)
    // Deltas +5, −8, +4: plain cumsum ends at 1, but the floor fires at
    // step 2 (5−8 < 0 → 0) so the true balance is 4 with 1 hit —
    // distinguishing the stateful scan from cumsum-then-greatest.
    val ev = Seq((1L, ts(1), 10L, 55.0), (1L, ts(2), 11L, 42.0),
      (1L, ts(3), 12L, 54.0)).toDF("k", "ts", "id", "value")
    val out = graft.operators.TimeSeries.clampedBalance(
        ev, "k", "ts", "id", col("value") - lit(50.0))
      .collect().head
    assert((out.getLong(1), out.getDouble(2), out.getLong(3))
      === (3L, 4.0, 1L))
    // Order is (ts, id), not arrival: the same rows reversed agree.
    val out2 = graft.operators.TimeSeries.clampedBalance(
        ev.orderBy($"id".desc), "k", "ts", "id", col("value") - lit(50.0))
      .collect().head
    assert(out2 === out)
  }

  test("madAnomaly: hand-computed robust z flags the spike; constant series gives NULL z and first-day peak") {
    import spark.implicits._
    // Key "k", days 1..9 with counts [4,5,6,4,5,6,4,50,6]: med 5,
    // |dev| sorted [0,0,1,1,1,1,1,1,45] → MAD 1; spike z = 45/1.4826 =
    // 30.3521 (4 dp), others ≤ 0.6745 → exactly one flag at z > 3.
    // Key "c": constant 5/day → MAD 0 → z NULL everywhere, zero flags,
    // peak falls to the first day (NULLS LAST + day tie-break).
    val kCounts = Seq(4, 5, 6, 4, 5, 6, 4, 50, 6)
    val rows =
      kCounts.zipWithIndex.flatMap { case (n, i) =>
        Seq.fill(n)(("k", f"2024-01-${i + 1}%02d 03:00:00")) } ++
      (1 to 3).flatMap(d => Seq.fill(5)(("c", f"2024-01-$d%02d 03:00:00")))
    val ev = rows.toDF("k", "_s").select($"k", to_timestamp($"_s").as("ts"))
    val out = graft.operators.TimeSeries.madAnomaly(ev, "k", "ts", 3.0)
      .orderBy($"k").collect()
    val c = out(0)
    assert(c.getString(0) === "c" && c.getLong(1) === 3L &&
      c.getDouble(2) === 5.0 && c.getDouble(3) === 0.0 &&
      c.getLong(4) === 0L && c.getLong(5) === 19723L &&
      c.getLong(6) === 5L && c.isNullAt(7))
    val k = out(1)
    assert(k.getString(0) === "k" && k.getLong(1) === 9L &&
      k.getDouble(2) === 5.0 && k.getDouble(3) === 1.0 &&
      k.getLong(4) === 1L && k.getLong(5) === 19730L &&
      k.getLong(6) === 50L && k.getDouble(7) === 30.3521)
  }

  test("forecastBacktest: hand-computed errors, an absent day counts as zero, zero naive error gives NULL mase") {
    import spark.implicits._
    // Key "k": daily counts over 2024-01-01..10 with Jan 4 ABSENT (a
    // quiet day, y = 0 on the dense grid): y = [2,1,3,0,1,2,1,3,2,1].
    // Season 7 ⇒ backtest days 8..10: naive errs |3-1|,|2-3|,|1-2| = 4;
    // seasonal errs |3-2|,|2-1|,|1-3| = 4 ⇒ mase 1.0; sMAPE terms
    // 2/5, 2/3, 1 ⇒ avg 0.688889 ⇒ 0.6889 at the 4 dp convention.
    // Key "c": constant 1/day over 9 days ⇒ both error sums 0 ⇒ mase
    // NULL (not a divide error), sMAPE 0.
    val counts = Map(1 -> 2, 2 -> 1, 3 -> 3, 5 -> 1, 6 -> 2, 7 -> 1,
      8 -> 3, 9 -> 2, 10 -> 1)
    val rows =
      counts.toSeq.flatMap { case (d, n) =>
        Seq.fill(n)(("k", f"2024-01-$d%02d 05:00:00")) } ++
      (1 to 9).map(d => ("c", f"2024-01-$d%02d 12:00:00"))
    val ev = rows.toDF("k", "_s").select($"k", to_timestamp($"_s").as("ts"))
    val out = TimeSeries.forecastBacktest(ev, "k", "ts", 7)
      .orderBy($"k").collect()
    val c = out(0)
    assert(c.getString(0) === "c" && c.getLong(1) === 2L &&
      c.getLong(2) === 0L && c.getLong(3) === 0L && c.isNullAt(4) &&
      c.getDouble(5) === 0.0)
    val k = out(1)
    assert(k.getString(0) === "k" && k.getLong(1) === 3L &&
      k.getLong(2) === 4L && k.getLong(3) === 4L &&
      k.getDouble(4) === 1.0 && k.getDouble(5) === 0.6889)
  }
  test("sprt: clean evidence crosses the H1 boundary at the first sufficient bucket; balanced evidence continues with a null decision day") {
    import spark.implicits._
    // p0=.2, p1=.8, alpha=beta=.05: c1=ln4, c2=-ln4, bounds +-ln19
    // (2.944). Arm 0: all hits -> llr = 2*ln4 = 2.773 after day 1 (no
    // decision), 3*ln4 = 4.159 after day 2 -> accept_h1 on day 2.
    // Arm 1: alternating hit/miss -> llr pinned at 0 or ln4 forever ->
    // continue, decision_day null.
    val df = Seq(
      (0L, 1L, 1L), (0L, 1L, 1L), (0L, 2L, 1L),
      (1L, 1L, 1L), (1L, 1L, 0L), (1L, 2L, 1L), (1L, 2L, 0L))
      .toDF("arm", "day", "hit")
    val out = graft.operators.TimeSeries.sprt(df, Seq("arm"), "day",
        "hit", 0.2, 0.8, 0.05, 0.05)
      .orderBy($"arm").collect()
    val a0 = out(0)
    assert((a0.getLong(1), a0.getLong(2), a0.getLong(3)) === ((2L, 3L, 3L)))
    assert(a0.getString(6) === "accept_h1" && a0.getLong(5) === 2L)
    assert(math.abs(a0.getDouble(4) - 3 * math.log(4)) < 1e-6)
    val a1 = out(1)
    assert(a1.getString(6) === "continue" && a1.isNullAt(5))
  }

  test("sprt: the H0 boundary fires on sustained misses") {
    import spark.implicits._
    // All misses: llr = m * ln(.2/.8) = -m*ln4; crosses -2.944 at m=3
    // (day 3 with one obs per day).
    val df = Seq((0L, 1L, 0L), (0L, 2L, 0L), (0L, 3L, 0L), (0L, 4L, 0L))
      .toDF("arm", "day", "hit")
    val out = graft.operators.TimeSeries.sprt(df, Seq("arm"), "day",
        "hit", 0.2, 0.8, 0.05, 0.05).collect().head
    assert(out.getString(6) === "accept_h0" && out.getLong(5) === 3L)
  }
}
