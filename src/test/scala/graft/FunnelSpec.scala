package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.operators.Funnel

/** Behavior + plan pins for the conversion-funnel operator: strict
  * ordering between steps, tie and missing-step handling, and the
  * one-Exchange scale shape the Scaladoc promises. */
class FunnelSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    Seq(
      // user 1: clean conversion
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: click before the first view and click tied with the view
      // don't count; purchase before the qualifying click doesn't count
      (2L, "click", 5L), (2L, "view", 10L), (2L, "click", 10L),
      (2L, "purchase", 12L), (2L, "click", 15L), (2L, "purchase", 18L),
      // user 3: no view at all → excluded
      (3L, "purchase", 5L), (3L, "click", 6L),
      // user 4: view but never clicks → open funnel, not converted
      (4L, "view", 10L), (4L, "purchase", 20L))
      .toDF("user_id", "event_type", "ms")
  }

  test("funnel: strict min-chain per user, ties and gaps handled") {
    val out = Funnel.funnel(fixture, "user_id", "event_type", "ms",
      Seq("view", "click", "purchase"))
    assert(rows(out) === Set(
      Seq(1L, 10L, 20L, 30L, 1),
      Seq(2L, 10L, 15L, 18L, 1), // click@10 ties view → skipped; p@12 < c@15
      Seq(4L, 10L, null, null, 0)))
  }

  test("funnel plans exactly one shuffle (windows + collapse share the key)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = Funnel.funnel(fixture, "user_id", "event_type", "ms",
        Seq("view", "click", "purchase")).queryExecution.executedPlan
      val stripped = plan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      val shuffles = stripped.collect { case s: ShuffleExchangeExec => s }
      assert(shuffles.size === 1,
        s"funnel must shuffle once, got ${shuffles.size}:\n$stripped")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("funnelWilson: rates are exact and Wilson bounds bracket them inside [0, 1]") {
    import spark.implicits._
    // 4 viewers, 2 click after viewing, 1 purchases after clicking.
    val e = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "view", 10L), (2L, "click", 15L),
      (3L, "view", 10L), (4L, "view", 10L))
      .toDF("user_id", "event_type", "ms")
    val steps = Seq("view", "click", "purchase")
    val out = Funnel.funnelWilson(
        Funnel.funnel(e, "user_id", "event_type", "ms", steps), steps, 1.96)
      .orderBy($"step").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.map(x => (x._1, x._2, x._3, x._4)).toSeq === Seq(
      (0L, "view", 4L, 1.0), (1L, "click", 2L, 0.5), (2L, "purchase", 1L, 0.25)))
    // Wilson bounds: inside [0,1], bracketing the rate (strictly for
    // interior rates), and wider than zero.
    out.foreach { case (_, _, _, rate, lo, hi) =>
      assert(lo >= 0.0 && hi <= 1.0 && lo < hi)
      assert(lo <= rate + 1e-9 && rate <= hi + 1e-9)
    }
    // p = 0.5, n = 4, z = 1.96: the Wilson center is exactly 0.5.
    val mid = out(1)
    assert(math.abs((mid._5 + mid._6) / 2 - 0.5) < 1e-9)
  }

  test("topPaths: first-depth events in (ts,id) order form the path; counts and tie-breaks deterministic") {
    import spark.implicits._
    // u1 and u2 share a>b>c (u2's c arrives as a ts tie broken by id);
    // u3 diverges after a; u4 has fewer events than depth.
    val ev = Seq(
      (1L, "a", 10L, 100L), (1L, "b", 20L, 101L), (1L, "c", 30L, 102L),
      (2L, "a", 10L, 200L), (2L, "b", 20L, 201L), (2L, "c", 20L, 202L),
      (3L, "a", 10L, 300L), (3L, "x", 20L, 301L),
      (4L, "a", 10L, 400L))
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = graft.operators.Funnel.topPaths(ev, "user_id", "event_type",
        "ts", "event_id", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a>b>c", 2L), ("a", 1L), ("a>x", 1L)))
    // depth truncates: depth 2 collapses u1/u2 to a>b.
    val d2 = graft.operators.Funnel.topPaths(ev, "user_id", "event_type",
        "ts", "event_id", 2, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(d2.toSeq === Seq(("a>b", 2L), ("a", 1L), ("a>x", 1L)))
  }

  test("newVsReturning: first day is all-new, multiple events one day count once, gaps don't reset") {
    import spark.implicits._
    // u1 active days 1, 3 (two events on day 3 count once); u2 active
    // days 1, 2; u3 appears only on day 3 (new mid-series).
    val ev = Seq(
      (1L, "2024-01-01 01:00:00"), (1L, "2024-01-03 01:00:00"),
      (1L, "2024-01-03 09:00:00"),
      (2L, "2024-01-01 05:00:00"), (2L, "2024-01-02 05:00:00"),
      (3L, "2024-01-03 07:00:00"))
      .toDF("user_id", "_s")
      .select($"user_id",
        org.apache.spark.sql.functions.to_timestamp($"_s").as("ts"))
    val out = graft.operators.Funnel.newVsReturning(ev, "user_id", "ts")
      .orderBy($"day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq === Seq(
      (19723L, 2L, 2L, 0L, 0.0),    // day 1: u1, u2 both new
      (19724L, 1L, 0L, 1L, 1.0),    // day 2: u2 returns
      (19725L, 2L, 1L, 1L, 0.5)))   // day 3: u1 returns (gap ok), u3 new
  }
}
