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
}
