package graft

import org.apache.spark.sql.functions._
import graft.operators.Survival

/** Behavior pins for the Kaplan-Meier estimator: hand-checkable small
  * cases, the no-censoring collapse to the empirical survival function,
  * and censoring semantics of the subject builder. */
class SurvivalSpec extends SparkSpec {

  test("timeToEvent: strict ordering, horizon censoring, first-match min") {
    import spark.implicits._
    val events = Seq(
      // subject 10: purchase at +2h and +5h → first one wins, t=2, d=1
      (10L, 1L, "signup", 0L), (10L, 1L, "purchase", 7200000L),
      (11L, 1L, "purchase", 18000000L),
      // subject 20: purchase at exactly the same ms is NOT after → the
      // later one at +30h is past the 24h horizon → censored at t=24
      (20L, 2L, "signup", 1000L), (21L, 2L, "purchase", 1000L),
      (22L, 2L, "purchase", 1000L + 30L * 3600000L),
      // subject 30: no purchase at all → censored
      (30L, 3L, "signup", 0L))
      .toDF("event_id", "user_id", "event_type", "_ms")
    val subj = Survival.timeToEvent(events, "event_id", "user_id",
      "event_type", "_ms", "signup", "purchase", 24, 3600000L)
    assert(rows(subj) === Set(Seq(2L, 1), Seq(24L, 0), Seq(24L, 0)))
  }

  test("kaplanMeier matches the hand-computed product limit with mid-study censoring") {
    import spark.implicits._
    // 4 subjects: deaths at t=1 (n=4) and t=3 (n=2), censored at t=2.
    // S(1) = 3/4; S(3) = 3/4 * 1/2 = 3/8.
    val subj = Seq((1L, 1), (2L, 0), (3L, 1), (5L, 0)).toDF("t", "d")
    val out = Survival.kaplanMeier(subj, 5).orderBy(col("t"))
    assert(rows(out) === Set(
      Seq(1L, 1L, 4L, 0.75), Seq(3L, 1L, 2L, 0.375)))
  }

  test("with no censoring KM is exactly the empirical survival function") {
    import spark.implicits._
    val durations = Seq(0L, 0L, 1L, 2L, 2L, 2L, 4L)
    val subj = durations.map(t => (t, 1)).toDF("t", "d")
    val out = Survival.kaplanMeier(subj, 5).orderBy(col("t"))
      .select(col("t"), col("survival")).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val n = durations.size.toDouble
    durations.distinct.foreach { t =>
      val surviving = durations.count(_ > t) / n
      assert(math.abs(out(t) - surviving) < 1e-6,
        s"t=$t km=${out(t)} ecdf=$surviving")
    }
  }

  test("sf0.001 registry query: survival is positive, non-increasing, n_risk strictly decreasing") {
    val out = SparkEntry.queries("j34_kaplan_meier")(spark,
        "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val surv = out.map(_.getDouble(3))
    val risk = out.map(_.getLong(2))
    assert(surv.forall(s => s > 0.0 && s <= 1.0))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
    assert(risk.zip(risk.tail).forall { case (a, b) => b < a })
  }

  test("logRank: hand-computed hypergeometric fold; identical groups give chi2 = 0") {
    import spark.implicits._
    // g0: events at t1, t2 (n=2); g1: event at t1, censored at t3 (n=2).
    // tt1: d=2 of n=4 at risk → e1 = 1, oe = 0, v = 1/3.
    // tt2: d0 = 1 of n = 2 (one per group) → e1 = .5, oe = −.5, v = .25.
    // χ² = .25 / .583333 = 0.4286; obs/exp = (2, 1.5) vs (1, 1.5).
    val subj = Seq((0, 1L, 1), (0, 2L, 1), (1, 1L, 1), (1, 3L, 0))
      .toDF("g", "t", "d")
    val out = Survival.logRank(subj, "g", 3).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getDouble(3), out.getLong(4), out.getDouble(5),
      out.getDouble(6)) === ((2L, 2L, 2L, 1.5, 1L, 1.5, 0.4286)))
    // Mirror-image cohorts: identical event patterns → every oe term is
    // 0 and chi2 is exactly 0.
    val same = Seq((0, 1L, 1), (0, 2L, 1), (1, 1L, 1), (1, 2L, 1))
      .toDF("g", "t", "d")
    assert(Survival.logRank(same, "g", 3).collect().head.getDouble(6) === 0.0)
    // timeToEventGrouped carries the cohort: user 10 (even) converts in
    // bucket 1, user 11 (odd) never does → censored at the horizon.
    val ev = Seq(
      (1L, 10L, "s", 0L), (2L, 10L, "p", 90L),
      (3L, 11L, "s", 0L)).toDF("id", "u", "ty", "ms")
      .withColumn("cohort", $"u" % 2)
    val subj2 = Survival.timeToEventGrouped(ev, "id", "u", "ty", "ms",
        "s", "p", 4, 60L, "cohort")
      .orderBy($"cohort").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(subj2.toSeq === Seq((0L, 1L, 1), (1L, 4L, 0)))
  }

  test("logRank: a third group fails the job loudly (two-group contract enforced)") {
    import spark.implicits._
    val subj = Seq((0, 1L, 1), (1, 1L, 1), (2, 2L, 1))
      .toDF("g", "t", "d")
    // assert_true raises SparkRuntimeException, which does NOT extend
    // SparkException; whether Spark wraps it in a job-failure
    // SparkException depends on the execution path (and varies under the
    // shared concurrent test session). Intercept Throwable and walk the
    // whole cause chain for the contract message (r11 flake, VERDICT #1).
    val e = intercept[Throwable] {
      Survival.logRank(subj, "g", 3).collect()
    }
    val msgs = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("exactly TWO groups"), s"unexpected failure: $msgs")
  }
}
