package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival estimation over right-censored durations — the
  * principled read q28's completed-only latency percentiles cannot give:
  * q28 conditions on conversion ("how fast are the converters") and is
  * silently biased by everyone still in flight; KM uses the censored mass
  * too, so "P(not yet converted by hour h)" is unbiased under
  * administrative censoring at the horizon. Same analytics family as the
  * reference's retention grain (SURVEY §2.1 Q7-Q12 cumulative series,
  * MainController.php:41-207) with the statistics done right.
  *
  * Scale shape: the estimator is two bounded literal-grid roll-ups, never
  * a global window. Durations collapse to the bucket grain (≤ horizon+1
  * rows) in ONE map-side-combined agg; the at-risk counts n(t) = N −
  * Σ_{t'<t} c(t') and the cumulative log-survival Σ_{t'≤t} ln(1−d/n) are
  * both computed by exploding a LITERAL bucket grid over that tiny frame
  * and conditional-summing (the vocabCoverage discipline) — no
  * single-partition sort anywhere; N is one broadcast scalar row.
  */
object Survival {

  /** Subjects for time-to-event analysis: one row per `startType` event,
    * duration = ms to that user's first strictly-later `endType` event,
    * administratively censored at `buckets × bucketMs`. Output:
    * (t BIGINT bucket, d INT 1=event observed / 0=censored at horizon).
    *
    * Scale shape: one user-key equi-join with the horizon as a residual
    * range predicate (the q28 shape; per-user event lists bound the
    * blowup), then one subject-grain min agg.
    */
  def timeToEvent(events: DataFrame, idCol: String, userCol: String,
                  typeCol: String, msCol: String, startType: String,
                  endType: String, buckets: Int, bucketMs: Long): DataFrame =
    subjectsOf(events, idCol, userCol, typeCol, msCol, startType, endType,
      buckets, bucketMs, None).select(col("t"), col("d"))

  /** [[timeToEvent]] with a cohort column carried through from the START
    * event's row — the subjects frame [[logRank]] compares on. Output:
    * (groupCol, t, d). */
  def timeToEventGrouped(events: DataFrame, idCol: String, userCol: String,
                         typeCol: String, msCol: String, startType: String,
                         endType: String, buckets: Int, bucketMs: Long,
                         groupCol: String): DataFrame =
    subjectsOf(events, idCol, userCol, typeCol, msCol, startType, endType,
      buckets, bucketMs, Some(groupCol))

  private def subjectsOf(events: DataFrame, idCol: String, userCol: String,
                         typeCol: String, msCol: String, startType: String,
                         endType: String, buckets: Int, bucketMs: Long,
                         groupCol: Option[String]): DataFrame = {
    val horizon = buckets.toLong * bucketMs
    val gCols = groupCol.toSeq.map(col)
    val starts = events.filter(col(typeCol) === lit(startType))
      .select(col(idCol).as("_sid") +: col(userCol).as("_u") +:
        col(msCol).as("_sms") +: gCols: _*)
    val ends = events.filter(col(typeCol) === lit(endType))
      .select(col(userCol).as("_eu"), col(msCol).as("_ems"))
    starts.join(ends, col("_u") === col("_eu") &&
        col("_ems") > col("_sms") &&
        col("_ems") - col("_sms") <= lit(horizon), "left")
      // The cohort is functionally dependent on the start row, so it
      // rides the grouping keys rather than a first() aggregate.
      .groupBy(col("_sid") +: gCols: _*)
      .agg(min(col("_ems") - col("_sms")).as("_diff"))
      .select(gCols ++ Seq(
        when(col("_diff").isNull, lit(buckets.toLong))
          .otherwise(floor(col("_diff") / lit(bucketMs))).cast("long").as("t"),
        when(col("_diff").isNull, lit(0)).otherwise(lit(1)).cast("int")
          .as("d")): _*)
  }

  /** Two-sample log-rank test (Mantel 1966) over grouped (g, t, d)
    * subjects — the "are these two survival curves actually different"
    * companion [[kaplanMeier]] needs before anyone reads meaning into a
    * visual gap: at every bucket with at least one event, the observed
    * group-1 events are compared against the hypergeometric expectation
    * e1 = d·n1/n given the at-risk sizes, with variance
    * v = d·n1·n0·(n−d)/(n²·(n−1)); χ² = (Σ(o−e))²/Σv on 1 df. Exactly
    * TWO groups (the classic form, ENFORCED by an assert_true filter —
    * a third group fails the job): the lesser group value by sort order
    * reports as `0`, the greater as `1`.
    *
    * Determinism: every per-time term derives from exact integer
    * (d, n_risk) counts and is rounded 6 dp BEFORE the time fold (the
    * two-stage convention); the sums round again before the final
    * ratio, so both engines square and divide identical grid values.
    *
    * Scale shape: subjects collapse to (group, t) grain in one agg; the
    * at-risk roll-up explodes the LITERAL bucket grid per group (the
    * kaplanMeier discipline — ≤ 2·(maxBucket+1) rows, never a global
    * window), the two-group pivot is a tt-grain self-join of that tiny
    * frame, and the test statistic is one scalar fold. Group bounds and
    * totals ride broadcast one-row frames. */
  def logRank(subjects: DataFrame, groupCol: String,
              maxBucket: Int): DataFrame = {
    val grid = typedLit((0 to maxBucket).map(_.toLong))
    // The two-group contract is ENFORCED, not just documented: a third
    // group value would multiply the tt-grain pivot self-join (one row
    // per extra group per bucket) and silently corrupt chi2. assert_true
    // rides a filter (never an unused projection Catalyst could prune),
    // so misuse fails the job with this message.
    val bounds = subjects.agg(min(col(groupCol)).as("_ga"),
      max(col(groupCol)).as("_gb"),
      countDistinct(col(groupCol)).as("_ng"))
    val byGT = subjects.groupBy(col(groupCol), col("t"))
      .agg(sum(col("d")).cast("long").as("_dd"),
        count(lit(1)).cast("long").as("_c"))
    val nG = subjects.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("_nn"))
    val ar = nG
      .select(col(groupCol), col("_nn"), explode(grid).as("tt"))
      .join(byGT, Seq(groupCol), "left")
      .groupBy(col(groupCol), col("tt"))
      .agg(
        sum(when(col("t") === col("tt"), col("_dd")).otherwise(0L))
          .cast("long").as("_d"),
        (max(col("_nn")) -
          sum(when(col("t") < col("tt"), col("_c")).otherwise(0L)))
          .cast("long").as("_nr"))
      .crossJoin(broadcast(bounds))
      .where(assert_true(col("_ng") === 2,
        lit("logRank requires exactly TWO groups")).isNull)
    val pv = ar.where(col(groupCol) === col("_ga"))
      .select(col("tt"), col("_d").as("_d0"), col("_nr").as("_n0"))
      .join(ar.where(col(groupCol) === col("_gb"))
        .select(col("tt"), col("_d").as("_d1"), col("_nr").as("_n1")),
        Seq("tt"))
      .where(col("_d0") + col("_d1") > 0L && col("_n0") + col("_n1") > 1L)
    val dt = (col("_d0") + col("_d1")).cast("double")
    val nt = (col("_n0") + col("_n1")).cast("double")
    val terms = pv.select(col("_d0"), col("_d1"),
      round(dt * col("_n0") / nt, 6).as("_e0"),
      round(dt * col("_n1") / nt, 6).as("_e1"),
      round(col("_d1") - dt * col("_n1") / nt, 6).as("_oe"),
      round(dt * col("_n1") * col("_n0") * (nt - dt) /
        (nt * nt * (nt - lit(1.0))), 6).as("_v"))
    val totals = nG.crossJoin(broadcast(bounds))
      .agg(
        sum(when(col(groupCol) === col("_ga"), col("_nn")).otherwise(0L))
          .cast("long").as("n0"),
        sum(when(col(groupCol) =!= col("_ga"), col("_nn")).otherwise(0L))
          .cast("long").as("n1"))
    terms
      .agg(sum(col("_d0")).cast("long").as("obs0"),
        round(sum(col("_e0")), 6).as("exp0"),
        sum(col("_d1")).cast("long").as("obs1"),
        round(sum(col("_e1")), 6).as("exp1"),
        round(round(sum(col("_oe")), 6) * round(sum(col("_oe")), 6) /
          round(sum(col("_v")), 6), 4).as("chi2"))
      .crossJoin(broadcast(totals))
      .select(col("n0"), col("n1"), col("obs0"), col("exp0"),
        col("obs1"), col("exp1"), col("chi2"))
  }

  /** The KM product-limit fold over (t, d) subjects on the literal grid
    * 0..maxBucket: S(t) = Π_{t'≤t, d(t')>0} (1 − d(t')/n(t')), with the
    * standard at-risk convention (censored-at-t still at risk at t).
    * Output rows only at death times: (t, d, n_risk, survival 6dp).
    */
  def kaplanMeier(subjects: DataFrame, maxBucket: Int): DataFrame = {
    val grid = typedLit((0 to maxBucket).map(_.toLong))
    val byT = subjects.groupBy(col("t"))
      .agg(sum(col("d")).cast("long").as("_d"),
        count(lit(1)).cast("long").as("_c"))
    val n = subjects.agg(count(lit(1)).cast("long").as("_n"))
    val atRisk = byT.crossJoin(broadcast(n))
      .select(col("t"), col("_d"), col("_c"), col("_n"),
        explode(grid).as("tt"))
      .groupBy(col("tt"))
      .agg(
        sum(when(col("t") === col("tt"), col("_d")).otherwise(0L))
          .cast("long").as("d"),
        (max(col("_n")) -
          sum(when(col("t") < col("tt"), col("_c")).otherwise(0L)))
          .cast("long").as("n_risk"))
    // Spark's log() of a non-positive argument is NULL (silently skipped
    // by sum) where other engines give -inf, so the d == n_risk "curve
    // hits exactly zero" time carries an explicit flag instead of a log
    // term, and every time at or past the first such flag outputs 0.
    atRisk
      .select(col("tt"), col("d"), col("n_risk"), explode(grid).as("tt2"),
        when(col("d") > 0 && col("d") < col("n_risk"),
          log(lit(1.0) - col("d").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)).as("_term"),
        when(col("d") > 0 && col("d") === col("n_risk"), lit(1))
          .otherwise(lit(0)).as("_zero"))
      .groupBy(col("tt2"))
      .agg(
        max(when(col("tt") === col("tt2"), col("d"))).as("d"),
        max(when(col("tt") === col("tt2"), col("n_risk"))).as("n_risk"),
        sum(when(col("tt") <= col("tt2"), col("_term")).otherwise(0.0))
          .as("_logs"),
        max(when(col("tt") <= col("tt2"), col("_zero")).otherwise(0))
          .as("_dead"))
      .where(col("d") > 0)
      .select(col("tt2").as("t"), col("d"), col("n_risk"),
        when(col("_dead") === 1, lit(0.0))
          .otherwise(round(exp(col("_logs")), 6)).as("survival"))
  }
}
