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
                  endType: String, buckets: Int, bucketMs: Long): DataFrame = {
    val horizon = buckets.toLong * bucketMs
    val starts = events.filter(col(typeCol) === lit(startType))
      .select(col(idCol).as("_sid"), col(userCol).as("_u"),
        col(msCol).as("_sms"))
    val ends = events.filter(col(typeCol) === lit(endType))
      .select(col(userCol).as("_eu"), col(msCol).as("_ems"))
    starts.join(ends, col("_u") === col("_eu") &&
        col("_ems") > col("_sms") &&
        col("_ems") - col("_sms") <= lit(horizon), "left")
      .groupBy(col("_sid"))
      .agg(min(col("_ems") - col("_sms")).as("_diff"))
      .select(
        when(col("_diff").isNull, lit(buckets.toLong))
          .otherwise(floor(col("_diff") / lit(bucketMs))).cast("long").as("t"),
        when(col("_diff").isNull, lit(0)).otherwise(lit(1)).cast("int").as("d"))
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
