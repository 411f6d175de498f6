package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence detection — the conversion-funnel query (for each
  * user: earliest step-1 event, earliest step-2 event strictly after it,
  * ...), the dashboard-analytics sibling of the reference's sessionization
  * grain (SURVEY §2.1 S10 tracks stream starts per channel the same
  * "earliest qualifying event per key" way, Bot.java:139-163).
  *
  * Scale shape: ONE shuffle. Each step is an unordered whole-partition
  * window `min(CASE WHEN type = step AND ms > prev_step)` over the user
  * partition — consecutive windows share the same partitioning, so Catalyst
  * plans one Exchange and the final per-user collapse (groupBy on the same
  * key) runs exchange-free on the window output. No per-user array state is
  * ever materialized (vs. a collect_list fold, which carries a whole user
  * history per row), so a pathologically active user costs window-frame
  * scan time, not memory.
  *
  * `min(when(...))` over nulls is null, and `ms > null` is null → false, so
  * users missing step i-1 can never match step i — the chain is strict.
  *
  * Output: (userCol, step0_ms .. stepN_ms, converted INT) for every user
  * with at least one step-0 event.
  */
object Funnel {

  def funnel(events: DataFrame, userCol: String, typeCol: String,
             msCol: String, steps: Seq[String]): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val w = Window.partitionBy(col(userCol))
    val withSteps = steps.zipWithIndex.foldLeft(
      events.select(col(userCol), col(typeCol), col(msCol))) {
      case (df, (step, 0)) =>
        df.withColumn("_s0",
          min(when(col(typeCol) === step, col(msCol))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"_s$i",
          min(when(col(typeCol) === step &&
            col(msCol) > col(s"_s${i - 1}"), col(msCol))).over(w))
    }
    val aggs = steps.indices.map(i => max(col(s"_s$i")).as(s"step${i}_ms"))
    withSteps
      .groupBy(col(userCol))
      .agg(aggs.head, aggs.tail: _*)
      .where(col("step0_ms").isNotNull)
      .withColumn("converted",
        col(s"step${steps.size - 1}_ms").isNotNull.cast("int"))
  }

  /** Top user journey paths — the Sankey read the funnel family lacked:
    * j15's transition matrix loses order beyond one hop and [[funnel]]
    * presumes the step sequence; this DISCOVERS the dominant sequences.
    * Each user's FIRST `depth` events in (ts, id) order concatenate to a
    * path string; paths rank by user count.
    *
    * Scale shape: the first-k cut is a per-user window row_number — the
    * per-user agg buffer is then bounded at `depth` events (collecting
    * full histories into one list would buffer a power user's entire
    * stream); one user-grain agg builds the path (rn-sorted array fold,
    * deterministic), one path-grain count, TakeOrdered top-k. Two
    * key-grain exchanges, no global sort.
    *
    * Output: (path, n_users), top `topK` by n_users desc, path asc. */
  def topPaths(events: DataFrame, userCol: String, typeCol: String,
               tsCol: String, idCol: String, depth: Int,
               topK: Int): DataFrame = {
    require(depth >= 1 && topK >= 1, "depth and topK must be positive")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events.select(col(userCol), col(typeCol), col(tsCol), col(idCol))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= depth)
      .groupBy(col(userCol))
      .agg(concat_ws(">", transform(
        array_sort(collect_list(struct(col("_rn").as("_r"),
          col(typeCol).as("_t")))),
        s => s.getField("_t"))).as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topK)
  }

  /** Wilson 95%-style score intervals over a [[funnel]] result: per step,
    * the reached count, the from-start conversion rate, and the interval
    * the observed rate could wander in by cohort-size luck alone — the
    * "is this week's funnel REALLY worse" read (a normal-approximation CI
    * misbehaves exactly where funnels live, at small p; Wilson doesn't).
    *
    * Scale shape: ONE scalar aggregate over the funnel frame (per-step
    * indicator sums), then a |steps|-branch literal explode — bounded
    * rows, no shuffle after the agg. z and z² are computed once in Scala
    * and interpolated into both engines' arithmetic verbatim, and every
    * CI term is written in the same operation order, so the doubles match
    * bitwise before the 6 dp round. */
  def funnelWilson(funnelDf: DataFrame, steps: Seq[String],
                   z: Double): DataFrame = {
    val aggs = steps.indices.map(i =>
      sum(when(col(s"step${i}_ms").isNotNull, 1L).otherwise(0L)).as(s"_n$i"))
    val counts = funnelDf.agg(aggs.head, aggs.tail: _*)
    val rows = counts.select(explode(array(steps.indices.map { i =>
        struct(lit(i).as("_step"), lit(steps(i)).as("_name"),
          col(s"_n$i").as("_k"), col("_n0").as("_b"))
      }: _*)).as("_s"))
      .select(col("_s._step").as("_step"), col("_s._name").as("_name"),
        col("_s._k").as("_k"), col("_s._b").as("_b"))
    val n = col("_b").cast("double")
    val p = col("_k").cast("double") / n
    val z2 = lit(z * z)
    val denom = lit(1.0) + z2 / n
    val center = (p + z2 / (lit(2.0) * n)) / denom
    val half = lit(z) *
      sqrt(p * (lit(1.0) - p) / n + z2 / (lit(4.0) * n * n)) / denom
    rows.select(col("_step").cast("long").as("step"),
      col("_name").as("step_name"), col("_k").cast("long").as("n_reached"),
      round(p, 6).as("rate"),
      round(center - half, 6).as("ci_lo"),
      round(center + half, 6).as("ci_hi"))
  }

  /** New-vs-returning daily actives — the growth-accounting read j14's
    * fixed-cohort retention can't give (retention follows ONE cohort
    * forward; this decomposes EVERY day's active count into first-ever
    * appearances vs returns, the DAU quality split "is this growth or
    * churn-and-replace" is asked of). A user is active on a day if any
    * event lands there; new on exactly their first active day.
    *
    * Scale shape: one distinct to (user, day) grain — the only pass
    * over raw events; first-seen is a user-grain min agg of that frame;
    * the decomposition is one user-keyed equi-join (same grain both
    * sides, AQE-sized) and a day-grain conditional agg. No windows.
    * Days emit as epoch days (BIGINT — the j57 date convention). */
  def newVsReturning(events: DataFrame, userCol: String,
                     tsCol: String): DataFrame =
    newVsReturningFromPresence(
      events.select(col(userCol).as("_u"),
        date_trunc("day", col(tsCol)).cast("date").as("_d")).distinct(),
      "_u", "_d")

  /** [[newVsReturning]] from an already-built (user, day) PRESENCE frame
    * — the streaming twin's read-time entry point: its state is the
    * (user, day) table with per-batch counts whose VALUES don't matter
    * (presence is presence however many batches touched the day), so
    * replayed batches can't corrupt the split. Input rows must be
    * distinct at (user, day). */
  def newVsReturningFromPresence(ud: DataFrame, userCol: String,
                                 dayCol: String): DataFrame = {
    val u = col(userCol)
    val d = col(dayCol)
    val fs = ud.groupBy(u.as("_fu")).agg(min(d).as("_f"))
    val ret = sum(when(d > col("_f"), 1L).otherwise(0L))
    ud.join(fs, u === col("_fu"))
      .groupBy(unix_date(d).cast("long").as("day"))
      .agg(count(lit(1)).cast("long").as("active_users"),
        sum(when(d === col("_f"), 1L).otherwise(0L)).cast("long")
          .as("new_users"),
        ret.cast("long").as("returning_users"),
        round(ret.cast("double") / count(lit(1)), 4).as("returning_share"))
  }
}
