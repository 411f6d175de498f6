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
}
