package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sweep-line interval-overlap analytics: how many intervals are open at
  * once over time. The reference's serving layer answers "which streams
  * were live" per request (streams table built by Bot.java:145-232,
  * queried MainController.php:41-207); the concurrency curve is the
  * classic roll-up of that table — peak concurrent live channels — and a
  * staple capacity-planning query in any events warehouse.
  */
object Overlap {

  /** The concurrency step function over `[startCol, endCol)` intervals:
    * one output row per distinct boundary timestamp `t`, with the count of
    * intervals open immediately AFTER all boundaries at `t` take effect
    * (+1 per start, -1 per end; equal timestamps net out first, so the
    * curve is tie-order independent).
    *
    * Scale shape — a global running sum is the textbook distributed
    * prefix-sum problem, and a bare `sum().over(Window.orderBy(t))` would
    * funnel every boundary through ONE task. Instead, three bounded
    * stages:
    *   1. boundaries collapse to net deltas at t-grain — one map-side-
    *      combined shuffle on `t`;
    *   2. nets roll up again to coarse time buckets (`bucketMs`, default
    *      one day) whose running carry-ins are computed on the DRIVER —
    *      bounded metadata (one row per bucket: a decade of data is ~3,650
    *      rows) broadcast back as a literal map;
    *   3. a per-bucket window adds `carry_in + local running net` — every
    *      bucket's cumsum runs in parallel, partitioned by `_b`.
    * No Exchange SinglePartition anywhere; stage 3's skew ceiling is one
    * bucket's boundary count, tunable via `bucketMs`.
    *
    * Input columns are epoch-millis longs. Output: `(t, concurrent)`.
    */
  def concurrency(intervals: DataFrame, startCol: String, endCol: String,
                  bucketMs: Long = 86400000L): DataFrame = {
    require(bucketMs > 0, "bucketMs must be positive")
    // Both deltas from ONE pass over the (possibly expensive) interval
    // frame — an explode of a 2-literal array, not a union of two scans.
    val deltas = intervals.select(explode(array(
        struct(col(startCol).as("t"), lit(1L).as("_d")),
        struct(col(endCol).as("t"), lit(-1L).as("_d")))).as("_x"))
      .select(col("_x.t").as("t"), col("_x._d").as("_d"))
    // The steps frame feeds BOTH the bucket-grain collect and the final
    // window; localCheckpoint materializes it once (ranked()'s discipline)
    // instead of re-running the upstream pipeline for each consumer.
    val steps0 = deltas.groupBy(col("t"))
      .agg(sum(col("_d")).as("_net"))
      .withColumn("_b", floor(col("t") / bucketMs))
    // Same toggle as Serving.ranked: reliable checkpoint on a real cluster
    // (survives executor loss), block-manager checkpoint locally.
    val steps =
      if (intervals.sparkSession.conf
        .getOption("spark.graft.reliableCheckpoint").contains("true"))
        steps0.checkpoint()
      else steps0.localCheckpoint()

    // Bounded driver metadata: one (bucket, net) row per coarse bucket.
    // The exclusive running sum over buckets is each bucket's carry-in.
    val bucketNets = steps.groupBy(col("_b"))
      .agg(sum(col("_net")).as("_bn"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val carryIn: Map[Long, Long] = bucketNets.map { case (b, n) =>
      val c = acc; acc += n; b -> c
    }.toMap

    val w = Window.partitionBy(col("_b")).orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    steps
      .withColumn("concurrent",
        (coalesce(element_at(typedLit(carryIn), col("_b")), lit(0L)) +
          sum(col("_net")).over(w)).cast("long"))
      .select(col("t"), col("concurrent"))
  }

  /** Per-key interval-UNION length: total time covered by at least one
    * `[startCol, endCol)` interval of that key — the coverage roll-up
    * ("how long was each channel live at all", utilization, SLA uptime)
    * where [[concurrency]] asks how DEEPLY covered. Overlaps never double
    * count: the sweep sums segment lengths where the running open-count
    * is positive.
    *
    * Scale shape: boundaries collapse to net deltas at (key, t) grain
    * FIRST (map-side-combined shuffle — the window input is distinct
    * timestamps, not intervals), then ONE (key)-partitioned window serves
    * both the running count and the segment `lead`; per-key sweeps run
    * partition-parallel, never a global sort. For a single key whose
    * distinct-boundary count outgrows one task, [[concurrency]]'s
    * bucket-carry decomposition is the documented split (covered length
    * is additive over buckets once carry-ins seed each bucket's running
    * count).
    *
    * Output: (keys..., covered_ms, n_points). */
  def coveredTime(intervals: DataFrame, keys: Seq[String],
                  startCol: String, endCol: String): DataFrame = {
    val deltas = intervals.select(keys.map(col) :+ explode(array(
        struct(col(startCol).as("t"), lit(1L).as("_d")),
        struct(col(endCol).as("t"), lit(-1L).as("_d")))).as("_x"): _*)
      .select(keys.map(col) :+ col("_x.t").as("t") :+ col("_x._d").as("_d"): _*)
    val steps = deltas.groupBy((keys.map(col) :+ col("t")): _*)
      .agg(sum(col("_d")).as("_net"))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("t"))
    val run = steps
      .withColumn("_conc", sum(col("_net")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_nxt", lead(col("t"), 1).over(w))
    run.where(col("_nxt").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(sum(when(col("_conc") > 0, col("_nxt") - col("t")).otherwise(0L))
        .cast("long").as("covered_ms"),
        count(lit(1)).cast("long").as("n_points"))
  }
}
