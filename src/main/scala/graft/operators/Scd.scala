package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension history building — the warehouse-side
  * companion of the reference's upsert sinks: where
  * [[graft.streaming.ParquetUpsertSink]] keeps only the LATEST value per
  * key (SCD type 1, `DO UPDATE SET ended_at = EXCLUDED.ended_at` —
  * Bot.java:156-159), `scd2` keeps every historical value as a validity
  * interval `[valid_from, valid_to)` with an `is_current` flag — the
  * type-2 form feature stores and training-data snapshots need to answer
  * "what was this attribute AT time t" without a full event replay. */
object Scd {

  /** Collapse an event stream into per-key attribute VERSION intervals:
    * consecutive equal attribute values (in `(tsCol, tieCol)` order per
    * key) form one version; each version carries its first-seen
    * timestamp, the next version's start as its exclusive end
    * (`nowMillis` for the open current version), and its event count.
    *
    * Scale shape — ONE shuffle total: every step clusters by `keyCol`
    * (the change-detection window, the per-(key, version) aggregate, and
    * the valid_to lead window), and a hash partitioning on `keyCol`
    * satisfies the clustering requirement of the compound
    * `(key, attr, version)` aggregate, so Catalyst plans a single
    * Exchange and sorts within partitions. State per key is its version
    * count — dimension-sized, never event-sized, after the aggregate.
    *
    * Output: (keyCol, version BIGINT from 1, attrCol, valid_from,
    * valid_to, is_current, n_events BIGINT); timestamps epoch millis. */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tsMillis: Column, tieCol: String, nowMillis: Long): DataFrame = {
    // Windows bind to the PROJECTED `_t` (the caller's tsMillis
    // expression exists only before the first select).
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
    // Null-safe change marker (<=> keeps a null attribute from starting
    // a new version against itself); the first row per key always marks.
    val chg = when(!(col(attrCol) <=> lag(col(attrCol), 1).over(wOrd)), 1L)
      .otherwise(0L)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("_t"), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    events
      .select(col(keyCol), col(attrCol), tsMillis.as("_t"), col(tieCol))
      .withColumn("version", sum(chg).over(wRun))
      .groupBy(col(keyCol), col("version"), col(attrCol))
      .agg(min(col("_t")).as("valid_from"),
        count(lit(1)).as("n_events"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wVer), lit(nowMillis)))
      .withColumn("is_current",
        lead(col("valid_from"), 1).over(wVer).isNull)
      .select(col(keyCol), col("version"), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events"))
  }
}
