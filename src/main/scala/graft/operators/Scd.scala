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
    scd2Weighted(
      events.select(col(keyCol), col(attrCol), tsMillis.as("_t"),
        col(tieCol).as("_tie"), lit(1L).as("_w")),
      keyCol, attrCol, nowMillis, versionBase = lit(0L))
  }

  /** The shared core of [[scd2]] and [[scd2Merge]]: segment
    * (`_t`, `_tie`)-ordered rows per key into versions, where each row
    * carries a pre-aggregated event weight `_w` (1 for raw events; a
    * whole collapsed version's count for merge seeds) and `versionBase`
    * offsets the numbering (0 for a full build; the closed-version count
    * per key for an incremental merge). */
  private def scd2Weighted(rows: DataFrame, keyCol: String, attrCol: String,
                           nowMillis: Long, versionBase: Column): DataFrame = {
    val wOrd = Window.partitionBy(col(keyCol)).orderBy(col("_t"), col("_tie"))
    // Null-safe change marker (<=> keeps a null attribute from starting
    // a new version against itself); the first row per key always marks.
    val chg = when(!(col(attrCol) <=> lag(col(attrCol), 1).over(wOrd)), 1L)
      .otherwise(0L)
    val wRun = Window.partitionBy(col(keyCol)).orderBy(col("_t"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wVer = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    rows
      .withColumn("version", sum(chg).over(wRun) + versionBase)
      .groupBy(col(keyCol), col("version"), col(attrCol))
      .agg(min(col("_t")).as("valid_from"),
        sum(col("_w")).as("n_events"))
      .withColumn("valid_to",
        coalesce(lead(col("valid_from"), 1).over(wVer), lit(nowMillis)))
      .withColumn("is_current",
        lead(col("valid_from"), 1).over(wVer).isNull)
      .select(col(keyCol), col("version"), col(attrCol), col("valid_from"),
        col("valid_to"), col("is_current"), col("n_events"))
  }

  /** INCREMENTAL SCD2 maintenance — fold a batch of new events into an
    * existing [[scd2]] history without rescanning the event corpus: the
    * batch either EXTENDS each key's open version (same attribute — the
    * count grows, valid_from stays) or CLOSES it and opens new ones.
    * Equivalence `scd2(all) ≡ scd2Merge(scd2(older), newer)` for any
    * event-time split is the operator's contract (property-pinned in
    * ScdSpec across multi-way splits).
    *
    * Mechanics: closed versions pass through untouched; each key's open
    * version collapses to ONE seed row (t = valid_from, weight =
    * n_events) that re-enters the weighted segmentation together with
    * the new events, numbered from that key's closed-version count.
    * Late events older than an open version's start would reorder
    * against the seed — the same out-of-order limit the reference's
    * timer-flushed aggregations have; feed late data through a full
    * rebuild instead.
    *
    * Scale shape: per-batch cost is O(batch + dimension) — the pass
    * reads the history TABLE (version-grain, dimension-sized), never the
    * event corpus, and everything clusters by the key like [[scd2]]. */
  def scd2Merge(history: DataFrame, newEvents: DataFrame, keyCol: String,
                attrCol: String, tsMillis: Column, tieCol: String,
                nowMillis: Long): DataFrame = {
    val closed = history.filter(!col("is_current"))
    // Seed rows sort before any same-timestamp new event (tie = null
    // sorts first in ASC), so an equal-attribute batch row always joins
    // the seed's run rather than starting its own.
    val seeds = history.filter(col("is_current"))
      .select(col(keyCol), col(attrCol), col("valid_from").as("_t"),
        lit(null).cast("long").as("_tie"), col("n_events").as("_w"))
    val base = closed.groupBy(col(keyCol))
      .agg(count(lit(1)).as("_vbase"))
    val fresh = newEvents.select(col(keyCol), col(attrCol),
      tsMillis.as("_t"), col(tieCol).cast("long").as("_tie"),
      lit(1L).as("_w"))
    val reopened = scd2Weighted(
      seeds.unionByName(fresh)
        .join(base, Seq(keyCol), "left_outer")
        .withColumn("_vbase", coalesce(col("_vbase"), lit(0L))),
      keyCol, attrCol, nowMillis, versionBase = col("_vbase"))
    closed.select(reopened.columns.map(col): _*).unionByName(reopened)
  }

  /** Point-in-time enrichment against an [[scd2]] history — attach to each
    * fact row the dimension version VALID AT its timestamp (the feature-store
    * correctness rule: no attribute from the future may leak into a training
    * example). Facts with no version yet valid get nulls.
    *
    * Scale shape: because a key's versions partition its timeline
    * (`valid_from` of version n+1 == `valid_to` of version n), "the interval
    * containing t" is exactly "the latest valid_from <= t" — so this
    * delegates to [[AsofJoin.asofBackward]]'s union + one-window-per-key
    * linear pass. NO range join, NO per-fact interval probe: one shuffle on
    * the key, output exactly |facts| rows, and the history side is
    * dimension-sized (version grain), never event-sized.
    *
    * @param history  [[scd2]] output (needs `keyCol`, `valid_from`, `attrCols`)
    * @param attrCols history columns to attach (e.g. version, the attribute)
    * @param validFromAs output column carrying the matched version's
    *                    valid_from (null when no version was valid yet) */
  def pitJoin(facts: DataFrame, history: DataFrame, keyCol: String,
              tsCol: String, attrCols: Seq[String],
              validFromAs: String = "state_from"): DataFrame = {
    val versions = history.select(
      col(keyCol) +: col("valid_from").as(tsCol) +: attrCols.map(col): _*)
    AsofJoin.asofBackward(facts, versions, Seq(keyCol), tsCol, attrCols,
      validFromAs)
  }
}
