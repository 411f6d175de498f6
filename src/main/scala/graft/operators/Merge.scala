package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q19: the reference's upsert merge arithmetic, re-expressed as distributed
  * set operations. The reference lets PostgreSQL do this row-at-a-time
  * during the write:
  *
  *   - `ON CONFLICT DO UPDATE SET x = table.x + EXCLUDED.x` — additive merge
  *     of a delta batch into running stats (ChannelStatsAggregation.java:45-50,
  *     EmoteExtractor.java:248-250);
  *   - `ON CONFLICT DO UPDATE SET col = EXCLUDED.col` — replace-by-key
  *     (Bot.java:156-159, streams/channels tables);
  *   - `ON CONFLICT DO NOTHING` — insert-if-absent (EmoteExtractor.java:200-202).
  *
  * Scale notes: additive merge is union + one hash re-aggregation on the key
  * — a single shuffle, map-side combined, no join at all. Replace/ignore are
  * a left-anti join on the key; when one side is small (a micro-batch delta)
  * Spark broadcasts it and the big side never shuffles.
  */
object Merge {

  /** `SET x = x + EXCLUDED.x`: merge a delta into the state additively.
    * Keys absent from one side pass through (sum over the single present
    * value). Equivalent to re-aggregating state ∪ delta — which is exactly
    * how a distributed engine should run it (no per-row conflict probing).
    * Each merged column is cast back to the STATE's declared type (a blind
    * long cast would silently truncate fractional value columns on every
    * merge). */
  def additiveUpsert(state: DataFrame, delta: DataFrame, keys: Seq[String],
                     valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => sum(col(c)).cast(state.schema(c).dataType).as(c))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Deterministic one-row-per-key view: survivor = lexicographically
    * smallest by the non-key columns, so a duplicate-key batch resolves
    * identically on every run and partitioning (a bare `dropDuplicates`
    * keeps an arbitrary row). Per-key window — partition-parallel. */
  private def oneRowPerKey(df: DataFrame, keys: Seq[String]): DataFrame = {
    val others = df.columns.filterNot(keys.contains).toSeq
    if (others.isEmpty) df.dropDuplicates(keys)
    else {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(keys.map(col): _*)
        .orderBy(others.map(col(_).asc_nulls_first): _*)
      df.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
    }
  }

  /** `SET col = EXCLUDED.col`: delta rows win on key conflict; state rows
    * without a conflicting delta pass through. Idempotent — replaying the
    * same delta yields the same table (the property the streaming upsert
    * sink relies on, SURVEY.md §7.3). A delta carrying several rows for one
    * key keeps exactly one (deterministic survivor) — without that, the
    * one-row-per-key upsert invariant would silently break where Postgres'
    * ON CONFLICT would have errored. */
  def replaceUpsert(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    val d = oneRowPerKey(delta.select(state.columns.map(col): _*), keys)
    state.join(d.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(d)
  }

  /** `ON CONFLICT DO NOTHING`: keep existing rows, insert only new keys
    * (deterministic survivor among duplicate-key delta rows). */
  def insertIgnore(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(
      oneRowPerKey(delta.select(state.columns.map(col): _*), keys)
        .join(state.select(keys.map(col): _*), keys, "left_anti"))

  /** CDC change-log apply (the Debezium/warehouse "op log → table state"
    * collapse, the set-level generalization of [[replaceUpsert]]): fold a
    * log of upsert/delete operations into the final per-key state —
    * last-writer-wins by `seqCols`, and a key whose LAST op is the delete
    * op vanishes (a delete followed by a later re-insert survives).
    *
    * `seqCols` must totally order each key's changes (e.g. ts + a unique
    * change id) — with ties the survivor would be partition-dependent, so
    * that contract is the caller's (the spec pins it).
    *
    * Scale shape: ONE map-side-combined hash aggregation — `max_by` of the
    * payload struct over the seq struct merges partials associatively, so
    * each partition contributes one candidate row per key it has seen and
    * the exchange carries keys, not the log. The window-function phrasing
    * (`row_number` over ts DESC) would sort and ship EVERY log row; at
    * 100 TB of changes the agg is the only shape that works. Output rows =
    * live keys; columns = the log's minus `opCol`. */
  def applyChangeLog(changes: DataFrame, keys: Seq[String], opCol: String,
                     deleteOp: String, seqCols: Seq[String]): DataFrame =
    collapseChangeLog(changes, keys, seqCols)
      .filter(col(opCol) =!= lit(deleteOp))
      .drop(opCol)

  /** [[applyChangeLog]]'s inner collapse WITHOUT the tombstone filter:
    * latest row per key by `seqCols`, delete records retained as rows.
    * This is the form an INCREMENTAL/streaming CDC fold must persist —
    * a tombstone dropped from the state could not out-sequence a stale
    * upsert replaying later, so deletes stay as records and readers
    * filter them (tombstone GC past a retention horizon is the
    * documented production knob). Idempotent and order-insensitive:
    * `collapse(collapse(a) ∪ b) == collapse(a ∪ b)` for ANY split,
    * because per-key max over a total order is associative — the law the
    * streaming fold's batch steps build on (spec-pinned). */
  def collapseChangeLog(changes: DataFrame, keys: Seq[String],
                        seqCols: Seq[String]): DataFrame = {
    val others = changes.columns.filterNot(keys.contains).toSeq
    val last = changes.groupBy(keys.map(col): _*)
      .agg(max_by(struct(others.map(col): _*),
        struct(seqCols.map(col): _*)).as("_last"))
    last.select(keys.map(col) ++ others.map(c => col(s"_last.$c").as(c)): _*)
  }
}
