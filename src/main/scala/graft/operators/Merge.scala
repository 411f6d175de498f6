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
    * how a distributed engine should run it (no per-row conflict probing). */
  def additiveUpsert(state: DataFrame, delta: DataFrame, keys: Seq[String],
                     valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map(c => sum(col(c)).cast("long").as(c))
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** `SET col = EXCLUDED.col`: delta rows win on key conflict; state rows
    * without a conflicting delta pass through. Idempotent — replaying the
    * same delta yields the same table (the property the streaming upsert
    * sink relies on, SURVEY.md §7.3). */
  def replaceUpsert(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.join(delta.select(keys.map(col): _*), keys, "left_anti")
      .unionByName(delta.select(state.columns.map(col): _*))

  /** `ON CONFLICT DO NOTHING`: keep existing rows, insert only new keys. */
  def insertIgnore(state: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame =
    state.unionByName(
      delta.select(state.columns.map(col): _*)
        .dropDuplicates(keys)
        .join(state.select(keys.map(col): _*), keys, "left_anti"))
}
