package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join: match point rows to interval rows of
  * the same key with `start <= pt < end` — e.g. messages to the stream
  * session they happened in (the reference keeps exactly these two tables:
  * per-channel message rows and the `streams` uptime intervals,
  * Bot.java:74-81; the dashboard never joins them only because PHP does it
  * per-request).
  *
  * Scale design — a range predicate alone gives Catalyst no equi-key, so the
  * naive plan is broadcast-nested-loop: O(|points|·|intervals|) per key,
  * dead at scale. Instead BUCKETIZE time: an interval is exploded to the
  * `bucketMs`-grain buckets it overlaps (bounded, ~(len/bucketMs)+1 rows,
  * choose bucketMs ≈ typical interval length); a point belongs to exactly
  * ONE bucket. The join becomes an EQUI-join on (key, bucket) — hash
  * partitioned, AQE-skew-splittable — followed by the exact containment
  * filter. Each (point, interval) match survives exactly once because the
  * point's single bucket is necessarily among the interval's buckets: no
  * dedup pass needed.
  */
object RangeJoin {

  /** @param points    rows with `keys` + `ptCol` (epoch-ms LONG)
    * @param intervals rows with `keys` + `startCol`/`endCol` (epoch-ms LONG,
    *                  half-open [start, end))
    * @param bucketMs  time-bucket grain for the equi-join key */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      keys: Seq[String], ptCol: String,
                      startCol: String, endCol: String,
                      bucketMs: Long): DataFrame = {
    // Guard malformed intervals FIRST: [s, e) with e <= s contains nothing,
    // and an open/sentinel end (e.g. ended_at=0 for a still-open stream)
    // would otherwise make `sequence` run DESCENDING and explode ~s/bucketMs
    // rows per bad interval before the containment filter drops them.
    val bucketed = intervals.filter(col(endCol) > col(startCol))
      .withColumn("_bkt",
        explode(sequence(expr(s"$startCol div $bucketMs"),
          expr(s"($endCol - 1) div $bucketMs"))))
    val pts = points.withColumn("_bkt", expr(s"$ptCol div $bucketMs"))
    pts.join(bucketed, keys :+ "_bkt")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("_bkt")
  }
}
