package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BottomKSketch, CountMinSketch}

/** Sketch-based approximate aggregates (north-star extension).
  *
  * Unlike Spark's built-in `approx_count_distinct` (HLL++, whose register
  * layout no oracle engine reproduces), the KMV bottom-k sketch is exact
  * arithmetic over the engine-portable md5 hash family: the k smallest
  * distinct hashes — and therefore the estimate — are IDENTICAL in any
  * engine that hashes the same way, so the sketch is hash-checkable
  * against DuckDB like every other operator here. */
object Sketch {

  /** Per-group approximate distinct count via the mergeable
    * [[BottomKSketch]] (KMV estimator, `(k-1)·2^32 / kth_min`; exact when
    * a group has fewer than k distinct values).
    *
    * Scale shape: ONE partial-aggregated shuffle carrying k-long sketches
    * per (partition, group) — never the distinct value set. Contrast with
    * exact distinct-count, whose first shuffle carries every distinct
    * (group, value) pair; at 100 TB that difference is the operator. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val h: Column = Dedup.shingleHash(
      concat(lit("kmv:"), col(valueCol).cast("string")))
    val estNum = (k - 1).toLong * 4294967296L // (k-1) · 2^32, exact in i64
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(BottomKSketch.bottomK(k)(col("_h")).as("_sk"))
      .select(groupCols.map(col) ++ Seq(
        size(col("_sk")).cast("bigint").as("n_kept"),
        element_at(col("_sk"), size(col("_sk"))).as("kth_min")): _*)
      .withColumn("n_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${estNum}L div kth_min")))
  }

  /** The depth seeded hash positions of a value for the CMS matrix —
    * md5-family arithmetic, identical wherever it is evaluated. */
  def cmsPositions(value: Column, depth: Int, width: Int): Seq[Column] =
    (0 until depth).map { i =>
      pmod(Dedup.shingleHash(concat(lit(s"cms$i:"), value)), lit(width.toLong))
        .cast("int")
    }

  /** EXACT heavy hitters through a count-min pre-filter — the two-pass
    * frequent-items shape for domains whose distinct cardinality dwarfs
    * the heavy set (corpus n-grams: billions distinct, thousands heavy).
    *
    * Pass 1 folds the whole value stream into ONE depth×width CMS
    * (map-side combined; the shuffle carries 512 KiB matrices per
    * partition, never values) collected as bounded driver metadata.
    * Pass 2 re-scans, keeps only rows whose CMS estimate ≥ threshold —
    * an ARRAY-LOCAL test against the literal matrix, no join — and
    * exact-counts the survivors. CMS never underestimates, so every
    * occurrence of every truly-heavy value survives the filter: the
    * final HAVING makes the result EXACT (false positives are counted
    * and cut, never missed).
    *
    * Contrast with the naive `groupBy(value).count()`: its shuffle
    * carries one row per (partition, DISTINCT value) — the full vocab.
    * Here the exact aggregate only ever sees candidate rows.
    *
    * Output: (valueCol, n BIGINT) with n ≥ threshold, exact. */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, threshold: Long,
                      depth: Int = 4, width: Int = 16384): DataFrame = {
    val posArr = array(cmsPositions(col(valueCol), depth, width): _*)
    // Bounded driver metadata: depth*width longs (the sketch), not data.
    val sk: Array[Long] = df.select(posArr.as("_pos"))
      .agg(CountMinSketch.cms(depth, width)(col("_pos")).as("_sk"))
      .collect()(0).getSeq[Long](0).toArray
    val skLit = typedLit(sk.toSeq)
    val est = cmsPositions(col(valueCol), depth, width).zipWithIndex.map {
      case (p, i) => element_at(skLit, p + lit(i * width) + 1)
    }.reduce(least(_, _))
    df.filter(est >= threshold)
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
