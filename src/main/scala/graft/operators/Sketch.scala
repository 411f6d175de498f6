package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.BottomKSketch

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
}
