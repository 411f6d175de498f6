package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the data-layout half of multi-dimensional
  * pruning: interleaving the bits of several dimension keys gives a single
  * sort key under which rows close in EVERY dimension land close on disk,
  * so per-file min/max statistics stay narrow in all dimensions at once
  * and a predicate on ANY clustered dimension prunes files. A linear sort
  * gives this for its leading column only; Z-order trades a little of
  * that for pruning power on all of them (spec-pinned in ZOrderSpec).
  *
  * The z-value is pure integer bit arithmetic over normalized dimension
  * values — one codegen'd projection, engine-portable (the oracle
  * reproduces it with the same shifts), no UDF. */
object ZOrder {

  /** Morton interleave of `cols` (each already normalized to
    * [0, 2^bits)): bit b of dimension i lands at position
    * `b * cols.length + i`. Requires bits·ndim ≤ 62 (long-safe). */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty && bits > 0 && bits * cols.length <= 62,
      "need 1+ dims and bits*ndim <= 62")
    cols.zipWithIndex.flatMap { case (c, i) =>
      (0 until bits).map { b =>
        shiftleft(shiftright(c.cast("bigint"), b).bitwiseAND(lit(1L)),
          b * cols.length + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** Write `df` clustered by the z-value of `dims` into `nFiles` files:
    * range-partition on the z-value (so each file owns a contiguous
    * z-range) and sort within partitions. ONE range shuffle — no global
    * sort; at scale `nFiles` is the table's file budget and the range
    * exchange samples, never collects. */
  def clusteredWrite(df: DataFrame, dims: Seq[Column], bits: Int,
                     nFiles: Int, path: String): Unit =
    df.withColumn("_z", zValue(dims, bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
}
