package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable Gram-matrix aggregate: accumulates the upper triangle of
  * Σ x·xᵀ over d-dimensional vectors, packed row-major into a
  * d·(d+1)/2 array.
  *
  * Scale shape — the reason covariance is an Aggregator and not an
  * explode: the naive formulation (posexplode twice, groupBy (i, j))
  * multiplies the row count by d² BEFORE the shuffle; this buffer does
  * all d² work inside the partition (map-side combine) and ships ONE
  * fixed-size array per partition to a single-group reduce — the same
  * treeAggregate-of-outer-products shape Spark MLlib's RowMatrix uses,
  * expressed through the supported `functions.udaf` seam. merge is
  * elementwise add, so the aggregate is order-insensitive up to float
  * fold order (downstream consumers round, per the repo's determinism
  * discipline).
  */
final class GramMatrixAgg(d: Int)
    extends Aggregator[Seq[Double], Array[Double], Seq[Double]] {
  require(d > 0, "dimension must be positive")
  private val len = d * (d + 1) / 2

  override def zero: Array[Double] = new Array[Double](len)

  override def reduce(buf: Array[Double], x: Seq[Double]): Array[Double] = {
    val xs = x.toArray
    var idx = 0
    var i = 0
    while (i < d) {
      val xi = xs(i)
      var j = i
      while (j < d) {
        buf(idx) += xi * xs(j)
        j += 1
        idx += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Double]): Seq[Double] = buf.toSeq

  override def bufferEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object GramMatrixAgg {
  /** Column form: `gram(d)(vec)` — one array<double> of the packed upper
    * triangle per group. Unpack with [[unpack]]. */
  def gram(d: Int): Column => Column = {
    val agg = udaf(new GramMatrixAgg(d), ExpressionEncoder[Seq[Double]]())
    (v: Column) => agg(v)
  }

  /** Unpack a collected packed upper triangle into the full symmetric
    * d×d matrix (driver-side helper for bounded-metadata consumers). */
  def unpack(packed: Seq[Double], d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    var idx = 0
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        m(i)(j) = packed(idx)
        m(j)(i) = packed(idx)
        j += 1
        idx += 1
      }
      i += 1
    }
    m
  }
}
