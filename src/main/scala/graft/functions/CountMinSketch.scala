package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable count-min sketch aggregate: a depth×width counter matrix
  * where each input increments one cell per row (position = seeded hash
  * of the value mod width) and a point estimate is the MIN over the
  * depth cells — an upper bound on the true count, never an
  * underestimate. That one-sided error is the load-bearing property:
  * used as a pre-filter in front of an exact verify, the sketch is
  * lossless for heavy-hitter mining (no true heavy value is missed).
  *
  * The input is the value's PRE-HASHED position array (computed by
  * codegen'd column expressions over the engine-portable md5 family —
  * see [[graft.operators.Sketch.cmsPositions]]), so the aggregate
  * itself does no string hashing and stays deterministic across runs
  * and partitionings.
  *
  * Scale shape: `reduce` runs map-side (partial aggregation), `merge`
  * is element-wise addition — the shuffle carries one depth×width long
  * array per (partition, group), never the value stream. The default
  * 4×16384 matrix is 512 KiB: per-partition, not per-row. */
final class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[Array[Int], Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  // Empty zero keeps untouched partitions from shuffling 512 KiB of
  // zeros; reduce/merge allocate the full matrix on first contact.
  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(buf: Array[Long], pos: Array[Int]): Array[Long] = {
    val b = if (buf.length == 0) new Array[Long](depth * width) else buf
    var i = 0
    while (i < depth) { b(i * width + pos(i)) += 1L; i += 1 }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
  }

  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.length == 0) new Array[Long](depth * width) else buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMinSketch {
  /** Column form: `cms(4, 16384)(positionsCol)` — the flattened
    * depth×width counter matrix for the group. */
  def cms(depth: Int, width: Int): Column => Column = {
    val agg = udaf(new CountMinSketch(depth, width))
    (c: Column) => agg(c)
  }
}
