package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable bottom-k (KMV) sketch aggregate: keeps the k smallest DISTINCT
  * hash values seen per group. With a uniform hash on [0, 2^32), the k-th
  * minimum estimates distinct cardinality as `(k-1) · 2^32 / kth_min` —
  * the classic KMV/theta estimator, here DETERMINISTIC end to end because
  * the hash is the engine-portable md5 family ([[graft.operators.Dedup
  * .shingleHash]]) and a bottom-k SET is order-independent.
  *
  * Scale shape — this is the point of the sketch: a naive distinct count
  * shuffles every distinct (group, value) pair; this aggregate shuffles k
  * longs per (partition, group). `reduce` runs map-side (partial
  * aggregation), `merge` combines two k-arrays, so the exchange carries
  * sketches, not data. The buffer is a sorted distinct Array[Long] capped
  * at k: insert is a binary search + bounded copy (O(log k + k) per row,
  * k small), merge a linear merge keeping the k smallest.
  *
  * A typed `Aggregator` (not a Catalyst expression): aggregation buffers
  * are the one extension point where the typed API is the idiomatic Spark
  * path (`functions.udaf`), and the per-row cost is amortized by map-side
  * partial aggregation.
  */
final class BottomKSketch(k: Int)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = Array.emptyLongArray

  /** Insert keeping the buffer sorted + distinct + capped at k. */
  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    val idx = java.util.Arrays.binarySearch(buf, h)
    if (idx >= 0) buf // already present
    else {
      val ins = -idx - 1
      if (buf.length >= k && ins >= k) buf // larger than the current k-th
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, math.min(ins, n))
        if (ins < n) {
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        }
        out
      }
    }
  }

  /** Merge two sorted distinct arrays, keeping the k smallest distinct. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (o == 0 || out(o - 1) != v) { out(o) = v; o += 1 }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  // ExpressionEncoder so the buffer shuffles as a primitive long array and
  // the OUTPUT is a real array<bigint> column (element_at/size work on it).
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object BottomKSketch {
  /** Column form: `bottomK(64)(hashCol)` — a sorted array of the k
    * smallest distinct hashes per group. */
  def bottomK(k: Int): Column => Column = {
    val agg = udaf(new BottomKSketch(k))
    (c: Column) => agg(c)
  }
}
