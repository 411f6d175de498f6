package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One (score, id) candidate held by [[TopKAgg]]. Ordering is score DESC
  * then id ASC — the id tie-break makes the aggregate fully deterministic
  * (repo convention: every ranked surface has a key tie-break). */
final case class ScoredId(score: Double, id: Long)

/** Mergeable bounded top-k aggregate: keeps the k largest (score, id)
  * pairs per group, ties broken by smallest id.
  *
  * Scale shape — the reason this exists next to `row_number()`: a window
  * top-k SORTS every group's full row set after shuffling all of it; this
  * aggregate is a bounded insertion buffer with map-side partial
  * aggregation, so each partition contributes at most k candidates per
  * group to the exchange and nothing is ever fully sorted. On a 100 TB
  * events table with millions of rows per hot user, the window ships and
  * sorts all of them; this ships k per partition. Insert is a binary
  * search + bounded copy (O(log k + k)); merge is a linear merge of two
  * sorted arrays capped at k.
  *
  * A typed `Aggregator` (same rationale as [[BottomKSketch]]): an
  * aggregation BUFFER is the one extension point where `functions.udaf`
  * is the idiomatic Spark path, and map-side combine amortizes the
  * per-row object cost.
  */
final class TopKAgg(k: Int)
    extends Aggregator[ScoredId, Seq[ScoredId], Seq[ScoredId]] {
  require(k > 0, "k must be positive")

  /** true iff a ranks strictly before b (score desc, id asc). */
  @inline private def before(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[ScoredId] = Vector.empty

  override def reduce(buf: Seq[ScoredId], x0: ScoredId): Seq[ScoredId] = {
    // Normalize -0.0 to 0.0 on the way IN (Spark SQL comparison treats
    // them equal and normalizes in exchange/sort keys): without this, a
    // buffer could hold -0.0 and 0.0 as distinct-looking peers whose
    // emitted order differs from the SQL window's.
    val x = if (x0.score == 0.0) ScoredId(0.0, x0.id) else x0
    if (buf.length >= k && !before(x, buf.last)) buf
    else {
      val ins = buf.indexWhere(b => before(x, b)) match {
        case -1 => buf.length
        case i  => i
      }
      (buf.take(ins) :+ x) ++ buf.drop(ins).take(k - ins - 1)
    }
  }

  override def merge(a: Seq[ScoredId], b: Seq[ScoredId]): Seq[ScoredId] = {
    val out = Vector.newBuilder[ScoredId]
    var i = 0; var j = 0; var n = 0
    val lim = math.min(a.length + b.length, k)
    while (n < lim) {
      val takeA = j >= b.length || (i < a.length && before(a(i), b(j)))
      out += (if (takeA) a(i) else b(j))
      if (takeA) i += 1 else j += 1
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    ExpressionEncoder[Seq[ScoredId]]()
}

object TopKAgg {
  /** Column form: `topK(3)(scoreCol, idCol)` — an array<struct<score,id>>
    * of the k best candidates per group, rank order = array order. */
  def topK(k: Int): (Column, Column) => Column = {
    val agg = udaf(new TopKAgg(k), ExpressionEncoder[ScoredId]())
    (score: Column, id: Column) => agg(score, id)
  }
}
