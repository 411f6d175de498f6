package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native array-local Bloom candidate filter: keeps the elements of an
  * `array<string>` whose k probe positions are all set in the bitset.
  *
  * The composable route — `filter(grams, g => Bloom.mightContain(...))` —
  * is semantically identical but evaluates INTERPRETED: higher-order
  * functions have no `doGenCode`, so every element pays a per-gram
  * expression-tree walk over k× (xxhash64 + pmod + element_at on a
  * 1024-long literal + shifts), measured ~7x the whole query's budget on
  * x43 at sf0.1. This expression is the same "custom Expression beats
  * interpreted HOF" rung as [[CosineSim]]: one compiled loop per row, the
  * bitset a plain JVM long[] reference (never a Catalyst literal), zero
  * per-element allocation.
  *
  * Hash parity contract ([[Bloom.positions]] builds the bitset with SQL
  * `xxhash64(lit(i), value)`): position_i = pmod(XxHash64(value bytes,
  * seed = XxHash64(i: Int, seed 42)), mBits) — reproduced here via the
  * same `XxHash64Function` the SQL expression evaluates through, and
  * spec-pinned (===) against the SQL form. Null elements are dropped (a
  * null gram is no candidate); a null array stays null.
  */
case class BloomCandidates(child: Expression, bits: Seq[Long], mBits: Int,
                           kHashes: Int, padEmpty: Boolean = false)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = padEmpty)
  override def prettyName: String = "graft_bloom_candidates"

  @transient private lazy val bitWords: Array[Long] = bits.toArray
  // SQL xxhash64 folds children left-to-right from seed 42: the probe-index
  // literal hashes first and its result seeds the value hash.
  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(kHashes)(i => XxHash64Function.hash(i, IntegerType, 42L))

  private[functions] def mightContain(s: UTF8String): Boolean = {
    var i = 0
    while (i < kHashes) {
      val h = XxHash64Function.hash(s, StringType, seeds(i))
      val p = ((h % mBits) + mBits) % mBits // pmod: h can be negative
      if ((bitWords((p / 64).toInt) >>> (p % 64).toInt & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Compiled hot loop shared by eval and codegen.
    *
    * `padEmpty` makes a downstream plain `explode` carry the operator's
    * whole row-survival contract with NO Filter node: a non-empty input
    * with zero candidates returns `[null]` — a sentinel the explode keeps
    * (its null key matches nothing in the verify join, counting 0 hits) —
    * while an empty input returns `[]`, which the explode drops. A
    * `filter(n_grams > 0)` expressing the same thing gets predicate-pushed
    * to the scan WITH the gram-building pipeline substituted in, running
    * the interpreted tokenize+gram HOFs twice — the second time on the
    * pre-rebalance single-partition scan (measured 7x the whole query). */
  def candidates(input: ArrayData): ArrayData = {
    val n = input.numElements()
    val out = new Array[Any](n.max(1))
    var m = 0
    var i = 0
    while (i < n) {
      if (!input.isNullAt(i)) {
        val s = input.getUTF8String(i)
        if (mightContain(s)) { out(m) = s; m += 1 }
      }
      i += 1
    }
    if (padEmpty && m == 0 && n > 0) { out(0) = null; m = 1 }
    new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], m))
  }

  override protected def nullSafeEval(input: Any): Any =
    candidates(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomCandidates", this,
      classOf[BloomCandidates].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.candidates($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomCandidates =
    copy(child = newChild)
}

object BloomCandidates {
  /** Column-API entry point; `bits` from [[Bloom.build]]. */
  def apply(grams: Column, bits: Array[Long], mBits: Int, kHashes: Int,
            padEmpty: Boolean): Column =
    GraftBridge.column(new BloomCandidates(
      GraftBridge.expression(grams), bits.toIndexedSeq, mBits, kHashes, padEmpty))
}
