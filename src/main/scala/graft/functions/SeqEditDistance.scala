package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Levenshtein distance over two TOKEN SEQUENCES
  * (`array<string>` columns) — the word-level alignment primitive behind
  * WER (word error rate), the ASR/translation twin of the char-level
  * `levenshtein` Spark ships. Unit operations are whole-token
  * insert/delete/substitute with token equality by exact string match.
  *
  * Why an expression and not an encode-to-chars trick: mapping each
  * token to a character and calling the built-in `levenshtein` caps the
  * per-pair vocabulary at the char range the engines agree on (Spark's
  * `chr` masks to 8 bits; DuckDB's `levenshtein` is BYTE-based, so any
  * multi-byte alphabet diverges) and burns an O(|dict|) `array_position`
  * scan per token. This is the [[JaroWinkler]] rung of the extension
  * ladder instead: one fused DP kernel, whole-stage codegen via a shared
  * static helper, no alphabet bound. The classic two-row DP keeps memory
  * at O(min(m, n)) ints per row regardless of token counts, so a skewed
  * long-document pair costs time (m·n token compares) but never buffers
  * more than one DP row.
  *
  * Null tokens inside an array (the tokenizers here never emit them)
  * compare equal to each other and unequal to any string. */
case class SeqEditDistance(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_seq_edit_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SeqEditDistance.distance(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.SeqEditDistance.distance($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SeqEditDistance =
    copy(left = newLeft, right = newRight)
}

object SeqEditDistance {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(new SeqEditDistance(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Shared interpreted/codegen kernel: two-row Levenshtein DP over the
    * token arrays. The shorter sequence is taken as the DP row so memory
    * is O(min(m, n)); the longer side's tokens are materialized once
    * (not per cell) since `ArrayData.getUTF8String` re-slices. */
  def distance(a: ArrayData, b: ArrayData): Int = {
    val (row, colArr) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val m = row.numElements()
    val n = colArr.numElements()
    if (m == 0) return n
    // Materialize both sides once: getUTF8String allocates a slice per
    // call, and the DP touches every row token n times.
    val rt = new Array[UTF8String](m)
    var i = 0
    while (i < m) {
      rt(i) = if (row.isNullAt(i)) null else row.getUTF8String(i)
      i += 1
    }
    val prev = new Array[Int](m + 1)
    val cur = new Array[Int](m + 1)
    i = 0
    while (i <= m) { prev(i) = i; i += 1 }
    var j = 1
    while (j <= n) {
      cur(0) = j
      val cj = if (colArr.isNullAt(j - 1)) null else colArr.getUTF8String(j - 1)
      i = 1
      while (i <= m) {
        val eq =
          if (rt(i - 1) == null) cj == null
          else cj != null && rt(i - 1).equals(cj)
        val sub = prev(i - 1) + (if (eq) 0 else 1)
        val del = prev(i) + 1
        val ins = cur(i - 1) + 1
        var best = sub
        if (del < best) best = del
        if (ins < best) best = ins
        cur(i) = best
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      j += 1
    }
    prev(m)
  }
}
