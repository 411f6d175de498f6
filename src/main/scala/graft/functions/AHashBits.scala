package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd aHash bit vector over a string payload: split the
  * code-point stream into 64 equal windows of `numChars div 64` code
  * points, bit i = [window-i code-point sum · 64 > total sum] — the
  * integer cross-product form, so no division or float enters the bits.
  * Payloads shorter than 64 code points yield NULL (no window).
  *
  * This replaces the interpreted higher-order-function composition in the
  * m6 hash stage (transform(sequence(0,63)) of aggregate(sequence(...))
  * of ascii(substr(...))) — notes_r8ao's documented 100 TB knob: the HOF
  * pipeline allocates a lambda frame per element and re-slices the string
  * per character (O(n) substr from index 0 under multi-byte encodings, so
  * O(n²) per payload), while this expression makes ONE forward pass over
  * the code points, participates in whole-stage codegen, and allocates
  * only the 64-slot sum array.
  *
  * Arithmetic parity contract (spec-pinned exact === against the HOF
  * composition): window sums fold the same per-code-point values Spark's
  * `ascii(substr(s, j, 1))` produces — the full Unicode code point at
  * 1-based character index j (DuckDB's `ord(s[j])`) — over the same
  * index ranges [i·wd+1, (i+1)·wd]; trailing code points past 64·wd are
  * ignored by both. */
case class AHashBits(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_ahash_bits needs a string payload, got ${child.dataType.sql}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // < 64 code points => NULL
  override def prettyName: String = "graft_ahash_bits"

  override protected def nullSafeEval(input: Any): Any =
    AHashBits.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.AHashBits.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AHashBits =
    copy(child = newChild)
}

object AHashBits {
  /** Column-API entry point. */
  def apply(payload: Column): Column =
    GraftBridge.column(new AHashBits(GraftBridge.expression(payload)))

  /** Shared interpreted/codegen kernel: one forward pass over the UTF-16
    * form, accumulating full code points into 64 equal windows. Returns
    * null below 64 code points. */
  def compute(s: UTF8String): ArrayData = {
    val n = s.numChars()
    if (n < 64) return null
    val wd = n / 64
    val limit = 64L * wd
    val sums = new Array[Long](64)
    val str = s.toString
    var charIdx = 0      // UTF-16 unit index into str
    var cpIdx = 0L       // code-point index
    val len = str.length
    while (charIdx < len && cpIdx < limit) {
      val cp = str.codePointAt(charIdx)
      sums((cpIdx / wd).toInt) += cp
      charIdx += Character.charCount(cp)
      cpIdx += 1
    }
    var total = 0L
    var i = 0
    while (i < 64) { total += sums(i); i += 1 }
    val bits = new Array[Int](64)
    i = 0
    while (i < 64) {
      bits(i) = if (sums(i) * 64L > total) 1 else 0
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(bits)
  }
}
