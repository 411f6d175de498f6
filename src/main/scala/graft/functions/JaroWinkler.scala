package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd Jaro–Winkler similarity over two string columns —
  * the record-linkage scorer (Winkler 1990) behind name/title matching,
  * where edit distance over-penalizes transpositions and under-credits
  * shared prefixes. Spark ships `levenshtein` but nothing in this
  * family; a Scala UDF would box both strings and fall out of
  * whole-stage codegen, so this is the [[CosineSim]] rung of the
  * extension ladder: one fused primitive loop via a codegen'd static
  * helper.
  *
  * Convention contract (the DuckDB oracle's `jaro_winkler_similarity`
  * reproduces these exactly, spec-pinned):
  *   - match window `max(l1, l2)/2 − 1` (floored at 0), one-to-one
  *     greedy matching left to right;
  *   - transpositions = mismatched matched pairs / 2, FLOORED (the
  *     integer-division convention DuckDB ships; the fuzz spec pins it);
  *   - Winkler prefix boost `+ prefix · 0.1 · (1 − jaro)` with prefix
  *     capped at 4, applied ONLY when jaro exceeds the 0.7 boost
  *     threshold;
  *   - either string empty ⇒ 0.0 (DuckDB's convention, including
  *     empty-vs-empty).
  *
  * Arithmetic is char-based (UTF-16 code units) — identical to byte- or
  * codepoint-based scoring on ASCII corpora; supplementary-plane input
  * would diverge from DuckDB and is out of contract. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val func = ctx.addNewFunction("graftJaroWinkler",
        s"""
           |private double graftJaroWinkler(String s1, String s2) {
           |  final int l1 = s1.length();
           |  final int l2 = s2.length();
           |  if (l1 == 0 || l2 == 0) return 0.0;
           |  final int win = Math.max(Math.max(l1, l2) / 2 - 1, 0);
           |  final boolean[] m1 = new boolean[l1];
           |  final boolean[] m2 = new boolean[l2];
           |  int m = 0;
           |  for (int i = 0; i < l1; i++) {
           |    final int hi = Math.min(l2 - 1, i + win);
           |    for (int j = Math.max(0, i - win); j <= hi; j++) {
           |      if (!m2[j] && s1.charAt(i) == s2.charAt(j)) {
           |        m1[i] = true; m2[j] = true; m++; break;
           |      }
           |    }
           |  }
           |  if (m == 0) return 0.0;
           |  int t = 0;
           |  int k = 0;
           |  for (int i = 0; i < l1; i++) {
           |    if (m1[i]) {
           |      while (!m2[k]) k++;
           |      if (s1.charAt(i) != s2.charAt(k)) t++;
           |      k++;
           |    }
           |  }
           |  final double dm = (double) m;
           |  final double jaro = (dm / l1 + dm / l2 + (dm - t / 2) / dm) / 3.0;
           |  if (jaro <= 0.7) return jaro;
           |  int p = 0;
           |  final int pmax = Math.min(4, Math.min(l1, l2));
           |  while (p < pmax && s1.charAt(p) == s2.charAt(p)) p++;
           |  return jaro + p * 0.1 * (1.0 - jaro);
           |}
         """.stripMargin)
      s"${ev.value} = $func($x.toString(), $y.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      new JaroWinkler(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Reference implementation — the interpreted eval path AND the spec's
    * parity anchor for the generated code (asserted === equal). */
  private[graft] def similarity(s1: String, s2: String): Double = {
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val win = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + win)
      var j = math.max(0, i - win)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val dm = m.toDouble
    val jaro = (dm / l1 + dm / l2 + (dm - t / 2) / dm) / 3.0
    if (jaro <= 0.7) return jaro
    var p = 0
    val pmax = math.min(4, math.min(l1, l2))
    while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
    jaro + p * 0.1 * (1.0 - jaro)
  }
}
