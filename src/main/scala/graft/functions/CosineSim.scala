package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd cosine similarity over two `array<float>` columns.
  *
  * Spark's built-in route for this arithmetic is higher-order functions
  * (`zip_with` + `aggregate`, see [[graft.operators.Similarity.cosineFold]])
  * — correct, but HOFs are interpreted (no `doGenCode`), allocate a lambda
  * frame per element, and box every float. This expression is the
  * "custom Catalyst Expression beats UDF beats interpreted" rung of the
  * extension ladder: one fused primitive loop, participating in whole-stage
  * codegen, no allocation.
  *
  * Arithmetic parity contract (the DuckDB oracles depend on it): each
  * accumulator folds in element order with per-element double widening —
  * `dot += (double)x_i * (double)y_i`, norms likewise, result
  * `dot / (sqrt(na) * sqrt(nb))`. This is bitwise-identical to the
  * sequential-left-fold formula it replaces; the spec asserts exact (===)
  * equality against the HOF version, not approximate.
  *
  * Null semantics match the HOF composition: any null element, null array,
  * or length mismatch yields NULL (zip_with pads the shorter array with
  * nulls, and `aggregate`'s sum propagates them).
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // mismatch/null-element => NULL
  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  boolean $anyNull = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { $anyNull = true; break; }
         |    final double $xi = (double) $x.getFloat($i);
         |    final double $yi = (double) $y.getFloat($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(
      new CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))
}
