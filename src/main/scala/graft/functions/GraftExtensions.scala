package graft.functions

import org.apache.spark.sql.{GraftBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration of graft's native Catalyst expressions — the
  * `SparkSessionExtensions` rung of the extension ladder: a user who only
  * speaks `spark.sql(...)` gets the same codegen'd primitives as the
  * Column-API paths, with no UDF in sight.
  *
  * Two wirings, same registry entries:
  *
  *  - cluster/config: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)` at build time) — the
  *    standard extension-library deployment;
  *  - live session: [[GraftExtensions.register]] injects into an already
  *    built session's function registry (what the specs and the bundled
  *    mains use — they receive the session from the driver contract).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def info(name: String, clazz: Class[_], usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "", "", "", "", "", "", "built-in")

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a, b) => mk(a, b)
    case args => throw new IllegalArgumentException(
      s"$name expects 2 arguments, got ${args.size}")
  }

  /** (identifier, info, builder) triples for `injectFunction`. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_cosine"),
        info("graft_cosine", classOf[CosineSim],
          "graft_cosine(a, b) - cosine similarity of two float arrays (codegen'd)"),
        binary("graft_cosine", CosineSim(_, _))))

  /** Register into a live session (idempotent — re-registration overwrites
    * with identical entries). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fi, builder) =>
      GraftBridge.registerFunction(spark, id, fi, builder)
    }
}
