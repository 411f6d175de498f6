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

  private def unary(name: String, mk: Expression => Expression)
      : Seq[Expression] => Expression = {
    case Seq(a) => mk(a)
    case args => throw new IllegalArgumentException(
      s"$name expects 1 argument, got ${args.size}")
  }

  /** (identifier, info, builder) triples for `injectFunction` — every
    * scalar native expression in this package (the aggregates register
    * through the Column API only; SQL aggregate injection needs the
    * FunctionRegistry's agg builder plumbing and no SQL consumer asked). */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (FunctionIdentifier("graft_cosine"),
        info("graft_cosine", classOf[CosineSim],
          "graft_cosine(a, b) - cosine similarity of two float arrays (codegen'd)"),
        binary("graft_cosine", CosineSim(_, _))),
      (FunctionIdentifier("graft_jaro_winkler"),
        info("graft_jaro_winkler", classOf[JaroWinkler],
          "graft_jaro_winkler(a, b) - Jaro-Winkler similarity of two strings (codegen'd)"),
        binary("graft_jaro_winkler", JaroWinkler(_, _))),
      (FunctionIdentifier("graft_seq_edit_distance"),
        info("graft_seq_edit_distance", classOf[SeqEditDistance],
          "graft_seq_edit_distance(a, b) - Levenshtein distance between two string arrays (token-sequence WER kernel, codegen'd)"),
        binary("graft_seq_edit_distance", SeqEditDistance(_, _))),
      (FunctionIdentifier("graft_ahash_bits"),
        info("graft_ahash_bits", classOf[AHashBits],
          "graft_ahash_bits(s) - 64-window aHash bit vector over a string payload (codegen'd; NULL below 64 code points)"),
        unary("graft_ahash_bits", AHashBits(_))))

  /** Register into a live session (idempotent — re-registration overwrites
    * with identical entries). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, fi, builder) =>
      GraftBridge.registerFunction(spark, id, fi, builder)
    }
}
