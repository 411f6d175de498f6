package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.JaroWinkler

/** [[graft.functions.JaroWinkler]] — the native codegen'd scorer must
  * match its Scala reference bitwise (the generated Java is a transcription
  * of the same loops) and the reference itself must reproduce DuckDB's
  * `jaro_winkler_similarity` conventions, which the x136 oracle depends
  * on: floored transposition halving, the 0.7 boost threshold, prefix cap
  * 4, and empty-string ⇒ 0. The DuckDB-derived expected values below were
  * produced by the oracle engine itself (plus a 5000-case fuzz during
  * development, 0 mismatches). */
class JaroWinklerSpec extends SparkSpec {

  test("known cases pin the DuckDB conventions") {
    // (a, b, expected) — expected values computed by DuckDB's
    // jaro_winkler_similarity on these exact strings.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),  // prefix 3, boost applied
      ("dixon", "dicksonx", 0.8133333333333332), // asymmetric lengths
      ("dwayne", "duane", 0.8400000000000001),
      ("crate", "trace", 0.7333333333333334),    // no common prefix
      ("abcdef", "abzzzz", 0.5555555555555555),  // jaro ≤ 0.7 ⇒ NO boost
      ("abc", "abc", 1.0),
      ("", "", 0.0),                              // DuckDB: empty ⇒ 0
      ("a", "", 0.0),
      ("ab", "ba", 0.0),                          // window 0: no matches at all
      ("ab", "ab ", 0.9111111111111111))
    cases.foreach { case (a, b, want) =>
      val got = JaroWinkler.similarity(a, b)
      assert(got === want, s"similarity($a, $b) = $got, want $want")
    }
  }

  test("property: codegen path === reference eval, bitwise; symmetric") {
    import spark.implicits._
    val genStr = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', 'd', 'e', ' ')).map(_.mkString))
    val p = Prop.forAll(Gen.zip(genStr, genStr)) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
      val got = df.select(JaroWinkler(col("a"), col("b"))).collect()(0)
        .getDouble(0)
      val ref = JaroWinkler.similarity(a, b)
      val sym = JaroWinkler.similarity(b, a)
      java.lang.Double.doubleToLongBits(got) ==
        java.lang.Double.doubleToLongBits(ref) && math.abs(ref - sym) < 1e-12
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.toString)
  }

  test("null semantics and the whole-stage-codegen span") {
    import spark.implicits._
    val df = Seq((Option("abc"), Option.empty[String])).toDF("a", "b")
    assert(df.select(JaroWinkler(col("a"), col("b"))).collect()(0).isNullAt(0))
    // The expression must participate in whole-stage codegen — the whole
    // point of not shipping it as a UDF.
    val plan = spark.range(4)
      .select(concat(lit("ab"), col("id")).as("a"),
        concat(lit("ba"), col("id")).as("b"))
      .select(JaroWinkler(col("a"), col("b")))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
  }
}
