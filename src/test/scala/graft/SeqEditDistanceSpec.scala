package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.SeqEditDistance

/** [[graft.functions.SeqEditDistance]] — the token-sequence Levenshtein
  * kernel behind x149's WER. Pinned three ways: hand cases, a property
  * check against an independent full-matrix DP written here (the kernel
  * itself is a two-row DP with a shorter-side swap — different code
  * paths), and char-level agreement with Spark's built-in `levenshtein`
  * when every token is a single character (the two metrics coincide
  * exactly there, which is also what makes the x149 oracle's
  * dictionary-encode trick sound). */
class SeqEditDistanceSpec extends SparkSpec {

  private def ref(a: Seq[String], b: Seq[String]): Int = {
    // Independent reference: full (m+1)x(n+1) matrix, no row swap.
    val m = a.length; val n = b.length
    val d = Array.ofDim[Int](m + 1, n + 1)
    for (i <- 0 to m) d(i)(0) = i
    for (j <- 0 to n) d(0)(j) = j
    for (i <- 1 to m; j <- 1 to n)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(m)(n)
  }

  private def run(a: Seq[String], b: Seq[String]): Int = {
    import spark.implicits._
    Seq((a, b)).toDF("a", "b")
      .select(SeqEditDistance(col("a"), col("b"))).collect()(0).getInt(0)
  }

  test("known cases: identity, pure insert, substitution, swap costs 2, token != char grain") {
    assert(run(Seq("a", "b", "c"), Seq("a", "b", "c")) === 0)
    assert(run(Seq(), Seq("x", "y")) === 2)
    assert(run(Seq("x", "y"), Seq()) === 2)
    assert(run(Seq("a", "b", "c"), Seq("a", "x", "c")) === 1)
    // Adjacent transposition = delete + insert (no Damerau move).
    assert(run(Seq("a", "b"), Seq("b", "a")) === 2)
    // Whole-token substitution costs 1 no matter how unlike the tokens —
    // the word-grain semantics char-level levenshtein can't express.
    assert(run(Seq("kitten"), Seq("sitting")) === 1)
    assert(run(Seq("ab"), Seq("a", "b")) === 2) // 1 sub + 1 insert
  }

  test("property: two-row kernel === full-matrix reference; symmetric; single-char tokens === builtin levenshtein") {
    import spark.implicits._
    val genTok = Gen.oneOf("a", "b", "c", "d")
    val genSeq = Gen.chooseNum(0, 9).flatMap(n => Gen.listOfN(n, genTok))
    val p = Prop.forAll(Gen.zip(genSeq, genSeq)) { case (a, b) =>
      val want = ref(a, b)
      val df = Seq((a, b, a.mkString, b.mkString)).toDF("a", "b", "sa", "sb")
      val row = df.select(
        SeqEditDistance(col("a"), col("b")),
        SeqEditDistance(col("b"), col("a")),
        levenshtein(col("sa"), col("sb"))).collect()(0)
      row.getInt(0) == want && row.getInt(1) == want && row.getInt(2) == want
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(40), p)
    assert(res.passed, res.toString)
  }

  test("interpreted eval matches codegen (kernel is shared), null array => null, codegen span present") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.unsafe.types.UTF8String
    val toAd = (s: Seq[String]) =>
      ArrayData.toArrayData(s.map(UTF8String.fromString).toArray)
    assert(SeqEditDistance.distance(
      toAd(Seq("a", "b", "c")), toAd(Seq("a", "x", "c"))) === 1)
    val df = Seq((Option(Seq("a")), Option.empty[Seq[String]])).toDF("a", "b")
    assert(df.select(SeqEditDistance(col("a"), col("b")))
      .collect()(0).isNullAt(0))
    val plan = spark.range(4)
      .select(array(lit("a"), col("id").cast("string")).as("a"),
        array(lit("b"), col("id").cast("string")).as("b"))
      .select(SeqEditDistance(col("a"), col("b")))
      .queryExecution.executedPlan
    assert(plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.WholeStageCodegenExec]),
      plan.toString)
  }
}
