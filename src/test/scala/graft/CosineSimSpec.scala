package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Similarity

/** [[graft.functions.CosineSim]] — the native codegen'd cosine — must be
  * bitwise-identical to the interpreted HOF fold it replaces (the DuckDB
  * oracles were derived against the fold's exact arithmetic), including
  * its null semantics.
  */
class CosineSimSpec extends SparkSpec {

  // Zero-norm vectors are outside the data contract (cosine is undefined;
  // under ANSI mode the HOF fold even throws DIVIDE_BY_ZERO) — generate
  // vectors with at least one non-zero component, as real embeddings have.
  private def genVec(n: Int): Gen[List[Float]] =
    Gen.listOfN(n, Gen.chooseNum(-1e3f, 1e3f)).suchThat(_.exists(_ != 0f))

  test("property: native cosine === HOF fold cosine, bitwise") {
    import spark.implicits._
    val p = Prop.forAll(Gen.chooseNum(1, 65).flatMap(n =>
      Gen.zip(genVec(n), genVec(n)))) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(col("a").cast("array<float>").as("a"),
          col("b").cast("array<float>").as("b"))
      val Array(native, fold) = df.select(
        Similarity.cosine(col("a"), col("b")),
        Similarity.cosineFold(col("a"), col("b"))).collect()(0)
        .toSeq.map(_.asInstanceOf[Double]).toArray
      // Exact bit equality, not a tolerance: same fold order by contract.
      java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(fold)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.toString)
  }

  test("null semantics: length mismatch and null element yield NULL, like the fold") {
    import spark.implicits._
    val df = Seq(
      (Seq(1f, 2f), Seq(1f, 2f, 3f)),            // length mismatch
      (Seq(1f, 2f), null.asInstanceOf[Seq[Float]]) // null array
    ).toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"),
        col("b").cast("array<float>").as("b"))
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineFold(col("a"), col("b")).as("fold")).collect()
    out.foreach { r => assert(r.isNullAt(0) && r.isNullAt(1)) }
    // null ELEMENT (array<float> with a hole)
    val withHole = spark.sql(
      "SELECT CAST(array(1.0, NULL, 2.0) AS array<float>) a, " +
        "CAST(array(1.0, 1.0, 1.0) AS array<float>) b")
    val r2 = withHole.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineFold(col("a"), col("b")).as("fold")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
  }

  test("GraftExtensions: graft_cosine callable from spark.sql after registration") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(CAST(array(3.0, 4.0) AS array<float>), " +
        "CAST(array(3.0, 4.0) AS array<float>)) AS s, " +
        "graft_cosine(array(1.0, 0.0), array(0.0, 1.0)) AS o") // implicit cast
      .collect()(0)
    assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
      java.lang.Double.doubleToLongBits(1.0))
    assert(r.getDouble(1) === 0.0)
    // Config-time wiring instantiates and applies cleanly (the path
    // spark.sql.extensions=graft.functions.GraftExtensions exercises).
    new graft.functions.GraftExtensions()(
      new org.apache.spark.sql.SparkSessionExtensions)
    // Arity misuse is a clear error, not a Catalyst internal failure.
    val e = intercept[Exception](spark.sql("SELECT graft_cosine(array(1.0))").collect())
    assert(e.getMessage.contains("2 arguments"))
  }

  test("GraftExtensions: every scalar native expression reaches spark.sql") {
    graft.functions.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaro_winkler('martha', 'marhta') AS jw, " +
        "graft_seq_edit_distance(array('a','b','c'), array('a','x','c')) AS ed, " +
        "size(graft_ahash_bits(repeat('ab', 64))) AS ah, " +
        "graft_ahash_bits('short') AS ahn").collect()(0)
    assert(r.getDouble(0) === graft.functions.JaroWinkler.similarity(
      "martha", "marhta"))
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 64)
    assert(r.isNullAt(3)) // < 64 code points => NULL, through SQL too
    val e1 = intercept[Exception](
      spark.sql("SELECT graft_seq_edit_distance(array('a'))").collect())
    assert(e1.getMessage.contains("2 arguments"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_ahash_bits('a', 'b')").collect())
    assert(e2.getMessage.contains("1 argument"))
  }

  test("participates in whole-stage codegen (doGenCode path, not fallback)") {
    // spark.range keeps a real physical source (a local Seq would be
    // constant-folded into a LocalTableScan by ConvertToLocalRelation), and
    // the arrays are built with plain array() — a transform() HOF here
    // would itself kick the Project out of codegen. fallback=false makes a
    // broken doGenCode throw instead of silently interpreting.
    val df = spark.range(100).select(
      array((col("id") + 1).cast("float"), (col("id") + 2).cast("float")).as("a"),
      array((col("id") * 2 + 1).cast("float"), (col("id") + 3).cast("float")).as("b"))
      .select(Similarity.cosine(col("a"), col("b")).as("sim"))
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec
        if w.toString.contains("graft_cosine") => w
    }
    assert(wscg.nonEmpty, df.queryExecution.executedPlan.toString)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val v = df.agg(min(col("sim"))).collect()(0).getDouble(0)
      assert(v > 0.0 && v <= 1.0)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }
}
