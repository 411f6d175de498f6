package graft

import org.apache.spark.sql.functions._
import graft.functions.GramMatrixAgg

class GramMatrixAggSpec extends SparkSpec {

  test("hand-computed 2x2 upper triangle") {
    val a = new GramMatrixAgg(2)
    // rows (1,2) and (3,4): Σxxᵀ = [[10, 14], [14, 20]] → packed [10, 14, 20]
    val buf = Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)).foldLeft(a.zero)(a.reduce)
    assert(a.finish(buf) === Seq(10.0, 14.0, 20.0))
    assert(GramMatrixAgg.unpack(Seq(10.0, 14.0, 20.0), 2)
      .map(_.toSeq).toSeq === Seq(Seq(10.0, 14.0), Seq(14.0, 20.0)))
  }

  test("property: any split + any order through reduce/merge equals one-pass (exact on integer grids)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val d = 4
    // Integer-valued components keep every product and sum exact in
    // double (well under 2^53), so split/order invariance is EXACT
    // equality, not tolerance.
    val genVec = Gen.listOfN(d, Gen.choose(-9, 9)).map(_.map(_.toDouble))
    val genXs = Gen.nonEmptyListOf(genVec).map(_.take(30))
    val prop = Prop.forAll(genXs, Gen.choose(1, 5), Gen.choose(0L, 99L)) {
      (xs, nSplits, seed) =>
        val a = new GramMatrixAgg(d)
        val onePass = a.finish(xs.foldLeft(a.zero)(a.reduce))
        val shuffled = new scala.util.Random(seed).shuffle(xs)
        val parts = shuffled.grouped(
          math.max(1, shuffled.size / nSplits)).toList
        val merged = a.finish(
          parts.map(_.foldLeft(a.zero)(a.reduce)).foldLeft(a.zero)(a.merge))
        merged == onePass
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("udaf path: map-side partial aggregation survives repartitioning") {
    import spark.implicits._
    val rows = (1 to 50).map(i =>
      Seq(i.toDouble % 7, (i * 3 % 5).toDouble, (i % 2).toDouble))
    val df = rows.toDF("v")
    val gram = GramMatrixAgg.gram(3)
    val one = df.agg(gram($"v")).head().getSeq[Double](0)
    val many = df.repartition(13).agg(gram($"v")).head().getSeq[Double](0)
    assert(one === many) // integer-valued grid → exact across partitionings
    // Spot-check against the naive computation.
    val naive = for (i <- 0 until 3; j <- i until 3)
      yield rows.map(r => r(i) * r(j)).sum
    assert(one === naive)
  }
}
