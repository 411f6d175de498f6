package graft

import org.apache.spark.sql.functions._
import graft.functions.{ScoredId, TopKAgg}

/** Unit laws for the bounded top-k aggregate plus the plan property that
  * justifies its existence: partial (map-side) aggregation, so the
  * exchange carries k-capped buffers, never the group's full row set. */
class TopKAggSpec extends SparkSpec {

  private val agg = new TopKAgg(3)

  test("reduce keeps the buffer sorted, capped at k, ties to smallest id") {
    var buf = agg.zero
    for (x <- Seq(ScoredId(1.0, 10), ScoredId(5.0, 20), ScoredId(3.0, 30),
      ScoredId(5.0, 5), ScoredId(0.5, 40)))
      buf = agg.reduce(buf, x)
    assert(buf === Seq(ScoredId(5.0, 5), ScoredId(5.0, 20), ScoredId(3.0, 30)))
    // A candidate worse than the current k-th leaves the buffer untouched.
    assert(agg.reduce(buf, ScoredId(2.0, 99)) === buf)
  }

  test("merge is a k-capped ordered union and agrees with reduce-in-any-order") {
    val xs = Seq(ScoredId(4.0, 1), ScoredId(2.0, 2), ScoredId(9.0, 3),
      ScoredId(4.0, 0), ScoredId(7.0, 9))
    val (l, r) = xs.splitAt(2)
    val viaMerge = agg.merge(
      l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
    val direct = xs.foldLeft(agg.zero)(agg.reduce)
    assert(viaMerge === direct)
    assert(viaMerge === Seq(ScoredId(9.0, 3), ScoredId(7.0, 9), ScoredId(4.0, 0)))
  }

  test("property: any split + any order folded through reduce/merge == sorted take-k") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val ord = Ordering.by[ScoredId, (Double, Long)](s => (-s.score, s.id))
    val genXs = Gen.listOfN(25, for {
      sc <- Gen.chooseNum(-5.0, 5.0)
      // Coarse score grid → frequent ties, exercising the id tie-break.
      id <- Gen.choose(0L, 50L)
    } yield ScoredId(math.rint(sc * 2) / 2, id))
    val prop = Prop.forAll(genXs, Gen.choose(1, 6), Gen.choose(1, 5), Gen.choose(0L, 99L)) {
      (xs, k, nSplits, seed) =>
        val a = new TopKAgg(k)
        val shuffled = new scala.util.Random(seed).shuffle(xs)
        val parts = shuffled.grouped(
          math.max(1, shuffled.size / nSplits)).toList
        val merged = parts.map(_.foldLeft(a.zero)(a.reduce))
          .foldLeft(a.zero)(a.merge)
        // Model mirrors the aggregate's SQL-style zero normalization:
        // -0.0 and 0.0 are the same score (total-ordering sortBy would
        // otherwise rank them as distinct keys).
        val model = xs.map(s =>
          if (s.score == 0.0) ScoredId(0.0, s.id) else s)
        a.finish(merged) == model.sorted(ord).take(k)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("end-to-end equals the row_number window; partial agg in the plan") {
    import spark.implicits._
    val df = (1L to 100L).map(i => (i % 7, (i * 37 % 13).toDouble, i))
      .toDF("grp", "score", "id")
    val topk = TopKAgg.topK(3)
    val viaAgg = df.groupBy($"grp")
      .agg(topk($"score", $"id").as("_top"))
      .select($"grp", posexplode($"_top").as(Seq("_i", "_s")))
      .select($"grp", ($"_i" + 1).cast("long").as("rnk"),
        $"_s.id".as("id"), $"_s.score".as("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".desc, $"id".asc)
    val viaWindow = df.withColumn("rnk", row_number().over(w).cast("long"))
      .filter($"rnk" <= 3).select($"grp", $"rnk", $"id", $"score")
    assertSameRows(viaAgg, viaWindow)
    // Same result under a different physical partitioning.
    assertSameRows(
      viaAgg,
      df.repartition(11).groupBy($"grp")
        .agg(topk($"score", $"id").as("_top"))
        .select($"grp", posexplode($"_top").as(Seq("_i", "_s")))
        .select($"grp", ($"_i" + 1).cast("long").as("rnk"),
          $"_s.id".as("id"), $"_s.score".as("score")))
    // The plan must contain TWO ObjectHashAggregate nodes (partial +
    // final) — the map-side combine is the whole point vs a window sort.
    val plan = viaAgg.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregation:\n$plan")
  }
}
