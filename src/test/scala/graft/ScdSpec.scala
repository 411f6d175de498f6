package graft

import org.apache.spark.sql.functions._
import graft.operators.Scd

/** SCD2 history building (operators/Scd.scala): version segmentation,
  * interval chaining, open-tail handling — and the one-shuffle plan
  * claim (every step clusters by the key). */
class ScdSpec extends SparkSpec {

  private val NOW = 1000L

  private def history(rows: Seq[(Long, String, Long, Long)]) = {
    import spark.implicits._
    Scd.scd2(rows.toDF("k", "attr", "t", "id"), "k", "attr",
      col("t"), "id", NOW)
  }

  test("versions segment on change; intervals chain; tail is open") {
    // k=1: a,a,b,a — the value RETURNS, so version 3 must be a new 'a',
    // not merged with version 1 (the bug a plain groupBy(key, attr)
    // would have). k=2: single run stays one current version.
    val out = history(Seq(
      (1L, "a", 10L, 1L), (1L, "a", 20L, 2L), (1L, "b", 30L, 3L),
      (1L, "a", 40L, 4L),
      (2L, "x", 5L, 5L))).orderBy(col("k"), col("version"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", 10L, 30L, false, 2L),
      (1L, 2L, "b", 30L, 40L, false, 1L),
      (1L, 3L, "a", 40L, NOW, true, 1L),
      (2L, 1L, "x", 5L, NOW, true, 1L)))
  }

  test("same-timestamp events order by the tie column deterministically") {
    val out = history(Seq(
      (1L, "b", 10L, 2L), (1L, "a", 10L, 1L), (1L, "c", 10L, 3L)))
      .orderBy(col("version"))
      .collect().map(r => (r.getLong(1), r.getString(2)))
    assert(out.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("scd2Merge: extends same-attr open versions, closes on change, numbering continues") {
    import spark.implicits._
    val older = Seq((1L, "a", 10L, 1L), (1L, "b", 20L, 2L),
      (2L, "x", 5L, 3L)).toDF("k", "attr", "t", "id")
    val newer = Seq(
      (1L, "b", 30L, 4L), // same attr as open v2 → extends (n_events 2)
      (1L, "c", 40L, 5L), // change → closes v2, opens v3
      (2L, "y", 50L, 6L), // change for k=2
      (3L, "q", 60L, 7L)) // key first seen in the batch
      .toDF("k", "attr", "t", "id")
    val hist = Scd.scd2(older, "k", "attr", col("t"), "id", NOW)
    val merged = Scd.scd2Merge(hist, newer, "k", "attr", col("t"), "id", NOW)
    val out = merged.orderBy(col("k"), col("version")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5), r.getLong(6)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", 10L, 20L, false, 1L),
      (1L, 2L, "b", 20L, 40L, false, 2L),
      (1L, 3L, "c", 40L, NOW, true, 1L),
      (2L, 1L, "x", 5L, 50L, false, 1L),
      (2L, 2L, "y", 50L, NOW, true, 1L),
      (3L, 1L, "q", 60L, NOW, true, 1L)))
  }

  test("property: scd2Merge over ANY event-time split chain equals the one-shot build") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val genEvents: Gen[List[(Long, String, Long)]] = Gen.listOf(for {
      k <- Gen.choose(1L, 4L)
      a <- Gen.oneOf("a", "b", "c")
      t <- Gen.choose(0L, 100L)
    } yield (k, a, t))
    val genCuts: Gen[List[Long]] = Gen.listOfN(2, Gen.choose(0L, 100L))
    val prop = Prop.forAll(genEvents, genCuts) { (evs, cuts) =>
      // Distinct ids double as the order tie-break; event-time splits at
      // the sorted cut points → up to a 3-way incremental chain.
      val rows = evs.zipWithIndex.map { case ((k, a, t), i) =>
        (k, a, t, i.toLong) }
      val df = rows.toDF("k", "attr", "t", "id")
      val oneShot = Scd.scd2(df, "k", "attr", col("t"), "id", NOW)
      val Seq(c1, c2) = cuts.sorted
      val parts = Seq(
        df.filter(col("t") < c1),
        df.filter(col("t") >= c1 && col("t") < c2),
        df.filter(col("t") >= c2))
      val chained = parts.tail.foldLeft(
        Scd.scd2(parts.head, "k", "attr", col("t"), "id", NOW)) {
        (h, batch) => Scd.scd2Merge(h, batch, "k", "attr", col("t"), "id", NOW)
      }
      sortedRows(chained) == sortedRows(oneShot)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.toString)
  }

  test("pitJoin: facts pick the version valid AT their ts; boundary joins the new version; pre-history facts get nulls") {
    import spark.implicits._
    val events = Seq((1L, "a", 10L, 1L), (1L, "b", 30L, 2L))
      .toDF("k", "attr", "t", "id")
    val hist = Scd.scd2(events, "k", "attr", col("t"), "id", NOW)
    val facts = Seq(
      (101L, 1L, 5L),  // before any version → nulls
      (102L, 1L, 10L), // exactly v1's valid_from → v1
      (103L, 1L, 29L), // inside v1 → v1 (v2 at t=30 must NOT leak back)
      (104L, 1L, 30L), // exactly the v1→v2 boundary → v2
      (105L, 2L, 50L)) // key with no history at all → nulls
      .toDF("fact_id", "k", "t")
    val out = Scd.pitJoin(facts, hist.withColumnRenamed("attr", "state"),
        "k", "t", Seq("version", "state"), "state_from")
      .orderBy(col("fact_id")).collect()
      .map(r => (r.getLong(0), Option(r.get(4)), Option(r.get(5))))
    assert(out.toSeq === Seq(
      (101L, None, None),
      (102L, Some(1L), Some("a")),
      (103L, Some(1L), Some("a")),
      (104L, Some(2L), Some("b")),
      (105L, None, None)))
  }

  test("one Exchange total: change window, aggregate, and lead reuse the key clustering") {
    import spark.implicits._
    val df = (1 to 100).map(i => ((i % 7).toLong, s"v${i % 3}", i.toLong, i.toLong))
      .toDF("k", "attr", "t", "id")
    val plan = Scd.scd2(df, "k", "attr", col("t"), "id", NOW)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected one shuffle, plan:\n$plan")
  }
}
