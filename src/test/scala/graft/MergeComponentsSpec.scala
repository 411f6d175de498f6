package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean
import graft.operators.Dedup

/** Incremental component maintenance (r11): [[Dedup.mergeComponents]]
  * must compose — folding any batch split of an edge list through
  * merge-then-relabel equals one-shot [[Dedup.connectedComponents]] over
  * the whole list. Scalacheck over random graphs plus hand cases for the
  * merge topologies (bridge two components, absorb a new chain, untouched
  * components keep their labels without being recomputed).
  */
class MergeComponentsSpec extends SparkSpec {

  private def check(name: String, p: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$name: $res")
  }

  private def df(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  private def labelsOf(d: DataFrame): Set[(Long, Long)] =
    d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private val genEdges: Gen[List[(Long, Long)]] =
    Gen.listOfN(14, for {
      a <- Gen.choose(0L, 15L)
      b <- Gen.choose(0L, 15L) if a != b
    } yield (math.min(a, b), math.max(a, b)))

  test("property: mergeComponents over any batch split == one-shot connectedComponents") {
    val prop = Prop.forAll(genEdges, Gen.choose(0, 14), Gen.choose(0, 14)) {
      (edges, cutA, cutB) =>
        edges.nonEmpty ==> {
          val Seq(c1, c2) = Seq(cutA, cutB).sorted.map(_ min edges.length)
          val batches = Seq(edges.take(c1), edges.slice(c1, c2),
            edges.drop(c2)).filter(_.nonEmpty)
          val empty = df(Seq.empty[(Long, Long)])
            .select(col("id_a").as("node"), col("id_b").as("label"))
          val folded = batches.foldLeft(empty) { (lab, b) =>
            Dedup.mergeComponents(lab, df(b), "id_a", "id_b")
              .localCheckpoint(eager = true)
          }
          val oneShot = Dedup.connectedComponents(df(edges), "id_a", "id_b")
          labelsOf(folded) == labelsOf(oneShot)
        }
    }
    check("split equivalence", prop)
  }

  test("property: re-merging already-merged pairs is a labeling no-op (replay idempotence)") {
    val prop = Prop.forAll(genEdges, Gen.choose(0, 14)) { (edges, cut) =>
      edges.nonEmpty ==> {
        val c = cut min edges.length
        val base =
          if (c == 0)
            df(Seq.empty[(Long, Long)])
              .select(col("id_a").as("node"), col("id_b").as("label"))
          else Dedup.connectedComponents(df(edges.take(c)), "id_a", "id_b")
        val once = Dedup.mergeComponents(base, df(edges.drop(c) match {
            case Nil => edges.take(1); case rest => rest
          }), "id_a", "id_b").localCheckpoint(eager = true)
        val twice = Dedup.mergeComponents(once, df(edges.drop(c) match {
            case Nil => edges.take(1); case rest => rest
          }), "id_a", "id_b")
        labelsOf(twice) == labelsOf(once)
      }
    }
    check("replay no-op", prop)
  }

  test("mergeComponents: a bridge edge merges two components; untouched labels survive verbatim") {
    // Existing: {1,2} labeled 1, {5,6} labeled 5, {8,9} labeled 8.
    val existing = Dedup.connectedComponents(
      df(Seq((1L, 2L), (5L, 6L), (8L, 9L))), "id_a", "id_b")
    // New batch: bridge 2-5 (merges {1,2}+{5,6} under min id 1) and a
    // brand-new pair (20,21); component {8,9} is untouched.
    val out = Dedup.mergeComponents(existing,
      df(Seq((2L, 5L), (20L, 21L))), "id_a", "id_b")
    assert(labelsOf(out) === Set(
      (1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L),
      (8L, 8L), (9L, 8L),
      (20L, 20L), (21L, 20L)))
  }

  test("mergeComponents: batch internal to one existing component is a no-op labeling") {
    val existing = Dedup.connectedComponents(
      df(Seq((1L, 2L), (2L, 3L))), "id_a", "id_b")
    val out = Dedup.mergeComponents(existing, df(Seq((1L, 3L))),
      "id_a", "id_b")
    assert(labelsOf(out) === labelsOf(existing))
  }

  test("mergeComponents: a new node chaining through an old component pulls the min id") {
    // {3,4} labeled 3; new node 0 attaches to 4 → merged min id is 0.
    val existing = Dedup.connectedComponents(df(Seq((3L, 4L))), "id_a", "id_b")
    val out = Dedup.mergeComponents(existing, df(Seq((0L, 4L))),
      "id_a", "id_b")
    assert(labelsOf(out) === Set((0L, 0L), (3L, 0L), (4L, 0L)))
  }
}
