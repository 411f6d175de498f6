package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.{Sampling, TextAnalysis}

/** Algebraic properties of the round-4 training-data operators, checked
  * with scalacheck over randomized inputs (bounded case counts — each
  * case runs real Spark jobs).
  *
  *  1. Sequence packing: offsets stay inside the budget; within a shard,
  *     seq ids are a non-decreasing function of prefix position and cover
  *     exactly ceil(total/budget) sequences when every doc fits.
  *  2. Mixture weights: a probability distribution (sum 1, all positive)
  *     for ANY corpus composition and any alpha in (0, 1].
  *  3. Repetition ratio: always in [0, 1); 0 for gram-free docs.
  */
class PipelinePropsSpec extends SparkSpec {

  private def check(name: String, p: Prop, cases: Int = 6): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$name: $res")
  }

  test("property: packSequences offsets < budget and ids are dense from 0") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.choose(1, 50))
      budget <- Gen.choose(60L, 200L)
    } yield (toks, budget)
    val prop = Prop.forAll(gen) { case (toks, budget) =>
      val docs = toks.zipWithIndex
        .map { case (t, i) => (i.toLong, "s", t) }
        .toDF("doc_id", "shard", "n_tokens")
      val rows = Sampling.packSequences(docs, Seq("shard"), "doc_id",
        "n_tokens", "pk", budget).collect()
      val offs = rows.map(_.getAs[Long]("seq_offset"))
      val ids = rows.map(_.getAs[Long]("seq_id"))
      val total = toks.map(_.toLong).sum
      // Every offset is a valid in-sequence position; ids span exactly the
      // prefix range (the last doc STARTS before `total`, so the max id is
      // (total - last_tokens) div budget — bounded by total div budget).
      offs.forall(o => o >= 0 && o < budget) &&
        ids.min == 0L && ids.max <= total / budget
    }
    check("packSequences", prop)
  }

  test("property: mixtureWeights is a probability distribution for any mix") {
    import spark.implicits._
    val gen = for {
      sizes <- Gen.listOfN(4, Gen.choose(1, 50))
      alpha <- Gen.choose(1, 10).map(_ / 10.0)
    } yield (sizes, alpha)
    val prop = Prop.forAll(gen) { case (sizes, alpha) =>
      val docs = sizes.zipWithIndex.flatMap { case (n, s) =>
        (0 until n).map(i => (s"src$s", s * 1000L + i))
      }.toDF("src", "doc_id")
      val w = TextAnalysis.mixtureWeights(docs, "src", alpha).collect()
        .map(_.getAs[Double]("weight"))
      w.length == sizes.length && w.forall(_ > 0) &&
        math.abs(w.sum - 1.0) < 1e-4
    }
    check("mixtureWeights", prop)
  }

  test("property: repetitionRatio stays in [0, 1)") {
    import spark.implicits._
    val word = Gen.oneOf("aa", "bb", "cc", "dd")
    val gen = Gen.listOfN(8, for {
      n <- Gen.choose(0, 12)
      ws <- Gen.listOfN(n, word)
    } yield ws.mkString(" "))
    val prop = Prop.forAll(gen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      TextAnalysis.repetitionRatio(docs, 2).collect().forall { r =>
        val ratio = r.getAs[Double]("rep_ratio")
        ratio >= 0.0 && ratio < 1.0 &&
          (r.getAs[Int]("n_grams") > 0 || ratio == 0.0)
      }
    }
    check("repetitionRatio", prop)
  }
}
