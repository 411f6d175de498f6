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

  test("property: funnel equals the naive min-chain joins on random event sets") {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(0, 30)
      evs <- Gen.listOfN(n, for {
        u <- Gen.choose(1, 5)
        t <- Gen.oneOf("view", "click", "purchase", "noise")
        ms <- Gen.choose(0L, 60L) // small range: ts collisions are common
      } yield (u.toLong, t, ms))
    } yield evs
    val prop = Prop.forAll(gen) { evs =>
      val df = evs.toDF("user_id", "event_type", "ms")
      val got = graft.operators.Funnel.funnel(df, "user_id", "event_type",
        "ms", Seq("view", "click", "purchase"))
      val v = df.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"ms").as("step0_ms"))
      val c = df.filter($"event_type" === "click").join(v, "user_id")
        .filter($"ms" > $"step0_ms")
        .groupBy($"user_id").agg(min($"ms").as("step1_ms"))
      val p = df.filter($"event_type" === "purchase").join(c, "user_id")
        .filter($"ms" > $"step1_ms")
        .groupBy($"user_id").agg(min($"ms").as("step2_ms"))
      val ref = v.join(c, Seq("user_id"), "left")
        .join(p, Seq("user_id"), "left")
        .withColumn("converted", $"step2_ms".isNotNull.cast("int"))
      sortedRows(got) == sortedRows(ref.select(got.columns.map(col): _*))
    }
    check("funnel-chain", prop)
  }

  test("property: incremental near-dup union equals one-shot for any disjoint split") {
    import spark.implicits._
    // Tiny vocabulary + short docs: near-dups and exact dups are common,
    // so the property exercises real pair emission, not empty sets.
    val word = Gen.oneOf("u", "v", "w", "x")
    val gen = for {
      n <- Gen.choose(2, 7)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(2, 9)
        ws <- Gen.listOfN(len, word)
      } yield ws.mkString(" "))
      split <- Gen.listOfN(n, Gen.oneOf(0, 1))
    } yield docs.zip(split).zipWithIndex
      .map { case ((t, b), i) => (i.toLong, t, b) }
    val prop = Prop.forAll(gen) { rows3 =>
      val df = rows3.toDF("doc_id", "text", "batch")
      val oneShot = graft.operators.Dedup.minHashNearDup(
        df.select($"doc_id", $"text"), "doc_id", "text", 3, 0.8)
      val idx = java.nio.file.Files.createTempDirectory("incnd-prop").toString
      val inc = (0 until 2).map(b =>
          graft.operators.Dedup.incrementalNearDup(
            df.filter($"batch" === b).select($"doc_id", $"text"),
            "doc_id", "text", 3, 0.8, s"$idx/index"))
        .reduce(_ unionByName _)
      sortedRows(inc) == sortedRows(oneShot)
    }
    check("incremental-near-dup", prop, cases = 4)
  }
}
