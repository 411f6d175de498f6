package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, TextAnalysis}

/** Deterministic sampling/split (operators/Sampling.scala) and TF-IDF
  * (TextAnalysis.tfIdf): assignment stability properties and a
  * hand-computed scoring fixture. */
class SamplingSpec extends SparkSpec {

  test("split: deterministic, partitioning-independent, covers all rows") {
    import spark.implicits._
    val ids = (1L to 500L).toDF("doc_id")
    val a = Sampling.split(ids, "doc_id", "split", 80, 10)
    val b = Sampling.split(ids.repartition(7), "doc_id", "split", 80, 10)
    assertSameRows(a, b) // partitioning never changes an assignment
    val counts = a.groupBy(col("split")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum === 500L)
    // Hash-uniform: train ≈ 80%, val ≈ 10%, test ≈ 10% (loose bounds).
    assert(counts("train") > 350 && counts("train") < 450)
    assert(counts("val") > 20 && counts("val") < 80)
    assert(counts("test") > 20 && counts("test") < 80)
  }

  test("split: growing the corpus never reassigns existing rows") {
    import spark.implicits._
    val small = Sampling.split((1L to 100L).toDF("doc_id"), "doc_id", "s", 80, 10)
    val grown = Sampling.split((1L to 1000L).toDF("doc_id"), "doc_id", "s", 80, 10)
      .filter(col("doc_id") <= 100)
    assertSameRows(small, grown)
  }

  test("sample: subset of input, disjoint salts are independent") {
    import spark.implicits._
    val ids = (1L to 1000L).toDF("doc_id")
    val s10 = Sampling.sample(ids, "doc_id", "a", 10)
    val n10 = s10.count()
    assert(n10 > 50 && n10 < 200) // ~10%
    // Nested property: a pct<=pct' sample is a subset of the larger one
    // (same salt) — the bucket predicate is monotone.
    val s50 = Sampling.sample(ids, "doc_id", "a", 50)
    assert(s10.join(s50, Seq("doc_id"), "left_anti").count() === 0L)
  }

  test("capPerGroup: at most k per group, partitioning-independent, deterministic") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (i, s"g${i % 3}"))
    val df = rows.toDF("doc_id", "grp")
    val capped = Sampling.capPerGroup(df, Seq("grp"), "doc_id", "cap", 10)
    val byGroup = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGroup === Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L))
    // Same selection no matter how the input is partitioned.
    val repart = Sampling.capPerGroup(df.repartition(7), Seq("grp"), "doc_id",
      "cap", 10)
    assertSameRows(capped, repart)
    // And the kept rows are a subset of the input (a filter, not a rewrite).
    assert(capped.join(df, Seq("doc_id", "grp"), "left_anti").count() === 0L)
  }

  test("packSequences: exclusive prefix sum, boundary straddle, shard isolation") {
    import spark.implicits._
    // One shard; hash order is deterministic but opaque, so feed equal
    // token counts and check the packing arithmetic, not the order.
    val docs = (0L until 6L).map(i => (i, "s", 30)).toDF("doc_id", "shard", "n_tokens")
    val packed = Sampling.packSequences(docs, Seq("shard"), "doc_id",
      "n_tokens", "pack", 100L).collect()
    // 30-token docs into a 100 budget: prefixes 0,30,60,90,120,150 →
    // seq ids 0,0,0,0,1,1; the 4th doc STRADDLES (offset 90) and belongs
    // to sequence 0 where its first token lands.
    val seqIds = packed.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(seqIds === Seq((0L, 0L), (0L, 30L), (0L, 60L), (0L, 90L),
      (1L, 20L), (1L, 50L)))
    // Shards pack independently: duplicating the docs into a second shard
    // yields the same ids/offsets per shard.
    val two = docs.unionByName(docs.withColumn("shard", lit("t")))
    val byShard = Sampling.packSequences(two, Seq("shard"), "doc_id",
      "n_tokens", "pack", 100L).collect()
      .groupBy(_.getAs[String]("shard"))
      .view.mapValues(_.map(r => (r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset")))
        .sortBy(t => (t._1, t._2)).toSeq).toMap
    assert(byShard("s") === byShard("t"))
  }

  test("tfIdf: hand-computed fixture, top-k cut and tie-break") {
    import spark.implicits._
    // 4 docs; "common" appears in all (idf=0 → score 0), "rare" in one.
    val docs = Seq(
      (1L, "common rare rare alpha"),
      (2L, "common alpha"),
      (3L, "common beta"),
      (4L, "common beta alpha")).toDF("doc_id", "text")
    val out = TextAnalysis.tfIdf(docs, 2)
    val byDoc = out.collect().groupBy(_.getLong(0))
    // doc 1: rare tf=2 df=1 → 2*ln(4)=2.772589; alpha tf=1 df=3 → ln(4/3)
    val d1 = byDoc(1L).map(r => (r.getString(1), r.getDouble(4))).toMap
    assert(d1.keySet === Set("rare", "alpha"))
    assert(math.abs(d1("rare") - 2.772589) < 1e-6)
    assert(math.abs(d1("alpha") - 0.287682) < 1e-6)
    // common scores 0 everywhere (ln(4/4)) and must lose to any positive
    // term; doc 2 has only alpha (positive) and common (0) — both kept at
    // k=2, ordered alpha first.
    val d2 = byDoc(2L).map(r => (r.getString(1), r.getDouble(4))).toMap
    assert(d2 === Map("alpha" -> 0.287682, "common" -> 0.0))
  }

  test("stratified sample: per-group pct, default fallback, agrees with plain sample") {
    import spark.implicits._
    val df = (1L to 200L).map(i =>
      (i, if (i % 2 == 0) "a" else "b")).toDF("id", "g")
    // a → 100%, b → default 0%: exactly the 'a' rows survive.
    val allA = Sampling.stratifiedSample(df, "g", "id", "s",
      Map("a" -> 100), 0)
    assert(rows(allA) === rows(df.filter($"g" === "a")))
    // Per-group 30% must equal the PLAIN 30% sample restricted to that
    // group — same hash, same salt, so stratification only swaps the pct.
    val strat = Sampling.stratifiedSample(df, "g", "id", "s",
      Map("a" -> 30), 0)
    assert(rows(strat) ===
      rows(Sampling.sample(df.filter($"g" === "a"), "id", "s", 30)))
  }

  test("shardLayout: dense per-shard positions, partitioning-independent, append-stable shards") {
    import spark.implicits._
    val ids = (1L to 300L).toDF("doc_id")
    val a = Sampling.shardLayout(ids, "doc_id", "sh", 8)
    // Partitioning never changes the layout.
    assertSameRows(a, Sampling.shardLayout(ids.repartition(7), "doc_id", "sh", 8))
    // Every row lands in a shard; positions within a shard are dense 0..n-1.
    val got = a.collect().map(r => (r.getInt(1), r.getLong(2))).groupBy(_._1)
    assert(got.values.map(_.length).sum === 300)
    got.foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq === (0L until rs.length).toSeq)
    }
    assert(got.keySet.subsetOf((0 until 8).toSet))
    // Appending rows never moves an existing row to a different shard (pos
    // may shift — the shard assignment is the stable contract).
    val grownShards = Sampling.shardLayout((1L to 600L).toDF("doc_id"),
      "doc_id", "sh", 8).filter($"doc_id" <= 300).select($"doc_id", $"shard")
    assertSameRows(a.select($"doc_id", $"shard"), grownShards)
  }

  test("weightedSamplePerGroup: dominant weight always sampled first, k capped, reproducible") {
    import spark.implicits._
    // key = u^(1/w): a huge weight pushes the key to ~1 regardless of u,
    // so the heavy doc deterministically outranks the unit-weight crowd.
    val df = ((1L to 50L).map(i => ("g", i, 1L)) :+ (("g", 99L, 1000000000L)))
      .toDF("lang", "doc_id", "n_chars")
    val out = Sampling.weightedSamplePerGroup(df, "lang", "doc_id", "n_chars", "s", 10)
    val got = out.orderBy($"smp_rank").collect()
    assert(got.length === 10)
    assert(got.head.getAs[Long]("doc_id") === 99L)
    // Pure hash arithmetic: same result under a different partitioning.
    assertSameRows(out,
      Sampling.weightedSamplePerGroup(df.repartition(7), "lang", "doc_id",
        "n_chars", "s", 10))
  }

  test("domainReweight: rates = target/actual normalized to max 1; absent domains dropped; deterministic") {
    import spark.implicits._
    // a: 60 rows, b: 30, c: 10 (actual .6/.3/.1); target a .2, b .8.
    // ratios: a = .2/.6 = 1/3, b = .8/.3 = 8/3 → rates a .125, b 1.0;
    // c absent → dropped.
    val df = ((1L to 60L).map(i => (i, "a")) ++ (61L to 90L).map(i => (i, "b"))
      ++ (91L to 100L).map(i => (i, "c"))).toDF("id", "dom")
    val out = Sampling.domainReweight(df, "id", "dom",
      Map("a" -> 0.2, "b" -> 0.8), "t")
    val rates = out.select($"dom", $"keep_rate").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(rates("a") === 0.125 && rates("b") === 1.0)
    assert(!rates.contains("c"))
    // Rate-1.0 domain keeps every row; selection is partitioning-invariant.
    assert(out.filter($"dom" === "b").count() === 30L)
    assertSameRows(out, Sampling.domainReweight(df.repartition(7), "id",
      "dom", Map("a" -> 0.2, "b" -> 0.8), "t"))
  }

  test("curriculumOrder: quartile tiles from exact percentiles; no window in the plan") {
    import spark.implicits._
    // Difficulties 1..4 → rounded quartile bounds 1.75/2.5/3.25 → one doc
    // per tile.
    val df = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "diff")
    val out = Sampling.curriculumOrder(df, "id", "diff", "curr")
    val tiles = out.orderBy($"id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(tiles.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)))
    // Shuffle key is the deterministic hash bucket — partitioning-invariant.
    assertSameRows(out, Sampling.curriculumOrder(df.repartition(5), "id",
      "diff", "curr"))
    // The whole operator must plan without a Window (no ntile/row_number).
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"curriculum must not window:\n$plan")
  }

  test("crossSplitPairs: only split-crossing pairs survive, scores pass through") {
    import spark.implicits._
    val pairs = Seq((1L, 2L, 0.9), (3L, 4L, 0.85), (5L, 6L, 0.8))
      .toDF("id_a", "id_b", "jaccard")
    val assign = Seq((1L, "train"), (2L, "test"), (3L, "train"), (4L, "train"),
      (5L, "val"), (6L, "test")).toDF("doc_id", "split")
    val out = Sampling.crossSplitPairs(pairs, "id_a", "id_b",
        assign, "doc_id", "split")
      .select($"id_a", $"id_b", $"jaccard", $"split_a", $"split_b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getString(3), r.getString(4)))
    // (3,4) both train — not leakage; the two crossing pairs keep their
    // similarity score and carry each side's split.
    assert(out.toSet === Set(
      (1L, 2L, 0.9, "train", "test"),
      (5L, 6L, 0.8, "val", "test")))
  }

  test("tokenBudget: water line caps only the sources above it and hits the budget") {
    import spark.implicits._
    val rows = Seq(("s1", 10L), ("s2", 20L), ("s3", 70L)).toDF("src", "ntok")
    val out = Sampling.tokenBudget(rows, "src", "ntok", 0.5)
      .orderBy($"src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    // total 100, budget 50: cap solves 10 + 2c = 50 -> c = 20.
    assert(out.toSeq === Seq(("s1", 10L, 10L, false),
      ("s2", 20L, 20L, false), ("s3", 70L, 20L, true)))
    assert(out.map(_._3).sum === 50L)
  }

  test("tokenBudget: a budget >= the corpus leaves every source uncapped") {
    import spark.implicits._
    val rows = Seq(("s1", 10L), ("s2", 90L)).toDF("src", "ntok")
    val out = Sampling.tokenBudget(rows, "src", "ntok", 1.0)
      .orderBy($"src").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq(("s1", 10L, 10L, false), ("s2", 90L, 90L, false)))
  }

  test("cluster-grain split: every cluster lands atomically, so cross-split near-dup pairs are zero") {
    import spark.implicits._
    // 60 docs in 20 clusters of 3: id-grain splitting WOULD scatter some
    // cluster (80/10/10 over 3 members); cluster-grain cannot.
    val lab = (1L to 60L).map(i => (i, (i - 1) / 3)).toDF("doc_id", "cluster_id")
    val out = graft.operators.Sampling.split(lab, "cluster_id", "csplit", 80, 10)
    val perCluster = out.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("ns")).collect()
    assert(perCluster.forall(_.getLong(1) === 1L))
    // Within-cluster pairs (the near-dup pair analog) never cross splits.
    val pairs = (1L to 60L by 3).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val leaks = graft.operators.Sampling.crossSplitPairs(
      pairs, "id_a", "id_b", out.select($"doc_id", $"split"), "doc_id", "split")
    assert(leaks.count() === 0L)
  }

  test("rebalanceAudit: rendezvous moves far fewer keys than modulo; identical counts move none") {
    import spark.implicits._
    val ids = (1L to 400L).toDF("id")
    val out = graft.operators.Sampling.rebalanceAudit(ids, "id", "s", 4, 6)
      .orderBy($"strategy").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq("mod", "rendezvous"))
    assert(out.forall(_._2 === 400L))
    val (modMoved, hrwMoved) = (out(0)._3, out(1)._3)
    // Theory: mod moves ≈ 1 − 4/12 = 2/3; rendezvous ≈ (6−4)/6 = 1/3.
    assert(hrwMoved < modMoved)
    assert(out(1)._4 > 0.2 && out(1)._4 < 0.47)
    // Same shard count on both sides: nothing may move under either scheme.
    val same = graft.operators.Sampling.rebalanceAudit(ids, "id", "s", 6, 6)
      .collect().map(_.getLong(2))
    assert(same.toSeq === Seq(0L, 0L))
  }

  test("halfSampleCi: constant values collapse the CI to the mean; tiny groups NULL; deterministic") {
    import spark.implicits._
    // Constant column: every replicate mean equals the full mean no
    // matter which rows it holds → se = 0, CI degenerates to the mean.
    val const = (1L to 40L).map(i => ("g", i, 7L)).toDF("grp", "id", "v")
    val c = graft.operators.Sampling.halfSampleCi(const, "grp", "id", "v", 8)
      .collect().head
    assert((c.getLong(1), c.getDouble(2), c.getDouble(3), c.getDouble(4),
      c.getDouble(5)) === (40L, 7.0, 0.0, 7.0, 7.0))
    // A 1-row group: some replicate is empty → NULL se and CI, no error.
    val tiny = Seq(("t", 1L, 5L)).toDF("grp", "id", "v")
    val t = graft.operators.Sampling.halfSampleCi(tiny, "grp", "id", "v", 8)
      .collect().head
    assert(t.isNullAt(3) && t.isNullAt(4) && t.isNullAt(5))
    // Hash-seeded ⇒ bit-identical across runs.
    val varied = (1L to 40L).map(i => ("g", i, i)).toDF("grp", "id", "v")
    val a = graft.operators.Sampling.halfSampleCi(varied, "grp", "id", "v", 8)
      .collect().head
    val b = graft.operators.Sampling.halfSampleCi(varied, "grp", "id", "v", 8)
      .collect().head
    assert(a === b && !a.isNullAt(3) && a.getDouble(3) > 0.0)
  }
}
