package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextAnalysis}

/** Behavior pins for the text-pipeline operators whose interesting cases
  * the synthetic corpus does not exercise (it contains no PII and no
  * near-identical reformatted copies). */
class TextAnalysisSpec extends SparkSpec {

  test("piiScrub: counts and redacts emails/phones/IPs (synthetic rows)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com or alice@test.org today"),
      (2L, "call 555-123-4567 from 10.0.0.1 please"),
      (3L, "nothing sensitive here")).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_email") === 2)
    assert(out(0).getAs[Int]("n_phone") === 0)
    assert(out(1).getAs[Int]("n_phone") === 1)
    assert(out(1).getAs[Int]("n_ip") === 1)
    assert(out(2).getAs[Int]("n_email") + out(2).getAs[Int]("n_phone") +
      out(2).getAs[Int]("n_ip") === 0)
    // The hash equals md5 of the text with placeholders substituted — the
    // scrub really rewrites, not just counts.
    val expected = spark.sql(
      "SELECT md5('call <PHONE> from <IP> please') AS h").head.getString(0)
    assert(out(1).getAs[String]("scrubbed_hash") === expected)
    // An un-redacted doc hashes to its original text.
    val plain = spark.sql(
      "SELECT md5('nothing sensitive here') AS h").head.getString(0)
    assert(out(2).getAs[String]("scrubbed_hash") === plain)
  }

  test("normalizedDedup collapses casing/whitespace variants exact dedup misses") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "  HELLO\tWORLD "),
      (4L, "something else")).toDF("doc_id", "text")
    val exact = Dedup.exactDedup(docs, "doc_id", "text")
    assert(exact.count() === 4) // byte-identical only — no collapse
    val norm = Dedup.normalizedDedup(docs, "doc_id", "text").collect()
    assert(norm.length === 2)
    val grp = norm.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_copies")).toMap
    assert(grp === Map(1L -> 3L, 4L -> 1L)) // min id canonical, 3 variants
  }

  test("mixtureWeights: alpha flattens the source distribution, weights sum to 1") {
    import spark.implicits._
    val docs = (Seq.fill(90)("big") ++ Seq.fill(10)("small"))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("doc_id", "src")
    val w = TextAnalysis.mixtureWeights(docs, "src", 0.3).collect()
      .map(r => r.getAs[String]("src") -> r.getAs[Double]("weight")).toMap
    assert(math.abs(w.values.sum - 1.0) < 1e-5)
    // alpha=0.3 compresses the 9:1 count ratio to 9^0.3 ≈ 1.93:1.
    val ratio = w("big") / w("small")
    assert(math.abs(ratio - math.pow(9.0, 0.3)) < 1e-3)
  }

  test("repetitionRatio: repeated bigrams raise the ratio; short docs score 0") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a b a b"),     // bigrams: ab ba ab ba ab → 5 total, 2 distinct
      (2L, "all distinct words here"),
      (3L, "one")).toDF("doc_id", "text") // too short for a bigram
    val out = TextAnalysis.repetitionRatio(docs, 2).orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("n_grams") === 5)
    assert(out(0).getAs[Int]("n_distinct") === 2)
    assert(out(0).getAs[Double]("rep_ratio") === 0.6)
    assert(out(1).getAs[Double]("rep_ratio") === 0.0)
    assert(out(2).getAs[Int]("n_grams") === 0)
    assert(out(2).getAs[Double]("rep_ratio") === 0.0)
  }

  test("decontaminate: overlap counts against a benchmark set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),   // grams incl "the quick brown"
      (2L, "completely unrelated text content here"),
      (3L, "to be")).toDF("doc_id", "text")     // too short for a 3-gram
    val bench = Seq(
      (100L, "the quick brown fox ran")).toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    // doc 1: 4 grams, 2 shared ("the quick brown", "quick brown fox").
    assert(out.length === 2) // doc 3 has no grams → absent
    assert(out(0).getAs[Long]("n_grams") === 4L)
    assert(out(0).getAs[Long]("n_overlap") === 2L)
    assert(out(0).getAs[Double]("contamination") === 0.5)
    assert(out(1).getAs[Long]("n_overlap") === 0L)
  }

  test("chunking: overlap windows, short tail, sub-stride doc keeps one chunk") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"), // 7 tokens, size 4 / overlap 1 → stride 3
      (2L, "x y"))           // shorter than one stride → single short chunk
      .toDF("doc_id", "text")
    val out = TextAnalysis.chunk(docs, "doc_id", "text", 4, 1)
      .orderBy($"doc_id", $"chunk_idx")
    assert(rows(out) === Set(
      Seq(1L, 0, 4, "a b c d"),
      Seq(1L, 1, 4, "d e f g"), // overlap: 'd' shared with chunk 0
      Seq(2L, 0, 2, "x y")))
  }

  test("boilerplate: repeated chunk surfaces with doc and occurrence counts") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the same boilerplate here and unique tail one"),
      (2L, "the same boilerplate here and unique tail two"),
      (3L, "entirely different body of text with no repeats"))
      .toDF("doc_id", "text")
    // 8-token docs, chunkSize 4: chunks (0: first 4 toks, 1: last 4).
    val out = TextAnalysis.boilerplate(docs, "doc_id", "text", 4).collect()
    assert(out.length === 1) // only "the same boilerplate here" repeats
    assert(out(0).getAs[Long]("n_docs") === 2L)
    assert(out(0).getAs[Long]("n_occurrences") === 2L)
  }

  test("unigramLmScore: mean token log-prob under the corpus unigram LM") {
    import spark.implicits._
    // Corpus counts: a=2, b=2, c=1, N=5.
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLmScore(docs).orderBy($"doc_id").collect()
    // doc1: all tokens have p=2/5 → score = ln(0.4) = -0.9163
    assert(out(0).getAs[Long]("n_tokens") === 3L)
    assert(out(0).getAs[Double]("lm_score") ===
      math.rint(math.log(0.4) * 1e4) / 1e4)
    // doc2: (ln(2/5) + ln(1/5)) / 2 = -1.2629
    assert(out(1).getAs[Long]("n_tokens") === 2L)
    assert(out(1).getAs[Double]("lm_score") ===
      BigDecimal((math.log(0.4) + math.log(0.2)) / 2)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // Rare-token docs score strictly lower — the filter's discriminating
    // direction.
    assert(out(1).getAs[Double]("lm_score") < out(0).getAs[Double]("lm_score"))
  }

  test("sourceQualityGate: keeps only docs of sources above the global mean") {
    import spark.implicits._
    val docs = Seq(
      (1L, "srcA", 10L), (2L, "srcA", 20L), // avg 15
      (3L, "srcB", 2L))                     // avg 2; global = 32/3 ≈ 10.67
      .toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis.sourceQualityGate(docs).orderBy($"doc_id").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L))
    assert(out.forall(_.getAs[Double]("src_avg_chars") === 15.0))
  }

  test("bm25Search: tf and idf ordering, non-matching docs cut, k cap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple apple pear"), // tf(apple)=3
      (2L, "apple pear plum fig"),    // tf(apple)=1
      (3L, "apple banana"),           // apple + rare term
      (4L, "plum fig plum fig"))      // no query terms → cut
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("apple", "banana"), 10).collect()
    val ids = out.map(_.getAs[Long]("doc_id"))
    assert(ids.toSet === Set(1L, 2L, 3L), "doc 4 matches nothing")
    // banana is rarer (df=1 vs 3) → doc 3's idf-heavy hit outranks the
    // repeated common term; higher tf outranks lower at equal df.
    assert(ids.head === 3L)
    assert(ids.indexOf(1L) < ids.indexOf(2L))
    val scores = out.map(_.getAs[Double]("bm25"))
    assert(scores.sorted.reverse.toSeq === scores.toSeq, "ordered DESC")
    assert(TextAnalysis.bm25Search(docs, "doc_id", "text",
      Seq("apple"), 1).count() === 1L)
  }

  test("vocabOovRate: top-V vocab by count with token tie-break; per-doc OOV accounting") {
    import spark.implicits._
    // Counts: a 5 (docs 1,1,2,3,4), b 3, c 2, d 2, e 1. Vocab(3) = {a, b}
    // plus ONE of the count-2 tie {c, d} — token tie-break keeps "c".
    val docs = Seq(
      (1L, "a a b c"),      // 0 OOV of 4
      (2L, "a b d"),        // 1 OOV of 3
      (3L, "a b c e d"),    // 2 OOV of 5 (e and d)
      (4L, "a"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.vocabOovRate(docs, "doc_id", "text", 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 4L, 0L, 0.0),
      (2L, 3L, 1L, 0.333333),
      (3L, 5L, 2L, 0.4),
      (4L, 1L, 0L, 0.0)))
  }

  test("bpePairCandidates: pairs weighted by word frequency, overlapping pairs counted per position") {
    import spark.implicits._
    // "ab" occurs in 3 docs (wc=3) → pair "ab" weight 3.
    // "aaa" wc=1 contributes "aa" TWICE (positions 1,2) → weight 2.
    // Single chars contribute nothing.
    val docs = Seq((1L, "ab aaa x"), (2L, "ab"), (3L, "ab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpePairCandidates(docs, "text", 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("ab", 3L), ("aa", 2L)))
  }

  test("ngramNovelty: shared grams score 0, unique grams score 1, repeats collapse") {
    import spark.implicits._
    // d1 and d2 share their only 3-gram ("a b c") → novelty 0 for both;
    // d3's gram is unique → 1.0; d4 repeats its unique gram (distinct
    // collapses to one) → 1 gram, novelty 1.0; d5 too short → absent.
    val docs = Seq(
      (1L, "a b c"), (2L, "a b c"), (3L, "x y z"),
      (4L, "p q r p q r p q r p q"), (5L, "one two")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.ngramNovelty(docs, 3)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // d4's 9 positional grams collapse to 3 distinct rotations.
    assert(out.toSeq === Seq(
      (1L, 1L, 0L, 0.0), (2L, 1L, 0L, 0.0), (3L, 1L, 1L, 1.0),
      (4L, 3L, 3L, 1.0)))
  }

  test("qualityEnsemble: 2-of-3 vote keeps good docs, drops the all-signal failure") {
    import spark.implicits._
    // d2 fails every signal (1 token < median, punct density above
    // median, repeated-char entropy below median) → dropped; d1/d3 pass
    // all three (>= / <= at the median are passes).
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "aaaa....aaaa"),
      (3L, "hello world foo bar")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.qualityEnsemble(docs)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 3), (3L, 3)))
  }

  test("bigramLmScore: hand-computed conditional log-probs; short docs absent") {
    import spark.implicits._
    // bc: (a,b)=1, (b,c)=1, (a,c)=1; marginals: a=2, b=1.
    // d1 = mean(ln 1/2, ln 1/1) = -0.3466; d2 = ln 1/2 = -0.6931.
    val docs = Seq((1L, "a b c"), (2L, "a c"), (3L, "x")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bigramLmScore(docs)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, -0.3466), (2L, 1L, -0.6931)))
  }

  test("lengthOutliers: zero-IQR source flags its giant; healthy source is silent") {
    import spark.implicits._
    val docs = (Seq.fill(4)(10L) :+ 100L).zipWithIndex.map { case (n, i) =>
      (i.toLong, "s", n)
    } ++ Seq((10L, "t", 50L), (11L, "t", 60L), (12L, "t", 70L))
    val df = docs.toDF("doc_id", "source", "n_chars")
    val out = graft.operators.TextAnalysis.lengthOutliers(df)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq((4L, "s", 100L)))
  }

  test("charEntropy: hand-computed entropies, uniform and degenerate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaa"), // one symbol → H = 0
      (2L, "ab"),   // two equiprobable → H = 1
      (3L, "abcd"), // four equiprobable → H = 2
      (4L, "aab"))  // H = log2(3) − (2·log2 2)/3 = 0.9183
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.charEntropy(docs, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 4L, 1L, 0.0),
      (2L, 2L, 2L, 1.0),
      (3L, 4L, 4L, 2.0),
      (4L, 3L, 2L, 0.9183)))
  }

  test("charEntropy plan is shuffle-free (no Exchange)") {
    import spark.implicits._
    val docs = Seq((1L, "abc")).toDF("doc_id", "text")
    val plan = graft.operators.TextAnalysis.charEntropy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"entropy must stay array-local:\n$plan")
  }

  test("zipfFit: an exact power law recovers its slope with r2 = 1") {
    import spark.implicits._
    // freq(rank r) = 840 / r for r = 1..8 (840 = lcm(1..8), all exact
    // integers): log-log is a perfect line of slope -1.
    val docs = (1 to 8).flatMap { r =>
      Seq.fill(840 / r)(s"w$r")
    }.mkString(" ")
    val out = graft.operators.TextAnalysis
      .zipfFit(Seq((1L, docs)).toDF("doc_id", "text"), "text", 8)
      .head()
    assert(out.getLong(0) === 8L)
    assert(out.getDouble(1) === -1.0, s"slope ${out.getDouble(1)}")
    assert(out.getDouble(2) === 1.0, s"r2 ${out.getDouble(2)}")
  }

  test("vocabCoverage: hand-computed cumulative shares, k beyond vocab covers everything") {
    import spark.implicits._
    // freqs: a=6, b=3, c=1 → total 10. k=1 → .6, k=2 → .9, k=5 → 1.0.
    val docs = Seq((1L, "a a a b b c"), (2L, "a a a b")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .vocabCoverage(docs, "text", Seq(1, 2, 5))
      .orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 6L, 10L, 0.6), (2L, 9L, 10L, 0.9), (5L, 10L, 10L, 1.0)))
  }

  test("stopwordDiscovery: DF threshold, within-doc repeats count once") {
    import spark.implicits._
    // "the" in 3/4 docs (repeated in doc 1 — counts once), "cat" in 2/4
    // (exactly on the inclusive threshold), "rare" in 1/4 (dropped).
    val docs = Seq(
      (1L, "the the cat"), (2L, "the dog"), (3L, "the bird"),
      (4L, "rare cat")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis
      .stopwordDiscovery(docs, "text", 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq.sorted === Seq(("cat", 2L, 0.5), ("the", 3L, 0.75)))
    // Boundary inclusive: at 0.25 every token qualifies (dog/bird/rare
    // sit exactly on the threshold).
    val out2 = graft.operators.TextAnalysis
      .stopwordDiscovery(docs, "text", 0.25).count()
    assert(out2 === 5L)
  }

  test("rrfFusion: docs in both lists float up; absent list rank is 0; scores hand-computed") {
    import spark.implicits._
    // lex top-3: 10, 20, 30; sem top-3: 20, 30, 40. Doc 20 (ranks 2+1)
    // must beat doc 10 (lex rank 1 only) and doc 30 (ranks 3+2).
    val lex = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("doc_id", "rank")
    val sem = Seq((20L, 1L), (30L, 2L), (40L, 3L)).toDF("doc_id", "rank")
    val out = graft.operators.TextAnalysis
      .rrfFusion(Seq(("lex", lex), ("sem", sem)), "doc_id", 4)
      .orderBy($"rrf".desc, $"doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
    def rrf(rs: Long*) = BigDecimal(rs.map(r => 1.0 / (60 + r)).sum)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq === Seq(
      (20L, rrf(2, 1), 2L, 1L),
      (30L, rrf(3, 2), 3L, 2L),
      (10L, rrf(1), 1L, 0L),
      (40L, rrf(3), 0L, 3L)))
  }

  test("kAnonymityAudit: only sub-k groups emitted, most identifying first") {
    import spark.implicits._
    val df = Seq(
      ("x", 1L), ("x", 2L), ("x", 3L), // size 3 → safe at k=3
      ("y", 4L), ("y", 5L),            // size 2 → risky
      ("z", 6L))                       // size 1 → risky, first
      .toDF("qid", "row_id")
    val out = graft.operators.Maintenance.kAnonymityAudit(
      df, Seq("qid"), 3).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("z", 1L), ("y", 2L)))
  }

  test("klFromCorpus: the divergent source scores far above the conforming ones") {
    import spark.implicits._
    // Sources a and b share the corpus-typical vocabulary; source c is
    // pure out-of-distribution boilerplate — its KL must dominate.
    val docs = (Seq.fill(5)(("a", "the quick brown fox jumps")) ++
      Seq.fill(5)(("b", "the lazy brown dog sleeps")) ++
      Seq.fill(5)(("c", "zzz zzz zzz zzz zzz")))
      .zipWithIndex.map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val out = graft.operators.TextAnalysis.klFromCorpus(docs, "source", "text")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kl_nats")).toMap
    // At this toy scale the add-half smoothing flattens every P toward
    // uniform, compressing the gap — the divergent source must still rank
    // strictly highest (symmetric a and b tie).
    assert(out("c") > out("a") * 1.1, s"divergent source must rank highest: $out")
    assert(out("c") > out("b") * 1.1, s"divergent source must rank highest: $out")
    assert(out("a") === out("b"), "symmetric sources must tie exactly")
  }

  test("mutualInformation: independent columns give 0, identical columns give NMI 1") {
    import spark.implicits._
    val indep = (Seq.fill(10)(("a", "x")) ++ Seq.fill(10)(("a", "y")) ++
      Seq.fill(10)(("b", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("p", "q")
    val zi = graft.operators.TextAnalysis.mutualInformation(indep, "p", "q")
      .collect().head
    assert(zi.getAs[Double]("mi_nats") === 0.0)
    // q == p: MI = H(p) = ln 2, normalized MI = 1.
    val same = (Seq.fill(10)(("a", "a")) ++ Seq.fill(10)(("b", "b"))).toDF("p", "q")
    val zs = graft.operators.TextAnalysis.mutualInformation(same, "p", "q")
      .collect().head
    assert(zs.getAs[Double]("mi_nats") === 0.6931) // ln 2
    assert(zs.getAs[Double]("normalized_mi") === 1.0)
  }

  test("chiSquareIndependence: independent table scores 0, dependent scores high") {
    import spark.implicits._
    // Perfectly independent 2x2 (every cell = row·col/N exactly): chi2 = 0.
    val indep = (Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("a", 1)) ++
      Seq.fill(10)(("b", 0)) ++ Seq.fill(10)(("b", 1))).toDF("r", "c")
    val zi = graft.operators.TextAnalysis.chiSquareIndependence(indep, "r", "c")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("chi2_contrib")).toMap
    assert(zi("a") === 0.0 && zi("b") === 0.0)
    // Perfectly dependent (diagonal): each cell contributes (10-5)²/5 = 5,
    // two cells per row category → 10 per row.
    val dep = (Seq.fill(10)(("a", 0)) ++ Seq.fill(10)(("b", 1))).toDF("r", "c")
    val zd = graft.operators.TextAnalysis.chiSquareIndependence(dep, "r", "c")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("chi2_contrib")).toMap
    assert(zd("a") === 10.0 && zd("b") === 10.0)
  }

  test("bpeTrain: hand-traced merges — lexicographic tie-break, then the merged symbol pairs on") {
    import spark.implicits._
    // Corpus "aa aa ab": round 1 ties (a,a) with (a,</w>) at 2 — '<' sorts
    // before 'a', so (a,</w>) wins; round 2 merges (a, a</w>) from the
    // rewritten words, proving merged symbols participate atomically.
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bpeTrain(docs, "text", 2)
      .orderBy($"step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1, "a", "</w>", "a</w>", 2L), (2, "a", "a</w>", "aa</w>", 2L)))
  }

  test("bpeEncode: trained merges collapse frequent words to single tokens, rare words stay split") {
    import spark.implicits._
    // With x130's 2 hand-traced merges, "aa" encodes to the single token
    // aa</w> while "ab" stays [a, b, </w>]: doc total 1+1+3 = 5 subwords
    // over 3 whitespace tokens.
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeMerges(docs, "text", 2)
    val out = graft.operators.TextAnalysis.bpeEncode(
      docs, "doc_id", "text", merges).collect().head
    assert((out.getLong(0), out.getLong(1), out.getLong(2)) === ((1L, 3L, 5L)))
  }

  test("jsdMatrix: hand-computed mirrored pair; zero-overlap pairs are absent") {
    import spark.implicits._
    // a = {x:2/3, y:1/3}, b mirrored → m = {1/2, 1/2}:
    // JSD = ln2 − H(2/3,1/3) = 0.693147 − 0.636514 = 0.0566 (4 dp).
    // c shares no token with either → no (a,c)/(b,c) row.
    val docs = Seq(("a", "x x y"), ("b", "x y y"), ("c", "z z"))
      .toDF("source", "text")
    val out = graft.operators.TextAnalysis.jsdMatrix(docs, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(("a", "b", 2L, 0.0566)))
  }

  test("heapsFit: all-new types fit beta=1 exactly; a one-type corpus fits beta=0") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // Every token new → V(n) = n: the log-log points sit ON y = x, so the
    // OLS is exact (beta 1, ln_k 0) with no tolerance needed.
    val fresh = (0L to 3L).map(i => (i, s"t${i}a t${i}b")).toDF("doc_id", "text")
    val f = TextAnalysis.heapsFit(fresh, "doc_id",
      TextAnalysis.tokens(col("text")), 4).collect().head
    assert((f.getLong(0), f.getLong(1), f.getLong(2),
      f.getDouble(3), f.getDouble(4)) === ((4L, 8L, 8L, 1.0, 0.0)))
    // One type repeated forever → V(n) = 1: slope exactly 0, K = 1.
    val flat = (0L to 3L).map(i => (i, "t t")).toDF("doc_id", "text")
    val g = TextAnalysis.heapsFit(flat, "doc_id",
      TextAnalysis.tokens(col("text")), 4).collect().head
    assert((g.getLong(2), g.getDouble(3), g.getDouble(4)) === ((1L, 0.0, 0.0)))
  }

  test("trigramBackoffScore: each cascade level fires on the held-out half") {
    import spark.implicits._
    // md5 split: ids 1 and 9 hash to TRAIN ('c', '4'... wait '4' < '8'
    // scores) — use 1 (train, 'c') and 6 (score, '1').
    // Train "a b c a b c": tc {abc:2, bca:1, cab:1}; bc {ab:2, bc:2,
    // ca:1}; uc {a:2, b:2, c:2} → N = 6, V = 3.
    // Score "a b c a b d": (a,b,c) S = 2/2; (b,c,a) S = 1/2;
    // (c,a,b) S = 1/1; (a,b,d) unseen trigram AND bigram bd AND word d
    // → base 0.16·(0+1)/9. backoff_rate = 1/4.
    val docs = Seq((1L, "a b c a b c"), (6L, "a b c a b d"))
      .toDF("doc_id", "text")
    val r = TextAnalysis.trigramBackoffScore(docs).collect()
    assert(r.length === 1 && r.head.getLong(0) === 6L)
    val want = BigDecimal((math.log(0.5) + math.log(0.16 / 9)) / 4)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert((r.head.getLong(1), r.head.getDouble(2), r.head.getDouble(3))
      === (4L, 0.25, want))
  }

  test("langIdMargin: agrees with langId's argmax and tie-break; margin gates confidence") {
    import spark.implicits._
    // "the a row": en scores 3, others 0 → margin 3, confident at 2.
    // "the hash": en 1, de 1 → the tie breaks to the smallest code
    // ('de' < 'en'), margin 0, not confident.
    val docs = Seq((1L, "the a row"), (2L, "the hash")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdMargin(docs, 2L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(out.toSeq === Seq((1L, "en", 3L, 0L, 3L, true),
      (2L, "de", 1L, 1L, 0L, false)))
    // And the argmax/tie-break must agree with langId itself.
    val a = TextAnalysis.langId(docs).orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(a.toSeq === Seq((1L, "en"), (2L, "de")))
  }

  test("negativeSamplingTable: the 3/4 power compresses the frequency gap; probabilities sum to 1") {
    import spark.implicits._
    // Counts a:16, b:1. Unigram: 16/17 vs 1/17 (16:1). Negative: 8 vs 1
    // (16^.75 = 8) → 8/9 vs 1/9 — the head downweighted, the tail up.
    val docs = Seq((("a " * 16) + "b")).toDF("text")
    val out = TextAnalysis.negativeSamplingTable(docs, "text", 0.75, 10)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      ("a", 16L, 0.941176, 0.888889), ("b", 1L, 0.058824, 0.111111)))
  }

  test("unseenMassEstimate: singleton fraction and bias-corrected Chao1 by hand") {
    import spark.implicits._
    // "a b a b": bigrams {ab:2, ba:1} → N=3, V=2, n1=1 (ba), n2=1 (ab)
    // → gt = 1/3, chao1 = 2 + 1·0/(2·2) = 2. Saturated source: "c d"
    // as two docs → cd:2 → n1=0, n2=1 → gt = 0, chao1 = V = 1.
    val docs = Seq(("g", "a b a b"), ("h", "c d"), ("h", "c d"))
      .toDF("source", "text")
    val out = TextAnalysis.unseenMassEstimate(docs, "source", "text", 2)
      .orderBy($"source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(("g", 3L, 2L, 1L, 1L, 0.333333, 2.0),
      ("h", 2L, 1L, 0L, 1L, 0.0, 1.0)))
  }

  test("cramersV: perfect association is 1, independence is 0, 1-column table NULLs") {
    import spark.implicits._
    // Perfect 2×2 diagonal: chi2 = n → V = √(n/(n·1)) = 1.
    val diag = Seq(("a", "x"), ("a", "x"), ("b", "y"), ("b", "y"))
      .toDF("r", "c")
    val d = TextAnalysis.cramersV(diag, "r", "c").collect().head
    assert((d.getLong(0), d.getLong(1), d.getLong(2), d.getDouble(3),
      d.getDouble(4)) === (4L, 2L, 2L, 4.0, 1.0))
    // Exactly independent 2×2 (all cells equal): chi2 = 0 → V = 0.
    val ind = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("r", "c")
    val i = TextAnalysis.cramersV(ind, "r", "c").collect().head
    assert(i.getDouble(3) === 0.0 && i.getDouble(4) === 0.0)
    // A single column category: min(r−1, c−1) = 0 → NULL, not a divide.
    val one = Seq(("a", "x"), ("b", "x")).toDF("r", "c")
    assert(TextAnalysis.cramersV(one, "r", "c").collect().head.isNullAt(4))
  }

  test("distinctN: repeated phrasing craters distinct-2 while distinct-1 holds") {
    import spark.implicits._
    // Source rep: "a b a b" + "a b" → 6 unigrams, 2 distinct
    // (d1 = 0.3333); bigrams {ab, ba, ab} + {ab} = 4 total, 2 distinct
    // (d2 = 0.5). Source div: "a b" + "c d" → d1 = 1, d2 = 1.
    val docs = Seq(("rep", "a b a b"), ("rep", "a b"),
      ("div", "a b"), ("div", "c d")).toDF("source", "text")
    val out = TextAnalysis.distinctN(docs, "source", "text")
      .orderBy($"source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(("div", 4L, 1.0, 2L, 1.0),
      ("rep", 6L, 0.333333, 4L, 0.5)))
  }

  test("bpeFrontier: hand-computed nested-budget curve; budget 0 is the char floor") {
    import spark.implicits._
    // Corpus "ab ab b": tokens 3, chars 5. Merge 1 = (b,</w>) n=3,
    // merge 2 = (a,b</w>) n=2 (nested — the frontier trains once).
    // Symbols: m0 → ab:3 b:2 ⇒ 8; m1 → ab:2 b:1 ⇒ 5; m2 → ab:1 b:1 ⇒ 3.
    val docs = Seq((1L, "ab ab"), (2L, "b")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeFrontier(docs, "text", Seq(0, 1, 2))
      .orderBy($"merges").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (0, 3L, 5L, 8L, 2.666667, 1.6),
      (1, 3L, 5L, 5L, 1.666667, 1.0),
      (2, 3L, 5L, 3L, 1.0, 0.6)))
  }

  test("bpeFrontier: bad budget lists fail loudly, not as a missing-column plan error") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab"), (2L, "b")).toDF("doc_id", "text")
    // Duplicates would collide on _nsym_<m> columns.
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeFrontier(docs, "text", Seq(1, 1, 2))
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.bpeFrontier(docs, "text", Seq(-1, 2))
    }
    // A budget past the corpus' trainable merges (this corpus trains 2)
    // names the dry budget instead of an opaque AnalysisException.
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeFrontier(docs, "text", Seq(1, 9))
    }
    assert(e.getMessage.contains("9") && e.getMessage.contains("dry"))
  }

  test("rakeKeyphrases: hand-computed deg/freq scores; duplicate runs collapse to one row") {
    import spark.implicits._
    // Doc 1 "deep learning the deep model a model" with stopwords
    // {a, the}: runs [deep learning], [deep model], [model]. Word
    // scores deg/freq: deep 4/2 = 2, learning 2/1 = 2, model 3/2 = 1.5.
    // Phrases: "deep learning" 4.0 > "deep model" 3.5 > "model" 1.5.
    // Doc 2 "x a x": two single-token runs of the SAME phrase "x"
    // (x: deg 2, freq 2, ws 1.0) — they tie at 1.0 and collapse to ONE
    // output row.
    val docs = Seq((1L, "deep learning the deep model a model"),
      (2L, "x a x")).toDF("doc_id", "text")
    val out = TextAnalysis.rakeKeyphrases(docs, "doc_id", "text",
        Seq("a", "the"), 3)
      .orderBy($"doc_id", $"rnk").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 1, "deep learning", 4.0),
      (1L, 2, "deep model", 3.5),
      (1L, 3, "model", 1.5),
      (2L, 1, "x", 1.0)))
  }
}
