package graft

import org.apache.spark.sql.functions._
import graft.operators.Eval

class EvalSpec extends SparkSpec {

  // 2-dim embeddings where every cosine is hand-computable. Label 0:
  // (1,0) and (0,1); label 1: (0,1). Centroid(0) = (0.5, 0.5),
  // centroid(1) = (0, 1).
  private def emb = {
    import spark.implicits._
    Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 0),
      (3L, Array(0f, 1f), 1))
      .toDF("vec_id", "embedding", "label")
  }

  test("centroidAuc: all-tied scores give 0.5; a separating class scores its rank-sum") {
    val out = Eval.centroidAuc(emb, "vec_id", "embedding", "label")
      .orderBy(col("class")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // Class 0: every vector ties at cos(v, (.5,.5)) = 0.707107 →
    // np=2, nn=1, one score group: num = 2·(0 + 1/2) = 1; AUC = 1/(2·1).
    // Class 1: scores vs (0,1): v1=0 (neg), v2=1 (neg), v3=1 (pos) →
    // groups asc: (0: np0 nn1), (1: np1 nn1 cum1): num = 1·(1 + .5);
    // AUC = 1.5/(1·2) = 0.75.
    assert(out.toSeq === Seq((0L, 2L, 1L, 0.5), (1L, 1L, 2L, 0.75)))
  }

  test("calibrationBins: bin edges, counts, and positive fractions are exact") {
    val out = Eval.calibrationBins(emb, "vec_id", "embedding", "label", 10)
      .orderBy(col("class"), col("bin")).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // Class 0: all three rows at score 0.707107 → bin floor(1.707107·5)=8,
    // frac_pos = 2/3. Class 1: score 0 → bin 5 (one neg), score 1 → bin 9
    // (one pos of two rows).
    assert(out.toSeq === Seq(
      (0L, 8, 3L, 0.7071, 0.6667),
      (1L, 5, 1L, 0.0, 0.0),
      (1L, 9, 2L, 1.0, 0.5)))
  }

  test("cohensKappa: hand-computed 2x2 confusion (po .75, pe .5, kappa .5)") {
    import spark.implicits._
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"))
      .toDF("pred", "gold")
    val out = Eval.cohensKappa(df, "pred", "gold").collect().head
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === 0.75) // agree 3/4
    assert(out.getDouble(2) === 0.5)  // (3·2 + 1·2)/16
    assert(out.getDouble(3) === 0.5)  // (.75-.5)/(1-.5)
  }

  test("cohensKappa: perfect agreement is 1, disjoint labelings go negative") {
    import spark.implicits._
    val perfect = Seq(("a", "a"), ("b", "b")).toDF("p", "g")
    assert(Eval.cohensKappa(perfect, "p", "g").collect().head.getDouble(3) === 1.0)
    // pred always the OTHER class: po=0, pe=0.5 → kappa = -1.
    val flipped = Seq(("a", "b"), ("b", "a")).toDF("p", "g")
    assert(Eval.cohensKappa(flipped, "p", "g").collect().head.getDouble(3) === -1.0)
  }

  test("bm25Ndcg: a ranking that matches the ideal order scores ndcg = 1") {
    import spark.implicits._
    // d1 contains both terms (rel 2), d2 one (rel 1), d3 none (rel 0):
    // BM25 ranks d1 > d2, exactly the ideal order -> ndcg 1.
    // dcg = (2^2-1)/log2(2) + (2^1-1)/log2(3) = 3 + 0.630930 = 3.630930.
    val docs = Seq((1L, "a b"), (2L, "a x"), (3L, "c c"))
      .toDF("doc_id", "text")
    val out = graft.operators.Eval.bm25Ndcg(docs, "doc_id", "text",
      Seq("a", "b"), 2).collect().head
    assert(out.getLong(0) === 2L)
    assert(out.getDouble(1) === 3.63093)
    assert(out.getDouble(3) === 1.0)
  }

  test("fleissKappa: hand-computed 3-rater/4-item case; perfect agreement = 1; one-category = NULL") {
    import spark.implicits._
    // Items: (0,0,0), (0,0,1), (1,1,2), (2,2,2):
    // S2 = 9+5+5+9 = 28 -> P̄ = (28-12)/24 = 2/3; c = (5,3,4) ->
    // P_e = 50/144; kappa = (2/3 - 25/72)/(1 - 25/72) = 23/47.
    val r = Seq((1, 0), (1, 0), (1, 0), (2, 0), (2, 0), (2, 1),
      (3, 1), (3, 1), (3, 2), (4, 2), (4, 2), (4, 2)).toDF("item", "cat")
    val out = graft.operators.Eval.fleissKappa(r, "item", "cat", 3)
      .collect().head
    assert(out.getLong(0) === 4L)
    assert(out.getDouble(1) === 0.666667)
    assert(out.getDouble(2) === 0.347222)
    assert(out.getDouble(3) === 0.489362)

    val perfect = Seq((1, 0), (1, 0), (2, 1), (2, 1)).toDF("item", "cat")
    val p = graft.operators.Eval.fleissKappa(perfect, "item", "cat", 2)
      .collect().head
    assert(p.getDouble(3) === 1.0)

    val degenerate = Seq((1, 0), (1, 0), (2, 0), (2, 0)).toDF("item", "cat")
    val d = graft.operators.Eval.fleissKappa(degenerate, "item", "cat", 2)
      .collect().head
    assert(d.isNullAt(3))
  }

  test("expectedCalibrationError: hand-computed bin-weighted gaps; mislabeled mass inflates ECE") {
    import spark.implicits._
    // v4 is mislabeled into class 1, dragging centroid 1 to [.5,.5]: with
    // 2 bins everything lands in bin 1; class 0 reads avg_score .75 vs
    // frac_pos .5 → ECE .25; class 1 reads .7071 vs .5 → ECE .2071.
    val emb = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(1f, 0f), 1)).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Eval.expectedCalibrationError(
        emb, "vec_id", "embedding", "label", 2)
      .orderBy($"class").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 4L, 0.25), (1L, 4L, 0.2071)))
  }

  test("centroidMrr: separable classes score 1.0, a confusable vector drops to 1/rank") {
    import spark.implicits._
    // Class 0 = two [1,0] plus one stray [0,1]; class 1 = two [0,1].
    // Centroid 0 = [2/3, 1/3], centroid 1 = [0,1]. The stray's gold sits
    // at rank 2 (cos .447 vs 1.0) → class 0 mrr = (1+1+.5)/3 = .833333;
    // class 1 stays perfect.
    val emb = Seq(
      (1L, Seq(1f, 0f), 0), (2L, Seq(1f, 0f), 0), (5L, Seq(0f, 1f), 0),
      (3L, Seq(0f, 1f), 1), (4L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Eval.centroidMrr(emb, "vec_id", "embedding", "label")
      .orderBy($"class").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 3L, 2L, 0.833333), (1L, 2L, 2L, 1.0)))
  }

  test("krippendorffAlpha: hand value with a missing rating; singletons drop; degenerate NULL") {
    import spark.implicits._
    // u1 unanimous (a,a,a), u2 split with a MISSING third rating (a,b),
    // u3 unanimous (b,b): n=7, Σdu=2, margins a=4 b=3 →
    // alpha = 1 − 6·2/(49−25) = 0.5. A singleton unit must not shift it.
    val r = Seq((1, "a"), (1, "a"), (1, "a"), (2, "a"), (2, "b"),
      (3, "b"), (3, "b")).toDF("item", "cat")
    val out = graft.operators.Eval.krippendorffAlpha(r, "item", "cat")
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getDouble(2)) === ((3L, 7L, 0.5)))
    val withSingleton = r.unionByName(Seq((4, "a")).toDF("item", "cat"))
    val out2 = graft.operators.Eval.krippendorffAlpha(
      withSingleton, "item", "cat").collect().head
    assert((out2.getLong(0), out2.getLong(1), out2.getDouble(2)) === ((3L, 7L, 0.5)))
    // Every rating one value → zero variance → NULL, not a divide error.
    val flat = Seq((1, "a"), (1, "a"), (2, "a"), (2, "a")).toDF("item", "cat")
    assert(graft.operators.Eval.krippendorffAlpha(flat, "item", "cat")
      .collect().head.isNullAt(2))
  }

  test("bleuPairs: hand-computed precisions and geometric mean; zero bigram overlap floors at 0") {
    import spark.implicits._
    // (1,2): p1 = 2/3, p2 = 1/2, BP = 1 (equal lengths) →
    // bleu = √(1/3) = 0.57735. (3,4): unigrams identical but NO shared
    // bigram → p2 = 0 → bleu = 0, not a log error.
    val docs = Seq((1L, "a b c"), (2L, "a b d"),
      (3L, "a b"), (4L, "b a")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.operators.Eval.bleuPairs(docs, pairs, "doc_id", "text")
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    assert(out(0) === ((1L, 2L, 3L, 3L, 0.666667, 0.5, 1.0, 0.57735)))
    assert(out(1) === ((3L, 4L, 2L, 2L, 1.0, 0.0, 1.0, 0.0)))
  }

  test("chrfPairs: hand-computed char F2 with whitespace stripped; no shared bigram floors f2") {
    import spark.implicits._
    // (1,2): stripped "abab" vs "ab". 1-grams {a:2,b:2} vs {a:1,b:1}:
    // overlap 2, P=2/4, R=2/2 → F2 = 5·.5·1/(4·.5+1) = 0.833333.
    // 2-grams {ab:2,ba:1} vs {ab:1}: overlap 1, P=1/3, R=1 →
    // F2 = (5/3)/(7/3) = 0.714286. chrf = 0.77381.
    // (3,4): "ab" vs "ba" share both chars but NO bigram → f2 = 0
    // exactly (no divide error); f1 = 5·1·1/5 = 1. chrf = 0.5.
    val docs = Seq((1L, "ab ab"), (2L, "ab"),
      (3L, "ab"), (4L, "ba")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.operators.Eval.chrfPairs(docs, pairs, "doc_id", "text")
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out(0) === ((1L, 2L, 0.833333, 0.714286, 0.77381)))
    assert(out(1) === ((3L, 4L, 1.0, 0.0, 0.5)))
  }

  test("werPairs: hand-computed alignment; reference-directional; empty reference floors denominator") {
    import spark.implicits._
    // (1,2): "a b c d" vs "a x c": sub b→x, delete d → dist 2, n_ref 3,
    // wer 2/3. (3,4): identical → 0. (5,6): candidate has text, reference
    // empty after tokenizing → n_ref 0, dist 2, denominator floored at 1.
    val docs = Seq((1L, "a b c d"), (2L, "a x c"), (3L, "q r"),
      (4L, "q r"), (5L, "u v"), (6L, " ")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val out = graft.operators.Eval.werPairs(docs, pairs, "doc_id", "text")
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out(0) === ((1L, 2L, 3L, 2L, 0.666667)))
    assert(out(1) === ((3L, 4L, 2L, 0L, 0.0)))
    assert(out(2) === ((5L, 6L, 0L, 2L, 2.0)))
  }

  test("cerPairs: char-grain alignment prices the typo WER charges a word for; empty ref floors") {
    import spark.implicits._
    // (1,2): "kitten" vs "sitting" — the textbook distance 3 over 7 ref
    // chars. (3,4): one-char typo in a 11-char text: wer would read 1/2,
    // cer reads 1/11. (5,6): empty reference → denominator floored at 1.
    val docs = Seq((1L, "kitten"), (2L, "sitting"),
      (3L, "hello wrold"), (4L, "hello world"),
      (5L, "ab"), (6L, "")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val out = graft.operators.Eval.cerPairs(docs, pairs, "doc_id", "text")
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out(0) === ((1L, 2L, 7L, 3L, 0.428571)))
    assert(out(1) === ((3L, 4L, 11L, 2L, 0.181818)))
    assert(out(2) === ((5L, 6L, 0L, 2L, 2.0)))
  }

  test("quantileNormalize: shifted groups land on IDENTICAL pooled values (the defining property)") {
    import spark.implicits._
    // Group A {1,2,3,4}, group B {11,12,13,14}, grid 4: within-group
    // positions snap to grid 1..4 on both sides, so both groups re-value
    // at the same pooled quantiles [2.75, 7.5, 12.25, 14] — after
    // normalization a global threshold treats the shifted scorer and the
    // reference scorer identically.
    val df = (Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (4L, "A", 4.0), (5L, "B", 11.0), (6L, "B", 12.0), (7L, "B", 13.0),
      (8L, "B", 14.0))).toDF("id", "g", "score")
    val out = graft.operators.Eval.quantileNormalize(df, "id", "g",
        "score", 4)
      .orderBy($"id").collect()
      .map(r => (r.getString(1), r.getInt(4), r.getDouble(5)))
    val a = out.filter(_._1 == "A").map(t => (t._2, t._3))
    val b = out.filter(_._1 == "B").map(t => (t._2, t._3))
    assert(a.toSeq === Seq((1, 2.75), (2, 7.5), (3, 12.25), (4, 14.0)))
    assert(a.toSeq === b.toSeq)
  }

  test("quantileNormalize, percent_rank convention: equal within-group ranks land on the same global scale") {
    import spark.implicits._
    // The legacy x108 convention (midRank = false): two sources with
    // wildly different raw scales; grid 2 -> pooled edges (p 0, .5, 1)
    // over [1,2,3,10,20,30] = [1, 6.5, 30]. Each group's three rows rank
    // p = 0, .5, 1 -> both normalize to exactly [1, 6.5, 30]: one
    // threshold now gates both sources.
    val rows = Seq(("g1", 1L, 1L), ("g1", 2L, 2L), ("g1", 3L, 3L),
      ("g2", 4L, 10L), ("g2", 5L, 20L), ("g2", 6L, 30L))
      .toDF("src", "doc_id", "v")
    val out = graft.operators.Eval.quantileNormalize(rows, "doc_id",
        "src", "v", 2, midRank = false)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 0.0, 1.0), (2L, 0.5, 6.5), (3L, 1.0, 30.0),
      (4L, 0.0, 1.0), (5L, 0.5, 6.5), (6L, 1.0, 30.0)))
  }

  test("splitConformal: exact order-statistic quantile, held-out coverage, loud failure when alpha outruns n_cal") {
    import spark.implicits._
    // n_cal = 9, alpha = 0.1: k = ceil(10 * 0.9) = 9 -> q_hat is the 9th
    // smallest calibration residual = 9.0. Test residuals (5, 9, 10):
    // two covered (<= 9), coverage 2/3.
    val cal = (1 to 9).map(i => (i.toLong, i.toDouble)).toDF("k", "r")
    val test = Seq((101L, 5.0), (102L, 9.0), (103L, 10.0)).toDF("k", "r")
    val out = graft.operators.Eval.splitConformal(cal, test, "k", "r", 0.1)
      .collect().head
    assert((out.getLong(0), out.getLong(1), out.getDouble(2),
      out.getLong(3), out.getLong(4), out.getDouble(5)) ===
      ((9L, 9L, 9.0, 3L, 2L, 0.666667)))
    // Ties at the quantile value pick the same VALUE regardless of the
    // id tie-break: residuals (1,2,2,2) at alpha=0.4 -> k = ceil(5*.6)=3,
    // 3rd smallest is 2.0.
    val tied = Seq((1L, 1.0), (2L, 2.0), (3L, 2.0), (4L, 2.0)).toDF("k", "r")
    val q2 = graft.operators.Eval.splitConformal(tied, test, "k", "r", 0.4)
      .collect().head
    assert((q2.getLong(1), q2.getDouble(2)) === ((3L, 2.0)))
    // k > n_cal means an infinite interval — must fail loudly, not emit
    // an empty frame.
    val tiny = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)).toDF("k", "r")
    val e = intercept[Exception] {
      graft.operators.Eval.splitConformal(tiny, test, "k", "r", 0.1)
        .collect()
    }
    def mentions(t: Throwable): Boolean = t != null &&
      (String.valueOf(t.getMessage).contains("alpha too small") ||
        mentions(t.getCause))
    assert(mentions(e), s"wrong failure: $e")
  }

  test("pairedPermutationTest: one-sided signal hits the add-one floor; a perfect null reads p = 1; same salt reproduces") {
    import spark.implicits._
    def run(deltas: Seq[Long], b: Int, salt: String) =
      graft.operators.Eval.pairedPermutationTest(
          deltas.zipWithIndex.map { case (d, i) => (i.toLong, d) }
            .toDF("id", "delta"),
          "id", "delta", b, salt)
        .collect().head
    // 80 items all +1: a flipped sum reaches |80| only when every one of
    // the 80 md5 parities agrees (P ~ 2^-79 per resample) — so
    // n_as_extreme = 0 and p sits exactly on the add-one floor 1/(B+1).
    val strong = run(Seq.fill(80)(1L), 99, "s")
    assert((strong.getLong(0), strong.getLong(1), strong.getLong(2),
      strong.getLong(3), strong.getDouble(4)) === ((80L, 80L, 99L, 0L, 0.01)))
    // Perfectly balanced deltas: observed sum 0, every resample is at
    // least as extreme by definition -> p exactly 1.
    val nullCase = run(Seq.tabulate(80)(i => if (i % 2 == 0) 1L else -1L),
      99, "s")
    assert(nullCase.getLong(1) === 0L)
    assert(nullCase.getLong(3) === 99L)
    assert(nullCase.getDouble(4) === 1.0)
    // Determinism: the salted hash makes the resample plan a pure
    // function of (salt, B, ids) — identical calls agree exactly.
    val a = run(Seq(3L, -1L, 2L, -2L, 1L), 64, "t")
    val b2 = run(Seq(3L, -1L, 2L, -2L, 1L), 64, "t")
    assert(a.toSeq === b2.toSeq)
  }

  test("rougeN: clipped counts score below distinct-set Dice and cap repeat credit") {
    import spark.implicits._
    val docs = Seq((1L, "x x x y"), (2L, "x y y"),
      (3L, "x x x"), (4L, "x x x x")).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val out = graft.operators.Eval.rougeN(docs, pairs, "doc_id", "text", 2)
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // (1,2): a = {xx:2, xy:1} (n=3), b = {xy:1, yy:1} (n=2): clipped
    // overlap 1 -> P=1/2, R=1/3, F1=2/5 (distinct Dice would say 0.5).
    assert(out(0) === ((1L, 2L, 1L, 0.5, 0.333333, 0.4)))
    // (3,4): a = {xx:2}, b = {xx:3}: overlap clips at 2, not 3.
    assert(out(1) === ((3L, 4L, 2L, 0.666667, 1.0, 0.8)))
  }
  test("isotonicCalibration: adjacent violators pool to the weighted average; monotone output; already-monotone input unchanged") {
    import spark.implicits._
    // Bins 0/1/2 with rates .5, 0, 1 (n=2 each): bins 0-1 violate ->
    // pool to (1+0)/4 = .25; bin 2 stays 1. Already-monotone input
    // passes through untouched.
    val df = Seq((0L, 1L), (0L, 0L), (1L, 0L), (1L, 0L), (2L, 1L),
      (2L, 1L)).toDF("bin", "y")
    val out = graft.operators.Eval.isotonicCalibration(df, "bin", "y")
      .orderBy($"bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq((0L, 2L, 1L, 0.5, 0.25),
      (1L, 2L, 0L, 0.0, 0.25), (2L, 2L, 2L, 1.0, 1.0)))
    val mono = Seq((0L, 0L), (1L, 1L), (1L, 0L), (2L, 1L))
      .toDF("bin", "y")
    val m = graft.operators.Eval.isotonicCalibration(mono, "bin", "y")
      .orderBy($"bin").collect().map(r => (r.getDouble(3), r.getDouble(4)))
    assert(m.forall(p => p._1 === p._2))
    // Cascading merge: rates 1, .5, 0 pool into ONE level = global mean.
    val casc = Seq((0L, 1L), (1L, 1L), (1L, 0L), (2L, 0L))
      .toDF("bin", "y")
    val c = graft.operators.Eval.isotonicCalibration(casc, "bin", "y")
      .orderBy($"bin").collect().map(_.getDouble(4))
    assert(c.toSeq === Seq(0.5, 0.5, 0.5))
  }
  test("isotonicCalibration: contract violations fail loudly (null bin; unbounded bin domain), not driver-OOM (ADVICE r12)") {
    import spark.implicits._
    // A null bin (e.g. an uncastable raw score) is a loud contract error
    // at the head of the bounded fetch, not an NPE mid-collect.
    val withNull = Seq((Some(0L), 1L), (None, 0L), (Some(1L), 1L))
      .toDF("bin", "y")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Eval.isotonicCalibration(withNull, "bin", "y")
    }
    assert(e1.getMessage.contains("null"))
    // The cardinality guard trips via a bounded limit(max+1) fetch — the
    // driver never materializes more than IsotonicMaxBins+1 rows even
    // when a caller feeds raw continuous scores. range() makes the
    // 100k+1 distinct bins cheaply.
    val raw = spark.range(graft.operators.Eval.IsotonicMaxBins + 1)
      .select($"id".as("bin"), ($"id" % 2).as("y"))
    val e2 = intercept[IllegalArgumentException] {
      graft.operators.Eval.isotonicCalibration(raw, "bin", "y")
    }
    assert(e2.getMessage.contains("distinct bins"))
  }
}
