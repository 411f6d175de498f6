package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier / embedding-quality evaluation operators — the read side of
  * the quality-filter family (x9/x36/x65 produce scores; these grade them).
  * A 100 TB curation pipeline trains cheap quality classifiers and ANN
  * retrieval stacks; before trusting either to gate data, it needs AUC /
  * calibration / inter-rater agreement computed ON the cluster, over the
  * full corpus, not a notebook sample.
  *
  * Scale shapes:
  *   - [[centroidAuc]] / [[calibrationBins]]: the per-class centroid table
  *     is bounded driver metadata (|classes| rows) inlined as codegen
  *     literals (j22's quantile-edge discipline), so scoring is ONE narrow
  *     projection — no join, no shuffle; the AUC fold then aggregates at
  *     (class, distinct-score) grain and windows PER CLASS (never a global
  *     single-partition sort).
  *   - [[cohensKappa]]: one contingency agg bounded by the class product;
  *     marginals re-agg from that bounded table; scalar cross-joins are
  *     broadcast one-row frames (the audited pattern).
  *
  * Exactness: AUC's rank-sum numerator Σ np_s·(cum_nn + nn_s/2) is a sum
  * of half-integer multiples (exactly representable in double well below
  * 2^53), and kappa reduces to (agree·n − Σrc·cc)/(n² − Σrc·cc) over exact
  * integers — both are bit-identical across engines with NO rounding
  * tolerance; only avg_score carries summation-order noise (rounded 4 dp).
  */
object Eval {

  /** Per-class mean-vector table, collected as bounded driver metadata:
    * |classes| rows of `dims` doubles, each dim rounded 6 dp so both
    * engines score against bit-identical centroids. */
  private[graft] def centroidLiterals(emb: DataFrame, vecCol: String,
                                      labelCol: String): Seq[(Long, Array[Double])] =
    emb.select(col(labelCol).cast("long").as("_lbl"),
        posexplode(col(vecCol)).as(Seq("_p", "_v")))
      .groupBy(col("_lbl"), col("_p"))
      .agg(round(avg(col("_v").cast("double")), 6).as("_m"))
      .groupBy(col("_lbl"))
      .agg(transform(array_sort(collect_list(struct(col("_p"), col("_m")))),
        s => s.getField("_m")).as("_cent"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)

  /** Every vector scored against every class centroid (cosine, 6 dp):
    * langId's literal-explode shape — |classes| struct branches in one
    * projection, output (id, _gold, class, score). */
  private[graft] def centroidScores(emb: DataFrame, idCol: String,
                                    vecCol: String,
                                    labelCol: String): DataFrame =
    scoreWith(emb, idCol, vecCol, labelCol,
      centroidLiterals(emb, vecCol, labelCol))

  /** Scoring against a PRE-COMPUTED centroid table — the seam the
    * streaming monitor uses to pin reference centroids at deploy time
    * while batches stream through the same projection. */
  private[graft] def scoreWith(emb: DataFrame, idCol: String,
                               vecCol: String, labelCol: String,
                               cents: Seq[(Long, Array[Double])]): DataFrame =
    emb.select(col(idCol), col(labelCol).cast("long").as("_gold"),
        explode(array(cents.map { case (lbl, c) =>
          struct(lit(lbl).as("_cls"),
            round(Similarity.cosineFold(col(vecCol), lit(c)), 6).as("_s"))
        }: _*)).as("_cs"))
      .select(col(idCol), col("_gold"),
        col("_cs._cls").as("class"), col("_cs._s").as("score"))

  /** One-vs-rest ROC AUC per class of centroid-cosine as the ranking
    * score: "how well does similarity-to-the-class-mean retrieve the
    * class?" — the embedding-quality scalar behind ANN-based labeling.
    *
    * Rank-sum form at (class, distinct-score) grain: with per-score
    * positive/negative counts (np, nn) and the cumulative negatives below
    * each score, AUC = Σ np·(cum_nn + nn/2) / (NP·NN) — ties credited
    * half, the exact Mann-Whitney statistic. The window partitions by
    * class over the bounded distinct-score table. */
  def centroidAuc(emb: DataFrame, idCol: String, vecCol: String,
                  labelCol: String): DataFrame =
    aucFold(centroidScores(emb, idCol, vecCol, labelCol)
      .groupBy(col("class"), col("score"))
      .agg(sum(when(col("_gold") === col("class"), 1L).otherwise(0L)).as("_np"),
        sum(when(col("_gold") === col("class"), 0L).otherwise(1L)).as("_nn")),
      "score")

  /** The Mann-Whitney read-time fold over a pre-counted
    * (class, order, _np, _nn) table — shared by the batch AUC and the
    * streaming monitor, whose maintained count state IS such a table. */
  private[graft] def aucFold(counts: DataFrame, orderCol: String): DataFrame = {
    val w = Window.partitionBy(col("class")).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    counts.withColumn("_cum", coalesce(sum(col("_nn")).over(w), lit(0L)))
      .groupBy(col("class"))
      .agg(sum(col("_np")).cast("long").as("n_pos"),
        sum(col("_nn")).cast("long").as("n_neg"),
        sum(col("_np") * (col("_cum") + col("_nn") / lit(2.0))).as("_num"))
      .select(col("class"), col("n_pos"), col("n_neg"),
        round(col("_num") / (col("n_pos") * col("n_neg")), 6).as("auc"))
  }

  /** Reliability diagram per class: equal-width bins over the cosine range
    * [-1, 1], per-bin count, mean score, and positive fraction — the
    * calibration read before using centroid similarity as a probability
    * proxy (|avg_score gap| per bin is the ECE contribution). Pure
    * two-key aggregation, bounded at classes × nBins. */
  def calibrationBins(emb: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, nBins: Int): DataFrame = {
    // Half-width factor precomputed in Scala so both engines multiply by
    // the same single literal (x·10/2 and x·5 can differ in the last ulp).
    val bin = greatest(lit(0),
      least(floor((col("score") + 1.0d) * lit(nBins / 2.0)), lit(nBins - 1)))
      .cast("int")
    centroidScores(emb, idCol, vecCol, labelCol)
      .withColumn("bin", bin)
      .groupBy(col("class"), col("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("score")), 4).as("avg_score"),
        round(avg(when(col("_gold") === col("class"), 1.0).otherwise(0.0)), 4)
          .as("frac_pos"))
  }

  /** NDCG@k of BM25 lexical retrieval against graded term-coverage
    * relevance (rel = how many DISTINCT query terms the doc contains) —
    * the ranking-quality read completing the retrieval-eval family (x73
    * grades the ANN candidate set, this grades the ORDER a ranker puts
    * results in). DCG folds (2^rel − 1)/log2(rank+1) over the system's
    * top-k; IDCG over the corpus's ideal ordering (rel desc, id asc);
    * both discounts written as ln(rank+1)/ln(2) so the engines evaluate
    * the identical op sequence.
    *
    * Scale shape: relevance is one tokenize projection; both top-k cuts
    * are TakeOrdered; ranks come from the bounded-k zipWithIndex path
    * (never a single-partition window); the two DCGs are scalar
    * aggregates cross-joined as broadcast one-row frames. */
  def bm25Ndcg(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val rel = docs.select(col(idCol),
      queryTerms.map(t => when(array_contains(toks, t), 1L).otherwise(0L))
        .reduce(_ + _).as("_rel"))
    val gain = pow(lit(2.0), col("_rel")) - lit(1.0)
    val disc = log(col("rank").cast("double") + lit(1.0)) / log(lit(2.0))
    val dcg = graft.queries.Serving.ranked(
        TextAnalysis.bm25Search(docs, idCol, textCol, queryTerms, k),
        "bm25", idCol)
      .join(rel, Seq(idCol))
      .agg(sum(gain / disc).as("_dcg"))
    val idcg = graft.queries.Serving.ranked(
        rel.orderBy(col("_rel").desc, col(idCol).asc).limit(k), "_rel", idCol)
      .agg(sum(gain / disc).as("_idcg"))
    dcg.crossJoin(broadcast(idcg))
      .select(lit(k.toLong).as("k"), round(col("_dcg"), 6).as("dcg"),
        round(col("_idcg"), 6).as("idcg"),
        round(col("_dcg") / col("_idcg"), 6).as("ndcg"))
  }

  /** Expected Calibration Error per class — x105's reliability diagram
    * folded to the scalar the gating decision actually reads:
    * ECE = Σ_bins (n_b/N)·|frac_pos_b − avg_score_b| (Naeini et al.
    * 2015), the bin-weighted gap between claimed confidence and realized
    * accuracy. Folds from [[calibrationBins]]'s 4 dp-rounded bin columns
    * so the scalar is bit-derivable from the audited diagram on both
    * engines.
    *
    * Scale shape: calibrationBins' projection + (class, bin) agg, then
    * one class-grain agg over ≤ classes·nBins rows. */
  def expectedCalibrationError(emb: DataFrame, idCol: String,
                               vecCol: String, labelCol: String,
                               nBins: Int): DataFrame =
    calibrationBins(emb, idCol, vecCol, labelCol, nBins)
      .groupBy(col("class"))
      .agg(sum(col("n")).cast("long").as("n"),
        round(sum(col("n") * abs(col("frac_pos") - col("avg_score"))) /
          sum(col("n")), 6).as("ece"))

  /** Mean Reciprocal Rank per class of the centroid classifier — the
    * "how far down the ranking does the right answer sit" read between
    * x104's AUC (pairwise ranking quality) and x111's NDCG (graded list
    * order): each vector ranks ALL class centroids by cosine (ties broken
    * by class id so both engines rank identically on the 6 dp-rounded
    * scores), and the gold class's reciprocal rank averages per class.
    * hits_at_1 is the exact-classification count the MRR interpolates.
    *
    * Scale shape: scoring is the same no-join literal projection as
    * centroidScores; the rank window partitions by ITEM (|classes| rows
    * each — massively parallel, never a global sort); one class-grain
    * agg finishes. */
  def centroidMrr(emb: DataFrame, idCol: String, vecCol: String,
                  labelCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score").desc, col("class").asc)
    centroidScores(emb, idCol, vecCol, labelCol)
      .withColumn("_rk", row_number().over(w))
      .where(col("_gold") === col("class"))
      .groupBy(col("_gold").as("class"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("_rk") === 1, 1L).otherwise(0L)).cast("long")
          .as("hits_at_1"),
        round(avg(lit(1.0) / col("_rk")), 6).as("mrr"))
  }

  /** Cohen's kappa between two categorical labelings — chance-corrected
    * agreement (e.g. a heuristic classifier vs gold labels, or two
    * annotation passes). po = observed agreement, pe = Σ marginal products
    * / n²; kappa folds to (agree·n − Σrc·cc)/(n² − Σrc·cc) so every input
    * to the one division is an exact integer. */
  def cohensKappa(df: DataFrame, predCol: String,
                  goldCol: String): DataFrame =
    kappaFromCounts(df.groupBy(col(predCol).as("_p"), col(goldCol).as("_g"))
      .agg(count(lit(1)).as("_c")))

  /** The kappa fold over a pre-counted (_p, _g, _c) confusion matrix —
    * shared by the batch operator and the streaming monitor, whose
    * maintained count state IS such a matrix. */
  private[graft] def kappaFromCounts(o: DataFrame): DataFrame = {
    val tot = o.agg(sum(col("_c")).as("_n"),
      sum(when(col("_p") === col("_g"), col("_c")).otherwise(0L)).as("_agree"))
    val pe = o.groupBy(col("_p")).agg(sum(col("_c")).as("_rc"))
      .join(o.groupBy(col("_g")).agg(sum(col("_c")).as("_cc")),
        col("_p") === col("_g"))
      .agg(coalesce(sum(col("_rc") * col("_cc")), lit(0L)).as("_pece"))
    tot.crossJoin(broadcast(pe))
      .select(col("_n").cast("long").as("n"),
        round(col("_agree") / col("_n").cast("double"), 4).as("po"),
        round(col("_pece") / (col("_n") * col("_n")).cast("double"), 4)
          .as("pe"),
        round((col("_agree") * col("_n") - col("_pece")).cast("double") /
          (col("_n") * col("_n") - col("_pece")), 4).as("kappa"))
  }

  /** Fleiss' kappa — Cohen's (x106) generalized past two raters: the
    * chance-corrected agreement of n raters categorically labeling the
    * same N items. The labeling-ops read: do the CHEAP quality signals
    * (length / token count / vocabulary richness) even agree with each
    * other, before x65 ensembles them or a crowd pipeline trusts its
    * annotators?
    *
    * `ratings` holds one row per (item, rater's category); every item
    * must carry exactly `nRaters` rows. With n_ij = raters putting item
    * i in category j: P̄ = (Σ n_ij² − N·n)/(N·n·(n−1)) and
    * P_e = Σ_j (c_j/(N·n))² — both folded from exact BIGINT sums, the
    * doubles appearing only in the final three divisions (identically
    * on both engines). All ratings in one category → P_e = 1 → NULL
    * kappa, not an ANSI divide error.
    *
    * Scale shape: one (item, cat) hash agg, one scalar agg over it, one
    * |categories|-grain agg joined back as a broadcast 1-row frame. */
  def fleissKappa(ratings: DataFrame, itemCol: String, catCol: String,
                  nRaters: Int): DataFrame = {
    val m = ratings.groupBy(col(itemCol).as("_i"), col(catCol).as("_j"))
      .agg(count(lit(1)).cast("long").as("_nij"))
    val s = m.agg(sum(col("_nij") * col("_nij")).cast("long").as("_s2"),
      countDistinct(col("_i")).cast("long").as("_ni"))
    val sc = m.groupBy(col("_j")).agg(sum(col("_nij")).cast("long").as("_c"))
      .agg(sum(col("_c") * col("_c")).cast("long").as("_sc2"))
    val n = lit(nRaters.toLong)
    s.crossJoin(broadcast(sc))
      .select(col("_ni").as("n_items"),
        ((col("_s2") - col("_ni") * n).cast("double") /
          (col("_ni") * n * (n - 1L)).cast("double")).as("_pbar"),
        (col("_sc2").cast("double") /
          ((col("_ni") * n) * (col("_ni") * n)).cast("double")).as("_pe"))
      .select(col("n_items"), round(col("_pbar"), 6).as("p_bar"),
        round(col("_pe"), 6).as("p_e"),
        when(col("_pe") =!= 1.0,
          round((col("_pbar") - col("_pe")) / (lit(1.0) - col("_pe")), 6))
          .as("kappa"))
  }

  /** Docs pruned to the pair list's endpoints BEFORE any gram explode —
    * the pair-scorer scale contract shared by [[rougeN]], [[bleuPairs]]
    * and [[chrfPairs]]: the pair set is output-scale while the corpus is
    * input-scale, so a gram-count table built corpus-wide does O(corpus)
    * explode+agg work to score O(pairs) rows (at sf0.1 it was the
    * measured dominant cost; at 100× corpus with a near-constant pair
    * set it is pure waste linear in the corpus). One broadcast left-semi
    * join bounds every downstream explode/agg at Σ_endpoints |doc|
    * instead. The endpoint list is 2·|pairs| ids before distinct —
    * output-scale, broadcastable by construction. Callers whose pair
    * frame embeds an expensive candidate pipeline should pass it
    * eagerly `localCheckpoint`ed so this endpoint scan (and the scorers'
    * own pair joins) replay the materialized rows, not the pipeline. */
  private def endpointDocs(docs: DataFrame, p: DataFrame,
                           idCol: String): DataFrame =
    docs.join(broadcast(
        p.select(explode(array(col("id_a"), col("id_b"))).as(idCol))
          .distinct()),
      Seq(idCol), "left_semi")

  /** chrF over candidate pairs (Popović 2015, the character-level member
    * of the pair-scoring family): clipped CHARACTER n-gram overlap for
    * n = 1, 2 on whitespace-stripped text, per-n precision AND recall
    * folded into F_β with β = 2 (recall weighted double — chrF's
    * defining choice, vs BLEU's precision-only view), averaged over n.
    * Character grams make it robust to tokenization and morphology
    * differences that whiff word-level ROUGE/BLEU entirely.
    *
    * Scale shape: identical to [[bleuPairs]] — docs pruned to pair
    * endpoints first, then per-doc gram-count tables (alphabet-bounded
    * for n=1, alphabet² for n=2), pair overlap via two equi-joins at
    * (pair, gram) grain, never a text×text comparison. Zero overlap at
    * either n floors that n's F at 0. */
  def chrfPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val stripped = regexp_replace(col(textCol), "\\s+", "")
    val pruned = endpointDocs(docs, pairs, idCol)
    def grams(n: Int) = pruned.select(col(idCol), stripped.as("_s"))
      .select(col(idCol), explode(when(length(col("_s")) >= n,
          transform(sequence(lit(1), length(col("_s")) - (n - 1)),
            i => col("_s").substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))).as("_g"))
      .groupBy(col(idCol), col("_g"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val p = pairs.select(col("id_a"), col("id_b"))
    def stats(n: Int, iOut: String, cOut: String, rOut: String) = {
      val g = grams(n)
      val sizes = g.groupBy(col(idCol))
        .agg(sum(col("_c")).cast("long").as("_n"))
      val inter = p
        .join(g.select(col(idCol).as("id_a"), col("_g"),
          col("_c").as("_ca")), Seq("id_a"))
        .join(g.select(col(idCol).as("id_b"), col("_g"),
          col("_c").as("_cb")), Seq("id_b", "_g"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("_ca"), col("_cb"))).cast("long").as(iOut))
      p.join(inter, Seq("id_a", "id_b"), "left").na.fill(0L, Seq(iOut))
        .join(sizes.select(col(idCol).as("id_a"), col("_n").as(cOut)),
          Seq("id_a"))
        .join(sizes.select(col(idCol).as("id_b"), col("_n").as(rOut)),
          Seq("id_b"))
    }
    def fBeta(i: String, c: String, r: String): Column = {
      val pr = col(i).cast("double") / col(c)
      val rc = col(i).cast("double") / col(r)
      when(col(i) > 0L, lit(5.0) * pr * rc / (lit(4.0) * pr + rc))
        .otherwise(lit(0.0))
    }
    val f1 = fBeta("_i1", "_c1", "_r1")
    val f2 = fBeta("_i2", "_c2", "_r2")
    stats(1, "_i1", "_c1", "_r1")
      .join(stats(2, "_i2", "_c2", "_r2"), Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"),
        round(f1, 6).as("f1_char"), round(f2, 6).as("f2_char"),
        round((f1 + f2) / 2.0, 6).as("chrf"))
  }

  /** BLEU-2 over a candidate pair list (Papineni et al. 2002) — the
    * precision-oriented twin of [[rougeN]]'s recall: for each (id_a as
    * candidate, id_b as reference), clipped unigram and bigram precisions
    * p_1, p_2, brevity penalty BP = min(1, e^(1−r/c)), and
    * bleu = BP · √(p_1·p_2) (uniform-weight geometric mean written as
    * exp of the half-sum of logs on BOTH engines). A zero p_n floors the
    * score at 0 — the standard unsmoothed convention — instead of a
    * log(0) error.
    *
    * Scale shape: rougeN's pair-driven discipline twice — docs pruned to
    * pair endpoints first, then (id, gram, count) frames at n = 1 and 2,
    * intersections as pairs ⋈ grams_a ⋈ grams_b equi-joins, so cost is
    * Σ_pairs |grams|, never corpus or corpus²; lengths ride the unigram
    * totals. The score reads NO reference bigram total, so stats(2)
    * joins only the candidate side — a ref-side inner join would both
    * waste a join and silently drop any pair whose reference has fewer
    * than two tokens (the oracle keeps such a pair at bleu = 0). */
  def bleuPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
                textCol: String): DataFrame = {
    val t = col("_toks")
    val pruned = endpointDocs(docs, pairs, idCol)
    def grams(n: Int) = pruned.select(col(idCol),
        filter(split(col(textCol), "\\s+"), x => length(x) > 0).as("_toks"))
      .select(col(idCol), explode(when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
        .otherwise(array().cast("array<string>"))).as("_g"))
      .groupBy(col(idCol), col("_g"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val p = pairs.select(col("id_a"), col("id_b"))
    def stats(n: Int, iOut: String, cOut: String,
              refOut: Option[String]) = {
      val g = grams(n)
      val sizes = g.groupBy(col(idCol))
        .agg(sum(col("_c")).cast("long").as("_n"))
      val inter = p
        .join(g.select(col(idCol).as("id_a"), col("_g"),
          col("_c").as("_ca")), Seq("id_a"))
        .join(g.select(col(idCol).as("id_b"), col("_g"),
          col("_c").as("_cb")), Seq("id_b", "_g"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("_ca"), col("_cb"))).cast("long").as(iOut))
      val withCand = p.join(inter, Seq("id_a", "id_b"), "left")
        .na.fill(0L, Seq(iOut))
        .join(sizes.select(col(idCol).as("id_a"), col("_n").as(cOut)),
          Seq("id_a"))
      refOut.fold(withCand)(r =>
        withCand.join(sizes.select(col(idCol).as("id_b"), col("_n").as(r)),
          Seq("id_b")))
    }
    val s1 = stats(1, "_i1", "_c1", Some("_r1"))
    val s2 = stats(2, "_i2", "_c2", None)
    val p1 = col("_i1").cast("double") / col("_c1")
    val p2 = col("_i2").cast("double") / col("_c2")
    val bp = least(lit(1.0),
      exp(lit(1.0) - col("_r1").cast("double") / col("_c1")))
    s1.join(s2, Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"),
        col("_c1").as("cand_len"), col("_r1").as("ref_len"),
        round(p1, 6).as("p1"), round(p2, 6).as("p2"),
        round(bp, 6).as("bp"),
        round(when(col("_i1") > 0L && col("_i2") > 0L,
            bp * exp((log(p1) + log(p2)) / lit(2.0)))
          .otherwise(lit(0.0)), 6).as("bleu"))
  }

  /** Krippendorff's alpha, nominal data (Krippendorff 2004) — the
    * agreement member that survives MISSING ratings: Cohen (x106) needs
    * exactly two raters, Fleiss (x113) a constant rater count per item;
    * alpha weighs each unit by its own m_u, so a crowd pipeline where
    * annotators skip items still gets one chance-corrected number.
    *
    * Within-unit disagreement needs NO value-pair join: for nominal
    * data Σ_{c≠k} n_uc·n_uk = m_u² − Σ_c n_uc², so
    * alpha = 1 − (n−1)·Σ_u[(m_u² − Σ_c n_uc²)/(m_u−1)] / (n² − Σ_c n_c²)
    * over units with m_u ≥ 2 (singletons are unpairable and drop), with
    * n = Σ m_u and n_c the value margins. Every input to the single
    * division is an exact BIGINT or an exact sum of 1/(m_u−1)-rationals;
    * all ratings one value → denominator 0 → NULL, not a divide error.
    *
    * Scale shape: one (item, value) hash agg, one item-grain agg, one
    * value-grain agg, three broadcast scalar folds. No joins beyond the
    * 1-row cross. */
  def krippendorffAlpha(ratings: DataFrame, itemCol: String,
                        catCol: String): DataFrame = {
    val m = ratings.groupBy(col(itemCol).as("_i"), col(catCol).as("_c"))
      .agg(count(lit(1)).cast("long").as("_nuc"))
    val items = m.groupBy(col("_i"))
      .agg(sum(col("_nuc")).cast("long").as("_mu"),
        sum(col("_nuc") * col("_nuc")).cast("long").as("_s2"))
      .where(col("_mu") >= 2L)
      .localCheckpoint(eager = true) // referenced by the scalar fold AND the margins
    val scal = items.agg(count(lit(1)).cast("long").as("n_items"),
      sum(col("_mu")).cast("long").as("_n"),
      sum((col("_mu") * col("_mu") - col("_s2")).cast("double") /
        (col("_mu") - 1L)).as("_du"))
    val margins = m.join(items.select(col("_i")), Seq("_i"), "left_semi")
      .groupBy(col("_c")).agg(sum(col("_nuc")).cast("long").as("_nc"))
      .agg(coalesce(sum(col("_nc") * col("_nc")), lit(0L)).as("_snc2"))
    scal.crossJoin(broadcast(margins))
      .select(col("n_items"), col("_n").as("n_ratings"),
        when(col("_n") * col("_n") =!= col("_snc2"),
          round(lit(1.0) - ((col("_n") - 1L) * col("_du")) /
            (col("_n") * col("_n") - col("_snc2")).cast("double"), 6))
          .as("alpha"))
  }

  /** ROUGE-N with CLIPPED (multiset) counts over a candidate pair list —
    * the real summarization/contamination metric, not the distinct-set
    * Dice that x6/x41 already cover: overlap = Σ_g min(count_a(g),
    * count_b(g)) over word n-grams WITH multiplicity, so a doc that
    * repeats a reference bigram five times only gets credit for the
    * copies the reference actually has. P = i/|b|, R = i/|a|, and the
    * clipped F1 collapses algebraically to 2i/(|a|+|b|) — one exact
    * integer ratio, no 0/0 guard needed beyond empty gram bags.
    *
    * Scale shape: pair-driven — docs prune to pair endpoints before the
    * gram explode, so the (id, gram, count) and (id, total) frames are
    * endpoint-grain; the intersection is `pairs ⋈ grams_a ⋈ grams_b` on
    * (id, gram) equi-keys, so cost is Σ_pairs |grams(a)|, never corpus
    * or corpus². Pairs come from any bounded candidate generator (x6's
    * lossless prefix filter in the registry entry). */
  def rougeN(docs: DataFrame, pairs: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    val t = col("_toks")
    val grams = endpointDocs(docs, pairs, idCol).select(col(idCol),
        filter(split(col(textCol), "\\s+"), x => length(x) > 0).as("_toks"))
      .select(col(idCol), explode(when(size(t) >= n,
          transform(sequence(lit(1), size(t) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(o => element_at(t, i + o)): _*)))
        .otherwise(array().cast("array<string>"))).as("_g"))
      .groupBy(col(idCol), col("_g"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val sizes = grams.groupBy(col(idCol))
      .agg(sum(col("_c")).cast("long").as("_n"))
    val p = pairs.select(col("id_a"), col("id_b"))
    val inter = p
      .join(grams.select(col(idCol).as("id_a"), col("_g"),
        col("_c").as("_ca")), Seq("id_a"))
      .join(grams.select(col(idCol).as("id_b"), col("_g"),
        col("_c").as("_cb")), Seq("id_b", "_g"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(least(col("_ca"), col("_cb"))).cast("long").as("_i"))
    p.join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("_i"))
      .join(sizes.select(col(idCol).as("id_a"), col("_n").as("_na")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("_n").as("_nb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("_i").as("overlap"),
        round(col("_i").cast("double") / col("_nb"), 6).as("rouge_p"),
        round(col("_i").cast("double") / col("_na"), 6).as("rouge_r"),
        round((lit(2L) * col("_i")).cast("double") /
          (col("_na") + col("_nb")), 6).as("rouge_f1"))
  }

  /** Word error rate over a candidate pair list — the ALIGNMENT member of
    * the pair-scoring family (ROUGE counts shared grams, BLEU clips them,
    * chrF goes sub-word; none knows WHERE the texts diverge). WER is the
    * token-sequence Levenshtein distance normalized by the reference
    * length: wer(a→b) = editDist(tokens_a, tokens_b) / |tokens_b| — the
    * ASR/translation standard (insertions + deletions + substitutions per
    * reference word), and for dedup triage the direct "how many word edits
    * apart are these near-dups" read that gram-bag scores can't give
    * (a swapped clause moves BLEU little but costs 2·k word edits).
    *
    * Scale shape: the family discipline — docs prune to pair endpoints
    * before tokenizing, token arrays join to pairs at pair grain (two
    * equi-joins), then the whole alignment is ONE array-local codegen
    * kernel per pair ([[graft.functions.SeqEditDistance]] — O(m·n) token
    * compares, O(min(m,n)) memory, no explode, no gram table, no
    * shuffle past the pair join). Cost is Σ_pairs |a|·|b|: quadratic in
    * DOCUMENT length (inherent to exact alignment) but linear in the
    * pair count, so an output-scale pair set stays output-scale work at
    * any corpus size. A zero-token reference floors the denominator at 1
    * (dist is then |tokens_a| and wer = dist — the 0/0 guard both
    * engines share). */
  /** Character error rate over a candidate pair list — [[werPairs]]'
    * sub-word twin and the OCR/ASR fine-grain standard: cer(a→b) =
    * editDist(chars_a, chars_b) / |chars_b|. Where WER charges a whole
    * word for one typo, CER prices the typo itself — the right grain for
    * transcription noise, OCR artifacts and near-dup triage of lightly
    * corrupted copies. Reference-directional like WER; a zero-length
    * reference floors the denominator at 1.
    *
    * Scale shape: the family discipline — docs prune to pair endpoints,
    * texts join to pairs at pair grain, then the whole alignment is
    * Spark's built-in codegen `levenshtein` per pair (array-local, no
    * explode, no shuffle past the pair join); cost Σ_pairs |a|·|b| chars,
    * linear in the pair count. Engine note: Spark's levenshtein counts
    * CODE POINTS while DuckDB's counts BYTES — identical on ASCII
    * corpora, so the oracle guards the ASCII precondition with error()
    * instead of silently diverging (the x149 lesson, applied up front). */
  def cerPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val pruned = endpointDocs(docs, pairs, idCol)
      .select(col(idCol), col(textCol).as("_s"))
    pairs.select(col("id_a"), col("id_b"))
      .join(pruned.select(col(idCol).as("id_a"), col("_s").as("_sa")),
        Seq("id_a"))
      .join(pruned.select(col(idCol).as("id_b"), col("_s").as("_sb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        length(col("_sb")).cast("long").as("n_ref_chars"),
        levenshtein(col("_sa"), col("_sb")).cast("long").as("edit_dist"))
      .select(col("id_a"), col("id_b"), col("n_ref_chars"), col("edit_dist"),
        round(col("edit_dist").cast("double") /
          greatest(col("n_ref_chars"), lit(1L)), 6).as("cer"))
  }

  def werPairs(docs: DataFrame, pairs: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    val toks = endpointDocs(docs, pairs, idCol).select(col(idCol),
      filter(split(col(textCol), "\\s+"), x => length(x) > 0).as("_t"))
    val d = graft.functions.SeqEditDistance(col("_ta"), col("_tb"))
      .cast("long")
    pairs.select(col("id_a"), col("id_b"))
      .join(toks.select(col(idCol).as("id_a"), col("_t").as("_ta")),
        Seq("id_a"))
      .join(toks.select(col(idCol).as("id_b"), col("_t").as("_tb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        size(col("_tb")).cast("long").as("n_ref"), d.as("edit_dist"))
      .select(col("id_a"), col("id_b"), col("n_ref"), col("edit_dist"),
        round(col("edit_dist").cast("double") /
          greatest(col("n_ref"), lit(1L)), 6).as("wer"))
  }

  /** Cross-group QUANTILE NORMALIZATION — the batch-effect correction a
    * global quality threshold needs when scores come from heterogeneous
    * sources (each source's scorer drifts; a single cut then filters by
    * SOURCE, not by quality): every row maps to its within-group quantile
    * position p = (rank − ½)/n_g, snapped to a 1/`gridPoints` grid, and
    * is re-valued at the POOLED distribution's interpolated quantile for
    * that grid point — after which one global threshold means the same
    * thing in every group (the expression-microarray normalization,
    * Bolstad et al. 2003, at data-pipeline scale).
    *
    * Scale shape: within-group ranks ride per-GROUP windows (parallel
    * across groups — the weightedMedian discipline, never a global
    * sort); the pooled reference is ONE exact-percentile aggregate at
    * the literal grid (gridPoints+1 doubles — bounded, broadcast); the
    * remap is a codegen element_at lookup. Snapping p to the grid is
    * what keeps the reference BOUNDED at 100 TB — the alternative
    * (exact pooled quantile per distinct p) needs a pooled sort.
    *
    * This is the SOLE quantile-normalization implementation (the r11
    * duplicate in Sampling is consolidated here, r12). Two quantile-
    * position conventions, both in the literature: `midRank = true` maps
    * each row at p = (rank − ½)/n (the mid-rank / Hazen plotting
    * position); `midRank = false` at p = (rank − 1)/(n − 1) (the classic
    * percent_rank, the legacy x108 convention — endpoints land exactly
    * on the pooled min/max). Output carries the RAW p, the snapped
    * grid_idx, and the UNROUNDED pooled re-value; callers own the
    * rounding grid. */
  def quantileNormalize(df: DataFrame, idCol: String, groupCol: String,
                        scoreCol: String, gridPoints: Int,
                        midRank: Boolean = true): DataFrame = {
    require(gridPoints > 0, "gridPoints must be positive")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(idCol))
    val grid = (0 to gridPoints).map(i => i.toDouble / gridPoints)
    val pooled = df.agg(
      expr(s"percentile(`$scoreCol`, array(${grid.mkString(",")}))")
        .as("_q"))
    val withP =
      if (midRank) {
        val n = df.groupBy(col(groupCol))
          .agg(count(lit(1)).cast("long").as("_n"))
        df.join(broadcast(n), Seq(groupCol))
          .withColumn("_r", row_number().over(w))
          .withColumn("_p", (col("_r") - 0.5) / col("_n"))
      } else df.withColumn("_p", percent_rank().over(w))
    withP
      .withColumn("_gi", round(col("_p") * gridPoints, 0).cast("int"))
      .crossJoin(broadcast(pooled))
      .select(col(idCol), col(groupCol), col(scoreCol),
        col("_p").as("p"), col("_gi").as("grid_idx"),
        element_at(col("_q"), col("_gi") + 1).as("normalized"))
  }

  /** ISOTONIC calibration (pool-adjacent-violators, Ayer et al. 1955;
    * Zadrozny & Elkan 2002 as the classifier-calibration recipe) — the
    * MONOTONE-fit capability the eval ladder lacked: given a binned
    * score→outcome table, the least-squares NON-DECREASING rate curve.
    * Where x105's calibration bins report raw per-bin rates (which can
    * zig-zag from sampling noise), the isotonic fit pools adjacent
    * violating bins into weighted averages until monotone — the standard
    * probability-calibration map for any score this engine produces.
    *
    * Exactness: every pool value is ONE division of exact LONG sums
    * (pos/n), so the fit is engine-portable bit-for-bit; the oracle
    * computes the same fit through the closed-form minimax
    * f_b = max_{a≤b} min_{c≥b} avg(a..c) (equal to PAVA's pool average
    * as a real number, hence as a correctly-rounded double — two equal
    * rationals divide to the same double). PAVA's merge compare runs on
    * exact LONG cross-products (pos_prev·n_cur vs pos_cur·n_prev; exact
    * while pool pos·n < 2^63 — ~3e9 rows per pool).
    *
    * Scale shape: the corpus reduces to ONE map-side-combined agg at bin
    * grain; PAVA runs driver-side on the BOUNDED bin table (the j22/x80
    * bounded-metadata discipline — B doubles, one O(B) stack pass) and
    * broadcasts back as a literal map lookup. No windows, no joins. */
  /** Bin-table cardinality cap for [[isotonicCalibration]]'s driver-side
    * PAVA pass: the collect is legitimate ONLY because bins are bounded
    * METADATA (the j22/x80 discipline) — a caller feeding raw continuous
    * scores instead of pre-binned values must fail loudly, not OOM the
    * driver (ADVICE r12). */
  val IsotonicMaxBins = 100000

  def isotonicCalibration(df: DataFrame, binCol: String,
                          labelCol: String): DataFrame = {
    val bins = df.groupBy(col(binCol).cast("long").as("bin"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col(labelCol).cast("long")).cast("long").as("pos"))
    // Nulls sort first and limit(max+1) bounds the fetch, so both
    // contract violations surface from ONE bounded collect: a null bin
    // (uncastable/missing score) and an unbounded bin domain.
    val fetched = bins.orderBy(col("bin")).limit(IsotonicMaxBins + 1).collect()
    require(fetched.isEmpty || !fetched.head.isNullAt(0),
      s"isotonicCalibration: null $binCol bin — feed pre-binned non-null scores")
    require(fetched.length <= IsotonicMaxBins,
      s"isotonicCalibration: > $IsotonicMaxBins distinct bins — " +
        "bin the score first; PAVA's driver pass needs bounded metadata")
    val rows = fetched.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // PAVA: each stack frame is a pool (nBins, sumN, sumPos); a new bin
    // merges backwards while the previous pool's rate EXCEEDS the
    // current's (ties keep separate pools — the fit value is identical).
    val stack = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long)]
    rows.foreach { case (_, n, p) =>
      var cur = (1, n, p)
      while (stack.nonEmpty &&
        stack.last._3 * cur._2 > cur._3 * stack.last._2) {
        val prev = stack.remove(stack.size - 1)
        cur = (prev._1 + cur._1, prev._2 + cur._2, prev._3 + cur._3)
      }
      stack += cur
    }
    val fitVals = stack.iterator.flatMap { case (c, sn, sp) =>
      Iterator.fill(c)(sp.toDouble / sn)
    }.toSeq
    val fit: Map[Long, Double] = rows.map(_._1).zip(fitVals).toMap
    bins
      .withColumn("rate", round(col("pos").cast("double") / col("n"), 6))
      .withColumn("isotonic", round(element_at(typedlit(fit), col("bin")), 6))
      .select(col("bin"), col("n"), col("pos"), col("rate"), col("isotonic"))
  }

  /** SPLIT-CONFORMAL calibration (Vovk's inductive conformal prediction,
    * the Lei et al. 2018 split form) — the distribution-free uncertainty
    * read a score/regressor gains nothing from [[calibrationBins]]' bin
    * diagnostics: given CALIBRATION residuals (any nonconformity score,
    * pre-rounded to a grid by the caller) the conformal quantile q̂ is the
    * k-th SMALLEST residual with k = ⌈(n_cal+1)(1−α)⌉, and the interval
    * ŷ ± q̂ covers a fresh point with probability ≥ 1−α under
    * exchangeability — no model, no distributional assumption. Emits the
    * audit row: (n_cal, k_order, q_hat, n_test, n_covered, coverage) —
    * coverage on the held-out half is the finite-sample check that the
    * guarantee landed. α too small for the calibration size (k > n_cal
    * means q̂ = ∞) fails loudly via the assert_true-filter discipline.
    *
    * Scale shape: the k-th order statistic rides [[graft.queries.Serving
    * .ranked]]'s range-partition + zipWithIndex global rank (never an
    * Exchange SinglePartition window); q̂ then broadcasts as a one-row
    * frame onto the test half for a codegen'd compare + one scalar agg.
    * Nothing quadratic, no driver-side data. */
  def splitConformal(cal: DataFrame, test: DataFrame, idCol: String,
                     residCol: String, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha=$alpha must be in (0,1)")
    val n = cal.agg(count(lit(1)).cast("long").as("n_cal"))
    val rk = graft.queries.Serving.ranked(
      cal.select(col(idCol), col(residCol)), residCol, idCol)
    val q = rk.crossJoin(broadcast(n))
      .withColumn("_k",
        ceil((col("n_cal") + 1) * lit(1.0 - alpha)).cast("long"))
      .where(assert_true(col("_k") <= col("n_cal"),
        lit("splitConformal: alpha too small for the calibration size " +
          "(k > n_cal means an infinite interval)")).isNull)
      // ranked() sorts DESC, so the k-th smallest sits at rank n+1-k.
      .where(col("rank") === col("n_cal") + 1 - col("_k"))
      .select(col("n_cal"), col("_k").as("k_order"),
        col(residCol).as("q_hat"))
    test.select(col(residCol)).crossJoin(broadcast(q))
      .agg(first(col("n_cal")).as("n_cal"),
        first(col("k_order")).as("k_order"),
        first(col("q_hat")).as("q_hat"),
        count(lit(1)).cast("long").as("n_test"),
        sum(when(col(residCol) <= col("q_hat"), 1L).otherwise(0L))
          .cast("long").as("n_covered"))
      .select(col("n_cal"), col("k_order"), col("q_hat"), col("n_test"),
        col("n_covered"),
        round(col("n_covered").cast("double") / col("n_test"), 6)
          .as("coverage"))
  }

  /** Paired sign-flip PERMUTATION test — the significance read every
    * system comparison in this eval ladder is missing: given one LONG
    * delta per item (metric_A − metric_B, on an integer grid — callers
    * with double metrics scale to grid units first, the cumulated()/j59
    * discipline, so every fold is exact in any association), is the
    * observed total delta distinguishable from chance? Under H₀ the two
    * systems are exchangeable per item, so each delta's sign is a fair
    * coin: resample b flips item i's sign on the parity of
    * md5(salt:b:i) — deterministic, partitioning-invariant, identical in
    * any engine — and the two-sided p-value is the add-one-smoothed
    * fraction of resamples at least as extreme as observed,
    * (1 + #{b : |Σ flipped| ≥ |Σ observed|}) / (B + 1). The standard
    * paired randomization test (the exact-test sibling of Koehn 2004's
    * bootstrap resampling for MT system comparison).
    *
    * Scale shape: ONE grid explode (B signs per item — B·n rows of
    * (b, ±delta), never text or features) into a map-side-combined
    * per-b sum (B groups), then a scalar fold against the broadcast
    * observed row. No window, no driver-side data; the only exchange
    * carries B partial sums per task. Emits one row:
    * (n_items, obs_delta_sum, n_resamples, n_as_extreme, p_value). */
  def pairedPermutationTest(df: DataFrame, idCol: String, deltaCol: String,
                            resamples: Int, salt: String): DataFrame = {
    require(resamples > 0, "resamples must be positive")
    val d = df.select(col(idCol).as("_id"),
      col(deltaCol).cast("long").as("_d"))
    val obs = d.agg(sum(col("_d")).as("_obs"),
      count(lit(1)).cast("long").as("n_items"))
    val parity = conv(substring(md5(concat(lit(s"$salt:"),
        col("_b").cast("string"), lit(":"), col("_id").cast("string"))),
      1, 2), 16, 10).cast("long") % 2
    val sums = d
      .select(col("_id"), col("_d"),
        explode(sequence(lit(1), lit(resamples))).as("_b"))
      .select(col("_b"),
        when(parity === 0, col("_d")).otherwise(-col("_d")).as("_fd"))
      .groupBy(col("_b"))
      .agg(sum(col("_fd")).as("_fs"))
    sums.crossJoin(broadcast(obs))
      .agg(first(col("n_items")).as("n_items"),
        first(col("_obs")).cast("long").as("obs_delta_sum"),
        lit(resamples).cast("long").as("n_resamples"),
        sum(when(abs(col("_fs")) >= abs(col("_obs")), 1L).otherwise(0L))
          .cast("long").as("n_as_extreme"))
      .select(col("n_items"), col("obs_delta_sum"), col("n_resamples"),
        col("n_as_extreme"),
        round((col("n_as_extreme") + 1).cast("double") /
          (col("n_resamples") + 1), 6).as("p_value"))
  }
}
