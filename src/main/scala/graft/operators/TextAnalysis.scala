package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for the training-data pipeline (north-star
  * extension): corpus stats, language ID, quality scoring, token counting,
  * and document fingerprinting.
  *
  * Everything is per-row scalar work (codegen-friendly built-ins — regexp
  * counts, array ops) followed by at most one hash aggregation: embarrassingly
  * parallel at any scale, no joins except broadcast marker dictionaries.
  */
object TextAnalysis {

  def tokens(textCol: Column): Column =
    filter(split(textCol, "\\s+"), t => length(t) > 0)

  /** Corpus stats per language facet: doc count, token totals, char stats,
    * distinct sources. */
  def textStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("_ntok", size(tokens(col("text"))))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_ntok")).cast("long").as("n_tokens"),
        round(avg(col("_ntok")), 4).as("avg_tokens"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        countDistinct(col("source")).as("n_sources"))

  /** Language-ID marker sets: tiny per-language keyword dictionaries (the
    * n-gram-heuristic shape; real deployments would load trained n-gram
    * tables the same way — a broadcast map, per-row scoring). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "row", "table"),
    "es" -> Seq("data", "column", "value"),
    "de" -> Seq("hash", "merge", "join"),
    "fr" -> Seq("scan", "filter", "query"),
    "zh" -> Seq("spark", "batch", "window"))

  /** Heuristic language ID: per-doc occurrence count of each language's
    * marker tokens; prediction = argmax score, ties broken by smallest
    * language code. Output: (doc_id, pred_lang, score). */
  def langId(docs: DataFrame): DataFrame = {
    // Tokenize once per doc in its own projection — inlined, the regex
    // split would re-run once per candidate language.
    val toks = col("_toks")
    val scored = docs.select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"),
      explode(array(langMarkers.map { case (lang, words) =>
        struct(lit(lang).as("cand_lang"),
          size(filter(toks, t => array_contains(lit(words.toArray), t))).as("score"))
      }: _*)).as("cs"))
      .select(col("doc_id"), col("cs.cand_lang").as("cand_lang"),
        col("cs.score").as("score"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cand_lang").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("doc_id"), col("cand_lang").as("pred_lang"), col("score"))
  }

  /** Language-ID with a CONFIDENCE MARGIN — the abstention read on top
    * of [[langId]]: the gap between the best and second-best language
    * scores. An argmax alone routes every doc somewhere; the margin says
    * which routings to trust (margin 0 = a coin flip between two
    * languages, the doc a lang-specific pipeline should NOT consume).
    * `confident` applies the caller's minimum margin.
    *
    * Scale shape: [[langId]]'s candidate explode (|languages| rows per
    * doc), one group back to doc grain with conditional max/struct-max
    * aggregates instead of a rank window — no second shuffle. */
  def langIdMargin(docs: DataFrame, minMargin: Long): DataFrame = {
    val toks = col("_toks")
    val scored = docs.select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"),
        explode(array(langMarkers.map { case (lang, words) =>
          struct(lit(lang).as("cand_lang"),
            size(filter(toks, t => array_contains(lit(words.toArray), t)))
              .cast("long").as("score"))
        }: _*)).as("cs"))
      .select(col("doc_id"), col("cs.cand_lang").as("_l"),
        col("cs.score").as("_s"))
    // Best = min over (−score, lang): max score with ties to the
    // SMALLEST code, matching langId's window order — but as one
    // struct-min aggregate, no rank window. Runner-up = max score among
    // the non-winners, an array-local fold over the collected (bounded,
    // |languages|-sized) candidate list.
    scored.groupBy(col("doc_id"))
      .agg(min(struct((-col("_s")).as("ns"), col("_l").as("l"))).as("_b"),
        collect_list(struct(col("_l"), col("_s"))).as("_all"))
      .select(col("doc_id"), (-col("_b.ns")).as("best_score"),
        col("_b.l").as("pred_lang"), col("_all"))
      .select(col("doc_id"), col("pred_lang"), col("best_score"),
        aggregate(filter(col("_all"),
            e => e.getField("_l") =!= col("pred_lang")),
          lit(0L), (acc, e) => greatest(acc, e.getField("_s")))
          .as("second_score"))
      .select(col("doc_id"), col("pred_lang"), col("best_score"),
        col("second_score"),
        (col("best_score") - col("second_score")).as("margin"),
        (col("best_score") - col("second_score") >= minMargin)
          .as("confident"))
  }

  /** Quality scoring: length, punctuation density, stopword ratio,
    * uppercase ratio — the standard cheap pre-training filters. All ratios
    * double, rounded 4 dp. */
  def qualityScore(docs: DataFrame, stopwords: Seq[String]): DataFrame = {
    // Tokenize once per doc (see [[langId]]).
    val toks = col("_toks")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => array_contains(lit(stopwords.toArray), t)))
    docs.select(col("doc_id"), col("text"), tokens(col("text")).as("_toks"))
      .select(
      col("doc_id"),
      nTok.as("n_tokens"),
      length(col("text")).as("len_chars"),
      round(regexp_count(col("text"), lit("[\\.,;:!?]")).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("punct_ratio"),
      round(regexp_count(col("text"), lit("[A-Z]")).cast("double") /
        greatest(length(col("text")), lit(1)), 4).as("upper_ratio"),
      round(nStop.cast("double") / greatest(nTok, lit(1)), 4).as("stopword_ratio"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish pre-tokenizer
    * regex (letter runs / digit runs / single other-symbols). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("ws_tokens"),
      regexp_count(col("text"), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))
        .as("bpe_tokens"))

  /** TF-IDF top terms per document: tf = in-doc term count, idf =
    * ln(N / df) over the corpus, score = tf·idf; the top `topK` terms per
    * doc by (score desc, term asc).
    *
    * Plan shape: one explode + hash agg for tf (shuffle on (doc, term)),
    * one hash agg for df (shuffle on term), N as a broadcast 1-row
    * aggregate; the per-doc top-k is a window over the doc partition —
    * partition-parallel, no global window, no driver state. The df side
    * joins on the term AFTER aggregation (bounded by vocabulary size, not
    * corpus size) — at 100 TB the vocabulary join is the small side and
    * broadcasts under AQE.
    *
    * Score arithmetic is double with ln — both engines fold
    * `tf * ln(N / df)` identically; rounded 6 dp on both sides. */
  def tfIdf(docs: DataFrame, topK: Int): DataFrame = {
    val tf = docs.select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(countDistinct(col("doc_id")).as("_n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(df_, Seq("term"))
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * log(col("_n").cast("double") / col("df")), 6))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= topK)
      .select(col("doc_id"), col("term"), col("tf").cast("long").as("tf"),
        col("df").cast("long").as("df"), col("score"))
  }

  /** Word n-gram array over the materialized token array `toks` —
    * array-local (no explode), shared by [[repetitionRatio]] /
    * [[topNgrams]] / [[Dedup.decontaminate]]. Empty array when the doc has
    * fewer than n tokens. */
  private[graft] def gramArray(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  /** Within-document repetition ratio — the Gopher/C4-style quality filter
    * that drops boilerplate/spam: 1 - distinct/total word n-grams (0 for
    * docs too short to have any). Pure array-local projection: the gram
    * loop never leaves the row, no explode, no shuffle — embarrassingly
    * parallel at 100 TB. Output: (doc_id, n_grams, n_distinct, rep_ratio).
    */
  def repetitionRatio(docs: DataFrame, n: Int): DataFrame = {
    val g = col("_g")
    docs.select(col("doc_id"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"), gramArray(col("_toks"), n).as("_g"))
      .select(col("doc_id"),
        size(g).as("n_grams"),
        size(array_distinct(g)).as("n_distinct"),
        when(size(g) === 0, lit(0.0))
          .otherwise(round(
            lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 4))
          .as("rep_ratio"))
  }

  /** Corpus-level top-k most frequent word n-grams (every occurrence
    * counts). One explode + ONE hash aggregate with map-side partial
    * combine, then TakeOrderedAndProject — no global sort, no second
    * shuffle. Ties break to the lexicographically smallest gram. */
  /** Every word n-gram occurrence in the corpus, one row each (column
    * `ngram`) — the shared front half of the corpus-frequency family
    * ([[topNgrams]], [[Sketch.cmsHeavyHitters]]). Narrow: tokenize +
    * array-local gram build + posexplode, no shuffle. */
  def corpusGrams(docs: DataFrame, n: Int): DataFrame =
    docs.select(tokens(col("text")).as("_toks"))
      .select(explode(gramArray(col("_toks"), n)).as("ngram"))

  /** Distinct-n diversity per group (Li et al. 2016's distinct-1/-2):
    * unique n-grams over total n-gram occurrences, the standard
    * mode-collapse / templated-text read for a GENERATED corpus — a
    * source whose distinct-2 craters is emitting the same phrasings over
    * and over, which per-doc repetition (x16) can't see because each
    * individual doc looks fine.
    *
    * Scale shape: one explode per n into a (group, gram) two-phase
    * distinct-aggregate — grain bounded by group×vocabulary, the same
    * shape as the corpus LM tables (x36/x61). No joins until the final
    * k-row zip of the two n levels. */
  def distinctN(docs: DataFrame, groupCol: String,
                textCol: String): DataFrame = {
    def stats(n: Int, tot: String, dst: String) =
      docs.select(col(groupCol), tokens(col(textCol)).as("_toks"))
        .select(col(groupCol), explode(gramArray(col("_toks"), n)).as("_g"))
        .groupBy(col(groupCol))
        .agg(count(lit(1)).cast("long").as(tot),
          countDistinct(col("_g")).cast("long").as(dst))
    stats(1, "_t1", "_d1").join(stats(2, "_t2", "_d2"), Seq(groupCol))
      .select(col(groupCol), col("_t1").as("n_unigrams"),
        round(col("_d1").cast("double") / col("_t1"), 6).as("distinct_1"),
        col("_t2").as("n_bigrams"),
        round(col("_d2").cast("double") / col("_t2"), 6).as("distinct_2"))
  }

  def topNgrams(docs: DataFrame, n: Int, k: Int): DataFrame =
    corpusGrams(docs, n)
      .groupBy(col("ngram"))
      .agg(count(lit(1)).as("occurrences"))
      .orderBy(col("occurrences").desc, col("ngram").asc)
      .limit(k)

  /** BM25 top-k retrieval over the corpus for a bag of query terms — the
    * lexical complement of the embedding ANN family
    * ([[Similarity.cosineTopK]]/`ivfTopK`): the ranking function behind
    * sparse retrieval in RAG and dedup-mining pipelines.
    *
    * Scale shape — the corpus NEVER shuffles: one full-scan aggregate
    * computes the collection statistics (N, total length, one
    * document-frequency per query term — query-term-bounded, so the
    * result is a single broadcast row), scoring is a narrow codegen
    * projection (per-term tf via array-local `filter`, never an explode
    * or posting-list join), and the top-k is TakeOrderedAndProject. The
    * per-term contributions fold in FIXED query order, so the double
    * arithmetic is deterministic and oracle-portable.
    *
    * Output: (idCol, bm25 DOUBLE round 4) for docs matching ≥1 term,
    * ordered score DESC with id tie-break, limited to k. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
    val aggs = Seq(
      count(lit(1)).cast("bigint").as("n_docs"),
      sum(size(col("_toks"))).cast("bigint").as("total_len")) ++
      queryTerms.zipWithIndex.map { case (t, i) =>
        sum(when(array_contains(col("_toks"), t), 1).otherwise(0))
          .cast("bigint").as(s"_df$i")
      }
    val stats = toks.agg(aggs.head, aggs.tail: _*)
    val dl = size(col("_toks"))
    // (1-b) + b·dl/avgdl with avgdl = total_len/n_docs, written as ONE
    // division so both engines evaluate the identical op sequence.
    val norm = lit(1 - b) +
      lit(b) * dl * col("n_docs") / col("total_len").cast("double")
    val tfs = queryTerms.map(t =>
      size(filter(col("_toks"), x => x === lit(t))))
    val contribs = tfs.zipWithIndex.map { case (tf, i) =>
      val df = col(s"_df$i")
      val idf = log(lit(1) + (col("n_docs") - df + lit(0.5)) / (df + lit(0.5)))
      idf * (tf * lit(k1 + 1)) / (tf + lit(k1) * norm)
    }
    toks.crossJoin(broadcast(stats))
      .withColumn("_ntf", tfs.reduce(_ + _))
      .filter(col("_ntf") > 0)
      .select(col(idCol), round(contribs.reduce(_ + _), 4).as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(k)
  }

  /** Zipf-law fit over the top-`topN` token frequencies: the slope of
    * log(freq) ~ log(rank) plus r², the corpus-health check that natural
    * text sits near slope -1 — a flat slope (synthetic/templated text) or
    * a cliff (boilerplate flood) both show up here before training does.
    *
    * Scale shape: one vocabulary-grain count agg, the top-N cut via
    * TakeOrderedAndProject (bounded), ranks from the range-partition +
    * zipWithIndex path, then ONE scalar aggregate of the closed-form
    * least-squares moments (covar_pop/var_pop — the same definition
    * regr_slope uses). Output: one row (n_tokens, zipf_slope, r2). */
  def zipfFit(docs: DataFrame, textCol: String, topN: Int): DataFrame = {
    val freqs = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("bigint").as("freq"))
      .orderBy(col("freq").desc, col("tok"))
      .limit(topN)
    val ranked = graft.queries.Serving.ranked(freqs, "freq", "tok")
      .withColumn("_lx", log(col("rank").cast("double")))
      .withColumn("_ly", log(col("freq").cast("double")))
    ranked.agg(
      count(lit(1)).cast("bigint").as("n_tokens"),
      round(covar_pop(col("_ly"), col("_lx")) / var_pop(col("_lx")), 4)
        .as("zipf_slope"),
      round(pow(corr(col("_ly"), col("_lx")), 2), 4).as("r2"))
  }

  /** Vocabulary coverage curve: the share of all token OCCURRENCES that
    * the top-k most frequent types cover, per k — the statistic that
    * sizes a tokenizer vocabulary (k where the curve elbows). One
    * vocabulary-grain agg, ranks via zipWithIndex, the k-grain roll-up is
    * a 3×-vocab conditional sum plus one broadcast scalar total. */
  def vocabCoverage(docs: DataFrame, textCol: String,
                    ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty, "need at least one k")
    val freqs = docs
      .select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("bigint").as("freq"))
    val ranked = graft.queries.Serving.ranked(freqs, "freq", "tok")
    val total = freqs.agg(sum(col("freq")).as("_t"))
    ranked
      .select(col("rank"), col("freq"),
        explode(typedLit(ks.map(_.toLong))).as("k"))
      .groupBy(col("k"))
      .agg(sum(when(col("rank") <= col("k"), col("freq")).otherwise(0L))
        .cast("bigint").as("covered"))
      .crossJoin(broadcast(total))
      .select(col("k"), col("covered"), col("_t").cast("bigint").as("total"),
        round(col("covered") * lit(1.0) / col("_t"), 4).as("coverage"))
  }

  /** Byte-Pair Encoding merge training (Sennrich et al. 2016) — the
    * actual tokenizer-training loop, not just x55's one-shot pair count:
    * starting from characters (+ the `</w>` end-of-word marker), each
    * round counts corpus-weighted adjacent symbol pairs, takes the most
    * frequent (ties to the lexicographically smallest), and merges EVERY
    * occurrence greedily left-to-right. Output: the ordered merge table
    * (step, lhs, rhs, merged, n) — the artifact a BPE tokenizer ships.
    *
    * The merge is pure string algebra, identical on both engines: words
    * are kept as DOUBLE-space-joined symbol strings padded with a double
    * space, and merging (A,B) is `replace(s, " A  B ", " AB ")` — the
    * pattern consumes one space of each outer double, the replacement
    * restores it, so back-to-back occurrences still match (a single-
    * space encoding breaks here: the first match eats the next match's
    * leading separator) and a pattern can never match inside a longer
    * symbol (symbol edges always carry ≥ 2 spaces). Plain left-to-right
    * non-overlapping replace IS BPE's greedy merge order. Everything is
    * exact integer counting — no doubles anywhere.
    *
    * Scale shape per round: the state is the WORD-FREQUENCY table
    * (vocabulary grain — BPE classically trains on it, never the
    * corpus); one array-local pair explode + one map-side-combined agg +
    * one TakeOrdered(1) collect (bounded: a single row per round — the
    * kMeans loop discipline) + one replace projection; localCheckpoint
    * truncates the per-round lineage. */
  def bpeTrain(docs: DataFrame, textCol: String,
               merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeMerges(docs, textCol, merges)
      .toDF("step", "lhs", "rhs", "merged", "n")
      .select(col("step").cast("int").as("step"), col("lhs"), col("rhs"),
        col("merged"), col("n").cast("long").as("n"))
  }

  /** The double-space symbol-string encoding of a word column (see
    * [[bpeTrain]] for the algebra). */
  private def symString(wordCol: Column): Column =
    concat(lit("  "),
      array_join(concat(split(wordCol, ""), array(lit("</w>"))), "  "),
      lit("  "))

  /** The training loop proper — returns the ordered merge list as
    * bounded driver metadata, shared by [[bpeTrain]] (which tabulates
    * it) and [[bpeEncode]] (which replays it over new text). */
  private[graft] def bpeMerges(docs: DataFrame, textCol: String,
                               merges: Int): Seq[(Int, String, String, String, Long)] = {
    var words = docs
      .select(explode(tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).cast("long").as("_cnt"))
      .select(symString(col("_w")).as("_s"), col("_cnt"))
      .localCheckpoint(eager = true)
    // Stops EARLY (returns the merges trained so far) when no adjacent
    // pair remains — every word a single symbol — instead of crashing on
    // an empty top-1; callers that need all `merges` steps (bpeFrontier)
    // check the returned length and name the dry budget.
    val out = Seq.newBuilder[(Int, String, String, String, Long)]
    var step = 1
    var dry = false
    while (step <= merges && !dry) {
      val syms = filter(split(col("_s"), "  "), x => length(x) > 0)
      val top = words
        .select(col("_cnt"), explode(when(size(syms) >= 2,
            transform(sequence(lit(1), size(syms) - 1),
              i => struct(element_at(syms, i).as("_l"),
                element_at(syms, i + 1).as("_r"))))
          .otherwise(array().cast("array<struct<_l:string,_r:string>>")))
          .as("_p"))
        .groupBy(col("_p._l").as("_l"), col("_p._r").as("_r"))
        .agg(sum(col("_cnt")).cast("long").as("_n"))
        .orderBy(col("_n").desc, col("_l").asc, col("_r").asc)
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val (l, r, n) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        words = words
          .select(replace(col("_s"), lit(s" $l  $r "), lit(s" $l$r "))
            .as("_s"), col("_cnt"))
          .localCheckpoint(eager = true)
        out += ((step, l, r, l + r, n))
        step += 1
      }
    }
    out.result()
  }

  /** BPE encoding pass — [[bpeTrain]]'s read leg (the pq train/encode
    * pairing): replay the ordered merge list over text and count the
    * resulting SUBWORD tokens per document, the real sequence-length
    * number x10's whitespace proxy stands in for (what packing, pricing
    * and context-window budgeting actually consume).
    *
    * Scale shape: merges apply to the DISTINCT-word table (vocabulary
    * grain — the same chain of `merges` replace projections as
    * training, never per-occurrence), and per-doc totals come from one
    * (doc, word)-grain count joined against that bounded dictionary —
    * broadcast when small. Integer-exact end to end. */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
                trainMerges: Seq[(Int, String, String, String, Long)]): DataFrame = {
    val docWords = docs
      .select(col(idCol), explode(tokens(col(textCol))).as("_w"))
      .groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val encoded = trainMerges.foldLeft(
        docWords.select(col("_w")).distinct()
          .withColumn("_s", symString(col("_w")))) {
        case (df, (_, l, r, _, _)) =>
          df.withColumn("_s",
            replace(col("_s"), lit(s" $l  $r "), lit(s" $l$r ")))
      }
      .select(col("_w"),
        size(filter(split(col("_s"), "  "), x => length(x) > 0))
          .cast("long").as("_nsym"))
    docWords.join(broadcast(encoded), Seq("_w"))
      .groupBy(col(idCol))
      .agg(sum(col("_c")).cast("long").as("n_ws_tokens"),
        sum(col("_c") * col("_nsym")).cast("long").as("n_bpe_tokens"))
  }

  /** BPE compression frontier — "what does each merge budget actually
    * buy" ([[bpeTrain]]'s sizing read, the x147 probe-frontier shape on
    * the tokenizer leg): ONE training run at the maximum budget (merge
    * lists are nested — budget m is the first m rows of the longest
    * list), the distinct-word dictionary re-encoded through the merge
    * chain with the symbol count SNAPSHOT at every requested budget,
    * then corpus totals per budget: total subword symbols,
    * symbols-per-whitespace-token (the packing/pricing number) and
    * symbols-per-character. Budget 0 is the char-level floor (word
    * chars + the `</w>` sentinel), so the curve starts at
    * ~1 + 1/avg_word_len symbols per char and falls as merges land.
    *
    * Scale shape: training is [[bpeMerges]]' vocabulary-grain loop
    * (bounded driver metadata); the snapshot chain is `maxBudget`
    * replace projections over the DISTINCT-word table with one extra
    * column per requested budget; corpus totals are one vocab-grain
    * join + scalar agg, unpivoted over a literal budget array. Integer
    * counts end to end; the two ratios are single divisions of exact
    * BIGINTs, rounded 6 dp. */
  def bpeFrontier(docs: DataFrame, textCol: String,
                  budgets: Seq[Int]): DataFrame = {
    require(budgets.nonEmpty && budgets.forall(_ >= 0) &&
      budgets == budgets.distinct.sorted,
      "budgets must be non-negative, strictly ascending, and distinct " +
        "(duplicates would collide on _nsym_<m> columns)")
    val merges = bpeMerges(docs, textCol, budgets.max)
    val wc = docs.select(explode(tokens(col(textCol))).as("_w"))
      .groupBy(col("_w")).agg(count(lit(1)).cast("long").as("_c"))
    def nsym = size(filter(split(col("_s"), "  "), x => length(x) > 0))
      .cast("long")
    val dict0 = wc.select(col("_w")).distinct()
      .withColumn("_s", symString(col("_w")))
    val snap0 = if (budgets.head == 0) dict0.withColumn("_nsym_0", nsym)
                else dict0
    val dict = merges.foldLeft(snap0) { case (df, (step, l, r, _, _)) =>
      val replaced = df.withColumn("_s",
        replace(col("_s"), lit(s" $l  $r "), lit(s" $l$r ")))
      if (budgets.contains(step)) replaced.withColumn(s"_nsym_$step", nsym)
      else replaced
    }
    val missing = budgets.filterNot(m =>
      m == 0 || dict.columns.contains(s"_nsym_$m"))
    require(missing.isEmpty,
      s"budgets ${missing.mkString(", ")} exceed the corpus' trainable " +
        "merge count — bpeMerges ran dry before reaching them")
    val aggCols = sum(col("_c")).cast("long").as("_tok") +:
      sum(col("_c") * length(col("_w"))).cast("long").as("_chars") +:
      budgets.map(m =>
        sum(col("_c") * col(s"_nsym_$m")).cast("long").as(s"_sym_$m"))
    val totals = wc.join(broadcast(dict.drop("_s")), Seq("_w"))
      .agg(aggCols.head, aggCols.tail: _*)
    totals
      .select(explode(array(budgets.map(m => struct(
          lit(m).as("merges"), col(s"_sym_$m").as("n_symbols"))): _*))
          .as("_b"),
        col("_tok"), col("_chars"))
      .select(col("_b.merges").cast("int").as("merges"),
        col("_tok").as("n_ws_tokens"), col("_chars").as("n_chars"),
        col("_b.n_symbols").as("n_symbols"),
        round(col("_b.n_symbols").cast("double") / col("_tok"), 6)
          .as("symbols_per_token"),
        round(col("_b.n_symbols").cast("double") / col("_chars"), 6)
          .as("symbols_per_char"))
  }

  /** Pairwise Jensen–Shannon divergence matrix between the sources'
    * unigram distributions — the SYMMETRIC, bounded [0, ln 2] companion
    * of x101's one-vs-corpus KL: which pairs of sources are
    * interchangeable and which are different corpora wearing one schema.
    * The clustering read before x51 reweights or x23 fits mixtures.
    *
    * Computed via the entropy decomposition JSD = H(m) − (H(p)+H(q))/2
    * with m = (p+q)/2, which needs NO per-pair full-outer join: tokens
    * in both supports contribute through ONE (token)-grain equi-self-join
    * (automatically enumerating every source pair that shares a token);
    * tokens in only one support contribute (p_t/2)ln(1/2)-style terms
    * that fold into per-source scalars minus the shared part —
    * Σ_{a-only}(p/2)ln(p/2) = hh_a − Σ_{both}(p/2)ln(p/2). So the plan
    * is: one (source, token) count agg, one broadcast totals join, one
    * token-keyed self-join at Σ_t df(t)² pair-rows, two source-grain
    * scalar joins. Cost is dictionary-grain throughout — |S|²·overlap,
    * never corpus².
    *
    * Exactness: p = c/n is one BIGINT-to-double division per row on both
    * engines; the ln-weighted sums carry summation-order noise → 4 dp
    * (the x101 grain). Pairs sharing zero tokens are definitionally
    * absent (their JSD is exactly ln 2; the fixture's sources all
    * overlap). Output: (src_a, src_b, n_shared_types, jsd). */
  def jsdMatrix(docs: DataFrame, sourceCol: String,
                textCol: String): DataFrame = {
    val st = docs.select(col(sourceCol).as("_s"),
        explode(tokens(lower(col(textCol)))).as("_t"))
      .groupBy(col("_s"), col("_t"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val ns = st.groupBy(col("_s")).agg(sum(col("_c")).as("_n"))
    val p = st.join(broadcast(ns), Seq("_s"))
      .select(col("_s"), col("_t"),
        (col("_c").cast("double") / col("_n")).as("_p"))
    // Per-source scalars: hh = Σ (p/2)ln(p/2) over the full support;
    // hp = Σ p·ln p (so H(p) = −hp). |S| rows, broadcast into the pairs.
    val scal = p.groupBy(col("_s"))
      .agg(sum((col("_p") / 2) * log(col("_p") / 2)).as("_hh"),
        sum(col("_p") * log(col("_p"))).as("_hp"))
    val both = p.as("a").join(p.as("b"),
        col("a._t") === col("b._t") && col("a._s") < col("b._s"))
      .groupBy(col("a._s").as("src_a"), col("b._s").as("src_b"))
      .agg(count(lit(1)).cast("long").as("n_shared_types"),
        sum(((col("a._p") + col("b._p")) / 2) *
          log((col("a._p") + col("b._p")) / 2)).as("_mB"),
        sum((col("a._p") / 2) * log(col("a._p") / 2)).as("_aB"),
        sum((col("b._p") / 2) * log(col("b._p") / 2)).as("_bB"))
    both
      .join(broadcast(scal.select(col("_s").as("src_a"),
        col("_hh").as("_hha"), col("_hp").as("_hpa"))), Seq("src_a"))
      .join(broadcast(scal.select(col("_s").as("src_b"),
        col("_hh").as("_hhb"), col("_hp").as("_hpb"))), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("n_shared_types"),
        // H(m) = −(mB + (hh_a − aB) + (hh_b − bB)); JSD = H(m) − (H(p)+H(q))/2
        round(-(col("_mB") + (col("_hha") - col("_aB")) +
            (col("_hhb") - col("_bB"))) +
          (col("_hpa") + col("_hpb")) / 2, 4).as("jsd"))
  }

  /** Heaps' law fit (Heaps 1978): the vocabulary-growth exponent β in
    * V(n) ≈ K·n^β, estimated by log-log OLS over the cumulative
    * (tokens seen, distinct types seen) curve — the statistic that
    * PREDICTS how much new vocabulary the next 10× of corpus will bring
    * (x84 reads the frequency curve of the corpus you have; this
    * extrapolates the one you don't yet). β near 0.5 is classic natural
    * text; β near 1 means vocabulary is still exploding (ids, hashes —
    * a tokenizer-sizing red flag).
    *
    * The curve is built WITHOUT a global-order window (the no-single-
    * partition convention): docs bucket by id into ≤ nBuckets ranges
    * (width from one collected max-id scalar — the x80 frozen-range
    * discipline), per-bucket token totals and FIRST-bucket-per-type
    * counts aggregate at bucket/vocab grain, and the prefix sums
    * densify by each bucket row exploding its own suffix grid
    * `sequence(b, nBuckets−1)` — a generator, not a join. The fit is
    * one scalar agg over ≤ nBuckets exact-integer points; doubles enter
    * only at the final ln/divide (β, ln K rounded 4 dp — the x101
    * double-sum grain).
    *
    * Output (1 row): n_points, total_tokens, vocab, beta, ln_k. */
  def heapsFit(docs: DataFrame, idCol: String, typesCol: Column,
               nBuckets: Int): DataFrame = {
    require(nBuckets >= 2, "need at least two curve points")
    val maxId = docs.agg(max(col(idCol)).cast("long")).head.getLong(0)
    val width = maxId / nBuckets + 1
    val toks = docs.select(expr(s"$idCol div $width").as("_b"),
      explode(typesCol).as("_tok"))
    val suffix = explode(sequence(col("_b"), lit(nBuckets - 1L))).as("_gb")
    val cumTok = toks.groupBy(col("_b"))
      .agg(count(lit(1)).cast("long").as("_nt"))
      .select(suffix, col("_nt"))
      .groupBy(col("_gb")).agg(sum(col("_nt")).cast("long").as("_ct"))
    val cumTyp = toks.groupBy(col("_tok")).agg(min(col("_b")).as("_b"))
      .groupBy(col("_b")).agg(count(lit(1)).cast("long").as("_nv"))
      .select(suffix, col("_nv"))
      .groupBy(col("_gb")).agg(sum(col("_nv")).cast("long").as("_cv"))
    cumTok.join(cumTyp, Seq("_gb"))
      .select(log(col("_ct").cast("double")).as("_x"),
        log(col("_cv").cast("double")).as("_y"),
        col("_ct"), col("_cv"))
      .agg(count(lit(1)).cast("long").as("n_points"),
        max(col("_ct")).as("total_tokens"), max(col("_cv")).as("vocab"),
        sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
        sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"))
      .select(col("n_points"), col("total_tokens"), col("vocab"),
        ((col("n_points") * col("_sxy") - col("_sx") * col("_sy")) /
          (col("n_points") * col("_sxx") - col("_sx") * col("_sx")))
          .as("_beta"),
        col("_sx"), col("_sy"))
      .select(col("n_points"), col("total_tokens"), col("vocab"),
        round(col("_beta"), 4).as("beta"),
        round((col("_sy") - col("_beta") * col("_sx")) / col("n_points"), 4)
          .as("ln_k"))
  }

  /** Corpus-driven stopword discovery: tokens whose DOCUMENT frequency
    * exceeds `minDocFrac` of the corpus — the data-dependent stoplist a
    * retrieval/TF-IDF pipeline builds before indexing (vs x52's fixed
    * external vocabulary). Per-doc distinct tokens (array-local) → one
    * map-side-combined token-grain agg → broadcast scalar doc count; the
    * output is vocabulary-grain, bounded by the dictionary not the corpus.
    * Output: (tok, df, doc_frac) for df/n_docs >= minDocFrac. */
  def stopwordDiscovery(docs: DataFrame, textCol: String,
                        minDocFrac: Double): DataFrame = {
    val tokDf = docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("bigint").as("df"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    tokDf.crossJoin(broadcast(nDocs))
      .withColumn("doc_frac", round(col("df") * lit(1.0) / col("_n"), 4))
      .filter(col("df") * lit(1.0) / col("_n") >= minDocFrac)
      .select(col("tok"), col("df"), col("doc_frac"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) over N retrieval lists —
    * the standard hybrid-retrieval combiner (lexical BM25 + embedding
    * cosine) for RAG / eval-set construction: each list contributes
    * `1/(kRrf + rank)` and documents appearing in several lists float up.
    *
    * Input lists are `(name, df)` where df has `idCol` and a 1-based
    * `rank` column (produce them with [[graft.queries.Serving.ranked]] —
    * the range-partition + zipWithIndex path, NOT a global window).
    * Retrieval lists are top-k frames, so every stage here is bounded:
    * union of N·k rows, one tiny hash agg, TakeOrdered for the cut.
    *
    * Output: `(idCol, rrf, <name>_rank...)` with rank 0 = absent from that
    * list; rrf rounded 6 dp; top `topK` by (rrf DESC, id). */
  def rrfFusion(lists: Seq[(String, DataFrame)], idCol: String, topK: Int,
                kRrf: Int = 60): DataFrame = {
    require(lists.nonEmpty, "need at least one ranked list")
    val tagged = lists.zipWithIndex.map { case ((_, df), i) =>
      df.select(col(idCol), lit(i).as("_l"), col("rank").cast("long").as("_r"))
    }.reduce(_ unionAll _)
    val rankCols = lists.zipWithIndex.map { case ((name, _), i) =>
      coalesce(max(when(col("_l") === i, col("_r"))), lit(0L))
        .as(s"${name}_rank")
    }
    tagged.groupBy(col(idCol))
      .agg(round(sum(lit(1.0) / (lit(kRrf) + col("_r"))), 6).as("rrf"),
        rankCols: _*)
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topK)
  }

  /** PII patterns for [[piiScrub]] — deliberately conservative,
    * dialect-portable regexes (same semantics under Java regex and RE2,
    * the two engines the oracle parity spans). */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b[0-9]{3}[-.][0-9]{3,4}[-.][0-9]{4}\\b", "<PHONE>"),
    ("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** PII scrubbing — the redaction pass every pre-training pipeline runs:
    * count and replace emails/phones/IPs with typed placeholder tokens.
    * Pure projection (codegen `regexp_count`/`regexp_replace` chains), no
    * shuffle; the scrubbed text is surfaced as an md5 so the full replaced
    * content is oracle-checked without shipping it. */
  def piiScrub(docs: DataFrame): DataFrame = {
    val scrubbed = piiPatterns.foldLeft(col("text")) {
      case (c, (_, pat, repl)) => regexp_replace(c, pat, repl)
    }
    val counts = piiPatterns.map { case (name, pat, _) =>
      regexp_count(col("text"), lit(pat)).cast("int").as(s"n_$name")
    }
    docs.select(col("doc_id") +: counts :+ md5(scrubbed).as("scrubbed_hash"): _*)
  }

  /** α-smoothed mixture weights per corpus facet — the data-mixing recipe
    * (sample source s proportionally to (n_s/N)^α) used to rebalance web
    * vs curated sources in LLM training mixes. One hash agg + a broadcast
    * 1-row total; output is one row per facet. */
  def mixtureWeights(docs: DataFrame, groupCol: String, alpha: Double): DataFrame = {
    val counts = docs.groupBy(col(groupCol)).agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("_n"))
    val raw = counts.crossJoin(broadcast(total))
      .withColumn("_w", pow(col("n_docs").cast("double") / col("_n"), alpha))
    val z = raw.agg(sum(col("_w")).as("_z"))
    raw.crossJoin(broadcast(z))
      .select(col(groupCol), col("n_docs"),
        round(col("_w") / col("_z"), 6).as("weight"))
  }

  /** Exact length quantiles per corpus facet — the distribution check run
    * before picking truncation/packing budgets. Uses Spark's exact
    * `percentile` (linear interpolation at rank p·(n-1), the same
    * definition as DuckDB's `quantile_cont`, so the oracle matches
    * bitwise after rounding). One hash agg; for 100-TB corpora swap in
    * `percentile_approx` per partition — the operator shape is identical. */
  def lengthQuantiles(docs: DataFrame, ps: Seq[Double]): DataFrame = {
    val qcols = ps.map(p =>
      round(expr(s"percentile(_ntok, $p)"), 4).as(s"p${(p * 100).toInt}"))
    val aggs = count(lit(1)).as("n_docs") +: qcols
    docs.select(col("lang"), size(tokens(col("text"))).as("_ntok"))
      .groupBy(col("lang"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Document fingerprint (winnowing-lite): minimum 32-bit hash over the
    * document's character k-grams, plus the distinct-gram count. Equal
    * fingerprints are dedup candidates; the min-of-hashes is the 1-row
    * degenerate of a winnowing window. */
  def fingerprints(docs: DataFrame, k: Int): DataFrame = {
    val t = col("text")
    val grams = when(length(t) >= k,
      transform(sequence(lit(1), length(t) - (k - 1)), i => t.substr(i, lit(k))))
      .otherwise(array(t))
    // All array-local arithmetic: no explode, no shuffle — the per-doc gram
    // loop stays inside projections instead of shuffling |text| rows per
    // doc through a hash aggregate. The gram array is materialized in its
    // own projection so both consumers share one construction.
    docs.select(col("doc_id"), grams.as("_g"))
      .select(col("doc_id"),
        array_min(transform(col("_g"), g => Dedup.shingleHash(g))).as("fingerprint"),
        size(array_distinct(col("_g"))).cast("long").as("n_grams"))
  }

  /** Token-window chunking — split every document into `chunkSize`-token
    * windows advancing by `chunkSize - overlap` (the standard
    * training/RAG pre-pass; overlap keeps boundary context). ALL
    * array-local: tokenize once, compute the chunk count arithmetically,
    * slice per chunk inside a `transform`, and `posexplode` — output rows
    * are chunk-count bounded; nothing shuffles (narrow transform end to
    * end). A doc shorter than one stride still yields its single
    * (possibly short) chunk, so no document silently disappears.
    *
    * Output: (idCol, chunk_idx, n_tokens, chunk_text). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(overlap >= 0 && overlap < chunkSize, "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    docs.select(col(idCol), tokens(col(textCol)).as("_t"))
      .withColumn("_n", greatest(lit(1L),
        ceil((size(col("_t")) - overlap) / lit(stride.toDouble)).cast("long")))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0L), col("_n") - 1),
          i => slice(col("_t"), (i * stride + 1).cast("int"), lit(chunkSize)))))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        size(col("col")).as("n_tokens"),
        concat_ws(" ", col("col")).as("chunk_text"))
  }

  /** Boilerplate detection — the C4-style cross-document repeated-segment
    * pass: chunk the corpus ([[chunk]], overlap 0 so occurrences count
    * cleanly) and keep every chunk text that occurs more than once, with
    * how many documents carry it. One map-side-combined hash aggregate on
    * the chunk hash after the narrow chunking projection; at 100 TB this
    * is the exact-dedup shuffle shape on chunk grain.
    *
    * Output: (chunk_hash, n_docs, n_occurrences). */
  def boilerplate(docs: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int): DataFrame =
    chunk(docs, idCol, textCol, chunkSize)
      .groupBy(md5(col("chunk_text")).as("chunk_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > 1)

  /** Unigram-LM document scoring — the "perplexity filter" shape (CCNet /
    * Gopher pipelines score docs with a cheap LM and drop the tails) with
    * the LM trained on the corpus itself in the same job: per-doc mean
    * token log-probability under the corpus unigram distribution.
    *
    * Scale shape: tokenize + explode once into (doc, token, cnt) — one
    * shuffle agg; the vocabulary table is a re-agg of THAT frame (vocab ≪
    * corpus), so text is scanned and tokenized exactly once and Catalyst's
    * ReuseExchange serves both consumers of the (doc, token) shuffle. The
    * score join runs keyed on token — stopword-grade hot keys are exactly
    * what AQE skew-join splitting is for; the corpus-total is a broadcast
    * 1-row scalar. Higher (less negative) = more typical text.
    *
    * Output: (doc_id, n_tokens, lm_score). */
  def unigramLmScore(docs: DataFrame): DataFrame = {
    val dt = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("cnt"))
    val vocab = dt.groupBy(col("token")).agg(sum(col("cnt")).as("freq"))
    val total = vocab.agg(sum(col("freq")).cast("double").as("_n"))
    dt.join(vocab, "token")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("cnt")).cast("long").as("n_tokens"),
        round(sum(col("cnt") * log(col("freq").cast("double") / col("_n")))
          / sum(col("cnt")), 4).as("lm_score"))
  }

  /** Per-source quality gate — the domain-filter pass (keep documents only
    * from sources whose aggregate quality clears a bar; here the bar is the
    * corpus-wide mean document length, the cheap always-available signal).
    *
    * Scale shape: ONE hash agg to source grain (source cardinality ≪ docs,
    * so the per-source frame broadcasts), the global bar derived from that
    * tiny frame (sum-of-sums, not avg-of-avgs — weighting stays exact), and
    * the gate applied as a broadcast hash join back onto the corpus — the
    * 100-TB side never shuffles. All numerators/denominators stay exact
    * longs until one final double division, so the >= comparison is
    * engine-portable.
    *
    * Output: (doc_id, source, src_avg_chars) for docs of passing sources. */
  def sourceQualityGate(docs: DataFrame): DataFrame = {
    val bySrc = docs.groupBy(col("source"))
      .agg(sum(col("n_chars")).as("_s"), count(lit(1)).as("_n"))
    val global = bySrc.agg(
      (sum(col("_s")).cast("double") / sum(col("_n"))).as("_gavg"))
    docs.join(broadcast(bySrc), "source")
      .crossJoin(broadcast(global))
      .where(col("_s").cast("double") / col("_n") >= col("_gavg"))
      .select(col("doc_id"), col("source"),
        round(col("_s").cast("double") / col("_n"), 4).as("src_avg_chars"))
  }

  /** Tokenizer-coverage analysis: build the top-`vocabSize` corpus
    * vocabulary (by total occurrence count, token tie-break), then score
    * every document's OUT-OF-VOCABULARY rate against it — the coverage
    * check run before committing to a tokenizer/vocab for training.
    *
    * Scale shape: vocabulary = one map-side-combined token count agg +
    * TakeOrdered (vocab-sized, bounded) broadcast back as a left-semi
    * membership probe per exploded token; the per-doc rate is a second
    * hash agg at doc grain. The corpus shuffles token COUNTS (post
    * combine), never documents.
    *
    * Output: (doc_id, n_tokens, n_oov, oov_rate rounded 6 dp). Docs with
    * no tokens have nothing to cover and are absent. */
  /** BPE merge-candidate table — the inner signal of byte-pair-encoding
    * tokenizer TRAINING: adjacent character-pair frequencies weighted by
    * word frequency (each word counted once, then its pair contributions
    * scaled by its corpus count — exactly how BPE's first merge is
    * chosen; iterating merge+recount yields the full vocab). Emits the
    * top `k` pairs by weighted count, pair tie-break — the argmax row IS
    * the first merge.
    *
    * Scale shape: one word-count agg (map-side combined — the shuffle
    * carries distinct words, not the corpus), then pair generation stays
    * ARRAY-LOCAL per distinct word (a word's pair multiset via one
    * projection) before a second slim (pair, weight) agg +
    * TakeOrderedAndProject. The corpus text is read once. */
  def bpePairCandidates(docs: DataFrame, textCol: String,
                        k: Int): DataFrame = {
    val words = docs.select(explode(tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("_wc"))
    val pairs = words
      .withColumn("pair", explode(when(length(col("word")) >= 2,
        transform(sequence(lit(1), length(col("word")) - 1),
          i => col("word").substr(i, lit(2))))
        .otherwise(array().cast("array<string>"))))
    pairs.groupBy(col("pair"))
      .agg(sum(col("_wc")).as("weighted_count"))
      .orderBy(col("weighted_count").desc, col("pair").asc)
      .limit(k)
  }

  /** Bigram-LM fluency scoring — the conditional-probability upgrade of
    * [[unigramLmScore]] (the CCNet/KenLM filtering shape, self-trained on
    * the corpus): per-doc mean ln P(w2|w1) with P = bigram count over the
    * first-word marginal of the SAME bigram table, so the model is
    * self-consistent and every scored bigram has nonzero probability.
    *
    * Scale shape: bigram generation is array-local per doc (one
    * projection, no shuffle); the count tables aggregate map-side and
    * carry the bigram VOCABULARY, not the corpus; the score join ships
    * (doc, w1, w2) instances against those count tables — the same join
    * grain x36 already carries for unigrams. AQE picks broadcast vs
    * shuffled-hash by the measured vocabulary size.
    *
    * Output: (doc_id, n_bigrams, bi_score 4 dp); docs with < 2 tokens
    * have no bigrams and are absent. */
  def bigramLmScore(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("_t"))
      .filter(size(col("_t")) >= 2)
    val bi = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("_t")) - 2),
        i => struct(element_at(col("_t"), i + 1).as("w1"),
          element_at(col("_t"), i + 2).as("w2")))).as("_b"))
      .select(col("doc_id"), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    val bc = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("_bc"))
    val uc = bc.groupBy(col("w1")).agg(sum(col("_bc")).cast("double").as("_uc"))
    bi.join(bc, Seq("w1", "w2")).join(uc, Seq("w1"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        round(sum(log(col("_bc").cast("double") / col("_uc"))) /
          count(lit(1)), 4).as("bi_score"))
  }

  /** Word2vec negative-sampling distribution (Mikolov et al. 2013):
    * P_ns(w) ∝ count(w)^α with α = 0.75 — the smoothed unigram table
    * every contrastive text trainer draws negatives from (raw frequency
    * over-samples stopwords; uniform under-trains them; ¾ is the
    * published sweet spot). Emitted next to the raw unigram probability
    * so the smoothing's effect is visible per token.
    *
    * Scale shape: one word-count agg (vocabulary grain), one broadcast
    * scalar row for the normalizer, TakeOrderedAndProject for the
    * top-k. At serving time the table becomes the alias-method input —
    * this operator is the distribution builder, not the sampler. */
  def negativeSamplingTable(docs: DataFrame, textCol: String,
                            alpha: Double, k: Int): DataFrame = {
    val wc = docs.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).cast("long").as("_c"))
    val z = wc.agg(sum(pow(col("_c").cast("double"), alpha)).as("_z"),
      sum(col("_c")).cast("long").as("_n"))
    wc.crossJoin(broadcast(z))
      .select(col("token"), col("_c").as("c"),
        round(col("_c").cast("double") / col("_n"), 6).as("p_unigram"),
        round(pow(col("_c").cast("double"), alpha) / col("_z"), 6)
          .as("p_negative"))
      .orderBy(col("c").desc, col("token"))
      .limit(k)
  }

  /** Good–Turing unseen mass + Chao1 richness per group, at n-gram grain
    * (Good 1953; Chao 1984): the singleton fraction n₁/N estimates the
    * probability the NEXT gram drawn is one never seen — "how much of
    * this source's diversity is still unsampled" — and the
    * bias-corrected Chao1 (V + n₁(n₁−1)/(2(n₂+1))) estimates the true
    * vocabulary the sample is drawn from. The pair tells a curriculum
    * whether more data from a source buys novelty or reruns; x138's
    * backoff_rate measures realized novelty, this predicts it.
    *
    * Scale shape: one array-local gram explode into a (group, gram)
    * count agg — the LM-table grain — then a group-grain fold of the
    * frequency-of-frequencies. No joins, no windows. */
  def unseenMassEstimate(docs: DataFrame, groupCol: String,
                         textCol: String, n: Int): DataFrame =
    unseenMassFromCounts(
      docs.select(col(groupCol), tokens(col(textCol)).as("_t"))
        .select(col(groupCol), explode(gramArray(col("_t"), n)).as("_g"))
        .groupBy(col(groupCol), col("_g"))
        .agg(count(lit(1)).cast("long").as("_c")),
      groupCol)

  /** The Good–Turing/Chao1 fold over a pre-counted (group, gram, _c)
    * table — shared by the batch operator and the streaming monitor,
    * whose maintained additive gram-count state IS such a table. */
  private[graft] def unseenMassFromCounts(counts: DataFrame,
                                          groupCol: String): DataFrame =
    counts.groupBy(col(groupCol))
      .agg(sum(col("_c")).cast("long").as("_n"),
        count(lit(1)).cast("long").as("_v"),
        sum(when(col("_c") === 1L, 1L).otherwise(0L)).cast("long").as("_n1"),
        sum(when(col("_c") === 2L, 1L).otherwise(0L)).cast("long").as("_n2"))
      .select(col(groupCol), col("_n").as("n_grams"), col("_v").as("vocab"),
        col("_n1").as("n1"), col("_n2").as("n2"),
        round(col("_n1").cast("double") / col("_n"), 6)
          .as("gt_unseen_mass"),
        round(col("_v") + col("_n1").cast("double") * (col("_n1") - 1L) /
          (lit(2L) * (col("_n2") + 1L)), 2).as("chao1"))

  /** Trigram stupid-backoff scoring (Brants et al. 2007, "Large Language
    * Models in Machine Translation") — the held-out upgrade of
    * [[bigramLmScore]]: x61 trains on the corpus it scores, so every
    * bigram is seen and no backoff ever fires; here the count tables
    * train on the deterministic md5-half of the corpus (the split
    * discipline) and score the OTHER half, so unseen trigrams genuinely
    * cascade S(w₃|w₁w₂) = t/b₁₂ → 0.4·b₂₃/u₂ → 0.4²·(u₃+1)/(N+V) —
    * the exact shape of scoring fresh crawl against yesterday's model.
    * The base case is add-one smoothed so OOV words score finitely.
    *
    * Scale shape: gram generation is array-local; count tables carry the
    * train-half VOCABULARY; scoring ships trigram instances against
    * three vocabulary-grain tables (left joins, AQE-sized) — the x61
    * join grain, one level deeper. N and V ride one broadcast scalar
    * row. Output: (doc_id, n_trigrams, backoff_rate 4 dp, tri_score
    * 4 dp) over score-half docs with ≥ 3 tokens. */
  def trigramBackoffScore(docs: DataFrame): DataFrame = {
    val isTrain = substring(md5(col("doc_id").cast("string")), 1, 1) >= "8"
    def grams(df: DataFrame, n: Int) =
      df.select(col("doc_id"), tokens(col("text")).as("_t"))
        .filter(size(col("_t")) >= n)
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("_t")) - n),
            i => struct((1 to n).map(o =>
              element_at(col("_t"), i + o).as(s"w$o")): _*))).as("_g"))
        .select(col("doc_id") +: (1 to n).map(o => col(s"_g.w$o")): _*)
    val train = docs.filter(isTrain)
    val tc = grams(train, 3).groupBy(col("w1"), col("w2"), col("w3"))
      .agg(count(lit(1)).cast("long").as("_t3"))
    val bc = grams(train, 2).groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).cast("long").as("_b"))
    val uc = grams(train, 1).groupBy(col("w1"))
      .agg(count(lit(1)).cast("long").as("_u"))
    val nv = uc.agg(sum(col("_u")).cast("double").as("_N"),
      count(lit(1)).cast("double").as("_V"))
    val inst = grams(docs.filter(!isTrain), 3)
    val s = inst
      .join(tc, Seq("w1", "w2", "w3"), "left")
      .join(bc, Seq("w1", "w2"), "left")
      .join(bc.select(col("w1").as("w2"), col("w2").as("w3"),
        col("_b").as("_b23")), Seq("w2", "w3"), "left")
      .join(uc.select(col("w1").as("w2"), col("_u").as("_u2")), Seq("w2"),
        "left")
      .join(uc.select(col("w1").as("w3"), col("_u").as("_u3")), Seq("w3"),
        "left")
      .na.fill(0L, Seq("_t3", "_b", "_b23", "_u2", "_u3"))
      .crossJoin(broadcast(nv))
    val base = lit(0.4) * lit(0.4) *
      (col("_u3") + 1L) / (col("_N") + col("_V"))
    val score = when(col("_t3") > 0L,
        col("_t3").cast("double") / col("_b"))
      .when(col("_b23") > 0L,
        lit(0.4) * col("_b23").cast("double") / col("_u2"))
      .otherwise(base)
    s.groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_trigrams"),
        round(sum(when(col("_t3") > 0L, 0L).otherwise(1L)) /
          count(lit(1)).cast("double"), 4).as("backoff_rate"),
        round(sum(log(score)) / count(lit(1)), 4).as("tri_score"))
  }

  /** Robust per-source length-outlier gate: docs outside the Tukey fence
    * [q1 − 1.5·IQR, q3 + 1.5·IQR] of their OWN source's n_chars
    * distribution — the robust-statistics complement of [[sourceQualityGate]]
    * (a mean-based gate a few giant docs can drag; quartiles cannot be).
    *
    * Scale shape: one per-source exact-percentile aggregate (source-count
    * rows) broadcast back; the fence test is a codegen filter — the corpus
    * never shuffles. Fences are rounded 4 dp BEFORE the comparison on
    * both engines (repo convention) so an interpolation ulp cannot flip a
    * boundary doc. Output: the outlier docs with their fences. */
  def lengthOutliers(docs: DataFrame): DataFrame = {
    val st = docs.groupBy(col("source")).agg(
      round(expr("percentile(n_chars, 0.25)"), 4).as("_q1"),
      round(expr("percentile(n_chars, 0.75)"), 4).as("_q3"))
    val fences = st.select(col("source"),
      round(col("_q1") - (col("_q3") - col("_q1")) * 1.5, 4).as("lo"),
      round(col("_q3") + (col("_q3") - col("_q1")) * 1.5, 4).as("hi"))
    docs.join(broadcast(fences), "source")
      .where(col("n_chars").cast("double") < col("lo") ||
        col("n_chars").cast("double") > col("hi"))
      .select(col("doc_id"), col("source"), col("n_chars"), col("lo"), col("hi"))
  }

  /** Character-entropy gibberish filter: Shannon entropy (bits/char) of
    * each document's character distribution — low entropy flags repeated-
    * character spam and template boilerplate, abnormally high entropy
    * flags base64/hex blobs; both are standard cheap pre-training drops.
    *
    * Scale shape: fully ARRAY-LOCAL per row (split → distinct → counted
    * via higher-order filter/aggregate) — zero shuffles, zero joins; the
    * embarrassingly-parallel ideal at 100 TB. The per-row cost is
    * O(distinct·len), bounded by the alphabet (distinct ≤ ~100), not the
    * corpus. Entropy is computed as log2(L) − Σ n·log2(n)/L (one division
    * at the end) so both engines fold the identical expression tree.
    *
    * Output: (doc_id, len_chars, n_distinct_chars, char_entropy 4 dp). */
  def charEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val chars = filter(split(col(textCol), ""), c => length(c) > 0)
    val log2 = (x: Column) => log(2.0, x)
    docs.select(col(idCol), chars.as("_cs"))
      .select(col(idCol), col("_cs"), array_distinct(col("_cs")).as("_dc"),
        size(col("_cs")).cast("double").as("_len"))
      .select(
        col(idCol),
        col("_len").cast("long").as("len_chars"),
        size(col("_dc")).cast("long").as("n_distinct_chars"),
        round(log2(col("_len")) -
          aggregate(col("_dc"), lit(0.0d), (acc, c) => {
            val n = size(filter(col("_cs"), x => x === c)).cast("double")
            acc + n * log2(n)
          }) / col("_len"), 4).as("char_entropy"))
  }

  /** N-gram NOVELTY scoring — the diversity complement of
    * [[Dedup.decontaminate]]'s overlap: per doc, the share of its
    * distinct word n-grams appearing NOWHERE else in the corpus (df = 1).
    * High-novelty docs carry unique content; near-zero novelty flags
    * templates the near-dup family may have missed.
    *
    * Scale shape: gram generation is array-local, the per-doc DISTINCT
    * and the df agg both shuffle gram-grain rows (map-side combined) —
    * the same grain x18/x15 already carry; the df table joins back at
    * gram grain, and the final agg returns to doc grain.
    *
    * Output: (doc_id, n_grams, n_unique, novelty 4 dp); docs with < n
    * tokens have no grams and are absent. */
  def ngramNovelty(docs: DataFrame, n: Int): DataFrame = {
    val g = docs.select(col("doc_id"), tokens(col("text")).as("_t"))
      .select(col("doc_id"), explode(gramArray(col("_t"), n)).as("g"))
      .distinct()
    val df_ = g.groupBy(col("g")).agg(count(lit(1)).as("_df"))
    g.join(df_, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_grams"),
        sum(when(col("_df") === 1, 1L).otherwise(0L)).cast("long")
          .as("n_unique"))
      .withColumn("novelty",
        round(col("n_unique").cast("double") / col("n_grams"), 4))
      .select(col("doc_id"), col("n_grams"), col("n_unique"), col("novelty"))
  }

  /** Multi-signal quality ENSEMBLE (the FineWeb-style composition): three
    * cheap signals — token count, punctuation density, char entropy —
    * each thresholded at its own corpus MEDIAN; a doc survives by passing
    * at least 2 of 3, so no single noisy signal can drop good text.
    *
    * Scale shape: signals are one array-local projection per doc (the
    * entropy is x56's shuffle-free fold); medians are ONE scalar
    * exact-percentile aggregate broadcast back (percentile_approx is the
    * documented 100 TB swap, cf. x63); the vote is a codegen filter.
    * Medians and double-valued signals are rounded 4 dp on both engines
    * BEFORE comparison, so a boundary doc votes identically.
    *
    * Output: (doc_id, n_pass) for survivors (n_pass in {2, 3}). */
  def qualityEnsemble(docs: DataFrame): DataFrame = {
    val chars = filter(split(col("text"), ""), c => length(c) > 0)
    val log2 = (x: Column) => log(2.0, x)
    val sig = docs
      .select(col("doc_id"), col("text"), chars.as("_cs"))
      .select(col("doc_id"), col("text"), col("_cs"),
        array_distinct(col("_cs")).as("_dc"),
        size(col("_cs")).cast("double").as("_len"))
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("double").as("_ntok"),
        round(regexp_count(col("text"), lit("[\\.,;:!?]")).cast("double") /
          greatest(length(col("text")), lit(1)), 4).as("_punct"),
        round(log2(col("_len")) -
          aggregate(col("_dc"), lit(0.0d), (acc, c) => {
            val n = size(filter(col("_cs"), x => x === c)).cast("double")
            acc + n * log2(n)
          }) / col("_len"), 4).as("_ent"))
    val med = sig.agg(
      round(expr("percentile(_ntok, 0.5)"), 4).as("_m_ntok"),
      round(expr("percentile(_punct, 0.5)"), 4).as("_m_punct"),
      round(expr("percentile(_ent, 0.5)"), 4).as("_m_ent"))
    val nPass = when(col("_ntok") >= col("_m_ntok"), 1).otherwise(0) +
      when(col("_punct") <= col("_m_punct"), 1).otherwise(0) +
      when(col("_ent") >= col("_m_ent"), 1).otherwise(0)
    sig.crossJoin(broadcast(med))
      .select(col("doc_id"), nPass.as("n_pass"))
      .where(col("n_pass") >= 2)
  }

  def vocabOovRate(docs: DataFrame, idCol: String, textCol: String,
                   vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("_id"),
      explode(tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"))
    toks.join(broadcast(vocab.withColumn("_inv", lit(1))), Seq("tok"),
        "left_outer")
      .groupBy(col("_id").as(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("_inv").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .select(col(idCol), col("n_tokens"), col("n_oov"), col("oov_rate"))
  }

  /** Per-source KL divergence from the corpus unigram distribution —
    * KL(P_source ‖ Q_corpus) in nats, P add-½ smoothed over the corpus
    * vocabulary (so a token the source never emits costs nothing, but a
    * token it over/under-uses is priced exactly), Q the corpus MLE. The
    * source-fingerprint read: a crawler feed whose distribution drifts
    * from the corpus (template spam, wrong language, boilerplate) jumps
    * out as a KL outlier — completing the information-theoretic trio
    * (entropy x56, MI, KL).
    *
    * Scale shape: token counts aggregate at (source, token) grain (map-
    * side combined — the shuffle carries the vocabulary, never the
    * corpus); corpus marginals re-agg from that table; two broadcast
    * scalars (vocab size, total tokens). One scan of the documents. */
  def klFromCorpus(docs: DataFrame, sourceCol: String,
                   textCol: String): DataFrame = {
    val toks = docs.select(col(sourceCol).as("_src"),
      explode(tokens(lower(col(textCol)))).as("_tok"))
    val st = toks.groupBy(col("_src"), col("_tok"))
      .agg(count(lit(1)).as("_c"))
    val ct = st.groupBy(col("_tok")).agg(sum(col("_c")).as("_ct"))
    val ns = st.groupBy(col("_src")).agg(sum(col("_c")).as("_ns"))
    val scal = st.agg(countDistinct(col("_tok")).as("_vocab"),
      sum(col("_c")).cast("double").as("_n"))
    val p = (col("_c") + lit(0.5)) / (col("_ns") + lit(0.5) * col("_vocab"))
    st.join(broadcast(ns), Seq("_src"))
      .join(ct, Seq("_tok"))
      .crossJoin(broadcast(scal))
      .groupBy(col("_src").as("source"))
      .agg(count(lit(1)).cast("long").as("n_types"),
        round(sum(p * log(p / (col("_ct") / col("_n")))), 4).as("kl_nats"))
  }

  /** Mutual information between two categorical columns (nats), plus the
    * marginal entropies and min-normalized MI — the information-theoretic
    * sibling of [[chiSquareIndependence]] (chi-square tests IF dependent;
    * MI measures HOW MUCH knowing one tells you about the other, the
    * redundancy read before dropping a "duplicate" facet column).
    *
    * Scale shape: one (a, b) contingency agg (bounded by the category
    * product); marginals and the 1-row result re-agg from that bounded
    * table — the corpus is scanned once. Exact integer counts feed every
    * log, so the doubles are engine-portable at the 4 dp grain. */
  def mutualInformation(df: DataFrame, aCol: String,
                        bCol: String): DataFrame = {
    val o = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("_c"))
    val rt = o.groupBy(col(aCol)).agg(sum(col("_c")).as("_rc"))
    val ct = o.groupBy(col(bCol)).agg(sum(col("_c")).as("_cc"))
    val tot = o.agg(sum(col("_c")).cast("double").as("_n"))
    val mi = o.join(broadcast(rt), Seq(aCol))
      .join(broadcast(ct), Seq(bCol))
      .crossJoin(broadcast(tot))
      .agg(sum((col("_c") / col("_n")) *
        log(col("_c") * col("_n") / (col("_rc") * col("_cc").cast("double"))))
        .as("_mi"))
    val hx = rt.crossJoin(broadcast(tot))
      .agg((-sum((col("_rc") / col("_n")) * log(col("_rc") / col("_n"))))
        .as("_hx"))
    val hy = ct.crossJoin(broadcast(tot))
      .agg((-sum((col("_cc") / col("_n")) * log(col("_cc") / col("_n"))))
        .as("_hy"))
    mi.crossJoin(broadcast(hx)).crossJoin(broadcast(hy))
      .select(round(col("_mi"), 4).as("mi_nats"),
        round(col("_hx"), 4).as("h_a"),
        round(col("_hy"), 4).as("h_b"),
        round(col("_mi") / least(col("_hx"), col("_hy")), 4)
          .as("normalized_mi"))
  }

  /** Chi-square independence audit between two categorical columns — the
    * stratification check before trusting a per-facet sample ("is doc
    * length independent of language, or must splits stratify on both?").
    * Emits each row-category's contribution Σ (obs − exp)²/exp so the
    * drilldown names WHICH category drives the dependence; the global
    * statistic is the column's sum.
    *
    * Scale shape: one (row, col) contingency agg (map-side combined,
    * bounded by the category product), marginals re-agged from that
    * bounded table and broadcast back — the corpus is scanned once; the
    * only doubles are the per-cell expected counts (exact-integer
    * marginal products over an exact total), rounded 4 dp at the end. */
  /** Cramér's V — the EFFECT SIZE companion to
    * [[chiSquareIndependence]]: V = √(χ²/(n·min(r−1, c−1))) ∈ [0, 1],
    * comparable across tables of different size and shape, which raw χ²
    * never is (at corpus n, χ² trips "significant" on associations too
    * weak to act on; V is the guard). One scalar row with the full
    * context (n, r, c, χ², V).
    *
    * Scale shape: SPARSER than [[chiSquareIndependence]]'s dense grid —
    * the empty cells fold away analytically (each contributes exactly
    * its expectation e, and Σ_all e = n), so the statistic needs one
    * contingency agg, two broadcast marginal EQUI-joins and a scalar
    * fold over observed cells only. Degenerate 1×c / r×1 tables emit
    * NULL V, not a divide error. */
  def cramersV(df: DataFrame, rowCol: String, colCol: String): DataFrame =
    cramersVFromCounts(df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("_o")), rowCol, colCol)

  /** The Cramér's V fold over a pre-counted (row, col, _o) contingency
    * table — shared by the batch operator and the streaming monitor,
    * whose maintained additive cell-count state IS such a table. */
  private[graft] def cramersVFromCounts(cells: DataFrame, rowCol: String,
                                        colCol: String): DataFrame = {
    val obs = cells
      .localCheckpoint(eager = true) // marginals + scalar fold read it
    val rowTot = obs.groupBy(col(rowCol)).agg(sum(col("_o")).as("_rt"))
    val colTot = obs.groupBy(col(colCol)).agg(sum(col("_o")).as("_ct"))
    val tot = obs.agg(sum(col("_o")).cast("double").as("_n"))
    val e = col("_rt") * col("_ct") / col("_n")
    val dmin = least(col("_r") - 1L, col("_c") - 1L)
    // Empty cells contribute (0−e)²/e = e, and Σ_all e = n, so
    // χ² = Σ_obs[(o−e)²/e − e] + n over OBSERVED cells only — no dense
    // row×col grid, no marginal×marginal cross product.
    obs.join(broadcast(rowTot), Seq(rowCol))
      .join(broadcast(colTot), Seq(colCol))
      .crossJoin(broadcast(tot))
      .agg(max(col("_n")).cast("long").as("_nn"),
        countDistinct(col(rowCol)).cast("long").as("_r"),
        countDistinct(col(colCol)).cast("long").as("_c"),
        (sum((col("_o") - e) * (col("_o") - e) / e - e) + max(col("_n")))
          .as("_chi2"))
      .select(col("_nn").as("n"), col("_r").as("r"), col("_c").as("c"),
        round(col("_chi2"), 4).as("chi2"),
        when(dmin > 0L,
          round(sqrt(col("_chi2") / (col("_nn") * dmin)), 6)).as("v"))
  }

  def chiSquareIndependence(df: DataFrame, rowCol: String,
                            colCol: String): DataFrame = {
    val obs = df.groupBy(col(rowCol), col(colCol))
      .agg(count(lit(1)).as("_o"))
    val rowTot = obs.groupBy(col(rowCol)).agg(sum(col("_o")).as("_rt"))
    val colTot = obs.groupBy(col(colCol)).agg(sum(col("_o")).as("_ct"))
    val tot = obs.agg(sum(col("_o")).cast("double").as("_n"))
    // Densify: empty cells carry (0 − e)²/e too — the statistic is over
    // the FULL row×col grid, materialized from the bounded marginals
    // (category product, never the corpus).
    rowTot.crossJoin(broadcast(colTot))
      .join(obs, Seq(rowCol, colCol), "left_outer")
      .withColumn("_o", coalesce(col("_o"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("_e", col("_rt") * col("_ct") / col("_n"))
      .groupBy(col(rowCol))
      .agg(sum(col("_o")).cast("long").as("n_rows"),
        round(sum((col("_o") - col("_e")) * (col("_o") - col("_e")) /
          col("_e")), 4).as("chi2_contrib"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — the unsupervised
    * per-document tagger the TF-IDF family can't be: x67 scores single
    * TOKENS against the corpus, while RAKE scores multi-word PHRASES
    * from document-local statistics alone (no corpus pass, no IDF
    * table). Candidate phrases are the maximal runs of consecutive
    * non-stopword tokens; each word scores deg/freq where freq counts
    * its occurrences in candidates and deg additionally credits the
    * length of every phrase it sits in (so words that keep company in
    * long collocations outrank frequent loners); a phrase scores the
    * sum of its words' scores, and the top `topK` per document survive.
    * Word scores round 6 dp BEFORE the phrase sum and the sum rounds
    * again — the two-stage convention that keeps cross-engine
    * summation-order noise (≈1e-13) five orders below the grid.
    *
    * Scale shape: everything is document-local — the run-id window
    * partitions by doc (bounded by doc length, never global), word
    * stats and phrase sums aggregate at (doc, word) / (doc, run) grain,
    * and the only joins are equi-joins back on those same grains, so
    * cost is Σ_docs |tokens| with no corpus-wide table anywhere.
    * Identical phrase strings from DIFFERENT runs in one doc collapse
    * to one output row (max score — duplicate runs tie anyway); the
    * rank tie-breaks on the phrase string. */
  def rakeKeyphrases(docs: DataFrame, idCol: String, textCol: String,
                     stopwords: Seq[String], topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("_p", "_w")))
      .withColumn("_st", col("_w").isInCollection(stopwords).cast("int"))
    val wRun = Window.partitionBy(col(idCol)).orderBy(col("_p"))
    val pw = toks.withColumn("_run", sum(col("_st")).over(wRun))
      .where(col("_st") === 0)
      .select(col(idCol), col("_run"), col("_p"), col("_w"))
    val phr = pw.groupBy(col(idCol), col("_run"))
      .agg(array_sort(collect_list(struct(col("_p"), col("_w")))).as("_sw"))
      .select(col(idCol), col("_run"),
        concat_ws(" ", transform(col("_sw"), s => s.getField("_w")))
          .as("phrase"),
        size(col("_sw")).cast("long").as("_plen"))
    val wscore = pw
      .join(phr.select(col(idCol), col("_run"), col("_plen")),
        Seq(idCol, "_run"))
      .groupBy(col(idCol), col("_w"))
      .agg(round(sum(col("_plen")).cast("double") / count(lit(1)), 6)
        .as("_ws"))
    val pscore = pw.join(phr, Seq(idCol, "_run"))
      .join(wscore, Seq(idCol, "_w"))
      .groupBy(col(idCol), col("_run"))
      .agg(first(col("phrase")).as("phrase"),
        round(sum(col("_ws")), 6).as("score"))
      .groupBy(col(idCol), col("phrase"))
      .agg(max(col("score")).as("score"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("phrase"))
    pscore.withColumn("rnk", row_number().over(w))
      .where(col("rnk") <= topK)
      .select(col(idCol), col("rnk"), col("phrase"), col("score"))
  }
}
