package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / split assignment for the training-data pipeline
  * (north-star extension).
  *
  * Both operators are pure per-row projections on a content-independent
  * hash of the row's id — no shuffle, no RNG state, no driver coordination:
  *
  *  - the SAME row gets the SAME assignment on every run, every engine,
  *    every partitioning (unlike `df.sample`/`rand()`, which are seed- and
  *    partitioning-dependent and not reproducible across engines);
  *  - adding rows never reassigns existing ones (hash-stability) — the
  *    property that keeps train/test membership frozen as a 100-TB corpus
  *    grows;
  *  - salts namespace the hash, so a sampling decision is independent of
  *    the split decision on the same key.
  *
  * Hash: first 8 hex chars of md5(salt:id) as an integer, uniform on
  * [0, 2^32) — the engine-portable idiom shared with [[Dedup.shingleHash]].
  */
object Sampling {

  /** Uniform [0, buckets) bucket of `salt:id` — md5-based, engine-portable. */
  def hashBucket(idCol: Column, salt: String, buckets: Int): Column =
    Dedup.shingleHash(concat(lit(salt + ":"), idCol.cast("string"))) % buckets

  /** Deterministic train/val/test assignment by hash percentile:
    * bucket < trainPct → train; < trainPct+valPct → val; else test. */
  def split(df: DataFrame, idCol: String, salt: String,
            trainPct: Int, valPct: Int): DataFrame = {
    val b = hashBucket(col(idCol), salt, 100)
    df.withColumn("bucket", b)
      .withColumn("split",
        when(col("bucket") < trainPct, "train")
          .when(col("bucket") < trainPct + valPct, "val")
          .otherwise("test"))
  }

  /** Deterministic pct% sample: keep rows whose hash bucket falls below
    * `pct` of 100. */
  def sample(df: DataFrame, idCol: String, salt: String, pct: Int): DataFrame =
    df.filter(hashBucket(col(idCol), salt, 100) < pct)

  /** Stratified deterministic sample — per-group keep percentages, the
    * mixture-shaping sampler (downsample the dominant web crawl, keep all
    * of the rare high-quality source). Same reproducibility contract as
    * [[sample]]; the group's percentage comes from a LITERAL map baked
    * into the projection (groups absent from `fractions` fall back to
    * `defaultPct`), so the whole operator is one codegen'd filter — no
    * join, no shuffle, nothing broadcast. */
  def stratifiedSample(df: DataFrame, groupCol: String, idCol: String,
                       salt: String, fractions: Map[String, Int],
                       defaultPct: Int): DataFrame = {
    require(fractions.nonEmpty, "need at least one group fraction")
    val pctMap = map(fractions.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    df.filter(hashBucket(col(idCol), salt, 100) <
      coalesce(element_at(pctMap, col(groupCol).cast("string")),
        lit(defaultPct)))
  }

  /** Stratified cap: keep at most `k` rows per group, selected by
    * deterministic hash order (then id as tie-break) — the corpus
    * rebalancing step that stops one source/language from dominating a
    * training mix, reproducible across runs and partitionings like
    * [[sample]].
    *
    * Scale shape: ONE shuffle on the group key + a windowed row_number
    * within each group partition — no global window, no driver state. A
    * pathologically hot group concentrates in one task; cap semantics
    * require seeing the group together, and the per-row state is one
    * counter, so the task is scan-bound, not memory-bound. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
                  salt: String, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy(Dedup.shingleHash(
        concat(lit(salt + ":"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic global shuffle + shard layout — the training-export
    * primitive that turns a corpus into N reproducibly-randomized shards:
    * `shard = hash(salt:id) mod n`, `pos` = the row's 0-based position
    * within its shard in (hash, id) order. Reading shards 0..n-1 in pos
    * order replays the SAME pseudo-random document order on every run and
    * engine — what `orderBy(rand())` cannot promise — and appending new
    * rows never moves existing ones between shards (hash stability, the
    * [[split]] contract).
    *
    * Scale shape: ONE shuffle on the shard key + a per-shard row_number —
    * no global sort, no total ordering across shards (the trainer
    * interleaves shards, so cross-shard order is free). Parallelism equals
    * `nShards`; at corpus scale shards number in the thousands, so every
    * executor stays busy and a shard's rows stream through one task's
    * sort — scan-bound, not memory-bound (Spark windows spill). */
  def shardLayout(df: DataFrame, idCol: String, salt: String,
                  nShards: Int): DataFrame = {
    require(nShards > 0, "need at least one shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(col("_h").asc, col(idCol).asc)
    df.withColumn("_h", Dedup.shingleHash(
        concat(lit(salt + ":"), col(idCol).cast("string"))))
      .withColumn("shard", (col("_h") % nShards).cast("int"))
      .withColumn("pos", row_number().over(w).cast("bigint") - 1)
      .drop("_h")
  }

  /** Shard-rebalance audit: when a layout grows from `oldShards` to
    * `newShards`, what fraction of keys MOVE — under the naive modulo
    * assignment x30 uses (cheap, but growth remaps nearly everything:
    * a key stays only when hv mod old == hv mod new) versus rendezvous /
    * highest-random-weight hashing (Thaler & Ravishankar 1998: shard =
    * argmax_s h(key, s); adding shards only steals the keys the NEW
    * shards win, ≈ (new−old)/new). The operator quantifies exactly what
    * a resharding of a 100 TB corpus will recopy — the number that
    * decides between "mod + full rewrite" and "HRW + incremental".
    *
    * Both hashes ride [[Dedup.shingleHash]]'s md5 contract (engine-
    * portable); HRW's argmax takes the FIRST maximum (lowest shard id),
    * matching the oracle's `ORDER BY h DESC, s` tie-break. One narrow
    * projection (old+new assignments under both schemes), one scalar
    * agg, exploded to a 2-row strategy table — no shuffle beyond the
    * final fold. */
  def rebalanceAudit(df: DataFrame, idCol: String, salt: String,
                     oldShards: Int, newShards: Int): DataFrame = {
    require(oldShards > 0 && newShards > 0, "shard counts must be positive")
    val hv = Dedup.shingleHash(concat(lit(salt + ":"), col(idCol).cast("string")))
    def hrw(n: Int) = {
      val hs = array((0 until n).map(s =>
        Dedup.shingleHash(concat(col(idCol).cast("string"), lit("#" + s)))): _*)
      (array_position(hs, array_max(hs)) - 1).cast("int")
    }
    df.select(
        (hv % oldShards).cast("int").as("_mo"),
        (hv % newShards).cast("int").as("_mn"),
        hrw(oldShards).as("_ho"), hrw(newShards).as("_hn"))
      .agg(count(lit(1)).cast("long").as("_n"),
        sum(when(col("_mo") =!= col("_mn"), 1L).otherwise(0L)).cast("long")
          .as("_mm"),
        sum(when(col("_ho") =!= col("_hn"), 1L).otherwise(0L)).cast("long")
          .as("_hm"))
      .select(explode(array(
        struct(lit("mod").as("strategy"), col("_n").as("n_keys"),
          col("_mm").as("n_moved"),
          round(col("_mm").cast("double") / col("_n"), 4).as("move_frac")),
        struct(lit("rendezvous").as("strategy"), col("_n").as("n_keys"),
          col("_hm").as("n_moved"),
          round(col("_hm").cast("double") / col("_n"), 4).as("move_frac"))))
        .as("_r"))
      .select(col("_r.strategy").as("strategy"), col("_r.n_keys").as("n_keys"),
        col("_r.n_moved").as("n_moved"), col("_r.move_frac").as("move_frac"))
  }

  /** Deterministic sequence packing — assign documents to fixed
    * token-budget training sequences: within each shard (the partition
    * key, e.g. language or a hash shard), documents are ordered by
    * (salted hash, id) and packed greedily by EXCLUSIVE prefix token sum,
    * `seq_id = prefix_tokens div budget`. A document whose tokens straddle
    * the boundary belongs to the sequence its first token lands in
    * (truncation/continuation is the trainer's concern).
    *
    * Scale shape: ONE shuffle on the shard key + a running-sum window per
    * shard — no global sort or window, no driver state; the deterministic
    * hash order makes packing reproducible across runs and partitionings
    * (same property as [[split]]). Output adds (n_tokens, seq_id,
    * seq_offset). */
  def packSequences(df: DataFrame, shardCols: Seq[String], idCol: String,
                    tokensCol: String, salt: String, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCols.map(col): _*)
      .orderBy(Dedup.shingleHash(
        concat(lit(salt + ":"), col(idCol).cast("string"))).asc,
        col(idCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("_prefix", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      .withColumn("seq_id", expr(s"_prefix div $budget"))
      .withColumn("seq_offset", expr(s"_prefix % $budget"))
      .drop("_prefix")
  }

  /** Deterministic WEIGHTED sample without replacement, k per group — the
    * Efraimidis–Spirakis exponential-key scheme (quality- or length-
    * weighted corpus sampling): key_i = u_i^(1/w_i) with u_i the doc's
    * salted md5 uniform in (0,1); the top-k keys per group are a weighted
    * sample without replacement, exactly and in one pass. Same
    * reproducibility contract as [[sample]] (pure hash arithmetic — no
    * RNG state, stable under growth/partitioning), one shuffle for the
    * per-group top-k window. Weights are clamped to >= 1 so zero-weight
    * rows neither divide by zero nor dominate.
    *
    * Output: (groupCol, idCol, weightCol, smp_rank) for ranks 1..k. */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weightCol: String, salt: String, k: Int): DataFrame = {
    val h = Dedup.shingleHash(concat(lit(salt + ":"), col(idCol).cast("string")))
    val u = (h.cast("double") + 0.5) / 4294967296.0
    // The key is rounded to 12 dp BEFORE ranking (repo convention: round
    // doubles before comparing): Spark's Math.pow and another engine's libm
    // pow may diverge by 1 ulp, which could flip the selection at the
    // rank-k boundary; at 12 dp both engines rank the identical key, and
    // the idCol tie-break resolves rounded-equal keys deterministically.
    val key = round(
      pow(u, lit(1.0) / greatest(col(weightCol).cast("double"), lit(1.0))), 12)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_k").desc, col(idCol))
    df.withColumn("_k", key)
      .withColumn("smp_rank", row_number().over(w))
      .filter(col("smp_rank") <= k)
      .select(col(groupCol), col(idCol), col(weightCol), col("smp_rank"))
  }

  /** Curriculum ordering: assign every doc a difficulty TILE (quartiles of
    * `diffCol` — e.g. length as the classic proxy) plus a deterministic
    * intra-tile shuffle key; sorting by (tile, shuffle_key, id) IS the
    * training epoch order — easy tiles first, random within a tile.
    *
    * Scale shape: tile boundaries are one exact-percentile aggregate
    * (map-side combined, 1-row broadcast back), the tile assignment and
    * shuffle key are a pure codegen projection — NO window, NO ntile
    * (a global ntile is an Exchange SinglePartition; per-tile row_number
    * shuffles the corpus into `tiles` partitions — both banned shapes).
    * The writer sorts by the emitted keys instead, which at 100 TB is a
    * sortWithinPartitions after a range partition, never a global window.
    *
    * Boundaries are rounded to 4 dp on both engines before the
    * comparison (repo convention) so an interpolation-ulp divergence
    * cannot flip a boundary doc's tile. */
  def curriculumOrder(df: DataFrame, idCol: String, diffCol: String,
                      salt: String): DataFrame = {
    val qs = df.agg(
      round(expr(s"percentile($diffCol, 0.25)"), 4).as("_q1"),
      round(expr(s"percentile($diffCol, 0.50)"), 4).as("_q2"),
      round(expr(s"percentile($diffCol, 0.75)"), 4).as("_q3"))
    val d = col(diffCol).cast("double")
    df.crossJoin(broadcast(qs))
      .select(col(idCol), col(diffCol),
        (lit(1L) + when(d > col("_q1"), 1L).otherwise(0L)
          + when(d > col("_q2"), 1L).otherwise(0L)
          + when(d > col("_q3"), 1L).otherwise(0L)).as("tile"),
        hashBucket(col(idCol), salt, 1000000).as("shuffle_key"))
  }

  /** Domain REWEIGHTING (the DoReMi / data-mixture shape): resample so the
    * surviving corpus's domain shares track `targetShares`, with the rates
    * COMPUTED from the measured distribution rather than hand-set (the
    * difference from [[stratifiedSample]]). Per-domain keep rate =
    * (target share / actual share), normalized so the largest is 1.0 —
    * downsample-only, no row duplication; domains absent from the target
    * map get rate 0 (dropped). Selection is the repo's deterministic
    * id-hash uniform, so the sample is reproducible across engines, runs
    * and partitionings.
    *
    * Scale shape: actual shares are ONE map-side-combined count aggregate
    * at domain grain; the two scalar reductions (total, max ratio) ride
    * the audited `crossJoin(broadcast(scalar-agg))` frames; the rate table
    * (domain-grain, tiny) broadcasts back onto the corpus for a codegen'd
    * filter — the corpus itself is never shuffled. Rates are rounded to
    * 6 dp before the compare (repo convention) so both engines threshold
    * identical values; the hash side of the compare is an exact integer
    * bucket in [0, 10000). */
  def domainReweight(df: DataFrame, idCol: String, domainCol: String,
                     targetShares: Map[String, Double],
                     salt: String): DataFrame = {
    require(targetShares.nonEmpty, "need at least one target share")
    val tgtMap = map(targetShares.toSeq.flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val shares = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("_cnt"))
      .withColumn("_tgt", coalesce(element_at(tgtMap, col(domainCol)), lit(0.0)))
    val total = shares.agg(sum(col("_cnt")).as("_tot"))
    val ratios = shares.crossJoin(broadcast(total))
      .withColumn("_ratio", col("_tgt") * col("_tot") / col("_cnt"))
    val maxRatio = ratios.agg(max(col("_ratio")).as("_maxr"))
    val rates = ratios.crossJoin(broadcast(maxRatio))
      .withColumn("keep_rate", round(col("_ratio") / col("_maxr"), 6))
      .select(col(domainCol), col("keep_rate"))
    df.join(broadcast(rates), Seq(domainCol))
      .filter(hashBucket(col(idCol), salt, 10000).cast("double") / 10000.0 <
        col("keep_rate"))
      .select(col(idCol), col(domainCol), col("keep_rate"))
  }

  /** Split-leakage audit — the contamination check a train/test split
    * needs before anyone trusts the eval: given a near-dup PAIR frame
    * (any of the dedup family's outputs) and a per-id split assignment
    * ([[split]]'s output or any (id, split) frame), return every pair
    * whose members landed in DIFFERENT splits. A near-dup of a test doc
    * sitting in train is memorization leakage (the audit GPT-3/Lee et
    * al. run post-hoc); the fix is re-assigning by CLUSTER instead of by
    * id, and this audit is the detector that says when that's needed.
    *
    * Scale shape: two equi-joins of the output-scale pair frame against
    * the id-grain assignment — the pair side is orders of magnitude
    * smaller (it's the duplication found), so AQE broadcasts it and the
    * assignment never shuffles; nothing here touches text or vectors.
    * Pass-through columns of `pairs` (similarity scores) survive. */
  def crossSplitPairs(pairs: DataFrame, idACol: String, idBCol: String,
                      assign: DataFrame, idCol: String,
                      splitCol: String): DataFrame = {
    val a = assign.select(col(idCol).as(idACol), col(splitCol).as("split_a"))
    val b = assign.select(col(idCol).as(idBCol), col(splitCol).as("split_b"))
    pairs.join(a, Seq(idACol)).join(b, Seq(idBCol))
      .filter(col("split_a") =!= col("split_b"))
  }

  /** Water-filling per-source token budget: given a target of
    * `budgetFrac` of the corpus's tokens, find the unique cap `c` with
    * Σ min(tokens_s, c) = budget and allocate min(tokens_s, ⌊c⌋) to each
    * source — small sources keep everything, the largest are leveled to
    * the same ceiling (the fair-allocation dual of [[domainReweight]]:
    * reweighting tracks target SHARES, water-filling enforces a total
    * BUDGET with maximal flatness).
    *
    * Scale shape: the corpus reduces to ONE map-side-combined sum at
    * source grain; the cap is closed-form over that bounded table
    * (sorted source totals, first prefix where prefix + rest·t ≥ budget),
    * computed driver-side as bounded metadata — |sources| longs, the j22
    * quantile-edge discipline — and inlined as a literal in the final
    * projection. Exact integer arithmetic end to end (one double division
    * floored), so both engines agree without tolerance. */

  def tokenBudget(rows: DataFrame, groupCol: String, ntokCol: String,
                  budgetFrac: Double): DataFrame = {
    val counts = rows.groupBy(col(groupCol))
      .agg(sum(col(ntokCol)).cast("long").as("tokens"))
    val toks = counts.select(col("tokens")).collect().map(_.getLong(0)).sorted
    val budget = math.floor(budgetFrac * toks.sum.toDouble).toLong
    var prefix = 0L
    var cap = Long.MaxValue
    var i = 0
    var found = false
    while (i < toks.length && !found) {
      val rest = toks.length - i
      if (prefix + rest * toks(i) >= budget) {
        cap = math.floor((budget - prefix).toDouble / rest).toLong
        found = true
      }
      prefix += toks(i)
      i += 1
    }
    counts.select(col(groupCol), col("tokens"),
      least(col("tokens"), lit(cap)).as("allocated"),
      (col("tokens") > lit(cap)).as("capped"))
  }

  /** Deterministic half-sample replication CI for a group mean (the
    * McCarthy 1969 / survey-bootstrap estimator, hash-seeded): replicate
    * r keeps the rows whose id-hash hex digit r has its high bit set —
    * an engine-portable stand-in for random resampling, so the SAME rows
    * form the SAME replicates everywhere (the split/sample discipline) —
    * and the spread of the replicate means around the full mean IS the
    * standard error. The uncertainty read the plain per-group mean
    * (x99 and friends) can't give: a source whose CI straddles another's
    * isn't actually "longer-form" no matter what the point estimates say.
    *
    * Scale shape: ONE hash aggregation — the 2·R replicate sums are
    * conditional aggregates folded in the same pass as n and Σx (no
    * explode, no R× row multiplication, no second scan). Everything
    * downstream is arithmetic on the group row. Replicate means divide
    * exact integer sums, so the only cross-engine doubles are the final
    * R-term fold. An empty replicate (tiny groups) yields NULL se/CI
    * rather than a divide error. */
  def halfSampleCi(df: DataFrame, groupCol: String, idCol: String,
                   valueCol: String, reps: Int = 16): DataFrame = {
    require(reps >= 2 && reps <= 32, "md5 hex has 32 digits")
    val h = md5(col(idCol).cast("string"))
    def s(r: Int) = s"_s$r"
    def c(r: Int) = s"_c$r"
    val repAggs = (1 to reps).flatMap { r =>
      val in = substring(h, r, 1) >= "8"
      Seq(sum(when(in, col(valueCol)).otherwise(lit(0L))).cast("long")
          .as(s(r)),
        sum(when(in, 1L).otherwise(0L)).cast("long").as(c(r)))
    }
    val allAggs = Seq(count(lit(1)).cast("long").as("_n"),
      sum(col(valueCol)).cast("long").as("_sx")) ++ repAggs
    val a = df.groupBy(col(groupCol)).agg(allAggs.head, allAggs.tail: _*)
    val mean = col("_sx").cast("double") / col("_n")
    val dev = (1 to reps).map { r =>
      val mr = col(s(r)).cast("double") / col(c(r))
      (mr - mean) * (mr - mean)
    }.reduce(_ + _)
    val minC = (1 to reps).map(r => col(c(r))).reduce(least(_, _))
    val se = sqrt(dev / lit(reps.toDouble))
    a.select(col(groupCol), col("_n").as("n"),
      round(mean, 4).as("mean_val"),
      when(minC > 0L, round(se, 4)).as("se_rep"),
      when(minC > 0L, round(mean - lit(1.96) * se, 4)).as("ci_lo"),
      when(minC > 0L, round(mean + lit(1.96) * se, 4)).as("ci_hi"))
  }
}
