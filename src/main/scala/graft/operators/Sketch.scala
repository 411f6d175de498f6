package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{BottomKSketch, CountMinSketch}

/** Sketch-based approximate aggregates (north-star extension).
  *
  * Unlike Spark's built-in `approx_count_distinct` (HLL++, whose register
  * layout no oracle engine reproduces), the KMV bottom-k sketch is exact
  * arithmetic over the engine-portable md5 hash family: the k smallest
  * distinct hashes — and therefore the estimate — are IDENTICAL in any
  * engine that hashes the same way, so the sketch is hash-checkable
  * against DuckDB like every other operator here. */
object Sketch {

  /** Per-group approximate distinct count via the mergeable
    * [[BottomKSketch]] (KMV estimator, `(k-1)·2^32 / kth_min`; exact when
    * a group has fewer than k distinct values).
    *
    * Scale shape: ONE partial-aggregated shuffle carrying k-long sketches
    * per (partition, group) — never the distinct value set. Contrast with
    * exact distinct-count, whose first shuffle carries every distinct
    * (group, value) pair; at 100 TB that difference is the operator. */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame = {
    val h: Column = Dedup.shingleHash(
      concat(lit("kmv:"), col(valueCol).cast("string")))
    val estNum = (k - 1).toLong * 4294967296L // (k-1) · 2^32, exact in i64
    df.select(groupCols.map(col) :+ h.as("_h"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(BottomKSketch.bottomK(k)(col("_h")).as("_sk"))
      .select(groupCols.map(col) ++ Seq(
        size(col("_sk")).cast("bigint").as("n_kept"),
        element_at(col("_sk"), size(col("_sk"))).as("kth_min")): _*)
      .withColumn("n_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${estNum}L div kth_min")))
  }

  /** Per-group approximate distinct count via HyperLogLog — the
    * fully-RELATIONAL formulation: registers are just a second grouping
    * level, so the whole sketch is two map-side-combined hash aggregates
    * and Catalyst sees every step.
    *
    *   1. hash each value into the md5 family's 32-bit range; bucket =
    *      top `p` bits, rank = leading zeros of the remaining `32-p` bits
    *      + 1 (computed EXACTLY via `length(bin(w))` — no float log, so
    *      the registers are engine-portable integers);
    *   2. `groupBy(keys, bucket).agg(max(rank))` → the register table at
    *      (group × ≤2^p) grain;
    *   3. `groupBy(keys)` folds registers into the estimate. The 2^-M
    *      terms are exact powers of two spanning < 53 bits, so their sum
    *      is EXACT in a double and the estimate is deterministic.
    *
    * Below 2.5·m the raw estimator biases high and linear counting over
    * the unhit-register count takes over (the standard correction;
    * Flajolet et al. 2007). `ln` is the one transcendental in that branch,
    * so the estimate is rounded to 2 dp for cross-engine stability.
    *
    * Scale shape vs [[kmvDistinct]]: KMV's shuffle carries k-long arrays
    * per (partition, group); HLL's carries one (group, bucket, max-rank)
    * row per TOUCHED register — at most 2^p integers per group, partial-
    * aggregated map-side. Both never move the distinct value set; HLL adds
    * the property that the register table itself is a queryable DataFrame
    * (mergeable across corpora by a further `max`).
    *
    * Output per group: `v_buckets` (registers hit), `max_rank`,
    * `n_est` (corrected estimate, 2 dp). */
  /** KMV sketch SET ALGEBRA — union and intersection cardinality
    * estimates for every group pair WITHOUT rescanning the data: a
    * bottom-k sketch of A ∪ B is exactly the bottom-k of the two
    * sketches' hash union (bottom-k is closed under union), and the
    * Jaccard estimate is the share of the union sketch present in BOTH
    * sides (the classic KMV coincidence estimator), so
    * intersect ≈ J · union. This is the audit that answers "how much do
    * these two sources overlap" from two already-persisted sketches.
    *
    * Scale shape: after [[kmvDistinct]]-style sketching (one map-side-
    * combined agg), everything is ARRAY-LOCAL on a |groups|²-row pair
    * frame of k-long arrays — the merge is array_sort(union) sliced to
    * k, membership is array_contains; no re-shuffle of the corpus, no
    * exact-distinct pass. Estimates are exact-integer arithmetic over
    * the md5 hash family, so the oracle hash-matches. */
  def kmvSetOps(df: DataFrame, groupCol: String, valueCol: String,
                k: Int): DataFrame = {
    val h: Column = Dedup.shingleHash(
      concat(lit("kmv:"), col(valueCol).cast("string")))
    val estNum = (k - 1).toLong * 4294967296L
    val sk = df.select(col(groupCol), h.as("_h"))
      .groupBy(col(groupCol))
      .agg(BottomKSketch.bottomK(k)(col("_h")).as("_sk"))
    val pairs = sk.select(col(groupCol).as("type_a"), col("_sk").as("_ska"))
      .join(broadcast(sk.select(col(groupCol).as("type_b"),
        col("_sk").as("_skb"))), col("type_a") < col("type_b"))
    val merged = slice(array_sort(array_union(col("_ska"), col("_skb"))),
      1, k)
    pairs
      .withColumn("_m", merged)
      .withColumn("n_kept", size(col("_m")).cast("bigint"))
      .withColumn("_kth", element_at(col("_m"), size(col("_m"))))
      .withColumn("union_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${estNum}L div _kth")))
      .withColumn("n_both", size(filter(col("_m"),
        x => array_contains(col("_ska"), x) &&
          array_contains(col("_skb"), x))).cast("bigint"))
      .withColumn("intersect_est",
        round(col("n_both").cast("double") / col("n_kept") *
          col("union_est"), 0).cast("long"))
      .select(col("type_a"), col("type_b"), col("n_kept"), col("union_est"),
        col("n_both"), col("intersect_est"))
  }

  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int = 8): DataFrame =
    hllEstimate(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** The HLL register TABLE at (group × touched-bucket) grain —
    * `(groupCols..., _bucket, _m)` with `_m` the max observed rank. This
    * is the sketch's persistable, MERGEABLE form: `max` is associative
    * and idempotent, so register tables from any corpus split combine via
    * [[hllMergeRegisters]] into exactly the one-shot table — the property
    * the incremental-maintenance path rides. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val rem = 1L << (32 - p)        // size of the rank-bearing remainder
    val maxRank = 32 - p + 1        // rank when the remainder is all zeros
    val h = Dedup.shingleHash(concat(lit("hll:"), col(valueCol).cast("string")))
    val kcols = groupCols.map(col)
    val wrem = col("_h") % rem
    df.select(kcols :+ h.as("_h"): _*)
      .withColumn("_bucket", shiftright(col("_h"), 32 - p))
      .withColumn("_rank",
        when(wrem === 0, lit(maxRank))
          .otherwise(lit(maxRank) - length(bin(wrem))))
      .groupBy(kcols :+ col("_bucket"): _*)
      .agg(max(col("_rank")).as("_m"))
  }

  /** Merge two register tables (same grouping + `p`): union + max per
    * (group, bucket). The scale point of sketch maintenance: a new batch
    * merges at REGISTER grain (≤ 2^p rows per group), never re-reading
    * the corpus the existing table summarizes. */
  def hllMergeRegisters(a: DataFrame, b: DataFrame,
                        groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("_bucket"): _*)
      .agg(max(col("_m")).as("_m"))

  /** Fold a register table into per-group estimates (see [[hllDistinct]]
    * for the arithmetic-portability argument). */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String],
                  p: Int): DataFrame = {
    val m = 1 << p
    val alphaM2 = (0.7213 / (1 + 1.079 / m)) * m.toDouble * m.toDouble
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).cast("bigint").as("v_buckets"),
        max(col("_m")).cast("bigint").as("max_rank"),
        sum(pow(lit(2.0), -col("_m"))).as("_s"))
      .withColumn("_raw",
        lit(alphaM2) / ((lit(m.toLong) - col("v_buckets")) + col("_s")))
      .withColumn("n_est",
        round(when(col("_raw") <= 2.5 * m && col("v_buckets") < m,
            lit(m.toDouble) * log(lit(m.toDouble) / (lit(m.toLong) - col("v_buckets"))))
          .otherwise(col("_raw")), 2))
      .drop("_s", "_raw")
  }

  /** The depth seeded hash positions of a value for the CMS matrix —
    * md5-family arithmetic, identical wherever it is evaluated. */
  def cmsPositions(value: Column, depth: Int, width: Int): Seq[Column] =
    (0 until depth).map { i =>
      pmod(Dedup.shingleHash(concat(lit(s"cms$i:"), value)), lit(width.toLong))
        .cast("int")
    }

  /** EXACT heavy hitters through a count-min pre-filter — the two-pass
    * frequent-items shape for domains whose distinct cardinality dwarfs
    * the heavy set (corpus n-grams: billions distinct, thousands heavy).
    *
    * Pass 1 folds the whole value stream into ONE depth×width CMS
    * (map-side combined; the shuffle carries 512 KiB matrices per
    * partition, never values) collected as bounded driver metadata.
    * Pass 2 re-scans, keeps only rows whose CMS estimate ≥ threshold —
    * an ARRAY-LOCAL test against the literal matrix, no join — and
    * exact-counts the survivors. CMS never underestimates, so every
    * occurrence of every truly-heavy value survives the filter: the
    * final HAVING makes the result EXACT (false positives are counted
    * and cut, never missed).
    *
    * Contrast with the naive `groupBy(value).count()`: its shuffle
    * carries one row per (partition, DISTINCT value) — the full vocab.
    * Here the exact aggregate only ever sees candidate rows.
    *
    * Output: (valueCol, n BIGINT) with n ≥ threshold, exact. */
  def cmsHeavyHitters(df: DataFrame, valueCol: String, threshold: Long,
                      depth: Int = 4, width: Int = 16384): DataFrame = {
    val posArr = array(cmsPositions(col(valueCol), depth, width): _*)
    // Bounded driver metadata: depth*width longs (the sketch), not data.
    val sk: Array[Long] = df.select(posArr.as("_pos"))
      .agg(CountMinSketch.cms(depth, width)(col("_pos")).as("_sk"))
      .collect()(0).getSeq[Long](0).toArray
    val skLit = typedLit(sk.toSeq)
    val est = cmsPositions(col(valueCol), depth, width).zipWithIndex.map {
      case (p, i) => element_at(skLit, p + lit(i * width) + 1)
    }.reduce(least(_, _))
    df.filter(est >= threshold)
      .groupBy(col(valueCol))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= threshold)
  }
}
