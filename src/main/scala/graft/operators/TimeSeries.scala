package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Series diagnostics over pre-aggregated per-key time series — the
  * monitoring layer a corpus/ingest pipeline runs on its own daily volume
  * curves (the reference's dashboard plots exactly these per-channel
  * message-count series, MainController.php:593-706; these operators are
  * the statistical reads on top of that grain).
  *
  * All operators here share one scale shape: the input is already at
  * (key, bucket) grain — tiny relative to the raw events — so every
  * window partitions by the series key and every aggregate collapses to
  * key grain. One Exchange on the key serves lag windows, weight folds,
  * and the final per-key statistics; nothing here ever re-shuffles the
  * raw event table.
  */
object TimeSeries {

  /** Lag-k autocorrelation of a per-key series, k = 1..maxLag: Pearson
    * `corr(x_t, x_{t-k})` per key (sample correlation — pairs where the
    * lag falls off the series start are dropped by corr's null handling,
    * matching the textbook ACF-on-overlap estimator).
    *
    * Scale shape: one Exchange on the key; all lag columns ride the same
    * per-key sort, and the corr aggregates reuse that partitioning
    * exchange-free.
    */
  def autocorrelation(series: DataFrame, keys: Seq[String], orderCol: String,
                      valueCol: String, maxLag: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val lagged = (1 to maxLag).foldLeft(series) { (df, k) =>
      df.withColumn(s"_lag$k", lag(col(valueCol), k).over(w))
    }
    val aggs = (1 to maxLag).map(k =>
      round(corr(col(valueCol), col(s"_lag$k")), 4).as(s"acf$k"))
    lagged.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Truncated exponentially-weighted moving average: per (key, bucket),
    * `sum(alpha·(1-alpha)^age · x) / sum(alpha·(1-alpha)^age)` over the
    * trailing `span` buckets — the renormalized finite-window EWMA (the
    * denominator re-scales the truncated weight mass, so early points
    * aren't biased low).
    *
    * Expressed as one collect-free window fold: `collect_list` over a
    * bounded `span`-row frame, then an `aggregate` HOF over that fixed-
    * size array — O(span) work per row, no self-join (the join
    * formulation would re-shuffle the series once per frame bound).
    */
  def ewma(series: DataFrame, keys: Seq[String], orderCol: String,
           valueCol: String, alpha: Double, span: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-(span - 1), Window.currentRow)
    // Frame array arrives oldest-first; age of element i (0-based) in an
    // n-long frame is n-1-i.
    val frame = collect_list(col(valueCol).cast("double")).over(w)
    def fold(arr: Column, f: (Column, Column) => Column): Column =
      aggregate(
        zip_with(arr, sequence(lit(0), size(arr) - 1),
          (v, i) => struct(v.as("v"), (size(arr) - 1 - i).as("age"))),
        lit(0.0), (acc, e) => acc + f(e.getField("v"),
          pow(lit(1.0 - alpha), e.getField("age").cast("double"))))
    series
      .withColumn("_frame", frame)
      .withColumn("ewma",
        round(fold(col("_frame"), (v, wt) => v * wt * alpha) /
          fold(col("_frame"), (_, wt) => wt * alpha), 4))
      .drop("_frame")
  }

  /** Additive seasonal decomposition (STL-lite): per (key, bucket),
    * trend = centered `period`-bucket moving average (null while the
    * frame is short — no half-window bias), seasonal = the key's mean
    * detrended value at each bucket-phase (day-of-week for daily data),
    * residual = value − trend − seasonal. The ingest-curve explainer:
    * a residual spike is real anomaly, not weekly rhythm.
    *
    * One Exchange on the key serves the centered frame; the seasonal
    * means are a (key, phase) hash agg broadcast back (|keys|·period
    * rows). Trend/seasonal/residual round 4 dp (engine-portable).
    */
  def seasonalDecompose(series: DataFrame, keys: Seq[String],
                        orderCol: String, valueCol: String,
                        period: Int): DataFrame = {
    val half = period / 2
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-half, half)
    val trended = series.withColumn("trend",
      when(count(lit(1)).over(w) === period,
        round(avg(col(valueCol).cast("double")).over(w), 4)))
      .withColumn("_detr", col(valueCol) - col("trend"))
      .withColumn("_phase",
        pmod((col(orderCol).cast("long") / lit(86400000L)).cast("long"),
          lit(period.toLong)))
    val seasonal = trended.where(col("_detr").isNotNull)
      .groupBy((keys.map(col) :+ col("_phase")): _*)
      .agg(round(avg(col("_detr")), 4).as("seasonal"))
    trended.join(broadcast(seasonal), keys :+ "_phase")
      .withColumn("residual",
        round(col(valueCol) - col("trend") - col("seasonal"), 4))
      .drop("_detr", "_phase")
  }

  /** CUSUM change-point estimate: per key, the running sum of the
    * standardized series S_k = Σ (x_i − μ)/σ, reported at its maximum
    * |S_k| — the classic single-change locator (the sign says which way
    * the level shifted). μ/σ are the key's own whole-series moments
    * (exact-integer sums → identical doubles on both engines); S is
    * rounded 4 dp BEFORE the arg-max ranking so the tie-broken winner is
    * engine-portable.
    *
    * One Exchange on the key: the stats agg, the running window, and the
    * rank window all cluster by it.
    */
  def cusumChangepoint(series: DataFrame, keys: Seq[String],
                       orderCol: String, valueCol: String): DataFrame = {
    val st = series.groupBy(keys.map(col): _*)
      .agg(avg(col(valueCol).cast("double")).as("_mu"),
        stddev_samp(col(valueCol).cast("double")).as("_sd"))
    val run = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val rank = Window.partitionBy(keys.map(col): _*)
      .orderBy(abs(col("cusum")).desc, col(orderCol).asc)
    series.join(broadcast(st), keys)
      .withColumn("cusum",
        round(sum((col(valueCol) - col("_mu")) / col("_sd")).over(run), 4))
      .withColumn("_rn", row_number().over(rank))
      .where(col("_rn") === 1)
      .select(keys.map(col) :+ col(orderCol).as("change_point") :+
        col("cusum").as("max_cusum"): _*)
  }

  /** Holt double-exponential smoothing (Holt 1957) per key — the
    * level+trend forecast the volume-monitoring family was missing: x86's
    * EWMA tracks level only (a steady ramp lags it forever); Holt carries
    * an explicit trend state, so ŷ(T+h) = level + h·trend extrapolates
    * the ramp. The capacity-planning read over daily ingest curves.
    *
    * Recurrence (α = level gain, β = trend gain), classic init
    * l₁ = y₁, b₁ = y₂ − y₁, then for t ≥ 2:
    * l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1}); b_t = β(l_t − l_{t−1}) +
    * (1−β)b_{t−1} — inherently sequential, so it folds ARRAY-LOCALLY
    * over each key's day-sorted series (the same per-key collect
    * discipline as the seasonal decompose; |days| is the bounded series
    * grain, not the corpus), with every l/b rounded 6 dp PER STEP so the
    * trajectory is engine-portable (the fixed-point oracle discipline —
    * the oracle unrolls the same steps as chained CTEs). Keys with a
    * single observation emit NULLs (no trend is definable).
    *
    * Scale shape: one (key, bucket) agg upstream, one collect_list hash
    * agg at key grain, one array fold per key — no windows, no joins. */
  def holtForecast(series: DataFrame, keys: Seq[String], orderCol: String,
                   valueCol: String, alpha: Double, beta: Double,
                   horizon: Int): DataFrame = {
    val ys = transform(
      array_sort(collect_list(struct(col(orderCol), col(valueCol)))),
      s => s.getField(valueCol).cast("double"))
    val l = (c: Column) => c.getField("l")
    val b = (c: Column) => c.getField("b")
    val fold = aggregate(
      slice(col("_ys"), lit(2), greatest(size(col("_ys")) - 1, lit(0))),
      struct(element_at(col("_ys"), 1).as("l"),
        (element_at(col("_ys"), 2) - element_at(col("_ys"), 1)).as("b")),
      (acc, y) => {
        val lNew = round(lit(alpha) * y +
          lit(1.0 - alpha) * (l(acc) + b(acc)), 6)
        struct(lNew.as("l"),
          round(lit(beta) * (lNew - l(acc)) +
            lit(1.0 - beta) * b(acc), 6).as("b"))
      })
    series.groupBy(keys.map(col): _*)
      .agg(ys.as("_ys"))
      .select(keys.map(col) :+ size(col("_ys")).cast("long").as("n_obs") :+
        fold.as("_h"): _*)
      .select(keys.map(col) :+ col("n_obs") :+
        col("_h.l").as("level") :+ col("_h.b").as("trend") :+
        round(col("_h.l") + lit(horizon) * col("_h.b"), 6)
          .as(s"forecast_$horizon"): _*)
  }

  /** Two-sample Kolmogorov–Smirnov distance per key: D = max over the
    * pooled sample of |ecdf_a − ecdf_b| between the rows flagged 0 and 1
    * by `sideCol` — the drift gate that sees SHAPE changes (x81's
    * quantile deltas probe fixed probabilities; KS sweeps all of them).
    *
    * The ecdfs are peer-inclusive running shares (RANGE frame, so tied
    * values resolve identically on any engine/row order), both ecdfs and
    * the max ride ONE (key)-partitioned sort — per-key parallel, never a
    * global sort.
    */
  /** Clamped running balance per key — inventory/credit semantics: the
    * balance accumulates signed deltas but FLOORS at zero (a stock-out
    * can't go negative; the shortfall is lost, not borrowed). This is
    * the canonical stateful scan SQL windows cannot express — a plain
    * cumsum-then-greatest is WRONG (the clamp must apply at every step,
    * not once at the end) — and the textbook case for per-key
    * sequential fold.
    *
    * Scale shape: ONE shuffle to key grain (collect + array_sort by
    * (ts, id) for a deterministic order), then the whole recurrence is
    * an array-local `aggregate` fold with a struct accumulator
    * (balance, floor-hits) — embarrassingly parallel across keys. Both
    * engines fold the identical sequence in the identical order, so the
    * double accumulator (and every clamp decision) is bitwise-portable.
    * Per-key history must fit in a row — the bounded-series contract
    * this whole module already carries. */
  def clampedBalance(events: DataFrame, keyCol: String, tsCol: String,
                     idCol: String, delta: Column): DataFrame = {
    val zero = struct(lit(0.0).as("b"), lit(0L).as("h"))
    events.select(col(keyCol),
        struct(col(tsCol).as("ts"), col(idCol).as("id"),
          delta.as("v")).as("_e"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(col("_e"))).as("_es"))
      .select(col(keyCol), size(col("_es")).cast("long").as("n_events"),
        aggregate(col("_es"), zero, (acc, e) =>
          when(acc.getField("b") + e.getField("v") < 0.0,
            struct(lit(0.0).as("b"),
              (acc.getField("h") + 1L).as("h")))
          .otherwise(
            struct((acc.getField("b") + e.getField("v")).as("b"),
              acc.getField("h").as("h")))).as("_r"))
      .select(col(keyCol), col("n_events"),
        round(col("_r.b"), 4).as("final_balance"),
        col("_r.h").as("n_floor_hits"))
  }

  def ksDistance(df: DataFrame, keys: Seq[String], valueCol: String,
                 sideCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(valueCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val n = df.groupBy(keys.map(col): _*)
      .agg(sum(when(col(sideCol) === 0, 1.0)).as("_n0"),
        sum(when(col(sideCol) === 1, 1.0)).as("_n1"))
    df.join(broadcast(n), keys)
      .withColumn("_c0", sum(when(col(sideCol) === 0, 1L).otherwise(0L)).over(w))
      .withColumn("_c1", sum(when(col(sideCol) === 1, 1L).otherwise(0L)).over(w))
      .groupBy(keys.map(col): _*)
      .agg(round(max(abs(col("_c0") / col("_n0") - col("_c1") / col("_n1"))), 4)
        .as("ks_d"))
  }

  /** Mann–Whitney U / Wilcoxon rank-sum per key — the NONPARAMETRIC
    * two-sample location test [[ksDistance]]'s D statistic has no p-story
    * for and x16's stddev can't give under skew: ranks both sides
    * together (ties take the average rank), U₁ = R₁ − n₁(n₁+1)/2, and the
    * normal-approximation z uses the tie-corrected variance
    * n₀n₁/12 · ((n+1) − Σ(t³−t)/(n(n−1))). The A/B read for "did the
    * distribution shift" that is robust to outliers and needs no
    * normality.
    *
    * Exactness: rank sums are carried as 2·R₁ in LONGs (average ranks
    * live on the ½ grid), so U₁ and the z numerator are EXACT under any
    * partitioning; the variance folds exact integer tie counts through
    * one division/sqrt written identically in the oracle (IEEE
    * correctly-rounded ops on identical inputs → identical z).
    *
    * Scale shape: values collapse to (key, value) grain in ONE map-side
    * combined agg (the shuffle carries distinct values, not rows); the
    * running total is a per-KEY window over that value-grain frame (the
    * ksDistance/weightedMedian discipline — parallel across keys, never
    * a global sort), then one key-grain fold. */
  def mannWhitney(df: DataFrame, keys: Seq[String], valueCol: String,
                  sideCol: String): DataFrame = {
    val kcols = keys.map(col)
    val vg = df.groupBy(kcols :+ col(valueCol).as("_v"): _*)
      .agg(sum(when(col(sideCol) === 0, 1L).otherwise(0L)).as("_c0"),
        sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("_c1"))
    mwRankFold(vg, keys, tieCorrect = true)
      .select(kcols ++ Seq(col("n0"), col("n1"), col("u1"),
        round(col("z"), 6).as("z")): _*)
  }

  /** Mann–Whitney U of each group against the REST — [[mannWhitney]]'s
    * one-vs-rest spelling for dataset-health reads ("does source S's
    * length distribution differ from everyone else's"), on the SAME rank
    * fold ([[mwRankFold]]; the r11 duplicate in Maintenance is
    * consolidated here, r12). z keeps its legacy NO-TIES normal
    * approximation (documented as such) and the legacy 1 dp / 4 dp
    * rounds, so existing callers see identical numbers.
    *
    * Scale shape: one (group, value) agg, one value-grain agg; the dense
    * (group × value) frame comes from each VALUE row exploding the
    * collected group dictionary (bounded driver metadata, the x80
    * collect discipline) — a generator + equi-join, never a cross join
    * of frames; then the shared per-KEY (= per-group) rank fold. */
  def mannWhitneyVsRest(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val g = df.groupBy(col(groupCol).cast("string").as("_grp"),
        col(valueCol).as("_v"))
      .agg(count(lit(1)).cast("long").as("_c"))
      .localCheckpoint(eager = true) // value-grain + group-dictionary reads
    val gv = g.groupBy(col("_v")).agg(sum(col("_c")).cast("long").as("_ct"))
    val groups: Seq[String] = g.select(col("_grp")).distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val vg = gv.select(explode(typedlit(groups)).as(groupCol), col("_v"),
        col("_ct"))
      .join(g.withColumnRenamed("_grp", groupCol), Seq(groupCol, "_v"),
        "left")
      .na.fill(0L, Seq("_c"))
      .select(col(groupCol), col("_v"),
        (col("_ct") - col("_c")).as("_c0"), col("_c").as("_c1"))
    mwRankFold(vg, Seq(groupCol), tieCorrect = false)
      .select(col(groupCol), col("n1"), round(col("u1"), 1).as("u_stat"),
        round(col("z"), 4).as("z"))
  }

  /** The ONE Mann–Whitney rank fold, over a (keys, value)-grain frame
    * carrying side counts `_c0`/`_c1`: pooled average ranks as 2·R LONGs
    * (exact on the ½ grid under any partitioning), U₁ = R₁ − n₁(n₁+1)/2,
    * z from the tie-corrected variance (`tieCorrect = true`) or the
    * plain no-ties normal approximation. Degenerate keys (an empty side,
    * or every value tied) have ZERO variance — z is emitted null rather
    * than NaN, so engine-specific 0/0 conventions never leak (r11
    * advice). u1 and z come back UNROUNDED; callers own the grid. */
  private def mwRankFold(vg: DataFrame, keys: Seq[String],
                         tieCorrect: Boolean): DataFrame = {
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = vg
      .withColumn("_c", col("_c0") + col("_c1"))
      .withColumn("_cumIncl", sum(col("_c")).over(w))
      // 2 * (average rank of this value's block) = 2*cumBefore + c + 1.
      .withColumn("_2avg", (col("_cumIncl") - col("_c")) * 2 + col("_c") + 1)
    val agg0 = ranked.groupBy(kcols: _*)
      .agg(sum(col("_c0")).cast("long").as("n0"),
        sum(col("_c1")).cast("long").as("n1"),
        sum(col("_c1") * col("_2avg")).cast("long").as("_2r1"),
        sum(col("_c") * col("_c") * col("_c") - col("_c")).cast("long")
          .as("_ties"))
      .withColumn("u1",
        (col("_2r1") - col("n1") * (col("n1") + 1)).cast("double") / 2.0)
    val variance =
      if (tieCorrect)
        col("n0").cast("double") * col("n1") / 12.0 *
          ((col("n0") + col("n1") + 1).cast("double") -
            col("_ties").cast("double") /
              ((col("n0") + col("n1")).cast("double") *
                (col("n0") + col("n1") - 1)))
      else
        col("n0") * col("n1") *
          (col("n0") + col("n1") + lit(1.0)) / lit(12.0)
    agg0.select(kcols ++ Seq(col("n0"), col("n1"), col("u1"),
      when(variance > 0,
        (col("u1") - col("n0").cast("double") * col("n1") / 2.0) /
          sqrt(variance)).as("z")): _*)
  }

  /** Theil–Sen robust trend per key (Theil 1950/Sen 1968): slope = the
    * MEDIAN of all pairwise slopes (y_j−y_i)/(x_j−x_i), intercept = the
    * median of y_i − slope·x_i — the trend read OLS can't give under
    * outliers (one spiked day drags a least-squares fit; it moves one
    * slope out of n(n−1)/2 here, ~29% breakdown). The robust companion
    * of [[ewma]]'s level and x90's CUSUM shift detection.
    *
    * Determinism: pairwise slopes divide identical doubles identically
    * on both engines; the median is the exact interpolated `percentile`
    * (the curriculumOrder convention), rounded 6 dp; the intercept
    * medians against the ROUNDED slope so both engines fold the same
    * grid value.
    *
    * Scale shape: input is (key, x, y) at SERIES grain (the caller
    * aggregates raw events down first — the bounded-series contract this
    * module carries), so the pairwise self-join is per-key series² —
    * fine for daily/hourly grids, never row-grain; both medians are
    * key-grain exact-percentile aggregates after one equi-join exchange.
    *
    * `slopeGridDp = Some(dp)` rounds each pairwise slope to a dp-digit
    * grid BEFORE the median (the legacy j31 convention — both engines
    * then sort identical grid values); `None` medians raw slopes and
    * rounds once at the end. This is the SOLE Theil–Sen implementation
    * (the r11 duplicate overload is consolidated here, r12). */
  def theilSen(df: DataFrame, keys: Seq[String], xCol: String,
               yCol: String, slopeGridDp: Option[Int] = None): DataFrame = {
    val kcols = keys.map(col)
    val base = df.select(kcols :+ col(xCol).cast("long").as("_x") :+
      col(yCol).cast("double").as("_y"): _*)
    val rawSlope = (col("b._y") - col("a._y")) /
      (col("b._x") - col("a._x")).cast("double")
    val slopes = base.as("a").join(base.as("b"),
        keys.map(k => col(s"a.$k") === col(s"b.$k"))
          .reduce(_ && _) && col("a._x") < col("b._x"))
      .select(keys.map(k => col(s"a.$k").as(k)) :+
        slopeGridDp.fold(rawSlope)(dp => round(rawSlope, dp)).as("_s"): _*)
    val sl = slopes.groupBy(kcols: _*)
      .agg(count(lit(1)).cast("long").as("n_pairs"),
        round(expr("percentile(_s, 0.5)"), 6).as("slope"))
    base.join(sl, keys)
      .groupBy(kcols: _*)
      .agg(count(lit(1)).cast("long").as("n_points"),
        first(col("n_pairs")).as("n_pairs"),
        first(col("slope")).as("slope"),
        round(expr("percentile(_y - slope * _x, 0.5)"), 6).as("intercept"))
  }

  /** Kruskal–Wallis H per key — [[mannWhitney]]'s k-SAMPLE extension (the
    * nonparametric one-way ANOVA): pooled average ranks with ties,
    * H = 12/(N(N+1)) · Σ_g R_g²/n_g − 3(N+1), tie-corrected
    * H' = H / (1 − Σ(t³−t)/(N³−N)). The "did ANY of these k cohorts
    * shift" read that pairwise U tests would need k(k−1)/2 of.
    *
    * Exactness: the rank sums are carried as 2·R_g LONGs (average ranks
    * live on the ½ grid) and every tie count is an exact LONG; the
    * per-group terms R_g²/n_g are single-rounded doubles written
    * identically in the oracle. The one caveat: the k-bounded DOUBLE sum
    * of those terms (and (2R_g)² once ranks pass 2^26.5) accrues in
    * partial-aggregation order, so the two engines can differ ~1e-10
    * relative — absorbed by the dp round except on knife-edge rounding
    * boundaries (none observed through sf0.1).
    *
    * Scale shape: values collapse to (key, value, group) grain in one
    * map-side agg; the pooled running total is a per-KEY window over the
    * (key, value) grain (the [[mannWhitney]]/[[ksDistance]] discipline —
    * parallel across keys, never a global sort); then two key-grain
    * folds. With NO keys (`keys = Seq()`, the corpus-wide test) there is
    * no key dimension to parallelize on, so the running rank routes
    * through the GROUP dimension instead: a dense (group × value) frame
    * (bounded group dictionary, the x80 collect discipline) carries the
    * TOTAL per-value count into every group's partition, where cum(_c)
    * IS the pooled cumulative — the window never collapses to a single
    * partition. This is the SOLE Kruskal–Wallis implementation (the r11
    * duplicate in Maintenance is consolidated here, r12); a key whose
    * values are ALL tied has zero tie-corrected denominator —
    * h_tie_corrected is emitted null rather than ±Inf (r11 advice). */
  def kruskalWallis(df: DataFrame, keys: Seq[String], valueCol: String,
                    groupCol: String, dp: Int = 6): DataFrame = {
    val kcols = keys.map(col)
    val vgg = df.groupBy(kcols :+ col(valueCol).as("_v") :+
        col(groupCol).as("_g"): _*)
      .agg(count(lit(1)).as("_cg"))
    val vg = vgg.groupBy(kcols :+ col("_v"): _*)
      .agg(sum(col("_cg")).as("_c"))
    val perGroup =
      if (keys.nonEmpty) {
        val w = Window.partitionBy(kcols: _*).orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val avg2 = vg
          .withColumn("_cumIncl", sum(col("_c")).over(w))
          .select(kcols :+ col("_v") :+
            ((col("_cumIncl") - col("_c")) * 2 + col("_c") + 1)
              .as("_2avg"): _*)
        vgg.join(avg2, keys :+ "_v")
          .groupBy(kcols :+ col("_g"): _*)
          .agg(sum(col("_cg")).cast("long").as("_ng"),
            sum(col("_cg") * col("_2avg")).cast("long").as("_2rg"))
      } else {
        val groups: Seq[String] = vgg.select(col("_g").cast("string"))
          .distinct().collect().map(_.getString(0)).sorted.toSeq
        val dense = vg
          .select(explode(typedlit(groups)).as("_g"), col("_v"), col("_c"))
          .join(vgg.select(col("_g").cast("string").as("_g"), col("_v"),
            col("_cg")), Seq("_g", "_v"), "left")
          .na.fill(0L, Seq("_cg"))
        val w = Window.partitionBy(col("_g")).orderBy(col("_v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        dense
          .withColumn("_cumIncl", sum(col("_c")).over(w))
          .withColumn("_2avg",
            (col("_cumIncl") - col("_c")) * 2 + col("_c") + 1)
          .groupBy(col("_g"))
          .agg(sum(col("_cg")).cast("long").as("_ng"),
            sum(col("_cg") * col("_2avg")).cast("long").as("_2rg"))
      }
    val ties = vg.groupBy(kcols: _*)
      .agg(sum(col("_c") * col("_c") * col("_c") - col("_c")).cast("long")
        .as("_t3t"))
    val nn = col("n_total").cast("double")
    val n3n = nn * nn * nn - nn
    val hExpr = lit(12.0) / (nn * (nn + 1)) * col("_sr2") -
      lit(3.0) * (nn + 1)
    val aggTop = perGroup.groupBy(kcols: _*)
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("_ng")).cast("long").as("n_total"),
        sum(col("_2rg").cast("double") * col("_2rg") /
          (lit(4.0) * col("_ng"))).as("_sr2"))
    val joined =
      if (keys.nonEmpty) aggTop.join(ties, keys)
      else aggTop.crossJoin(broadcast(ties))
    joined.select(kcols ++ Seq(col("n_groups"), col("n_total"),
      round(hExpr, dp).as("h"),
      when(col("_t3t").cast("double") < n3n,
        round(hExpr /
          (lit(1.0) - col("_t3t").cast("double") / n3n), dp))
        .as("h_tie_corrected")): _*)
  }

  /** Wald's SEQUENTIAL probability ratio test (SPRT, Wald 1945) per key —
    * the SEQUENTIAL-testing capability the fixed-horizon tests (x93, j45,
    * [[mannWhitney]]) can't give: monitor a Bernoulli stream (H0: p = p0
    * vs H1: p = p1) and STOP at the first bucket where the cumulative
    * log-likelihood ratio LLR = k·ln(p1/p0) + (m−k)·ln((1−p1)/(1−p0))
    * crosses ln((1−β)/α) (accept H1) or ln(β/(1−α)) (accept H0) — the
    * earliest-possible decision at the chosen error rates, or `continue`
    * if the horizon ends undecided. The A/B-guardrail read: "which arm
    * won, and on WHICH DAY could we have stopped".
    *
    * Exactness: the cumulative hit/trial counts are exact LONG window
    * sums at BUCKET grain; the four ln(·) coefficients are computed once
    * driver-side and inlined as the SAME double literals into the oracle
    * SQL (shortest-repr doubles parse identically), so LLR is two exact
    * long×double products and one add — bit-identical on both engines,
    * as are the threshold compares. Rounding (6 dp) only at output.
    *
    * Scale shape: events collapse to (key, bucket) grain in one
    * map-side-combined agg (the shuffle carries buckets, never rows);
    * the cumulative scan is a per-KEY window over the BOUNDED bucket
    * series (the [[theilSen]] bounded-series contract); decisions fold
    * in the same key-grain agg via min-when / min-struct. */
  def sprt(df: DataFrame, keys: Seq[String], bucketCol: String,
           hitCol: String, p0: Double, p1: Double,
           alpha: Double, beta: Double): DataFrame = {
    require(p0 > 0 && p0 < p1 && p1 < 1, s"need 0 < p0 < p1 < 1")
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha and beta must be in (0,1)")
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1 - p1) / (1 - p0))
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    val kcols = keys.map(col)
    val d = df.groupBy(kcols :+ col(bucketCol).cast("long").as("_day"): _*)
      .agg(count(lit(1)).cast("long").as("_m"),
        sum(col(hitCol).cast("long")).cast("long").as("_k"))
    val w = Window.partitionBy(kcols: _*).orderBy(col("_day"))
    val c = d
      .withColumn("_llr",
        sum(col("_k")).over(w) * lit(c1) +
          sum(col("_m") - col("_k")).over(w) * lit(c2))
      .withColumn("_hit",
        when(col("_llr") >= upper, lit("accept_h1"))
          .when(col("_llr") <= lower, lit("accept_h0")))
    c.groupBy(kcols: _*)
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(col("_m")).cast("long").as("n_obs"),
        sum(col("_k")).cast("long").as("n_hits"),
        round(max_by(col("_llr"), col("_day")), 6).as("llr_final"),
        min(when(col("_hit").isNotNull, col("_day"))).as("decision_day"),
        coalesce(
          min(when(col("_hit").isNotNull,
            struct(col("_day").as("_d"), col("_hit").as("_h"))))
            .getField("_h"),
          lit("continue")).as("decision"))
  }

  /** Inter-arrival gap statistics: per key, the distribution (count, min,
    * exact interpolated p50/p90, max) of consecutive-event gaps within
    * each (key, entity) sub-series — the ingest-health read ("how bursty
    * is each source per user").
    *
    * One Exchange on (key, entity) for the lag, then a key-grain exact
    * `percentile` aggregate (exact because the gap table is already one
    * row per event — same grain as the input, no blowup).
    */
  def interarrivalStats(events: DataFrame, keys: Seq[String],
                        entityCol: String, tsMsCol: String,
                        tieBreakCol: String): DataFrame = {
    val w = Window.partitionBy((keys :+ entityCol).map(col): _*)
      .orderBy(col(tsMsCol), col(tieBreakCol))
    events
      .withColumn("_gap", col(tsMsCol) - lag(col(tsMsCol), 1).over(w))
      .where(col("_gap").isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n_gaps"),
        min(col("_gap")).cast("long").as("min_ms"),
        floor(expr("percentile(_gap, 0.5)")).cast("long").as("p50_ms"),
        floor(expr("percentile(_gap, 0.9)")).cast("long").as("p90_ms"),
        max(col("_gap")).cast("long").as("max_ms"))
  }

  /** OLS trend per key from MERGEABLE power sums — [[theilSen]]'s
    * parametric twin (run both: a large robust-vs-OLS slope gap names the
    * outlier days). The shuffle carries six sufficient statistics per key
    * (n, Σx, Σy, Σxy, Σx², Σy²), never the series — the same mergeable-
    * aggregate discipline as the moment profile, so the operator is one
    * map-side-combined agg at any scale and the same sums accrue
    * additively under streaming.
    *
    * Exactness: x is shifted by the GLOBAL min (one broadcast scalar) so
    * every cross product stays small enough that the normal-equation
    * numerators a = n·Σxy − Σx·Σy, b = n·Σx² − (Σx)², c = n·Σy² − (Σy)²
    * are EXACT integers on both engines; slope a/b, intercept
    * (Σy·b − a·Σx)/(n·b) and r² = a²/(b·c) are then single double
    * divisions — bit-identical before the 6 dp round. */
  def olsTrend(series: DataFrame, keyCol: String, xCol: String,
               yCol: String): DataFrame = {
    val x0 = series.agg(min(col(xCol)).as("_x0"))
    val g = series.crossJoin(broadcast(x0))
      .select(col(keyCol), (col(xCol) - col("_x0")).cast("long").as("_x"),
        col(yCol).cast("long").as("_y"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("_n"), sum(col("_x")).as("_sx"),
        sum(col("_y")).as("_sy"), sum(col("_x") * col("_y")).as("_sxy"),
        sum(col("_x") * col("_x")).as("_sxx"),
        sum(col("_y") * col("_y")).as("_syy"))
    g.select(col(keyCol), col("_n").cast("long").as("n_points"),
        (col("_n") * col("_sxy") - col("_sx") * col("_sy")).as("_a"),
        (col("_n") * col("_sxx") - col("_sx") * col("_sx")).as("_b"),
        (col("_n") * col("_syy") - col("_sy") * col("_sy")).as("_c"),
        col("_sx"), col("_sy"))
      .select(col(keyCol), col("n_points"),
        round(col("_a").cast("double") / col("_b"), 6).as("slope"),
        round((col("_sy") * col("_b") - col("_a") * col("_sx"))
          .cast("double") / (col("n_points") * col("_b")), 6).as("intercept"),
        round(when(col("_c") === 0L, lit(0.0)) // flat y: define r² = 0
          .otherwise(col("_a").cast("double") * col("_a") /
            (col("_b") * col("_c"))), 6).as("r2"))
  }

  /** Lead–lag cross-correlation between two integer-valued series x and y
    * sharing a bucket axis: Pearson corr(x(t), y(t+lag)) for every lag in
    * [-maxLag, maxLag] — the "does a click surge FORESHADOW a purchase
    * surge, and by how many days" read that turns two monitoring curves
    * into a causal-direction hint (the peak's sign of lag says which
    * series leads).
    *
    * The lag axis is a LITERAL explode on the x side (never a cross
    * join), so the whole sweep is ONE equi-join on the shifted bucket —
    * at series grain, already tiny — and one (lag)-grain aggregate of
    * exact BIGINT power sums; the single division (and two sqrts) happen
    * once per lag at the end, identically on both engines.
    *
    * Output: (lag, n overlap buckets, xcorr 6dp), ordered by the caller.
    */
  def leadLagCorr(x: DataFrame, y: DataFrame, bucketCol: String,
                  xCol: String, yCol: String, maxLag: Int): DataFrame = {
    val lags = typedLit((-maxLag to maxLag).map(_.toLong))
    val xl = x.select(col(bucketCol).as("_bx"),
        col(xCol).cast("long").as("_x"), explode(lags).as("lag"))
    val pairs = xl.join(
      y.select(col(bucketCol).as("_by"), col(yCol).cast("long").as("_y")),
      col("_by") === col("_bx") + col("lag"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("_x")).cast("long").as("_sx"),
        sum(col("_y")).cast("long").as("_sy"),
        sum(col("_x") * col("_y")).cast("long").as("_sxy"),
        sum(col("_x") * col("_x")).cast("long").as("_sx2"),
        sum(col("_y") * col("_y")).cast("long").as("_sy2"))
      .select(col("lag"), col("n"),
        (sqrt((col("n") * col("_sx2") - col("_sx") * col("_sx"))
          .cast("double")) *
          sqrt((col("n") * col("_sy2") - col("_sy") * col("_sy"))
            .cast("double"))).as("_den"),
        (col("n") * col("_sxy") - col("_sx") * col("_sy"))
          .cast("double").as("_num"))
      // A constant series in the overlap has zero variance: the
      // correlation is undefined and ANSI division would throw → NULL.
      .select(col("lag"), col("n"),
        when(col("_den") =!= 0.0, round(col("_num") / col("_den"), 6))
          .as("xcorr"))
  }

  /** Seasonal-naive forecast backtest — the "is there a weekly signal
    * worth modeling" gate run BEFORE anything like [[holtForecast]] ships:
    * walk the per-key daily-count series, forecast each day with the
    * naive rule (yesterday's value) and the seasonal-naive rule (the
    * value `season` days back), and score both over every day where the
    * seasonal lag exists. MASE here is the classic scaled form with the
    * naive walk as the scaling denominator — Σ|y−y_{t−season}| /
    * Σ|y−y_{t−1}| over the same backtest days, a ratio of two EXACT
    * integer sums (< 1 means the seasonal rule beats persistence and a
    * seasonal model is worth its keep); sMAPE of the seasonal rule rides
    * along (0 when actual and forecast are both 0, the standard guard).
    *
    * The day grid is DENSE per key (min..max day, absent days = 0):
    * lag-k over only-observed days would silently compare across gaps
    * and a quiet day IS a zero observation for volume series.
    *
    * Scale shape: the raw events collapse to (key, day) grain in one
    * map-side-partial agg — the only pass over the input; bounds, the
    * grid explode (bounded by the key's day span), the lag window
    * (partitioned by key, never a global sort) and the final key-grain
    * fold all run on that tiny series frame. A zero naive error leaves
    * mase NULL (division guard on both engines). */
  def forecastBacktest(events: DataFrame, keyCol: String, tsCol: String,
                       season: Int): DataFrame =
    forecastBacktestSeries(
      events.groupBy(col(keyCol),
          date_trunc("day", col(tsCol)).cast("date").as("_day"))
        .agg(count(lit(1)).cast("long").as("_n")),
      keyCol, "_day", "_n", season)

  /** MAD-based robust day-level anomaly read per key — the
    * median/absolute-deviation twin of the mean/σ monitors (a single
    * spike inflates a z-score's own σ and hides itself; the median and
    * MAD barely move): over the DENSE daily-count series, robust
    * z = |y − median| / (1.4826·MAD) (the Gaussian-consistency
    * constant), days with z > `threshold` counted as anomalies, and the
    * peak day emitted per key (most-anomalous, earliest-day tie-break —
    * NULLS LAST when a constant series makes every z NULL). Medians of
    * integer counts land on the exact 0.25 grid (half-averaging twice),
    * so every statistic derives deterministically; rounding is pure
    * presentation.
    *
    * Scale shape: one pass collapses events to (key, day); the dense
    * frame is localCheckpointed once (series grain — tiny) so the
    * median, MAD, z, peak, and summary branches replay materialized
    * rows instead of re-scanning the input; all aggregates and the
    * peak window run at key/series grain. */
  def madAnomaly(events: DataFrame, keyCol: String, tsCol: String,
                 threshold: Double): DataFrame =
    madAnomalySeries(
      events.groupBy(col(keyCol),
          date_trunc("day", col(tsCol)).cast("date").as("_day"))
        .agg(count(lit(1)).cast("long").as("_n")),
      keyCol, "_day", "_n", threshold)

  /** [[madAnomaly]] from an already-aggregated (key, day, count) series —
    * the [[forecastBacktestSeries]] pattern: the streaming twin folds its
    * converged day-grain count state through this. Densification (per-key
    * min..max grid, absent days = 0) happens HERE so both paths agree on
    * gap semantics. */
  def madAnomalySeries(series: DataFrame, keyCol: String, dayCol: String,
                       valueCol: String, threshold: Double): DataFrame = {
    val observed = series.select(col(keyCol), col(dayCol).as("_d"),
      col(valueCol).cast("long").as("_y"))
    val dense = observed.groupBy(col(keyCol))
      .agg(min(col("_d")).as("_d0"), max(col("_d")).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as("_d"))
      .join(observed, Seq(keyCol, "_d"), "left")
      .na.fill(0L, Seq("_y"))
      .localCheckpoint(eager = true)
    val med = dense.groupBy(col(keyCol))
      .agg(median(col("_y")).as("_med"))
    val dev = dense.join(med, Seq(keyCol))
      .withColumn("_ad", abs(col("_y") - col("_med")))
    val mad = dev.groupBy(col(keyCol)).agg(median(col("_ad")).as("_mad"))
    val z = dev.join(mad, Seq(keyCol))
      .withColumn("_z", when(col("_mad") > 0.0,
        round(col("_ad") / (lit(1.4826) * col("_mad")), 4)))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col("_z").desc_nulls_last, col("_d"))
    val peak = z.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(keyCol), unix_date(col("_d")).cast("long").as("peak_day"),
        col("_y").as("peak_y"), col("_z").as("peak_z"))
    z.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_days"),
        round(first(col("_med")), 1).as("med"),
        round(first(col("_mad")), 2).as("mad"),
        sum(when(col("_z") > threshold, 1L).otherwise(0L)).cast("long")
          .as("n_flagged"))
      .join(peak, Seq(keyCol))
  }

  /** [[forecastBacktest]] from an already-aggregated (key, day, count)
    * series — the entry point the streaming twin folds its converged
    * day-grain count state through (the day agg happens per micro-batch
    * there; this is everything AFTER the grain collapse). */
  def forecastBacktestSeries(series: DataFrame, keyCol: String,
                             dayCol: String, valueCol: String,
                             season: Int): DataFrame = {
    val daily = series.select(col(keyCol), col(dayCol).as("_d"),
      col(valueCol).cast("long").as("_y"))
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("_d")).as("_d0"), max(col("_d")).as("_d1"))
      .select(col(keyCol), explode(sequence(col("_d0"), col("_d1"))).as("_d"))
    val dense = grid.join(daily, Seq(keyCol, "_d"), "left")
      .na.fill(0L, Seq("_y"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_d"))
    val bt = dense
      .withColumn("_f1", lag(col("_y"), 1).over(w))
      .withColumn("_fs", lag(col("_y"), season).over(w))
      .where(col("_fs").isNotNull)
    bt.groupBy(col(keyCol))
      .agg(count(lit(1)).cast("long").as("n_days"),
        sum(abs(col("_y") - col("_f1"))).cast("long").as("abs_err_naive"),
        sum(abs(col("_y") - col("_fs"))).cast("long").as("abs_err_snaive"),
        round(avg(when(col("_y") + col("_fs") === 0L, lit(0.0))
          .otherwise(lit(2.0) * abs(col("_y") - col("_fs")).cast("double") /
            (col("_y") + col("_fs")))), 4).as("smape_snaive"))
      .select(col(keyCol), col("n_days"), col("abs_err_naive"),
        col("abs_err_snaive"),
        when(col("abs_err_naive") > 0L,
          round(col("abs_err_snaive").cast("double") /
            col("abs_err_naive"), 6)).as("mase"),
        col("smape_snaive"))
  }
}
