package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The read path: the dashboard/API query semantics (SURVEY.md §2.4 Q1-Q20)
  * as composable DataFrame operators over the stats frames produced by
  * [[graft.pipeline.StatsPipeline]].
  *
  * Scale notes: dimension sides (channels, emote dict) are always broadcast;
  * leaderboards are ORDER BY + LIMIT which Catalyst executes as
  * TakeOrderedAndProject (no global sort); trailing/range scans are simple
  * filters that push down to the parquet scan.
  */
object Serving {

  /** Q2: hidden-channel semi-join filter — `channel IN (SELECT channel FROM
    * channels WHERE NOT hidden)` (ApiController.php:200-203). Broadcast
    * left-semi: never shuffles the stats side. */
  def visibleOnly(stats: DataFrame, channels: DataFrame): DataFrame =
    stats.join(broadcast(channels.filter(!col("hidden")).select("channel")),
      Seq("channel"), "left_semi")

  /** Q5: trailing-window sums — messages in the last N ms relative to a fixed
    * `now`, NULL→0 (ApiController.php:154-178). One pass over the series with
    * conditional aggregation instead of five scans. */
  def trailingSums(stats: DataFrame, nowMs: Long, windows: Seq[(String, Long)],
                   valueCol: String): DataFrame = {
    val aggs = windows.map { case (name, spanMs) =>
      coalesce(sum(when(col("ts") > lit(nowMs - spanMs), col(valueCol))), lit(0L))
        .as(name)
    }
    stats.agg(aggs.head, aggs.tail: _*)
  }

  /** Q6/Q7: leaderboard — sum metric per key over an optional time range,
    * ORDER BY metric DESC with a deterministic key tie-break, LIMIT n
    * (MainController.php:175-207). */
  def leaderboard(stats: DataFrame, keys: Seq[String], valueCol: String,
                  n: Int): DataFrame = {
    val total = sum(col(valueCol)).cast("long").as(valueCol)
    stats.groupBy(keys.map(col): _*).agg(total)
      .orderBy(col(valueCol).desc +: keys.map(col(_).asc): _*)
      .limit(n)
  }

  /** Q8: cumulative base — total strictly before a window start, excluding
    * the ts=0 sentinel row (MainController.php:50-58). */
  def cumulativeBase(stats: DataFrame, keys: Seq[String], valueCol: String,
                     windowStartMs: Long): DataFrame =
    stats.filter(col("ts") > 0 && col("ts") < lit(windowStartMs))
      .groupBy(keys.map(col): _*)
      .agg(coalesce(sum(col(valueCol)), lit(0L)).cast("long").as(valueCol))

  /** Q10: rates → cumulative sums, running sum per key ordered by ts
    * (MainController.php:682-690). */
  def cumulativeSums(series: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    series.withColumn(valueCol, sum(col(valueCol)).over(w).cast("long"))
  }

  /** [[ranked]] plus a RUNNING SUM of `valueCol` in rank order — the
    * distributed prefix-sum every Pareto/cumulative-share read needs,
    * without the `Exchange SinglePartition` a global window would plan:
    * the range-partitioned sort gives a global order across partitions,
    * one pass collects each partition's (count, sum) — driver state
    * bounded at one pair per partition, the zipWithIndex discipline —
    * the exclusive prefix offsets fold on the driver, and a second
    * per-partition pass emits rank and cumulative sum sequentially.
    *
    * EXACTNESS: the cross-partition offsets are a `scanLeft` over
    * per-partition sums — (s0+s1)+s2 is NOT the same IEEE association as
    * a sequential rank-order fold, so for general doubles `cum` can
    * differ from a single-task running window in the last ulp, and the
    * difference depends on the partition count. The fold IS exact —
    * bit-identical under any partitioning, and to any oracle's
    * sequential window — when `valueCol` holds INTEGER-VALUED doubles
    * and every prefix stays below 2^53 (integer double addition is
    * associative in that range). Callers needing an exact cumulative
    * share on a decimal grid should scale to grid units first
    * (e.g. `round(v * 10000, 0)` for a 4-dp grid) and divide the share
    * out after — see j59_abc_pareto; x155 is exact because byte counts
    * are already integers. Emits `rank` LONG and `cum` DOUBLE. */
  def cumulated(leaderboard: DataFrame, valueCol: String,
                tieBreak: String): DataFrame = {
    val spark = leaderboard.sparkSession
    val sortCols = Seq(col(valueCol).desc, col(tieBreak).asc)
    val sorted0 = leaderboard
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val sorted =
      if (spark.conf.getOption("spark.graft.reliableCheckpoint").contains("true"))
        sorted0.checkpoint()
      else sorted0.localCheckpoint()
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val stats = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var n = 0L; var s = 0.0
      it.foreach { r => n += 1; s += r.getDouble(vIdx) }
      Iterator((i, n, s))
    }.collect().sortBy(_._1) // one (count, sum) pair per partition
    val rankOff = stats.scanLeft(0L)(_ + _._2).init
    val cumOff = stats.scanLeft(0.0)(_ + _._3).init
    val withCum = sorted.rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = rankOff(i)
      var cum = cumOff(i)
      it.map { r =>
        rank += 1
        cum += r.getDouble(vIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ rank :+ cum)
      }
    }
    spark.createDataFrame(withCum,
      sorted.schema.add("rank", org.apache.spark.sql.types.LongType)
        .add("cum", org.apache.spark.sql.types.DoubleType))
  }

  /** Q13: global rank assignment — row_number over (metric DESC, key ASC),
    * the PHP client-side sort+rank (MainController.php:273-288).
    *
    * Scale-safe: a bare `row_number().over(Window.orderBy(...))` funnels the
    * whole frame through ONE task. Instead: range-partition on the sort key
    * (so partition i holds ranks strictly before partition i+1), sort within
    * partitions, and `zipWithIndex` — which assigns contiguous global indices
    * from per-partition counts without ever collecting the data. Every stage
    * is parallel; the only driver-side state is one count per partition.
    *
    * The sorted frame is `localCheckpoint`ed first: the sort materializes
    * into the block manager in ONE job, and both `zipWithIndex`'s internal
    * per-partition count and the downstream action read the cached blocks —
    * no duplicated sort stage, and the blocks are released by the
    * ContextCleaner when the plan is dropped (no persist lifecycle to leak).
    * `localCheckpoint` blocks are NOT fault-tolerant (an executor loss
    * fails the job): for cluster runs set
    * `spark.graft.reliableCheckpoint=true` (plus a `setCheckpointDir`) to
    * use a reliable `checkpoint` instead — same plan, recomputable blocks.
    * Rank is emitted as LONG — a 32-bit rank would silently wrap past 2^31
    * rows, at odds with the 100-TB framing. */
  def ranked(leaderboard: DataFrame, valueCol: String, tieBreak: String): DataFrame = {
    val spark = leaderboard.sparkSession
    val sortCols = Seq(col(valueCol).desc, col(tieBreak).asc)
    val sorted0 = leaderboard
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val sorted =
      if (spark.conf.getOption("spark.graft.reliableCheckpoint").contains("true"))
        sorted0.checkpoint()
      else sorted0.localCheckpoint()
    val withRank = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1))
    }
    spark.createDataFrame(withRank,
      sorted.schema.add("rank", org.apache.spark.sql.types.LongType))
  }

  /** Q15: MAX-per-group with share-of-total percentage vs SUM(MAX(..))
    * (MainController.php:335-361, 496-507). */
  /** Median absolute deviation per group — the robust spread statistic
    * (stddev's outlier-immune sibling, the backbone of robust z-scores):
    * `median(|x - median(x)|)`. Exact discrete medians via
    * percentile_approx at exact accuracy (the x63 oracle contract).
    *
    * Scale shape: two passes, each ONE map-side-combined sketch
    * aggregate; the group-grain median table broadcasts back (dimension
    * grain, never the fact table). */
  def medianAbsoluteDeviation(df: DataFrame, keys: Seq[String],
                              valueCol: String): DataFrame = {
    val kcols = keys.map(col)
    val med = df.groupBy(kcols: _*)
      .agg(expr(s"percentile_approx($valueCol, 0.5, 1000000)").as("_med"))
    df.join(broadcast(med), keys)
      .withColumn("_d", abs(col(valueCol) - col("_med")))
      .groupBy(kcols: _*)
      .agg(round(first(col("_med")), 4).as("median"),
        round(expr("percentile_approx(_d, 0.5, 1000000)"), 4).as("mad"))
  }

  /** Exact weighted median per group: the smallest value whose running
    * weight reaches half the group's total (lower weighted median — the
    * robust-center statistic mean-based summaries misreport under skew).
    *
    * Scale shape: ONE exchange on the group key serves both windows (the
    * running cumsum and the per-group total share the partitioning), then
    * a filter + min-aggregate. Per-group windows run in parallel; no
    * global sort, no single-partition funnel. Tie-safety: rows of equal
    * value collapse through `min(value)`, so intra-tie cumsum order can
    * never change the answer. */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    val kcols = keys.map(col)
    val run = Window.partitionBy(kcols: _*)
      .orderBy(col(valueCol).asc, col(weightCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy(kcols: _*)
    df.withColumn("_cw", sum(col(weightCol)).over(run))
      .withColumn("_tw", sum(col(weightCol)).over(tot))
      .filter(col("_cw") >= col("_tw") / 2)
      .groupBy(kcols: _*)
      .agg(round(min(col(valueCol)), 2).as("wmedian"))
  }

  def maxPerGroupWithShare(stats: DataFrame, key: String, valueCol: String): DataFrame = {
    // The share denominator is a single scalar; an empty-partition window
    // (`sum().over(Window.partitionBy())`) would drag every row into one
    // task. A 1-row aggregate cross-joined back (broadcast) keeps the big
    // side fully parallel.
    val m = stats.groupBy(col(key)).agg(max(col(valueCol)).as(valueCol))
    val total = m.agg(sum(col(valueCol)).as("_total"))
    m.crossJoin(broadcast(total))
      .withColumn("pct", round(col(valueCol) * 100.0 / col("_total"), 4))
      .drop("_total")
  }

  /** Q11: time-series resampling with linear interpolation
    * (MainController.php:593-680 `resampleTimeSeries`). Semantics matched
    * exactly, per key:
    *  - `numPoints < 2` → 2 (:595-596);
    *  - `n <= numPoints` → series returned as-is, never up-sampled (:611-613);
    *  - `start`/`end` default to the key's first/last sample ts (:617-618);
    *  - `start == end` → `end += 60000`, `numPoints = 2` (:620-624);
    *  - grid stepping `t = ceil(t + step)` capped at `end` (:674-676): since
    *    every emitted `t` is an integer epoch-ms, `ceil(t + step)` equals
    *    `t + ceil(step)`, so the grid is `start + i*C` (C = integer
    *    ceil((end-start)/(numPoints-1))) clamped to a final point at `end` —
    *    all integer math;
    *  - grid points at/before the first sample clamp to its value, at/after
    *    the last sample to its value (:632-642);
    *  - interior points linearly interpolate between the neighboring samples:
    *    `round(v0 + k*(v1-v0))`, `k = (t-t0)/(t1-t0)` in double (:664-668).
    *
    * Plan shape (the 100-TB story): ONE shuffle on the key. Per-key stats
    * (first/last/n) are window columns over the key partition; the grid is
    * emitted by exploding a `sequence` on the first row of each key; the
    * as-of neighbors are `last/first(..., ignoreNulls)` running windows over
    * the union of sample and grid rows. No joins, no driver round-trips, no
    * global (unpartitioned) windows.
    */
  def resample(series: DataFrame, keys: Seq[String], valueCol: String,
               numPoints: Int, startMs: Option[Long] = None,
               endMs: Option[Long] = None): DataFrame = {
    val np0 = math.max(numPoints, 2)
    val kcols = keys.map(col)
    val vType = series.schema(valueCol).dataType
    val wFull = Window.partitionBy(kcols: _*).orderBy(col("ts"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wOrd = Window.partitionBy(kcols: _*).orderBy(col("ts"))

    val startC = startMs.map(lit(_)).getOrElse(col("_first_ts"))
    val end0 = endMs.map(lit(_)).getOrElse(col("_last_ts"))
    val degenerate = end0 === startC

    val params = series
      .withColumn("_first_ts", min(col("ts")).over(wFull))
      .withColumn("_last_ts", max(col("ts")).over(wFull))
      .withColumn("_first_v", first(col(valueCol)).over(wFull))
      .withColumn("_last_v", last(col(valueCol)).over(wFull))
      .withColumn("_n", count(lit(1)).over(wFull))
      .withColumn("_rn", row_number().over(wOrd))
      .withColumn("_start", startC)
      .withColumn("_end", when(degenerate, startC + lit(60000L)).otherwise(end0))
      .withColumn("_np", when(degenerate, lit(2)).otherwise(lit(np0)))
      .withColumn("_c", expr("(_end - _start + _np - 2) div (_np - 1)"))

    // Grid points for keys that need down-sampling, attached to the first
    // row of the key so one explode emits sample rows AND grid rows.
    val pts = params
      .withColumn("_grid",
        when(col("_rn") === 1 && col("_n") > col("_np"),
          concat(sequence(col("_start"), col("_end") - 1, col("_c")),
            array(col("_end"))))
          .otherwise(array().cast("array<long>")))
      .withColumn("_pt", explode(concat(
        array(struct(col("ts").as("t"), lit(0).as("g"))),
        transform(col("_grid"), t => struct(t.as("t"), lit(1).as("g"))))))
      .withColumn("_t", col("_pt").getField("t"))
      .withColumn("_is_grid", col("_pt").getField("g"))
      .withColumn("_v", when(col("_is_grid") === 0, col(valueCol)))
      .withColumn("_sts", when(col("_is_grid") === 0, col("ts")))

    // As-of neighbors: at equal ts the sample row sorts before the grid row,
    // so a grid point sitting exactly on a sample interpolates with k=0 to
    // that sample's value — same result as the PHP pairing.
    val ord = Seq(col("_t").asc, col("_is_grid").asc)
    val wb = Window.partitionBy(kcols: _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wa = Window.partitionBy(kcols: _*).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val ann = pts
      .withColumn("_b_v", last(col("_v"), ignoreNulls = true).over(wb))
      .withColumn("_b_ts", last(col("_sts"), ignoreNulls = true).over(wb))
      .withColumn("_a_v", first(col("_v"), ignoreNulls = true).over(wa))
      .withColumn("_a_ts", first(col("_sts"), ignoreNulls = true).over(wa))

    ann
      .filter((col("_is_grid") === 1) ||
        (col("_is_grid") === 0 && col("_n") <= col("_np")))
      .withColumn(valueCol,
        when(col("_is_grid") === 0, col(valueCol))
          .when(col("_t") <= col("_first_ts"), col("_first_v"))
          .when(col("_t") >= col("_last_ts"), col("_last_v"))
          .otherwise(
            round(col("_b_v") +
              (col("_t") - col("_b_ts")) / (col("_a_ts") - col("_b_ts")) *
                (col("_a_v") - col("_b_v")))
              .cast(vType)))
      .select(kcols ++ Seq(col("_t").as("ts"), col(valueCol)): _*)
  }

  /** Q12: empty-series placeholder — when a series has no rows, substitute
    * two zero samples at the range bounds (MainController.php:697-706).
    * Fully declarative: the defaults are emitted only when the series is
    * empty (cross-join guard on a 1-row count aggregate — broadcast, no
    * driver-side isEmpty). */
  def orEmptyPlaceholder(series: DataFrame, startMs: Long, endMs: Long,
                         valueCol: String): DataFrame = {
    val spark = series.sparkSession
    import spark.implicits._
    val defaults = Seq((startMs, 0L), (endMs, 0L)).toDF("ts", valueCol)
    val n = series.agg(count(lit(1)).as("n"))
    series.unionByName(
      defaults.join(broadcast(n), n("n") === 0L, "left_semi"))
  }

  /** Per-key trailing range-frame features — the feature-store
    * generalization of Q5: where [[trailingSums]] answers one scalar per
    * table relative to a fixed `now`, this stamps EVERY row with its
    * key's trailing aggregates as of that row's own event time (the "user
    * activity in the last 7 d at interaction time" feature family, point
    * -in-time correct by construction — a frame ending at CURRENT ROW
    * can't see the future).
    *
    * Scale shape: all frames share one (key, ts) clustering — a single
    * Exchange on the key and one per-key sort serve every span in
    * `spans`; per-key ordering is partition-parallel (never a global
    * sort), and a range frame over epoch-ms walks each partition's sorted
    * run once per frame. Rows with equal (key, ts) — the range-frame tie
    * group — aggregate identically on both engines by the frame
    * definition. */
  def rollingFeatures(events: DataFrame, keyCol: String, tsMsCol: String,
                      valueCol: String,
                      spans: Seq[(String, Long)]): DataFrame = {
    val featCols = spans.flatMap { case (name, spanMs) =>
      val w = Window.partitionBy(col(keyCol)).orderBy(col(tsMsCol))
        .rangeBetween(-(spanMs - 1), Window.currentRow)
      Seq(count(lit(1)).over(w).as(s"n_$name"),
        round(sum(col(valueCol)).over(w), 2).as(s"sum_$name"))
    }
    events.select(Seq(col("*")) ++ featCols: _*)
  }

  /** Keyset (seek-method) pagination of a ranked surface: the page AFTER
    * a cursor row, by the strict (rank key desc, id asc) order — the
    * API-serving pattern that stays O(page) at any depth, where
    * OFFSET/row_number pagination ranks and discards everything above
    * the page (the reference dashboard's leaderboards page exactly this
    * surface, MainController.php:41-207).
    *
    * `cursor` is the LAST row of the previous page (bounded driver
    * metadata the API layer already holds). The predicate
    * `v < cv OR (v = cv AND id > cid)` is sargable — it pushes into the
    * scan — and the result plans as TakeOrderedAndProject: no global
    * sort, no rank window, no skipped-prefix work. */
  def keysetPage(ranked: DataFrame, valueCol: String, idCol: String,
                 cursor: (Double, Long), pageSize: Int): DataFrame = {
    val (cv, cid) = cursor
    ranked.where(col(valueCol) < cv ||
        (col(valueCol) === cv && col(idCol) > cid))
      .orderBy(col(valueCol).desc, col(idCol).asc)
      .limit(pageSize)
  }

  /** Day-of-week × hour activity heatmap — the dashboard calendar read
    * (when does this community actually chat): one count per (dow, hod)
    * cell plus its share of all traffic. Dow follows the SQL-standard
    * 1 = Sunday … 7 = Saturday convention on both engines.
    *
    * Scale shape: one hash aggregate to the fixed 7×24 grid (the shuffle
    * carries 168 cells, never events), one broadcast scalar row for the
    * share denominator. */
  def dowHourProfile(events: DataFrame, tsCol: String): DataFrame = {
    val h = events.groupBy(dayofweek(col(tsCol)).cast("long").as("dow"),
        hour(col(tsCol)).cast("long").as("hod"))
      .agg(count(lit(1)).cast("long").as("n"))
    val t = h.agg(sum(col("n")).cast("long").as("_t"))
    h.crossJoin(broadcast(t))
      .select(col("dow"), col("hod"), col("n"),
        round(col("n").cast("double") / col("_t"), 6).as("share"))
  }

  /** Leaderboard rank movers — the "who's rising" dashboard read:
    * counts per key over the first and second half of the time range
    * (split at the range midpoint so the comparison is self-anchoring),
    * each half ranked, and the rank DELTA emitted. Surfaces movement a
    * raw count delta buries: +500 messages matters at rank 40, not at
    * rank 1.
    *
    * Scale shape: BOTH half-counts come from one conditional aggregate
    * over one scan (the trailingSums discipline) with the midpoint as a
    * broadcast scalar; ranks come from [[ranked]]'s range-partition +
    * zipWithIndex (never a global one-task window); the final join is
    * key-grain. */
  def rankMovers(events: DataFrame, keyCol: String,
                 tsCol: String): DataFrame = {
    val ms = unix_millis(col(tsCol))
    val b = events.agg(((min(ms) + max(ms)) / lit(2L)).cast("long")
      .as("_mid"))
    val c = events.crossJoin(broadcast(b))
      .groupBy(col(keyCol))
      .agg(sum(when(ms <= col("_mid"), 1L).otherwise(0L)).cast("long")
          .as("n_prev"),
        sum(when(ms > col("_mid"), 1L).otherwise(0L)).cast("long")
          .as("n_curr"))
      .localCheckpoint(eager = true) // ranked twice + the final join
    val rp = ranked(c.select(col(keyCol), col("n_prev")), "n_prev", keyCol)
      .select(col(keyCol), col("rank").as("rank_prev"))
    val rc = ranked(c.select(col(keyCol), col("n_curr")), "n_curr", keyCol)
      .select(col(keyCol), col("rank").as("rank_curr"))
    c.join(rp, Seq(keyCol)).join(rc, Seq(keyCol))
      .select(col(keyCol), col("n_prev"), col("n_curr"),
        col("rank_prev"), col("rank_curr"),
        (col("rank_prev") - col("rank_curr")).as("rank_delta"))
  }

  /** RFM segmentation (Hughes 1994, the classic CRM cube): per customer
    * Recency (days since last order, anchored at the corpus max date so
    * the result is deterministic), Frequency (order count), Monetary
    * (lifetime spend, rounded to CENTS before scoring so quintile edges
    * derive from engine-exact inputs — raw double sums would make
    * boundary customers flip on summation order). Each metric scores
    * 1–5 by its own quintile edges — recency REVERSED (recent = 5); a
    * customer strictly above an edge outranks it. Output at segment
    * grain (≤125 rows), not per customer.
    *
    * Scale shape: one agg to customer grain, ONE scalar exact-percentile
    * row broadcast back (the x108 percentile discipline — at customer
    * grain, not event grain), score assignment as a codegen projection,
    * one bounded segment agg. No windows, no global sort, no ntile. */
  def rfmSegments(orders: DataFrame, custCol: String, dateCol: String,
                  priceCol: String): DataFrame = {
    val anchor = orders.agg(max(col(dateCol)).as("_anchor"))
    val c = orders.crossJoin(broadcast(anchor))
      .groupBy(col(custCol))
      .agg(min(datediff(col("_anchor"), col(dateCol))).cast("long")
          .as("_rec"),
        count(lit(1)).cast("long").as("_freq"),
        round(sum(col(priceCol)), 2).as("_mon"))
    def qs(c0: String) =
      expr(s"percentile($c0, array(0.2, 0.4, 0.6, 0.8))")
    val edges = c.agg(qs("_rec").as("_re"), qs("_freq").as("_fe"),
      qs("_mon").as("_me"))
    def score(v: String, e: String): Column =
      (1 to 4).map(i => when(col(v) > element_at(col(e), i), 1L)
        .otherwise(0L)).reduce(_ + _)
    c.crossJoin(broadcast(edges))
      .select(col(custCol), col("_mon"),
        (lit(5L) - score("_rec", "_re")).as("r_score"),
        (lit(1L) + score("_freq", "_fe")).as("f_score"),
        (lit(1L) + score("_mon", "_me")).as("m_score"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).cast("long").as("n_customers"),
        // A segment TOTAL stays on the cent grid (an avg of cent values
        // lands on .xx5 ties that the two engines round differently).
        round(sum(col("_mon")), 2).as("total_monetary"))
  }
}
