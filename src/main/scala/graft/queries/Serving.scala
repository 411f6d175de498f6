package graft.queries

import org.apache.spark.sql.DataFrame
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

  /** Q13: global rank assignment — row_number over (metric DESC, key ASC),
    * the PHP client-side sort+rank (MainController.php:273-288).
    *
    * Scale-safe: a bare `row_number().over(Window.orderBy(...))` funnels the
    * whole frame through ONE task. Instead: range-partition on the sort key
    * (so partition i holds ranks strictly before partition i+1), sort within
    * partitions, and `zipWithIndex` — which assigns contiguous global indices
    * from per-partition counts without ever collecting the data. Every stage
    * is parallel; the only driver-side state is one count per partition. */
  def ranked(leaderboard: DataFrame, valueCol: String, tieBreak: String): DataFrame = {
    val spark = leaderboard.sparkSession
    val sortCols = Seq(col(valueCol).desc, col(tieBreak).asc)
    val sorted = leaderboard
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val withRank = sorted.rdd.zipWithIndex.map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1).toInt)
    }
    spark.createDataFrame(withRank,
      sorted.schema.add("rank", org.apache.spark.sql.types.IntegerType))
  }

  /** Q15: MAX-per-group with share-of-total percentage vs SUM(MAX(..))
    * (MainController.php:335-361, 496-507). */
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
}
