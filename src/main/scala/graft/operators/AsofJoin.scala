package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the LATEST right row
  * with `right.ts <= left.ts` on the same key — the time-series enrichment
  * primitive ("the stats in effect at this instant"). The reference's
  * dashboard approximates this per-request with a scalar subquery
  * (cumulative base before a window start, MainController.php:50-58); as a
  * whole-column operator it needs a real as-of join, which Spark has no
  * built-in for.
  *
  * Scale design — NO join at all: tag both sides, UNION them, and run ONE
  * running window per key ordered by (ts, tag) that carries the right side's
  * values forward (`last(..., ignoreNulls)`); then keep only left rows. One
  * shuffle on the key, one linear scan per partition, output exactly
  * |left| rows. The naive alternative — a range-condition join — degenerates
  * to broadcast-nested-loop (O(|L|·|R|) per key) and is never acceptable at
  * 100 TB. Ties (`right.ts == left.ts`) match, because the right row sorts
  * before the left row at equal ts (tag asc).
  */
object AsofJoin {

  /** @param left       point rows; must contain `keys` and `tsCol`
    * @param right      versioned rows; must contain `keys`, `tsCol`, `valueCols`
    * @param rightTsAs  output column carrying the matched right row's ts
    *                   (null when no right row is at-or-before the left ts) */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, valueCols: Seq[String],
                   rightTsAs: String = "asof_ts"): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightTypes = valueCols.map(c => c -> right.schema(c).dataType).toMap
    val tsType = right.schema(tsCol).dataType

    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(col(tsCol).cast(tsType).as(rightTsAs)) ++
        valueCols.map(col) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_tag"): _*)
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(lit(null).cast(tsType).as(rightTsAs)) ++
        valueCols.map(c => lit(null).cast(rightTypes(c)).as(c)) ++
        leftCols.filterNot(c => keys.contains(c) || c == tsCol).map(col) :+
        lit(1).as("_tag"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = (rightTsAs +: valueCols).foldLeft(taggedRight.unionByName(taggedLeft)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_tag") === 1)
      .select(leftCols.map(col) ++ (rightTsAs +: valueCols).map(col): _*)
  }
}
