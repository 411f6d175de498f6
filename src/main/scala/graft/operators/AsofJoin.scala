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
  * running window per key ordered by (ts, tag) that carries the right ROW
  * forward as a single struct (`last(struct, ignoreNulls)`); then keep only
  * left rows. One shuffle on the key, one linear scan per partition, output
  * exactly |left| rows. The naive alternative — a range-condition join —
  * degenerates to broadcast-nested-loop (O(|L|·|R|) per key) and is never
  * acceptable at 100 TB. Ties (`right.ts == left.ts`) match, because the
  * right row sorts before the left row at equal ts (tag asc).
  *
  * The carried unit is one STRUCT, not per-column lasts: per-column
  * `last(ignoreNulls)` would conflate a legitimately-NULL right value with
  * "no right row", resurrecting a stale value from an older row — and could
  * stitch fields of DIFFERENT right rows into one output row. The struct is
  * null only on left rows, so the latest right row is carried atomically,
  * NULL fields included (spec-pinned in JoinOpsSpec).
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
    val passCols = leftCols.filterNot(c => keys.contains(c) || c == tsCol)
    val collisions = (rightTsAs +: valueCols).intersect(passCols)
    require(collisions.isEmpty,
      s"as-of output columns collide with left columns: ${collisions.mkString(", ")}")

    val asofStruct = struct(col(tsCol).as(rightTsAs) +: valueCols.map(col): _*)
    val taggedRight = right.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(asofStruct.as("_asof")) ++
        passCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        lit(0).as("_tag"): _*)
    val structType = taggedRight.schema("_asof").dataType
    val taggedLeft = left.select(
      (keys.map(col) :+ col(tsCol)) ++
        Seq(lit(null).cast(structType).as("_asof")) ++
        passCols.map(col) :+
        lit(1).as("_tag"): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("_tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("_asof", last(col("_asof"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        (rightTsAs +: valueCols).map(c => col("_asof").getField(c).as(c)): _*)
  }
}
