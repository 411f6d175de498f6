package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Z-order clustering (operators/ZOrder.scala): the point of the layout is
  * that per-FILE min/max ranges stay narrow in EVERY clustered dimension —
  * that is what lets min/max statistics prune files for predicates on any
  * of them. Pinned against the linear-sort counterexample, whose trailing
  * dimension degenerates to the full domain in every file. */
class ZOrderSpec extends SparkSpec {

  private def perFileAvgRange(path: String): (Double, Double) = {
    val byFile = spark.read.parquet(path)
      .groupBy(input_file_name())
      .agg((max(col("d1")) - min(col("d1"))).as("r1"),
        (max(col("d2")) - min(col("d2"))).as("r2"))
      .agg(avg(col("r1")), avg(col("r2"))).collect()(0)
    (byFile.getDouble(0), byFile.getDouble(1))
  }

  test("clusteredWrite keeps BOTH dims narrow per file; linear sort leaves dim2 at full range") {
    import spark.implicits._
    // A full 64x64 grid: both dimensions uniform on [0, 64).
    val grid = (0L until 4096L).map(i => (i, i % 64, i / 64)).toDF("id", "d1", "d2")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString

    ZOrder.clusteredWrite(grid, Seq(col("d1"), col("d2")), 6, 8, dir + "/z")
    val (z1, z2) = perFileAvgRange(dir + "/z")
    // 8 files = top 3 z-bits fixed per file: d1 keeps 1 high bit (range
    // ~32), d2 keeps 2 (range ~16) on this grid. Loose bounds.
    assert(z1 < 45, s"z-order d1 avg per-file range: $z1")
    assert(z2 < 30, s"z-order d2 avg per-file range: $z2")

    grid.repartitionByRange(8, col("d1")).sortWithinPartitions(col("d1"))
      .write.mode("overwrite").parquet(dir + "/lin")
    val (l1, l2) = perFileAvgRange(dir + "/lin")
    assert(l1 < 16, s"linear d1 avg per-file range: $l1") // leading dim: narrow
    assert(l2 > 55, s"linear d2 avg per-file range: $l2") // trailing dim: full
  }

  test("zValue: hand-computed interleave and input validation") {
    import spark.implicits._
    // d1=0b101 (bits 0,2), d2=0b011 (bits 0,1) at 3 bits →
    // z = d1 bits at even positions {0,4}, d2 bits at odd positions {1,3}
    // = 0b011011 = 27? positions: d1 bit0→pos0 (1), bit1→pos2 (0),
    // bit2→pos4 (1); d2 bit0→pos1 (1), bit1→pos3 (1), bit2→pos5 (0)
    // → 1 + 2 + 8 + 16 = 27.
    val out = Seq((5L, 3L)).toDF("d1", "d2")
      .select(ZOrder.zValue(Seq(col("d1"), col("d2")), 3).as("z"))
      .collect()(0).getLong(0)
    assert(out === 27L)
    assertThrows[IllegalArgumentException] {
      ZOrder.zValue(Seq(col("d1"), col("d2")), 32) // 64 bits > 62
    }
  }
}
