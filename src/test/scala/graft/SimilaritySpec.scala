package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Plan-shape and equivalence pins for the similarity operators — above
  * all that the materialized IVF index (x7b) really probes via partition
  * pruning, which is the entire point of materializing it. */
class SimilaritySpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    (0 until 20).map { i =>
      (i.toLong, Array.tabulate(4)(j => ((i * 7 + j * 3) % 10 - 5).toFloat / 5f))
    }.toDF("vec_id", "embedding")
  }

  test("materialized IVF probe scans ONLY probed centroids (PartitionFilters)") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString + "/index"
    Similarity.buildIvfIndex(fixture, "vec_id", "embedding", 4, idx)
    val probe = Similarity.ivfIndexProbe(spark, idx, "vec_id", "embedding",
      Seq(0L, 2L))
    val plan = probe.queryExecution.executedPlan.toString
    // The isin literal must land in PartitionFilters (metadata pruning at
    // the scan), NOT in PushedFilters/post-scan Filter.
    val scanLine = plan.linesIterator
      .find(_.contains("PartitionFilters")).getOrElse(plan)
    assert(scanLine.contains("centroid_id"),
      s"probe scan must prune on centroid_id:\n$plan")
    // And the pruning is real: the probed frame never contains an
    // unprobed centroid even though the index has 4.
    val seen = probe.select(col("centroid_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(seen.subsetOf(Set(0L, 2L)))
    val allCids = spark.read.parquet(idx)
      .select(col("centroid_id").cast("long"))
      .distinct().collect().map(_.getLong(0)).toSet
    assert(allCids.size > 2, "fixture must produce more centroids than probed")
  }

  test("index-backed IVF top-k equals the direct (non-materialized) IVF top-k") {
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfeq").toString + "/index"
    val direct = Similarity.ivfTopK(fixture, "vec_id", "embedding", 0L, 5, 4, 2)
    val indexed = Similarity.ivfIndexTopK(fixture, "vec_id", "embedding",
      0L, 5, 4, 2, idx)
    assertSameRows(direct, indexed)
  }
}
