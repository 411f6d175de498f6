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

  test("incremental IVF append: maintained index equals a full rebuild; re-append is a no-op; untouched partitions untouched") {
    import spark.implicits._
    val base = fixture.filter(col("vec_id") < 12) // holds the 4 centroid ids
    val batch = fixture.filter(col("vec_id") >= 12)
    val full = java.nio.file.Files.createTempDirectory("graft-ivffull").toString + "/index"
    val inc = java.nio.file.Files.createTempDirectory("graft-ivfinc").toString + "/index"
    Similarity.buildIvfIndex(fixture, "vec_id", "embedding", 4, full)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", 4, inc)
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", inc)
    def rows(p: String) = spark.read.parquet(p)
      .select(col("vec_id"), col("centroid_id").cast("long"),
        col("embedding").cast("string"))
    // Maintained layout row-identical to the from-scratch build (same
    // frozen centroids because base holds the first 4 ids).
    assertSameRows(rows(full), rows(inc))
    // Idempotent re-ingest: appending the same batch again adds nothing,
    // and leaf dirs of centroids the batch does not touch gain no files.
    val before = spark.read.parquet(inc).count()
    val leafFiles = new java.io.File(inc).listFiles()
      .filter(_.getName.startsWith("centroid_id="))
      .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    Similarity.appendToIvfIndex(batch, "vec_id", "embedding", inc)
    assert(spark.read.parquet(inc).count() === before)
    // An append of a batch touching a single centroid leaves every other
    // partition's file set bit-identical (only-touched-partitions pin).
    val single = Seq((100L, Array.tabulate(4)(j => fixture.collect()
      .find(_.getLong(0) == 0L).get.getSeq[Float](1)(j))))
      .toDF("vec_id", "embedding")
    Similarity.appendToIvfIndex(single, "vec_id", "embedding", inc)
    val after = new java.io.File(inc).listFiles()
      .filter(_.getName.startsWith("centroid_id="))
      .map(d => d.getName -> d.listFiles().map(_.getName).toSet).toMap
    val touched = after.keySet.filter(k => after(k) != leafFiles.getOrElse(k, Set.empty[String]))
    assert(touched.size === 1, s"expected exactly one touched partition, got $touched")
    assert(spark.read.parquet(inc).count() === before + 1)
    // Probe over the maintained index equals the direct IVF answer.
    assertSameRows(
      Similarity.ivfTopK(fixture, "vec_id", "embedding", 0L, 5, 4, 2),
      Similarity.ivfIndexTopK(fixture, "vec_id", "embedding", 0L, 5, 4, 2,
        full))
  }

  test("centroid recovery reads ONLY the sidecar (no layout scan); within-batch duplicate ids collapse") {
    import spark.implicits._
    val idx = java.nio.file.Files.createTempDirectory("graft-ivfsc").toString + "/index"
    Similarity.buildIvfIndex(fixture, "vec_id", "embedding", 4, idx)
    val expected = fixture.orderBy($"vec_id").limit(4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // Gut the layout: delete every parquet data file, keep the sidecar.
    // If recovery touched the index body at all this would throw — the
    // ADVICE r9 pin that the sidecar alone carries the frozen quantizer.
    java.nio.file.Files.walk(java.nio.file.Paths.get(idx)).iterator()
      .forEachRemaining { p =>
        if (p.getFileName.toString.endsWith(".parquet") ||
            p.getFileName.toString.startsWith("part-"))
          java.nio.file.Files.delete(p)
      }
    val (cids, cvecs) = Similarity.indexCentroids(spark, idx, "vec_id", "embedding")
    assert(cids === cids.sorted && cids.toSet === expected.keySet)
    cids.zip(cvecs).foreach { case (cid, v) =>
      assert(v === expected(cid), s"centroid $cid vector must round-trip exactly")
    }
    // Within-batch duplicate ids: a batch carrying the same id twice
    // lands exactly once (ADVICE r9).
    val idx2 = java.nio.file.Files.createTempDirectory("graft-ivfdup").toString + "/index"
    Similarity.buildIvfIndex(fixture.filter($"vec_id" < 12), "vec_id", "embedding", 4, idx2)
    val before = spark.read.parquet(idx2).count()
    val dupBatch = fixture.filter($"vec_id" === 15L)
      .union(fixture.filter($"vec_id" === 15L))
    Similarity.appendToIvfIndex(dupBatch, "vec_id", "embedding", idx2)
    assert(spark.read.parquet(idx2).count() === before + 1,
      "a twice-submitted id must land exactly once")
  }

  test("kMeansUpdate: hand-computed weighted merge; untouched clusters bit-stable; empty batch is a no-op") {
    import spark.implicits._
    // Base: two axis vectors, k=2, 1 round -> centroids are themselves.
    // Batch vector [0.5, 0.5, 0, 0] ties cos to both centroids (0.7071),
    // first-max assigns cluster 1: c1' = ((1+0.5)/2, 0.25, 0, 0) ->
    // c_sum 1.0, drift = 1 - 0.75/sqrt(0.625) = 0.051317. Cluster 2
    // untouched: drift exactly 0, c_sum 1.0.
    val base = Seq(
      (1L, Array(1f, 0f, 0f, 0f)), (2L, Array(0f, 1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val batch = Seq((3L, Array(0.5f, 0.5f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kMeansUpdate(base, batch, "vec_id", "embedding", 2, 1)
      .orderBy(col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, 1.0, 0.051317),
      (2L, 1L, 0L, 1.0, 0.0)))
    // Empty batch: every cluster keeps its centroid, drift 0 everywhere.
    val none = Similarity.kMeansUpdate(base, batch.filter(col("vec_id") < 0),
        "vec_id", "embedding", 2, 1)
      .orderBy(col("cluster_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(none.toSeq === Seq(
      (1L, 1L, 0L, 1.0, 0.0),
      (2L, 1L, 0L, 1.0, 0.0)))
    // Base-population parity: n_base matches kMeansTrain's assignment.
    val trained = Similarity.kMeansTrain(fixture.filter(col("vec_id") < 12),
        "vec_id", "embedding", 4, 2)
      .groupBy(col("cluster_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val upd = Similarity.kMeansUpdate(fixture.filter(col("vec_id") < 12),
        fixture.filter(col("vec_id") >= 12), "vec_id", "embedding", 4, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(upd.filter(_._2 > 0) === trained)
  }

  test("quantizeInt8: hand-computed fixture, zero vector, checksum exactness") {
    import spark.implicits._
    // v = [1, -0.5, 0.25, 0]: scale = 1/127, q = [127, -64, 32, 0]
    // (round(−63.5) = −64 away from zero, round(31.75) = 32).
    val df = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))) // all-zero: q = 0, mse = 0
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val out = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy($"vec_id").collect()
    assert(out(0).getInt(1) === 4)
    assert(out(0).getLong(2) === 127L - 64L + 32L)      // q_sum
    assert(out(0).getLong(3) === 127L + 64L + 32L)      // q_l1
    // Reconstruction error is tiny but nonzero (−0.5 and 0.25 don't land
    // exactly on a grid point); the exact endpoints do not contribute.
    assert(out(0).getDouble(4) > 0 && out(0).getDouble(4) < 20)
    assert(out(1).getInt(1) === 4 && out(1).getLong(2) === 0L &&
      out(1).getLong(3) === 0L && out(1).getDouble(4) === 0.0)
  }

  test("knnJoin probing ALL centroids equals per-query brute-force top-k") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 17 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    // nProbe = nCentroids: no candidate is ever pruned, so the approximate
    // join must coincide with exact brute force for every query.
    val joined = Similarity.knnJoin(vecs, "vec_id", "embedding",
      $"vec_id" % 10 === 0, 5, 4, 4)
    (0L until 40L by 10L).foreach { q =>
      val brute = Similarity.cosineTopK(vecs, "vec_id", "embedding", q, 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      val got = joined.filter($"qid" === q).orderBy($"knn_rank")
        .collect().map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("sim")))
      assert(got.toSeq === brute.toSeq, s"query $q")
    }
  }

  test("knnJoin non-broadcast fallback equals the broadcast path (r6 ask #2)") {
    import spark.implicits._
    val vecs = (0L until 60L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 13 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    // All-corpus self-kNN: the query side IS the corpus.
    val pred = lit(true)
    val bc = Similarity.knnJoin(vecs, "vec_id", "embedding", pred, 3, 4, 2,
      broadcastQueries = Some(true))
    val fb = Similarity.knnJoin(vecs, "vec_id", "embedding", pred, 3, 4, 2,
      broadcastQueries = Some(false))
    assertSameRows(bc.orderBy($"qid", $"knn_rank"), fb.orderBy($"qid", $"knn_rank"))
    // The fallback plan must not broadcast the probe side.
    val plan = fb.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      s"fallback must not broadcast:\n$plan")
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"fallback must shuffle-join on _cid:\n$plan")
  }

  test("knnJoin auto mode size-switches on autoBroadcastJoinThreshold") {
    import spark.implicits._
    val vecs = (0L until 30L).map { i =>
      (i, Array.tabulate(8)(d => math.cos(i * 11 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      // Threshold floored to 1 byte: the auto estimate must pick the
      // shuffle fallback even for this tiny query set...
      spark.conf.set(key, "1")
      val forcedFb = Similarity.knnJoin(vecs, "vec_id", "embedding",
        $"vec_id" % 10 === 0, 3, 4, 2)
      assert(!forcedFb.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      // ...and with the default threshold the same call broadcasts.
      spark.conf.set(key, saved)
      val auto = Similarity.knnJoin(vecs, "vec_id", "embedding",
        $"vec_id" % 10 === 0, 3, 4, 2)
      assert(auto.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
      assertSameRows(auto.orderBy($"qid", $"knn_rank"),
        forcedFb.orderBy($"qid", $"knn_rank"))
    } finally spark.conf.set(key, saved)
  }

  test("hardNegatives: band-filtered per-anchor top-k; self and out-of-band excluded") {
    import spark.implicits._
    val vecs = fixture
    val out = Similarity.hardNegatives(vecs, "vec_id", "embedding",
      Seq(0L, 1L), 3, 0.10, 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // Brute-force expectation per anchor from the same fixture.
    val raw = vecs.collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.indices.foldLeft(0.0)((s, i) => s + a(i).toDouble * b(i).toDouble)
      val na = math.sqrt(a.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      val nb = math.sqrt(b.foldLeft(0.0)((s, x) => s + x.toDouble * x.toDouble))
      dot / (na * nb)
    }
    val expected = Seq(0L, 1L).flatMap { anchor =>
      val qv = raw.find(_._1 == anchor).get._2
      raw.filter(_._1 != anchor)
        .map { case (id, v) =>
          (id, BigDecimal(cos(v, qv)).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble) }
        .filter { case (_, s) => s >= 0.10 && s < 0.95 }
        .sortBy { case (id, s) => (-s, id) }
        .take(3).zipWithIndex
        .map { case ((id, s), i) => (anchor, id, s, (i + 1).toLong) }
    }
    assert(out.toSeq === expected)
    // Every mined similarity sits inside the band.
    assert(out.forall { case (_, _, s, _) => s >= 0.10 && s < 0.95 })
  }

  test("labelOutliers: the planted off-cluster vector ranks first in its label") {
    import spark.implicits._
    // Label 0: vectors near +e1, except vec 99 planted at -e1 (mislabeled).
    // Label 1: a tight cluster near +e2 — no outlier expected to stand out.
    val rows =
      (0L until 8L).map(i => (i, Seq(1.0f, 0.05f * i, 0.0f), 0)) ++
        Seq((99L, Seq(-1.0f, 0.0f, 0.0f), 0)) ++
        (10L until 18L).map(i => (i, Seq(0.0f, 1.0f, 0.03f * i), 1))
    val df = rows.toDF("vec_id", "embedding", "label")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"),
        $"label")
    val out = Similarity.labelOutliers(df, "vec_id", "embedding", "label", 3)
      .collect().map(r => (r.getInt(1), r.getLong(3), r.getLong(0),
        r.getDouble(2)))
    val firstLabel0 = out.find { case (l, rank, _, _) => l == 0 && rank == 1L }
    assert(firstLabel0.get._3 === 99L, "planted mislabel must rank first")
    assert(firstLabel0.get._4 < 0, "anti-aligned vector has negative cosine")
    // 3 per label, ranks dense from 1.
    assert(out.count(_._1 == 0) === 3 && out.count(_._1 == 1) === 3)
    assert(out.filter(_._1 == 1).map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
  }

  test("randomProjection: deterministic signs, norm preserved in expectation, shuffle-free plan") {
    import spark.implicits._
    // Signs are a pure hash function — identical across calls.
    assert(Similarity.rpSigns(4, 8, "t") === Similarity.rpSigns(4, 8, "t"))
    assert(Similarity.rpSigns(4, 8, "t") !== Similarity.rpSigns(4, 8, "u"))
    val df = (0L until 40L).map { i =>
      (i, Array.tabulate(64)(j => (((i * 13 + j * 7) % 17).toFloat - 8f) / 8f))
    }.toDF("vec_id", "embedding")
    val out = Similarity.randomProjection(df, "vec_id", "embedding", 16, 64, "rp")
    val rows = out.collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    // JL concentration: every ratio within a loose band, mean near 1.
    assert(rows.forall { case (_, _, ratio) => ratio > 0.4 && ratio < 1.8 })
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean - 1.0) < 0.25, s"mean ratio $mean")
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("knnDensityOutliers: the planted isolated vector is the least dense") {
    import spark.implicits._
    // 15 vectors in a tight cone around +e1; vec 99 planted anti-aligned.
    val rows = (0L until 15L).map(i => (i, Seq(1.0f, 0.01f * i, 0.0f))) :+
      (99L, Seq(-1.0f, 0.0f, 0.0f))
    val df = rows.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val out = Similarity.knnDensityOutliers(df, "vec_id", "embedding",
      3, 4, 2, 5).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.nonEmpty)
    assert(out.head._1 === 99L, s"planted outlier must rank first: ${out.toSeq}")
    assert(out.head._2 < 0, "anti-aligned vector's 3rd-NN sim is negative")
    // The returned list is ascending in density (knn_sim).
    assert(out.map(_._2).toSeq === out.map(_._2).sorted.toSeq)
  }

  test("standardizeEmbeddings: hand-computed z-scores; constant dim maps to 0") {
    import spark.implicits._
    // dim0 values 0,2,4 → mean 2, σ_pop = sqrt(8/3); dim1 constant 2 → z 0.
    val df = Seq(
      (1L, Seq(0.0f, 2.0f)), (2L, Seq(2.0f, 2.0f)), (3L, Seq(4.0f, 2.0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
    val out = Similarity.standardizeEmbeddings(df, "vec_id", "embedding")
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4)))
    // |z| for vecs 1 and 3 on dim0: 2/sqrt(8/3) = 1.224745.
    assert(out.toSeq === Seq(
      (1L, 2L, 2.0, 1.2247, -0.612372),
      (2L, 2L, 2.8284, 0.0, 0.0),
      (3L, 2L, 4.4721, 1.2247, 0.612372)))
  }

  test("kMeansTrain: planted directions separate perfectly; deterministic repeat") {
    import spark.implicits._
    // Two orthogonal directions with small same-direction jitter; ids
    // interleave the groups so init (first k=2 vectors) seeds one of each.
    val vecs = Seq(
      (0L, Seq(1.0f, 0.02f)), (1L, Seq(0.03f, 1.0f)),
      (2L, Seq(0.9f, 0.01f)), (3L, Seq(0.02f, 1.1f)),
      (4L, Seq(1.1f, 0.03f)), (5L, Seq(0.01f, 0.9f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kMeansTrain(vecs, "vec_id", "embedding", 2, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(0L, 2L, 4L).map(out) === Set(1L)) // x-direction cluster
    assert(Set(1L, 3L, 5L).map(out) === Set(2L)) // y-direction cluster
    // Same constants → bit-identical second run (the oracle contract).
    val again = Similarity.kMeansTrain(vecs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val first = Similarity.kMeansTrain(vecs, "vec_id", "embedding", 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again === first)
  }

  test("labelCompactness: tight label outscores the label with a planted intruder") {
    import spark.implicits._
    // Label 0: three near-identical x-direction vectors. Label 1: two
    // y-direction vectors plus one x-direction intruder — its min_cos
    // must trail label 0's, and the intruder drags mean_cos down.
    val vecs = Seq(
      (0L, 0, Seq(1.0f, 0.0f)), (1L, 0, Seq(0.99f, 0.01f)),
      (2L, 0, Seq(1.01f, -0.01f)),
      (3L, 1, Seq(0.0f, 1.0f)), (4L, 1, Seq(0.02f, 0.98f)),
      (5L, 1, Seq(1.0f, 0.05f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.labelCompactness(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(0)._1 === 3L && out(1)._1 === 3L)
    assert(out(0)._3 > 0.999, s"tight label min_cos ${out(0)._3}")
    assert(out(1)._3 < 0.9, s"intruder label min_cos ${out(1)._3}")
    assert(out(0)._2 > out(1)._2, "tight label has higher mean")
  }

  test("simplifiedSilhouette: separated clusters score near 1, mixed near 0") {
    import spark.implicits._
    // Labels 0/1 are tight, far-apart clusters → silhouette ≈ 1. Label 2
    // sits exactly between its own two members' midpoint and cluster 0's
    // centroid — a poorly separated cluster scores much lower.
    val vecs = Seq(
      (0L, 0, Seq(0.0f, 0.1f)), (1L, 0, Seq(0.0f, -0.1f)),
      (2L, 1, Seq(10.0f, 0.1f)), (3L, 1, Seq(10.0f, -0.1f)),
      (4L, 2, Seq(0.4f, 0.0f)), (5L, 2, Seq(0.6f, 0.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.simplifiedSilhouette(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getAs[Double]("mean_silhouette")).toMap
    assert(out(1) > 0.95, s"far cluster ${out(1)}")
    assert(out(0) > 0.7, s"near-but-separated cluster ${out(0)}")
    assert(out(2) < out(0), s"crowded cluster must score lower ${out(2)}")
  }

  test("mmrRerank: diversity beats raw relevance for the second pick") {
    import spark.implicits._
    // Query +x. Candidates 1 and 2 near-collinear with the query (rel ≈ 1,
    // mutual sim ≈ 1), 3 off-axis (rel 0.6, sim-to-1 ≈ 0.61). At λ = 0.3:
    // mmr(2) = .3·.99995 − .7·.99980 ≈ −0.400;
    // mmr(3) = .3·.6 − .7·.608 ≈ −0.246 → 3 wins despite lower rel.
    // (Pure top-2 — and MMR at high λ — would pick the near-dup 2.)
    val vecs = Seq(
      (0L, 0, Seq(1.0f, 0.0f)),              // query
      (1L, 0, Seq(0.99f, 0.01f)),
      (2L, 0, Seq(0.99f, -0.01f)),
      (3L, 0, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.mmrRerank(vecs, "vec_id", "embedding", 0L, 3, 2, 0.3)
      .orderBy($"rnk").collect().map(_.getLong(1))
    assert(out.toSeq === Seq(1L, 3L))
    // Relevance-heavy λ keeps the plain top-2 — the knob works both ways.
    val rel = Similarity.mmrRerank(vecs, "vec_id", "embedding", 0L, 3, 2, 0.9)
      .orderBy($"rnk").collect().map(_.getLong(1))
    assert(rel.toSeq === Seq(1L, 2L))
  }

  test("medoids: picks the central member, not the synthetic centroid") {
    import spark.implicits._
    // Label 0: members at x = 0, 1, 5 → centroid x = 2, nearest member
    // is id 1 (x=1, dist 1). Label 1: symmetric pair ties on distance →
    // smaller id wins.
    val vecs = Seq(
      (0L, 0, Seq(0.0f, 0.0f)), (1L, 0, Seq(1.0f, 0.0f)),
      (2L, 0, Seq(5.0f, 0.0f)),
      (3L, 1, Seq(0.0f, 2.0f)), (4L, 1, Seq(0.0f, 4.0f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.medoids(vecs, "vec_id", "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(0) === 1L)
    assert(out(1) === 3L) // tie at dist 1 → smaller vec_id
  }

  test("pcaTopComponent: recovers a planted dominant axis") {
    import spark.implicits._
    // Variance 25 along dim 0 (values ±5), variance 0.01 along dim 1:
    // PC1 must align with dim 0, labels split by sign of their dim-0
    // coordinate, eigenvalue ≈ sample variance of dim 0.
    val vecs = Seq(
      (0L, 0, Seq(5.0f, 0.1f)), (1L, 0, Seq(5.0f, -0.1f)),
      (2L, 1, Seq(-5.0f, 0.1f)), (3L, 1, Seq(-5.0f, -0.1f)))
      .toDF("vec_id", "label", "embedding")
    val out = Similarity.pcaTopComponent(vecs, "vec_id", "embedding", "label", 20)
      .collect().map(r => r.getInt(0) ->
        ((r.getAs[Double]("mean_pc1"), r.getAs[Double]("eigenvalue")))).toMap
    // Sign fix: largest |component| is positive → PC1 = +x.
    assert(math.abs(out(0)._1 - 5.0) < 1e-3, s"label 0 ${out(0)._1}")
    assert(math.abs(out(1)._1 + 5.0) < 1e-3, s"label 1 ${out(1)._1}")
    // var of {5,5,-5,-5} (sample, n-1) = 100/3 ≈ 33.3333
    assert(math.abs(out(0)._2 - 100.0 / 3) < 0.02, s"eigenvalue ${out(0)._2}")
  }

  test("knnLabelConsistency: minority-label vector is inconsistent, cluster members vote with it") {
    import spark.implicits._
    // Three label-0 vectors cluster near (1,0); one label-1 sits at (0,1).
    // Full kNN (4 centroids cover the corpus): each label-0 member's
    // neighbors are 2 same + 1 different -> strict majority agrees
    // (purity 2/3); the label-1 vector's neighbors are all label-0.
    val emb = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(0.8f, 0.2f), 0),
      (4L, Array(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnLabelConsistency(
        emb, "vec_id", "embedding", "label", 10, 16, 4)
      .orderBy($"label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 3L, 3L, 1.0, 0.6667),
      (1L, 1L, 0L, 0.0, 0.0)))
  }

  test("knnMeanAveragePrecision: perfect clusters score 1; late-ranked mates score by position") {
    import spark.implicits._
    // Two tight clusters of 3: each member's 2 label-mates outrank both
    // cross-cluster vectors at every k ≥ 2 → AP@k = 1 for everyone.
    val emb = Seq(
      (1L, Array(1f, 0f), 0), (2L, Array(0.99f, 0.01f), 0),
      (3L, Array(0.98f, 0.02f), 0),
      (4L, Array(0f, 1f), 1), (5L, Array(0.01f, 0.99f), 1),
      (6L, Array(0.02f, 0.98f), 1)).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnMeanAveragePrecision(
        emb, "vec_id", "embedding", "label", 2, 6, 6)
      .orderBy($"label").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((0L, 3L, 1.0), (1L, 3L, 1.0)))
    // Positional case: both label-0 queries see their single mate rank
    // LAST of the 3 neighbors (k=3).
    val pos = Seq(
      (1L, Array(1f, 0f), 0),
      (2L, Array(0.5f, 0.866f), 0), // mate, but farther than both others
      (3L, Array(0.9f, 0.1f), 1),
      (4L, Array(0.95f, 0.05f), 1)).toDF("vec_id", "embedding", "label")
    val p = Similarity.knnMeanAveragePrecision(
        pos, "vec_id", "embedding", "label", 3, 4, 4)
      .orderBy($"label").collect().head
    // query 1 (at 0°): neighbors by angle are 4 (3°), 3 (6.3°), 2 (60°)
    // → the mate ranks 3rd, AP = (1·(1/3))/min(1,3) = 1/3. query 2
    // (at 60°): neighbors 3 (53.7°), 4 (57°), 1 (60°) → mate ranks 3rd
    // too, AP = 1/3. Class MAP = 0.3333.
    assert(p.getLong(0) === 0L && p.getDouble(2) === 0.3333)
  }

  test("truncationRecall: signal-bearing prefix keeps recall 1; constant prefix loses it") {
    import spark.implicits._
    // Clusters live entirely in dims 1-2; dims 3-4 are constant noise.
    // Truncating to d=2 preserves every neighborhood → recall = 1.
    val emb = Seq(
      (1L, Array(1f, 0f, 0.5f, 0.5f)), (2L, Array(0.99f, 0.01f, 0.5f, 0.5f)),
      (3L, Array(0.98f, 0.02f, 0.5f, 0.5f)),
      (4L, Array(0f, 1f, 0.5f, 0.5f)), (5L, Array(0.01f, 0.99f, 0.5f, 0.5f)),
      (6L, Array(0.02f, 0.98f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    val out = Similarity.truncationRecall(emb, "vec_id", "embedding",
        Seq(2), 2, 6, 6).collect().head
    assert((out.getLong(0), out.getLong(1), out.getDouble(2))
      === (2L, 6L, 1.0))
    // Flip the layout: signal in dims 3-4, first two constant — the
    // truncated space is degenerate and recall collapses below 1.
    val flipped = emb.select($"vec_id",
      org.apache.spark.sql.functions.reverse($"embedding").as("embedding"))
    val bad = Similarity.truncationRecall(flipped, "vec_id", "embedding",
        Seq(2), 2, 6, 6).collect().head
    assert(bad.getDouble(2) < 1.0)
  }

  test("ivfBalanceAudit: uniform buckets score 1.0; a hot bucket inflates both reads") {
    import spark.implicits._
    // Two centroids (ids 1-2 at right angles), four vectors split 2/2 →
    // perfectly balanced: imbalance = 2·(2²+2²)/4² = 1, max/mean = 1.
    val even = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val e = Similarity.ivfBalanceAudit(even, "vec_id", "embedding", 2)
      .collect().head
    assert((e.getLong(0), e.getLong(1), e.getLong(2), e.getDouble(3),
      e.getDouble(4)) === (2L, 4L, 2L, 1.0, 1.0))
    // All four near centroid 1 → sizes (4, ...wait centroid 2 is its
    // own nearest) → sizes {1: 3+1=... vectors 1,3,4 near (1,0) and 2
    // alone: sizes 3 and 1 → imbalance = 2·(9+1)/16 = 1.25,
    // max/mean = 3·2/4 = 1.5.
    val skew = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.9f, 0.1f)), (4L, Array(0.95f, 0.05f)))
      .toDF("vec_id", "embedding")
    val s = Similarity.ivfBalanceAudit(skew, "vec_id", "embedding", 2)
      .collect().head
    assert((s.getLong(2), s.getDouble(3), s.getDouble(4))
      === (3L, 1.5, 1.25))
  }

  test("kCenterCoreset: greedy picks the farthest corner each round") {
    import spark.implicits._
    // Seed = smallest id (1, at (1,0)). Farthest from it is (0,1) or
    // (-1,0)? d(v2=(0,1)) = 1; d(v4=(-1,0)) = 2 -> picks v4. Round 3:
    // min-dist to {v1,v4}: v2 (0,1): min(1,1)=1; v3 (.7,.7): min(1-.7071,
    // 1+.7071)=.2929 -> picks v2. dist trajectory [0, 2, 1].
    val emb = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0f, 1f)),
      (3L, Array(0.7f, 0.7f)), (4L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.kCenterCoreset(emb, "vec_id", "embedding", 3)
      .orderBy($"rnk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 1L, 0.0), (2L, 4L, 2.0), (3L, 2L, 1.0)))
  }

  test("pqTrainEncode: separable clusters converge to zero reconstruction error, shared codes per cluster") {
    import spark.implicits._
    // 2 subspaces of dim 2; the first 4 vectors are the 4 distinct points
    // (so init = one centroid per cluster) and every later vector repeats
    // one of them: Lloyd is already at the fixed point -> err = 0 and
    // cluster members share both codes.
    val pts = Seq(
      Array(1f, 0f, 0f, 1f), Array(0f, 1f, 1f, 0f),
      Array(5f, 5f, 5f, 5f), Array(-5f, 0f, 0f, -5f))
    val emb = (0 until 12).map(i => (i.toLong, pts(i % 4)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqTrainEncode(emb, "vec_id", "embedding", 2, 4, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.forall(_._4 === 0.0))
    val byCluster = out.groupBy(_._1 % 4).values
    assert(byCluster.forall(g => g.map(t => (t._2, t._3)).distinct.size == 1))
    // 4 distinct points -> 4 distinct full codes.
    assert(out.map(t => (t._2, t._3)).distinct.length === 4)
  }

  test("pqTrainEncode: codes stay in 1..k and err is the concatenated-codeword L2 on sf0.001") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val out = Similarity.pqTrainEncode(emb, "vec_id", "embedding", 2, 4, 2)
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 4 &&
      r.getLong(2) >= 1 && r.getLong(2) <= 4))
    assert(out.forall(_.getDouble(3) >= 0.0))
  }

  test("PQ code table: maintained equals frozen-codebook re-encode; re-append/dup no-ops; ADC over table equals in-line ADC") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val base = emb.filter($"vec_id" < 250)
    val rest = emb.filter($"vec_id" >= 250)
    val tbl = java.nio.file.Files.createTempDirectory("graft-pqtbl").toString + "/codes"
    Similarity.buildPqCodeTable(base, "vec_id", "embedding", 2, 4, 2, tbl)
    Similarity.appendToPqCodeTable(rest, "vec_id", "embedding", tbl)
    def codes(df: org.apache.spark.sql.DataFrame) = df
      .select($"vec_id", $"code_0".cast("long"), $"code_1".cast("long"))
    // Maintained table ≡ the whole corpus encoded against the FROZEN
    // (sidecar-recovered) codebooks — the append never re-cells anything.
    val (sub, cbs) = Similarity.readPqCodebooks(spark, tbl)
    assertSameRows(
      codes(spark.read.parquet(tbl)),
      codes(Similarity.encodeCodes(emb, "vec_id", "embedding", sub, cbs)))
    // Idempotent re-ingest + within-batch duplicates: no new rows.
    val n = spark.read.parquet(tbl).count()
    Similarity.appendToPqCodeTable(rest, "vec_id", "embedding", tbl)
    Similarity.appendToPqCodeTable(rest.union(rest), "vec_id", "embedding", tbl)
    assert(spark.read.parquet(tbl).count() === n)
    // ADC over the maintained table ≡ the in-line pqAdcTopK when trained
    // on the same corpus (here: table built over ALL vectors).
    val tblAll = java.nio.file.Files.createTempDirectory("graft-pqall").toString + "/codes"
    Similarity.buildPqCodeTable(emb, "vec_id", "embedding", 2, 4, 2, tblAll)
    assertSameRows(
      Similarity.pqAdcTopKOverTable(emb, "vec_id", "embedding", 7L, 15, tblAll),
      Similarity.pqAdcTopK(emb, "vec_id", "embedding", 2, 4, 2, 7L, 15))
  }

  test("pqAdcJoin with a single query equals pqAdcTopK; every query ranks its own code cell first") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    // Single-query equivalence: the batched join restricted to one query
    // must reproduce the scalar ADC ranking exactly.
    val single = Similarity.pqAdcJoin(emb, "vec_id", "embedding",
        $"vec_id" === 7L, 2, 4, 2, 15)
      .orderBy($"adc_rank")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    val scalar = Similarity.pqAdcTopK(emb, "vec_id", "embedding", 2, 4, 2,
        7L, 15)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(single.toSeq === scalar.toSeq)
    // Self-row convention: each query's rank-1 hit has the minimum ADC of
    // its own code cell — in particular its own distance-to-cell, so its
    // own adc value appears at rank 1 (ties break by id).
    val joined = Similarity.pqAdcJoin(emb, "vec_id", "embedding",
      $"vec_id" % 50 === 0, 2, 4, 2, 3)
    val top1 = joined.filter($"adc_rank" === 1)
      .select($"qid", $"adc_d2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val selfD = joined.filter($"qid" === $"vec_id")
      .select($"qid", $"adc_d2").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    selfD.foreach { case (q, d) =>
      assert(top1(q) <= d, s"query $q rank-1 ADC must not exceed its own")
    }
  }

  test("embeddingDrift: hand-computed per-dim means, shift, and smoothed PSI; identical dims drift zero") {
    import spark.implicits._
    // dim 0 drifts hard (ref −1.0/0.0 vs cur 1.0/0.5 — disjoint bins),
    // dim 1 is identical on both sides. Bins via edges
    // (−.5,−.25,0,.25,.5): ref dim0 → {bin0, bin3}, cur dim0 → {bin5}².
    // Smoothed p/q at n=2: hit bins (c+.5)/5, misses 0.1 →
    // psi = 2·(0.1−0.3)ln(1/3) + (0.5−0.1)ln 5 = 1.08322 (6 dp).
    val ref = Seq((1L, Seq(-1.0f, 0.1f)), (2L, Seq(0.0f, 0.1f)))
      .toDF("vec_id", "embedding")
    val cur = Seq((3L, Seq(1.0f, 0.1f)), (4L, Seq(0.5f, 0.1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingDrift(ref, cur, "embedding",
        Seq(-0.5, -0.25, 0.0, 0.25, 0.5))
      .orderBy($"dim").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out(0) === ((0L, 2L, 2L, -0.5, 0.75, 1.25, 1.08322)))
    assert(out(1) === ((1L, 2L, 2L, 0.1, 0.1, 0.0, 0.0)))
  }

  test("pqAdcRefine: full-corpus candidates recover the exact L2 top-k; refine ranks by exact distance") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val n = emb.count().toInt
    // candK = corpus size ⇒ every row is a candidate and the refine rank
    // IS the exact L2 ranking — the equivalence contract of the refine
    // step (ADC only decides WHICH rows reach the re-ranker).
    val refined = Similarity.pqAdcRefine(emb, "vec_id", "embedding",
        $"vec_id" === 7L, 2, 4, 2, n, 10)
      .orderBy($"refine_rank").collect()
      .map(r => (r.getLong(1), r.getDouble(3)))
    val q = emb.where($"vec_id" === 7L).select($"embedding").head
      .getSeq[Float](0)
    val brute = emb.select($"vec_id",
        round(aggregate(zip_with($"embedding", typedlit(q),
          (x, y) => (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
          lit(0.0), (acc, v) => acc + v), 6).as("d2"))
      .orderBy($"d2".asc, $"vec_id".asc).limit(10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(refined.toSeq === brute.toSeq)
    // The query's own row is its exact-L2 rank-1 at distance 0 — true
    // even when ADC quantization reorders the tail.
    assert(refined.head === ((7L, 0.0)))
    // Tight candidate budgets stay internally consistent: refine_rank is
    // dense 1..topK and non-decreasing in exact_d2 per query.
    val tight = Similarity.pqAdcRefine(emb, "vec_id", "embedding",
        $"vec_id" % 50 === 0, 2, 4, 2, 12, 5)
      .orderBy($"qid", $"refine_rank").collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3), r.getInt(4)))
    tight.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._4).toSeq === (1 to rows.length).toSeq)
      assert(rows.map(_._3).toSeq === rows.map(_._3).sorted.toSeq)
      // Every refined row came from the ADC candidate set.
      assert(rows.forall(_._2 <= 12))
    }
  }

  test("ivfRecallCurve: recall monotone in nProbe, exactly 1.0 at probe-all, scan_frac = p/nCentroids") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 17 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    val out = Similarity.ivfRecallCurve(vecs, "vec_id", "embedding",
        $"vec_id" % 10 === 0, 5, 4, Seq(1, 2, 4))
      .orderBy($"n_probe").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2), r.getDouble(3)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 4L))
    assert(out.map(_._2).toSeq === Seq(0.25, 0.5, 1.0))
    assert(out.forall(_._3 === 4L)) // 4 queries
    // Nested probe sets make the recall provably monotone, and probing
    // every centroid IS the exact kNN.
    assert(out.map(_._4).toSeq === out.map(_._4).sorted.toSeq)
    assert(out.last._4 === 1.0)
  }

  test("pqRefineRecallCurve: recall monotone in candK, exactly 1.0 at corpus coverage") {
    import spark.implicits._
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 17 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    val out = Similarity.pqRefineRecallCurve(vecs, "vec_id", "embedding",
        $"vec_id" % 10 === 0, 2, 4, 2, Seq(5, 20, 40), 5)
      .orderBy($"cand_k").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.map(_._1).toSeq === Seq(5, 20, 40))
    assert(out.forall(_._2 === 4L)) // 4 queries
    // Nested candidate sets ⇒ recall is monotone; candK = corpus means
    // the refine IS the exact top-k ⇒ recall exactly 1.0.
    assert(out.map(_._4).toSeq === out.map(_._4).sorted.toSeq)
    assert(out.last._4 === 1.0)
    assert(out.map(_._5).toSeq === Seq(0.125, 0.5, 1.0))
  }

  test("pqRefineRecallCurve: shared encode equals an independent pqAdcRefine at EVERY budget") {
    import spark.implicits._
    // The r11 rewrite trains/encodes ONCE and filters the max-budget ADC
    // ranking per level; nested candidate sets + deterministic codebooks
    // must make each level's hits EQUAL to a from-scratch pqAdcRefine at
    // that budget (the per-level output-equality contract of the shared
    // path). Uses the same deterministic corpus as the monotone test.
    val vecs = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 17 + d).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<float>").as("embedding"))
      .localCheckpoint(true)
    val pred = $"vec_id" % 10 === 0
    val candKs = Seq(3, 8, 20)
    val curve = Similarity.pqRefineRecallCurve(vecs, "vec_id", "embedding",
        pred, 2, 4, 2, candKs, 5)
      .orderBy($"cand_k").collect()
      .map(r => (r.getInt(0), r.getLong(2)))
    // Independent reference: pqAdcRefine at candK = corpus IS the exact
    // top-k (pinned above); hits per budget from a from-scratch refine.
    val exact = Similarity.pqAdcRefine(vecs, "vec_id", "embedding", pred,
        2, 4, 2, 40, 5)
      .select($"qid", $"vec_id").localCheckpoint(true)
    val want = candKs.map { ck =>
      (ck, Similarity.pqAdcRefine(vecs, "vec_id", "embedding", pred,
          2, 4, 2, ck, 5)
        .select($"qid", $"vec_id")
        .join(exact, Seq("qid", "vec_id"), "left_semi").count())
    }
    assert(curve.toSeq === want)
  }

  test("mutualNnMatches: reciprocal pairs survive, a hub's one-directional match does not") {
    import spark.implicits._
    // Two tight pairs (1,2) and (3,4) on the axes plus diagonal hub 5:
    // 5's top-1 is 2, but 2's top-1 is 1 — no reciprocity, so only the
    // two genuine pairs emerge. nProbe = nCentroids → exact kNN.
    val emb = Seq(
      (1L, Seq(1f, 0f)), (2L, Seq(2f, 0.1f)),
      (3L, Seq(0f, 1f)), (4L, Seq(0.1f, 2f)),
      (5L, Seq(1f, 1f))).toDF("vec_id", "embedding")
    val out = Similarity.mutualNnMatches(emb, "vec_id", "embedding", 2, 2)
      .orderBy($"id_a").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L), (3L, 4L)))
    assert(out.forall(_._3 > 0.99))
  }

  test("pqAdcTopK: cluster mates of the query share its code cell at ADC 0; ranking is monotone") {
    import spark.implicits._
    // Same separable fixture as the encode test: the query (vec_id 0)
    // and its repeats sit at ADC = 0 (query == its codeword); every
    // other cell scores strictly higher; ids break ties.
    val pts = Seq(
      Array(1f, 0f, 0f, 1f), Array(0f, 1f, 1f, 0f),
      Array(5f, 5f, 5f, 5f), Array(-5f, 0f, 0f, -5f))
    val emb = (0 until 12).map(i => (i.toLong, pts(i % 4)))
      .toDF("vec_id", "embedding")
    val out = Similarity.pqAdcTopK(emb, "vec_id", "embedding", 2, 4, 2, 0L, 12)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.length === 12)
    // First three rows: the query's cluster {0, 4, 8} at distance 0.
    assert(out.take(3).map(_._1).toSeq === Seq(0L, 4L, 8L))
    assert(out.take(3).forall(_._2 === 0.0))
    // ADC never decreases down the ranking.
    assert(out.sliding(2).forall(p => p(0)._2 <= p(1)._2))
  }
  test("graphAnnFrontier: a connected graph reaches exact recall; disconnected components cap recall at the reachable side; visited counts are the touched-node budget") {
    import spark.implicits._
    // Two tight clusters with near-orthogonal separation: A = {0,1,2},
    // B = {10,11,12}. graphM=2 keeps only within-cluster edges (cluster
    // mates always outrank cross-cluster cosine), so the kNN graph has
    // two components and the min-id entry vertex (0 ∈ A) can never
    // reach B: B-queries score recall 0, A-queries 1 — mean 0.5 — and
    // every search visits exactly the 3 reachable A vectors.
    val emb = Seq(
      (0L, Array(1f, 0.00f)), (1L, Array(1f, 0.01f)),
      (2L, Array(1f, 0.02f)), (10L, Array(0.00f, 1f)),
      (11L, Array(0.01f, 1f)), (12L, Array(0.02f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.graphAnnFrontier(emb, "vec_id", "embedding",
        2, Seq(3), 2, 2, 6, 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq((3L, 6L, 0.5, 3.0)))
    // Fully-probed complete graph: every vector reachable in one hop
    // from the entry → the beam answer IS the exact answer (recall 1)
    // and the whole corpus is visited.
    val one = Seq(
      (0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.8f, 0.3f)), (3L, Array(0.6f, 0.5f)),
      (4L, Array(0.4f, 0.8f)))
      .toDF("vec_id", "embedding")
    val full = Similarity.graphAnnFrontier(one, "vec_id", "embedding",
        4, Seq(5), 2, 2, 5, 16, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(full.toSeq === Seq((5L, 5L, 1.0, 5.0)))
  }
  test("knnShapley: the nearest correct neighbor carries the whole value at k=1; test set bounded by construction; efficiency axiom on the registry slice") {
    import spark.implicits._
    // Test point = id 0 (lowest residue-permuted hash: h(id) = id·2135
    // mod 9973 for small ids, so h(0)=0 < h(1)=2135 < ...); train ids
    // 1-3 rank by cosine as 1 (same label), 2, 3 (other label). k=1
    // recurrence: s_(3) = 0/3, s_(2) = s_(3) + (0-0) = 0,
    // s_(1) = s_(2) + (1-0)*min(1,1)/1 = 1.
    val emb = Seq(
      (0L, Array(1f, 0f), 7), (1L, Array(1f, 0.1f), 7),
      (2L, Array(0.5f, 1f), 3), (3L, Array(0f, 1f), 3))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.knnShapley(emb, "vec_id", "embedding", "label",
        1, 1)
      .orderBy($"vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 1.0), (2L, 0.0), (3L, 0.0)))
    // BOUNDED BY CONSTRUCTION (r12 verdict #3): however large the
    // corpus, the held-out side is exactly min(testN, n) rows — a
    // limit(), not a fraction — and it is deterministic (same set on
    // re-evaluation).
    val full = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ts = Similarity.knnShapleyTestSet(full, "vec_id", 7)
    assert(ts.count() === 7)
    val ids1 = ts.select($"vec_id").collect().map(_.getLong(0)).toSet
    val ids2 = Similarity.knnShapleyTestSet(full, "vec_id", 7)
      .select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(ids1 === ids2 && ids1.size === 7)
    // Efficiency axiom on real data: the Shapley values sum (per test
    // point) to the k-NN soft accuracy - same-label fraction of the
    // test point's top-k. Tolerance covers the 6 dp output rounding.
    val sv = Similarity.knnShapley(full, "vec_id", "embedding", "label",
      10, 20)
    val sumShap = sv.agg(sum($"shapley")).collect().head.getDouble(0)
    val test = Similarity.knnShapleyTestSet(full, "vec_id", 20)
      .select($"vec_id".as("tid"), $"embedding".as("tv"), $"label".as("ty"))
    val train = full.join(broadcast(test.select($"tid")),
      $"vec_id" === $"tid", "left_anti")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"tid")
      .orderBy(round(Similarity.cosine($"embedding", $"tv"), 6).desc,
        $"vec_id")
    val acc = train.crossJoin(broadcast(test))
      .withColumn("_r", row_number().over(w))
      .where($"_r" <= 10)
      .agg(avg(when($"label" === $"ty", 1.0).otherwise(0.0)))
      .collect().head.getDouble(0)
    assert(math.abs(sumShap - acc) < 5e-4, s"sum=$sumShap acc=$acc")
  }
}
