package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.operators.Maintenance

/** Reader-safe compaction (VERDICT r6 ask #3): the swap must keep the
  * table root resolvable at every instant — the failure mode being killed
  * is a concurrent `spark.read.parquet(root)` dying with "Path does not
  * exist" during the old root delete/rename window. */
class MaintenanceSpec extends SparkSpec {

  private def fragmented(path: String, nFiles: Int = 8) = {
    import spark.implicits._
    (0 until 200).map(i => (i.toLong, s"t${i % 4}", i % 10))
      .toDF("id", "kind", "v")
      .repartition(nFiles)
      .write.partitionBy("kind").mode("overwrite").parquet(path)
  }

  test("compaction preserves data and leaves one file per leaf") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    fragmented(path)
    val before = spark.read.parquet(path)
      .groupBy("kind").agg(count("*").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Maintenance.compactPartitioned(spark, path, Seq("kind"))
    val after = spark.read.parquet(path)
    val counts = after.groupBy("kind").agg(count("*").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == before)
    val files = after.select(input_file_name().as("f"), col("kind"))
      .groupBy("kind").agg(countDistinct(col("f")).as("nf")).collect()
    assert(files.forall(_.getLong(1) == 1L), files.mkString(","))
  }

  test("a reader mid-swap never loses the table root (r6 ask #3)") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    fragmented(path)
    val allKinds = Set("t0", "t1", "t2", "t3")
    var probes = 0
    Maintenance.midSwapProbe = { inFlight =>
      probes += 1
      // The probe fires in the worst instant: the old leaf is staged out,
      // the new one not yet renamed in. The read must still succeed...
      val seen = spark.read.parquet(path)
        .select("kind").distinct().collect().map(_.getString(0)).toSet
      // ...missing at most the one in-flight leaf.
      val missing = allKinds.diff(seen)
      assert(missing.subsetOf(Set(inFlight.getName.stripPrefix("kind="))),
        s"mid-swap read lost non-in-flight partitions: $missing")
    }
    try Maintenance.compactPartitioned(spark, path, Seq("kind"))
    finally Maintenance.midSwapProbe = _ => ()
    assert(probes == 4, s"probe should fire once per leaf, fired $probes")
    assert(spark.read.parquet(path).count() == 200)
  }

  test("epoch markers ride the swap and increase across compactions") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact3").toString + "/t"
    fragmented(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    def epochs: Set[String] = {
      val out = Set.newBuilder[String]
      val it = fs.listFiles(new Path(path), true)
      while (it.hasNext) {
        val n = it.next().getPath.getName
        if (n.startsWith("_epoch_")) out += n
      }
      out.result()
    }
    Maintenance.compactPartitioned(spark, path, Seq("kind"))
    assert(epochs == Set("_epoch_0"))
    Maintenance.compactPartitioned(spark, path, Seq("kind"))
    // Second pass supersedes: each leaf carries the newer marker.
    assert(epochs == Set("_epoch_1"))
    assert(spark.read.parquet(path).count() == 200)
  }

  test("crashed-run staging leftovers are swept and invisible to readers") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact4").toString + "/t"
    fragmented(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    // Simulate a crash mid-swap: a retired leaf left behind.
    val retired = new Path(path, ".compact_retired_0_kind=t9")
    fs.mkdirs(retired)
    // Dot-prefixed ⇒ partition discovery ignores it.
    assert(!spark.read.parquet(path).select("kind").distinct()
      .collect().map(_.getString(0)).contains("t9"))
    Maintenance.compactPartitioned(spark, path, Seq("kind"))
    assert(!fs.exists(retired), "sweep must remove crashed-run leftovers")
    assert(spark.read.parquet(path).count() == 200)
  }

  test("snapshotDiff: added/removed/changed by content hash, unchanged dropped") {
    import spark.implicits._
    val oldSnap = Seq((1L, "same"), (2L, "before"), (3L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((1L, "same"), (2L, "after"), (4L, "fresh"))
      .toDF("doc_id", "text")
    val out = Maintenance.snapshotDiff(oldSnap, newSnap, "doc_id", "text")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2) == null, r.getString(3) == null))
    // doc 1 unchanged → absent; 2 changed (both hashes); 3 removed
    // (new_hash null); 4 added (old_hash null).
    assert(out.toSeq === Seq(
      (2L, "changed", false, false),
      (3L, "removed", false, true),
      (4L, "added", true, false)))
    // Identical snapshots diff to empty.
    assert(Maintenance.snapshotDiff(oldSnap, oldSnap, "doc_id", "text")
      .count() === 0L)
  }

  test("datasetCard: one row per column with exact null/distinct accounting") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some(10L)),
      (2L, Some("a"), None),
      (3L, None, Some(10L)),
      (4L, Some("b"), None))
      .toDF("id", "s", "v")
    val out = Maintenance.datasetCard(df, Seq("id", "s", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // Ordered by col_name; distinct excludes nulls (SQL semantics).
    assert(out.toSeq === Seq(
      ("id", 4L, 0L, 4L),
      ("s", 4L, 1L, 2L),
      ("v", 4L, 2L, 1L)))
  }

  test("histogram: hand-computed bins, top edge folds into last bin, degenerate group maps to bin 0") {
    import spark.implicits._
    // Group a spans [0, 10] with 2 bins (width 5): values 0,4.9 → bin 0;
    // 5,9,10 → bin 1 (10 is the top edge, folded). Group b is constant.
    val df = Seq(
      ("a", 0.0), ("a", 4.9), ("a", 5.0), ("a", 9.0), ("a", 10.0),
      ("b", 3.0), ("b", 3.0)).toDF("g", "v")
    val out = Maintenance.histogram(df, Seq("g"), "v", 2)
      .orderBy($"g", $"bin").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("a", 0L, 2L), ("a", 1L, 3L), ("b", 0L, 2L)))
    // Bin counts always cover every row.
    assert(out.map(_._3).sum === 7L)
  }

  test("equiHeightHistogram: near-equal bucket counts on uniform data; long tail isolated where equal width collapses") {
    import spark.implicits._
    // 1..100 uniform in 4 buckets → exactly 25 per bucket.
    val unif = (1 to 100).map(_.toDouble).toDF("v")
    val out = Maintenance.equiHeightHistogram(unif, "v", 4)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, 25L, 1.0, 25.0), (2L, 25L, 26.0, 50.0),
      (3L, 25L, 51.0, 75.0), (4L, 25L, 76.0, 100.0)))
    // Long tail: 99 small values + one huge. Equal height puts the
    // outlier alone at the top; every bucket still non-empty.
    val tail = ((1 to 99).map(_.toDouble / 100) :+ 1e9).toDF("v")
    val ht = Maintenance.equiHeightHistogram(tail, "v", 4)
      .orderBy($"bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(ht.length === 4 && ht.map(_._2).sum === 100L)
    assert(ht.last._2 <= 26L, "tail bucket stays small")
  }

  test("quantileDrift: exact discrete quantiles per side, deltas signed") {
    import spark.implicits._
    val oldDf = (1L to 100L).toDF("v")
    val newDf = (1L to 100L).map(_ + 10L).toDF("v") // uniform +10 shift
    val out = Maintenance.quantileDrift(oldDf, newDf, "v", Seq(0.5, 0.9))
      .orderBy($"p").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Discrete quantile of 1..100 at p = ceil(p*n): 50, 90.
    assert(out.toSeq === Seq((0.5, 50L, 60L, 10L), (0.9, 90L, 100L, 10L)))
  }

  test("psi: symmetric mirrored groups, smoothing keeps empty bins finite") {
    import spark.implicits._
    // Two mirrored groups around one edge: a = 3 low / 1 high, b = 1 low /
    // 3 high. Global is 4/4, so both PSIs equal the same hand-computed
    // value: (0.7-0.5)ln(1.4) + (0.3-0.5)ln(0.6) = 0.169460 (6 dp).
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 11.0),
      ("b", 1.0), ("b", 11.0), ("b", 12.0), ("b", 13.0)).toDF("g", "v")
    val out = Maintenance.psi(df, "g", "v", Seq(10.0))
      .orderBy($"g").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq === Seq(("a", 0.16946), ("b", 0.16946)))
    // A bin empty in one group AND in the global tail stays finite.
    val sparse = Seq(("a", 1.0), ("a", 2.0), ("b", 15.0), ("b", 25.0))
      .toDF("g", "v")
    val s = Maintenance.psi(sparse, "g", "v", Seq(10.0, 20.0))
      .collect().map(_.getDouble(1))
    assert(s.length === 2 && s.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("welchTTest: hand-computed symmetric two-group case; tiny groups emit NULL") {
    import spark.implicits._
    // a = {1,2,3} vs rest b = {11,12,13}: t = −10/√(2/3) = −12.2474,
    // df = (2/3)²/((1/9)/2·2) = 4. Group b mirrors with +t.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 11L), ("b", 12L), ("b", 13L)).toDF("g", "v")
    val out = graft.operators.Maintenance.welchTTest(df, "g", "v")
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(("a", 3L, -12.2474, 4.0), ("b", 3L, 12.2474, 4.0)))
    // A 1-row group (or 1-row complement) has no variance → NULL stats.
    val tiny = Seq(("c", 5L), ("d", 6L), ("d", 7L)).toDF("g", "v")
    val t2 = graft.operators.Maintenance.welchTTest(tiny, "g", "v")
      .orderBy($"g").collect()
    assert(t2.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("spearman: perfect monotone gives ±1; ties use average ranks; constants emit NULL") {
    import spark.implicits._
    // Group a: y strictly increases with x → rho = 1 exactly (monotone
    // but NONLINEAR: Pearson on raw values would be < 1). Group b: y
    // strictly decreases → −1.
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 10.0), ("a", 3L, 100.0),
      ("b", 1L, 3.0), ("b", 2L, 2.0), ("b", 3L, 1.0)).toDF("g", "x", "y")
    val out = graft.operators.Maintenance.spearman(df, "g", "x", "y")
      .orderBy($"g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(("a", 3L, 1.0), ("b", 3L, -1.0)))
    // Hand-computed tied case (the MaintenanceSpec x=[1,2,2,3],
    // y=[.1,.1,.2,.3] classic): average ranks rx=[1,2.5,2.5,4],
    // ry=[1.5,1.5,3,4] → rho = 0.8333.
    val tied = Seq(("t", 1L, 0.1), ("t", 2L, 0.1), ("t", 2L, 0.2),
      ("t", 3L, 0.3)).toDF("g", "x", "y")
    val r = graft.operators.Maintenance.spearman(tied, "g", "x", "y")
      .collect().head
    assert(r.getLong(1) === 4L && r.getDouble(2) === 0.8333)
    // A constant column has zero rank variance → NULL, not NaN.
    val const = Seq(("c", 1L, 5.0), ("c", 2L, 5.0)).toDF("g", "x", "y")
    val c = graft.operators.Maintenance.spearman(const, "g", "x", "y")
      .collect().head
    assert(c.isNullAt(2))
  }

  test("anovaF: hand-computed three-group case; equal means give F=0; constant table NULLs") {
    import spark.implicits._
    // Groups {1,2,3}, {2,3,4}, {3,4,5}: grand mean 3, SSB = 3·(1+0+1) = 6,
    // SSW = 2+2+2 = 6 → F = (6/2)/(6/6) = 3, eta² = 0.5.
    val df = Seq(("a", 1L), ("a", 2L), ("a", 3L), ("b", 2L), ("b", 3L),
      ("b", 4L), ("c", 3L), ("c", 4L), ("c", 5L)).toDF("g", "v")
    val r = graft.operators.Maintenance.anovaF(df, "g", "v").collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5)) === (3L, 9L, 6.0, 6.0, 3.0, 0.5))
    // Identical groups: SSB = 0 → F = 0, eta² = 0.
    val eq = Seq(("a", 1L), ("a", 3L), ("b", 1L), ("b", 3L)).toDF("g", "v")
    val e = graft.operators.Maintenance.anovaF(eq, "g", "v").collect().head
    assert(e.getDouble(4) === 0.0 && e.getDouble(5) === 0.0)
    // All-constant table: zero within AND total variance → NULL F and eta².
    val const = Seq(("a", 7L), ("b", 7L)).toDF("g", "v")
    val c = graft.operators.Maintenance.anovaF(const, "g", "v").collect().head
    assert(c.isNullAt(4) && c.isNullAt(5))
  }

  test("kendallTauB: known small cases with and without ties; all-tied emits NULL") {
    import spark.implicits._
    // x=[1,2,3], y=[1,3,2]: C=2, D=1, no ties → tau = 1/3 = 0.3333.
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("a", 3L, 2.0))
      .toDF("g", "x", "y")
    val r = graft.operators.Maintenance.kendallTauB(df, "g", "x", "y")
      .collect().head
    assert(r.getLong(1) === 3L && r.getDouble(2) === 0.3333)
    // Tied case x=[1,1,2,2], y=[1,2,1,2]: C=2 (cross pairs agreeing),
    // D=1... hand-check: pairs with x1<x2: (1,1)-(2,1) y: 1→1 tie? values
    // y=1 vs 1 tie → 0; (1,1)-(2,2): +1; (1,2)-(2,1): −1; (1,2)-(2,2) y
    // 2→2 → 0. S = 0. n0 = 6, n1 = 2 (two x-tie pairs), n2 = 2 →
    // tau_b = 0/4 = 0.
    val tied = Seq(("t", 1L, 1.0), ("t", 1L, 2.0), ("t", 2L, 1.0),
      ("t", 2L, 2.0)).toDF("g", "x", "y")
    val t = graft.operators.Maintenance.kendallTauB(tied, "g", "x", "y")
      .collect().head
    assert(t.getDouble(2) === 0.0)
    // A constant x column ties EVERY pair on x → denominator 0 → NULL.
    val const = Seq(("c", 1L, 1.0), ("c", 1L, 2.0)).toDF("g", "x", "y")
    val c = graft.operators.Maintenance.kendallTauB(const, "g", "x", "y")
      .collect().head
    assert(c.isNullAt(2))
  }

  test("lDiversityAudit: homogeneous sensitive values flagged, diverse groups pass") {
    import spark.implicits._
    // Group a: 3 rows, 3 distinct sources (diverse). Group b: 3 rows, all
    // one source (risky). Group c: 2 rows, 2 sources (diverse at l=2).
    val df = Seq(
      ("a", "s1"), ("a", "s2"), ("a", "s3"),
      ("b", "s1"), ("b", "s1"), ("b", "s1"),
      ("c", "s1"), ("c", "s2")).toDF("qid", "src")
    val out = Maintenance.lDiversityAudit(df, Seq("qid"), "src", 2)
      .collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.toSeq === Seq(
      ("b", 3L, 1L, 1), ("c", 2L, 2L, 0), ("a", 3L, 3L, 0)))
  }

  test("contributionCap: heavy user clamped, light users untouched") {
    import spark.implicits._
    // User 1 posts 5 times in group g (cap 3 bites), user 2 twice; group h
    // has one post each from users 1 and 3.
    val df = (Seq.fill(5)((1L, "g")) ++ Seq.fill(2)((2L, "g")) ++
      Seq((1L, "h"), (3L, "h"))).toDF("uid", "grp")
    val out = Maintenance.contributionCap(df, "uid", "grp", 3L)
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("g", 7L, 5L, 2L), ("h", 2L, 2L, 2L)))
  }

  test("benfordAudit: hand-built digits, sub-1 values dropped, expectation column exact") {
    import spark.implicits._
    // 19.5, 150.0, 1.0 → digit 1 (x3); 25.0, 2.0 → digit 2 (x2);
    // 0.5 drops (no first significant digit at >= 1); -30.0 → |.| → 3.
    val df = Seq(19.5, 150.0, 1.0, 25.0, 2.0, 0.5, -30.0)
      .map(("g", _)).toDF("grp", "v")
    val out = Maintenance.benfordAudit(df, "grp", "v")
      .orderBy($"fd").collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getAs[Double]("observed_p"),
        r.getAs[Double]("benford_p")))
    assert(out.map(x => (x._1, x._2)).toSeq === Seq((1, 3L), (2, 2L), (3, 1L)))
    assert(out.head._3 === 0.5)      // 3 of 6 kept rows
    assert(out.head._4 === 0.301)    // log10(2)
    assert(out(2)._4 === 0.1249)     // log10(4/3)
  }

  test("momentsProfile: symmetric data has zero skew; uniform kurtosis is -1.2") {
    import spark.implicits._
    // {1..5} each once: mean 3, population var 2, skew 0 (symmetry),
    // excess kurtosis = m4c/v² − 3 = (34/5)/4 − 3 = −1.3 for this
    // 5-point uniform lattice.
    val df = (1 to 5).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Maintenance.momentsProfile(df, "grp", "v").collect().head
    assert(out.getAs[Long]("n") === 5L)
    assert(out.getAs[Double]("mean") === 3.0)
    assert(out.getAs[Double]("sd") === 1.4142)
    assert(out.getAs[Double]("skewness") === 0.0)
    assert(out.getAs[Double]("excess_kurtosis") === -1.3)
  }

  test("hillTailIndex: exact geometric tail gives the analytic alpha") {
    import spark.implicits._
    // x_(i) = 2^(k-i) for i = 1..k (top-k of a geometric tail):
    // ln(x_(i)/x_(k)) = (k-i)·ln2, sum over i<k = ln2·k(k-1)/2,
    // alpha = (k-1)/(ln2·k(k-1)/2) = 2/(k·ln2). k=5 → 0.5771.
    val xs = (1 to 5).map(i => (math.pow(2.0, 5 - i), i.toLong)) ++
      Seq((0.5, 99L), (0.25, 100L)) // below top-5: must be ignored
    val df = xs.toDF("x", "id")
    val out = graft.operators.Maintenance.hillTailIndex(df, "x", "id", 5)
      .collect().head
    assert(out.getAs[Long]("k") === 5L)
    assert(out.getAs[Double]("hill_alpha") === 0.5771)
    assert(out.getAs[Double]("x_max") === 16.0)
  }

  test("winsorize: fences clamp the tails, counts and means are hand-checked") {
    import spark.implicits._
    // Values 1..10 in one group, p10/p90 interpolated fences = 1.9 / 9.1:
    // one row clips low (1), one clips high (10);
    // winsorized mean = (1.9 + 2..9 + 9.1)/10 = 5.5.
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Maintenance.winsorize(df, "grp", "v", 0.1, 0.9).collect().head
    assert(out.getAs[Double]("lo") === 1.9)
    assert(out.getAs[Double]("hi") === 9.1)
    assert(out.getAs[Long]("n_clip_lo") === 1L)
    assert(out.getAs[Long]("n_clip_hi") === 1L)
    assert(out.getAs[Double]("mean_raw") === 5.5)
    assert(out.getAs[Double]("mean_winsor") === 5.5) // symmetric clip
  }

  test("giniConcentration: equal shares give 0, single dominator approaches 1") {
    import spark.implicits._
    // Group "eq": 4 users × 5 rows each → perfect equality, G = 0.
    // Group "skew": users 1-3 post once, user 4 posts 97 times →
    // G = 2·(1·1+2·1+3·1+4·97)/(4·100) − 5/4 = 788/400 − 1.25 = 0.72.
    val rows = (for { u <- 1L to 4L; _ <- 1 to 5 } yield (u, "eq")) ++
      Seq((1L, "skew"), (2L, "skew"), (3L, "skew")) ++
      Seq.fill(97)((4L, "skew"))
    val out = Maintenance.giniConcentration(rows.toDF("uid", "grp"), "grp", "uid")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("gini")).toMap
    assert(out("eq") === 0.0)
    assert(out("skew") === 0.72)
  }

  test("referentialIntegrity: orphans, nulls, and coverage are all counted") {
    import spark.implicits._
    // Children: two rows hit parent 10, one hits the MISSING parent 99
    // (orphan), one has a null key. Parents 10 and 20 exist; only 10 is
    // referenced.
    val child = Seq(Some(10L), Some(10L), Some(99L), None).toDF("fk")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = Maintenance.referentialIntegrity(Seq(
      Maintenance.FkRelation("child.fk->parent", child, "fk", parent, "pk")))
      .collect().head
    assert(out.getAs[String]("relation") === "child.fk->parent")
    assert(out.getAs[Long]("child_rows") === 4L)
    assert(out.getAs[Long]("null_keys") === 1L)
    assert(out.getAs[Long]("orphan_rows") === 1L)
    assert(out.getAs[Long]("distinct_child_keys") === 2L)
    assert(out.getAs[Long]("parents_referenced") === 1L)
  }

  test("referentialIntegrity: duplicate parent keys never inflate child counts") {
    import spark.implicits._
    // A parent table with duplicate keys (denormalized dim): the audit
    // joins DISTINCT parents, so child rows must not multiply.
    val child = Seq(1L, 1L, 2L).toDF("fk")
    val parent = Seq(1L, 1L, 1L, 2L).toDF("pk")
    val out = Maintenance.referentialIntegrity(Seq(
      Maintenance.FkRelation("r", child, "fk", parent, "pk"))).collect().head
    assert(out.getAs[Long]("child_rows") === 3L)
    assert(out.getAs[Long]("orphan_rows") === 0L)
    assert(out.getAs[Long]("parents_referenced") === 2L)
  }

  test("tClosenessAudit: opposite-extreme groups score the hand EMD, a global-shaped group scores 0") {
    import spark.implicits._
    // Groups a/b sit at opposite ends of a 2-bucket axis (global 50/50):
    // each is EMD 0.5 from the global. Group c mirrors the global mix
    // exactly -> 0. Widths/caps: bucket = min(floor(v/10), 1).
    val df = (Seq.fill(4)(("a", 0L)) ++ Seq.fill(4)(("b", 15L)) ++
      Seq(("c", 0L), ("c", 15L), ("c", 3L), ("c", 12L)))
      .toDF("q", "v")
    val out = Maintenance.tClosenessAudit(df, "q", "v", 10.0, 2)
      .orderBy($"q").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSeq === Seq(("a", 0.5), ("b", 0.5), ("c", 0.0)))
  }

  test("tClosenessAudit: zero-count buckets still drag the running cumulative (gap group)") {
    import spark.implicits._
    // 3 buckets; group g = (1/2, 0, 1/2), global = (3/8, 2/8, 3/8):
    // cum diffs at boundaries 0,1 are +1/8 and -1/8 ->
    // EMD = (1/8 + 1/8) / 2 = 1/8 — only correct if bucket 1's zero
    // count actually enters the cumulative.
    val df = (Seq(("g", 0L), ("g", 25L)) ++
      Seq(("h", 0L), ("h", 15L), ("h", 25L), ("h", 5L), ("h", 12L), ("h", 22L)))
      .toDF("q", "v")
    val out = Maintenance.tClosenessAudit(df, "q", "v", 10.0, 3)
      .where($"q" === "g").collect().head
    assert(math.abs(out.getDouble(1) - 0.125) < 1e-6)
  }

  test("skewDiagnostics: hand-computed counts-of-counts, discrete quantiles, entropy, salt factor") {
    import spark.implicits._
    // keys: a x5, b x2, c x2, d x1 -> n_keys 4, n_rows 10, max 5.
    // counts-of-counts sorted [(1,1),(2,2),(5,1)]; p50 target ceil(2)=2 ->
    // first cum>=2 is count 2; p99 target ceil(3.96)=4 -> count 5.
    // entropy = -(1*.1 ln .1 + 2*.2 ln .2 + 1*.5 ln .5) = 1.220607.
    // salt = ceil(max/mean) = ceil(5/(10/4)) = 2.
    val df = (Seq.fill(5)("a") ++ Seq.fill(2)("b") ++ Seq.fill(2)("c") ++
      Seq("d")).toDF("k")
    val r = Maintenance.skewDiagnostics(df, "k").collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((4L, 10L, 5L)))
    assert(r.getDouble(3) === 0.5)
    assert((r.getLong(4), r.getLong(5)) === ((2L, 5L)))
    assert(r.getDouble(6) === 1.220607)
    assert(r.getLong(7) === 2L)
  }
  test("isolationDepth: a lone sign-cell point isolates at level 1; duplicates never isolate") {
    import spark.implicits._
    // dim-0 signs: ids 1-3 positive, id 9 negative -> with tree 0 level 0
    // splitting on some hashed dim, use a direct construction: vectors
    // differing ONLY in early split dims. Tree t level l splits on
    // (7t + 13l + 3) % 64; tree 0 level 0 -> dim 3, level 1 -> dim 16.
    // id 9 is alone on the negative side of dim 3 in EVERY tree whose
    // first split hits dim 3 -> its min_depth is small; ids 1 and 2 are
    // byte-identical vectors -> they can NEVER isolate (depth = 10 in
    // every tree).
    val base = Array.fill(64)(1f)
    val neg = base.clone(); neg(3) = -1f; neg(16) = -1f; neg(29) = -1f
    val emb = Seq(
      (1L, base, 0), (2L, base.clone(), 0), (3L, {
        val v = base.clone(); v(16) = -1f; v }, 0),
      (9L, neg, 1)).toDF("vec_id", "embedding", "label")
    val out = graft.operators.Maintenance.isolationDepth(emb, "vec_id",
        "embedding", "label", 8, 10, 50)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // duplicates: never isolated in any tree.
    assert(out(1L) === ((10L, 10.0)))
    assert(out(2L) === ((10L, 10.0)))
    // the deviant points isolate strictly earlier on average.
    assert(out(9L)._2 < 10.0 && out(3L)._2 < 10.0)
    assert(out(9L)._1 >= 1L)
  }
}
