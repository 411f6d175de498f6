package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Dedup, Sketch}

/** KMV bottom-k sketch (functions/BottomKSketch.scala, operators/Sketch):
  * the mergeable aggregate must equal the shuffle-everything windowed
  * formulation on any partitioning — merge-order independence is the
  * property that makes a sketch a sketch. */
class SketchSpec extends SparkSpec {

  /** Reference formulation: distinct (group, hash) pairs → per-group
    * window top-k — same math, no sketch. */
  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val h = Dedup.shingleHash(concat(lit("kmv:"), col("v").cast("string")))
    val w = Window.partitionBy(col("g")).orderBy(col("_h").asc)
    df.select(col("g"), h.as("_h")).distinct()
      .withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_kept"), max(col("_h")).as("kth_min"))
      .withColumn("n_est",
        when(col("n_kept") < k, col("n_kept"))
          .otherwise(expr(s"${(k - 1).toLong * 4294967296L}L div kth_min")))
  }

  test("kmvDistinct equals the windowed formulation, independent of partitioning") {
    import spark.implicits._
    // 3 groups with 300/150/10 distinct values, plus heavy duplication.
    val rows = (1 to 300).map(i => ("a", i.toLong)) ++
      (1 to 150).flatMap(i => Seq(("b", i.toLong), ("b", i.toLong))) ++
      (1 to 10).map(i => ("c", i.toLong))
    val df = rows.toDF("g", "v")
    val sk = Sketch.kmvDistinct(df, Seq("g"), "v", 64)
    assertSameRows(sk, windowed(df, 64))
    assertSameRows(Sketch.kmvDistinct(df.repartition(13), Seq("g"), "v", 64), sk)
    val byG = sk.collect().map(r => r.getString(0) -> r).toMap
    // Below k: exact. Above k: estimate within a loose 2x of truth.
    assert(byG("c").getLong(1) === 10L && byG("c").getLong(3) === 10L)
    assert(byG("a").getLong(1) === 64L)
    val estA = byG("a").getLong(3)
    assert(estA > 150 && estA < 600, s"KMV estimate for 300 distinct: $estA")
    val estB = byG("b").getLong(3)
    assert(estB > 75 && estB < 300, s"KMV estimate for 150 distinct: $estB")
  }

  test("property: fold+merge over ANY partitioning equals bottom-k of the whole set") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val s = new graft.functions.BottomKSketch(8)
    // Small value domain → duplicates are common; random split into
    // sub-lists models arbitrary Spark partitionings and merge orders.
    val genParts: Gen[List[List[Long]]] =
      Gen.listOf(Gen.listOf(Gen.choose(0L, 60L)))
    val prop = Prop.forAll(genParts) { parts =>
      val merged = parts.map(p => p.foldLeft(s.zero)(s.reduce))
        .foldLeft(s.zero)(s.merge)
      merged.toSeq == parts.flatten.distinct.sorted.take(8)
    } && Prop.forAll(genParts) { parts =>
      val sks = parts.map(p => p.foldLeft(s.zero)(s.reduce))
      val fwd = sks.foldLeft(s.zero)(s.merge)
      val rev = sks.reverse.foldLeft(s.zero)(s.merge)
      fwd.toSeq == rev.toSeq // merge-order independence, explicitly
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("BottomKSketch reduce/merge: sorted, distinct, capped") {
    val s = new graft.functions.BottomKSketch(4)
    val buf = Seq(5L, 3L, 9L, 3L, 1L, 7L).foldLeft(s.zero)(s.reduce)
    assert(buf.toSeq === Seq(1L, 3L, 5L, 7L)) // 9 evicted, dup 3 collapsed
    val other = Seq(2L, 5L, 100L).foldLeft(s.zero)(s.reduce)
    assert(s.merge(buf, other).toSeq === Seq(1L, 2L, 3L, 5L))
    assert(s.merge(s.zero, other).toSeq === other.toSeq)
    assert(s.merge(other, s.zero).toSeq === other.toSeq)
  }

  test("property: CMS fold+merge over ANY partitioning — exact totals, never underestimates") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val depth = 3; val width = 16
    val s = new graft.functions.CountMinSketch(depth, width)
    def posOf(v: Long): Array[Int] =
      (0 until depth).map(i => (((v * 31 + i * 7) % width + width) % width).toInt).toArray
    def estimate(sk: Array[Long], v: Long): Long =
      posOf(v).zipWithIndex.map { case (p, i) => sk(i * width + p) }.min
    val genParts: Gen[List[List[Long]]] =
      Gen.listOf(Gen.listOf(Gen.choose(0L, 40L)))
    val prop = Prop.forAll(genParts) { parts =>
      val merged = parts.map(p => p.map(posOf).foldLeft(s.zero)(s.reduce))
        .foldLeft(s.zero)(s.merge)
      val flat = parts.flatten
      val truth = flat.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
      // merge-order invariance; every estimate >= truth; totals conserved
      val rev = parts.reverse.map(p => p.map(posOf).foldLeft(s.zero)(s.reduce))
        .foldLeft(s.zero)(s.merge)
      val mFin = s.finish(merged)
      s.finish(rev).toSeq == mFin.toSeq &&
        truth.forall { case (v, c) => estimate(mFin, v) >= c } &&
        (0 until depth).forall(i =>
          (0 until width).map(w => mFin(i * width + w)).sum == flat.size.toLong)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.toString)
  }

  test("cmsHeavyHitters is exact even when the sketch is saturated") {
    import spark.implicits._
    // 3 heavy values among 200 light ones; a deliberately TINY matrix
    // (2x8) guarantees collisions — false candidates must be cut by the
    // exact verify, true heavies must always survive (no underestimates).
    val rows = Seq.fill(40)("hot-a") ++ Seq.fill(25)("hot-b") ++
      Seq.fill(12)("hot-c") ++ (1 to 200).map(i => s"cold-$i")
    val df = rows.toDF("v").repartition(9)
    val naive = df.groupBy(col("v")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 10)
    assertSameRows(Sketch.cmsHeavyHitters(df, "v", 10L, 2, 8), naive)
    assertSameRows(Sketch.cmsHeavyHitters(df, "v", 10L), naive)
    // Degenerate inputs: empty frame, threshold above every count.
    assert(Sketch.cmsHeavyHitters(df.limit(0), "v", 1L).count() === 0L)
    assert(Sketch.cmsHeavyHitters(df, "v", 1000L).count() === 0L)
  }

  /** Brute-force HLL register table: per (group, bucket) the max rank,
    * computed with plain JVM integer ops — the ground truth the relational
    * formulation must hit bit-for-bit. */
  private def hllTruth(rows: Seq[(String, Long)], p: Int): Map[(String, Long), Int] = {
    val rem = 32 - p
    rows.distinct
      .map { case (g, v) =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"hll:$v".getBytes("UTF-8"))
          .take(4).map("%02x".format(_)).mkString
        val h = java.lang.Long.parseLong(hex, 16)
        val bucket = h >>> rem
        val w = h & ((1L << rem) - 1)
        val rank = if (w == 0) rem + 1
        else rem + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        ((g, bucket), rank)
      }
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).max }
  }

  test("hllDistinct registers match a JVM brute force; estimate is partitioning-independent and accurate") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("a", i.toLong)) ++
      (1 to 40).flatMap(i => Seq(("b", i.toLong), ("b", i.toLong))) ++
      (1 to 2000).map(i => ("c", i.toLong))
    val df = rows.toDF("g", "v")
    val hll = Sketch.hllDistinct(df, Seq("g"), "v", 8)
    // Merge-order independence: any partitioning, same registers/estimate.
    assertSameRows(Sketch.hllDistinct(df.repartition(17), Seq("g"), "v", 8), hll)
    // Register summary vs brute force: buckets hit and global max rank.
    val truth = hllTruth(rows, 8)
    val byG = hll.collect().map(r => r.getString(0) -> r).toMap
    for (g <- Seq("a", "b", "c")) {
      val regs = truth.collect { case ((gg, _), rk) if gg == g => rk }
      assert(byG(g).getLong(1) === regs.size.toLong, s"v_buckets($g)")
      assert(byG(g).getLong(2) === regs.max.toLong, s"max_rank($g)")
    }
    // Accuracy: HLL at m=256 has ~6.5% relative error; assert a loose 3σ.
    for ((g, n) <- Seq(("a", 500.0), ("b", 40.0), ("c", 2000.0))) {
      val est = byG(g).getDouble(3)
      assert(math.abs(est - n) / n < 0.25, s"estimate($g)=$est truth=$n")
    }
  }

  test("hll register merge: any corpus split merges to the one-shot table (max associativity)") {
    import spark.implicits._
    val rows = (1 to 800).map(i => ("g", (i % 300).toLong))
    val df = rows.toDF("g", "v")
    val oneShot = Sketch.hllDistinct(df, Seq("g"), "v", 8)
    // Three different split points, including an empty side.
    for (cut <- Seq(0, 113, 800)) {
      val (a, b) = (df.filter(col("v") < cut), df.filter(col("v") >= cut))
      val merged = Sketch.hllEstimate(
        Sketch.hllMergeRegisters(
          Sketch.hllRegisters(a, Seq("g"), "v", 8),
          Sketch.hllRegisters(b, Seq("g"), "v", 8), Seq("g")),
        Seq("g"), 8)
      assertSameRows(merged, oneShot)
    }
    // Idempotence: merging a table with itself changes nothing.
    val regs = Sketch.hllRegisters(df, Seq("g"), "v", 8)
    assertSameRows(
      Sketch.hllEstimate(Sketch.hllMergeRegisters(regs, regs, Seq("g")), Seq("g"), 8),
      oneShot)
  }

  test("percentile_approx at exact accuracy equals the discrete quantile (x63's oracle contract)") {
    import spark.implicits._
    // GK with accuracy >> n stores every value, so the answer must be the
    // DISCRETE quantile: the smallest element whose rank covers ceil(p·n)
    // — the definition DuckDB's quantile_disc uses. Pinned on even and
    // odd n and across a repartition (sketch MERGE path).
    for (n <- Seq(100, 101); parts <- Seq(1, 7)) {
      val df = (1 to n).map(_.toLong).toDF("v").repartition(parts)
      val got = df.agg(
        expr("percentile_approx(v, array(0.5, 0.9, 0.99), 1000000)"))
        .head().getSeq[Long](0)
      val expect = Seq(0.5, 0.9, 0.99).map(p =>
        math.ceil(p * n).toLong) // sorted values are 1..n ⇒ element = rank
      assert(got === expect, s"n=$n parts=$parts")
    }
  }

  test("kmvSetOps: identical groups estimate intersect = union; sub-k groups are exact") {
    import spark.implicits._
    // Groups a and b see the SAME 30 values (< k=64 → sketches are the
    // full hash sets): union estimate is the exact 30, every merged hash
    // is in both sketches, so intersect_est = union_est = 30.
    val df = (1 to 30).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
      .toDF("g", "v")
    val out = graft.operators.Sketch.kmvSetOps(df, "g", "v", 64).collect().head
    assert(out.getAs[Long]("n_kept") === 30L)
    assert(out.getAs[Long]("union_est") === 30L)
    assert(out.getAs[Long]("n_both") === 30L)
    assert(out.getAs[Long]("intersect_est") === 30L)
  }

  test("kmvSetOps: disjoint groups estimate zero intersection") {
    import spark.implicits._
    val df = ((1 to 40).map(i => ("a", i.toLong)) ++
      (1000 to 1039).map(i => ("b", i.toLong))).toDF("g", "v")
    val out = graft.operators.Sketch.kmvSetOps(df, "g", "v", 64).collect().head
    assert(out.getAs[Long]("n_both") === 0L)
    assert(out.getAs[Long]("intersect_est") === 0L)
    // 80 distinct values, sketch capped at k=64.
    assert(out.getAs[Long]("n_kept") === 64L)
  }
}
