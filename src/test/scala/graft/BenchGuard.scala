package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** sf0.1 runtime pin for the heavy families (VERDICT r6 ask #5, widened
  * per r9 ask #7) — catches an ALGORITHMIC regression (lost prefix
  * filter, lost exact-dup collapse, lost endpoint pruning, lost
  * localCheckpoint) in a dev run before the driver bench sees it. Test
  * scope, `Test/runMain graft.BenchGuard` — minutes at sf0.1, so not part
  * of the sbt test suite; run it after touching Dedup.scala (and after
  * touching the pair scorers or the co-occurrence family).
  *
  * Budget: 2× the frozen per-query min from BASELINE_local.json —
  * loose enough that contention cannot double a min-of-3 on a warm JVM,
  * tight enough that an algorithmic loss lands outside it (the built-in
  * negative probe demonstrates this every run by timing a deliberately
  * unpruned x6 twin against the same budget: measured 2.3× the pruned
  * runtime at sf0.1, versus ≤1.2× run-to-run noise on mins).
  *
  * Beyond the per-entry budgets, two self-testing probes (r9 asks #5/#7):
  *
  *  - SKEW probe: the quadratic-bounded co-occurrence family's documented
  *    100 TB guard is per-user contribution capping
  *    (Graph.cooccurrencePmi's scaladoc; Sampling.capPerGroup). The probe
  *    plants ONE hot user with 10 000 distinct items — a 5·10⁷-pair
  *    expansion nothing at sf0.1 produces naturally — and requires the
  *    capped pipeline to stay within budget while the UNCAPPED run busts
  *    it (detector teeth). The pathological items are single-user, so the
  *    minCount filter removes them from the ANSWER either way — the cap
  *    changes cost, not correctness, on this fixture.
  *
  *  - AHASH probe: notes_r8ao/r9d claim the native [[graft.functions.AHashBits]]
  *    expression beats the interpreted HOF composition where it matters —
  *    LONG payloads (the HOF re-slices the string per character: O(n²)
  *    per payload). Running the HOF directly at the r9-asked 100 KiB is
  *    not probe-able: measured 2026-08-15 (r10), 8×128 KiB HOF payloads
  *    burned 8 cores for >36 min WITHOUT completing (jstack pinned all 8
  *    in Substring.nullSafeEval under ArrayAggregate), i.e. ≥ 2200 s per
  *    payload against ~0.1 s native — a ≥ 10⁴× ratio observed directly.
  *    So the repeatable probe measures the native at 128 KiB plus the
  *    HOF on a 4 KiB / 8 KiB ladder, asserts the HOF's superlinear
  *    growth (t₈ₖ/t₄ₖ ≥ 2.5; quadratic predicts ≈ 4) and that the native
  *    handles 16× the chars in under half the HOF's 8 KiB time, and
  *    prints the quadratic extrapolation to 128 KiB for the record.
  *    Parity of the BITS is already spec-pinned (MultimodalSpec); this
  *    pins the claimed asymptotics.
  *
  * Exit 1 on any pinned query over budget or any probe failing to fire. */
object BenchGuard {

  val Heavy = Seq("x2_near_dedup", "x6_ngram_jaccard",
    "x25b_neardup_clusters_star", "x38_incremental_neardup",
    "x41_overlap_dedup",
    // r9 ask #7: the pair-scorer/graph quadratic-bounded tier.
    "x119_bleu_pairs", "x133_chrf_pairs", "j12_cooccurrence_pmi")

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baseline = Bench.loadBaseline(Bench.repoRoot.resolve("BASELINE_local.json"))
    require(Heavy.forall(baseline.contains),
      s"BASELINE_local.json must carry frozen mins for ${Heavy.mkString(", ")}")

    def timeNoop(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    var failed = List.empty[String]
    Heavy.foreach { name =>
      val fn = SparkEntry.queries(name)
      timeNoop(fn(spark, dir)) // warmup
      val t = (1 to 3).map(_ => timeNoop(fn(spark, dir))).min
      val budget = baseline(name) * 2
      val ok = t <= budget
      println(f"[benchguard] $name: min-of-3 $t%.2f s, budget $budget%.2f s -> ${if (ok) "PASS" else "FAIL"}")
      if (!ok) failed ::= name
    }

    // Negative probe: the UNPRUNED x6 twin — full inverted index (no
    // exact-dup collapse, no prefix cut, no size filter), same exact
    // verification. If this stays under x6's budget the guard has no
    // teeth (budget too loose or fixture too small) and the run fails.
    val unprunedT = timeNoop {
      val shingled = graft.operators.Dedup.shingles(
        Tables.documents(spark, dir), "doc_id", "text", 3)
        .localCheckpoint(eager = false)
      val cand = shingled.select(col("shingle"), col("doc_id").as("id_a"))
        .join(shingled.select(col("shingle"), col("doc_id").as("id_b")), Seq("shingle"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val sets = shingled.groupBy(col("doc_id"))
        .agg(collect_set(col("shingle")).as("sset"))
      cand
        .join(sets.select(col("doc_id").as("id_a"), col("sset").as("set_a")), Seq("id_a"))
        .join(sets.select(col("doc_id").as("id_b"), col("sset").as("set_b")), Seq("id_b"))
        .withColumn("_i", size(array_intersect(col("set_a"), col("set_b"))))
        .withColumn("jaccard", col("_i").cast("double") /
          (size(col("set_a")) + size(col("set_b")) - col("_i")))
        .filter(col("jaccard") >= 0.8)
        .select(col("id_a"), col("id_b"))
    }
    val x6Budget = baseline("x6_ngram_jaccard") * 2
    val fired = unprunedT > x6Budget
    println(f"[benchguard] negative probe (unpruned x6): $unprunedT%.2f s vs budget $x6Budget%.2f s -> ${if (fired) "DETECTOR FIRES (good)" else "DETECTOR SILENT (bad)"}")
    if (!fired) failed ::= "negative_probe"

    // ---- Skew probe (r9 ask #7): one hot user, 10 000 distinct items ----
    val interactions = Tables.events(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("int").as("item"))
    val hot = spark.range(10000)
      .select(lit(999999999L).as("user_id"),
        (col("id") + 1000000).cast("int").as("item"))
    val skewed = interactions.unionByName(hot).localCheckpoint(eager = true)
    def pmiOver(src: org.apache.spark.sql.DataFrame) =
      graft.operators.Graph.cooccurrencePmi(src, "user_id", "item", 5L)
    val cappedSrc = graft.operators.Sampling.capPerGroup(
      skewed.distinct(), Seq("user_id"), "item", "skewguard", 50)
    timeNoop(pmiOver(cappedSrc)) // warmup
    val cappedT = (1 to 3).map(_ => timeNoop(pmiOver(cappedSrc))).min
    val skewBudget = cappedT * 2 + 1.0
    val uncappedT = timeNoop(pmiOver(skewed))
    val cappedOk = uncappedT > skewBudget
    println(f"[benchguard] skew probe: capped $cappedT%.2f s, uncapped $uncappedT%.2f s, budget $skewBudget%.2f s -> ${if (cappedOk) "GUARD ENGAGES (good)" else "GUARD INERT (bad)"}")
    if (!cappedOk) failed ::= "skew_probe"

    // ---- AHash probe (r9 ask #5): native at 128 KiB, HOF ladder ----
    // Content varies per row so passes cannot share a cached result.
    def payloads(repeats: Int) = spark.range(8).select(col("id"),
      repeat(concat(lit("abcdefghijklmnopqrstuvwxyz012345"),
        col("id").cast("string")), repeats).as("payload"))
      .localCheckpoint(eager = true)
    def timeBits(df: org.apache.spark.sql.DataFrame,
                 expr: org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      df.select(expr.as("bits")).write
        .format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val big = payloads(4096)  // ~132 K chars (>= the asked 100 KiB)
    val p4k = payloads(128)   // ~4.2 K chars
    val p8k = payloads(256)   // ~8.4 K chars
    val native = graft.functions.AHashBits(col("payload"))
    val hof = graft.operators.Multimodal.aHashBitsFold(col("payload"))
    timeBits(big, native) // warmup
    val nativeT = (1 to 3).map(_ => timeBits(big, native)).min
    timeBits(p4k, hof) // warmup (JIT of the interpreted eval path)
    val hof4k = (1 to 3).map(_ => timeBits(p4k, hof)).min
    val hof8k = (1 to 3).map(_ => timeBits(p8k, hof)).min
    val growth = hof8k / math.max(hof4k, 1e-9)
    // Quadratic extrapolation of the HOF to the native's payload size
    // (chars ratio 16x => cost ~256x the 8 KiB point).
    val hof128kEst = hof8k * 256.0
    val superlinear = growth >= 2.5
    val nativeWins = nativeT <= hof8k / 2
    println(f"[benchguard] ahash probe: native@128K $nativeT%.3f s; HOF@4K $hof4k%.2f s, @8K $hof8k%.2f s (growth $growth%.1fx, extrapolated @128K ~$hof128kEst%.0f s, est ratio ${hof128kEst / math.max(nativeT, 1e-9)}%.0fx) -> ${if (superlinear && nativeWins) "NATIVE WINS (good)" else "PROBE FAILS (bad)"}")
    if (!superlinear) failed ::= "ahash_probe_superlinear"
    if (!nativeWins) failed ::= "ahash_probe_native"

    // ---- Pair-scorer GROWTH probe (r10 ask #6): the Σ_pairs claim ----
    // The family's scale story is that cost is OUTPUT-scale (Σ over the
    // candidate pairs), measured so far only as a point at sf0.1. This
    // probe measures the GROWTH EXPONENT directly: a deterministic
    // synthetic corpus, two DISJOINT pair lists of P and 2P pairs (so the
    // endpoint-doc count doubles too), and a ≤2.3x time-growth gate on
    // rougeN / chrfPairs / werPairs (linear predicts 2x; the slack covers
    // fixed per-job overheads and min-of-3 jitter). The negative probe is
    // the classic quadratic mistake — all-pairs gram intersection over
    // the endpoint docs with the requested-pair filter applied LAST —
    // which must show >= 3x growth (doubling endpoints quadruples the
    // per-gram join fan-out) or the gate has no teeth.
    import org.apache.spark.sql.DataFrame
    val P = 1500
    // 3-hex-char tokens (vocab 4096) and 120-token docs: dense enough
    // cross-doc gram sharing — and enough absolute work — that the
    // quadratic variant's per-gram fan-out dominates its fixed overheads
    // (4-char/60-token fixtures left it overhead-bound, reading a noisy
    // 1.9-2.7x of the ideal 4x); the pair-driven scorers are insensitive
    // to sharing density and stay linear in the pair count either way.
    val synthCorpus = spark.range(4L * P).select(col("id").as("doc_id"),
        concat_ws(" ", (0 until 120).map(j =>
          substring(md5(concat(col("id"), lit(s":$j"))), 1, 3)): _*)
          .as("text"))
      .localCheckpoint(eager = true)
    def disjointPairs(k: Int) = spark.range(k)
      .select((col("id") * 2).as("id_a"), (col("id") * 2 + 1).as("id_b"))
      .localCheckpoint(eager = true)
    val pairs1 = disjointPairs(P)
    val pairs2 = disjointPairs(2 * P)
    def growthOf(name: String, f: (DataFrame, DataFrame) => DataFrame,
                 pa: DataFrame, pb: DataFrame, scale: String): Double = {
      timeNoop(f(synthCorpus, pa)) // warmup
      val t1 = (1 to 3).map(_ => timeNoop(f(synthCorpus, pa))).min
      val t2 = (1 to 3).map(_ => timeNoop(f(synthCorpus, pb))).min
      val g = t2 / math.max(t1, 1e-9)
      println(f"[benchguard] growth probe $name ($scale): $t1%.2f s -> $t2%.2f s = ${g}%.2fx")
      g
    }
    val gateG = 2.3
    Seq[(String, (DataFrame, DataFrame) => DataFrame)](
      ("rougeN", (d, p) => graft.operators.Eval.rougeN(d, p, "doc_id", "text", 2)),
      ("chrfPairs", (d, p) => graft.operators.Eval.chrfPairs(d, p, "doc_id", "text")),
      ("werPairs", (d, p) => graft.operators.Eval.werPairs(d, p, "doc_id", "text"))
    ).foreach { case (name, f) =>
      val g = growthOf(name, f, pairs1, pairs2, s"P=$P -> 2P")
      if (g > gateG) {
        println(f"[benchguard] growth probe $name FAILS the ${gateG}%.1fx gate")
        failed ::= s"growth_$name"
      }
    }
    def quadraticRouge(d: DataFrame, p: DataFrame): DataFrame = {
      val pruned = d.join(broadcast(
          p.select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
            .distinct()), Seq("doc_id"), "left_semi")
      val grams = pruned.select(col("doc_id"),
          explode(filter(split(col("text"), "\\s+"), x => length(x) > 0))
            .as("_g"))
        .groupBy(col("doc_id"), col("_g"))
        .agg(count(lit(1)).cast("long").as("_c"))
      grams.select(col("doc_id").as("id_a"), col("_g"), col("_c").as("_ca"))
        .join(grams.select(col("doc_id").as("id_b"), col("_g"),
          col("_c").as("_cb")), Seq("_g"))
        .filter(col("id_a") < col("id_b"))
        .groupBy(col("id_a"), col("id_b"))
        .agg(sum(least(col("_ca"), col("_cb"))).cast("long").as("overlap"))
        .join(p, Seq("id_a", "id_b"), "left_semi") // pair filter LAST: the bug
    }
    // The detector's teeth test: the SAME gate the real scorers pass must
    // catch the quadratic implementation on the same fixture and legs.
    // (Ideal exponent is 4x; measured ~2.7x — 32-way parallelism absorbs
    // part of the fan-out — comfortably above the 2.3x gate, while the
    // real scorers read <= ~1.25x.)
    val gQuad = growthOf("quadratic(negative)", quadraticRouge,
      pairs1, pairs2, s"P=$P -> 2P")
    val quadFires = gQuad > gateG
    println(f"[benchguard] growth negative probe: ${gQuad}%.2fx -> ${if (quadFires) "DETECTOR FIRES (good)" else "DETECTOR SILENT (bad)"}")
    if (!quadFires) failed ::= "growth_negative_probe"

    spark.stop()
    if (failed.nonEmpty) {
      System.err.println(s"[benchguard] FAILED: ${failed.reverse.mkString(", ")}")
      sys.exit(1)
    }
    println("[benchguard] all heavy-family runtimes within budget; detectors verified")
  }
}
