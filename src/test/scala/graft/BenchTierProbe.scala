package graft

import org.apache.spark.sql.SparkSession

/** Dev-only diagnostic for the pair-scorer JVM tier gap (r10 notes_r10x:
  * the heavy pair-scorer family reads ~2x SLOWER inside the 300-query
  * full-bench JVM than in a fresh JVM, while a handful of preceding heavy
  * queries does not reproduce the inflation). This probe separates the
  * two candidate mechanism classes by what a SparkSession ROTATION clears:
  *
  *  - phase FRESH: new session, time the family warm (the fresh tier);
  *  - phase POLLUTED: run every other registered query once (the bench
  *    sweep shape), then re-time the family in the same session (the
  *    full-bench tier should reproduce);
  *  - phase ROTATED: stop the session, build a new one IN THE SAME JVM,
  *    re-time the family.
  *
  * Rotation clears Spark-scoped state — block manager (accumulated
  * localCheckpoint blocks), broadcast pieces, ContextCleaner backlog,
  * SQL/plan caches — but NOT JVM-scoped state — JIT code cache, loaded
  * generated classes, metaspace, heap fragmentation. So:
  * ROTATED ≈ FRESH → the mechanism is session-scoped (adopt periodic
  * rotation in graft.Bench); ROTATED ≈ POLLUTED → JVM-scoped (floors
  * must stay on the full-bench tier; rotation inside Bench cannot help).
  * Per-phase JVM counters (loaded classes, code-heap + metaspace usage,
  * GC time, post-GC heap) name the mechanism more precisely. Test scope —
  * not part of the driver contract. */
object BenchTierProbe {

  /** The diagnosed family (notes_r10q/r10x). */
  val Family = Seq("x114_rouge_pairs", "x119_bleu_pairs", "x133_chrf_pairs",
    "x149_wer_pairs", "x153_weighted_jaccard", "m7_cdc_savings")

  private def newSession(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def jvmStats(): String = {
    import java.lang.management.ManagementFactory
    import scala.jdk.CollectionConverters._
    val classes = ManagementFactory.getClassLoadingMXBean.getLoadedClassCount
    val gcMs = ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).sum
    val pools = ManagementFactory.getMemoryPoolMXBeans.asScala
    def usedMb(nameFrag: String): Long = pools
      .filter(_.getName.contains(nameFrag))
      .map(_.getUsage.getUsed).sum / (1024 * 1024)
    System.gc()
    val heapMb = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed /
      (1024 * 1024)
    s"classes=$classes codeheap_mb=${usedMb("CodeHeap")} " +
      s"metaspace_mb=${usedMb("Metaspace")} gc_ms=$gcMs heap_postgc_mb=$heapMb"
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = Runtime.getRuntime.availableProcessors().min(32)
    println(s"[tierprobe] sf dir: $dir")
    var spark = newSession(cpus)

    def timeOne(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def family(phase: String): Unit = {
      Family.foreach(timeOne) // warm pass: no phase may bill codegen warmup
      val mins = Family.map(n => n -> Seq.fill(3)(timeOne(n)).min)
      mins.foreach { case (n, t) => println(f"[tierprobe] $phase $n min3=$t%.2f s") }
      println(f"[tierprobe] $phase TOTAL=${mins.map(_._2).sum}%.2f s  ${jvmStats()}")
    }

    family("FRESH")
    val fillers = SparkEntry.queries.keys.toSeq.sorted.filterNot(Family.contains)
    println(s"[tierprobe] running ${fillers.size} fillers once each...")
    val tf0 = System.nanoTime()
    fillers.foreach { n =>
      try timeOne(n)
      catch { case e: Throwable =>
        println(s"[tierprobe] filler $n FAILED: ${e.getClass.getSimpleName}") }
    }
    println(f"[tierprobe] fillers done in ${(System.nanoTime() - tf0) / 1e9}%.0f s")
    family("POLLUTED")
    spark.stop()
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    spark = newSession(cpus)
    family("ROTATED")
    spark.stop()
  }
}
