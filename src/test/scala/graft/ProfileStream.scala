package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev-only per-batch decomposition of a streaming entry's warm run (r13
  * verdict ask #3: where do the ~3 s/entry of micro-batch fixed cost go?).
  * Registers a job listener, runs the named registry entries warm (one
  * warmup + one profiled pass, the BenchOne discipline), and prints every
  * Spark job with its description (streaming jobs carry "batch = N"), its
  * duration, and the DRIVER GAP since the previous job ended — planning,
  * checkpoint/commit FS work, and sink metadata all live in the gaps.
  * Test scope, not part of the driver contract. */
object ProfileStream {
  private case class J(id: Int, desc: String, sub: Long, var done: Long,
                       tasks: Int)

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("s15_stream_transitions")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new scala.collection.mutable.ArrayBuffer[J]()
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        lock.synchronized {
          val desc = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))))
            .getOrElse("")
          jobs += J(e.jobId, desc.take(100), e.time, -1L,
            e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        lock.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.done = e.time)
        }
    })
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warmup
      lock.synchronized(jobs.clear())
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // drain the listener bus
      val js = lock.synchronized(jobs.sortBy(_.sub).toVector)
      println(s"\n===== $n: wall ${f"$wall%.2f"} s, ${js.size} jobs =====")
      var prevEnd = js.headOption.map(_.sub).getOrElse(0L)
      var sumJobs = 0L
      var sumGaps = 0L
      js.foreach { j =>
        val dur = if (j.done >= 0) j.done - j.sub else -1L
        val gap = math.max(0L, j.sub - prevEnd)
        sumJobs += math.max(0L, dur)
        sumGaps += gap
        println(f"[job ${j.id}%4d] dur ${dur / 1000.0}%6.2f s  gap ${gap / 1000.0}%6.2f s  tasks ${j.tasks}%4d  ${j.desc}")
        prevEnd = math.max(prevEnd, if (j.done >= 0) j.done else j.sub)
      }
      println(f"[sum] jobs ${sumJobs / 1000.0}%.2f s, inter-job driver gaps ${sumGaps / 1000.0}%.2f s, wall $wall%.2f s")
    }
    spark.stop()
  }
}
