package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.operators.Sessionize
import graft.streaming.StreamingSessionize

/** S10 streaming half (streaming/StreamingSessionize.scala): custom-state
  * sessionization via flatMapGroupsWithState — gap-close within a batch,
  * open-session state across batches, event-time-timeout close via the
  * watermark, and file-replay parity with the batch session_window. */
class StreamingSessionizeSpec extends SparkSpec {

  test("gap close within batch, state across batches, watermark timeout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(String, Long)]
    val stream = ms.toDF().toDF("channel", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
    val q = StreamingSessionize.sessions(stream, gapMs = 1000L)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    // Batch 1: one session accumulating (out-of-order within the batch).
    ms.addData(("a", 1500L), ("a", 1000L)); q.processAllAvailable()
    assert(spark.table("sess_out").count() === 0) // still open, nothing emitted

    // Batch 2: gap >= 1000 closes [1000, 2500), opens a@5000.
    ms.addData(("a", 5000L)); q.processAllAvailable()
    assert(rows(spark.table("sess_out")) ===
      Set(Seq("a", 1000L, 2500L, 2L)))

    // Batch 3: another key's event drives the watermark far past a's open
    // session — the EVENT-TIME TIMEOUT must close and emit it, with no
    // further 'a' events ever arriving.
    ms.addData(("b", 100000L)); q.processAllAvailable()
    q.stop()
    assert(rows(spark.table("sess_out")) ===
      Set(Seq("a", 1000L, 2500L, 2L), Seq("a", 5000L, 6000L, 1L)))
    spark.sql("DROP TABLE IF EXISTS sess_out")
  }

  test("file-replay streamed sessions equal batch session_window at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("graft-s10b-spec").toString
    val streamed = StreamingSessionize.runSessions(
      spark, dir, base + "/sessions", 1800000L, Tables.NowMillis + 1800000L)
    val batch = Sessionize.sessions(
      Tables.messages(spark, dir).select(col("channel"),
        timestamp_millis(unix_millis(col("ts"))).as("ts")),
      Seq("channel"), "ts", 1800000L)
    assertSameRows(streamed, batch)
  }

  test("session sink: crash-replayed batch never duplicates closed sessions") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-s10b-replay").toString
    // gap 5 s: the intra-batch jump 101 s -> 110 s closes [100000, 106000)
    // immediately; the session opened at 110 s stays in state and is never
    // emitted here. (ts=0 would be dropped by the initial watermark.)
    Seq(("c", 100000L), ("c", 101000L), ("c", 110000L))
      .toDF("channel", "ts_ms")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      .write.parquet(base + "/in")
    def closed = StreamingSessionize.sessions(
      spark.readStream.schema("channel STRING, ts TIMESTAMP")
        .parquet(base + "/in"), gapMs = 5000L)
    StreamingSessionize.writeSessions(closed, base + "/sessions")
    val first = sortedRows(spark.read.parquet(base + "/sessions"))
    assert(first === Seq(Seq("c", "100000", "106000", "2")))
    // Crash between the sink's marker commit and the checkpoint commit: the
    // restart replays the batch; the AppendOnceSink must not re-append.
    rollbackLastCommit(base + "/sessions.ckpt")
    StreamingSessionize.writeSessions(closed, base + "/sessions")
    val second = sortedRows(spark.read.parquet(base + "/sessions"))
    assert(second === first, "replayed batch duplicated closed sessions")
  }
}
