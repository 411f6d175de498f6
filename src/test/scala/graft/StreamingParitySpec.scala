package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.pipeline.StatsPipeline
import graft.streaming.Streaming

/** SURVEY §5.3-5.4: the streaming/batch equivalence invariant — the final
  * stats table must be identical no matter how the input is split into
  * micro-batches (README.md:55-60 "arbitrarily late data still merges").
  * MemoryStream drives the same StatsPipeline transforms used in batch;
  * the sink is the idempotent upsert sink from [[Streaming]]. */
class StreamingParitySpec extends SparkSpec {

  private val W = 900000L

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def msgsDF(rows: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("ts_ms", "channel", "username", "message")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
  }

  test("update-mode stream over arbitrary micro-batches equals batch run") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = Seq(
      (1000L, "a", "u1", "m"), (2000L, "b", "u2", "m"),
      (900001L, "a", "u1", "m"), (1800001L, "a", "u3", "m"),
      (5000L, "a", "u9", "late"), // late for window [0, W) — arrives last
      (1800002L, "b", "u2", "m"))

    val ms = MemoryStream[(Long, String, String, String)]
    val stream = ms.toDF()
      .toDF("ts_ms", "channel", "username", "message")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")

    val base = tmp("graft-parity")
    val sink = new Streaming.ParquetUpsertSink(base + "/state",
      Seq("channel", "ts"), Seq("messages"), additive = false)
    val q = StatsPipeline.channelStats(stream, W).writeStream
      .outputMode("update")
      .option("checkpointLocation", base + "/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) => sink.upsert(b, id) }
      .start()
    // three arbitrary micro-batches, late row in the last one
    ms.addData(all.take(2)); q.processAllAvailable()
    ms.addData(all.slice(2, 4)); q.processAllAvailable()
    ms.addData(all.drop(4)); q.processAllAvailable()
    q.stop()

    val streamed = spark.read.parquet(base + "/state")
    val batch = StatsPipeline.channelStats(msgsDF(all), W)
    assertSameRows(streamed, batch)
  }

  test("upsert sink is idempotent under batch replay") {
    import spark.implicits._
    val base = tmp("graft-idem")
    val sink = new Streaming.ParquetUpsertSink(base + "/state",
      Seq("k"), Seq("v"), additive = true)
    val b0 = Seq(("x", 1L), ("y", 2L)).toDF("k", "v")
    sink.upsert(b0, 0L)
    sink.upsert(b0, 0L) // replay of a committed batch must be a no-op
    val b1 = Seq(("x", 10L)).toDF("k", "v")
    sink.upsert(b1, 1L)
    sink.upsert(b1, 1L)
    assert(rows(spark.read.parquet(base + "/state")) ===
      Set(Seq("x", 11L), Seq("y", 2L)))
  }

  test("T2: emote dictionary refreshed per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    @volatile var dictWords = Seq("Kappa")
    def dict(): DataFrame = dictWords.toDF("emote")

    val ms = MemoryStream[(String, String, String)]
    val stream = ms.toDF().toDF("channel", "username", "text")

    val base = tmp("graft-dict")
    val sink = new Streaming.ParquetUpsertSink(base + "/state",
      Seq("channel", "emote"), Seq("occurrences"), additive = true)
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", base + "/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink.upsert(StatsPipeline.emoteStats(
          StatsPipeline.extractEmotes(b, dict())), id)
      }
      .start()
    ms.addData(("c", "u", "Kappa Pog")); q.processAllAvailable()
    dictWords = Seq("Kappa", "Pog") // dict update between micro-batches
    ms.addData(("c", "u", "Kappa Pog")); q.processAllAvailable()
    q.stop()

    // Pog was only in the dict for the second batch → counted once.
    assert(rows(spark.read.parquet(base + "/state")) ===
      Set(Seq("c", "Kappa", 2L), Seq("c", "Pog", 1L)))
  }

  test("file-stream replay at sf0.001 equals batch channel stats") {
    val dir = "/root/testdata/sf0.001"
    val base = tmp("graft-replay")
    val streamed = Streaming.runChannelStats(spark, dir, base + "/state", W)
    val batch = StatsPipeline.channelStats(Tables.messages(spark, dir), W)
    assertSameRows(streamed, batch)
  }

  test("S6: matched-message log sink appends logged phrases only") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val phrases = Seq(
      Tables.Phrase("A", "foo", None, logMessage = true),
      Tables.Phrase("B", "bar", None, logMessage = false))
    val ms = MemoryStream[(String, String, String)]
    val stream = ms.toDF().toDF("channel", "username", "text")
    val base = tmp("graft-s6")
    ms.addData(("c", "u", "foo bar"), ("c", "u", "bar only"))
    val log = Streaming.runMatchedMessageLog(spark, stream, phrases, "text",
      base + "/log")
    assert(rows(log.select(col("phrase_name"), col("text"))) ===
      Set(Seq("A", "foo bar")))
  }
}
