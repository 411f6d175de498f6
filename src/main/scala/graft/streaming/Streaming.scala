package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.Schemas
import graft.operators.Merge
import graft.pipeline.StatsPipeline

/** Structured Streaming parity: the reference IS a streaming job
  * (EmoteAnalyser.java:34-158) — Kafka source → per-event transforms → keyed
  * windowed aggregation with periodic early firing → upsert sink. This module
  * re-expresses that identity Spark-first:
  *
  *  - S1: `readStream` replay of the events table (the Kafka-source
  *    stand-in; swap for `format("kafka")` + S2 `from_json` in production);
  *  - S4: event-time column + `withWatermark` (the reference uses
  *    `noWatermarks()` and flushes by timer instead — a generous watermark
  *    plus update mode reproduces "arbitrarily late data still merges");
  *  - A3: update-mode output with a trigger — Spark emits *absolute* updated
  *    per-window aggregates each micro-batch where the reference emits
  *    *deltas*; absolute+replace-upsert ≡ delta+additive-upsert
  *    (AbstractStatsAggregation.java:84-115, SURVEY.md §2.3 A3);
  *  - S5: idempotent `foreachBatch` upsert sink with committed-batch
  *    tracking — the XAPostgresSink 2-phase-commit analog
  *    (XAPostgresSink.java:99-175);
  *  - T2: per-micro-batch side-input refresh of the emote dictionary
  *    (EmoteExtractor.java:115-178).
  */
object Streaming {

  /** The file stream source requires a *directory* to watch
    * (FileStreamSource pins `basePath` to the load path internally), so a
    * single-file table is staged into a fresh landing directory — the same
    * shape a Kafka-connect/ingest job would land files into. */
  private def stagedTableDir(dir: String, table: String): String = {
    val src = java.nio.file.Paths.get(dir, s"$table.parquet")
    val d = java.nio.file.Files.createTempDirectory(s"graft-stream-$table")
    java.nio.file.Files.copy(src, d.resolve(s"$table.parquet"))
    d.toString
  }

  /** S1: streaming replay of the events table. Explicit schema (S7) — file
    * sources don't infer at plan time. */
  def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream.schema(Schemas.events)
      .parquet(stagedTableDir(dir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** The chat-message stream view (same mapping as [[graft.Tables.messages]]). */
  def messagesStream(spark: SparkSession, dir: String): DataFrame =
    eventsStream(spark, dir).select(
      col("ts"),
      col("event_type").as("channel"),
      col("user_id").cast("string").as("username"),
      col("props").as("message"))

  def documentsStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(Schemas.documents)
      .parquet(stagedTableDir(dir, "documents"))

  /** S5: upsert sink over a parquet-backed state table. Each micro-batch is
    * merged (replace-by-key for absolute update-mode rows, additive for
    * delta rows) and the table swapped atomically (write-new → rename).
    *
    * Idempotence: a committed-batch marker makes replays no-ops — the
    * checkpoint-aligned-commit property of the reference's 2PC sink
    * (XAPostgresSink.java:122-175) without a transactional store. Replace
    * merges are idempotent by construction; the marker makes *additive*
    * merges replay-safe too.
    *
    * Scale notes: the merge is a broadcast left-anti join (replace) or one
    * hash re-aggregation (additive) — the state table never shuffles more
    * than once per batch. At real scale the swap becomes a partition-level
    * overwrite or MERGE INTO on a transactional table format; the merge
    * plans are the same.
    */
  final class ParquetUpsertSink(path: String, keys: Seq[String],
                                valueCols: Seq[String], additive: Boolean) {

    private def fs(spark: SparkSession): FileSystem =
      FileSystem.get(new java.net.URI(path),
        spark.sparkContext.hadoopConfiguration)

    private def committedBatch(spark: SparkSession): Long = {
      val p = new Path(path + ".committed")
      val f = fs(spark)
      if (!f.exists(p)) -1L
      else {
        val in = f.open(p)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    }

    def state(spark: SparkSession): Option[DataFrame] = {
      val p = new Path(path)
      if (fs(spark).exists(p)) Some(spark.read.parquet(path)) else None
    }

    def upsert(batch: DataFrame, batchId: Long): Unit = {
      val spark = batch.sparkSession
      if (batchId <= committedBatch(spark)) return // replayed batch: no-op
      val merged = state(spark) match {
        case Some(cur) if additive =>
          Merge.additiveUpsert(cur, batch, keys, valueCols)
        case Some(cur) =>
          Merge.replaceUpsert(cur, batch, keys)
        case None => batch
      }
      val tmp = path + s".b$batchId"
      merged.write.mode("overwrite").parquet(tmp)
      val f = fs(spark)
      val dst = new Path(path)
      f.delete(dst, true)
      f.rename(new Path(tmp), dst)
      val out = f.create(new Path(path + ".committed"), true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    }
  }

  /** A4 under streaming: windowed channel stats, update mode, replace-upsert
    * sink; runs to completion of the available data and returns the final
    * stats table. `trigger` defaults to AvailableNow (batch replay); pass
    * `Trigger.ProcessingTime(...)` for a continuous job. */
  def runChannelStats(spark: SparkSession, dir: String, sinkPath: String,
                      windowMs: Long, watermark: String = "24 hours",
                      trigger: Trigger = Trigger.AvailableNow()): DataFrame = {
    val sink = new ParquetUpsertSink(sinkPath, Seq("channel", "ts"),
      Seq("messages"), additive = false)
    val agg = StatsPipeline.channelStats(
      messagesStream(spark, dir).withWatermark("ts", watermark), windowMs)
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", sinkPath + ".ckpt")
      .trigger(trigger)
      .foreachBatch { (b: DataFrame, id: Long) => sink.upsert(b, id) }
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkPath)
  }

  /** A6 under streaming with T2 side-input refresh: the emote dictionary is
    * re-evaluated inside `foreachBatch`, so every micro-batch sees the
    * current dict (EmoteExtractor.java:115-178's reload-on-interval, with
    * the micro-batch as the refresh tick). Per-batch counts are *deltas*,
    * merged with the additive upsert (Q19/A9 semantics). */
  def runEmoteStats(spark: SparkSession, dir: String, sinkPath: String,
                    dict: () => DataFrame): DataFrame = {
    val sink = new ParquetUpsertSink(sinkPath, Seq("channel", "emote"),
      Seq("occurrences"), additive = true)
    val docs = documentsStream(spark, dir).select(
      col("lang").as("channel"), col("source").as("username"), col("text"))
    val q = docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", sinkPath + ".ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, id: Long) =>
        sink.upsert(StatsPipeline.emoteStats(
          StatsPipeline.extractEmotes(b, dict())), id)
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkPath)
  }

  /** S6: matched-message log sink — append-only side output of full message
    * rows for logged phrases (MessagesMatchingPhraseExporter.java:43-50). */
  def runMatchedMessageLog(spark: SparkSession, stream: DataFrame,
                           phrases: Seq[graft.Tables.Phrase], textCol: String,
                           sinkPath: String): DataFrame = {
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", sinkPath + ".ckpt")
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        StatsPipeline.matchedMessageLog(
          StatsPipeline.matchPhrases(b, phrases, textCol), phrases)
          .write.mode("append").parquet(sinkPath)
      }
      .start()
    q.awaitTermination()
    spark.read.parquet(sinkPath)
  }
}
