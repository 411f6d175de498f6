package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.EmoteProviders
import graft.streaming.EmoteProviders.{FileEmoteProvider, RefreshingDict}

/** The provider-refresh machinery (EmoteExtractor.java:115-216): merge of
  * global + per-channel providers, TTL-driven reload, degraded operation
  * when a provider is down, and integration with the per-batch side-input
  * refresh of the streaming emote pipeline. */
class EmoteProvidersSpec extends SparkSpec {

  private def writeDict(path: String, rows: Seq[(String, Option[String])]): Unit = {
    import spark.implicits._
    rows.map { case (e, c) => (e, c.orNull) }.toDF("emote", "channel")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }
  private def writeGlobal(path: String, emotes: Seq[String]): Unit = {
    import spark.implicits._
    emotes.toDF("emote").coalesce(1).write.mode("overwrite").parquet(path)
  }

  test("mergedDict: global + channel scoping, cross-provider dedup, degraded fetch") {
    val base = Files.createTempDirectory("graft-prov").toString
    writeGlobal(base + "/g", Seq("Kappa", "Pog"))
    writeDict(base + "/c", Seq(("Sub1", Some("chan1")), ("Kappa", None)))
    val providers = Seq(
      new FileEmoteProvider("global", base + "/g"),
      new FileEmoteProvider("chan", base + "/c"),
      new FileEmoteProvider("down", base + "/missing")) // unavailable
    val merged = EmoteProviders.mergedDict(spark, providers).get
    // Kappa appears once (deduped across providers), Sub1 is chan1-scoped.
    assert(rows(merged) === Set(
      Seq("Kappa", null), Seq("Pog", null), Seq("Sub1", "chan1")))
    assert(rows(EmoteProviders.dictForChannel(merged, "chan1")) ===
      Set(Seq("Kappa"), Seq("Pog"), Seq("Sub1")))
    assert(rows(EmoteProviders.dictForChannel(merged, "other")) ===
      Set(Seq("Kappa"), Seq("Pog")))
    // Every provider down → None (caller keeps the previous dict).
    assert(EmoteProviders.mergedDict(spark,
      Seq(new FileEmoteProvider("x", base + "/nope"))).isEmpty)
  }

  test("RefreshingDict: TTL gates re-fetch; stale cache survives a provider outage") {
    val base = Files.createTempDirectory("graft-ttl").toString
    writeGlobal(base + "/g", Seq("Kappa"))
    @volatile var clock = 0L
    val dict = new RefreshingDict(
      Seq(new FileEmoteProvider("g", base + "/g")), ttlMs = 100L, now = () => clock)
    assert(rows(dict.current(spark).select("emote")) === Set(Seq("Kappa")))
    assert(dict.refreshes === 1L)
    // Inside the TTL the dict is cached — a provider update is NOT seen.
    writeGlobal(base + "/g", Seq("Kappa", "Pog"))
    clock = 50L
    assert(rows(dict.current(spark).select("emote")) === Set(Seq("Kappa")))
    assert(dict.refreshes === 1L)
    // Past the TTL the update lands.
    clock = 150L
    assert(rows(dict.current(spark).select("emote")) ===
      Set(Seq("Kappa"), Seq("Pog")))
    assert(dict.refreshes === 2L)
    // Outage past the next TTL: last good dict keeps serving.
    def deleteDir(p: java.nio.file.Path): Unit =
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(java.nio.file.Files.delete(_))
    deleteDir(java.nio.file.Paths.get(base + "/g"))
    clock = 300L
    assert(rows(dict.current(spark).select("emote")) ===
      Set(Seq("Kappa"), Seq("Pog")))
  }

  test("streaming emote stats over a refreshing provider dict") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = Files.createTempDirectory("graft-provstream").toString
    writeGlobal(base + "/g", Seq("Kappa"))
    @volatile var clock = 0L
    val dict = new RefreshingDict(
      Seq(new FileEmoteProvider("g", base + "/g")), ttlMs = 100L, now = () => clock)

    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String, String)]
    val stream = ms.toDF().toDF("channel", "username", "text")
    val sink = new graft.streaming.Streaming.ParquetUpsertSink(base + "/state",
      Seq("channel", "emote"), Seq("occurrences"), additive = true)
    val q = stream.writeStream.outputMode("append")
      .option("checkpointLocation", base + "/ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        sink.upsert(graft.pipeline.StatsPipeline.emoteStats(
          graft.pipeline.StatsPipeline.extractEmotes(b,
            EmoteProviders.dictForChannel(dict.current(spark), "c"))), id)
      }
      .start()
    ms.addData(("c", "u", "Kappa Pog")); q.processAllAvailable()
    // Provider update lands only after the TTL tick between micro-batches.
    writeGlobal(base + "/g", Seq("Kappa", "Pog"))
    ms.addData(("c", "u", "Kappa Pog")); q.processAllAvailable() // still cached
    clock = 150L
    ms.addData(("c", "u", "Kappa Pog")); q.processAllAvailable() // refreshed
    q.stop()
    assert(rows(sink.state(spark).get) ===
      Set(Seq("c", "Kappa", 3L), Seq("c", "Pog", 1L)))
  }
}
