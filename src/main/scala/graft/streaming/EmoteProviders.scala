package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Emote-dictionary provider machinery — the reload-on-interval side-input
  * pipeline of the reference (EmoteExtractor.java:115-216: four providers
  * fetched per channel, merged, cached, refreshed on a timer).
  *
  * The reference's providers are HTTP APIs; here a provider is anything
  * that yields an (emote[, channel]) frame — the shipped implementation
  * reads a landing path an ingest job writes (the same stand-in shape as
  * the file-replay Kafka source, Streaming.scala:44-52). The MACHINERY is
  * the point and is fully real: multi-provider merge with global +
  * per-channel scoping, TTL-based refresh so micro-batches between
  * refresh ticks reuse a cached dict (no per-batch re-fetch), and
  * graceful degradation when one provider is unavailable (the reference
  * logs and keeps the last dict, EmoteExtractor.java:150-163).
  */
object EmoteProviders {

  /** A dictionary source. `fetch` returns columns (emote) or
    * (emote, channel) — a null/absent channel means the emote is global. */
  trait EmoteProvider {
    def name: String
    def fetch(spark: SparkSession): DataFrame
  }

  /** File-backed provider: reads every parquet under `path` (the landing
    * zone an out-of-engine ingest bot writes, SURVEY §2.1 S9). Missing
    * path ⇒ provider unavailable (throws — handled by [[mergedDict]]). */
  final class FileEmoteProvider(val name: String, path: String)
      extends EmoteProvider {
    def fetch(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }

  /** Merge provider fetches into one scoped dict with columns
    * (emote, channel): per-channel rows keep their scope, global rows get
    * a NULL channel; duplicates across providers collapse. A provider
    * that fails to fetch is skipped (degraded, not fatal) — matching the
    * reference's keep-serving-the-last-dict behavior. Returns None when
    * EVERY provider failed (callers keep the previous dict). */
  def mergedDict(spark: SparkSession,
                 providers: Seq[EmoteProvider]): Option[DataFrame] = {
    val fetched = providers.flatMap { p =>
      try {
        val df = p.fetch(spark)
        val scoped =
          if (df.columns.contains("channel"))
            df.select(col("emote"), col("channel"))
          else df.select(col("emote"), lit(null).cast("string").as("channel"))
        Some(scoped)
      } catch { case _: Exception => None }
    }
    if (fetched.isEmpty) None
    else Some(fetched.reduce(_ unionByName _).distinct())
  }

  /** The dict visible to ONE channel: its scoped emotes plus all global
    * ones (EmoteExtractor.java:115-131 builds exactly this view). */
  def dictForChannel(scoped: DataFrame, channel: String): DataFrame =
    scoped.filter(col("channel").isNull || col("channel") === channel)
      .select(col("emote")).distinct()

  /** TTL-cached refreshing dict: `current()` re-fetches at most every
    * `ttlMs` (the reference's timer-driven reload); between ticks every
    * micro-batch reuses the cached frame. Thread-safe; a failed refresh
    * keeps serving the previous dict. Clock injectable for tests. */
  final class RefreshingDict(providers: Seq[EmoteProvider], ttlMs: Long,
                             now: () => Long = () => System.currentTimeMillis()) {
    @volatile private var cached: Option[DataFrame] = None
    @volatile private var fetchedAt = Long.MinValue
    @volatile private var refreshCount = 0L

    /** Number of underlying provider fetch rounds (test observability). */
    def refreshes: Long = refreshCount

    def current(spark: SparkSession): DataFrame = synchronized {
      val t = now()
      if (cached.isEmpty || t - fetchedAt >= ttlMs) {
        mergedDict(spark, providers).foreach { d =>
          // localCheckpoint (eager): a true point-in-time SNAPSHOT. A
          // plain cache() is not one — overwriting the provider's path
          // makes Spark recache the plan against the new files
          // (recacheByPath), silently defeating the TTL. Checkpointing
          // cuts the lineage, and the ContextCleaner frees the blocks
          // when the previous snapshot is dropped.
          cached = Some(d.localCheckpoint())
          refreshCount += 1
        }
        fetchedAt = t
      }
      cached.getOrElse(
        throw new IllegalStateException("no emote provider ever succeeded"))
    }
  }
}
