package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types

/** Loaders for the driver-provided parquet corpus (TESTDATA.md) plus the
  * derived chat-domain views that map the corpus onto the reference's data
  * model (FIXTURES.md §A "Mapping events → chat domain"):
  *
  *   - channel  := events.event_type   (5 values ≈ channels)
  *   - username := cast(events.user_id as string)
  *   - instant  := events.ts           (event time)
  *   - message  := events.props        (JSON payload)
  *
  * Reference record types: Message.java:10-14, Emote.java:13-16.
  * All timestamps surfaced to the query layer are epoch-millis BIGINT for
  * parity with the reference's `timestamp BIGINT` columns
  * (ChannelStatsAggregation.java:36-42).
  */
object Tables {
  // Tumbling aggregation window: 900,000 ms = 15 min
  // (job.example.properties:14 via SURVEY.md §2.3 A1).
  val WindowMillis = 900000L

  // Fixed "now" for trailing-window queries: 2024-01-31T00:00:00Z, just past
  // the end of the events data range (2024-01-01..2024-01-30). Deterministic
  // stand-in for the dashboard's wall-clock `now` (ApiController.php:154-178).
  val NowMillis = 1706659200000L

  // Excluded bot accounts (MainController.php:12 EXCLUDED_CHATTERS),
  // mapped onto the synthetic user id space.
  val ExcludedChatters: Seq[String] = Seq("3", "7", "11")

  /** Local-corpus scan adapter. The driver's test files are single-file,
    * single-row-group parquet — unsplittable, so a scan yields ONE partition
    * no matter `maxPartitionBytes`, serializing every downstream narrow
    * transform (the CPU-dense text/hash operators most of all). When the
    * scan delivers less parallelism than the session has cores AND the file
    * is big enough to matter, rebalance once right after the scan: a few-MB
    * round-robin exchange locally, a no-op branch on a real multi-file /
    * multi-row-group table at scale (where the scan already yields >=
    * parallelism splits). Filters and column pruning still push through the
    * Repartition to the scan (PushPredicateThroughNonJoin). */
  /** Per-(dir, table) file METADATA memo — schema and byte length only,
    * never rows (every query still computes from the parquet scan). The
    * original `read` paid a parquet-footer schema read plus a full
    * physical-plan build (`df.rdd.getNumPartitions`) on EVERY call; with
    * ~2 table reads per query × 6 executions per bench entry that fixed
    * cost dominated the sub-second tail of the registry (guide §1.2 —
    * per-task work after the algorithm). The driver corpus is immutable
    * for a process lifetime; a changed file invalidates the entry by
    * (len, modTime) so a rewritten path re-probes. */
  private val fileMetaCache = scala.collection.concurrent.TrieMap
    .empty[String, (types.StructType, Long, Long)]

  def read(spark: SparkSession, dir: String, table: String): DataFrame = {
    val path = s"$dir/$table.parquet"
    // Size/mtime probe through the Hadoop FS API so the check is honest on
    // any scheme (file://, hdfs://, s3a://), not just the local corpus.
    val p = new org.apache.hadoop.fs.Path(path)
    val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(p)
    val (schema, len, _) = fileMetaCache.get(path) match {
      case Some(hit @ (_, l, m))
        if l == st.getLen && m == st.getModificationTime => hit
      case _ =>
        val fresh = (spark.read.parquet(path).schema, st.getLen,
          st.getModificationTime)
        fileMetaCache.put(path, fresh)
        fresh
    }
    val df = spark.read.schema(schema).parquet(path)
    val target = spark.sparkContext.defaultParallelism
    // Scan split count, computed the way FilePartition packs a single
    // file (maxSplitBytes = min(maxPartitionBytes, max(openCostInBytes,
    // totalBytes/defaultParallelism))) — same answer as planning the scan
    // RDD, without building it.
    val conf = spark.sessionState.conf
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(conf.filesOpenCostInBytes, len / math.max(1, target)))
    val splits = (len + maxSplit - 1) / math.max(1L, maxSplit)
    // r13 OPT upper bound (guide §2.4 — "a repartition someone added for
    // parallelism" is still a full shuffle of the table): the rebalance
    // only pays when a CPU-dense NARROW chain follows the scan (text
    // shingling, hashing, per-vector math) — any wide op re-establishes
    // parallelism at its own first Exchange. Measured at sf0.1, the
    // round-robin exchange (plus its SPARK-23207 retry-determinism sort)
    // costs ~0.4-0.7 s on the 10.8 MB lineitem — tripling exchange-first
    // aggregates like j49 — while sub-few-MB frames shuffle in ~50 ms.
    // So the rebalance stays cheap insurance for the small CPU-dense
    // tables (documents/embeddings — shingling and per-vector centroid
    // math before any exchange; x109 measures +0.9 s without it) and is
    // skipped once the exchange itself is the dominant term: A/B at
    // sf0.1 put the cutoff between embeddings (0.8 MB, keep) and events
    // (1.95 MB, skip — the q/a cohort reads 0.3-0.45 s faster per query
    // without the shuffle). Parameterized, local-scale only: at
    // production scale `splits >= target` and neither branch fires.
    val maxRebalanceBytes = sys.env.get("SPARK_GRAFT_REBALANCE_MAX_BYTES")
      .map(_.toLong).getOrElse(1L << 20)
    if (len > (256 << 10) && len <= maxRebalanceBytes && splits < target)
      df.repartition(target)
    else df
  }

  /** events.parquet's `ts` physical type has drifted across corpus
    * generations — parquet INT64 TIMESTAMP(NANOS) originally, plain
    * timestamp[us] (TIMESTAMP_NTZ) since the r7 regeneration — so the
    * reader is type-adaptive: probe the scanned type and normalize to one
    * engine-internal contract, a session-TZ TimestampType at µs grain.
    * Under the engine's fixed UTC session (all builders) the NTZ wall-clock
    * equals the UTC instant, and `unix_millis` floors µs→ms exactly like
    * the DuckDB oracle's `epoch_ms`, so oracle parity is unchanged on
    * either physical layout. Legacy NANOS files surface as an epoch-nanos
    * LONG under `spark.sql.legacy.parquet.nanosAsLong` (set in our
    * builders) and are floored ns→µs by integer division (never via
    * double — epoch-nanos exceed double's exact integer range). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = read(spark, dir, "events")
    df.withColumn("ts", normalizeEventTs(df.schema("ts").dataType))
  }

  /** ts normalization by scanned type; see [[events]]. Schema drift to any
    * OTHER type fails loudly here instead of corrupting downstream math. */
  private[graft] def normalizeEventTs(dt: types.DataType): Column = dt match {
    case types.TimestampNTZType => col("ts").cast(types.TimestampType)
    case types.LongType         => timestamp_micros(expr("ts div 1000"))
    case types.TimestampType    => col("ts")
    case other => throw new IllegalStateException(
      s"events.ts has unsupported physical type $other; " +
        "expected TIMESTAMP_NTZ, legacy nanos LONG, or TIMESTAMP")
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")

  /** The chat message stream view (Message.java:10-14). Columns:
    * ts TIMESTAMP, channel STRING, username STRING, message STRING.
    */
  def messages(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("ts"),
      col("event_type").as("channel"),
      col("user_id").cast("string").as("username"),
      col("props").as("message"))

  /** Channels dimension with a `hidden` flag (channels table,
    * EmoteExtractor.java:281-285; hidden semantics ApiController.php:200-203).
    * Deterministically derived: the 'click' channel is hidden.
    *
    * The dim is derived by a distinct over the fact table (fixture mapping);
    * it is persisted and memoized per (session, dir) so queries that join it
    * (Q2, Q4) don't re-scan `events` for the dimension side every run. */
  private val channelsCache =
    scala.collection.concurrent.TrieMap.empty[(SparkSession, String), DataFrame]
  def channels(spark: SparkSession, dir: String): DataFrame = {
    // Evict entries of stopped sessions on access: their cached blocks died
    // with the context, and keeping the map entry would pin dead
    // SparkSession references for the JVM lifetime.
    channelsCache.filterInPlace { case ((s, _), _) => !s.sparkContext.isStopped }
    channelsCache.getOrElseUpdate((spark, dir),
      events(spark, dir)
        .select(col("event_type").as("channel")).distinct()
        .withColumn("hidden", col("channel") === lit("click"))
        .persist())
  }

  /** Emote dictionary (emotes table, EmoteExtractor.java:264-278):
    * the distinct tokens of documents with source='src0'.
    */
  def emoteDict(spark: SparkSession, dir: String): DataFrame =
    documents(spark, dir)
      .filter(col("source") === lit("src0"))
      .select(explode(split(col("text"), "\\s+")).as("emote"))
      .filter(length(col("emote")) > 0)
      .distinct()

  /** Phrase table (phrases table, PhraseExtractor.java:146-153): fixed,
    * deterministic regex phrases over document text. Patterns are
    * case-insensitive like the reference (PhraseExtractor.java:111).
    * channelFilter restricts to matching channels (lang facet here).
    */
  final case class Phrase(name: String, regex: String,
                          channelFilter: Option[String], logMessage: Boolean)
  val phrases: Seq[Phrase] = Seq(
    Phrase("p_the",    "(?i)the",         None,        logMessage = true),
    Phrase("p_scan",   "(?i)scan|merge",  None,        logMessage = false),
    Phrase("p_en_row", "(?i)row",         Some("en"),  logMessage = false))
}
