package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.StatsPipeline
import graft.queries.Serving
import graft.operators.Merge

/** FIXTURES.md §B: the ten obligatory reference-semantics cases, built from
  * tiny in-code datasets (schemas mirror SURVEY.md §1.2-1.3). Citations in
  * each test name point at the reference behavior being pinned. */
class FixturesSpec extends SparkSpec {

  private val W = 900000L // 15 min tumbling window (job.example.properties:14)

  import scala.jdk.CollectionConverters._

  private def messages(rows: (Long, String, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("ts_ms", "channel", "username", "message")
      .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
  }

  // 1. Window boundary (AbstractStatsAggregation.java:69-77): an event at
  //    exactly k*W belongs to [k*W, (k+1)*W) and is labeled with end (k+1)*W.
  test("1: window boundary — event at k*W labeled with end (k+1)*W") {
    val df = messages(
      (899999L, "c", "u", "m"), // window [0, W) → end W
      (900000L, "c", "u", "m"), // window [W, 2W) → end 2W
      (900001L, "c", "u", "m"))
    val got = rows(StatsPipeline.channelStats(df, W))
    assert(got === Set(Seq("c", 900000L, 1L), Seq("c", 1800000L, 2L)))
  }

  // 2. Duplicate emotes in one message each count (EmoteExtractor.java:92-102).
  test("2: duplicate emotes in one message each count") {
    import spark.implicits._
    val dict = Seq("Kappa", "PogChamp").toDF("emote")
    val df = messages((0L, "c", "u", "Kappa Kappa PogChamp notanemote"))
      .withColumnRenamed("message", "text")
    val emotes = StatsPipeline.extractEmotes(df, dict)
    val got = rows(StatsPipeline.emoteStats(emotes))
    assert(got === Set(Seq("c", "Kappa", 2L), Seq("c", "PogChamp", 1L)))
  }

  // 3. Multi-phrase multi-match: phrase A twice + phrase B once in one
  //    message → PhraseStats(A,2),(B,1); log row once per matching phrase
  //    with log_message=true (PhraseExtractor.java:60-87).
  test("3: multi-phrase counts and matched-message log") {
    val phrases = Seq(
      Tables.Phrase("A", "foo", None, logMessage = true),
      Tables.Phrase("B", "bar", None, logMessage = false))
    val df = messages((0L, "c", "u", "foo bar foo")).withColumnRenamed("message", "text")
    val matched = StatsPipeline.matchPhrases(df, phrases, "text")
    val stats = rows(StatsPipeline.phraseStats(matched))
    assert(stats === Set(Seq("c", "A", 2L), Seq("c", "B", 1L)))
    val log = StatsPipeline.matchedMessageLog(matched, phrases)
    assert(rows(log.select(col("phrase_name"), col("text"))) ===
      Set(Seq("A", "foo bar foo"))) // once per phrase, only log_message=true
  }

  // 4. Channel-filter regex restricts a phrase to matching channels;
  //    both regexes case-insensitive (PhraseExtractor.java:62-66, 111).
  test("4: channel-filter regex, case-insensitive") {
    val phrases = Seq(Tables.Phrase("P", "hi", Some("xqcow"), logMessage = false))
    val df = messages(
      (0L, "XqCoW", "u", "hi hi"),
      (0L, "other", "u", "hi")).withColumnRenamed("message", "text")
    val got = rows(StatsPipeline.phraseStats(
      StatsPipeline.matchPhrases(df, phrases, "text")))
    assert(got === Set(Seq("XqCoW", "P", 2L)))
  }

  // 5. Hidden channel excluded from serving queries (ApiController.php:200-203).
  test("5: hidden channel excluded by visibleOnly") {
    import spark.implicits._
    val stats = Seq(("vis", 900000L, 5L), ("hid", 900000L, 7L))
      .toDF("channel", "ts", "messages")
    val channels = Seq(("vis", false), ("hid", true)).toDF("channel", "hidden")
    assert(rows(Serving.visibleOnly(stats, channels)) ===
      Set(Seq("vis", 900000L, 5L)))
  }

  // 6. Totals invariant: sentinel ts=0 row equals the sum of windowed rows
  //    (ChannelStatsAggregation.java:44-63); serving excludes the sentinel
  //    via ts > 0 (MainController.php:50-52).
  test("6: sentinel totals equal windowed sum; serving excludes sentinel") {
    val df = messages(
      (1000L, "c", "u1", "m"), (900001L, "c", "u2", "m"), (1800001L, "c", "u1", "m"))
    val stats = StatsPipeline.channelStats(df, W)
    val full = StatsPipeline.withSentinelTotals(stats, Seq("channel"), "messages")
    val sentinel = full.filter(col("ts") === 0).select("messages")
    val windowedSum = full.filter(col("ts") > 0)
      .agg(sum("messages").cast("long").as("messages"))
    assertSameRows(sentinel, windowedSum)
    // cumulativeBase over the sentinel-bearing table counts only ts>0 rows
    val base = Serving.cumulativeBase(full, Seq("channel"), "messages", Long.MaxValue)
    assert(rows(base) === Set(Seq("c", 3L)))
  }

  // 7. Trailing windows with a fixed now; empty ranges → 0
  //    (ApiController.php:154-178).
  test("7: trailing-window sums with empty ranges → 0") {
    import spark.implicits._
    val now = 10000000L
    val stats = Seq(("c", now - 500L, 3L), ("c", now - 5000L, 4L))
      .toDF("channel", "ts", "messages")
    val got = rows(Serving.trailingSums(stats, now,
      Seq("t1" -> 1000L, "t2" -> 10000L, "empty" -> 100L), "messages"))
    assert(got === Set(Seq(3L, 7L, 0L)))
  }

  // 8. Resample branches (MainController.php:593-706): empty → two zero
  //    samples; n<=N → as-is; n>N → interpolated with endpoint clamping;
  //    start==end → end+60000 with 2 points; numPoints<2 → 2.
  test("8: resample — empty, as-is, interpolate, degenerate, numPoints<2") {
    import spark.implicits._
    val ser = Seq(("k", 0L, 0L), ("k", 10000L, 1L), ("k", 20000L, 2L),
      ("k", 30000L, 10L), ("k", 40000L, 11L)).toDF("key", "ts", "v")

    // empty series → placeholder rows (Q12)
    val empty = ser.filter(col("key") === "nope").select("ts", "v")
    assert(rows(Serving.orEmptyPlaceholder(empty, 5L, 9L, "v")) ===
      Set(Seq(5L, 0L), Seq(9L, 0L)))
    // non-empty series: placeholder must NOT fire
    assert(Serving.orEmptyPlaceholder(ser.select("ts", "v"), 5L, 9L, "v").count() === 5)

    // n <= numPoints → returned as-is
    assert(rows(Serving.resample(ser, Seq("key"), "v", 10)) ===
      rows(ser.select(col("key"), col("ts"), col("v"))))

    // n > numPoints → grid start + i*ceil(step), interpolate round(v0+k*(v1-v0))
    val interp = rows(Serving.resample(ser, Seq("key"), "v", 4))
    // C = ceil(40000/3) = 13334; t=13334 → round(1 + 0.3334*1) = 1;
    // t=26668 → round(2 + 0.6668*8) = 7; endpoints clamp to first/last.
    assert(interp === Set(
      Seq("k", 0L, 0L), Seq("k", 13334L, 1L), Seq("k", 26668L, 7L),
      Seq("k", 40000L, 11L)))

    // start == end → end += 60000, numPoints = 2; both points clamp to last
    val degen = rows(Serving.resample(ser, Seq("key"), "v", 4,
      Some(40000L), Some(40000L)))
    assert(degen === Set(Seq("k", 40000L, 11L), Seq("k", 100000L, 11L)))

    // numPoints < 2 behaves as 2: grid = [start, end]
    val np1 = rows(Serving.resample(ser, Seq("key"), "v", 1))
    assert(np1 === Set(Seq("k", 0L, 0L), Seq("k", 40000L, 11L)))
  }

  // 9. Excluded chatters skipped in leaderboards (MainController.php:12,
  //    446-455).
  test("9: excluded chatters dropped from the leaderboard") {
    import spark.implicits._
    val stats = Seq(("bot", 100L), ("alice", 10L), ("bob", 5L))
      .toDF("username", "messages")
    val got = Serving.leaderboard(
      stats.filter(!col("username").isin("bot")), Seq("username"), "messages", 2)
    assert(got.collect().map(_.getString(0)).toSeq === Seq("alice", "bob"))
  }

  // 10. Late data still merges into the correct window — the additive-upsert
  //     equivalence (ChannelStatsAggregation.java:45-50): aggregating two
  //     batches (the second containing a late event for an old window) and
  //     merging additively equals the single-pass aggregation.
  test("10: late event merges into its window via additive upsert") {
    val batch1 = messages((1000L, "c", "u", "m"), (900001L, "c", "u", "m"))
    val batch2 = messages((2000L, "c", "u", "late")) // late: window [0, W)
    val merged = Merge.additiveUpsert(
      StatsPipeline.channelStats(batch1, W),
      StatsPipeline.channelStats(batch2, W),
      Seq("channel", "ts"), Seq("messages"))
    val single = StatsPipeline.channelStats(
      batch1.unionByName(batch2), W)
    assertSameRows(merged, single)
    assert(rows(merged) === Set(Seq("c", 900000L, 2L), Seq("c", 1800000L, 1L)))
  }
}
