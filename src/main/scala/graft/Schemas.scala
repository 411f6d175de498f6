package graft

import org.apache.spark.sql.types._

/** S7: explicit schema bootstrap — the engine's schema-on-write contract,
  * replacing the reference's `CREATE TABLE IF NOT EXISTS` DDL per aggregation
  * (ChannelStatsAggregation.java:35-42 and siblings) and the Message record
  * shape (Message.java:10-14, 26-43).
  *
  * Streaming file sources REQUIRE an explicit schema (no inference at plan
  * time), and the upsert sinks write with these schemas so the stats tables
  * have a stable contract independent of any particular input file.
  */
object Schemas {

  /** events.parquet physical schema. `ts` is parquet timestamp[us] with
    * isAdjustedToUTC=false → TIMESTAMP_NTZ (current testdata generation;
    * see [[Tables.events]] for the adaptive batch path and
    * FixturesSpec for the drift gate that keeps this declaration honest —
    * a declared type that mismatches the footer would make streaming reads
    * silently misinterpret raw values, as the r7 µs-as-ns break showed). */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** documents.parquet physical schema (TESTDATA.md). */
  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** embeddings.parquet physical schema (TESTDATA.md). */
  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  /** S2/S3: the Message wire envelope — flat JSON object with event-time in
    * epoch millis (Message.java:26-43: instant/channel/username/message). */
  val messageEnvelope: StructType = StructType(Seq(
    StructField("instant", LongType),
    StructField("channel", StringType),
    StructField("username", StringType),
    StructField("message", StringType)))

  /** Stats-table shapes (SURVEY.md §1.3): key columns + window-end `ts`
    * (epoch millis; 0 = all-time sentinel) + the additive measure. */
  val channelStats: StructType = StructType(Seq(
    StructField("channel", StringType),
    StructField("ts", LongType),
    StructField("messages", LongType)))

  val emoteStats: StructType = StructType(Seq(
    StructField("channel", StringType),
    StructField("emote", StringType),
    StructField("occurrences", LongType)))
}
