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

  /** TPC-H-ish star-schema physical footers (TESTDATA.md), pinned so a
    * regeneration that changes a column type (double → decimal, µs → ns)
    * fails SchemaDriftSpec by name instead of breaking thirty queries at
    * plan time. Date columns are parquet timestamp[us] isAdjustedToUTC=
    * false → TIMESTAMP_NTZ, same convention as [[events]]. */
  val star: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))))

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
