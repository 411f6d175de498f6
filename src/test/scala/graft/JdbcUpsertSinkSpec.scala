package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.JdbcUpsertSink

/** The JDBC sink's DB-free seam: statement-text assembly. The sandbox has
  * no database server or driver jar, so the connected path is
  * compile-checked only (the XAPostgresSink.java:99-175 analog); these
  * tests pin the exact SQL a real deployment would issue. */
class JdbcUpsertSinkSpec extends AnyFunSuite {

  test("additive upsert references the stored row through the alias") {
    assert(JdbcUpsertSink.upsertStatement(
      "channel_stats", Seq("channel", "timestamp"), Seq("messages"),
      additive = true) ===
      """INSERT INTO channel_stats AS t ("channel", "timestamp", "messages") """ +
        """VALUES (?, ?, ?) ON CONFLICT ("channel", "timestamp") """ +
        """DO UPDATE SET "messages" = t."messages" + EXCLUDED."messages"""")
  }

  test("replace upsert takes the excluded (incoming) values") {
    assert(JdbcUpsertSink.upsertStatement(
      "emotes", Seq("emote"), Seq("provider", "url"), additive = false) ===
      """INSERT INTO emotes AS t ("emote", "provider", "url") """ +
        """VALUES (?, ?, ?) ON CONFLICT ("emote") """ +
        """DO UPDATE SET "provider" = EXCLUDED."provider", "url" = EXCLUDED."url"""")
  }

  test("no value columns degrades to insert-ignore") {
    assert(JdbcUpsertSink.upsertStatement(
      "seen", Seq("channel", "username"), Nil, additive = true) ===
      """INSERT INTO seen AS t ("channel", "username") """ +
        """VALUES (?, ?) ON CONFLICT ("channel", "username") DO NOTHING""")
  }

  test("schema-qualified tables keep a usable alias for the additive SET") {
    val sql = JdbcUpsertSink.upsertStatement(
      "analytics.user_stats", Seq("username"), Seq("messages"), additive = true)
    assert(sql.contains("INSERT INTO analytics.user_stats AS t"))
    assert(sql.contains(""""messages" = t."messages" + EXCLUDED."messages""""))
  }

  test("sink construction exposes its SQL and the claim-table contract") {
    val sink = new JdbcUpsertSink("jdbc:postgresql://db/stats", "channel_stats",
      Seq("channel", "timestamp"), Seq("messages"), additive = true)
    assert(sink.upsertSql.startsWith("INSERT INTO channel_stats AS t"))
    assert(sink.commitsTableDdl.contains(
      "PRIMARY KEY (sink_table, batch_id, partition_id)"))
  }
}
