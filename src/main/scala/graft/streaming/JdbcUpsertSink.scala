package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** Production JDBC upsert sink — the analog of the reference's XA Postgres
  * sink (XAPostgresSink.java:99-175): the dashboard store receives each
  * micro-batch as batched `INSERT ... ON CONFLICT` upserts, exactly once.
  *
  * Where the reference brackets its writes in XA two-phase commit, this
  * sink gets the same guarantee from ONE serializable transaction per
  * partition: the transaction atomically claims a (sink, batch, partition)
  * row in a commits table via `ON CONFLICT DO NOTHING` and writes the
  * partition's rows — a crash-retried task finds the claim row, skips, and
  * additive merges can never double-apply. foreachBatch replay of a fully
  * committed batch degrades to 0 claimed partitions (and still materializes
  * the batch, which stateful queries require — see
  * [[Streaming.drainReplayedBatch]]).
  *
  * The sandbox has no database server or JDBC driver jar, so this path is
  * COMPILE-CHECKED here (statement assembly unit-tested, never connected)
  * and exercised only on a real cluster — the same pattern as the Kafka
  * source ([[Streaming.kafkaMessagesStream]]).
  *
  * Scale shape: writes go per-partition with one connection and one
  * prepared statement each, `execBatchSize`-row JDBC batches — no driver
  * collect, no per-row round-trips; parallelism is the DataFrame's own
  * partitioning (repartition upstream to match the store's write headroom).
  */
final class JdbcUpsertSink(url: String, table: String, keys: Seq[String],
                           valueCols: Seq[String], additive: Boolean,
                           user: String = "", password: String = "",
                           execBatchSize: Int = 1000) {
  require(keys.nonEmpty, "upsert needs at least one key column")
  private val cols = keys ++ valueCols

  /** One-time DDL the deployment runs (or this sink's `bootstrap`):
    * the per-(sink, batch, partition) claim table backing exactly-once. */
  def commitsTableDdl: String = JdbcUpsertSink.CommitsDdl

  def upsertSql: String =
    JdbcUpsertSink.upsertStatement(table, keys, valueCols, additive)

  private def connect(): java.sql.Connection = {
    val props = new java.util.Properties
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    java.sql.DriverManager.getConnection(url, props)
  }

  /** Creates the commits table if absent. Run once at deploy. */
  def bootstrap(): Unit = {
    val conn = connect()
    try {
      val st = conn.createStatement()
      try st.execute(JdbcUpsertSink.CommitsDdl) finally st.close()
    } finally conn.close()
  }

  /** The foreachBatch body: upsert one micro-batch exactly once.
    * Wire as `stream.writeStream.foreachBatch((b, id) => sink.upsert(b, id))`.
    */
  def upsert(batch: DataFrame, batchId: Long): Unit = {
    // Locals only — the closure must not capture the sink (JDBC config is
    // serializable, the class need not be).
    val (u, usr, pw) = (url, user, password)
    val (tbl, names, bsz) = (table, cols, execBatchSize)
    val upsertText = upsertSql
    batch.select(names.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      val props = new java.util.Properties
      if (usr.nonEmpty) props.setProperty("user", usr)
      if (pw.nonEmpty) props.setProperty("password", pw)
      val conn = java.sql.DriverManager.getConnection(u, props)
      try {
        conn.setAutoCommit(false)
        // Claim this (sink, batch, partition) inside the SAME transaction
        // as the data writes: commit is atomic, so a retried task either
        // sees the claim (skip everything) or owns the partition.
        val claim = conn.prepareStatement(JdbcUpsertSink.ClaimSql)
        val claimed =
          try {
            claim.setString(1, tbl)
            claim.setLong(2, batchId)
            claim.setInt(3, org.apache.spark.TaskContext.getPartitionId())
            claim.executeUpdate() == 1
          } finally claim.close()
        if (!claimed) {
          conn.rollback() // replayed partition: already applied, skip
        } else {
          val ps = conn.prepareStatement(upsertText)
          try {
            var n = 0
            rows.foreach { r =>
              var i = 0
              while (i < names.length) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
              n += 1
              if (n % bsz == 0) ps.executeBatch()
            }
            if (n % bsz != 0) ps.executeBatch()
          } finally ps.close()
          conn.commit()
        }
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: java.sql.SQLException => () }
          throw e
      } finally conn.close()
    }
  }
}

object JdbcUpsertSink {

  /** PRIMARY KEY makes the claim race-free: concurrent speculative attempts
    * of one partition serialize on the unique insert. */
  private[streaming] val CommitsDdl: String =
    """CREATE TABLE IF NOT EXISTS _graft_sink_commits (
      |  sink_table TEXT NOT NULL,
      |  batch_id BIGINT NOT NULL,
      |  partition_id INT NOT NULL,
      |  PRIMARY KEY (sink_table, batch_id, partition_id)
      |)""".stripMargin

  private[streaming] val ClaimSql: String =
    "INSERT INTO _graft_sink_commits (sink_table, batch_id, partition_id) " +
      "VALUES (?, ?, ?) ON CONFLICT DO NOTHING"

  /** The batched upsert text — the XAPostgresSink.java:99-175 statement
    * shapes: additive merge (stats grains: counters add under replay of the
    * SAME logical delta — prevented by the claim; concurrent grains each get
    * their own sink table), replace (last-write-wins dimensions), or
    * insert-ignore (`valueCols` empty — append-once fact rows). The target
    * is aliased `t` so additive SET references the stored row whatever the
    * (possibly schema-qualified) table name renders as. */
  def upsertStatement(table: String, keys: Seq[String],
                      valueCols: Seq[String], additive: Boolean): String = {
    def q(c: String) = "\"" + c + "\""
    val cols = keys ++ valueCols
    val action =
      if (valueCols.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + valueCols.map { c =>
        if (additive) s"${q(c)} = t.${q(c)} + EXCLUDED.${q(c)}"
        else s"${q(c)} = EXCLUDED.${q(c)}"
      }.mkString(", ")
    s"INSERT INTO $table AS t (${cols.map(q).mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.map(q).mkString(", ")}) $action"
  }
}
