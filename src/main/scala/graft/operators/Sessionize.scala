package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** S10: stream-session tracking — the reference's streams (uptime) table
  * `(channel, started_at) → ended_at` maintained by the Bot's Helix poller
  * (Bot.java:145-232, 150 s cooldown). Re-expressed as gap-based
  * sessionization over the activity events themselves with Spark's
  * `session_window`, which works identically in batch and Structured
  * Streaming (with a watermark).
  *
  * Semantics: two consecutive events on the same channel belong to one
  * session iff their gap is strictly less than `gapMs`; `started_at` is the
  * first event's ts, `ended_at` is the last event's ts + gap (the
  * session_window end — the earliest instant the session could have been
  * declared over, the analog of the poller noticing the stream went
  * offline).
  *
  * Scale notes: `session_window` is one shuffle on the key followed by a
  * per-key in-order merge — no self-join, no global window. Skewed channels
  * stay a single task per key, which is fine at the reference's
  * channel-cardinality (thousands), and AQE skew handling covers the rest.
  */
object Sessionize {

  def sessions(events: DataFrame, keys: Seq[String], tsCol: String,
               gapMs: Long): DataFrame = {
    val kcols = keys.map(col)
    events
      .groupBy(kcols :+ session_window(col(tsCol), s"$gapMs milliseconds"): _*)
      .agg(count(lit(1)).as("n_events"))
      .select(kcols ++ Seq(
        unix_millis(col("session_window.start")).as("started_at"),
        unix_millis(col("session_window.end")).as("ended_at"),
        col("n_events")): _*)
  }
}
