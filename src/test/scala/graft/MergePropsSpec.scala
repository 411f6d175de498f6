package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Merge
import graft.pipeline.StatsPipeline

/** SURVEY §5.3: the two algebraic properties of the merge/upsert layer,
  * checked with scalacheck over randomized inputs (bounded case counts —
  * each case runs real Spark jobs).
  *
  *  1. Batch-split equivalence: folding per-batch aggregates through the
  *     additive upsert equals the single-pass aggregation for ANY split of
  *     the input into batches (the delta+additive semantics of the
  *     reference's sink, ChannelStatsAggregation.java:45-50).
  *  2. Replace-upsert idempotence: applying the same delta twice equals
  *     applying it once (the property the streaming sink's replay-safety
  *     builds on, SURVEY §7.3).
  */
class MergePropsSpec extends SparkSpec {

  private val W = 900000L

  private def check(name: String, p: Prop, cases: Int = 8): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, s"$name: $res")
  }

  private val genMsgs: Gen[List[(Long, String, String)]] =
    Gen.listOfN(30, for {
      ts <- Gen.choose(0L, 3 * W)
      ch <- Gen.oneOf("a", "b", "c")
      u <- Gen.oneOf("u1", "u2")
    } yield (ts, ch, u))

  test("property: additive upsert over any batch split == single pass") {
    import spark.implicits._
    val prop = Prop.forAll(genMsgs, Gen.choose(0, 30)) { (msgs, cut) =>
      val df = msgs.toDF("ts_ms", "channel", "username")
        .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms")
      val (m1, m2) = msgs.splitAt(cut)
      def stats(rows: List[(Long, String, String)]) =
        StatsPipeline.channelStats(
          rows.toDF("ts_ms", "channel", "username")
            .withColumn("ts", timestamp_millis(col("ts_ms"))).drop("ts_ms"), W)
      val merged =
        if (m1.isEmpty) stats(m2)
        else if (m2.isEmpty) stats(m1)
        else Merge.additiveUpsert(stats(m1), stats(m2),
          Seq("channel", "ts"), Seq("messages"))
      sortedRows(merged) == sortedRows(StatsPipeline.channelStats(df, W))
    }
    check("batch-split equivalence", prop)
  }

  test("property: replace upsert is idempotent; insertIgnore keeps state") {
    import spark.implicits._
    val genState = Gen.listOfN(8, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4")
      v <- Gen.choose(0L, 100L)
    } yield (k, v))
    val prop = Prop.forAll(genState, genState) { (st, dl) =>
      val state = st.toDF("k", "v").dropDuplicates("k")
      val delta = dl.toDF("k", "v").dropDuplicates("k")
      val once = Merge.replaceUpsert(state, delta, Seq("k"))
      val twice = Merge.replaceUpsert(once, delta, Seq("k"))
      val ignored = Merge.insertIgnore(state, delta, Seq("k"))
      // idempotence
      sortedRows(once) == sortedRows(twice) &&
        // replace: delta rows win
        sortedRows(once.join(delta.select("k"), Seq("k"), "left_semi")) ==
          sortedRows(delta) &&
        // insertIgnore: state rows untouched
        sortedRows(ignored.join(state.select("k"), Seq("k"), "left_semi")) ==
          sortedRows(state)
    }
    check("replace/ignore laws", prop, cases = 6)
  }
}
