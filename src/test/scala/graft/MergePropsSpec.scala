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

  test("duplicate-key deltas: one deterministic survivor, invariant preserved") {
    import spark.implicits._
    val state = Seq(("k1", 100L), ("k2", 200L)).toDF("k", "v")
    val delta = Seq(("k1", 2L), ("k1", 1L), ("k3", 9L), ("k3", 8L)).toDF("k", "v")
    // replace: k1 takes the smallest delta value, exactly one row per key.
    val replaced = Merge.replaceUpsert(state, delta, Seq("k"))
    assert(rows(replaced) === Set(Seq("k1", 1L), Seq("k2", 200L), Seq("k3", 8L)))
    assert(replaced.groupBy("k").count().filter(col("count") > 1).count() === 0L)
    // insertIgnore: k1 keeps STATE's row; k3 inserts the smallest survivor.
    assert(rows(Merge.insertIgnore(state, delta, Seq("k"))) ===
      Set(Seq("k1", 100L), Seq("k2", 200L), Seq("k3", 8L)))
    // Partitioning-independence of the survivor pick.
    assert(rows(Merge.replaceUpsert(state, delta.repartition(7), Seq("k"))) ===
      rows(replaced))
  }

  test("additiveUpsert preserves fractional value types (no long truncation)") {
    import spark.implicits._
    val state = Seq(("k1", 10.5)).toDF("k", "v")
    val delta = Seq(("k1", 0.25), ("k2", 1.75)).toDF("k", "v")
    assert(rows(Merge.additiveUpsert(state, delta, Seq("k"), Seq("v"))) ===
      Set(Seq("k1", 10.75), Seq("k2", 1.75)))
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

  test("property: applyChangeLog == window-naive; tombstones delete; later re-insert survives") {
    import spark.implicits._
    val genLog = Gen.listOfN(24, for {
      k <- Gen.oneOf("k1", "k2", "k3", "k4", "k5")
      op <- Gen.frequency(3 -> Gen.const("U"), 1 -> Gen.const("D"))
      v <- Gen.choose(0L, 100L)
      ts <- Gen.choose(0L, 5L) // coarse: forces seq-tiebreak on the id
    } yield (k, op, v, ts))
    val prop = Prop.forAll(genLog) { log =>
      // seq = (ts, unique id) — the total order the contract requires
      val rows = log.zipWithIndex.map { case ((k, op, v, ts), i) =>
        (k, op, v, ts, i.toLong)
      }
      val df = rows.toDF("k", "op", "v", "ts", "chg_id").repartition(5)
      val got = Merge.applyChangeLog(df, Seq("k"), "op", "D",
        Seq("ts", "chg_id"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"k").orderBy($"ts".desc, $"chg_id".desc)
      val naive = df.withColumn("_rn", row_number().over(w))
        .filter($"_rn" === 1 && $"op" =!= "D")
        .select($"k", $"v", $"ts", $"chg_id")
      sortedRows(got) == sortedRows(naive)
    }
    check("cdc apply vs naive", prop, cases = 8)
    // Split-equivalence (the streaming fold's law): re-collapsing a
    // collapsed prefix with any suffix — in either order — equals the
    // one-shot collapse.
    val splitProp = Prop.forAll(genLog, Gen.choose(0, 24)) { (log, cut) =>
      val rows = log.zipWithIndex.map { case ((k, op, v, ts), i) =>
        (k, op, v, ts, i.toLong)
      }
      val (la, lb) = rows.splitAt(cut)
      val all = rows.toDF("k", "op", "v", "ts", "chg_id")
      val a = la.toDF("k", "op", "v", "ts", "chg_id")
      val b = lb.toDF("k", "op", "v", "ts", "chg_id")
      val keys = Seq("k"); val seq = Seq("ts", "chg_id")
      val oneShot = sortedRows(Merge.collapseChangeLog(all, keys, seq))
      val folded = sortedRows(Merge.collapseChangeLog(
        Merge.collapseChangeLog(a, keys, seq).unionByName(b), keys, seq))
      val foldedRev = sortedRows(Merge.collapseChangeLog(
        Merge.collapseChangeLog(b, keys, seq).unionByName(a), keys, seq))
      folded == oneShot && foldedRev == oneShot
    }
    check("cdc collapse split-equivalence", splitProp, cases = 8)
    // Directed: D then later U revives; U then later D removes.
    val df = Seq(
      ("a", "U", 1L, 0L, 0L), ("a", "D", 0L, 1L, 1L), ("a", "U", 7L, 2L, 2L),
      ("b", "U", 3L, 0L, 3L), ("b", "D", 0L, 9L, 4L))
      .toDF("k", "op", "v", "ts", "chg_id")
    val out = Merge.applyChangeLog(df, Seq("k"), "op", "D", Seq("ts", "chg_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("a" -> 7L))
  }
}
