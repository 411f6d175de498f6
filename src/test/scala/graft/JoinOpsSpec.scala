package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, RangeJoin, Sessionize}

/** As-of and interval joins (operators/AsofJoin.scala, RangeJoin.scala):
  * semantics pinned against hand-computed fixtures, plus the bucketed range
  * join checked equal to a naive inequality join on a random-ish fixture. */
class JoinOpsSpec extends SparkSpec {

  test("asofBackward: latest at-or-before match per key, null before first") {
    import spark.implicits._
    val right = Seq( // (channel, ts, messages)
      ("a", 100L, 10L), ("a", 200L, 20L), ("b", 150L, 5L))
      .toDF("channel", "ts", "messages")
    val left = Seq(
      ("a", 50L, "u1"),   // before first version -> null
      ("a", 100L, "u2"),  // tie: matches ts=100 (inclusive)
      ("a", 150L, "u3"),  // between -> ts=100
      ("a", 999L, "u4"),  // after last -> ts=200
      ("b", 151L, "u5"),  // -> b's ts=150
      ("c", 500L, "u6"))  // key with no right rows -> null
      .toDF("channel", "ts", "username")
    val out = AsofJoin.asofBackward(left, right, Seq("channel"), "ts", Seq("messages"))
    assert(rows(out) === Set(
      Seq("a", 50L, "u1", null, null),
      Seq("a", 100L, "u2", 100L, 10L),
      Seq("a", 150L, "u3", 100L, 10L),
      Seq("a", 999L, "u4", 200L, 20L),
      Seq("b", 151L, "u5", 150L, 5L),
      Seq("c", 500L, "u6", null, null)))
  }

  test("asofBackward carries the matched right ROW atomically (NULL values do not resurrect older rows)") {
    import spark.implicits._
    // right: (k, ts=1, v=5) then (k, ts=2, v=NULL). A left point at ts=3
    // must match the ts=2 row — asof_ts=2 AND v=NULL — not a chimera of
    // ts=2's timestamp with ts=1's value.
    val right = Seq((1L, Some(5L)), (2L, None))
      .toDF("ts", "v").withColumn("k", lit("a"))
      .select(col("k"), col("ts"), col("v"))
    val left = Seq(3L).toDF("ts").withColumn("k", lit("a"))
      .select(col("k"), col("ts"))
    val out = graft.operators.AsofJoin.asofBackward(
      left, right, Seq("k"), "ts", Seq("v")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("asof_ts") === 2L)
    assert(out(0).isNullAt(out(0).fieldIndex("v")),
      "NULL in the matched right row must stay NULL")
  }

  test("asofBackward rejects colliding output column names") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L)).toDF("k", "ts", "v")
    val ex = intercept[IllegalArgumentException] {
      graft.operators.AsofJoin.asofBackward(df, df, Seq("k"), "ts", Seq("v"))
    }
    assert(ex.getMessage.contains("collide"))
  }

  test("pointInInterval: open/inverted intervals (end <= start) match nothing, cheaply") {
    import spark.implicits._
    // An ended_at=0 sentinel (still-open stream) must not explode ~s/bucket
    // rows; it simply matches no points.
    val pts = Seq(("a", 1000L)).toDF("channel", "ts")
    val iv = Seq(("a", 500L, 0L), ("a", 500L, 2000L))
      .toDF("channel", "started_at", "ended_at")
    val out = RangeJoin.pointInInterval(pts, iv, Seq("channel"), "ts",
      "started_at", "ended_at", 1800000L)
    assert(out.collect().map(_.getAs[Long]("ended_at")).toSeq === Seq(2000L))
  }

  test("pointInInterval: containment semantics, half-open end, exactly-once") {
    import spark.implicits._
    val intervals = Seq(
      ("a", 0L, 1000L), ("a", 5000L, 9000L), ("b", 100L, 200L))
      .toDF("channel", "started_at", "ended_at")
    val points = Seq(
      ("a", 0L), ("a", 999L), ("a", 1000L),   // start in; end excluded
      ("a", 4999L), ("a", 5000L), ("a", 8999L),
      ("b", 150L), ("b", 250L), ("c", 50L))
      .toDF("channel", "ts")
    // Tiny bucket (300 ms) forces intervals to span MANY buckets — the
    // exactly-once property must hold regardless.
    val out = RangeJoin.pointInInterval(points, intervals, Seq("channel"),
      "ts", "started_at", "ended_at", 300L)
    assert(rows(out.select(col("channel"), col("ts"), col("started_at"))) === Set(
      Seq("a", 0L, 0L), Seq("a", 999L, 0L),
      Seq("a", 5000L, 5000L), Seq("a", 8999L, 5000L),
      Seq("b", 150L, 100L)))
  }

  test("pointInInterval equals naive inequality join on generated fixture") {
    import spark.implicits._
    // Deterministic pseudo-random points/intervals (LCG), overlapping
    // intervals included — every (point, interval) containment pair must
    // appear exactly once, as in the naive plan.
    def lcg(seed: Long): LazyList[Long] =
      LazyList.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
    val ks = Seq("k1", "k2", "k3")
    val pts = lcg(42).take(300).zipWithIndex.map { case (r, i) =>
      (ks((r % 3).toInt.abs), math.abs(r % 100000L), i.toLong)
    }.toDF("channel", "ts", "pid")
    val ivs = lcg(7).take(40).zipWithIndex.map { case (r, i) =>
      val s = math.abs(r % 90000L)
      (ks((r % 3).toInt.abs), s, s + 1 + math.abs((r >> 8) % 20000L), i.toLong)
    }.toDF("channel", "started_at", "ended_at", "iid")
    val bucketed = RangeJoin.pointInInterval(pts, ivs, Seq("channel"),
      "ts", "started_at", "ended_at", 7000L)
      .select("pid", "iid")
    val naive = pts.join(ivs, Seq("channel"))
      .filter(col("ts") >= col("started_at") && col("ts") < col("ended_at"))
      .select("pid", "iid")
    assert(bucketed.count() === naive.count()) // multiset equality: counts +
    assertSameRows(bucketed, naive)            // set equality of pairs
  }

  test("bucketed join: Exchange-free on both sides, same result as plain join") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bkt").toString
    val left = (0L until 500L).map(i => (i % 97, i)).toDF("k", "lv")
    val right = (0L until 300L).map(i => (i % 97, i * 10)).toDF("k", "rv")
    val bl = graft.operators.Bucketing.bucketTable(left, "graft_bkt_l", "k", 8,
      dir + "/l")
    val br = graft.operators.Bucketing.bucketTable(right, "graft_bkt_r", "k", 8,
      dir + "/r")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = bl.join(br, Seq("k"))
      val plan = joined.queryExecution.executedPlan.toString
      // Co-located: the shuffle join runs with NO Exchange anywhere — both
      // scans report their bucketing and bucket i joins bucket i in place.
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assertSameRows(joined, left.join(right, Seq("k")))
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
    }
  }

  test("salted join: identical match set to the plain join, hot key spread across salts") {
    import spark.implicits._
    // 500 of 600 rows share one hot key — the skew shape salting exists for.
    val big = ((0 until 500).map(i => (7L, i.toLong)) ++
      (0 until 100).map(i => (i.toLong % 13, 1000L + i))).toDF("k", "bv")
    val small = (0L until 13L).map(i => (i, s"dim$i")).toDF("sk", "sv")
    val salted = graft.operators.Bucketing.saltedEquiJoin(big, small, "k", "sk", 4)
    assertSameRows(salted,
      big.join(small, big("k") === small("sk")))
    // The hot key's rows really do carry more than one distinct salt.
    val nSalts = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(4)))
      .filter($"k" === 7L).select($"_salt").distinct().count()
    assert(nSalts > 1, s"hot key used $nSalts salt(s)")
  }

  test("q22 range-join attribution: n_msgs per session equals n_events") {
    import spark.implicits._
    // Messages attributed to their own sessions must reproduce each
    // session's event count — the two plans (session_window agg vs bucketed
    // interval join + count) must agree.
    val msgs = Seq(
      ("a", 1000L, "u1"), ("a", 2000L, "u2"), ("a", 4000000L, "u1"),
      ("b", 500L, "u3"), ("b", 3600000L, "u3"), ("b", 3700000L, "u4"))
      .toDF("channel", "ts", "username")
    val sess = Sessionize.sessions(
      msgs.select(col("channel"), timestamp_millis(col("ts")).as("ts")),
      Seq("channel"), "ts", 1800000L)
    val attributed = RangeJoin.pointInInterval(
      msgs, sess.withColumnRenamed("n_events", "expected"),
      Seq("channel"), "ts", "started_at", "ended_at", 1800000L)
      .groupBy(col("channel"), col("started_at"), col("expected"))
      .agg(count(lit(1)).as("n_msgs"))
    assert(attributed.filter(col("n_msgs") =!= col("expected")).count() === 0L)
    assert(attributed.count() === 4L) // a: 2 sessions, b: 2 sessions
  }

  test("unpivot: wide-to-long is an Expand projection — k rows per input, no pre-agg shuffle") {
    import spark.implicits._
    val df = Seq(("r", 1.0, 10.0), ("r", 2.0, 20.0)).toDF("k", "m1", "m2")
    val long = df.unpivot(Array(col("k")),
      Array(col("m1"), col("m2")), "measure", "value")
    val rows = long.orderBy($"measure", $"value").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(rows.toSeq === Seq(("r", "m1", 1.0), ("r", "m1", 2.0),
      ("r", "m2", 10.0), ("r", "m2", 20.0)))
    // The reshape itself must not shuffle: no Exchange below the melt.
    val plan = long.queryExecution.executedPlan
    assert(!plan.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]),
      plan.toString)
  }
}
