package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {

  test("autocorrelation: a strictly alternating series has acf1 = -1, acf2 = 1") {
    import spark.implicits._
    val s = (0 until 10).map(i => ("k", i.toLong, if (i % 2 == 0) 10L else 20L))
      .toDF("key", "t", "n")
    val out = TimeSeries.autocorrelation(s, Seq("key"), "t", "n", 2)
      .collect().head
    assert(out.getAs[Double]("acf1") === -1.0)
    assert(out.getAs[Double]("acf2") === 1.0)
  }

  test("autocorrelation: partitions are independent per key") {
    import spark.implicits._
    val s = ((0 until 8).map(i => ("up", i.toLong, i.toLong)) ++
      (0 until 8).map(i => ("alt", i.toLong, if (i % 2 == 0) 1L else 5L)))
      .toDF("key", "t", "n")
    val out = TimeSeries.autocorrelation(s, Seq("key"), "t", "n", 1)
      .collect().map(r => r.getString(0) -> r.getAs[Double]("acf1")).toMap
    assert(out("up") === 1.0)   // linear ramp: perfect lag-1 correlation
    assert(out("alt") === -1.0)
  }

  test("ewma: a constant series is its own EWMA at every point") {
    import spark.implicits._
    val s = (0 until 20).map(i => ("k", i.toLong, 7L)).toDF("key", "t", "n")
    val out = TimeSeries.ewma(s, Seq("key"), "t", "n", 0.3, 14)
      .select("ewma").collect().map(_.getDouble(0))
    // Renormalized truncated EWMA of a constant is exactly the constant,
    // including the first rows where the frame is shorter than the span.
    assert(out.forall(_ == 7.0))
  }

  test("ewma: hand-computed two-point frame") {
    import spark.implicits._
    // alpha .5, span 14; second row frame = [10, 20]:
    // (.5*.5*10 + .5*20) / (.5*.5 + .5) = 12.5 / .75 = 16.6667
    val s = Seq(("k", 0L, 10L), ("k", 1L, 20L)).toDF("key", "t", "n")
    val out = TimeSeries.ewma(s, Seq("key"), "t", "n", 0.5, 14)
      .orderBy(col("t")).select("ewma").collect().map(_.getDouble(0))
    assert(out(0) === 10.0)
    assert(out(1) === 16.6667)
  }

  test("interarrival: gaps are per (key, entity) and percentiles are exact") {
    import spark.implicits._
    // entity a: events at 0, 10, 30 → gaps 10, 20
    // entity b: events at 5, 105    → gap 100
    val e = Seq(("k", "a", 0L, 1L), ("k", "a", 10L, 2L), ("k", "a", 30L, 3L),
      ("k", "b", 5L, 4L), ("k", "b", 105L, 5L))
      .toDF("key", "ent", "ms", "eid")
    val out = TimeSeries.interarrivalStats(e, Seq("key"), "ent", "ms", "eid")
      .collect().head
    assert(out.getAs[Long]("n_gaps") === 3L)
    assert(out.getAs[Long]("min_ms") === 10L)
    assert(out.getAs[Long]("p50_ms") === 20L)  // exact interpolated median of {10,20,100}
    assert(out.getAs[Long]("max_ms") === 100L)
  }

  test("interarrival: simultaneous events tie-break on the id column") {
    import spark.implicits._
    val e = Seq(("k", "a", 10L, 2L), ("k", "a", 10L, 1L), ("k", "a", 25L, 3L))
      .toDF("key", "ent", "ms", "eid")
    val out = TimeSeries.interarrivalStats(e, Seq("key"), "ent", "ms", "eid")
      .collect().head
    // Order is (10,eid1), (10,eid2), (25): gaps 0 and 15 — deterministic.
    assert(out.getAs[Long]("n_gaps") === 2L)
    assert(out.getAs[Long]("min_ms") === 0L)
    assert(out.getAs[Long]("max_ms") === 15L)
  }
}
