package graft

import org.apache.spark.sql.functions._

/** r12 consolidation tripwire: j43/j48/j31/x108 were re-pointed from
  * their deleted duplicate implementations (Maintenance.mannWhitneyU,
  * Maintenance.kruskalWallis, the TimeSeries.theilSen legacy overload,
  * Sampling.quantileNormalize) onto the surviving keyed operators with
  * legacy-convention parameters. At the time of the re-point the outputs
  * were verified BIT-IDENTICAL to the old implementations at sf0.001 and
  * sf0.01 (canonicalized full-frame compare). These fingerprints (row
  * count + per-column sums captured from the OLD implementations'
  * sf0.001 dumps) pin that equivalence permanently: a convention drift
  * in the shared implementation (rank formula, rounding grid, variance
  * form) moves them. */
class ConsolidationSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def sums(name: String, cols: Seq[String]): (Long, Seq[Double]) = {
    val df = SparkEntry.queries(name)(spark, dir)
    val agg = df.agg(count(lit(1)).cast("long").as("_n"),
      cols.map(c => sum(col(c).cast("double")).as(c)): _*).collect().head
    (agg.getLong(0), cols.indices.map(i => agg.getDouble(i + 1)))
  }

  private def close(got: Seq[Double], want: Seq[Double]): Unit =
    got.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-6 * math.max(1.0, math.abs(w)),
        s"fingerprint drifted: $g != $w")
    }

  test("j31_theil_sen matches the legacy pre-consolidation fingerprint") {
    val (n, s) = sums("j31_theil_sen", Seq("n_pairs", "slope"))
    assert(n === 5L)
    close(s, Seq(2175.0, -0.209524))
  }

  test("j43_mann_whitney matches the legacy pre-consolidation fingerprint") {
    val (n, s) = sums("j43_mann_whitney", Seq("n1", "u_stat", "z"))
    assert(n === 20L)
    close(s.take(2), Seq(500.0, 118750.0))
    // Σz is a near-cancelling sum of ±z's: compare absolutely, loosely.
    assert(math.abs(s(2) - -1.0e-4) < 1e-9)
  }

  test("j48_kruskal_wallis matches the legacy pre-consolidation fingerprint") {
    val (n, s) = sums("j48_kruskal_wallis",
      Seq("k", "n", "h", "h_tie_corrected"))
    assert(n === 1L)
    close(s, Seq(20.0, 500.0, 18.9597, 18.9601))
  }

  test("x108_quantile_normalize matches the legacy pre-consolidation fingerprint") {
    val (n, s) = sums("x108_quantile_normalize",
      Seq("doc_id", "n_chars", "pct_rank", "normalized"))
    assert(n === 500L)
    close(s, Seq(124750.0, 153156.0, 250.0, 153447.4))
  }
}
