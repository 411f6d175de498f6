package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench-as-regression-gate contract (VERDICT r6 ask #1): the frozen
  * per-query min baseline plus `Bench.regressions` must flag a seeded
  * slowdown and stay silent on noise-shaped deltas.
  */
class BenchRegressionSpec extends AnyFunSuite {

  test("seeded slowdown fires the detector") {
    val base = Map("q1" -> 1.0, "q2" -> 0.5)
    val cur  = Map("q1" -> 2.0, "q2" -> 0.51) // q1: 2x and +1.0s
    assert(Bench.regressions(base, cur) == Seq("q1"))
  }

  test("below-factor slowdown does not fire") {
    val base = Map("q1" -> 1.0)
    assert(Bench.regressions(base, Map("q1" -> 1.4)).isEmpty)
  }

  test("above-factor but sub-slack absolute delta does not fire (jitter guard)") {
    // 2x of a 0.1s query is +0.1s — within scheduler jitter, not algorithmic.
    val base = Map("q1" -> 0.1)
    assert(Bench.regressions(base, Map("q1" -> 0.2)).isEmpty)
    // but with slack disabled it does fire, proving the factor check works
    assert(Bench.regressions(base, Map("q1" -> 0.2), slackSec = 0.0) == Seq("q1"))
  }

  test("new queries (absent from baseline) and failed queries are not flagged") {
    val base = Map("q1" -> 1.0)
    val cur  = Map("q1" -> -1.0, "q_new" -> 99.0)
    assert(Bench.regressions(base, cur).isEmpty)
  }

  test("multiple regressions come back name-sorted") {
    val base = Map("b" -> 1.0, "a" -> 1.0, "c" -> 1.0)
    val cur  = Map("b" -> 3.0, "a" -> 3.0, "c" -> 1.0)
    assert(Bench.regressions(base, cur) == Seq("a", "b"))
  }

  test("fleet-wide drift does not fire; a query drifting far beyond the fleet does") {
    // Ten queries all 2x slower: a machine-level slowdown, not ten
    // simultaneous algorithmic regressions — the de-drifted gate is silent.
    val base = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val allDrift = base.map { case (k, v) => k -> v * 2.0 }
    assert(Bench.driftFactor(base, allDrift) === 2.0)
    assert(Bench.regressions(base, allDrift).isEmpty)
    // Same fleet, but one query at 6x: 3x beyond the fleet median — fires.
    val oneBad = allDrift + ("q3" -> 6.0)
    assert(Bench.regressions(base, oneBad) == Seq("q3"))
  }

  test("drift needs a population: small fleets never de-drift, and a faster machine never loosens") {
    // 2 paired queries < MinDriftSamples → factor 1.0 (the seeded-slowdown
    // test above relies on this).
    assert(Bench.driftFactor(Map("a" -> 1.0, "b" -> 1.0),
      Map("a" -> 3.0, "b" -> 3.0)) === 1.0)
    // 10 queries all FASTER than freeze: clamped to 1.0, not 0.5 — a fast
    // machine must not hide a regression behind a loosened gate.
    val base = (1 to 10).map(i => s"q$i" -> 1.0).toMap
    val faster = base.map { case (k, v) => k -> v * 0.5 } + ("q9" -> 1.9)
    assert(Bench.driftFactor(base, faster) === 1.0)
    assert(Bench.regressions(base, faster) == Seq("q9"))
  }

  test("self-adjudication gate: contention re-time clears, persistent slowdown confirms, failed re-time never self-clears") {
    // Sweep flagged at 3x but the exclusive re-time lands at the floor:
    // contention, cleared.
    assert(!Bench.confirmedAfterRetime(base = 1.0, retime = 1.05, drift = 1.0))
    // Re-time reproduces the slowdown: confirmed regression.
    assert(Bench.confirmedAfterRetime(base = 1.0, retime = 2.1, drift = 1.0))
    // In-gate re-time (above floor but inside factor+slack): cleared.
    assert(!Bench.confirmedAfterRetime(base = 1.0, retime = 1.4, drift = 1.0))
    // Fleet drift de-rates the re-time the same way the sweep gate does.
    assert(!Bench.confirmedAfterRetime(base = 1.0, retime = 2.1, drift = 1.5))
    // A re-time that errored (-1) keeps the flag.
    assert(Bench.confirmedAfterRetime(base = 1.0, retime = -1.0, drift = 1.0))
  }

  test("loadBaseline parses queries_min from disk and tolerates absence") {
    val tmp = java.nio.file.Files.createTempFile("baseline", ".json")
    java.nio.file.Files.writeString(tmp,
      """{"sf":"/x","queries_min":{"q1":0.25,"q2":1.0,"q3":2}}""")
    val m = Bench.loadBaseline(tmp)
    assert(m == Map("q1" -> 0.25, "q2" -> 1.0, "q3" -> 2.0))
    assert(Bench.loadBaseline(tmp.resolveSibling("nope.json")).isEmpty)
    java.nio.file.Files.delete(tmp)
  }

  test("the committed BASELINE_local.json loads and covers the registry") {
    val m = Bench.loadBaseline(Bench.repoRoot.resolve("BASELINE_local.json"))
    assert(m.size >= 100, s"expected >=100 frozen mins, got ${m.size}")
    // every frozen name is a real registry entry (no orphaned baselines)
    val names = SparkEntry.queries.keySet
    val orphans = m.keySet.diff(names)
    assert(orphans.isEmpty, s"baseline names not in registry: $orphans")
  }
}
