package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {

  test("pageRank: a symmetric cycle stays uniform and mass is conserved") {
    import spark.implicits._
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val out = Graph.pageRank(e, "src", "dst", "w", 4)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    // Uniform is a fixed point of the cycle: every node keeps 1/3
    // (rounded to the operator's 6-dp grain).
    assert(out.forall { case (_, r) => math.abs(r - 1.0 / 3) < 1e-5 })
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-5)
  }

  test("pageRank: dangling mass is redistributed (hand-computed 1-iteration values)") {
    import spark.implicits._
    // A→B only; B is dangling. r0 = (.5, .5); dangling = .5.
    // A: .075 + .85*(0 + .25) = .2875   B: .075 + .85*(.5 + .25) = .7125
    val e = Seq((1L, 2L, 1.0)).toDF("src", "dst", "w")
    val out = Graph.pageRank(e, "src", "dst", "w", 1)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1L, 0.2875), (2L, 0.7125)))
  }

  test("pageRank: weighted edges split contributions proportionally") {
    import spark.implicits._
    // Hub 1 links to 2 (w=3) and 3 (w=1): contribs split 3:1. One
    // iteration from uniform r0 = 1/3 each; 2 and 3 also dangle.
    // dangling = 2/3. base = .05 + .85*(2/3)/3 = .238888...
    // node2: base + .85*(1/3)*(3/4) = .45138888 → .451389 (6 dp)
    // node3: base + .85*(1/3)*(1/4) = .30972222 → .309722
    // node1: base = .238889
    val e = Seq((1L, 2L, 3.0), (1L, 3L, 1.0)).toDF("src", "dst", "w")
    val out = Graph.pageRank(e, "src", "dst", "w", 1)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1L, 0.238889), (2L, 0.451389), (3L, 0.309722)))
  }

  test("cooccurrencePmi: hand-computed pair counts and PMI; min-count prunes") {
    import spark.implicits._
    // u1:{1,2} u2:{1,2} u3:{1,3} u4:{2} → N=4, c1=3, c2=3, c3=1.
    // (1,2) shared by u1,u2 → c12=2, pmi = ln(4·2/(3·3)) = -0.1178;
    // (1,3) c12=1 pruned at minCount=2; duplicates collapse first.
    val df = Seq((1L, 1), (1L, 2), (1L, 2), (2L, 1), (2L, 2), (3L, 1),
      (3L, 3), (4L, 2)).toDF("u", "i")
    val out = Graph.cooccurrencePmi(df, "u", "i", 2L)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1, 2, 2L, -0.1178)))
  }

  test("kHopCounts: hop rings on a directed path with a shortcut") {
    import spark.implicits._
    // 1→2→3→4 plus shortcut 1→3: hop1 = {2,3}, hop2 = {4} (3 already
    // visited via the shortcut — first-reach semantics), hop3 = {}.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 3L)).toDF("s", "t")
    val seed = Seq(1L).toDF("n")
    val out = Graph.kHopCounts(e, "s", "t", seed, "n", 3)
      .orderBy($"hop").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(out.toSeq === Seq((0, 1L), (1, 2L), (2, 1L), (3, 0L)))
  }

  test("hits: the hub covering every authority dominates; unit norms hold") {
    import spark.implicits._
    // Hub 1 → {10, 11, 12}; hubs 2, 3 → {10} only. Authority 10 is cited
    // by all three hubs → top authority; hub 1 touches every authority →
    // top hub. Both score vectors are L2-normalized each half-step.
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (3L, 10L))
      .toDF("s", "t")
    val out = Graph.hits(e, "s", "t", 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val hubs = out.filter(_._1 == "hub").sortBy(-_._3)
    val auths = out.filter(_._1 == "authority").sortBy(-_._3)
    assert(hubs.head._2 === 1L)
    assert(auths.head._2 === 10L)
    assert(math.abs(hubs.map(h => h._3 * h._3).sum - 1.0) < 1e-4)
    assert(math.abs(auths.map(a => a._3 * a._3).sum - 1.0) < 1e-4)
  }

  test("trianglesPerVertex: K4 plus a pendant edge, duplicates collapse") {
    import spark.implicits._
    // K4 on {1,2,3,4} has C(4,3)=4 triangles; every K4 vertex sits in
    // exactly 3. Node 5 hangs off node 1 (no triangle). Reversed and
    // duplicate pairs must canonicalize away.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b)
    val e = (k4 :+ ((1L, 5L)) :+ ((5L, 1L))).toDF("a", "b")
    val out = Graph.trianglesPerVertex(e, "a", "b")
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("trianglesPerVertex: two triangles sharing an edge count the shared pair twice") {
    import spark.implicits._
    // Triangles {1,2,3} and {2,3,4} share edge (2,3): vertices 2 and 3
    // sit in two triangles each, 1 and 4 in one.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L)).toDF("a", "b")
    val out = Graph.trianglesPerVertex(e, "a", "b")
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 2L), (3L, 2L), (4L, 1L)))
  }

  test("adamicAdar: square graph scores both diagonals, connected pairs excluded") {
    import spark.implicits._
    // Cycle 1-2-3-4-1: the only non-adjacent pairs are the diagonals
    // (1,3) and (2,4), each sharing two degree-2 neighbors →
    // score 2/ln 2 = 2.885390. No adjacent pair may appear.
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("a", "b")
    val out = Graph.adamicAdar(e, "a", "b", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq === Seq((1L, 3L, 2L, 2.88539), (2L, 4L, 2L, 2.88539)))
  }

  test("adamicAdar: rare shared neighbor outscores a shared hub") {
    import spark.implicits._
    // Pair (1,2) shares only hub 0 (degree 6); pair (10,11) shares only
    // degree-2 vertex 20 → 1/ln 2 > 1/ln 6.
    val e = ((1L to 6L).map(i => (0L, i)) ++
      Seq((10L, 20L), (11L, 20L))).toDF("a", "b")
    val out = Graph.adamicAdar(e, "a", "b", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(out.head === ((10L, 11L, 1.442695)))
    assert(out.forall(_._3 <= 1.442695))
  }

  test("localClustering: triangle with a pendant — hub fraction, clique 1.0, degree-1 NULL") {
    import spark.implicits._
    // Triangle {1,2,3}, pendant 4 on 1: lcc(1) = 2·1/(3·2) = 1/3,
    // lcc(2) = lcc(3) = 1, lcc(4) undefined (degree 1) → NULL.
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Graph.localClustering(e, "a", "b").orderBy($"vertex")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq === Seq(
      (1L, 3L, 1L, Some(0.333333)), (2L, 2L, 1L, Some(1.0)),
      (3L, 2L, 1L, Some(1.0)), (4L, 1L, 0L, None)))
  }

  test("personalizedPageRank: dangling mass restarts at the seed; hand-computed 3-round path values") {
    import spark.implicits._
    // Path 1→2→3, seed {1}: round 3 sees the dangling tail's mass return
    // to the seed — node1 = .15 + .85·(0 + .7225) = .764125,
    // node2 = .85·.15 = .1275, node3 = .85·.1275 = .108375; Σ = 1.
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0)).toDF("src", "dst", "w")
    val out = Graph.personalizedPageRank(e, "src", "dst", "w", Seq(1L), 3)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq === Seq((1L, 0.764125), (2L, 0.1275), (3L, 0.108375)))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-9)
  }

  test("personalizedPageRank: non-seed components get rank only via reachability") {
    import spark.implicits._
    // Two disjoint cycles; seeding only {1,2} leaves {10,11} at zero.
    val e = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (10L, 11L, 1.0), (11L, 10L, 1.0))
      .toDF("src", "dst", "w")
    val out = Graph.personalizedPageRank(e, "src", "dst", "w", Seq(1L, 2L), 4)
      .orderBy($"node").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.filter(_._1 >= 10L).forall(_._2 === 0.0))
    assert(math.abs(out.map(_._2).sum - 1.0) < 1e-9)
  }

  test("kCore: the peel cascades — a tail vertex's removal demotes its neighbor next round") {
    import spark.implicits._
    // K4 {1,2,3,4} plus tail 4-5-6. k=2: round 1 peels only 6 (deg 1);
    // that demotes 5 to deg 1, so round 2 peels 5. The 2-core is K4.
    val k4 = for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)
    val e = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("a", "b")
    val after1 = Graph.kCore(e, "a", "b", 2, 1)
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after1.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 4L), (5L, 1L)))
    val after2 = Graph.kCore(e, "a", "b", 2, 2)
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(after2.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("labelPropagation: bridged triangles settle into their two communities; fixed rounds pin oscillation") {
    import spark.implicits._
    // Two triangles {1,2,3} and {4,5,6} joined by bridge 3-4. Hand-traced
    // sync rounds with the min tie-break: r1 (2,1,1,3,4,4), r2
    // (1,1,1,4,3,3), r3 (1,1,1,3,3,3) — stable from r3, so 4 rounds land
    // on the natural communities labeled by each side's min id. The
    // bridge does NOT merge them (it joins components but not majorities
    // — the contrast with connectedComponents).
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("a", "b")
    val out = Graph.labelPropagation(e, "a", "b", 4)
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((1L, 1L), (2L, 1L), (3L, 1L),
      (4L, 3L), (5L, 3L), (6L, 3L)))
    // Sync LPA on a single edge OSCILLATES by design — the fixed round
    // budget is what makes the trajectory deterministic, replayable by
    // the unrolled oracle on either parity.
    val edge = Seq((1L, 2L)).toDF("a", "b")
    val odd = Graph.labelPropagation(edge, "a", "b", 1)
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(odd.toSeq === Seq((1L, 2L), (2L, 1L)))
    val even = Graph.labelPropagation(edge, "a", "b", 2)
      .orderBy($"vertex").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(even.toSeq === Seq((1L, 1L), (2L, 2L)))
  }

  test("modularity: two bridged triangles under their natural split; shuffled labels score ~0") {
    import spark.implicits._
    // Triangles {1,2,3} and {4,5,6} plus bridge 3–4: m = 7. Natural
    // split: e_c = 3 each, d_c = 7 each → q_c = 3/7 − (7/14)² =
    // 0.178571 per side (Q = 0.357143).
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val good = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("v", "c")
    val g = graft.operators.Graph.modularity(edges, "a", "b", good, "v", "c")
      .orderBy($"community").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(g.toSeq === Seq(("A", 3L, 7L, 0.178571), ("B", 3L, 7L, 0.178571)))
    // A cross-cutting split (odd/even ids) captures almost nothing:
    // within-edges only {2-... none in A? odd = {1,3,5}: edges 1-3 and
    // 5-... 5-6 crosses; within = {1-3}; even = {2,4,6}: within = {4-6}.
    // e_c = 1 each, d_odd = 2+3+2 = 7, d_even = 7 →
    // q_c = 1/7 − 0.25 = −0.107143 each (Q < 0: worse than random).
    val bad = Seq((1L, "O"), (3L, "O"), (5L, "O"), (2L, "E"), (4L, "E"),
      (6L, "E")).toDF("v", "c")
    val b = graft.operators.Graph.modularity(edges, "a", "b", bad, "v", "c")
      .orderBy($"community").collect().map(r => (r.getString(0),
        r.getLong(1), r.getDouble(3)))
    assert(b.toSeq === Seq(("E", 1L, -0.107143), ("O", 1L, -0.107143)))
  }

  test("associationRules: hand-computed support/confidence/lift; the support prune drops rare pairs") {
    import spark.implicits._
    // 4 baskets: {a,b} ×3 and {a,c}. Pair (a,b): n=3, support 3/4,
    // conf(a→b) = 3/4, lift = 3·4/(4·3) = 1. Pair (a,c): n=1 — pruned
    // at minPairCount 2. Duplicate rows collapse (basket 1 lists a
    // twice).
    val li = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"),
      (3L, "a"), (3L, "b"), (4L, "a"), (4L, "c")).toDF("o", "p")
    val out = graft.operators.Graph.associationRules(li, "o", "p", 2, 10)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    assert(out.toSeq === Seq(("a", "b", 3L, 0.75, 0.75, 1.0)))
  }

  test("assortativity: a star is exactly -1, a barbell of stars is positive-correlated only at the bridge") {
    import spark.implicits._
    // Star K1,3: every edge joins degree 3 to degree 1 → r = -1 exactly.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("u", "v")
    val r1 = Graph.assortativity(star, "u", "v").collect().head
    assert(r1.getLong(0) === 3L)
    assert(math.abs(r1.getDouble(1) - (-1.0)) < 1e-9)
    // Two hubs bridged hub-to-hub: the bridge edge joins the two
    // high-degree ends, pulling r above the pure-star -1.
    val barbell = (Seq((0L, 10L)) ++ (1L to 3L).map(i => (0L, i)) ++
      (11L to 13L).map(i => (10L, i))).toDF("u", "v")
    val r2 = Graph.assortativity(barbell, "u", "v").collect().head
    assert(r2.getLong(0) === 7L)
    assert(r2.getDouble(1) > -1.0 && r2.getDouble(1) < 0.0)
  }

  test("assortativity: a degree-regular graph has zero degree variance → NULL, not an ANSI divide error") {
    import spark.implicits._
    val triangle = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("u", "v")
    val r = Graph.assortativity(triangle, "u", "v").collect().head
    assert(r.isNullAt(1))
  }

  test("landmarkBetweenness: with ALL vertices as landmarks the estimate is EXACT — path graph (interior (i-1)(n-i)) and diamond (split σ credit)") {
    import spark.implicits._
    // Path 1-2-3-4-5, all 5 vertices sampled → estimate = Σδ·n/(2L)
    // = Σδ/2 = the exact betweenness: interior vertex i carries
    // (i-1)(n-i) pairs → v3: 4, v2/v4: 3, endpoints 0.
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val out = Graph.landmarkBetweenness(path, "a", "b", 5, 4, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out === Map(1L -> 0.0, 2L -> 3.0, 3L -> 4.0, 4L -> 3.0,
      5L -> 0.0))
    // Diamond (4-cycle) 1-2-4, 1-3-4: every pair of opposite corners has
    // TWO shortest paths, so each broker vertex earns the σ-ratio HALF
    // credit a plain path counter misses — 2 and 3 split the (1,4)
    // pair, and symmetrically 1 and 4 split the (2,3) pair: all 0.5.
    val diamond = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
      .toDF("a", "b")
    val d = Graph.landmarkBetweenness(diamond, "a", "b", 4, 4, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(d === Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.5, 4L -> 0.5))
    // Depth cap honored: depth 1 sees no 2-hop pairs → all zero.
    val shallow = Graph.landmarkBetweenness(path, "a", "b", 5, 1, 10)
      .collect().map(_.getDouble(1))
    assert(shallow.forall(_ === 0.0))
  }
}
