package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph centrality for corpus curation. Web-scale training pipelines weight
  * pages by link-graph importance (the quality prior behind Common-Crawl
  * curation); this module provides the canonical such score — PageRank — as
  * a DataFrame-iterative operator, the same per-round join+aggregate shape
  * as [[Dedup.connectedComponents]].
  */
object Graph {

  /** Weighted PageRank over an edge list, a FIXED number of iterations.
    *
    * Numerical contract: contribution sums are floating-point and their
    * fold order differs between engines (Spark's partial aggregates vs any
    * oracle's), so every iteration's rank is rounded to `scaleDp` decimals
    * — both sides then carry IDENTICAL values into the next round and the
    * result is engine-portable (the repo's round-doubles convention, lifted
    * to fixed-point iteration). The sub-1e-13 true divergence is far below
    * the 1e-6 grain, so the rounding decides ties identically.
    *
    * Dangling nodes (no out-edges) are supported: their rank mass is
    * collected as ONE scalar aggregate per round (bounded driver metadata,
    * a single double) and redistributed uniformly — the standard
    * correction that keeps total rank at 1.
    *
    * Scale shape per round: one equi-join of ranks onto edges (both sides
    * hash-partitioned on the source — a co-partitioned join once AQE or
    * bucketing pins the layout), one hash aggregate on the destination,
    * one left join back to the node set; `localCheckpoint` after each
    * round truncates the growing lineage exactly like the
    * connected-components loop. Total cost: iterations × O(|E| + |V|),
    * never materializing anything quadratic. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iterations: Int,
               damping: Double = 0.85, scaleDp: Int = 6): DataFrame = {
    // The edge list and out-weight table are referenced by EVERY round
    // (contribs join + dangling anti-join): materialize both once, or an
    // upstream edge-build pipeline (e.g. j11's lineitem⋈orders) re-executes
    // per round — measured 21 s → ~6 s at sf0.1 for 5 rounds. Same
    // localCheckpoint idiom as the rank frontier below: lineage truncated,
    // blocks on executor storage (exactly what GraphX does with its edge
    // RDD across Pregel rounds).
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"),
      col(weightCol).cast("double").as("_w"))
      .localCheckpoint(eager = true)
    val nodes = e.select(col("_src").as("node"))
      .unionByName(e.select(col("_dst").as("node")))
      .distinct().localCheckpoint(eager = true)
    val nNodes = nodes.count()
    // Node-grain frames (ranks, out-weights, contribs) are V-sized; the
    // edge table is E-sized with V ≪ E on transaction/link graphs. A
    // checkpointed frame carries no size stats, so AQE never converts the
    // per-round rank⋈edge join to broadcast on its own and E shuffles
    // EVERY round (measured: the whole j11 budget). Size-switch on the
    // measured node count (knnJoin's broadcastQueries discipline): small
    // V → broadcast the node-grain side, edges never move; huge V (web
    // graphs) → the co-partitioned shuffle join, which AQE re-plans.
    val bcastV = nNodes <= 2000000
    def vSide(df: DataFrame): DataFrame = if (bcastV) broadcast(df) else df
    // V-sized and round-invariant: materialize once (cheap — V rows).
    // NOT folded into an E-sized edge+weight table: that costs a second
    // full E materialization up front, which measured as much as the five
    // rounds it saved joins from; as a broadcast the per-round join is a
    // map-side probe over the already-cached edge blocks anyway.
    val outW = e.groupBy(col("_src")).agg(sum(col("_w")).as("_ow"))
      .localCheckpoint(eager = true)
    // The dangling NODE SET is static — compute it once; per round its
    // rank mass folds in as a broadcast 1-row scalar aggregate inside the
    // round's single job (no per-round driver action: the old
    // `.head()` collect cost one extra job + round-trip per iteration).
    // When the set is EMPTY (every node has out-edges — j11's bipartite
    // transaction graph, most link graphs after trimming) the correction
    // term is identically 0.0 and the semi-join + aggregate + broadcast
    // are skipped per round outright; IEEE `x + 0.0 === x` on positive
    // rank sums keeps the emitted doubles bit-identical.
    val danglingNodes = nodes.join(vSide(outW.select(col("_src"))),
      nodes("node") === col("_src"), "left_anti")
      .localCheckpoint(eager = true)
    val hasDangling = danglingNodes.limit(1).count() > 0
    var ranks = nodes.withColumn("rank", lit(1.0 / nNodes))
    (1 to iterations).foreach { _ =>
      val contribs = e
        .join(vSide(ranks.withColumnRenamed("node", "_src")), Seq("_src"))
        .join(vSide(outW), Seq("_src"))
        .groupBy(col("_dst").as("node"))
        .agg(sum(col("rank") / col("_ow") * col("_w")).as("_c"))
      val joined = nodes.join(vSide(contribs), Seq("node"), "left_outer")
      val withDang =
        if (!hasDangling) joined.withColumn("_dm", lit(0.0))
        else {
          val dang = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
          joined.crossJoin(broadcast(dang))
        }
      ranks = withDang
        .select(col("node"), round(
          lit((1.0 - damping) / nNodes) +
            lit(damping) * (coalesce(col("_c"), lit(0.0)) +
              col("_dm") / nNodes),
          scaleDp).as("rank"))
        .localCheckpoint(eager = true)
    }
    ranks
  }

  /** Personalized PageRank (Jeh & Widom 2003): [[pageRank]] with the
    * teleport concentrated on a SEED set instead of uniform — rank mass
    * always restarts at the seeds, so scores measure proximity TO the
    * seeds, not global importance. The "more like these" recommender read
    * on a co-interaction graph (seed = one user's items; rank = what to
    * suggest), and the seed-expansion primitive of community detection.
    *
    * Same numerical contract (per-round `scaleDp` rounding, oracle
    * unrolls the identical trajectory) and the same per-round plan shape
    * as pageRank — one rank⋈edge equi-join, one destination agg, one
    * node-set left join, localCheckpoint. Dangling mass returns to the
    * SEEDS (the PPR-correct restart), folded as the same broadcast 1-row
    * scalar. The seed set is bounded driver metadata inlined as an
    * `isin` literal; seeds absent from the graph are simply never
    * ranked (their teleport share deterministically leaks — both engines
    * replay it identically). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String, seeds: Seq[Long],
                           iterations: Int, damping: Double = 0.85,
                           scaleDp: Int = 6): DataFrame = {
    require(seeds.nonEmpty, "need at least one seed")
    val e = edges.select(col(srcCol).as("_src"), col(dstCol).as("_dst"),
      col(weightCol).cast("double").as("_w"))
      .localCheckpoint(eager = true)
    val nodes = e.select(col("_src").as("node"))
      .unionByName(e.select(col("_dst").as("node")))
      .distinct().localCheckpoint(eager = true)
    val bcastV = nodes.count() <= 2000000
    def vSide(df: DataFrame): DataFrame = if (bcastV) broadcast(df) else df
    val outW = e.groupBy(col("_src")).agg(sum(col("_w")).as("_ow"))
      .localCheckpoint(eager = true)
    val danglingNodes = nodes.join(vSide(outW.select(col("_src"))),
      nodes("node") === col("_src"), "left_anti")
      .localCheckpoint(eager = true)
    val hasDangling = danglingNodes.limit(1).count() > 0
    val isSeed = col("node").isin(seeds: _*)
    val seedShare = 1.0 / seeds.size
    val teleport = (1.0 - damping) * seedShare
    var ranks = nodes.withColumn("rank",
      when(isSeed, lit(seedShare)).otherwise(lit(0.0)))
    (1 to iterations).foreach { _ =>
      val contribs = e
        .join(vSide(ranks.withColumnRenamed("node", "_src")), Seq("_src"))
        .join(vSide(outW), Seq("_src"))
        .groupBy(col("_dst").as("node"))
        .agg(sum(col("rank") / col("_ow") * col("_w")).as("_c"))
      val joined = nodes.join(vSide(contribs), Seq("node"), "left_outer")
      val withDang =
        if (!hasDangling) joined.withColumn("_dm", lit(0.0))
        else {
          val dang = ranks.join(danglingNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("_dm"))
          joined.crossJoin(broadcast(dang))
        }
      ranks = withDang
        .select(col("node"), round(
          when(isSeed, lit(teleport)).otherwise(lit(0.0)) +
            lit(damping) * (coalesce(col("_c"), lit(0.0)) +
              col("_dm") * when(isSeed, lit(seedShare)).otherwise(lit(0.0))),
          scaleDp).as("rank"))
        .localCheckpoint(eager = true)
    }
    ranks
  }

  /** Item-item co-occurrence with PMI — the "related items" projection of
    * a (user, item) bipartite interaction log: for every unordered item
    * pair sharing >= `minCount` distinct users, the shared-user count and
    * pointwise mutual information ln(N·c12 / (c1·c2)) with N the distinct
    * user population.
    *
    * Scale shape: interactions first collapse to DISTINCT (user, item) —
    * the per-user self-equi-join then generates each user's item-pair
    * set, the classic co-occurrence expansion that is quadratic in a
    * user's item count. At 100 TB the guard is contribution capping
    * (run [[Maintenance.contributionCap]]-style per-user item limits
    * first); the join itself hash-partitions on the user, never
    * broadcasting the interaction table. Marginals join AFTER pair
    * aggregation — item-vocabulary grain, broadcastable under AQE. */
  def cooccurrencePmi(df: DataFrame, userCol: String, itemCol: String,
                      minCount: Long): DataFrame = {
    val ui = df.select(col(userCol).as("_u"), col(itemCol).as("_i")).distinct()
    val c = ui.groupBy(col("_i")).agg(count(lit(1)).as("_c"))
    val n = ui.agg(countDistinct(col("_u")).cast("double").as("_n"))
    ui.as("a").join(ui.as("b"),
        col("a._u") === col("b._u") && col("a._i") < col("b._i"))
      .groupBy(col("a._i").as("item_a"), col("b._i").as("item_b"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .join(c.select(col("_i").as("item_a"), col("_c").as("_ca")), Seq("item_a"))
      .join(c.select(col("_i").as("item_b"), col("_c").as("_cb")), Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("c12").cast("long").as("c12"),
        round(log(col("_n") * col("c12") /
          (col("_ca").cast("double") * col("_cb"))), 4).as("pmi"))
  }

  /** k-hop reachability (bounded BFS) from a seed set over a DIRECTED
    * edge list: per hop, the set of nodes first reached at that distance
    * — the blast-radius query ("what does this item pull in within 3
    * hops") behind related-item expansion and contamination spread.
    * Returns (hop, n_nodes) plus the frontier node sets' sizes only;
    * callers needing the nodes take the per-hop frames.
    *
    * Scale shape per hop: one frontier⋈edges equi-join + distinct + one
    * anti-join against the visited set; frontier and visited are
    * node-grain (V-bounded) and localCheckpoint after each hop truncates
    * the loop lineage — the [[pageRank]]/connected-components loop
    * discipline. Hop count is FIXED (bounded rounds), never
    * run-to-convergence. */
  def kHopCounts(edges: DataFrame, srcCol: String, dstCol: String,
                 seed: DataFrame, seedCol: String, hops: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("_u"), col(dstCol).as("_v"))
      .distinct().localCheckpoint(eager = true)
    var frontier = seed.select(col(seedCol).as("node")).distinct()
      .localCheckpoint(eager = true)
    var visited = frontier
    var out = frontier.groupBy()
      .agg(count(lit(1)).cast("long").as("n_nodes"))
      .select(lit(0).as("hop"), col("n_nodes"))
    (1 to hops).foreach { h =>
      frontier = e.join(frontier, col("_u") === col("node"))
        .select(col("_v").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(eager = true)
      visited = visited.unionByName(frontier).localCheckpoint(eager = true)
      out = out.unionByName(frontier.groupBy()
        .agg(count(lit(1)).cast("long").as("n_nodes"))
        .select(lit(h).as("hop"), col("n_nodes")))
    }
    out
  }

  /** HITS hub/authority scores over a directed (bipartite-friendly) edge
    * list, a FIXED number of iterations — the two-sided importance score
    * for interaction graphs (buyers ↔ products, crawlers ↔ hosts): an
    * authority is valued by the hubs pointing at it, a hub by the
    * authorities it finds. Complements [[pageRank]] (one-sided, random-
    * walk semantics).
    *
    * Same numerical contract as pageRank: every normalize is followed by
    * a 6-dp round, so both engines carry IDENTICAL score tables into the
    * next half-step and the fixed-point iteration is engine-portable
    * (the oracle unrolls the same halves as generated CTEs).
    *
    * Scale shape per half-step: one edge⋈score equi-join + one hash agg
    * at node grain + ONE scalar norm aggregate broadcast back; the
    * node-grain score side broadcasts when it measurably fits (the
    * pageRank bcastV discipline), else the co-partitioned shuffle join.
    * localCheckpoint truncates the per-round lineage. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iterations: Int): DataFrame = {
    val e = edges.select(col(srcCol).as("_s"), col(dstCol).as("_t"))
      .distinct().localCheckpoint(eager = true)
    var h = e.select(col("_s").as("node")).distinct()
      .withColumn("score", lit(1.0)).localCheckpoint(eager = true)
    val bcastV = h.count() <= 5000000L
    def vSide(df: DataFrame): DataFrame = if (bcastV) broadcast(df) else df
    var a: DataFrame = null
    def halfStep(scores: DataFrame, joinKey: String,
                 outKey: String): DataFrame = {
      val raw = e.join(vSide(scores.withColumnRenamed("node", joinKey)
          .withColumnRenamed("score", "_in")), Seq(joinKey))
        .groupBy(col(outKey).as("node"))
        .agg(sum(col("_in")).as("_raw"))
      val nrm = raw.agg(sqrt(sum(col("_raw") * col("_raw"))).as("_nrm"))
      raw.crossJoin(broadcast(nrm))
        .select(col("node"), round(col("_raw") / col("_nrm"), 6).as("score"))
        .localCheckpoint(eager = true)
    }
    (1 to iterations).foreach { _ =>
      a = halfStep(h, "_s", "_t") // authorities gather hub mass
      h = halfStep(a, "_t", "_s") // hubs gather authority mass
    }
    h.select(lit("hub").as("role"), col("node"), col("score"))
      .unionByName(
        a.select(lit("authority").as("role"), col("node"), col("score")))
  }

  /** Per-vertex triangle participation over an undirected edge list — the
    * clustering-structure read on a co-occurrence graph (which items form
    * tight cliques, vs. merely popular hubs). Input may carry duplicate /
    * reversed pairs; they are canonicalized and deduped first.
    *
    * Scale shape — degree-ordered orientation (the classic O(E^1.5)
    * bound): every edge is directed from its lower-(degree, id) endpoint
    * to the higher, so each triangle is enumerated EXACTLY once, as the
    * out-wedge of its minimal vertex, and the wedge join's cost is
    * Σ outdeg² with outdeg ≤ O(√E) — a hub of degree d in id-ordered
    * orientation would cost d², here it costs at most E. Three equi-joins
    * total (degrees on, wedge self-join, closure against the canonical
    * edge set) and one hash aggregate; the V-grain degree table joins
    * broadcast when small. Counts are exact, not sampled.
    */
  def trianglesPerVertex(edges: DataFrame, aCol: String,
                         bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true) // referenced twice: orientation + closure
    val deg = und.select(col("u").as("n"))
      .unionByName(und.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(eager = true)
    // V-grain side: broadcast when it measurably fits (pageRank's bcastV /
    // knnJoin's broadcastQueries discipline), else the co-partitioned
    // shuffle join — a checkpointed frame has no stats for AQE to decide.
    val vSide: DataFrame => DataFrame =
      if (deg.count() <= 5000000L) broadcast _ else identity
    val dir = und
      .join(vSide(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du")), Seq("u"))
      .join(vSide(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv")), Seq("v"))
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("s"),
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("t"))
    val wedges = dir.as("e1").join(dir.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    val tri = wedges.join(und,
      least(col("b"), col("c")) === col("u") &&
        greatest(col("b"), col("c")) === col("v"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vertex"))
      .groupBy(col("vertex"))
      .agg(count(lit(1)).cast("long").as("triangles"))
  }

  /** Adamic-Adar link prediction (Adamic & Adar 2003) — for vertex pairs
    * NOT currently connected, score Σ_{w ∈ N(x)∩N(y)} 1/ln(deg(w)): a
    * shared rare neighbor is strong evidence, a shared hub is weak. The
    * recommendation read over a co-occurrence graph ("parts that will be
    * co-ordered next"), and the standard baseline every learned link
    * predictor is judged against.
    *
    * Scale shape: wedges come from ONE self-equi-join of the bidirectional
    * edge list on the CENTER vertex (cost Σ_w deg(w)² — j12's documented
    * expansion; compose x60's contribution cap upstream to tame
    * super-hubs, whose 1/ln(d) weight is asymptotically negligible
    * anyway). Degrees join in at V grain (broadcast when small), existing
    * edges leave via one anti-join on the canonical pair, and the top-k
    * cut is a TakeOrdered, never a global sort. A common neighbor has ≥ 2
    * distinct neighbors by construction, so deg ≥ 2 and ln(deg) > 0 —
    * no division guard is needed, but degenerate self-loop inputs are
    * dropped during canonicalization. */
  def adamicAdar(edges: DataFrame, aCol: String, bCol: String,
                 k: Int): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true) // referenced twice: wedges + anti-join
    val bi = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val deg = bi.groupBy(col("u").as("w"))
      .agg(count(lit(1)).cast("long").as("d"))
    val vSide: DataFrame => DataFrame =
      if (und.count() <= 2500000L) broadcast _ else identity
    val wedges = bi.as("a").join(bi.as("b"),
        col("a.v") === col("b.v") && col("a.u") < col("b.u"))
      .select(col("a.u").as("x"), col("b.u").as("y"), col("a.v").as("w"))
    wedges.join(vSide(deg), Seq("w"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).cast("long").as("common_neighbors"),
        sum(lit(1.0) / log(col("d").cast("double"))).as("_aa"))
      .join(und, col("x") === col("u") && col("y") === col("v"), "left_anti")
      .select(col("x").as("part_a"), col("y").as("part_b"),
        col("common_neighbors"), round(col("_aa"), 6).as("aa_score"))
      .orderBy(col("aa_score").desc, col("part_a").asc, col("part_b").asc)
      .limit(k)
  }

  /** Local clustering coefficient per vertex (Watts & Strogatz 1998):
    * lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1)) — what fraction of v's
    * neighbor pairs are themselves connected. The per-vertex refinement
    * of j24's raw triangle counts: a popular hub with few closed wedges
    * reads near 0, a clique member reads 1; degree-1 vertices have no
    * neighbor pair and emit NULL, not a division error.
    *
    * Scale shape: triangle counts reuse [[trianglesPerVertex]]'s
    * degree-ordered O(E^1.5) enumeration; degrees are one V-grain agg;
    * the stitch is a single left join at V grain (triangle side is the
    * smaller, broadcast when it fits). */
  def localClustering(edges: DataFrame, aCol: String,
                      bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true)
    val deg = und.select(col("u").as("vertex"))
      .unionByName(und.select(col("v").as("vertex")))
      .groupBy(col("vertex")).agg(count(lit(1)).cast("long").as("degree"))
    val tri = trianglesPerVertex(und, "u", "v")
    val tSide: DataFrame => DataFrame =
      if (und.count() <= 2500000L) broadcast _ else identity
    deg.join(tSide(tri), Seq("vertex"), "left")
      .na.fill(0L, Seq("triangles"))
      .select(col("vertex"), col("degree"), col("triangles"),
        when(col("degree") > 1L,
          round((lit(2.0) * col("triangles")) /
            (col("degree") * (col("degree") - 1L)).cast("double"), 6))
          .as("lcc"))
  }

  /** Bounded-round k-core peeling (Seidman 1983; the distributed
    * formulation of Montresor et al. 2013 runs exactly this round-limited
    * cascade): each round drops every vertex whose CURRENT degree is
    * below k, then the edges touching it — removing a weak vertex can
    * demote its neighbors, so the peel cascades. After `rounds` rounds
    * the surviving subgraph's degree table is returned; with enough
    * rounds that is the k-core, and the FIXED round budget is the
    * determinism contract (the pageRank discipline — the trajectory, not
    * a data-dependent fixed point, is what both engines replay; the
    * oracle unrolls the same rounds as chained CTEs). The dense-cohesion
    * read one notch stronger than j38's local coefficient: a high-lcc
    * vertex can still sit in a sparse fringe, a k-core member cannot.
    *
    * Scale shape per round: ONE V-grain degree agg + two semi-joins of
    * the edge list against the (broadcast-when-small) survivor set;
    * per-round localCheckpoint truncates the growing lineage exactly as
    * pageRank's loop does. Cost is O(rounds · E) worst case. */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            rounds: Int): DataFrame = {
    var e = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(eager = true)
    val vSide: DataFrame => DataFrame =
      if (e.count() <= 2500000L) broadcast _ else identity
    (1 to rounds).foreach { _ =>
      val keep = e.select(col("u").as("w"))
        .unionByName(e.select(col("v").as("w")))
        .groupBy(col("w")).agg(count(lit(1)).as("_deg"))
        .where(col("_deg") >= k).select(col("w"))
      e = e
        .join(vSide(keep.select(col("w").as("u"))), Seq("u"), "left_semi")
        .join(vSide(keep.select(col("w").as("v"))), Seq("v"), "left_semi")
        .localCheckpoint(eager = true)
    }
    e.select(col("u").as("vertex"))
      .unionByName(e.select(col("v").as("vertex")))
      .groupBy(col("vertex"))
      .agg(count(lit(1)).cast("long").as("core_degree"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) with
    * deterministic ties — the near-linear community detector: labels init
    * to vertex ids and each round every vertex adopts the MOST FREQUENT
    * label among its neighbors, ties to the smallest label. Synchronous
    * updates + the min tie-break make each round a pure function of the
    * previous one, and the FIXED `rounds` budget is the determinism
    * contract (the pageRank/kCore discipline: both engines replay the
    * same trajectory — synchronous LPA can oscillate on bipartite
    * structure, so a data-dependent fixpoint would not even be well
    * defined). Communities are finer than [[graft.operators.Dedup]]'s
    * connected components (a bridge edge joins two components but rarely
    * flips a majority) — grade the resulting partition with
    * [[modularity]].
    *
    * Scale shape per round: ONE edges ⋈ labels equi-join (labels
    * broadcast when the vertex set is small — checkpointed frames carry
    * no stats, so the switch is on a measured count), a map-side-combined
    * (vertex, label) count, and a `min(struct(-cnt, label))` argmax — no
    * windows, nothing vertex-quadratic; per-round localCheckpoint cuts
    * the growing lineage. Output: (vertex, label). */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       rounds: Int): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // r14 OPT: one-pass explode — the union of two projections referenced
    // the un-checkpointed `und` (and through it the caller's co-purchase
    // self-join, for j61) twice inside this checkpoint job.
    val both = und
      .select(explode(array(
        struct(col("u").as("src"), col("v").as("dst")),
        struct(col("v").as("src"), col("u").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .localCheckpoint(eager = true)
    var labels = both.select(col("src").as("vertex")).distinct()
      .withColumn("label", col("vertex"))
      .localCheckpoint(eager = true)
    val lSide: DataFrame => DataFrame =
      if (labels.count() <= 2500000L) broadcast _ else identity
    (1 to rounds).foreach { _ =>
      labels = both
        .join(lSide(labels.select(col("vertex").as("dst"), col("label"))),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("_c"))
        .groupBy(col("src"))
        .agg(min(struct((-col("_c")).as("_nc"), col("label").as("_l")))
          .as("_b"))
        .select(col("src").as("vertex"), col("_b._l").as("label"))
        .localCheckpoint(eager = true)
    }
    labels
  }

  /** Communities over the TOP-K co-occurrence graph: the bipartite
    * (user, item) observations project to item–item co-counts, each item
    * keeps only its `topK` strongest partners (count desc, partner-id
    * tie-break — the standard kNN-graph construction), and
    * [[labelPropagation]] runs its fixed-round trajectory over the
    * undirected union. The top-K cut is what makes the graph
    * SCALE-STABLE: a fixed co-count threshold saturates as volume grows
    * (every pair eventually crosses it — measured complete-graph
    * collapse at 10× volume on the fixed-threshold variant), while
    * degree ≤ topK holds at any scale, so the LPA cost stays
    * item-count-bounded forever. The maintained read behind
    * [[graft.streaming.Streaming.runStreamLabelProp]]'s snapshots.
    *
    * Scale shape: the projection is one equi-join at observation grain +
    * one co-grain agg (the j12 bipartite-projection shape); top-K rides
    * per-ITEM windows; LPA inherits [[labelPropagation]]'s
    * broadcast-labels rounds. */
  def topCooccurrenceCommunities(ui: DataFrame, userCol: String,
                                 itemCol: String, topK: Int,
                                 rounds: Int): DataFrame = {
    val u = ui.select(col(userCol).as("_u"), col(itemCol).as("_i"))
      .distinct()
    val co = u.as("a")
      .join(u.as("b"),
        col("a._u") === col("b._u") && col("a._i") =!= col("b._i"))
      .groupBy(col("a._i").as("_x"), col("b._i").as("_y"))
      .agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_x"))
      .orderBy(col("_c").desc, col("_y"))
    val top = co.withColumn("_rn", row_number().over(w))
      .where(col("_rn") <= topK)
      .select(col("_x"), col("_y"))
    labelPropagation(top, "_x", "_y", rounds)
  }

  /** Modularity of a GIVEN vertex partition (Newman & Girvan 2004):
    * per community c, q_c = e_c/m − (d_c/2m)², summing to the familiar
    * Q — how much denser the within-community edges are than a degree-
    * preserving random rewiring. The audit read for any clustering this
    * engine produces (label-prop dedup clusters, k-means cohorts, or an
    * external taxonomy): Q ≈ 0 means the labels don't explain the graph.
    * Emitted per community so the blame is localized, not just scalar.
    *
    * Scale shape: the edge list is materialized once (localCheckpoint —
    * it feeds m, within-edges, and degrees); community labels join
    * BROADCAST (a dimension); m is a broadcast scalar row. Everything
    * aggregates to community grain before any join. */
  def modularity(edges: DataFrame, aCol: String, bCol: String,
                 labels: DataFrame, vCol: String,
                 labelCol: String): DataFrame = {
    val e = edges.select(col(aCol).as("_a"), col(bCol).as("_b"))
      .localCheckpoint(eager = true) // read 3x: m, within-edges, degrees
    val lab = labels.select(col(vCol).as("_v"), col(labelCol).as("_c"))
    val m = e.agg(count(lit(1)).cast("long").as("_m"))
    val ec = e
      .join(broadcast(lab.select(col("_v").as("_a"), col("_c").as("_ca"))),
        Seq("_a"))
      .join(broadcast(lab.select(col("_v").as("_b"), col("_c").as("_cb"))),
        Seq("_b"))
      .where(col("_ca") === col("_cb"))
      .groupBy(col("_ca").as("_cc"))
      .agg(count(lit(1)).cast("long").as("_ein"))
    val dc = e.select(col("_a").as("_v"))
      .unionByName(e.select(col("_b").as("_v")))
      .groupBy(col("_v")).agg(count(lit(1)).cast("long").as("_d"))
      .join(broadcast(lab), Seq("_v"))
      .groupBy(col("_c")).agg(sum(col("_d")).cast("long").as("_dsum"))
    val half = col("_dsum").cast("double") / (lit(2L) * col("_m"))
    dc.join(broadcast(ec), col("_c") === col("_cc"), "left")
      .na.fill(0L, Seq("_ein"))
      .crossJoin(broadcast(m))
      .select(col("_c").as("community"), col("_ein").as("edges_within"),
        col("_dsum").as("degree_sum"),
        round(col("_ein").cast("double") / col("_m") - half * half, 6)
          .as("q_c"))
  }

  /** Landmark-sampled BETWEENNESS centrality — the centrality-beyond-
    * degree read the graph family lacked (j24/j39/j40 measure cohesion;
    * nothing measured brokerage): Brandes' dependency accumulation
    * (Brandes 2001) run from a BOUNDED set of `nLandmarks` sampled
    * sources (the Brandes–Pich 2007 estimator), depth-capped at
    * `maxDepth`. Per landmark s: a forward BFS counts shortest paths
    * (σ exact LONGs — level d+1's σ is the sum of its level-d
    * predecessors'), then the backward pass folds dependencies level by
    * level, δ_d(v) = Σ_{w: (v,w) edge, w at d+1} σ_v/σ_w · (1 + δ(w)).
    * The estimate bc(v) = Σ_s δ_s(v) · n/(2·nLandmarks) extrapolates
    * the sample to all-sources betweenness (the /2 is the undirected
    * double-count).
    *
    * Determinism: landmarks are a hash-ordered `limit` (the
    * [[graft.operators.Curation]] scatter — bounded by construction,
    * never a corpus fraction); σ is integer-exact under any
    * partitioning. δ is carried as INTEGER MICRO-UNITS (1e-6): each
    * neighbor term rounds to a LONG count of micro-units (one
    * IEEE-deterministic divide/multiply chain per term), so every level
    * aggregation is an ASSOCIATIVE integer sum — a 6-dp-rounded DOUBLE
    * trajectory was measured flipping a few cells per run at ~64k
    * (landmark, vertex, level) cells from summation-order drift alone;
    * integer sums make the trajectory partitioning-proof on both
    * engines. Output rounds 4 dp with the (bc desc, vertex) tie-break.
    *
    * Scale shape: every frontier/visited/δ frame is keyed (s, vertex) —
    * at most nLandmarks × |reach| rows, all equi-joins on vertex, no
    * windows, no driver-side graph; per-level localCheckpoint cuts the
    * growing lineage exactly like [[labelPropagation]]'s rounds. Depth
    * and landmark count are the cost caps: O(depth · nLandmarks · |E|)
    * worst case, independent of total vertex count beyond the BFS
    * reach. */
  def landmarkBetweenness(edges: DataFrame, aCol: String, bCol: String,
                          nLandmarks: Int, maxDepth: Int,
                          topN: Int): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("u"),
        greatest(col(aCol), col(bCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    // r14 OPT: one-pass explode — the old two-projection union executed
    // `und` (and the caller's co-purchase self-join, for j66) twice
    // inside this checkpoint job.
    val both = und
      .select(explode(array(
        struct(col("u").as("_bs"), col("v").as("_bd")),
        struct(col("v").as("_bs"), col("u").as("_bd")))).as("_e"))
      .select(col("_e._bs").as("_bs"), col("_e._bd").as("_bd"))
      .localCheckpoint(eager = true) // read every forward + backward level
    val verts = both.select(col("_bs").as("vertex")).distinct()
      .localCheckpoint(eager = true)
    val nV = verts.count()
    val lm = verts
      .orderBy(pmod(pmod(col("vertex"), lit(9973L)) * lit(2654435761L),
        lit(9973L)), col("vertex"))
      .limit(nLandmarks)
    // Forward: levels(d) = (s, vertex, sigma) for vertices FIRST reached
    // at distance d from landmark s; sigma = #shortest s→vertex paths.
    val l0 = lm.select(col("vertex").as("s"), col("vertex"),
        lit(1L).as("sigma"))
      .localCheckpoint(eager = true)
    val levels = scala.collection.mutable.ArrayBuffer(l0)
    // r13 OPT: `visited` is the union of the already-checkpointed level
    // frames — re-checkpointing the growing union each round re-cached
    // every prior level's rows again (one extra job + duplicate blocks
    // per round); a plain union over cached blocks is the same scan
    // without the re-materialization.
    def visited: DataFrame = levels.map(_.select(col("s"), col("vertex")))
      .reduce(_ unionByName _)
    (1 to maxDepth).foreach { _ =>
      val nxt = levels.last
        .join(both, col("vertex") === col("_bs"))
        .select(col("s"), col("_bd").as("vertex"), col("sigma"))
        .join(visited, Seq("s", "vertex"), "left_anti")
        .groupBy(col("s"), col("vertex"))
        .agg(sum(col("sigma")).cast("long").as("sigma"))
        .localCheckpoint(eager = true)
      levels += nxt
    }
    // Backward: deepest level's δ = 0; level d folds its successors.
    // delta_u = δ in integer micro-units (see the determinism note).
    var delta = levels(maxDepth)
      .select(col("s"), col("vertex"), lit(0L).as("delta_u"))
    var allDelta = delta
    (maxDepth - 1 to 0 by -1).foreach { d =>
      val w = levels(d + 1)
        .join(delta, Seq("s", "vertex"))
        .select(col("s").as("_ws"), col("vertex").as("_wv"),
          col("sigma").as("_wsig"), col("delta_u").as("_wd"))
      delta = levels(d)
        .join(both, col("vertex") === col("_bs"), "left_outer")
        .join(w, col("_ws") === col("s") && col("_wv") === col("_bd"),
          "left_outer")
        .groupBy(col("s"), col("vertex"))
        .agg(coalesce(sum(round(col("sigma").cast("double") / col("_wsig")
            * (lit(1.0) + col("_wd") / lit(1e6)) * lit(1e6))
          .cast("long")), lit(0L)).as("delta_u"))
        .localCheckpoint(eager = true)
      allDelta = allDelta.unionByName(delta)
    }
    val factor = nV.toDouble / (2.0 * nLandmarks)
    allDelta.where(col("vertex") =!= col("s"))
      .groupBy(col("vertex"))
      .agg(round(sum(col("delta_u")).cast("double") / lit(1e6)
        * lit(factor), 4).as("bc_est"))
      .orderBy(col("bc_est").desc, col("vertex"))
      .limit(topN)
  }

  /** Association rules over baskets (Agrawal et al. 1993): item pairs
    * with support, directional confidence, and lift — the market-basket
    * read [[cooccurrencePmi]]'s information-theoretic lift doesn't give
    * a merchandiser: "customers who bought a also bought b, `conf` of
    * the time, `lift`× more than chance". Pairs below `minPairCount`
    * never surface (the Apriori support prune).
    *
    * Scale shape: distinct-collapse to (basket, item) FIRST, pair
    * generation as a same-basket equi-join (never all-pairs across
    * baskets), item marginals broadcast back at vocabulary grain, and
    * the top-k by lift is TakeOrderedAndProject. The basket table is
    * materialized once and read thrice. */
  def associationRules(baskets: DataFrame, basketCol: String,
                       itemCol: String, minPairCount: Int,
                       k: Int): DataFrame = {
    val li = baskets.select(col(basketCol).as("_o"), col(itemCol).as("_p"))
      .distinct()
      .localCheckpoint(eager = true) // totals + marginals + pair join
    val n = li.agg(countDistinct(col("_o")).cast("long").as("_n"))
    val ic = li.groupBy(col("_p")).agg(count(lit(1)).cast("long").as("_c"))
    val pc = li.select(col("_o"), col("_p").as("pa"))
      .join(li.select(col("_o"), col("_p").as("pb")), Seq("_o"))
      .where(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).cast("long").as("n_pair"))
      .where(col("n_pair") >= minPairCount.toLong)
    pc.join(broadcast(ic.select(col("_p").as("pa"), col("_c").as("_ca"))),
        Seq("pa"))
      .join(broadcast(ic.select(col("_p").as("pb"), col("_c").as("_cb"))),
        Seq("pb"))
      .crossJoin(broadcast(n))
      .select(col("pa"), col("pb"), col("n_pair"),
        round(col("n_pair").cast("double") / col("_n"), 6).as("support"),
        round(col("n_pair").cast("double") / col("_ca"), 6)
          .as("conf_a_to_b"),
        round(col("n_pair").cast("double") * col("_n") /
          (col("_ca") * col("_cb").cast("double")), 4).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(k)
  }

  /** Degree assortativity (Newman 2002): the Pearson correlation of the
    * degrees at the two ends of an edge — positive means hubs link to
    * hubs (social-network shape), negative means hubs fan out to leaves
    * (dependency/star shape). The one-number topology read that says
    * whether co-occurrence clusters (x25's input) will be balanced or
    * hub-dominated before running them.
    *
    * Both orientations of every undirected edge enter the sum, so the
    * correlation is symmetric by construction and the usual
    * excess-degree formula collapses to plain Pearson over the doubled
    * edge list: r = (Σjk/2m − (Σj/2m)²) / (Σj²/2m − (Σj/2m)²). Every
    * numerator/denominator input is an exact BIGINT sum — the single
    * division happens once at the end, on both engines.
    *
    * Scale shape: one V-grain degree agg, two degree joins back onto the
    * doubled edge list (node-key equi-joins at dimension grain), one
    * scalar aggregate. Nothing quadratic, no windows. */
  def assortativity(edges: DataFrame, srcCol: String,
                    dstCol: String): DataFrame = {
    val bi = edges.select(col(srcCol).as("u"), col(dstCol).as("v"))
      .unionByName(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
    val deg = bi.groupBy(col("u").as("n"))
      .agg(count(lit(1)).cast("long").as("k"))
    val ek = bi
      .join(deg.select(col("n").as("u"), col("k").as("ku")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("k").as("kv")), Seq("v"))
    // A degree-regular graph has zero degree variance: the correlation is
    // undefined and ANSI division would throw — emit NULL instead.
    ek.agg(count(lit(1)).cast("long").as("_m2"),
        sum(col("ku") * col("kv")).cast("long").as("_sjk"),
        sum(col("ku")).cast("long").as("_sj"),
        sum(col("ku") * col("ku")).cast("long").as("_sj2"))
      .select(col("_m2"), col("_sjk"),
        (col("_sjk").cast("double") / col("_m2") -
          (col("_sj").cast("double") / col("_m2")) *
            (col("_sj").cast("double") / col("_m2"))).as("_num"),
        (col("_sj2").cast("double") / col("_m2") -
          (col("_sj").cast("double") / col("_m2")) *
            (col("_sj").cast("double") / col("_m2"))).as("_den"))
      .select((col("_m2") / 2).cast("long").as("n_edges"),
        when(col("_den") =!= 0.0, round(col("_num") / col("_den"), 6))
          .as("assortativity"))
  }
}
