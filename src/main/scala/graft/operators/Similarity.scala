package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (north-star extension).
  *
  * Baseline: brute-force cosine top-k against a broadcast query vector —
  * one parallel scan, no shuffle until the final top-k
  * (TakeOrderedAndProject). The scale path for k-NN over many queries is
  * [[ivfTopK]]: vectors are bucketed by nearest coarse centroid and only
  * the probed buckets are scanned (the classic IVF layout; at cluster
  * scale the centroid assignment becomes the partition key).
  *
  * All arithmetic is element-wise double (floats cast per element before
  * multiply) folded left-to-right, so an oracle engine doing the same
  * sequential fold reproduces the sums bitwise.
  */
object Similarity {

  /** Sequential left-fold dot product of two float-array columns in double
    * precision (deterministic order ⇒ engine-portable). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v))

  /** Cosine via built-in higher-order functions — the semantic reference
    * for [[graft.functions.CosineSim]] (kept for the exact-equality spec;
    * HOFs evaluate interpreted, so the hot paths use the native
    * expression). */
  def cosineFold(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine similarity — native codegen'd expression, bitwise-equal to
    * [[cosineFold]] (same element-order double folds). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** Brute-force cosine top-k of `embeddings` (idCol, vecCol) against the
    * single query row `queryId`. Output: (idCol, label passthroughs...,
    * sim) — top `k` by sim desc, id asc. */
  def cosineTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                 queryId: Long, k: Int, passthrough: Seq[String] = Nil): DataFrame = {
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    val out = embeddings.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", round(cosine(col(vecCol), col("_qv")), 6))
    out.select((col(idCol) +: passthrough.map(col)) :+ col("sim"): _*)
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-bucketed approximate top-k: assign every vector to its nearest of
    * `nCentroids` coarse centroids (here: the first `nCentroids` vectors by
    * id — deterministic stand-in for trained centroids), then scan only the
    * `nProbe` centroids nearest to the query. At scale the assignment is
    * the partition key, so a probe touches nProbe/nCentroids of the data.
    *
    * The centroid set is tiny by construction (coarse quantizer), so it is
    * collected once and inlined as a literal array: nearest-centroid
    * assignment is then ONE codegen projection per row — cosine against each
    * centroid, argmax via `array_position(sims, array_max(sims))` (first
    * occurrence ⇒ ties break to the smallest cid, matching ORDER BY d DESC,
    * cid ASC). No crossJoin row blow-up, no window, no Exchange before the
    * probe join.
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cids, cvecs) = centroids(embeddings, idCol, vecCol, nCentroids)
    val cidLit = typedlit(cids)
    val cvLit = typedlit(cvecs)
    val assigned = embeddings
      .withColumn("_sims", transform(cvLit, c => cosine(col(vecCol), c)))
      .withColumn("_cid", element_at(cidLit,
        array_position(col("_sims"), array_max(col("_sims"))).cast("int")))
      .select(col(idCol), col(vecCol), col("_cid"))
    // Probe set: the nProbe centroids closest to the query vector — a
    // LocalRelation of the collected centroids (no re-scan) × the 1-row
    // query, so the arithmetic stays the engine's own.
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    val probed = cids.zip(cvecs).toDF("_cid", "_cv")
      .crossJoin(broadcast(q))
      .withColumn("_d", cosine(col("_cv"), col("_qv")))
      .orderBy(col("_d").desc, col("_cid").asc).limit(nProbe)
      .select(col("_cid"))
    assigned
      .join(broadcast(probed), Seq("_cid"))
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", round(cosine(col(vecCol), col("_qv")), 6))
      .select(col(idCol), col("_cid").as("centroid_id"), col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Coarse centroid set: first `nCentroids` vectors by id (deterministic
    * stand-in for trained centroids), collected once — bounded metadata,
    * the coarse quantizer is tiny by construction. */
  private def centroids(embeddings: DataFrame, idCol: String, vecCol: String,
                        nCentroids: Int): (Seq[Long], Seq[Seq[Float]]) = {
    val rows = embeddings.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol), col(vecCol)).collect()
    (rows.map(_.getLong(0)).toSeq, rows.map(_.getSeq[Float](1)).toSeq)
  }

  /** Materialize the IVF index: the centroid assignment persisted
    * PARTITIONED BY `centroid_id` — the executable form of "at scale the
    * assignment becomes the partition key". Build is one codegen
    * projection (broadcast centroid literals, argmax — same assignment as
    * [[ivfTopK]]) plus one partitioned write; no shuffle, no crossJoin. */
  def buildIvfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                    nCentroids: Int, indexPath: String): Unit =
    buildIvfIndex(embeddings, idCol, vecCol,
      centroids(embeddings, idCol, vecCol, nCentroids), indexPath)

  private def buildIvfIndex(embeddings: DataFrame, idCol: String, vecCol: String,
                            cents: (Seq[Long], Seq[Seq[Float]]),
                            indexPath: String): Unit = {
    val (cids, cvecs) = cents
    val assigned = assignToCentroids(embeddings, idCol, vecCol, cids, cvecs)
      // One file per centroid partition (see CLAUDE.md / the upsert sink's
      // writePartitioned): without this pre-shuffle every task fans a file
      // into every centroid dir.
      .repartition(col("centroid_id"))
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(indexPath)
    // The signature travels WITH the build (not only via ivfIndexTopK's
    // lazy path): append maintenance needs the frozen centroid identity,
    // and the sidecar carries the VECTORS too so recovery never scans
    // the layout (ADVICE r9).
    writeSignature(embeddings.sparkSession, indexPath, cids, cvecs)
  }

  /** The frozen-centroid assignment projection shared by the full build
    * and [[appendToIvfIndex]]: centroid literals inlined, argmax via
    * first-occurrence array_position (ties to the earliest centroid in
    * signature order, matching ORDER BY d DESC, cid ASC). */
  private def assignToCentroids(vectors: DataFrame, idCol: String,
                                vecCol: String, cids: Seq[Long],
                                cvecs: Seq[Seq[Float]]): DataFrame = {
    val cidLit = typedlit(cids)
    val cvLit = typedlit(cvecs)
    vectors
      .withColumn("_sims", transform(cvLit, c => cosine(col(vecCol), c)))
      .withColumn("centroid_id", element_at(cidLit,
        array_position(col("_sims"), array_max(col("_sims"))).cast("int")))
      .select(col(idCol), col(vecCol), col("centroid_id"))
  }

  /** The index's identity: which centroids it was built against. Stored
    * beside the data so a probe can detect a stale index. */
  private def indexSignature(cids: Seq[Long]): String = cids.mkString(",")

  private def indexFsFor(spark: SparkSession, indexPath: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexPath), spark.sparkContext.hadoopConfiguration)

  private def sigPathFor(indexPath: String) =
    new org.apache.hadoop.fs.Path(indexPath, "_centroids")

  /** Sidecar layout (ADVICE r9: the layout's partitions are ALL
    * centroid-id partitions, so an id-list filter prunes nothing at the
    * partition level — centroid RECOVERY must not touch the layout at
    * all): line 1 is the cid csv (the signature — its order IS the argmax
    * tie-break order), then one `cid:v1,v2,...` line per centroid
    * carrying the frozen vector itself. Float.toString round-trips
    * exactly through Float.parseFloat (Java guarantee), so the recovered
    * quantizer is bit-identical to the built one. */
  private def writeSignature(spark: SparkSession, indexPath: String,
                             cids: Seq[Long], cvecs: Seq[Seq[Float]]): Unit = {
    val body = (indexSignature(cids) +:
      cids.zip(cvecs).map { case (cid, v) =>
        s"$cid:${v.mkString(",")}" }).mkString("\n")
    val out = indexFsFor(spark, indexPath).create(sigPathFor(indexPath), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  private def readSidecar(spark: SparkSession, indexPath: String): Option[Seq[String]] = {
    val fs = indexFsFor(spark, indexPath)
    val p = sigPathFor(indexPath)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim
        .split("\n").toSeq.map(_.trim))
      finally in.close()
    }
  }

  private def readSignature(spark: SparkSession, indexPath: String): Option[String] =
    readSidecar(spark, indexPath).map(_.head)

  /** The frozen centroids of a materialized index, recovered WITHOUT
    * touching the index body: ids AND vectors come from the `_centroids`
    * sidecar [[writeSignature]] lays down at build time (bounded driver
    * metadata — nCentroids lines). A legacy ids-only sidecar (pre-r10
    * format) falls back to fetching the vectors from the layout; that
    * read is row-group-stats-pruned on the id column, NOT
    * partition-pruned (every partition of the layout is a centroid-id
    * partition, so each such recovery opens every partition's footers —
    * the reason the vectors now travel in the sidecar). */
  private[graft] def indexCentroids(spark: SparkSession, indexPath: String,
                                    idCol: String, vecCol: String): (Seq[Long], Seq[Seq[Float]]) = {
    val lines = readSidecar(spark, indexPath).getOrElse(
      throw new IllegalStateException(
        s"$indexPath has no _centroids signature — not a graft IVF index"))
    val cids = lines.head.split(",").map(_.trim.toLong).toSeq
    val fromSidecar: Map[Long, Seq[Float]] = lines.tail.filter(_.nonEmpty)
      .map { l =>
        val Array(cid, vs) = l.split(":", 2)
        cid.trim.toLong ->
          vs.split(",").map(java.lang.Float.parseFloat).toSeq
      }.toMap
    val byId =
      if (cids.forall(fromSidecar.contains)) fromSidecar
      else spark.read.parquet(indexPath) // legacy sidecar: stats-pruned scan
        .filter(col("centroid_id").isin(cids: _*) && col(idCol).isin(cids: _*))
        .select(col(idCol), col(vecCol)).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val missing = cids.filterNot(byId.contains)
    require(missing.isEmpty,
      s"index $indexPath is missing centroid vectors for ids $missing")
    (cids, cids.map(byId(_)))
  }

  /** Incremental IVF maintenance — the append-only member the r8 verdict
    * named as the family's one gap: a new-vector batch lands in an
    * existing [[buildIvfIndex]] layout WITHOUT a rebuild. The batch is
    * assigned with the index's FROZEN centroids (from the signature +
    * partition-pruned centroid fetch — the quantizer must not drift, or
    * existing partitions silently stop matching probe routing), written
    * `mode(append)` after the writePartitioned repartition, so only the
    * batch's touched centroid dirs receive files — per-batch I/O is
    * O(batch), the index body is never rewritten or rescanned.
    *
    * Idempotence (x33/x38's append-only discipline): duplicate ids WITHIN
    * the batch collapse first (`dropDuplicates(idCol)` — ADVICE r9: a
    * twice-submitted row must not land twice), then ids already present
    * are anti-joined away before the write, with the existing-side scan
    * partition-pruned to the batch's own touched centroids — lossless
    * under the id-stability contract (an id maps to one immutable vector,
    * so a re-ingested id assigns to the same centroid and is found
    * there). The touched-centroid list is a bounded collect
    * (≤ nCentroids values). Appends must be SEQUENTIAL: two concurrent
    * appends of overlapping batches can both pass the anti-join and both
    * write the shared ids — callers serialize appends per index (the
    * streaming twin gets this from micro-batch ordering; a multi-writer
    * deployment needs an external lock or a single writer per index).
    *
    * A probe over the maintained index is bit-identical to one over a
    * full rebuild with the same centroid set (spec-pinned): assignment
    * uses the same codegen argmax projection, and probe routing reads
    * only the signature. */
  def appendToIvfIndex(newBatch: DataFrame, idCol: String, vecCol: String,
                       indexPath: String): Unit = {
    val spark = newBatch.sparkSession
    val (cids, cvecs) = indexCentroids(spark, indexPath, idCol, vecCol)
    val assigned = assignToCentroids(
        newBatch.dropDuplicates(idCol), idCol, vecCol, cids, cvecs)
      .localCheckpoint(eager = false) // referenced by touched-list AND write
    val touched = assigned.select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: <= nCentroids values
    if (touched.nonEmpty) {
      val existingIds = spark.read.parquet(indexPath)
        .filter(col("centroid_id").isin(touched: _*))
        .select(col(idCol))
      assigned
        .join(existingIds, Seq(idCol), "left_anti")
        .repartition(col("centroid_id"))
        .write.partitionBy("centroid_id").mode("append").parquet(indexPath)
    }
  }

  /** Probe plan over a materialized index (no top-k): scan restricted to
    * the probed centroids by a LITERAL partition predicate — the scan shows
    * `PartitionFilters` on `centroid_id` and opens nProbe/nCentroids of the
    * files (spec-pinned in SimilaritySpec). Exposed separately from
    * [[ivfIndexTopK]] so the plan shape itself is testable. */
  def ivfIndexProbe(spark: SparkSession, indexPath: String, idCol: String,
                    vecCol: String, probedCids: Seq[Long]): DataFrame =
    spark.read.parquet(indexPath)
      .filter(col("centroid_id").isin(probedCids: _*))

  /** IVF top-k over the materialized index: identical semantics and output
    * to [[ivfTopK]], but the probe reads ONLY the probed centroids'
    * partitions via partition pruning — at 100 TB the unprobed
    * (nCentroids - nProbe)/nCentroids of the index is never opened. The
    * probe set is nProbe ids (bounded metadata), collected so it becomes a
    * literal partition filter — pruning needs no DPP to kick in. */
  def ivfIndexTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                   queryId: Long, k: Int, nCentroids: Int, nProbe: Int,
                   indexPath: String): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cids, cvecs) = centroids(embeddings, idCol, vecCol, nCentroids)
    // Hadoop FS signature probe (readSignature): the index may live on any
    // filesystem (hdfs://, s3a://) — a java.io.File check would always
    // report absent there and silently rebuild per query. An EXISTING
    // index is reused only if its recorded centroid signature matches the
    // current request: probing a stale index (different nCentroids or
    // changed data) with fresh probe ids would silently return wrong
    // neighbors. The build itself records the signature.
    if (!readSignature(spark, indexPath).contains(indexSignature(cids)))
      buildIvfIndex(embeddings, idCol, vecCol, (cids, cvecs), indexPath)
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    // nProbe nearest centroids to the query — engine arithmetic over the
    // collected centroid LocalRelation, then collected (nProbe values).
    val probedCids = cids.zip(cvecs).toDF("_cid", "_cv")
      .crossJoin(broadcast(q))
      .withColumn("_d", cosine(col("_cv"), col("_qv")))
      .orderBy(col("_d").desc, col("_cid").asc).limit(nProbe)
      .select(col("_cid")).collect().map(_.getLong(0)).toSeq
    ivfIndexProbe(spark, indexPath, idCol, vecCol, probedCids)
      .filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("sim", round(cosine(col(vecCol), col("_qv")), 6))
      .select(col(idCol), col("centroid_id").cast("long").as("centroid_id"),
        col("sim"))
      .orderBy(col("sim").desc, col(idCol).asc)
      .limit(k)
  }

  /** Symmetric per-vector int8 quantization — the embedding-compression
    * pass that shrinks a float32 vector store 4× before indexing:
    * `scale = max|v| / 127`, `q_i = round(v_i / scale) ∈ [-127, 127]`
    * (an all-zero vector quantizes to all zeros with scale 0).
    *
    * The output pins the quantization with EXACT integer checksums —
    * `q_sum = Σ q_i` and `q_l1 = Σ |q_i|` are 64-bit integer sums, so the
    * oracle comparison carries no float-rounding risk — plus the
    * reconstruction error `mse_e6 = mean((v_i - q_i·scale)²) · 1e6`,
    * folded left-to-right in double like every other kernel here so the
    * oracle's sequential fold reproduces it bitwise before the 4 dp round.
    *
    * Scale shape: ONE narrow codegen projection per row — no shuffle, no
    * join, no state; at 100 TB this runs at scan speed and the quantized
    * vectors write back columnar. */
  def quantizeInt8(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val maxAbs = array_max(transform(col(vecCol), x => abs(x.cast("double"))))
    val scale = col("_max_abs") / lit(127.0)
    val qi = (x: Column) =>
      when(col("_max_abs") === 0.0, lit(0L))
        .otherwise(round(x.cast("double") / scale).cast("bigint"))
    val diff = (x: Column, q: Column) => {
      val d = x.cast("double") - q.cast("double") * scale
      d * d
    }
    embeddings
      .withColumn("_max_abs", maxAbs)
      .withColumn("_q", transform(col(vecCol), x => qi(x)))
      .select(col(idCol),
        size(col(vecCol)).cast("int").as("n_dims"),
        aggregate(col("_q"), lit(0L), (acc, v) => acc + v).as("q_sum"),
        aggregate(col("_q"), lit(0L), (acc, v) => acc + abs(v)).as("q_l1"),
        round(aggregate(zip_with(col(vecCol), col("_q"), diff),
          lit(0.0), (acc, v) => acc + v)
          / size(col(vecCol)).cast("double") * lit(1e6), 4).as("mse_e6"))
  }

  /** Batch kNN JOIN — top-k cosine neighbors for EVERY query vector at
    * once (the workload behind retrieval eval, semantic-dup candidate
    * mining, hard-negative sampling), probing the same IVF structure as
    * [[ivfTopK]] instead of brute-forcing |Q|×|C|:
    *
    *  - corpus assignment: one codegen projection (broadcast centroid
    *    literals, argmax) — identical to [[ivfTopK]];
    *  - per-QUERY probe set: all array-local (`zip_with` the centroid ids
    *    with the sims, sort structs of (-sim, cid), slice nProbe) — no
    *    crossJoin, no window, ties to the smallest cid exactly like the
    *    single-query probe;
    *  - candidates: queries exploded to (query, probed cid) joined against
    *    the assigned corpus. Small query sets (retrieval eval) BROADCAST —
    *    the corpus never shuffles. When the probe side exceeds the broadcast
    *    threshold (all-corpus self-kNN, the SemDeDup mining workload, where
    *    the "query side" IS the corpus), fall back to a plain equi-join on
    *    `_cid`: both sides shuffle into the IVF layout — each centroid's
    *    corpus rows meet exactly that centroid's probing queries, and a hot
    *    centroid is AQE's skew-join case, not a planning hazard. The switch
    *    is sized from row counts × vector bytes against the session's
    *    `spark.sql.autoBroadcastJoinThreshold` (override via
    *    `broadcastQueries` for a pinned plan);
    *  - ranking: per-query `row_number` over sim desc, id asc — ranked on
    *    the 6-dp ROUNDED sim so the tie-break is engine-portable.
    *
    * Output: (qid, idCol, centroid_id, sim, knn_rank) for ranks 1..k,
    * self-matches excluded. */
  def knnJoin(embeddings: DataFrame, idCol: String, vecCol: String,
              queryPred: Column, k: Int, nCentroids: Int, nProbe: Int,
              broadcastQueries: Option[Boolean] = None): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (cids, cvecs) = centroids(embeddings, idCol, vecCol, nCentroids)
    val cidLit = typedlit(cids)
    val cvLit = typedlit(cvecs)
    val assigned = embeddings
      .withColumn("_sims", transform(cvLit, c => cosine(col(vecCol), c)))
      .withColumn("_cid", element_at(cidLit,
        array_position(col("_sims"), array_max(col("_sims"))).cast("int")))
      .select(col(idCol), col(vecCol), col("_cid"))
    val probes = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"))
      .withColumn("_probe", transform(
        slice(array_sort(zip_with(cidLit,
          transform(cvLit, c => cosine(col("_qv"), c)),
          (cid, s) => struct((-s).as("d"), cid.as("cid")))), 1, nProbe),
        p => p.getField("cid")))
      .select(col("qid"), col("_qv"), explode(col("_probe")).as("_cid"))
    val useBroadcast = broadcastQueries.getOrElse {
      // Estimate the exploded probe side: queries × nProbe rows, each a
      // (qid, vector, cid). The count is one pushed-filter scan — cheap
      // next to the join it sizes; dims come from the already-collected
      // centroids, so no extra row fetch.
      val dims = cvecs.headOption.map(_.length).getOrElse(0)
      val rowBytes = 8L + 8L + (4L * dims + 16L)
      val estBytes = embeddings.filter(queryPred).count() * nProbe * rowBytes
      estBytes <= org.apache.spark.sql.internal.SQLConf.get.autoBroadcastJoinThreshold
    }
    val probeSide = if (useBroadcast) broadcast(probes) else probes.hint("shuffle_hash")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("sim").desc, col(idCol).asc)
    assigned
      .join(probeSide, Seq("_cid"))
      .filter(col(idCol) =!= col("qid"))
      .withColumn("sim", round(cosine(col(vecCol), col("_qv")), 6))
      .withColumn("knn_rank", row_number().over(w))
      .filter(col("knn_rank") <= k)
      .select(col("qid"), col(idCol), col("_cid").as("centroid_id"),
        col("sim"), col("knn_rank"))
  }

  /** GRAPH-based ANN frontier — the navigable-small-world comparison
    * point the IVF/PQ frontier family lacked (x147/x156 measure probe and
    * refine budgets; nothing measured a graph baseline): greedy BEAM
    * search over a bounded-degree kNN graph (the NSW/HNSW-layer search
    * shape, Malkov & Yashunin 2018's single-layer core made
    * deterministic), swept over `beams` budgets so the output is a
    * recall-vs-touched-nodes frontier directly comparable to
    * [[ivfRecallCurve]]'s recall-vs-scan-fraction rows.
    *
    * Build: the graph is each vector's top-`graphM` IVF-probed neighbors
    * ([[knnJoin]] self-kNN — the already-shipped approximate build,
    * never all-pairs). Search, per query and beam budget B: start at the
    * corpus-min-id entry vertex, then `hops` rounds of expand-the-beam
    * (score all unvisited graph neighbors of the current beam against
    * the query, 6 dp cosine, keep the top-B of everything visited);
    * answer = top-k of the visited set. Recall grades against the exact
    * brute-force top-k over the BOUNDED query set.
    *
    * The 100 TB read: a hop touches ≤ B·graphM vectors as POINT LOOKUPS
    * (broadcast candidate ids joined against the vector store), so
    * search cost is O(hops·B·graphM) — independent of corpus size, like
    * x7's partition-pruned probe and unlike any scan; the frontier rows
    * say what recall each touched-node budget buys.
    *
    * Determinism: queries are a hash-ordered `limit` (the
    * [[knnShapleyTestSet]] bounded-anchor discipline); sims round 6 dp
    * before every rank; all ranks tie-break on id; the entry vertex is
    * min(id). Output: one row per beam budget — (beam, n_queries,
    * mean_recall 4 dp, mean_visited 2 dp). */
  def graphAnnFrontier(embeddings: DataFrame, idCol: String, vecCol: String,
                       graphM: Int, beams: Seq[Int], hops: Int, k: Int,
                       nQueries: Int, nCentroids: Int,
                       nProbe: Int): DataFrame = {
    val vecs = embeddings.select(col(idCol).as("_vid"), col(vecCol).as("_vv"))
    val graph = knnJoin(embeddings, idCol, vecCol, lit(true), graphM,
        nCentroids, nProbe)
      .select(col("qid").as("_gsrc"), col(idCol).as("_gdst"))
      .localCheckpoint(eager = true) // read once per hop per budget
    val queries = knnShapleyTestSet(embeddings, idCol, nQueries)
      .select(col(idCol).as("_tid"), col(vecCol).as("_tv"))
      .localCheckpoint(eager = true)
    val entry = embeddings.agg(min(col(idCol)).as("_eid"))
    // Exact top-k per query — the brute-force grader over the bounded
    // query set (broadcast queries; the corpus never shuffles).
    val wq = Window.partitionBy(col("_tid"))
      .orderBy(col("_sim").desc, col("_vid"))
    val exact = vecs.crossJoin(broadcast(queries))
      .where(col("_vid") =!= col("_tid"))
      .select(col("_tid"), col("_vid"),
        round(cosine(col("_vv"), col("_tv")), 6).as("_sim"))
      .withColumn("_r", row_number().over(wq))
      .where(col("_r") <= k)
      .select(col("_tid"), col("_vid"))
      .localCheckpoint(eager = true)
    // r13 OPT: all beam budgets run in ONE tagged pass — every window,
    // join and aggregate below keys on (_beam, _tid), so per-budget
    // trajectories are exactly the per-beam loops' (the budget rides
    // along as the `_beam` value and the beam cut is `_r <= _beam`),
    // while each hop pays ONE vector-store lookup join, one anti-join
    // and one checkpoint instead of one per budget (guide §1.2: fewer
    // passes; measured 18 checkpointed rounds → 6).
    val spark = embeddings.sparkSession
    import spark.implicits._
    val beamDf = broadcast(beams.toDF("_beam"))
    val wqb = Window.partitionBy(col("_beam"), col("_tid"))
      .orderBy(col("_sim").desc, col("_vid"))
    // Each hop checkpoints only its NEW candidate scores; `visited` is a
    // plain union over the already-cached hop frames (the j66 discipline
    // — re-checkpointing the growing union re-caches every prior hop's
    // rows once per round).
    val hopFrames = scala.collection.mutable.ArrayBuffer(
      queries.crossJoin(broadcast(entry))
        .join(broadcast(vecs), col("_vid") === col("_eid"))
        .select(col("_tid"), col("_vid"),
          round(cosine(col("_vv"), col("_tv")), 6).as("_sim"))
        .crossJoin(beamDf)
        .localCheckpoint(eager = true))
    def visitedF: DataFrame = hopFrames.reduce(_ unionByName _)
    var beam = visitedF
    (1 to hops).foreach { h =>
      val candIds = beam
        .join(graph, col("_vid") === col("_gsrc"))
        .select(col("_beam"), col("_tid"), col("_gdst").as("_vid"))
        .distinct()
        .join(visitedF.select(col("_beam"), col("_tid"), col("_vid")),
          Seq("_beam", "_tid", "_vid"), "left_anti")
      // r14 NOTE: checkpoint-every-2nd-hop (lazy on odd hops) was tried
      // per the r13 verdict ask and REVERTED on measurement: BenchOne
      // min 7.08 s vs 6.24 s opening-bench min — the lazy frame is
      // referenced by both the next hop's broadcast(candIds) subtree and
      // the beam window, and the concurrent first materializations race
      // the cache, recomputing the hop (guide §1.1: empirical loop wins
      // over the first-principles sketch).
      val cand = vecs.join(broadcast(candIds), Seq("_vid"))
        .join(broadcast(queries), Seq("_tid"))
        .select(col("_beam"), col("_tid"), col("_vid"),
          round(cosine(col("_vv"), col("_tv")), 6).as("_sim"))
        .localCheckpoint(eager = true)
      hopFrames += cand
      beam = visitedF
        .withColumn("_r", row_number().over(wqb))
        .where(col("_r") <= col("_beam"))
        .select(col("_beam"), col("_tid"), col("_vid"), col("_sim"))
    }
    val visited = visitedF
    val approx = visited.where(col("_vid") =!= col("_tid"))
      .withColumn("_r", row_number().over(wqb))
      .where(col("_r") <= k)
      .select(col("_beam"), col("_tid"), col("_vid"))
    val hits = approx.join(exact, Seq("_tid", "_vid"))
      .groupBy(col("_beam"), col("_tid")).agg(count(lit(1)).as("_nh"))
    val nvis = visited.groupBy(col("_beam"), col("_tid"))
      .agg(count(lit(1)).as("_nv"))
    queries.select(col("_tid")).crossJoin(beamDf)
      .join(hits, Seq("_beam", "_tid"), "left_outer")
      .join(nvis, Seq("_beam", "_tid"), "left_outer")
      .groupBy(col("_beam"))
      .agg(count(lit(1)).cast("long").as("n_queries"),
        round(avg(coalesce(col("_nh"), lit(0L)).cast("double") / k), 4)
          .as("mean_recall"),
        round(avg(coalesce(col("_nv"), lit(0L)).cast("double")), 2)
          .as("mean_visited"))
      .select(col("_beam").cast("long").as("beam"), col("n_queries"),
        col("mean_recall"), col("mean_visited"))
      .orderBy(col("beam"))
  }

  /** k-center greedy (farthest-point) coreset: pick the smallest-id seed,
    * then k−1 times the vector FARTHEST (cosine distance, 6 dp) from the
    * already-selected set — the classic 2-approximation to the k-center
    * cover, used to pull a maximally-DIVERSE subset for annotation or
    * eval (where mmrRerank diversifies a k-candidate serving block, this
    * sweeps the whole corpus). Emitted `dist` is each pick's distance to
    * the prior set — the coverage radius trajectory, monotone down.
    *
    * Scale shape: every round is ONE full scan + TakeOrderedAndProject(1)
    * — the selected centers ride along as bounded literals (≤ k vectors),
    * so the min-distance is a codegen fold with no join and no shuffle;
    * k scans total, the per-round collect is a single row. The oracle
    * unrolls the same greedy as chained 1-row CTEs (mmr discipline) and
    * both engines round each round's distances to 6 dp before the argmax,
    * so the trajectories match exactly. */
  def kCenterCoreset(embeddings: DataFrame, idCol: String, vecCol: String,
                     k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    require(k >= 1, "k must be positive")
    val seed = embeddings.orderBy(col(idCol).asc)
      .select(col(idCol), col(vecCol)).head()
    var centers = Vector(
      seed.getSeq[Float](1).map(_.toDouble).toArray)
    val picks = scala.collection.mutable.ArrayBuffer(
      (1L, seed.getLong(0), 0.0))
    (2 to k).foreach { r =>
      val minDist = centers
        .map(c => round(lit(1.0) - cosineFold(col(vecCol), lit(c)), 6))
        .reduce(least(_, _))
      val far = embeddings
        .select(col(idCol), col(vecCol), minDist.as("_d"))
        .orderBy(col("_d").desc, col(idCol).asc)
        .limit(1).head()
      centers :+= far.getSeq[Float](1).map(_.toDouble).toArray
      picks += ((r.toLong, far.getLong(0), far.getDouble(2)))
    }
    import spark.implicits._
    picks.toSeq.toDF("rnk", "vec_id", "dist")
  }

  /** Deterministic ±1 sign matrix for [[randomProjection]]: entry (j, i)
    * is the parity of md5("salt:j:i") — reproducible on any engine or
    * cluster size with no RNG state (the repo's hash-not-rand
    * convention). */
  def rpSigns(m: Int, d: Int, salt: String): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until m).map(j => (0 until d).map { i =>
      val h = md.digest(s"$salt:$j:$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 0) 1.0 else -1.0
    })
  }

  /** Johnson-Lindenstrauss random projection (sparse sign variant): d-dim
    * embeddings project to m dims through a deterministic ±1/√m matrix —
    * the dimension-reduction pass run before an ANN index or pairwise
    * sweep when d itself is the cost driver. Emits per-vector norms
    * before/after and their ratio: the JL lemma says the ratio
    * concentrates near 1, and this output IS the distortion audit.
    *
    * Scale shape: the matrix is a LITERAL (m·d doubles of driver
    * metadata, ~4 KiB at 16×64) folded into a single codegen projection —
    * zero shuffles, zero joins, embarrassingly parallel. Dot products
    * fold left-to-right over the index order on both engines, so the
    * double arithmetic is order-identical and the oracle matches at 4 dp. */
  def randomProjection(embeddings: DataFrame, idCol: String, vecCol: String,
                       m: Int, d: Int, salt: String): DataFrame = {
    val signs = rpSigns(m, d, salt)
    val matLit = typedlit(signs)
    val scale = math.sqrt(m.toDouble)
    val dotRow = (row: Column) => aggregate(
      zip_with(col(vecCol), row, (x, s) => x.cast("double") * s),
      lit(0.0d), (acc, v) => acc + v) / scale
    embeddings
      .withColumn("_p", transform(matLit, row => dotRow(row)))
      .select(col(idCol),
        round(norm(col(vecCol)), 4).as("orig_norm"),
        round(sqrt(aggregate(col("_p"), lit(0.0d), (a, v) => a + v * v)), 4)
          .as("proj_norm"),
        round(
          when(norm(col(vecCol)) === 0.0d, 0.0d)
            .otherwise(sqrt(aggregate(col("_p"), lit(0.0d),
              (a, v) => a + v * v)) / norm(col(vecCol))), 4).as("norm_ratio"))
  }

  /** kNN-density outlier mining: every vector's similarity to its k-th
    * nearest neighbor (through the shared IVF probe) is a density proxy —
    * the `bottomN` least-dense vectors are the isolated points reviewed
    * before clustering/dedup trusts the embedding space (the global
    * complement of [[labelOutliers]]'s per-label view).
    *
    * Scale shape: [[knnJoin]] with the query predicate wide open — the
    * corpus assigns once, the probe side broadcasts or shuffle-hashes by
    * its measured size; one TakeOrdered over the rank-k rows. A query
    * whose probed buckets hold fewer than k neighbors has no k-th rank
    * and drops on BOTH engines (the oracle replays the same probe). */
  def knnDensityOutliers(embeddings: DataFrame, idCol: String, vecCol: String,
                         k: Int, nCentroids: Int, nProbe: Int,
                         bottomN: Int): DataFrame =
    knnJoin(embeddings, idCol, vecCol, lit(true), k, nCentroids, nProbe)
      .filter(col("knn_rank") === k)
      .select(col("qid").as(idCol), col("sim").as("knn_sim"))
      .orderBy(col("knn_sim").asc, col(idCol).asc)
      .limit(bottomN)

  /** Label-noise estimation by neighborhood agreement: for every vector,
    * the fraction of its k nearest neighbors (shared-IVF probe, same path
    * as [[knnJoin]]) that carry ITS label, rolled up per class — a class
    * whose members' neighborhoods disagree with them is mislabeled or
    * genuinely entangled, and `1 − consistency_rate` is the standard
    * cheap noisy-label-rate estimate run before training on the labels.
    *
    * `n_consistent` counts members whose neighborhood STRICT-majority
    * agrees (2·same > k, on the realized neighbor count so truncated
    * probe lists don't bias the vote); `purity` is the mean same/k
    * fraction. Scale shape: the all-corpus self-kNN rides knnJoin's
    * equi-join fallback (corpus never broadcast), labels join at qid /
    * neighbor grain, and everything after is two bounded aggs. */
  /** Exact KNN-Shapley DATA VALUATION (Jia et al. 2019, "Efficient
    * task-specific data valuation for nearest neighbor algorithms"): the
    * Shapley value of every training point for a k-NN classifier over a
    * held-out test set, via the closed-form recurrence — sorted by
    * similarity to a test point (rank 1 = nearest, n = farthest),
    * s_(n) = 1[y_(n)=y_t]/n and
    * s_(i) = s_(i+1) + (1[y_(i)=y_t] − 1[y_(i+1)=y_t])/k · min(k,i)/i —
    * then averaged over test points. The per-point "does this example
    * HELP or HURT the task" read that frequency/quality scores can't
    * give: a mislabeled point near many test points goes sharply
    * negative; Σφ equals the k-NN test accuracy (the efficiency axiom —
    * the spec's sanity pin).
    *
    * Determinism: similarities round 6 dp BEFORE ranking (both engines
    * sort the same grid, vec_id tie-break); the suffix recurrence is a
    * window cumulative sum in rank order — a fixed evaluation order on
    * both engines.
    *
    * Scale shape: the test set is BOUNDED BY CONSTRUCTION (r12 verdict
    * #3, the x48 bounded-anchor discipline): a deterministic
    * hash-ordered `limit(testN)` via [[knnShapleyTestSet]] — never a
    * corpus FRACTION — so the broadcast and the per-test rank windows
    * are testN-sized at ANY corpus scale. The score table is one narrow
    * n_train × testN frame; the recurrence rides windows PARTITIONED PER
    * TEST POINT (parallel across test points, the ksDistance
    * discipline). One test partition = the whole train set — if that
    * outgrows an executor, range-partition the rank scan per test point
    * ([[graft.queries.Serving.ranked]]'s shape) or prune the tail:
    * increments decay as k/i, so a truncated-at-M scan bounds the error
    * by k·ln(n/M)/n. */
  /** The held-out set for [[knnShapley]]: the `testN` ids with the
    * smallest residue-permuted hash, ties on id (a total order, so both
    * engines pick the identical set). The scatter key is overflow-safe
    * for any long id under ANSI mode — id mod a prime P, then a
    * Knuth-multiplicative permutation of the residue (max product
    * (P−1)·2654435761 ≈ 2.6e13 ≪ 2^63) — so the sample isn't an
    * id-prefix. Spark plans the orderBy+limit as TakeOrderedAndProject
    * (per-partition top-N, no global sort). */
  def knnShapleyTestSet(embeddings: DataFrame, idCol: String,
                        testN: Int): DataFrame = {
    val h = pmod(pmod(col(idCol), lit(9973L)) * lit(2654435761L), lit(9973L))
    embeddings.orderBy(h, col(idCol)).limit(testN)
  }

  def knnShapley(embeddings: DataFrame, idCol: String, vecCol: String,
                 labelCol: String, k: Int, testN: Int): DataFrame = {
    val test = knnShapleyTestSet(embeddings, idCol, testN)
      .select(col(idCol).as("_tid"), col(vecCol).as("_tv"),
        col(labelCol).as("_ty"))
    val train = embeddings.join(broadcast(test.select(col("_tid"))),
        col(idCol) === col("_tid"), "left_anti")
      .select(col(idCol), col(vecCol), col(labelCol))
    val n = train.agg(count(lit(1)).cast("long").as("_n"))
    val scored = train.crossJoin(broadcast(test))
      .select(col(idCol), col(labelCol), col("_tid"),
        round(cosine(col(vecCol), col("_tv")), 6).as("_sim"),
        when(col(labelCol) === col("_ty"), 1.0).otherwise(0.0).as("_m"))
    val wRank = Window.partitionBy(col("_tid"))
      .orderBy(col("_sim").desc, col(idCol))
    val wSuffix = Window.partitionBy(col("_tid")).orderBy(col("_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wLag = Window.partitionBy(col("_tid")).orderBy(col("_r").desc)
    val sv = scored
      .withColumn("_r", row_number().over(wRank))
      .withColumn("_mNext", lag(col("_m"), 1).over(wLag))
      .withColumn("_inc", when(col("_mNext").isNull, lit(0.0))
        .otherwise((col("_m") - col("_mNext")) / k *
          least(lit(k), col("_r")) / col("_r")))
      .crossJoin(broadcast(n))
      .withColumn("_s",
        first(col("_m")).over(wSuffix) / col("_n") +
          sum(col("_inc")).over(wSuffix))
    sv.groupBy(col(idCol))
      .agg(first(col(labelCol)).as(labelCol),
        count(lit(1)).cast("long").as("n_test"),
        round(avg(col("_s")), 6).as("shapley"))
  }

  def knnLabelConsistency(embeddings: DataFrame, idCol: String,
                          vecCol: String, labelCol: String, k: Int,
                          nCentroids: Int, nProbe: Int): DataFrame = {
    val nn = knnJoin(embeddings, idCol, vecCol, lit(true), k, nCentroids,
      nProbe)
    val gold = embeddings.select(col(idCol).as("qid"),
      col(labelCol).as("_gold"))
    val nlab = embeddings.select(col(idCol), col(labelCol).as("_nl"))
    val per = nn.join(gold, Seq("qid")).join(nlab, Seq(idCol))
      .groupBy(col("qid"), col("_gold"))
      .agg(count(lit(1)).as("_k"),
        sum(when(col("_nl") === col("_gold"), 1L).otherwise(0L)).as("_same"))
    per.groupBy(col("_gold").cast("long").as("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(when(col("_same") * 2 > col("_k"), 1L).otherwise(0L))
          .cast("long").as("n_consistent"),
        round(avg(col("_same").cast("double") / col("_k")), 4).as("purity"))
      .select(col("label"), col("n"), col("n_consistent"),
        round(col("n_consistent").cast("double") / col("n"), 4)
          .as("consistency_rate"),
        col("purity"))
  }

  /** Mean Average Precision at k of label-mates in the self-kNN list —
    * the position-sensitive retrieval read [[knnLabelConsistency]]'s
    * order-blind purity can't give: a list whose same-label neighbors
    * sit at ranks 1–3 and one whose mates sit at 8–10 have the same
    * purity but very different MAP. AP@k per query follows the standard
    * IR convention — Σ rel_i·P@i over the ranked list, normalized by
    * min(R, k) where R = corpus mates of the gold label (count−1, the
    * query itself excluded) — then averages per class.
    *
    * Scale shape: rides knnJoin's shared-IVF self-kNN (corpus never
    * broadcast); the running P@i is one window over the k-row
    * neighborhood keyed by qid; R joins from the broadcast label-count
    * table. Everything after the kNN is bounded at n·k rows. */
  def knnMeanAveragePrecision(embeddings: DataFrame, idCol: String,
                              vecCol: String, labelCol: String, k: Int,
                              nCentroids: Int, nProbe: Int): DataFrame = {
    val nn = knnJoin(embeddings, idCol, vecCol, lit(true), k, nCentroids,
      nProbe)
    val gold = embeddings.select(col(idCol).as("qid"),
      col(labelCol).as("_gold"))
    val nlab = embeddings.select(col(idCol), col(labelCol).as("_nl"))
    val rTbl = embeddings.groupBy(col(labelCol).as("_gold"))
      .agg((count(lit(1)) - 1L).cast("long").as("_r"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("knn_rank"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    nn.join(gold, Seq("qid")).join(nlab, Seq(idCol))
      .withColumn("_rel", when(col("_nl") === col("_gold"), 1L)
        .otherwise(0L))
      .withColumn("_cum", sum(col("_rel")).over(w))
      .groupBy(col("qid"), col("_gold"))
      .agg(sum(col("_rel") * col("_cum").cast("double") /
        col("knn_rank")).as("_apnum"))
      .join(broadcast(rTbl), Seq("_gold"))
      .select(col("_gold"), (col("_apnum") /
        least(col("_r"), lit(k.toLong))).as("_ap"))
      .groupBy(col("_gold").cast("long").as("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("_ap")), 4).as("map_at_k"))
  }

  /** IVF index balance audit: the cluster-size distribution of the
    * coarse assignment, folded to the two numbers that price a probe —
    * `imbalance_factor` = k·Σnᵢ²/n² (Jégou et al.'s expected probe-cost
    * multiplier vs perfectly uniform buckets; 1.0 is ideal) and the
    * max/mean hot-bucket ratio (tail latency: the worst probe scans
    * this many times the average). The go/no-go read on an IVF layout
    * BEFORE queries ship — a skewed quantizer quietly turns nProbe/k
    * pruning into full scans ([[ivfTopK]]'s cost model assumes balance).
    *
    * Scale shape: the same one-projection codegen assignment the index
    * build uses (broadcast centroid literals, argmax), one count agg at
    * centroid grain (k rows), one scalar fold. */
  def ivfBalanceAudit(embeddings: DataFrame, idCol: String,
                      vecCol: String, nCentroids: Int): DataFrame = {
    val (cids, cvecs) = centroids(embeddings, idCol, vecCol, nCentroids)
    val cidLit = typedlit(cids)
    val cvLit = typedlit(cvecs)
    embeddings
      .withColumn("_sims", transform(cvLit, c => cosine(col(vecCol), c)))
      .withColumn("_cid", element_at(cidLit,
        array_position(col("_sims"), array_max(col("_sims"))).cast("int")))
      .groupBy(col("_cid")).agg(count(lit(1)).cast("long").as("_n"))
      .agg(count(lit(1)).cast("long").as("_k"),
        sum(col("_n")).cast("long").as("_nn"),
        max(col("_n")).cast("long").as("_mx"),
        sum(col("_n").cast("double") * col("_n")).as("_ss"))
      .select(col("_k").as("k"), col("_nn").as("n"),
        col("_mx").as("max_bucket"),
        round(col("_mx").cast("double") * col("_k") / col("_nn"), 4)
          .as("max_over_mean"),
        round(col("_ss") * col("_k") /
          (col("_nn").cast("double") * col("_nn")), 4)
          .as("imbalance_factor"))
  }

  /** Matryoshka truncation evaluation (Kusupati et al. 2022, MRL): how
    * much of the FULL-dimension kNN structure survives when vectors are
    * truncated to their leading d dimensions — recall@k of the truncated
    * self-kNN against the full one, per truncation level. The sizing
    * read before shipping truncated embeddings to a cheaper index tier:
    * if recall@10 holds at d/4, the ANN fleet shrinks 4× for free.
    *
    * Scale shape: one full-dim self-kNN (the shared-IVF knnJoin path),
    * checkpointed and reused as the reference against EACH truncated
    * run; truncation itself is an array-local `slice` projection — the
    * truncated index is built exactly like the full one, centroids and
    * all. Per-level recall is an equi-join on (query, neighbor) at n·k
    * grain, then one scalar row per level. */
  def truncationRecall(embeddings: DataFrame, idCol: String,
                       vecCol: String, dims: Seq[Int], k: Int,
                       nCentroids: Int, nProbe: Int): DataFrame = {
    val full = knnJoin(embeddings, idCol, vecCol, lit(true), k, nCentroids,
        nProbe)
      .select(col("qid"), col(idCol))
      .localCheckpoint(eager = true) // reference for every level
    // r14 OPT (guide §3.1): a checkpointed reference carries no stats, so
    // every per-level recall join planned as SortMergeJoin — 2 Exchanges +
    // 2 Sorts per level over frames already in cache. Broadcast the
    // reference side on a measured count (the pageRank bcastV discipline);
    // at corpus scale the n·k reference outgrows the switch and the
    // co-partitioned shuffle join stands.
    val refSide: DataFrame => DataFrame =
      if (full.count() <= 5000000L) broadcast _ else identity
    val fcnt = full.groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("_nf"))
    dims.map { d =>
      val t = embeddings.withColumn(vecCol, slice(col(vecCol), 1, d))
      val tn = knnJoin(t, idCol, vecCol, lit(true), k, nCentroids, nProbe)
        .select(col("qid"), col(idCol))
      val inter = tn.join(refSide(full), Seq("qid", idCol))
        .groupBy(col("qid")).agg(count(lit(1)).cast("long").as("_ni"))
      fcnt.join(refSide(inter), Seq("qid"), "left").na.fill(0L, Seq("_ni"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          round(avg(col("_ni").cast("double") / col("_nf")), 4)
            .as("mean_recall"))
        .select(lit(d.toLong).as("dims"), col("n_queries"),
          col("mean_recall"))
    }.reduce(_.unionByName(_))
  }

  /** IVF probe-budget tuning curve — the "how many probes buy how much
    * recall" frontier an index's nProbe is actually chosen on (x141
    * audits the layout's balance; this measures the recall the probe
    * budget buys): recall@k of the IVF self-kNN at each probe budget in
    * `probes` against the EXACT self-kNN (probing all centroids ≡ brute
    * force — spec-pinned on [[knnJoin]]), alongside the scan fraction
    * nProbe/nCentroids the cost model predicts. Recall per query is
    * |approx ∩ exact| / |exact| on the rounded-sim, id-tie-broken
    * ranking both engines share.
    *
    * Scale shape: the exact reference runs ONCE and localCheckpoints
    * (the truncationRecall discipline); each level is one knnJoin over
    * the shared corpus assignment; intersections join at (query,
    * neighbor) grain — n·k rows, never corpus². */
  def ivfRecallCurve(embeddings: DataFrame, idCol: String, vecCol: String,
                     queryPred: Column, k: Int, nCentroids: Int,
                     probes: Seq[Int]): DataFrame = {
    val exact = knnJoin(embeddings, idCol, vecCol, queryPred, k,
        nCentroids, nCentroids)
      .select(col("qid"), col(idCol))
      .localCheckpoint(eager = true) // reference for every probe level
    // r14 OPT: measured-count broadcast switch for the stats-less
    // checkpointed reference (see truncationRecall).
    val refSide: DataFrame => DataFrame =
      if (exact.count() <= 5000000L) broadcast _ else identity
    val ecnt = exact.groupBy(col("qid"))
      .agg(count(lit(1)).cast("long").as("_ne"))
    probes.map { p =>
      val approx = knnJoin(embeddings, idCol, vecCol, queryPred, k,
          nCentroids, p)
        .select(col("qid"), col(idCol))
      val inter = approx.join(refSide(exact), Seq("qid", idCol))
        .groupBy(col("qid")).agg(count(lit(1)).cast("long").as("_ni"))
      ecnt.join(refSide(inter), Seq("qid"), "left").na.fill(0L, Seq("_ni"))
        .agg(count(lit(1)).cast("long").as("n_queries"),
          round(avg(col("_ni").cast("double") / col("_ne")), 4)
            .as("mean_recall"))
        .select(lit(p.toLong).as("n_probe"),
          round(lit(p.toDouble / nCentroids), 4).as("scan_frac"),
          col("n_queries"), col("mean_recall"))
    }.reduce(_.unionByName(_))
  }

  /** Hard-negative mining for contrastive training (DPR/SimCSE-style): for
    * each anchor vector, the top-`k` most-similar corpus vectors whose
    * cosine lies in `[lo, hi)` — similar enough to be informative
    * negatives, capped below `hi` so positives and near-duplicates are
    * excluded (a near-dup mislabeled as a negative actively poisons the
    * loss; `hi` should sit at the near-dup threshold, cf. x12/x29).
    *
    * Scale shape: the anchor set is a training batch — bounded — so its
    * vectors broadcast and similarity is one codegen projection per
    * (corpus row, anchor); only BAND SURVIVORS reach the per-anchor top-k
    * window, which shuffles on anchor id. For anchor sets beyond broadcast
    * size, mine through [[knnJoin]]'s shared-IVF path and band-filter its
    * output instead — same contract, candidates pruned by centroid probe. */
  def hardNegatives(embeddings: DataFrame, idCol: String, vecCol: String,
                    anchorIds: Seq[Long], k: Int,
                    lo: Double, hi: Double): DataFrame = {
    val anchors = embeddings.filter(col(idCol).isin(anchorIds: _*))
      .select(col(idCol).as("anchor_id"), col(vecCol).as("_qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id")).orderBy(col("sim").desc, col(idCol).asc)
    embeddings
      .crossJoin(broadcast(anchors))
      .filter(col(idCol) =!= col("anchor_id"))
      .withColumn("sim", round(cosine(col(vecCol), col("_qv")), 6))
      .filter(col("sim") >= lo && col("sim") < hi)
      .withColumn("neg_rank", row_number().over(w).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("anchor_id"), col(idCol), col("sim"), col("neg_rank"))
      .orderBy(col("anchor_id"), col("neg_rank"))
  }

  /** Embedding-space label QA (confident-learning-style outlier mining):
    * per-label centroid (elementwise mean), every vector's cosine to ITS
    * label's centroid, and the k LEAST-similar vectors per label — the
    * rows most likely mislabeled or off-distribution, surfaced for review
    * before training.
    *
    * Scale shape: the centroid build is one (label, position) hash agg
    * over the posexploded vectors — |corpus|×dims rows but two slim
    * columns, map-side combined — reassembled into label-grain arrays
    * (bounded: |labels| rows) that BROADCAST back onto the corpus; the
    * cosine is per-row work and only the per-label top-k window shuffles
    * ranked candidates. Uses [[cosineFold]] (double fold) because the
    * centroid is a double array; similarity rounded 6 dp so ranking is
    * engine-portable. */
  /** Per-dimension z-score standardization of the embedding store — the
    * feature-normalization pass run before clustering / IVF training /
    * whitened-distance ANN, where unscaled dimensions dominate the metric.
    *
    * Scale shape: corpus → per-dimension (mean, stddev_pop) via one
    * posexplode + map-side-combined hash agg whose OUTPUT is d rows
    * (d = vector width, not corpus size); the d-row frame packs into two
    * ordered literal arrays in a 1-row broadcast, and the normalization
    * itself is a zip_with projection — the 100 TB side is touched exactly
    * once and never shuffles. Constant dimensions (σ = 0) map to 0, not
    * NaN.
    *
    * Output per vector: (id, n_dims, pre_norm, z_norm, z_mean) — the L2
    * norms before/after and the mean standardized component (4/4/6 dp),
    * the standard sanity scalars for a normalization pass. */
  /** Lloyd k-means TRAINING over the embedding store — the missing half of
    * the IVF family: [[ivfTopK]]/[[buildIvfIndex]] take their coarse
    * quantizer as given (first-k vectors), this trains it. Cosine
    * objective for consistency with the whole similarity family; `iters`
    * fixed Lloyd rounds (init = first k vectors by id, the deterministic
    * k-means seeding both engines can reproduce), then one final
    * assignment against the trained centroids.
    *
    * Engine-portable fixed point (the j11 discipline lifted to k-means):
    * per-dimension centroid means round to 6 dp AND quantize to float32
    * each round, so both engines iterate from bit-identical centroids;
    * assignment argmax ties break to the smallest centroid index on both
    * (array_position takes the FIRST maximum; the oracle sorts sim DESC,
    * cid ASC). Empty clusters keep their previous centroid.
    *
    * Scale shape per round: ONE codegen projection assigns every vector
    * against the centroid literal (no join, no shuffle — the ivfTopK
    * assignment machinery), and the update is one map-side-combined
    * (cid, dim)-grain mean aggregate whose k·d-row result is the bounded
    * driver metadata that becomes the next round's literal. The corpus
    * never shuffles row-wise; nothing V×E materializes. At 100 TB add
    * mini-batching (sampled update rounds) — the documented knob; the
    * full-pass update here is already the scalable shape. */
  def kMeansTrain(embeddings: DataFrame, idCol: String, vecCol: String,
                  k: Int, iters: Int): DataFrame = {
    val cvecs = lloydCentroids(embeddings, idCol, vecCol, k, iters)
    embeddings
      .withColumn("_sims", simsAgainst(col(vecCol), cvecs))
      .select(col(idCol),
        array_position(col("_sims"), array_max(col("_sims"))).cast("long")
          .as("cluster_id"),
        round(array_max(col("_sims")), 6).as("sim"))
  }

  /** k explicit native-cosine terms, not transform(lit, lambda): the HOF
    * form evaluates interpreted; this one stays inside whole-stage
    * codegen (CosineSim.doGenCode) with each centroid a typed literal. */
  private def simsAgainst(v: Column, cvecs: Seq[Seq[Float]]): Column =
    array(cvecs.map(c => cosine(v, typedlit(c))): _*)

  /** The Lloyd training loop factored out of [[kMeansTrain]] so the
    * incremental update ([[kMeansUpdate]]) trains against the identical
    * trajectory: init = first k vectors by id, per-round means rounded
    * 6 dp AND float-quantized (the engine-portable fixed point), empty
    * clusters keep their previous centroid. Per-round collect is bounded
    * driver metadata (k × d rows). */
  private def lloydCentroids(embeddings: DataFrame, idCol: String,
                             vecCol: String, k: Int,
                             iters: Int): Seq[Seq[Float]] = {
    val init: Seq[Seq[Float]] = embeddings.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toIndexedSeq).toSeq
    var cvecs = init
    (1 to iters).foreach { _ =>
      val means = embeddings
        .withColumn("_sims", simsAgainst(col(vecCol), cvecs))
        .withColumn("_cid",
          array_position(col("_sims"), array_max(col("_sims"))).cast("int"))
        .select(col("_cid"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
        .groupBy(col("_cid"), col("_pos"))
        .agg(round(avg(col("_x").cast("double")), 6).cast("float").as("_m"))
        .collect() // bounded driver metadata: k x d rows
      val byCid = means.groupBy(_.getInt(0)).map { case (cid, rows) =>
        cid -> (rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toIndexedSeq: Seq[Float])
      }
      cvecs = cvecs.zipWithIndex.map { case (prev, i) =>
        byCid.getOrElse(i + 1, prev)
      }
    }
    cvecs
  }

  /** Mini-batch k-means centroid MAINTENANCE — the quantizer-side member
    * of the incremental family (x33/x38/x79/x144 keep hashes, LSH
    * signatures, HLL registers, and the IVF layout current; this keeps
    * the trained quantizer itself current): a new-vector batch updates
    * the base-trained centroids by the count-weighted mean merge
    * c' = (n·c + m·b) / (n + m) per dimension, where n is the base
    * cluster population (final-assignment counts), b the batch members'
    * per-dimension mean and m their count — the standard mini-batch
    * k-means step (Sculley 2010) with the whole history folded into
    * (c, n). Clusters the batch never touches keep their centroid
    * bit-identically; a cluster empty in the base adopts the batch mean.
    *
    * Engine-portable arithmetic: b rounds 6 dp + float-quantizes exactly
    * like the training rounds; the merge computes in double from the
    * float-widened inputs and rounds 6 dp + float-quantizes again, so
    * both engines hold bit-identical updated centroids. The per-cluster
    * summary scalars fold over the pos-sorted centroid arrays (array-
    * local, ordered — no distributed float-sum order noise).
    *
    * Scale shape: training is [[lloydCentroids]] (per-round codegen
    * argmax + bounded k·d collect); the batch touches ONE assignment
    * projection and ONE (cid, dim)-grain mean agg; the merge itself runs
    * over k·d rows. The corpus is never rescanned — (c, n) is the entire
    * carried state.
    *
    * Output per cluster: (cluster_id, n_base, n_batch, c_sum = 6 dp
    * ordered fold of the updated centroid, drift = 1 − cos(old, new),
    * 6 dp). */
  def kMeansUpdate(base: DataFrame, batch: DataFrame, idCol: String,
                   vecCol: String, k: Int, iters: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val cvecs = lloydCentroids(base, idCol, vecCol, k, iters)
    def assigned(df: DataFrame) = df
      .withColumn("_sims", simsAgainst(col(vecCol), cvecs))
      .withColumn("_cid",
        array_position(col("_sims"), array_max(col("_sims"))).cast("int"))
    val baseCounts = assigned(base).groupBy(col("_cid"))
      .agg(count(lit(1)).cast("long").as("_n"))
    val batchAssigned = assigned(batch)
      .select(col("_cid"), col(vecCol))
      .localCheckpoint(eager = false) // referenced by the mean agg AND counts
    val batchMeans = batchAssigned
      .select(col("_cid"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .groupBy(col("_cid"), col("_pos"))
      .agg(round(avg(col("_x").cast("double")), 6).cast("float").as("_b"))
    val batchCounts = batchAssigned.groupBy(col("_cid"))
      .agg(count(lit(1)).cast("long").as("_m"))
    // _pos is 0-based to line up with posexplode's ordinal.
    val cents = cvecs.zipWithIndex.flatMap { case (c, i) =>
      c.zipWithIndex.map { case (v, p) => (i + 1, p, v) }
    }.toDF("_cid", "_pos", "_c")
    val merged = cents
      .join(broadcast(baseCounts), Seq("_cid"), "left")
      .join(broadcast(batchMeans), Seq("_cid", "_pos"), "left")
      .join(broadcast(batchCounts), Seq("_cid"), "left")
      .na.fill(0L, Seq("_n", "_m"))
      .withColumn("_new", when(col("_m") === 0L, col("_c")).otherwise(
        round((col("_n") * col("_c").cast("double") +
            col("_m") * col("_b").cast("double")) / (col("_n") + col("_m")), 6)
          .cast("float")))
      .groupBy(col("_cid"))
      .agg(max(col("_n")).as("n_base"), max(col("_m")).as("n_batch"),
        transform(array_sort(collect_list(struct(col("_pos"), col("_c")))),
          s => s.getField("_c")).as("_old"),
        transform(array_sort(collect_list(struct(col("_pos"), col("_new")))),
          s => s.getField("_new")).as("_nv"))
    merged.select(col("_cid").cast("long").as("cluster_id"),
        col("n_base"), col("n_batch"),
        round(aggregate(transform(col("_nv"), x => x.cast("double")),
          lit(0.0), (acc, v) => acc + v), 6).as("c_sum"),
        round(lit(1.0) - cosineFold(col("_old"), col("_nv")), 6).as("drift"))
  }

  /** Quantizer state carried by the STREAMING mini-batch k-means fold
    * (s36): per cluster, its 1-based id, the population folded into the
    * centroid so far, and the centroid itself. Bounded driver metadata —
    * k rows of (long + d floats); the corpus never rides in the state. */
  type KmState = Seq[(Int, Long, Seq[Float])]

  /** Initial quantizer state: [[lloydCentroids]]-trained centroids over
    * the base plus the base's FINAL-assignment populations — exactly the
    * (c, n) [[kMeansUpdate]] derives before its merge. */
  def kMeansInitState(base: DataFrame, idCol: String, vecCol: String,
                      k: Int, iters: Int): KmState = {
    val cvecs = lloydCentroids(base, idCol, vecCol, k, iters)
    val counts = base
      .withColumn("_sims", simsAgainst(col(vecCol), cvecs))
      .withColumn("_cid",
        array_position(col("_sims"), array_max(col("_sims"))).cast("int"))
      .groupBy(col("_cid")).agg(count(lit(1)).as("_n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    cvecs.zipWithIndex.map { case (c, i) =>
      (i + 1, counts.getOrElse(i + 1, 0L), c)
    }
  }

  /** ONE mini-batch fold step over carried state — [[kMeansUpdate]]'s
    * merge re-expressed against (c, n) instead of a base table: the batch
    * assigns to the CURRENT centroids (codegen literal argmax), its
    * per-cluster means round 6 dp + float-quantize in-engine (the
    * training-round discipline), and the count-weighted merge
    * c' = (n·c + m·b)/(n+m) runs in-engine over k·d rows so every
    * rounding decision is the engine's own (bit-reproducible by the
    * oracle's unrolled chain). Untouched clusters return bit-identical.
    * The corpus is never rescanned; state stays k·(d+1) values. */
  def kMeansStateStep(state: KmState, batch: DataFrame, idCol: String,
                      vecCol: String): KmState = {
    val spark = batch.sparkSession
    import spark.implicits._
    val cvecs = state.map(_._3)
    val batchAssigned = batch
      .withColumn("_sims", simsAgainst(col(vecCol), cvecs))
      .withColumn("_cid",
        array_position(col("_sims"), array_max(col("_sims"))).cast("int"))
      .select(col("_cid"), col(vecCol))
      .localCheckpoint(eager = false)
    val batchMeans = batchAssigned
      .select(col("_cid"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .groupBy(col("_cid"), col("_pos"))
      .agg(round(avg(col("_x").cast("double")), 6).cast("float").as("_b"))
    val batchCounts = batchAssigned.groupBy(col("_cid"))
      .agg(count(lit(1)).cast("long").as("_m"))
    val cents = state.flatMap { case (cid, n, c) =>
      c.zipWithIndex.map { case (v, p) => (cid, p, v, n) }
    }.toDF("_cid", "_pos", "_c", "_n")
    val merged = cents
      .join(broadcast(batchMeans), Seq("_cid", "_pos"), "left")
      .join(broadcast(batchCounts), Seq("_cid"), "left")
      .na.fill(0L, Seq("_m"))
      .withColumn("_new", when(col("_m") === 0L, col("_c")).otherwise(
        round((col("_n") * col("_c").cast("double") +
            col("_m") * col("_b").cast("double")) / (col("_n") + col("_m")), 6)
          .cast("float")))
      .select(col("_cid"), col("_pos"), col("_new"), (col("_n") + col("_m")).as("_nn"))
      .collect() // bounded: k x d rows of quantizer metadata
    merged.groupBy(_.getInt(0)).toSeq.sortBy(_._1).map { case (cid, rows) =>
      (cid, rows.head.getLong(3),
        rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toSeq)
    }
  }

  /** x145-shaped summary of a folded state against its initial state:
    * (cluster_id, n_base, n_batch = folded − base, c_sum = 6 dp ordered
    * fold of the final centroid, drift = 1 − cos(initial, final), 6 dp) —
    * the same output arithmetic as [[kMeansUpdate]], so the oracle's
    * final select is shared. */
  def kMeansStateSummary(spark: SparkSession, init: KmState,
                         fin: KmState): DataFrame = {
    import spark.implicits._
    val byCid = fin.map(s => s._1 -> s).toMap
    init.map { case (cid, n0, c0) =>
      val (_, nf, cf) = byCid(cid)
      (cid.toLong, n0, nf - n0, c0, cf)
    }.toDF("cluster_id", "n_base", "n_batch", "_ovl", "_nvl")
      .select(col("cluster_id"), col("n_base"), col("n_batch"),
        round(aggregate(transform(col("_nvl"), x => x.cast("double")),
          lit(0.0), (acc, v) => acc + v), 6).as("c_sum"),
        round(lit(1.0) - cosineFold(col("_ovl"), col("_nvl")), 6).as("drift"))
  }

  /** State-file round trip for the streaming fold: one
    * `cid n v1,v2,...` line per cluster (Float.toString round-trips
    * exactly — the sidecar discipline). */
  def writeKmState(spark: SparkSession, path: String, state: KmState): Unit = {
    val body = state.map { case (cid, n, c) =>
      s"$cid $n ${c.mkString(",")}" }.mkString("\n")
    val out = indexFsFor(spark, path).create(
      new org.apache.hadoop.fs.Path(path), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  def readKmState(spark: SparkSession, path: String): KmState = {
    val in = indexFsFor(spark, path).open(new org.apache.hadoop.fs.Path(path))
    val lines =
      try new String(in.readAllBytes(), "UTF-8").trim.split("\n").toSeq
      finally in.close()
    lines.map { l =>
      val Array(cid, n, vs) = l.trim.split(" ", 3)
      (cid.toInt, n.toLong,
        vs.split(",").map(java.lang.Float.parseFloat).toSeq)
    }
  }

  /** Per-label embedding compactness — the label-quality report run before
    * trusting a labeled corpus: each label's centroid (rounded 6 dp and
    * float-quantized, same determinism discipline as [[kMeansTrain]]),
    * then the distribution of member-to-own-centroid cosine. Tight labels
    * score near their intra-class ceiling; a low `min_cos` names the
    * label with intruders (x54 then finds WHICH vectors).
    *
    * Scale shape: one (label × dim)-grain aggregate collected as bounded
    * driver metadata, shipped back as ONE map literal — the scoring pass
    * is a zero-join, codegen projection; the only other shuffle is the
    * label-grain summary. */
  def labelCompactness(embeddings: DataFrame, idCol: String, vecCol: String,
                       labelCol: String): DataFrame = {
    val cents = embeddings
      .select(col(labelCol).as("_lbl"), posexplode(col(vecCol)).as(Seq("_p", "_x")))
      .groupBy(col("_lbl"), col("_p"))
      .agg(round(avg(col("_x").cast("double")), 6).cast("float").as("_c"))
      .collect() // bounded driver metadata: labels × dims rows
    val byLbl: Map[Int, Seq[Float]] = cents.groupBy(_.getInt(0)).map {
      case (l, rows) => l -> rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toSeq
    }
    embeddings
      .withColumn("_sim",
        round(cosine(col(vecCol), element_at(typedLit(byLbl), col(labelCol))), 6))
      .groupBy(col(labelCol))
      .agg(count(lit(1)).cast("bigint").as("n"),
        round(avg(col("_sim")), 4).as("mean_cos"),
        round(min(col("_sim")), 4).as("min_cos"))
  }

  def standardizeEmbeddings(embeddings: DataFrame, idCol: String,
                            vecCol: String): DataFrame = {
    val dims = embeddings
      .select(posexplode(col(vecCol)).as(Seq("_p", "_v")))
      .groupBy(col("_p"))
      .agg(avg(col("_v").cast("double")).as("_m"),
        stddev_pop(col("_v").cast("double")).as("_s"))
    val packed = dims.agg(
      transform(array_sort(collect_list(struct(col("_p"), col("_m")))),
        s => s.getField("_m")).as("_ms"),
      transform(array_sort(collect_list(struct(col("_p"), col("_s")))),
        s => s.getField("_s")).as("_ss"))
    embeddings.crossJoin(broadcast(packed))
      .withColumn("_z", zip_with(
        zip_with(col(vecCol), col("_ms"), (x, m) => x.cast("double") - m),
        col("_ss"), (d, s) => when(s === 0.0d, lit(0.0d)).otherwise(d / s)))
      .select(col(idCol),
        size(col(vecCol)).cast("long").as("n_dims"),
        round(sqrt(aggregate(col(vecCol), lit(0.0d),
          (a, x) => a + x.cast("double") * x.cast("double"))), 4).as("pre_norm"),
        round(sqrt(aggregate(col("_z"), lit(0.0d),
          (a, z) => a + z * z)), 4).as("z_norm"),
        round(aggregate(col("_z"), lit(0.0d), (a, z) => a + z) /
          size(col(vecCol)).cast("double"), 6).as("z_mean"))
  }

  /** Per-dimension embedding drift between a REFERENCE snapshot and a
    * CURRENT one — the "did the encoder (or the corpus feeding it)
    * move" monitor that must run before any index trained on the old
    * distribution keeps serving: x116's PSI read applied dimension-wise
    * to the vector space itself, plus the mean-shift read PSI is blind
    * to when mass moves within a bin. Per dim: counts, means (6 dp;
    * shift differenced on the ROUNDED grid so it is engine-exact), and
    * PSI(cur ‖ ref) over the fixed `edges` bins with the family's
    * Laplace smoothing ((c + 0.5)/(n + bins/2) — the [[Maintenance]]
    * psiFromCounts convention, so a bin empty on one side contributes
    * finitely instead of ±∞).
    *
    * Scale shape: each snapshot collapses to dim grain (one explode +
    * hash agg, map-side partial) and to (dim, bin) grain — both
    * DICTIONARY-sized (d and d·bins rows) however large the snapshots —
    * then everything joins and folds at those grains. The bin grid
    * densifies via a literal explode per dim, never a cross join of
    * data frames. Mean noise is the standardizeEmbeddings summation
    * convention (≈1e-15 under a 6 dp grain); PSI derives from exact
    * integer counts. */
  def embeddingDrift(ref: DataFrame, cur: DataFrame, vecCol: String,
                     edges: Seq[Double]): DataFrame = {
    require(edges.nonEmpty, "need at least one bin edge")
    val nBins = edges.size + 1
    def ex(df: DataFrame) = df
      .select(posexplode(col(vecCol)).as(Seq("_p", "_v")))
      .select(col("_p").cast("long").as("dim"),
        col("_v").cast("double").as("_v"))
    val bin = edges.map(e =>
      when(col("_v") >= e, 1L).otherwise(0L)).reduce(_ + _)
    def stats(df: DataFrame, n: String, m: String) = ex(df)
      .groupBy(col("dim"))
      .agg(count(lit(1)).cast("long").as(n), avg(col("_v")).as(m))
    def cnt(df: DataFrame, c: String) = ex(df).withColumn("_bin", bin)
      .groupBy(col("dim"), col("_bin"))
      .agg(count(lit(1)).cast("long").as(c))
    val half = lit(0.5 * nBins)
    val p = (col("_cc") + 0.5d) / (col("n_cur") + half)
    val q = (col("_cr") + 0.5d) / (col("n_ref") + half)
    stats(ref, "n_ref", "_mr").join(stats(cur, "n_cur", "_mc"), Seq("dim"))
      .select(col("dim"), col("n_ref"), col("n_cur"), col("_mr"),
        col("_mc"), explode(sequence(lit(0L), lit(nBins - 1L))).as("_bin"))
      .join(cnt(ref, "_cr"), Seq("dim", "_bin"), "left")
      .join(cnt(cur, "_cc"), Seq("dim", "_bin"), "left")
      .na.fill(0L, Seq("_cr", "_cc"))
      .groupBy(col("dim"), col("n_ref"), col("n_cur"),
        round(col("_mr"), 6).as("mean_ref"),
        round(col("_mc"), 6).as("mean_cur"))
      .agg(round(sum((p - q) * log(p / q)), 6).as("psi"))
      .select(col("dim"), col("n_ref"), col("n_cur"), col("mean_ref"),
        col("mean_cur"),
        round(col("mean_cur") - col("mean_ref"), 6).as("mean_shift"),
        col("psi"))
  }

  /** Simplified (centroid-based) silhouette per label — the clustering-
    * quality score that needs only O(n·k) distance evaluations: for each
    * vector, a = Euclidean distance to its OWN label centroid, b = the
    * minimum distance to any OTHER centroid, s = (b-a)/max(a,b); emitted
    * as the per-label mean. The classic all-pairs silhouette is O(n²) and
    * dead at corpus scale; the centroid form is the standard scalable
    * surrogate (and what a curation pipeline actually monitors).
    *
    * Determinism: centroid components are rounded to 6 dp (the
    * [[labelCompactness]] fixed-point discipline) so both engines score
    * against IDENTICAL centroids; remaining float divergence is the
    * 64-term distance fold, ~1e-15, far under the 4 dp output grain.
    *
    * Scale shape: one (label × dim) aggregate collected as bounded driver
    * metadata (k·d doubles), shipped back as one broadcast k-row frame;
    * the scoring crossJoin multiplies rows by the FIXED k, then one
    * (vec_id) and one (label) hash aggregate. No n² stage. */
  def simplifiedSilhouette(embeddings: DataFrame, idCol: String,
                           vecCol: String, labelCol: String): DataFrame = {
    // Centroids collected as bounded driver metadata (k × d doubles — the
    // labelCompactness discipline) and shipped back as TYPED LITERALS:
    // the scoring pass is a ZERO-JOIN codegen projection (k explicit
    // distance terms), so no broadcast fan-out exists at all.
    val cents: Seq[(Int, Seq[Double])] = embeddings
      .select(col(labelCol).as("_lbl"), posexplode(col(vecCol)).as(Seq("_p", "_x")))
      .groupBy(col("_lbl"), col("_p"))
      .agg(round(avg(col("_x").cast("double")), 6).as("_c"))
      .collect() // bounded: labels × dims rows
      .groupBy(_.getInt(0)).map { case (l, rows) =>
        l -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
      }.toSeq.sortBy(_._1)
    def dist(c: Seq[Double]): Column = sqrt(aggregate(
      zip_with(col(vecCol), typedlit(c),
        (x, cc) => (x.cast("double") - cc) * (x.cast("double") - cc)),
      lit(0.0d), (acc, t) => acc + t))
    val own = cents.foldLeft(lit(null).cast("double")) { case (acc, (l, c)) =>
      when(col(labelCol) === l, dist(c)).otherwise(acc)
    }
    // least() skips nulls: each term contributes only for OTHER labels.
    val other = least(cents.map { case (l, c) =>
      when(col(labelCol) =!= l, dist(c))
    }: _*)
    embeddings
      .select(col(labelCol), own.as("_a"), other.as("_b"))
      .groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg((col("_b") - col("_a")) /
          greatest(col("_a"), col("_b"))), 4).as("mean_silhouette"))
  }

  /** Top principal component by fixed-iteration power method — the
    * embedding-drift / dominant-direction diagnostic (is one axis eating
    * the representation?): mean-center, covariance, `iters` rounds of
    * v ← normalize(C·v) from the deterministic 1/√d start, sign-fixed so
    * the largest-|component| is positive, then every vector's PC1
    * projection summarized per label plus the Rayleigh-quotient
    * eigenvalue.
    *
    * Determinism discipline: the dim means are rounded to 6 dp before
    * centering and the final eigenvector to 6 dp before projecting, so
    * both engines project onto IDENTICAL axes; the iteration itself is a
    * deterministic function of the covariance (fixed count, no
    * convergence test).
    *
    * Scale shape: one pass computes the d·(d+1)/2 Gram upper triangle via
    * [[graft.functions.GramMatrixAgg]] (map-side combined, the shuffle
    * carries ONE array per partition — never a d²-wide explode); the
    * d×d eigensolve is bounded driver metadata (d=64 → 4 KiB); the
    * projection pass is a zero-join codegen-friendly fold. */
  def pcaTopComponent(embeddings: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, iters: Int): DataFrame = {
    val d = embeddings.select(size(col(vecCol))).head().getInt(0)
    val mu: Seq[Double] = embeddings
      .select(posexplode(col(vecCol)).as(Seq("_p", "_v")))
      .groupBy(col("_p"))
      .agg(round(avg(col("_v").cast("double")), 6).as("_m"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1)).toSeq
    val centered = zip_with(col(vecCol), typedlit(mu),
      (x, m) => x.cast("double") - m)
    val n = embeddings.count()
    val packed = embeddings
      .select(graft.functions.GramMatrixAgg.gram(d)(centered).as("_g"))
      .head().getSeq[Double](0)
    val c = graft.functions.GramMatrixAgg.unpack(packed, d)
      .map(_.map(_ / (n - 1).toDouble))
    // Driver-side power iteration: O(iters·d²) on bounded metadata.
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var lambda = 0.0
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += c(i)(j) * v(j); j += 1 }
        s
      }
      lambda = {
        var s = 0.0; var i = 0
        while (i < d) { s += w(i) * v(i); i += 1 }
        s
      } // Rayleigh quotient v·C·v (v is unit-norm)
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
      it += 1
    }
    val sgn = if (v(v.indices.maxBy(i => (math.abs(v(i)), -i))) < 0) -1.0 else 1.0
    val vf: Seq[Double] = v.map(x =>
      BigDecimal(x * sgn).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
    val proj = aggregate(
      zip_with(centered, typedlit(vf), (x, e) => x * e),
      lit(0.0d), (acc, t) => acc + t)
    embeddings
      .select(col(labelCol).as("label"), proj.as("_p"))
      .groupBy(col("label"))
      .agg(count(lit(1)).cast("long").as("n"),
        round(avg(col("_p")), 4).as("mean_pc1"),
        round(stddev_samp(col("_p")), 4).as("sd_pc1"))
      .withColumn("eigenvalue",
        round(lit(lambda), 4))
  }

  /** Maximal-Marginal-Relevance re-ranking: the diversified top-`picks`
    * of a cosine top-`k` candidate list — greedy argmax of
    * λ·rel(d) − (1−λ)·max sim(d, already-picked), the standard RAG/
    * retrieval move against near-duplicate result lists (pure top-k
    * returns five copies of the same paragraph; MMR returns one plus
    * four genuinely different ones).
    *
    * Scale shape: candidate generation is the DISTRIBUTED part (one
    * codegen cosine projection + TakeOrderedAndProject — the corpus
    * never shuffles); the greedy loop runs on the collected k×d
    * candidate block, bounded driver metadata by construction (the
    * kMeansTrain discipline — k is a serving-size constant). All sims
    * round 6 dp (ascending-index fold, matching the native expression)
    * so the greedy trajectory is engine-portable.
    */
  def mmrRerank(embeddings: DataFrame, idCol: String, vecCol: String,
                queryId: Long, k: Int, picks: Int,
                lambda: Double): DataFrame = {
    val spark = embeddings.sparkSession
    val qv = embeddings.where(col(idCol) === queryId)
      .select(col(vecCol)).head().getSeq[Float](0).toIndexedSeq
    val cand = embeddings.where(col(idCol) =!= queryId)
      .select(col(idCol), col(vecCol),
        round(cosine(col(vecCol), typedlit(qv)), 6).as("rel"))
      .orderBy(col("rel").desc, col(idCol).asc)
      .limit(k)
      .collect() // bounded: k candidate vectors (serving-size constant)
      .map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq,
        r.getDouble(2)))
    def cos6(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { // ascending-index fold = the oracle's order
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, IndexedSeq[Float], Double, Double)]
    var remaining = cand.toBuffer
    (1 to math.min(picks, cand.length)).foreach { _ =>
      val scoredRem = remaining.map { case (id, vec, rel) =>
        val maxSim =
          if (selected.isEmpty) 0.0
          else selected.map(s => cos6(vec, s._2)).max
        (id, vec, rel, r6(lambda * rel - (1 - lambda) * maxSim))
      }
      val best = scoredRem.minBy { case (id, _, _, mmr) => (-mmr, id) }
      selected += best
      remaining = remaining.filterNot(_._1 == best._1)
    }
    import spark.implicits._
    selected.zipWithIndex.map { case ((id, _, rel, mmr), i) =>
      ((i + 1).toLong, id, rel, mmr)
    }.toSeq.toDF("rnk", "vec_id", "rel", "mmr")
  }

  /** Per-label medoid-by-centroid: the REAL member nearest its label's
    * (6 dp-rounded) centroid — the cluster exemplar you can actually show
    * (a centroid is synthetic; a medoid is a document). The true medoid
    * (min total pairwise distance) is O(n²) per label; nearest-to-
    * centroid is its standard O(n·1) surrogate. [[labelOutliers]] finds
    * the members FARTHEST out; this picks the one that best represents.
    *
    * Distances round 6 dp before the rank (id tie-break) — the
    * fixed-point discipline that makes the winner engine-portable.
    * Scale: one (label, dim) agg broadcast back, one codegen distance
    * projection, one per-label rank window at member grain. */
  def medoids(embeddings: DataFrame, idCol: String, vecCol: String,
              labelCol: String): DataFrame = {
    val cent = embeddings
      .select(col(labelCol).as("_lbl"), posexplode(col(vecCol)).as(Seq("_p", "_x")))
      .groupBy(col("_lbl"), col("_p"))
      .agg(round(avg(col("_x").cast("double")), 6).as("_c"))
      .groupBy(col("_lbl"))
      .agg(transform(array_sort(collect_list(struct(col("_p"), col("_c")))),
        s => s.getField("_c")).as("_cent"))
    val dist = round(sqrt(aggregate(
      zip_with(col(vecCol), col("_cent"),
        (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
      lit(0.0d), (acc, t) => acc + t)), 6)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(col("dist").asc, col(idCol).asc)
    embeddings.join(broadcast(cent), col(labelCol) === col("_lbl"))
      .withColumn("dist", dist)
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .select(col(labelCol), col(idCol).as("medoid_id"), col("dist"))
  }

  def labelOutliers(embeddings: DataFrame, idCol: String, vecCol: String,
                    labelCol: String, k: Int): DataFrame = {
    val pos = embeddings.select(col(labelCol).as("_lbl"),
      posexplode(col(vecCol)).as(Seq("_p", "_v")))
    val cent = pos.groupBy(col("_lbl"), col("_p"))
      .agg(avg(col("_v").cast("double")).as("_m"))
      .groupBy(col("_lbl"))
      .agg(transform(array_sort(collect_list(struct(col("_p"), col("_m")))),
        s => s.getField("_m")).as("_cent"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(col("sim").asc, col(idCol).asc)
    embeddings.join(broadcast(cent), col(labelCol) === col("_lbl"))
      .withColumn("sim", round(cosineFold(col(vecCol), col("_cent")), 6))
      .withColumn("out_rank", row_number().over(w).cast("long"))
      .filter(col("out_rank") <= k)
      .select(col(idCol), col(labelCol), col("sim"), col("out_rank"))
      .orderBy(col(labelCol), col("out_rank"))
  }

  /** Mutual nearest-neighbor matches — the high-precision pairing rule of
    * record linkage and bitext mining: emit (a, b) only when b is a's
    * top-1 neighbor AND a is b's: one-directional nearest-neighbor lists
    * are asymmetric (a hub is many vectors' top-1 without reciprocating),
    * and requiring reciprocity is the classic cheap filter that kills
    * hub-induced false matches before an expensive verify.
    *
    * Rides [[knnJoin]]'s shared-IVF self-kNN path (every vector queries,
    * k = 1, corpus never broadcast) — the approximation contract is the
    * probe trajectory, pinned by the same centroid/probe/rank tie-breaks
    * the x40 oracle replays. The mutual filter is ONE self-equi-join of
    * the |V|-row top-1 list on the reversed pair. cosine(a,b) ==
    * cosine(b,a) bitwise (same fold, same order), so one sim column
    * suffices. Output: (id_a, id_b, sim) with id_a < id_b. */
  def mutualNnMatches(embeddings: DataFrame, idCol: String, vecCol: String,
                      nCentroids: Int, nProbe: Int): DataFrame = {
    val t1 = knnJoin(embeddings, idCol, vecCol, lit(true), 1,
        nCentroids, nProbe)
      .select(col("qid"), col(idCol).as("_nn"), col("sim"))
    t1.as("a").join(t1.as("b"),
        col("a._nn") === col("b.qid") && col("b._nn") === col("a.qid") &&
          col("a.qid") < col("b.qid"))
      .select(col("a.qid").as("id_a"), col("b.qid").as("id_b"),
        col("a.sim").as("sim"))
  }

  /** Product quantization (Jégou et al. 2011): split each vector into `m`
    * contiguous subvectors, train an independent k-centroid L2 codebook
    * per subspace (Lloyd, `iters` rounds, init = first k vectors by id),
    * and encode every vector as its per-subspace nearest-centroid ids —
    * the memory-compression leg of the ANN stack that [[ivfTopK]]'s
    * coarse quantizer doesn't cover (IVF prunes WHERE to look, PQ shrinks
    * WHAT is stored: m bytes replace d floats, k^m virtual cells from
    * m·k stored centroids).
    *
    * Determinism contract (the kMeansTrain discipline, L2 flavor):
    * squared distances are sequential left-folds in double — bitwise
    * engine-portable — so argmin needs no rounding; ties break to the
    * lowest cid (array_position returns the FIRST minimum); centroid
    * means round 6 dp + quantize to float per round; empty clusters keep
    * their previous centroid. Output rows: (id, code_0..code_{m-1},
    * err = √(Σ_s d²_s) rounded 6 dp) — err is the reconstruction
    * distance to the concatenated codebook entry.
    *
    * Scale shape per round and subspace: ONE projection assigns every
    * subvector against k centroid literals and the update is one
    * map-side-combined (cid, pos)-grain mean agg collected as k·(d/m)
    * bounded driver rows — the corpus never shuffles row-wise (at 100 TB
    * the HOF fold becomes a native codegen expression and the update
    * mini-batches, both documented knobs; the plan shape stands). */
  def pqTrainEncode(embeddings: DataFrame, idCol: String, vecCol: String,
                    m: Int, k: Int, iters: Int): DataFrame = {
    val (sub, codebooks) = pqCodebooks(embeddings, idCol, vecCol, m, k, iters)
    // Encode: per subspace, argmin cid + its squared distance.
    val encoded = (0 until m).foldLeft(embeddings) { (df, s) =>
      val sv = slice(col(vecCol), s * sub + 1, sub)
      val dists = array(codebooks(s).map(c => sqDist(sv, c)): _*)
      df.withColumn(s"_ds$s", dists)
        .withColumn(s"code_$s",
          array_position(col(s"_ds$s"), array_min(col(s"_ds$s")))
            .cast("long"))
        .withColumn(s"_d2$s", array_min(col(s"_ds$s")))
    }
    encoded.select(col(idCol) +:
      (0 until m).map(s => col(s"code_$s")) :+
      round(sqrt((0 until m).map(s => col(s"_d2$s")).reduce(_ + _)), 6)
        .as("err"): _*)
  }

  /** Sequential-left-fold double squared L2 distance of a vector column
    * against a codeword literal — bitwise engine-portable (the
    * pqTrainEncode determinism contract). */
  private def sqDist(a: Column, c: Seq[Float]): Column =
    aggregate(zip_with(a, typedlit(c),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)

  /** PQ codebook training (the Lloyd loop of [[pqTrainEncode]], shared
    * with [[pqAdcTopK]]): returns (subspace width, per-subspace codeword
    * lists). Bounded driver metadata — m·k·(d/m) floats. */
  private[graft] def pqCodebooks(embeddings: DataFrame, idCol: String,
                                 vecCol: String, m: Int, k: Int,
                                 iters: Int): (Int, Seq[Seq[Seq[Float]]]) = {
    val probe = embeddings.select(size(col(vecCol)).as("_d")).head.getInt(0)
    require(probe % m == 0, s"dim $probe not divisible by m=$m")
    val sub = probe / m
    val init: Seq[Seq[Float]] = embeddings.orderBy(col(idCol).asc).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0).toSeq).toSeq
    // Train each subspace's codebook independently.
    val codebooks: Seq[Seq[Seq[Float]]] = (0 until m).map { s =>
      val sv = slice(col(vecCol), s * sub + 1, sub)
      var cvecs: Seq[Seq[Float]] = init.map(_.slice(s * sub, (s + 1) * sub))
      (1 to iters).foreach { _ =>
        val dists = array(cvecs.map(c => sqDist(sv, c)): _*)
        val means = embeddings
          .withColumn("_ds", dists)
          .withColumn("_cid",
            array_position(col("_ds"), array_min(col("_ds"))).cast("int"))
          .select(col("_cid"), posexplode(sv).as(Seq("_pos", "_x")))
          .groupBy(col("_cid"), col("_pos"))
          .agg(round(avg(col("_x").cast("double")), 6).cast("float").as("_m"))
          .collect() // bounded driver metadata: k x (d/m) rows
        val byCid = means.groupBy(_.getInt(0)).map { case (cid, rows) =>
          cid -> rows.sortBy(_.getInt(1)).map(_.getFloat(2)).toIndexedSeq
        }
        cvecs = cvecs.zipWithIndex.map { case (prev, i) =>
          byCid.getOrElse(i + 1, prev)
        }
      }
      cvecs
    }
    (sub, codebooks)
  }

  /** PQ asymmetric-distance search (Jégou et al. 2011 §IV): the query
    * stays a FULL vector while the corpus stays codes — per subspace, a
    * k-entry lookup table of exact query-to-codeword distances is built
    * once, and every encoded vector's approximate distance is just m
    * table lookups summed: ADC(q, x) = Σ_s lut_s[code_s(x)]. The read
    * leg completing the PQ pair (x115 compresses, this searches the
    * compressed corpus without decompressing it).
    *
    * Determinism: LUT entries are driver-side sequential left-folds in
    * double over the float slices — the same fold order as [[sqDist]]
    * and the oracle's list_reduce, so they agree bitwise; the per-vector
    * sum is m additions in subspace order; ties on the 6 dp-rounded ADC
    * break by id. The query's own row stays in the corpus (it is its own
    * reconstruction-nearest, a useful sanity row).
    *
    * Scale shape: encoding is the same per-subspace literal projection
    * as pqTrainEncode (no joins); the LUT rides into the plan as m
    * k-double literals (pure codegen arithmetic, no broadcast even); the
    * top-k cut is a TakeOrdered. At 100 TB the corpus would be
    * pre-encoded once (x115's output table) and this becomes LUT-build +
    * one scan of the code table. */
  def pqAdcTopK(embeddings: DataFrame, idCol: String, vecCol: String,
                m: Int, k: Int, iters: Int, queryId: Long,
                topK: Int): DataFrame = {
    val (sub, codebooks) = pqCodebooks(embeddings, idCol, vecCol, m, k, iters)
    val q: Seq[Float] = embeddings.where(col(idCol) === queryId)
      .select(col(vecCol)).head.getSeq[Float](0)
    val luts: Seq[Seq[Double]] = (0 until m).map { s =>
      val qs = q.slice(s * sub, (s + 1) * sub)
      codebooks(s).map(c => qs.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      })
    }
    encodeCodes(embeddings, idCol, vecCol, sub, codebooks)
      .select(col(idCol) +:
        (0 until m).map(s => col(s"code_$s")) :+
        round((0 until m).map(s =>
            element_at(typedlit(luts(s)), col(s"code_$s").cast("int")))
          .reduce(_ + _), 6).as("adc_d2"): _*)
      .orderBy(col("adc_d2").asc, col(idCol).asc)
      .limit(topK)
  }

  /** Batched ADC search — [[pqAdcTopK]] for EVERY query at once (what
    * [[knnJoin]] is to [[ivfTopK]], on the compressed leg): each query's
    * per-subspace lookup table is computed IN-ENGINE from its vector
    * against the codebook literals (the same left-fold [[sqDist]]
    * arithmetic as the driver-side LUTs — x118's oracle contract), the
    * query frame (qid + m k-double LUT arrays — slim, bounded)
    * broadcasts, and ONE scan of the encoded corpus sums m array lookups
    * per (row, query). The per-query cut is a rank window on the
    * 6 dp-rounded ADC with id tie-break. The query's own row stays in
    * the corpus (its cell's reconstruction distance — the pqAdcTopK
    * sanity-row convention).
    *
    * Scale shape: corpus encodes once (codegen projection, no shuffle),
    * the broadcast join fans each corpus row by |queries| — cost
    * |corpus|·|queries| ADC sums, each m array lookups, all codegen; the
    * rank window shuffles on qid at (corpus × queries) grain, the same
    * budget knnJoin accepts. At 100 TB the corpus side would be the
    * PRE-ENCODED x146 code table. */
  def pqAdcJoin(embeddings: DataFrame, idCol: String, vecCol: String,
                queryPred: Column, m: Int, k: Int, iters: Int,
                topK: Int): DataFrame = {
    val (sub, codebooks) = pqCodebooks(embeddings, idCol, vecCol, m, k, iters)
    val encoded = encodeCodes(embeddings, idCol, vecCol, sub, codebooks)
    val queries = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val withLuts = (0 until m).foldLeft(queries) { (df, s) =>
      val qs = slice(col("_qv"), s * sub + 1, sub)
      df.withColumn(s"_lut$s", array(codebooks(s).map(c => sqDist(qs, c)): _*))
    }.drop("_qv")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_d2").asc, col(idCol).asc)
    encoded
      .crossJoin(broadcast(withLuts))
      .withColumn("adc_d2", round((0 until m).map(s =>
          element_at(col(s"_lut$s"), col(s"code_$s").cast("int")))
        .reduce(_ + _), 6))
      .withColumn("adc_rank", row_number().over(w))
      .filter(col("adc_rank") <= topK)
      .select(col("qid"), col(idCol), col("adc_d2"), col("adc_rank"))
  }

  /** ADC-then-refine — the standard IVF-PQ serving shape ([[pqAdcJoin]]
    * generates, this re-ranks): the compressed scan is allowed to be
    * WRONG about order (quantization error is bounded but not zero), so
    * production ANN takes the top `candK` by ADC and re-scores just
    * those candidates against the RAW vectors, returning the exact-L2
    * top `topK`. Emitting both ranks makes the quantization error
    * legible: a candidate whose `refine_rank` differs from `adc_rank`
    * is exactly the reordering the refine step exists to fix, and a
    * missing true neighbor is a `candK` budget problem ([[ivfRecallCurve]]
    * measures that trade on the coarse leg).
    *
    * Scale shape: the candidate frame is |queries|·candK rows of ids —
    * OUTPUT-scale, broadcastable by construction — so the refine leg is
    * one broadcast-semi pass over the raw corpus (at 100 TB: a point-
    * lookup batch against the vector store, never a rescan of the code
    * table), the query vectors ride a second bounded broadcast, and the
    * exact distance is one array-local fold per candidate. The rank
    * window shuffles |queries|·candK rows on qid — output-scale again.
    * Exactness: ADC and exact L2 are the same sequential left-fold
    * double arithmetic as their oracles; both rounded 6 dp before
    * ranking with id tie-breaks. */
  def pqAdcRefine(embeddings: DataFrame, idCol: String, vecCol: String,
                  queryPred: Column, m: Int, k: Int, iters: Int,
                  candK: Int, topK: Int): DataFrame = {
    val cands = pqAdcJoin(embeddings, idCol, vecCol, queryPred, m, k, iters,
      candK)
    val queries = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val l2 = aggregate(zip_with(col(vecCol), col("_qv"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("exact_d2").asc, col(idCol).asc)
    embeddings.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("exact_d2", round(l2, 6))
      .withColumn("refine_rank", row_number().over(w))
      .filter(col("refine_rank") <= topK)
      .select(col("qid"), col(idCol), col("adc_rank"), col("exact_d2"),
        col("refine_rank"))
  }

  /** Refine-budget recall curve — [[ivfRecallCurve]]'s read on the
    * COMPRESSED leg: recall@k of the full ADC-then-refine stack
    * ([[pqAdcRefine]]) against the exact L2 top-k, at each candidate
    * budget in `candKs`. This is the number candK is actually chosen on:
    * the ADC scan is allowed to be wrong about ORDER (refine fixes
    * that), but a true neighbor outside the top-candK by ADC is LOST —
    * this curve prices that risk per budget. Monotone in candK under
    * nested candidate sets; reaches 1.0 when candK covers the corpus.
    *
    * Scale shape: ONE exact reference (the pqAdcJoin broadcast-scan
    * budget: |corpus|·|queries| array-local L2 folds, per-query rank
    * window), eagerly checkpointed and reused by every level — and ONE
    * codebook train + encode + ADC scan SHARED across all levels (the
    * [[ivfRecallCurve]] shared-reference shape): the ADC ranking runs
    * once at max(candKs), its candidates are exact-rescored once, both
    * checkpointed at output scale, and each level is just an
    * `adc_rank <= candK` filter + re-rank over that frame. Nested
    * candidate sets make the per-level output EQUAL to an independent
    * [[pqAdcRefine]] at that budget (same deterministic codebooks, same
    * windows/tie-breaks — spec-pinned), at 1/|candKs| the train cost.
    * Hits via an output-scale (qid, id)-grain semi-join; recall is a
    * ratio of exact integers.
    * Emits (cand_k, n_queries, hits, recall, cand_frac). */
  def pqRefineRecallCurve(embeddings: DataFrame, idCol: String,
                          vecCol: String, queryPred: Column, m: Int,
                          k: Int, iters: Int, candKs: Seq[Int],
                          topK: Int): DataFrame = {
    require(candKs.nonEmpty, "candKs must be non-empty")
    val queries = embeddings.filter(queryPred)
      .select(col(idCol).as("qid"), col(vecCol).as("_qv"))
    val l2 = aggregate(zip_with(col(vecCol), col("_qv"),
        (x, y) => (x.cast("double") - y.cast("double")) *
          (x.cast("double") - y.cast("double"))),
      lit(0.0), (acc, v) => acc + v)
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("_d2").asc, col(idCol).asc)
    val exact = embeddings.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(queries))
      .withColumn("_d2", round(l2, 6))
      .withColumn("_r", row_number().over(wExact))
      .filter(col("_r") <= topK)
      .select(col("qid"), col(idCol))
      .localCheckpoint(eager = true)
    val scal = exact.agg(
      countDistinct(col("qid")).cast("long").as("n_queries"))
    val n = embeddings.count() // bounded driver scalar: cand_frac denominator
    // One train + encode + max-budget ADC scan, shared by every level.
    val (sub, codebooks) = pqCodebooks(embeddings, idCol, vecCol, m, k, iters)
    val encoded = encodeCodes(embeddings, idCol, vecCol, sub, codebooks)
    val withLuts = (0 until m).foldLeft(queries) { (df, s) =>
      val qs = slice(col("_qv"), s * sub + 1, sub)
      df.withColumn(s"_lut$s", array(codebooks(s).map(c => sqDist(qs, c)): _*))
    }.drop("_qv")
    val wAdc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("adc_d2").asc, col(idCol).asc)
    val cands = encoded
      .crossJoin(broadcast(withLuts))
      .withColumn("adc_d2", round((0 until m).map(s =>
          element_at(col(s"_lut$s"), col(s"code_$s").cast("int")))
        .reduce(_ + _), 6))
      .withColumn("adc_rank", row_number().over(wAdc))
      .filter(col("adc_rank") <= candKs.max)
      .select(col("qid"), col(idCol), col("adc_rank"))
    // One exact re-score of the max-budget candidates (output scale:
    // |queries|·max(candKs) rows), checkpointed; levels filter + re-rank.
    val refined = embeddings.select(col(idCol), col(vecCol))
      .join(broadcast(cands), Seq(idCol))
      .join(broadcast(queries), Seq("qid"))
      .withColumn("exact_d2", round(l2, 6))
      .select(col("qid"), col(idCol), col("adc_rank"), col("exact_d2"))
      .localCheckpoint(eager = true)
    val wRef = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("exact_d2").asc, col(idCol).asc)
    // r14 OPT: measured-count broadcast switch for the stats-less
    // checkpointed reference (see truncationRecall) — the per-level hits
    // semi-join planned as SortMergeJoin over two cached bounded frames.
    val refSide: DataFrame => DataFrame =
      if (exact.count() <= 5000000L) broadcast _ else identity
    val perLevel = candKs.map { ck =>
      refined.filter(col("adc_rank") <= ck)
        .withColumn("refine_rank", row_number().over(wRef))
        .filter(col("refine_rank") <= topK)
        .select(col("qid"), col(idCol))
        .join(refSide(exact), Seq("qid", idCol), "left_semi")
        .agg(count(lit(1)).cast("long").as("hits"))
        .select(lit(ck).as("cand_k"), col("hits"))
    }.reduce(_ unionAll _)
    perLevel.crossJoin(broadcast(scal))
      .select(col("cand_k").cast("int").as("cand_k"), col("n_queries"),
        col("hits"),
        round(col("hits").cast("double") /
          (col("n_queries") * topK), 4).as("recall"),
        round(least(col("cand_k").cast("double") / n, lit(1.0)), 4)
          .as("cand_frac"))
  }

  /** The code-only PQ encode projection shared by [[pqAdcTopK]],
    * [[buildPqCodeTable]] and [[appendToPqCodeTable]]: per subspace, the
    * argmin codeword id against the codebook literals — one codegen
    * projection, no join, no shuffle. Ties break to the lowest cid
    * (first-occurrence array_position), the pqTrainEncode contract. */
  private[graft] def encodeCodes(embeddings: DataFrame, idCol: String,
                                 vecCol: String, sub: Int,
                                 codebooks: Seq[Seq[Seq[Float]]]): DataFrame =
    codebooks.indices.foldLeft(embeddings) { (df, s) =>
      val sv = slice(col(vecCol), s * sub + 1, sub)
      val dists = array(codebooks(s).map(c => sqDist(sv, c)): _*)
      df.withColumn(s"code_$s",
        array_position(dists, array_min(dists)).cast("long"))
    }.select(col(idCol) +: codebooks.indices.map(s => col(s"code_$s")): _*)

  private def pqSidecarPath(tablePath: String) =
    new org.apache.hadoop.fs.Path(tablePath, "_codebooks")

  /** Persist the trained codebooks beside the code table (the x144
    * `_centroids` discipline at the subspace level): line 1 `sub m k`,
    * then one `s ci v1,v2,...` line per codeword. Float.toString
    * round-trips exactly through Float.parseFloat, so encodes against the
    * recovered codebooks are bit-identical to encodes at train time —
    * the invariant the whole append path rests on. Bounded metadata:
    * m·k·(d/m) floats. */
  private def writePqCodebooks(spark: SparkSession, tablePath: String,
                               sub: Int, codebooks: Seq[Seq[Seq[Float]]]): Unit = {
    val header = s"$sub ${codebooks.size} ${codebooks.head.size}"
    val lines = for {
      (cb, s) <- codebooks.zipWithIndex
      (cw, ci) <- cb.zipWithIndex
    } yield s"$s $ci ${cw.mkString(",")}"
    val out = indexFsFor(spark, tablePath).create(pqSidecarPath(tablePath), true)
    try out.write((header +: lines).mkString("\n").getBytes("UTF-8"))
    finally out.close()
  }

  private[graft] def readPqCodebooks(spark: SparkSession,
                                     tablePath: String): (Int, Seq[Seq[Seq[Float]]]) = {
    val fs = indexFsFor(spark, tablePath)
    val p = pqSidecarPath(tablePath)
    require(fs.exists(p),
      s"$tablePath has no _codebooks sidecar — not a graft PQ code table")
    val in = fs.open(p)
    val lines =
      try new String(in.readAllBytes(), "UTF-8").trim.split("\n").toSeq
      finally in.close()
    val Array(sub, m, k) = lines.head.trim.split(" ").map(_.toInt)
    val byKey = lines.tail.map { l =>
      val Array(s, ci, vs) = l.trim.split(" ", 3)
      (s.toInt, ci.toInt) -> vs.split(",").map(java.lang.Float.parseFloat).toSeq
    }.toMap
    val codebooks = (0 until m).map(s => (0 until k).map(ci => byKey((s, ci))))
    (sub, codebooks)
  }

  /** Materialize a PQ code table: codebooks trained on `embeddings`
    * ([[pqCodebooks]]' Lloyd loop), persisted in the `_codebooks` sidecar,
    * and every input vector encoded and written PARTITIONED BY `code_0`
    * (k leaf dirs; k=256 at production scale) — the compressed-corpus
    * layout [[pqAdcTopKOverTable]] searches without decompressing and
    * [[appendToPqCodeTable]] maintains without retraining. */
  def buildPqCodeTable(embeddings: DataFrame, idCol: String, vecCol: String,
                       m: Int, k: Int, iters: Int, tablePath: String): Unit = {
    val (sub, codebooks) = pqCodebooks(embeddings, idCol, vecCol, m, k, iters)
    encodeCodes(embeddings, idCol, vecCol, sub, codebooks)
      .repartition(col("code_0"))
      .write.partitionBy("code_0").mode("overwrite").parquet(tablePath)
    // Sidecar AFTER the table write — mode(overwrite) clears tablePath,
    // so writing it first would delete it (the buildIvfIndex ordering).
    writePqCodebooks(embeddings.sparkSession, tablePath, sub, codebooks)
  }

  /** Incremental PQ maintenance (the r9 verdict's named gap): a new-vector
    * batch encodes against the PERSISTED codebooks — frozen, the x144
    * quantizer discipline at the subspace level; retraining would silently
    * re-cell the whole existing table — and appends into the partitioned
    * layout. Per-batch I/O is O(batch): only the batch's touched `code_0`
    * dirs receive files and the existing-id scan partition-prunes to those
    * same cells (a re-ingested id encodes to the same codes, so it is
    * found there). Duplicate ids WITHIN the batch collapse first; appends
    * must be sequential (the appendToIvfIndex contract). ADC search over
    * the maintained table ≡ over a one-shot encode with the same
    * codebooks (spec-pinned + oracled). */
  def appendToPqCodeTable(newBatch: DataFrame, idCol: String, vecCol: String,
                          tablePath: String): Unit = {
    val spark = newBatch.sparkSession
    val (sub, codebooks) = readPqCodebooks(spark, tablePath)
    val encoded = encodeCodes(newBatch.dropDuplicates(idCol), idCol, vecCol,
        sub, codebooks)
      .localCheckpoint(eager = false) // referenced by touched-list AND write
    val touched = encoded.select(col("code_0")).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded: <= k values
    if (touched.nonEmpty) {
      val existingIds = spark.read.parquet(tablePath)
        .filter(col("code_0").isin(touched: _*))
        .select(col(idCol))
      encoded
        .join(existingIds, Seq(idCol), "left_anti")
        .repartition(col("code_0"))
        .write.partitionBy("code_0").mode("append").parquet(tablePath)
    }
  }

  /** [[pqAdcTopK]]'s search leg over a MATERIALIZED code table: the
    * production shape the in-line version's scaladoc promises — LUTs
    * built driver-side from the sidecar codebooks and the query's full
    * vector (same left-fold bitwise contract), then ONE scan of the code
    * table summing m literal-array lookups; no join, no broadcast, the
    * cut is a TakeOrdered. The corpus is never re-encoded. */
  def pqAdcTopKOverTable(embeddings: DataFrame, idCol: String, vecCol: String,
                         queryId: Long, topK: Int, tablePath: String): DataFrame = {
    val spark = embeddings.sparkSession
    val (sub, codebooks) = readPqCodebooks(spark, tablePath)
    val m = codebooks.size
    val q: Seq[Float] = embeddings.where(col(idCol) === queryId)
      .select(col(vecCol)).head.getSeq[Float](0)
    val luts: Seq[Seq[Double]] = (0 until m).map { s =>
      val qs = q.slice(s * sub, (s + 1) * sub)
      codebooks(s).map(c => qs.zip(c).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + (x.toDouble - y.toDouble) * (x.toDouble - y.toDouble)
      })
    }
    spark.read.parquet(tablePath)
      // code_0 comes back as a partition column (int-inferred): re-cast so
      // the output schema matches the in-line pqAdcTopK exactly.
      .withColumn("code_0", col("code_0").cast("long"))
      .select(col(idCol) +:
        (0 until m).map(s => col(s"code_$s")) :+
        round((0 until m).map(s =>
            element_at(typedlit(luts(s)), col(s"code_$s").cast("int")))
          .reduce(_ + _), 6).as("adc_d2"): _*)
      .orderBy(col("adc_d2").asc, col(idCol).asc)
      .limit(topK)
  }
}
