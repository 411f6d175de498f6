package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Dedup, Funnel, Similarity, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import graft.pipeline.StatsPipeline

/** The named-query registry: every SURVEY.md §2 operator as a
  * `(SparkSession, sfDir) => DataFrame` plus an equivalent DuckDB oracle SQL.
  *
  * Parity conventions (so the driver's sorted-column value-hash matches):
  *  - identical column names on both sides (every computed column aliased);
  *  - timestamps surfaced as epoch-millis BIGINT (`unix_millis` ↔ `epoch_ms`);
  *  - counts/sums of integers cast to BIGINT on both sides;
  *  - double aggregates rounded (2-4 dp) on both sides;
  *  - deterministic ORDER BY with key tie-breaks on both sides.
  */
object Registry {

  private val W = Tables.WindowMillis       // 900000 (15 min)
  private val NOW = Tables.NowMillis        // 2024-01-31T00:00:00Z
  private val T0 = 1704672000000L           // 2024-01-08T00:00:00Z
  private val T1 = 1705276800000L           // 2024-01-15T00:00:00Z
  private val T2 = 1706054400000L           // 2024-01-24T00:00:00Z

  type Q = (SparkSession, String) => DataFrame

  /** Scratch dirs for queries that materialize state (streaming sinks,
    * the IVF/bucketed indexes): all live under the ONE per-process
    * [[graft.Scratch]] root (tmpfs-backed where available — the r8
    * streaming-bench flap was disk-backed checkpoint setup, not compute)
    * that a shutdown hook removes — repeated Verify/Bench runs must not
    * accrete state tables. */
  private def scratch(prefix: String): String =
    graft.Scratch.dir(prefix).toString

  // ---- shared builders (Spark side) ----

  private def channelStats(s: SparkSession, dir: String): DataFrame =
    StatsPipeline.channelStats(Tables.messages(s, dir), W)

  private def userStats(s: SparkSession, dir: String): DataFrame =
    StatsPipeline.userStats(Tables.messages(s, dir), W)

  private def docEmotes(s: SparkSession, dir: String): DataFrame =
    StatsPipeline.extractEmotes(
      Tables.documents(s, dir).select(
        col("lang").as("channel"), col("source").as("username"), col("text")),
      Tables.emoteDict(s, dir))

  // ---- shared SQL fragments (oracle side) ----

  private val csSql =
    s"SELECT event_type AS channel, (epoch_ms(ts) // $W) * $W + $W AS ts, " +
      "count(*) AS messages FROM events GROUP BY 1, 2"

  private val usSql =
    s"SELECT event_type AS channel, CAST(user_id AS VARCHAR) AS username, " +
      s"(epoch_ms(ts) // $W) * $W + $W AS ts, count(*) AS messages " +
      "FROM events GROUP BY 1, 2, 3"

  private val toksSql =
    """SELECT * FROM (SELECT lang AS channel, source AS username,
      |unnest(regexp_split_to_array(text, '\s+')) AS emote FROM documents)
      |WHERE emote <> ''""".stripMargin.replace("\n", " ")

  private val dictSql =
    """SELECT DISTINCT emote FROM (SELECT
      |unnest(regexp_split_to_array(text, '\s+')) AS emote FROM documents
      |WHERE source = 'src0') WHERE emote <> ''""".stripMargin.replace("\n", " ")

  private val emoteOccSql =
    s"WITH toks AS ($toksSql), dict AS ($dictSql) " +
      "SELECT channel, username, emote FROM toks WHERE emote IN (SELECT emote FROM dict)"

  /** Shared by s10 (batch session_window) and s10b (streaming
    * flatMapGroupsWithState) — identical session semantics, one oracle. */
  private val sessionsOracleSql =
    """WITH e AS (SELECT event_type AS channel, epoch_ms(ts) AS t FROM events),
      |d AS (SELECT channel, t, CASE WHEN t - lag(t) OVER
      |  (PARTITION BY channel ORDER BY t) >= 1800000 THEN 1 ELSE 0 END AS ns FROM e),
      |g AS (SELECT channel, t, sum(ns) OVER (PARTITION BY channel ORDER BY t
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d)
      |SELECT channel, min(t) AS started_at, max(t) + 1800000 AS ended_at,
      |count(*) AS n_events FROM g GROUP BY channel, sid
      |ORDER BY channel, started_at""".stripMargin.replace("\n", " ")

  /** The SCD2 history CTE chain over `events` rows matching `pred`, ending
    * in table `h` (user_id, version, event_type, valid_from, valid_to,
    * is_current, n_events) — generated once so j9 (one-shot build), j9b
    * (incremental merge, same result by the split-equivalence contract) and
    * j10 (point-in-time join) all check against the identical history. */
  private def scd2CteSql(pred: String) =
    s"""e AS (SELECT user_id, epoch_ms(ts) AS t, event_id, event_type FROM events WHERE $pred),
       |d AS (SELECT user_id, t, event_id, event_type,
       |CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER
       |(PARTITION BY user_id ORDER BY t, event_id) THEN 1 ELSE 0 END AS chg FROM e),
       |v AS (SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
       |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ver FROM d),
       |g AS (SELECT user_id, CAST(ver AS BIGINT) AS version, event_type,
       |min(t) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
       |FROM v GROUP BY 1, 2, 3),
       |h AS (SELECT user_id, version, event_type, valid_from,
       |COALESCE(lead(valid_from) OVER (PARTITION BY user_id ORDER BY version),
       |$NOW) AS valid_to,
       |CASE WHEN lead(valid_from) OVER (PARTITION BY user_id ORDER BY version)
       |IS NULL THEN true ELSE false END AS is_current, n_events FROM g)""".stripMargin

  /** Shared by j9 (one-shot SCD2 build) and j9b (incremental merge) —
    * split-equivalence is the merge operator's contract, so one oracle
    * covers both. */
  private lazy val scd2OracleSql =
    s"""WITH ${scd2CteSql("TRUE")}
       |SELECT user_id, version, event_type, valid_from, valid_to,
       |is_current, n_events
       |FROM h ORDER BY user_id, version""".stripMargin.replace("\n", " ")

  /** j10: even events build the dimension history; odd events are the fact
    * stream enriched point-in-time against it. */
  private lazy val pitJoinOracleSql =
    s"""WITH ${scd2CteSql("event_id % 2 = 0")},
       |o AS (SELECT event_id, user_id, epoch_ms(ts) AS t,
       |event_type AS ev_type FROM events WHERE event_id % 2 = 1)
       |SELECT o.event_id, o.user_id, o.t, o.ev_type,
       |h.valid_from AS state_from, h.version, h.event_type AS state
       |FROM o LEFT JOIN h ON o.user_id = h.user_id
       |AND h.valid_from <= o.t AND o.t < h.valid_to
       |ORDER BY o.event_id""".stripMargin.replace("\n", " ")

  /** The MinHash pair CTE chain (toks → shingles → signatures → banded
    * candidates → exact-Jaccard `j`) — generated from the same constants as
    * [[Dedup.minHashNearDup]] so the signature arithmetic is identical by
    * construction. Shared by the pair and cluster oracles. */
  private def minHashPairsCtes: String = {
    val sigExprs = (0 until Dedup.K).map(j =>
      s"min((${Dedup.aCoef(j)}*x + ${Dedup.bCoef(j)}) % ${Dedup.P}) AS s$j").mkString(", ")
    val bandSelects = (0 until Dedup.Bands).map { b =>
      val ks = (0 until Dedup.R).map(r => s"s${b * Dedup.R + r}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat_ws(':', $ks) AS bk FROM sig"
    }.mkString(" UNION ALL ")
    s"""toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
       |  list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |  ELSE [] END AS sl FROM toks),
       |shd AS (SELECT DISTINCT doc_id, unnest(sl) AS s FROM sh0),
       |hx AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS x FROM shd),
       |sig AS (SELECT doc_id, $sigExprs FROM hx GROUP BY 1),
       |bnd AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib FROM bnd a
       |  JOIN bnd b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |inter AS (SELECT c.ia, c.ib, count(*) AS i FROM cand c
       |  JOIN shd a ON a.doc_id = c.ia JOIN shd b ON b.doc_id = c.ib AND a.s = b.s
       |  GROUP BY 1, 2),
       |j AS (SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac FROM inter
       |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id)"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[Dedup.minHashNearDup]]. */
  private def minHashOracleSql: String =
    s"WITH $minHashPairsCtes SELECT id_a, id_b, round(jac, 4) AS jaccard " +
      "FROM j WHERE jac >= 0.8 ORDER BY id_a, id_b"

  /** DuckDB twin of [[Dedup.nearDupClusters]]: same pair CTEs, then the
    * component min-id via a recursive transitive closure over the
    * undirected pair graph — DuckDB's exact answer to what the Spark side
    * computes with min-label propagation. */
  private def nearDupClustersOracleSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
       |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(n, r) AS (
       |  SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM e)
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
       |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1)
       |SELECT d.doc_id, coalesce(c.root, d.doc_id) AS cluster_id,
       |  CAST(d.doc_id = coalesce(c.root, d.doc_id) AS INT) AS keep
       |FROM documents d LEFT JOIN comp c ON c.n = d.doc_id
       |ORDER BY d.doc_id""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Dedup.keepBestPerCluster]] over the x25 clusters and
    * the x10 whitespace token count as the quality score: same recursive
    * closure, then rank members per cluster by (tokens desc, id asc). */
  private def clusterKeepBestOracleSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
       |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(n, r) AS (
       |  SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM e)
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
       |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1),
       |sc AS (SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS INT) AS ws_tokens
       |  FROM documents),
       |lab AS (SELECT d.doc_id, coalesce(c.root, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c ON c.n = d.doc_id),
       |r AS (SELECT lab.doc_id, cluster_id, ws_tokens,
       |  CAST(row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY ws_tokens DESC, lab.doc_id) = 1 AS INT) AS keep_best
       |  FROM lab JOIN sc ON lab.doc_id = sc.doc_id)
       |SELECT doc_id, cluster_id, ws_tokens, keep_best FROM r
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** The embedding-LSH pair CTE chain (sign-LSH banding, 8 bands × 8 bits,
    * candidates from the (band, key) equi-join, exact-cosine verify table
    * `s`) — the SQL twin of [[Dedup.embeddingNearDup]]'s arithmetic. Shared
    * by the x12 pair oracle and the x29 semantic-cluster oracle. */
  private def embedPairsCtes: String =
    """e AS (SELECT vec_id, embedding FROM embeddings),
      |bands AS (SELECT unnest(generate_series(0, 7)) AS band),
      |bnd AS (SELECT vec_id, band,
      |  list_reduce(list_transform(generate_series(band*8+1, band*8+8),
      |    i -> CASE WHEN embedding[i] >= 0 THEN '1' ELSE '0' END), (a,b) -> a || b) AS bk
      |  FROM e, bands),
      |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b FROM bnd a
      |  JOIN bnd b ON a.band = b.band AND a.bk = b.bk AND a.vec_id < b.vec_id),
      |v AS (SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
      |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a+b)) AS nrm FROM e),
      |s AS (SELECT id_a, id_b,
      |  round(list_reduce(list_transform(generate_series(1, len(a.embedding)),
      |    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)), (x,y) -> x+y)
      |    / (a.nrm * b.nrm), 6) AS sim
      |  FROM cand JOIN v a ON id_a = a.vec_id JOIN v b ON id_b = b.vec_id)"""
      .stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Dedup.embeddingNearDup]] (8×8 sign-LSH, cosine 0.35). */
  private def embedNearDupOracleSql: String =
    s"WITH $embedPairsCtes SELECT id_a, id_b, sim FROM s WHERE sim >= 0.35 " +
      "ORDER BY id_a, id_b"

  /** DuckDB twin of [[Dedup.semanticDedup]]: same pair CTEs as x12, then
    * the recursive transitive closure — the same closure shape as
    * [[nearDupClustersOracleSql]], over the embedding pair graph. */
  private def semanticDedupOracleSql: String =
    s"""WITH RECURSIVE $embedPairsCtes,
       |p AS (SELECT id_a, id_b FROM s WHERE sim >= 0.35),
       |ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(n, r) AS (
       |  SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM ed)
       |  UNION
       |  SELECT ed.b, reach.r FROM reach JOIN ed ON ed.a = reach.n),
       |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1)
       |SELECT em.vec_id, coalesce(c.root, em.vec_id) AS cluster_id,
       |  CAST(em.vec_id = coalesce(c.root, em.vec_id) AS INT) AS keep
       |FROM embeddings em LEFT JOIN comp c ON c.n = em.vec_id
       |ORDER BY em.vec_id""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[graft.streaming.Streaming.runStreamLabelProp]]'s
    * final snapshot: the one-shot top-K co-occurrence graph + unrolled
    * fixed-round LPA trajectory over ALL click observations (the
    * split-equivalence target of the streaming fold). Same step shape as
    * [[labelPropagationOracle]], over the click-item kNN graph. */
  private def streamLabelPropOracle(topK: Int, rounds: Int): String = {
    val head = Seq(
      "ui AS (SELECT DISTINCT user_id, " +
        "CAST(json_extract(props, '$.k') AS INT) AS item " +
        "FROM events WHERE event_type = 'click')",
      "co AS (SELECT a.item AS u, b.item AS v, count(*) AS c " +
        "FROM ui a JOIN ui b ON a.user_id = b.user_id " +
        "AND a.item <> b.item GROUP BY 1, 2)",
      s"tp AS (SELECT u, v FROM (SELECT u, v, row_number() OVER " +
        "(PARTITION BY u ORDER BY c DESC, v ASC) AS rn FROM co) " +
        s"WHERE rn <= $topK)",
      "e0 AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v " +
        "FROM tp WHERE u <> v)",
      "bth AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0 " +
        "UNION ALL SELECT v, u FROM e0)",
      "l0 AS (SELECT DISTINCT src AS vertex, src AS label FROM bth)")
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"l$r AS MATERIALIZED (SELECT vertex, label FROM (" +
        s"SELECT b.src AS vertex, l.label, " +
        "row_number() OVER (PARTITION BY b.src " +
        "ORDER BY count(*) DESC, l.label ASC) AS rn " +
        s"FROM bth b JOIN l$p l ON l.vertex = b.dst GROUP BY 1, 2) " +
        "WHERE rn = 1)"
    }
    s"WITH ${(head ++ steps).mkString(", ")} " +
      s"SELECT label, CAST(count(*) AS BIGINT) AS size, " +
      "CAST(min(vertex) AS BIGINT) AS min_vertex, " +
      "CAST(max(vertex) AS BIGINT) AS max_vertex " +
      s"FROM l$rounds GROUP BY 1 ORDER BY size DESC, label ASC"
  }

  /** DuckDB twin of [[graft.operators.TimeSeries.sprt]]: the ln(·)
    * coefficients are the SAME Scala doubles the engine inlines
    * (shortest-repr doubles parse identically), so the LLR arithmetic is
    * bit-identical on both sides. */
  private def sprtOracle(p0: Double, p1: Double, alpha: Double,
                         beta: Double): String = {
    val c1 = math.log(p1 / p0)
    val c2 = math.log((1 - p1) / (1 - p0))
    val upper = math.log((1 - beta) / alpha)
    val lower = math.log(beta / (1 - alpha))
    s"""WITH d AS (SELECT user_id % 2 AS arm,
       |epoch_ms(ts) // 86400000 AS day,
       |CAST(count(*) AS BIGINT) AS m,
       |CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |AS BIGINT) AS k
       |FROM events GROUP BY 1, 2),
       |c AS (SELECT arm, day, m, k,
       |sum(k) OVER (PARTITION BY arm ORDER BY day) * $c1
       |+ sum(m - k) OVER (PARTITION BY arm ORDER BY day) * $c2 AS llr
       |FROM d),
       |dec AS (SELECT arm, day, m, k, llr,
       |CASE WHEN llr >= $upper THEN 'accept_h1'
       |WHEN llr <= $lower THEN 'accept_h0' END AS hit FROM c)
       |SELECT arm, CAST(count(*) AS BIGINT) AS n_buckets,
       |CAST(sum(m) AS BIGINT) AS n_obs,
       |CAST(sum(k) AS BIGINT) AS n_hits,
       |round(arg_max(llr, day), 6) AS llr_final,
       |min(day) FILTER (WHERE hit IS NOT NULL) AS decision_day,
       |coalesce(arg_min(hit, day) FILTER (WHERE hit IS NOT NULL),
       |'continue') AS decision
       |FROM dec GROUP BY arm ORDER BY arm""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[graft.operators.Eval.isotonicCalibration]]: the
    * closed-form minimax f_b = max_(a<=b) min_(c>=b) avg(a..c) over the
    * bounded bin table — equal to PAVA's pool average as a real number,
    * hence as a correctly-rounded double (both are one division of the
    * same exact-integer ratio). */
  private def isotonicOracleSql: String =
    s"""WITH b AS (SELECT n_chars // 50 AS bin,
       |CAST(count(*) AS BIGINT) AS n,
       |CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos
       |FROM documents GROUP BY 1),
       |pre AS (SELECT bin, n, pos,
       |sum(n) OVER (ORDER BY bin) AS cn,
       |sum(pos) OVER (ORDER BY bin) AS cp FROM b),
       |avgs AS (SELECT a.bin AS ba, c.bin AS bc,
       |CAST(c.cp - (a.cp - a.pos) AS DOUBLE) / (c.cn - (a.cn - a.n)) AS av
       |FROM pre a JOIN pre c ON a.bin <= c.bin),
       |m1 AS (SELECT avgs.ba, bb.bin AS bb, min(av) AS mn
       |FROM avgs JOIN b bb ON avgs.bc >= bb.bin AND avgs.ba <= bb.bin
       |GROUP BY 1, 2),
       |iso AS (SELECT bb AS bin, max(mn) AS f FROM m1 GROUP BY 1)
       |SELECT b.bin, b.n, b.pos,
       |round(CAST(b.pos AS DOUBLE) / b.n, 6) AS rate,
       |round(iso.f, 6) AS isotonic
       |FROM b JOIN iso ON iso.bin = b.bin
       |ORDER BY b.bin""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Dedup.dbscanLsh]] (8×8 sign-LSH, ε = cosine 0.3,
    * minPts 3): same pair CTEs as x12, degree-thresholded core set,
    * recursive closure over the CORE-CORE subgraph only (seeded from ALL
    * cores, so an isolated core is its own singleton cluster), border =
    * non-core with a core neighbor assigned the MIN adjacent core label,
    * the rest noise. */
  private def dbscanLshOracleSql: String =
    s"""WITH RECURSIVE $embedPairsCtes,
       |p AS (SELECT id_a, id_b FROM s WHERE sim >= 0.3),
       |ed AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |core AS (SELECT a AS vid FROM ed GROUP BY 1 HAVING count(*) >= 2),
       |ce AS (SELECT ed.a, ed.b FROM ed
       |  JOIN core ca ON ca.vid = ed.a JOIN core cb ON cb.vid = ed.b),
       |reach(n, r) AS (
       |  SELECT vid AS n, vid AS r FROM core
       |  UNION
       |  SELECT ce.b, reach.r FROM reach JOIN ce ON ce.a = reach.n),
       |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1),
       |brd AS (SELECT ed.a AS vid, min(comp.root) AS root FROM ed
       |  JOIN core c ON c.vid = ed.b JOIN comp ON comp.n = ed.b
       |  WHERE ed.a NOT IN (SELECT vid FROM core) GROUP BY 1)
       |SELECT em.vec_id,
       |  CASE WHEN comp.n IS NOT NULL THEN 'core'
       |       WHEN brd.vid IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role,
       |  coalesce(comp.root, brd.root) AS cluster_id
       |FROM embeddings em
       |LEFT JOIN comp ON comp.n = em.vec_id
       |LEFT JOIN brd ON brd.vid = em.vec_id
       |ORDER BY em.vec_id""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.quantizeInt8]] — same scale/round
    * arithmetic, same sequential double fold for the reconstruction error,
    * and the two exact integer checksums. */
  private def quantizeOracleSql: String =
    s"""WITH m AS (SELECT vec_id, embedding,
       |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
       |  FROM embeddings),
       |q AS (SELECT vec_id, embedding, scale,
       |  list_transform(embedding, x -> CASE WHEN scale = 0 THEN 0
       |    ELSE CAST(round(CAST(x AS DOUBLE) / scale, 0) AS BIGINT) END) AS qv
       |  FROM m)
       |SELECT vec_id, CAST(len(embedding) AS INT) AS n_dims,
       |  CAST(list_reduce(qv, (a,b) -> a + b) AS BIGINT) AS q_sum,
       |  CAST(list_reduce(list_transform(qv, x -> abs(x)), (a,b) -> a + b) AS BIGINT) AS q_l1,
       |  round(list_reduce(list_transform(generate_series(1, len(embedding)),
       |    i -> (CAST(embedding[i] AS DOUBLE) - qv[i] * scale) * (CAST(embedding[i] AS DOUBLE) - qv[i] * scale)),
       |    (a,b) -> a + b) / len(embedding) * 1000000.0, 4) AS mse_e6
       |FROM q ORDER BY vec_id""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[graft.operators.ZOrder.zValue]] over (user_id mod
    * 256, day mod 256) — generated from the same (bits, ndim) constants so
    * the interleave arithmetic is identical by construction. */
  private def zOrderOracleSql: String = {
    val terms = (for { b <- 0 until 8; (c, i) <- Seq("d1" -> 0, "d2" -> 1) }
      yield s"((($c >> $b) & 1) << ${b * 2 + i})").mkString(" | ")
    s"""WITH d AS (SELECT event_id, user_id % 256 AS d1,
       |(epoch_ms(ts) // 86400000) % 256 AS d2 FROM events)
       |SELECT event_id, d1, d2, ($terms) AS zval FROM d
       |ORDER BY event_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[Dedup.simHashNearDup]] (32-bit simhash, 4×8-bit
    * bands, Hamming <= 3). */
  private def simHashOracleSql: String = {
    val wExprs = (0 until 32).map(b =>
      s"sum(CASE WHEN (h >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS w$b").mkString(", ")
    val sigExpr = (0 until 32).map(b =>
      s"CASE WHEN w$b > 0 THEN ${1L << b} ELSE 0 END").mkString(" + ")
    val bandSelects = (0 until 4).map(b =>
      s"SELECT doc_id, simhash, $b AS band, (simhash >> ${8 * b}) % 256 AS bk FROM sig")
      .mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id,
       |  unnest(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM toks),
       |w AS (SELECT doc_id, $wExprs FROM h GROUP BY 1),
       |sig AS (SELECT doc_id, $sigExpr AS simhash FROM w),
       |bnd AS ($bandSelects),
       |cand AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib,
       |  a.simhash AS sa, b.simhash AS sb FROM bnd a
       |  JOIN bnd b ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
       |SELECT ia AS id_a, ib AS id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY id_a, id_b"""
      .stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[Dedup.ngramJaccardPairs]]: the GROUND TRUTH — all
    * pairs with exact 3-gram Jaccard >= 0.8, computed with no candidate
    * pruning at all (fine at oracle scale). The Spark side must reproduce
    * it exactly, which also proves the prefix filter is lossless. */
  private def ngramJaccardOracleSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
       |  list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |  ELSE [] END AS sl FROM toks),
       |shd AS (SELECT DISTINCT doc_id, unnest(sl) AS s FROM sh0),
       |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
       |  FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |j AS (SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS jac FROM inter
       |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id)
       |SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.8
       |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Dedup.overlapPairs]]: UNPRUNED overlap-coefficient
    * ground truth (the engine side prunes with the smaller-side prefix
    * filter; the oracle verifies the pruning is lossless). */
  private def overlapOracleSql: String =
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
       |  list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
       |  ELSE [] END AS sl FROM toks),
       |shd AS (SELECT DISTINCT doc_id, unnest(sl) AS s FROM sh0),
       |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
       |  FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
       |o AS (SELECT ia AS id_a, ib AS id_b,
       |  CAST(i AS DOUBLE) / least(sa.n, sb.n) AS ov FROM inter
       |  JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id)
       |SELECT id_a, id_b, round(ov, 4) AS overlap FROM o WHERE ov >= 0.8
       |ORDER BY id_a, id_b""".stripMargin.replace("\n", " ")

  /** x47: profiled columns — the oracle SQL is generated from the same
    * list so the column set can't drift between the two sides. */
  private val profileCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private lazy val profileOracleSql = {
    val aggs = "CAST(count(*) AS BIGINT) AS n_rows, " + profileCols.map(c =>
      s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_$c, " +
        s"CAST(count(DISTINCT $c) AS BIGINT) AS d_$c").mkString(", ")
    val arms = profileCols.map(c =>
      s"SELECT '$c' AS col_name, n_rows, n_$c AS n_nulls, d_$c AS n_distinct FROM t")
      .mkString(" UNION ALL ")
    s"WITH d AS (SELECT doc_id, text, source, n_chars, " +
      s"CASE WHEN doc_id % 9 = 0 THEN NULL ELSE lang END AS lang FROM documents), " +
      s"t AS (SELECT $aggs FROM d) $arms ORDER BY col_name"
  }

  /** x48: anchor ids — shared between the Spark entry and its oracle. */
  private val hardNegAnchors = Seq(0L, 1L, 2L, 3L)

  private lazy val hardNegativesOracleSql = {
    val anchors = hardNegAnchors.mkString(", ")
    s"""WITH q AS (SELECT vec_id AS anchor_id, embedding AS qv
       |FROM embeddings WHERE vec_id IN ($anchors)),
       |s AS (SELECT q.anchor_id, e.vec_id,
       |round(${cosSql("e.embedding", "q.qv")}, 6) AS sim
       |FROM embeddings e, q WHERE e.vec_id <> q.anchor_id),
       |b AS (SELECT anchor_id, vec_id, sim,
       |CAST(row_number() OVER (PARTITION BY anchor_id
       |ORDER BY sim DESC, vec_id) AS BIGINT) AS neg_rank
       |FROM s WHERE sim >= 0.10 AND sim < 0.95)
       |SELECT anchor_id, vec_id, sim, neg_rank FROM b WHERE neg_rank <= 5
       |ORDER BY anchor_id, neg_rank""".stripMargin.replace("\n", " ")
  }

  /** j11: PageRank oracle — the iteration loop unrolled into CTEs r1..rN,
    * generated from the SAME constants as the Spark call (5 iterations,
    * d=0.85, per-iteration round to 6 dp) so the fixed-point arithmetic is
    * identical by construction. The graph (bidirectional customer↔supplier
    * transaction edges, suppliers negated into their own id space) has no
    * dangling nodes, so the oracle omits the dangling term the operator
    * spec-pins separately. */
  private lazy val pageRankOracleSql = {
    val (d, iters) = (0.85, 5)
    val itCtes = (1 to iters).map { i =>
      s"r$i AS (SELECT n.node, round((SELECT (1-$d)/nn FROM cnt) + " +
        s"$d * COALESCE(c.contrib, 0.0), 6) AS rank FROM n LEFT JOIN " +
        s"(SELECT e.dst AS node, sum(r${i - 1}.rank / o.ow * e.w) AS contrib " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node " +
        s"JOIN o ON e.src = o.src GROUP BY 1) c ON n.node = c.node)"
    }.mkString(", ")
    "WITH base AS (SELECT o_custkey AS c, l_suppkey AS s, " +
      "CAST(count(*) AS DOUBLE) AS w FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
      "e AS (SELECT c AS src, -s AS dst, w FROM base " +
      "UNION ALL SELECT -s AS src, c AS dst, w FROM base), " +
      "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
      "cnt AS (SELECT CAST(count(*) AS DOUBLE) AS nn FROM n), " +
      "o AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1), " +
      "r0 AS (SELECT node, (SELECT 1.0/nn FROM cnt) AS rank FROM n), " +
      s"$itCtes SELECT node, rank FROM r$iters " +
      "ORDER BY rank DESC, node LIMIT 20"
  }

  /** DuckDB twin of [[graft.operators.Graph.personalizedPageRank]] on
    * j11's bidirectional transaction graph (no dangling nodes there, so
    * the restart term is teleport-only): the same unrolled trajectory
    * with the teleport CASE'd onto the seed set; constants interpolate
    * the Scala-computed doubles (the holtOracle discipline). */
  private lazy val pprOracleSql = {
    val (d, iters) = (0.85, 5)
    val seeds = "1, 2, 3"
    val share = (1.0 / 3).toString
    val tele = ((1.0 - d) * (1.0 / 3)).toString
    val itCtes = (1 to iters).map { i =>
      s"r$i AS (SELECT n.node, round(CASE WHEN n.node IN ($seeds) " +
        s"THEN $tele ELSE 0.0 END + " +
        s"$d * COALESCE(c.contrib, 0.0), 6) AS rank FROM n LEFT JOIN " +
        s"(SELECT e.dst AS node, sum(r${i - 1}.rank / o.ow * e.w) AS contrib " +
        s"FROM e JOIN r${i - 1} ON e.src = r${i - 1}.node " +
        s"JOIN o ON e.src = o.src GROUP BY 1) c ON n.node = c.node)"
    }.mkString(", ")
    "WITH base AS (SELECT o_custkey AS c, l_suppkey AS s, " +
      "CAST(count(*) AS DOUBLE) AS w FROM lineitem " +
      "JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2), " +
      "e AS (SELECT c AS src, -s AS dst, w FROM base " +
      "UNION ALL SELECT -s AS src, c AS dst, w FROM base), " +
      "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
      "o AS (SELECT src, sum(w) AS ow FROM e GROUP BY 1), " +
      s"r0 AS (SELECT node, CASE WHEN node IN ($seeds) THEN $share " +
      "ELSE 0.0 END AS rank FROM n), " +
      s"$itCtes SELECT node, rank FROM r$iters " +
      "ORDER BY rank DESC, node LIMIT 20"
  }

  /** DuckDB twin of [[Similarity.kMeansTrain]] (k=8, 3 Lloyd rounds,
    * cosine objective): the iteration unrolled into generated CTEs from
    * the same constants — init = first k vectors, per-round means rounded
    * 6 dp and quantized to FLOAT so both engines iterate from
    * bit-identical centroids, argmax ties to the smallest cid. */
  /** DuckDB twin of [[graft.operators.Merge.applyChangeLog]] over the
    * events op log (j16) — also the oracle of the streaming fold (s16) by
    * the collapse's split-equivalence. */
  private val cdcApplyOracleSql: String =
    """WITH r AS (SELECT user_id, event_type, value,
      |CAST(epoch_ms(ts) AS BIGINT) AS ts,
      |row_number() OVER (PARTITION BY user_id
      |ORDER BY ts DESC, event_id DESC) AS rn FROM events)
      |SELECT user_id, event_type AS last_type,
      |round(value, 2) AS last_value, ts
      |FROM r WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin.replace("\n", " ")

  private lazy val kMeansCtes = {
    val (k, iters) = (8, 3)
    val ctes = Seq(
      s"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, " +
        s"CAST(embedding AS FLOAT[]) AS cv FROM " +
        s"(SELECT * FROM embeddings ORDER BY vec_id LIMIT $k))") ++
      (1 to iters).flatMap { i =>
        Seq(
          s"s$i AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
            s"AS sim FROM embeddings e, c${i - 1} c)",
          s"a$i AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
            "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
            s"AS rn FROM s$i) WHERE rn = 1)",
          s"m$i AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) AS mv " +
            s"FROM a$i a JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) " +
            "AS x, unnest(range(1, len(embedding)+1)) AS pos FROM embeddings) d " +
            "USING (vec_id) GROUP BY 1, 2)",
          s"n$i AS (SELECT cid, list(mv ORDER BY pos) AS cv FROM m$i GROUP BY cid)",
          s"c$i AS (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv FROM c${i - 1} p " +
            s"LEFT JOIN n$i n USING (cid))")
      } ++ Seq(
        s"sf AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
          s"AS sim FROM embeddings e, c$iters c)",
        "af AS (SELECT vec_id, cid, sim FROM (SELECT vec_id, cid, sim, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
          "AS rn FROM sf) WHERE rn = 1)")
    ctes.mkString(", ")
  }

  private lazy val kMeansOracleSql =
    s"WITH $kMeansCtes " +
      "SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, round(sim, 6) AS sim " +
      "FROM af ORDER BY vec_id"

  /** DuckDB twin of [[Similarity.kMeansUpdate]] (base = vec_id < 250,
    * batch = the rest, k=8, 3 Lloyd rounds): the base training unrolled
    * with the x69 fixed-point discipline over the base slice only, then
    * the count-weighted mean merge c' = (n·c + m·b)/(n+m) per dimension
    * (6-dp-rounded + float-quantized like the training rounds), summary
    * scalars folded over pos-ORDERED lists so both engines sum in the
    * same order. Reused CTEs are MATERIALIZED (DuckDB inlines by default
    * and a k-times-referenced chain re-executes k times). */
  private lazy val kMeansUpdateOracleSql: String = {
    val (k, iters, split) = (8, 3, 250)
    val ctes = Seq(
      s"src AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id < $split)",
      s"bt AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id >= $split)",
      s"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, " +
        s"CAST(embedding AS FLOAT[]) AS cv FROM " +
        s"(SELECT * FROM src ORDER BY vec_id LIMIT $k))") ++
      (1 to iters).flatMap { i =>
        Seq(
          s"s$i AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
            s"AS sim FROM src e, c${i - 1} c)",
          s"a$i AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
            "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
            s"AS rn FROM s$i) WHERE rn = 1)",
          s"m$i AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) AS mv " +
            s"FROM a$i a JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) " +
            "AS x, unnest(range(1, len(embedding)+1)) AS pos FROM src) d " +
            "USING (vec_id) GROUP BY 1, 2)",
          s"n$i AS (SELECT cid, list(mv ORDER BY pos) AS cv FROM m$i GROUP BY cid)",
          s"c$i AS MATERIALIZED (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv " +
            s"FROM c${i - 1} p LEFT JOIN n$i n USING (cid))")
      } ++ Seq(
        s"sf AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
          s"AS sim FROM src e, c$iters c)",
        "af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
          "AS rn FROM sf) WHERE rn = 1)",
        "bcn AS MATERIALIZED (SELECT cid, CAST(count(*) AS BIGINT) AS n " +
          "FROM af GROUP BY 1)",
        s"sb AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
          s"AS sim FROM bt e, c$iters c)",
        "ab AS MATERIALIZED (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
          "AS rn FROM sb) WHERE rn = 1)",
        "mc AS MATERIALIZED (SELECT cid, CAST(count(*) AS BIGINT) AS m " +
          "FROM ab GROUP BY 1)",
        "bm AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) AS bv " +
          "FROM ab a JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) " +
          "AS x, unnest(range(1, len(embedding)+1)) AS pos FROM bt) d " +
          "USING (vec_id) GROUP BY 1, 2)",
        s"cp AS (SELECT cid, CAST(unnest(cv) AS FLOAT) AS c, " +
          s"unnest(range(1, len(cv)+1)) AS pos FROM c$iters)",
        "mg AS (SELECT cp.cid, cp.pos, cp.c, " +
          "CASE WHEN mc.m IS NULL THEN cp.c ELSE " +
          "CAST(round((COALESCE(bcn.n, 0) * CAST(cp.c AS DOUBLE) + " +
          "mc.m * CAST(bm.bv AS DOUBLE)) / (COALESCE(bcn.n, 0) + mc.m), 6) " +
          "AS FLOAT) END AS nv FROM cp " +
          "LEFT JOIN bcn ON bcn.cid = cp.cid " +
          "LEFT JOIN mc ON mc.cid = cp.cid " +
          "LEFT JOIN bm ON bm.cid = cp.cid AND bm.pos = cp.pos)",
        "fin AS (SELECT cid, list(c ORDER BY pos) AS ovl, " +
          "list(nv ORDER BY pos) AS nvl FROM mg GROUP BY 1)")
    s"WITH ${ctes.mkString(", ")} " +
      "SELECT CAST(f.cid AS BIGINT) AS cluster_id, " +
      "CAST(COALESCE(bcn.n, 0) AS BIGINT) AS n_base, " +
      "CAST(COALESCE(mc.m, 0) AS BIGINT) AS n_batch, " +
      "round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      "list_transform(f.nvl, v -> CAST(v AS DOUBLE))), (x, y) -> x + y), 6) " +
      "AS c_sum, " +
      s"round(1.0 - ${cosSql("f.ovl", "f.nvl")}, 6) AS drift " +
      "FROM fin f LEFT JOIN bcn ON bcn.cid = f.cid " +
      "LEFT JOIN mc ON mc.cid = f.cid ORDER BY cluster_id"
  }

  /** DuckDB twin of the STREAMING mini-batch k-means fold (s36): the
    * x145 oracle's training prefix, then the three ordered batch merges
    * UNROLLED as chained state CTEs (st0 → st3) — the fold is
    * path-dependent (batch t assigns against centroids batch t−1 moved),
    * so the oracle replays the identical order; every per-step mean and
    * merge rounds 6 dp + float-quantizes exactly like the engine. */
  private lazy val kMeansStreamOracleSql: String = {
    val (k, iters, split, slices) = (8, 3, 250, 3)
    val train = Seq(
      s"src AS MATERIALIZED (SELECT * FROM embeddings WHERE vec_id < $split)",
      s"c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS cid, " +
        s"CAST(embedding AS FLOAT[]) AS cv FROM " +
        s"(SELECT * FROM src ORDER BY vec_id LIMIT $k))") ++
      (1 to iters).flatMap { i =>
        Seq(
          s"s$i AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
            s"AS sim FROM src e, c${i - 1} c)",
          s"a$i AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
            "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
            s"AS rn FROM s$i) WHERE rn = 1)",
          s"m$i AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) AS mv " +
            s"FROM a$i a JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) " +
            "AS x, unnest(range(1, len(embedding)+1)) AS pos FROM src) d " +
            "USING (vec_id) GROUP BY 1, 2)",
          s"n$i AS (SELECT cid, list(mv ORDER BY pos) AS cv FROM m$i GROUP BY cid)",
          s"c$i AS MATERIALIZED (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv " +
            s"FROM c${i - 1} p LEFT JOIN n$i n USING (cid))")
      } ++ Seq(
        s"sf AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
          s"AS sim FROM src e, c$iters c)",
        "af AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
          "AS rn FROM sf) WHERE rn = 1)",
        "bcn AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM af GROUP BY 1)",
        s"st0 AS MATERIALIZED (SELECT c.cid, COALESCE(b.n, 0) AS n, c.cv " +
          s"FROM c$iters c LEFT JOIN bcn b USING (cid))")
    val steps = (1 to slices).flatMap { t =>
      Seq(
        s"bt$t AS MATERIALIZED (SELECT * FROM embeddings " +
          s"WHERE vec_id >= $split AND vec_id % $slices = ${t - 1})",
        s"sb$t AS (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} " +
          s"AS sim FROM bt$t e, st${t - 1} c)",
        s"ab$t AS MATERIALIZED (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
          "row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) " +
          s"AS rn FROM sb$t) WHERE rn = 1)",
        s"mc$t AS MATERIALIZED (SELECT cid, CAST(count(*) AS BIGINT) AS m " +
          s"FROM ab$t GROUP BY 1)",
        s"bm$t AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) AS bv " +
          s"FROM ab$t a JOIN (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) " +
          s"AS x, unnest(range(1, len(embedding)+1)) AS pos FROM bt$t) d " +
          "USING (vec_id) GROUP BY 1, 2)",
        s"cp$t AS (SELECT cid, n, CAST(unnest(cv) AS FLOAT) AS c, " +
          s"unnest(range(1, len(cv)+1)) AS pos FROM st${t - 1})",
        s"mg$t AS (SELECT cp.cid, cp.pos, " +
          "CASE WHEN mc.m IS NULL THEN cp.c ELSE " +
          "CAST(round((cp.n * CAST(cp.c AS DOUBLE) + " +
          "mc.m * CAST(bm.bv AS DOUBLE)) / (cp.n + mc.m), 6) AS FLOAT) END " +
          "AS nv, cp.n + COALESCE(mc.m, 0) AS nn " +
          s"FROM cp$t cp LEFT JOIN mc$t mc ON mc.cid = cp.cid " +
          s"LEFT JOIN bm$t bm ON bm.cid = cp.cid AND bm.pos = cp.pos)",
        s"st$t AS MATERIALIZED (SELECT cid, max(nn) AS n, " +
          s"list(nv ORDER BY pos) AS cv FROM mg$t GROUP BY 1)")
    }
    s"WITH ${(train ++ steps).mkString(", ")} " +
      "SELECT CAST(s0.cid AS BIGINT) AS cluster_id, " +
      "CAST(s0.n AS BIGINT) AS n_base, " +
      s"CAST(s$slices.n - s0.n AS BIGINT) AS n_batch, " +
      s"round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(s$slices.cv, v -> CAST(v AS DOUBLE))), (x, y) -> x + y), 6) " +
      "AS c_sum, " +
      s"round(1.0 - ${cosSql("s0.cv", s"s$slices.cv")}, 6) AS drift " +
      s"FROM st0 s0 JOIN st$slices s$slices USING (cid) ORDER BY cluster_id"
  }

  /** DuckDB twin of the cluster-balanced sample: the same unrolled
    * k-means assignment, then x19's salted-hash cap per cluster. */
  private lazy val clusterBalancedOracleSql =
    s"WITH $kMeansCtes, " +
      "h AS (SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, " +
      "('0x' || substr(md5('cbal:' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT " +
      "AS hv FROM af), " +
      "r AS (SELECT vec_id, cluster_id, row_number() OVER " +
      "(PARTITION BY cluster_id ORDER BY hv, vec_id) AS rn FROM h) " +
      "SELECT vec_id, cluster_id FROM r WHERE rn <= 40 ORDER BY vec_id"

  /** SQL fragment: sequential-left-fold double squared-L2 of two list
    * columns (same arithmetic order as pqTrainEncode's HOF fold). */
  private def l2Sql(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE)) * " +
      s"(CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))), (x,y) -> x + y)"

  /** DuckDB twin of [[Similarity.pqTrainEncode]] (m=2 subspaces of 32,
    * k=4, 2 Lloyd rounds): per-subspace codebooks unrolled as chained
    * CTEs with the kMeans fixed-point discipline — 6-dp-rounded
    * float-quantized means per round so trajectories stay bit-identical;
    * argmin needs no rounding because the L2 fold is order-identical. */
  /** Shared CTE chain of the PQ oracles (train + encode, per subspace;
    * see [[pqOracleSql]] for the contract): yields es/cs/af CTEs for
    * subspaces 0..m-1; `af$s` holds (vec_id, cid, d) final assignments.
    * `trainWhere` (x146's maintained-table oracle) restricts the Lloyd
    * TRAINING rows to a base slice while the final encode still covers
    * the full table — the SQL twin of codebooks frozen at build time. */
  private def pqCtes(m: Int, sub: Int, k: Int, iters: Int,
                     trainWhere: String = ""): String =
    (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      val trainSrc = if (trainWhere.isEmpty) s"es$s" else s"ts$s"
      val ctes = Seq(
        s"es$s AS MATERIALIZED (SELECT vec_id, embedding[$lo:$hi] AS sv " +
          "FROM embeddings)") ++
        (if (trainWhere.isEmpty) Seq.empty[String]
         else Seq(s"ts$s AS MATERIALIZED (SELECT vec_id, sv FROM es$s " +
           s"WHERE $trainWhere)")) ++
        Seq(
        s"cs${s}0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) " +
          s"AS cid, CAST(sv AS FLOAT[]) AS cv FROM (SELECT vec_id, " +
          s"embedding[$lo:$hi] AS sv FROM embeddings " +
          (if (trainWhere.isEmpty) "" else s"WHERE $trainWhere ") +
          s"ORDER BY vec_id LIMIT $k))") ++
        (1 to iters).flatMap { i =>
          Seq(
            s"ds$s$i AS (SELECT e.vec_id, c.cid, ${l2Sql("e.sv", "c.cv")} " +
              s"AS d FROM $trainSrc e, cs$s${i - 1} c)",
            s"as$s$i AS (SELECT vec_id, cid FROM (SELECT vec_id, cid, " +
              "row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) " +
              s"AS rn FROM ds$s$i) WHERE rn = 1)",
            s"ms$s$i AS (SELECT a.cid, pos, CAST(round(avg(x), 6) AS FLOAT) " +
              s"AS mv FROM as$s$i a JOIN (SELECT vec_id, " +
              "CAST(unnest(sv) AS DOUBLE) AS x, " +
              s"unnest(range(1, len(sv)+1)) AS pos FROM es$s) d " +
              "USING (vec_id) GROUP BY 1, 2)",
            s"ns$s$i AS (SELECT cid, list(mv ORDER BY pos) AS cv FROM ms$s$i " +
              "GROUP BY cid)",
            s"cs$s$i AS (SELECT p.cid, COALESCE(n.cv, p.cv) AS cv " +
              s"FROM cs$s${i - 1} p LEFT JOIN ns$s$i n USING (cid))")
        } ++ Seq(
          s"df$s AS (SELECT e.vec_id, c.cid, ${l2Sql("e.sv", "c.cv")} AS d " +
            s"FROM es$s e, cs$s$iters c)",
          s"af$s AS (SELECT vec_id, cid, d FROM (SELECT vec_id, cid, d, " +
            "row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) " +
            s"AS rn FROM df$s) WHERE rn = 1)")
      ctes.mkString(", ")
    }.mkString(", ")

  private lazy val pqOracleSql = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    s"WITH ${pqCtes(m, sub, k, iters)} " +
      "SELECT af0.vec_id, CAST(af0.cid AS BIGINT) AS code_0, " +
      "CAST(af1.cid AS BIGINT) AS code_1, " +
      "round(sqrt(af0.d + af1.d), 6) AS err " +
      "FROM af0 JOIN af1 USING (vec_id) ORDER BY vec_id"
  }

  /** DuckDB twin of [[Similarity.pqAdcTopK]]: same training trajectory,
    * then per-subspace query-to-codeword LUTs and the m-lookup ADC sum. */
  private def pqAdcOracleSql(queryId: Long, topK: Int): String = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"qs$s AS (SELECT embedding[$lo:$hi] AS sv FROM embeddings " +
        s"WHERE vec_id = $queryId), " +
        s"lut$s AS (SELECT c.cid, ${l2Sql("q.sv", "c.cv")} AS d " +
        s"FROM qs$s q, cs$s$iters c)"
    }.mkString(", ")
    s"WITH ${pqCtes(m, sub, k, iters)}, $luts " +
      "SELECT af0.vec_id, CAST(af0.cid AS BIGINT) AS code_0, " +
      "CAST(af1.cid AS BIGINT) AS code_1, " +
      "round(l0.d + l1.d, 6) AS adc_d2 " +
      "FROM af0 JOIN af1 USING (vec_id) " +
      "JOIN lut0 l0 ON l0.cid = af0.cid JOIN lut1 l1 ON l1.cid = af1.cid " +
      s"ORDER BY adc_d2, vec_id LIMIT $topK"
  }

  /** DuckDB twin of the MAINTAINED PQ code table's ADC search (x146):
    * the same trajectory as [[pqAdcOracleSql]] but with the Lloyd
    * training restricted to the base slice (`vec_id < 250`) — the frozen
    * codebooks an append-only code table encodes every later batch
    * against — while the encode+search still covers the full table.
    * Equivalence to the Spark side holds because append-then-search over
    * the maintained layout IS a full encode with those codebooks (the
    * anti-join only ever drops exact re-ingests). */
  private def pqAppendAdcOracleSql(queryId: Long, topK: Int): String = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"qs$s AS (SELECT embedding[$lo:$hi] AS sv FROM embeddings " +
        s"WHERE vec_id = $queryId), " +
        s"lut$s AS (SELECT c.cid, ${l2Sql("q.sv", "c.cv")} AS d " +
        s"FROM qs$s q, cs$s$iters c)"
    }.mkString(", ")
    s"WITH ${pqCtes(m, sub, k, iters, trainWhere = "vec_id < 250")}, $luts " +
      "SELECT af0.vec_id, CAST(af0.cid AS BIGINT) AS code_0, " +
      "CAST(af1.cid AS BIGINT) AS code_1, " +
      "round(l0.d + l1.d, 6) AS adc_d2 " +
      "FROM af0 JOIN af1 USING (vec_id) " +
      "JOIN lut0 l0 ON l0.cid = af0.cid JOIN lut1 l1 ON l1.cid = af1.cid " +
      s"ORDER BY adc_d2, vec_id LIMIT $topK"
  }

  /** DuckDB twin of [[Similarity.pqAdcJoin]] (queries vec_id%50=0, m=2
    * subspaces of 32, k=4, 2 Lloyd rounds, top-8 per query): the x118
    * trajectory with the LUT lifted from one scalar set to a (qid, cid)
    * TABLE, ranked per query over the rounded ADC with id tie-break. */
  private def pqAdcJoinOracleSql(topK: Int): String = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"lut$s AS MATERIALIZED (SELECT q.qid, c.cid, " +
        s"${l2Sql(s"q.qv[$lo:$hi]", "c.cv")} AS d " +
        s"FROM qj q, cs$s$iters c)"
    }.mkString(", ")
    s"WITH ${pqCtes(m, sub, k, iters)}, " +
      "qj AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings " +
      "WHERE vec_id % 50 = 0), " +
      s"$luts, " +
      "sc AS (SELECT l0.qid, af0.vec_id, round(l0.d + l1.d, 6) AS adc_d2 " +
      "FROM af0 JOIN af1 USING (vec_id) " +
      "JOIN lut0 l0 ON l0.cid = af0.cid " +
      "JOIN lut1 l1 ON l1.cid = af1.cid AND l1.qid = l0.qid), " +
      "r AS (SELECT qid, vec_id, adc_d2, CAST(row_number() OVER " +
      "(PARTITION BY qid ORDER BY adc_d2, vec_id) AS INT) AS adc_rank " +
      "FROM sc) " +
      s"SELECT qid, vec_id, adc_d2, adc_rank FROM r WHERE adc_rank <= $topK " +
      "ORDER BY qid, adc_rank"
  }

  /** DuckDB twin of [[Similarity.pqAdcRefine]]: the [[pqAdcJoinOracleSql]]
    * chain cut at `candK`, candidates joined back to the raw vectors for
    * the exact-L2 re-rank (same left-fold arithmetic, 6 dp before the
    * window, id tie-breaks). */
  private def pqAdcRefineOracleSql(candK: Int, topK: Int): String = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"lut$s AS MATERIALIZED (SELECT q.qid, c.cid, " +
        s"${l2Sql(s"q.qv[$lo:$hi]", "c.cv")} AS d " +
        s"FROM qj q, cs$s$iters c)"
    }.mkString(", ")
    s"WITH ${pqCtes(m, sub, k, iters)}, " +
      "qj AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv " +
      "FROM embeddings WHERE vec_id % 50 = 0), " +
      s"$luts, " +
      "sc AS (SELECT l0.qid, af0.vec_id, round(l0.d + l1.d, 6) AS adc_d2 " +
      "FROM af0 JOIN af1 USING (vec_id) " +
      "JOIN lut0 l0 ON l0.cid = af0.cid " +
      "JOIN lut1 l1 ON l1.cid = af1.cid AND l1.qid = l0.qid), " +
      "r AS (SELECT qid, vec_id, adc_d2, CAST(row_number() OVER " +
      "(PARTITION BY qid ORDER BY adc_d2, vec_id) AS INT) AS adc_rank " +
      "FROM sc), " +
      s"cand AS (SELECT qid, vec_id, adc_rank FROM r " +
      s"WHERE adc_rank <= $candK), " +
      "ref AS (SELECT c.qid, c.vec_id, c.adc_rank, " +
      s"round(${l2Sql("e.embedding", "q.qv")}, 6) AS exact_d2 " +
      "FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id " +
      "JOIN qj q ON q.qid = c.qid), " +
      "rr AS (SELECT qid, vec_id, adc_rank, exact_d2, " +
      "CAST(row_number() OVER (PARTITION BY qid " +
      "ORDER BY exact_d2, vec_id) AS INT) AS refine_rank FROM ref) " +
      "SELECT qid, vec_id, adc_rank, exact_d2, refine_rank FROM rr " +
      s"WHERE refine_rank <= $topK ORDER BY qid, refine_rank"
  }

  /** DuckDB twin of [[Similarity.pqRefineRecallCurve]]: the
    * [[pqAdcRefineOracleSql]] chain shared across candidate budgets (ADC
    * ranks don't depend on candK), one exact-L2 reference reused by the
    * refine ranks AND the recall intersections. */
  private def pqRefineRecallOracleSql(candKs: Seq[Int], topK: Int): String = {
    val (m, sub, k, iters) = (2, 32, 4, 2)
    val luts = (0 until m).map { s =>
      val lo = s * sub + 1
      val hi = (s + 1) * sub
      s"lut$s AS MATERIALIZED (SELECT q.qid, c.cid, " +
        s"${l2Sql(s"q.qv[$lo:$hi]", "c.cv")} AS d " +
        s"FROM qj q, cs$s$iters c)"
    }.mkString(", ")
    val levels = candKs.map { ck =>
      s"cd$ck AS (SELECT qid, vec_id FROM r WHERE adc_rank <= $ck), " +
        s"rf$ck AS (SELECT qid, vec_id FROM (SELECT c.qid, c.vec_id, " +
        "row_number() OVER (PARTITION BY c.qid ORDER BY x.d2, c.vec_id) " +
        s"AS rn FROM cd$ck c JOIN ex x ON x.qid = c.qid " +
        s"AND x.vec_id = c.vec_id) WHERE rn <= $topK), " +
        s"h$ck AS (SELECT $ck AS cand_k, CAST(count(*) AS BIGINT) AS hits " +
        s"FROM rf$ck f JOIN exr e ON e.qid = f.qid AND e.vec_id = f.vec_id)"
    }.mkString(", ")
    val sel = candKs.map(ck => s"SELECT cand_k, hits FROM h$ck")
      .mkString(" UNION ALL ")
    s"WITH ${pqCtes(m, sub, k, iters)}, " +
      "qj AS MATERIALIZED (SELECT vec_id AS qid, embedding AS qv " +
      "FROM embeddings WHERE vec_id % 50 = 0), " +
      s"$luts, " +
      "sc AS (SELECT l0.qid, af0.vec_id, round(l0.d + l1.d, 6) AS adc_d2 " +
      "FROM af0 JOIN af1 USING (vec_id) " +
      "JOIN lut0 l0 ON l0.cid = af0.cid " +
      "JOIN lut1 l1 ON l1.cid = af1.cid AND l1.qid = l0.qid), " +
      "r AS MATERIALIZED (SELECT qid, vec_id, adc_d2, " +
      "CAST(row_number() OVER (PARTITION BY qid " +
      "ORDER BY adc_d2, vec_id) AS INT) AS adc_rank FROM sc), " +
      "ex AS MATERIALIZED (SELECT q.qid, e.vec_id, " +
      s"round(${l2Sql("e.embedding", "q.qv")}, 6) AS d2 " +
      "FROM embeddings e, qj q), " +
      "exr AS MATERIALIZED (SELECT qid, vec_id FROM (SELECT qid, vec_id, " +
      "row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS rn " +
      s"FROM ex) WHERE rn <= $topK), " +
      "nq AS (SELECT CAST(count(*) AS BIGINT) AS n FROM qj), " +
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS c FROM embeddings), " +
      s"$levels " +
      s"SELECT CAST(b.cand_k AS INT) AS cand_k, nq.n AS n_queries, b.hits, " +
      s"round(CAST(b.hits AS DOUBLE) / (nq.n * $topK), 4) AS recall, " +
      "round(least(CAST(b.cand_k AS DOUBLE) / nn.c, 1.0), 4) AS cand_frac " +
      s"FROM ($sel) b CROSS JOIN nq CROSS JOIN nn ORDER BY cand_k"
  }

  /** SQL fragment: sequential-left-fold double cosine of two list columns
    * (same arithmetic order as [[Similarity.cosine]]). */
  private def cosSql(a: String, b: String): String =
    s"(list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y) / " +
      s"(sqrt(list_reduce(list_transform(generate_series(1, len($a)), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x,y) -> x+y)) * " +
      s"sqrt(list_reduce(list_transform(generate_series(1, len($b)), " +
      s"i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y))))"

  /** DuckDB twin of [[Similarity.ivfTopK]] (16 centroids, 4 probes, k=10,
    * query vec_id=0). */
  private def ivfOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |probe AS (SELECT cid FROM (SELECT c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |  FROM cents c, q) ORDER BY d DESC, cid LIMIT 4),
       |res AS (SELECT a.vec_id, a.cid, round(${cosSql("a.embedding", "q.qv")}, 6) AS sim
       |  FROM a1 a JOIN probe USING (cid), q WHERE a.vec_id <> 0)
       |SELECT vec_id, cid AS centroid_id, sim FROM res
       |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.knnJoin]] (queries = vec_id % 50 = 0,
    * 16 centroids, 4 probes, k=10). Same assignment/probe tie-breaks as
    * the x7 oracle; ranking is over the 6-dp ROUNDED sim on both engines. */
  private def knnJoinOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id % 50 = 0),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS (SELECT p.qid, a.vec_id, a.cid,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN (SELECT qid, qv, cid FROM pr WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |r AS (SELECT qid, vec_id, cid, sim,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
       |    AS INT) AS knn_rank FROM cand)
       |SELECT qid, vec_id, cid AS centroid_id, sim, knn_rank FROM r
       |WHERE knn_rank <= 10 ORDER BY qid, knn_rank""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.graphAnnFrontier]]: the knnJoin-oracle
    * IVF build (shared asg window serves corpus assignment AND per-query
    * probe ranks, since the self-kNN's query side is the corpus), top-M
    * cut to the graph, then the beam search UNROLLED hop by hop per beam
    * budget — candidate expand, anti-join against the running visited
    * set, 6 dp re-score, top-B beam cut — and the exact brute-force
    * grader over the hash-ordered bounded query set. */
  private def graphAnnOracleSql(graphM: Int, beams: Seq[Int], hops: Int,
                                k: Int, nQueries: Int, nCentroids: Int,
                                nProbe: Int): String = {
    val head = Seq(
      s"cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings " +
        s"ORDER BY vec_id LIMIT $nCentroids)",
      "asg AS MATERIALIZED (SELECT vec_id, embedding, cid, " +
        "row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn " +
        "FROM (SELECT e.vec_id, e.embedding, c.cid, " +
        s"${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c))",
      "a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1)",
      "gcand AS (SELECT p.gq, a.vec_id, " +
        s"round(${cosSql("a.embedding", "p.gqv")}, 6) AS sim " +
        "FROM a1 a JOIN (SELECT vec_id AS gq, embedding AS gqv, cid " +
        s"FROM asg WHERE rn <= $nProbe) p USING (cid) " +
        "WHERE a.vec_id <> p.gq)",
      "g AS MATERIALIZED (SELECT gq AS src, vec_id AS dst FROM " +
        "(SELECT gq, vec_id, row_number() OVER (PARTITION BY gq " +
        s"ORDER BY sim DESC, vec_id) AS r FROM gcand) WHERE r <= $graphM)",
      "qs AS MATERIALIZED (SELECT vec_id AS tid, embedding AS tv " +
        "FROM embeddings " +
        s"ORDER BY (vec_id % 9973) * 2654435761 % 9973, vec_id " +
        s"LIMIT $nQueries)",
      "en AS (SELECT min(vec_id) AS eid FROM embeddings)",
      "ex AS MATERIALIZED (SELECT tid, vid FROM (SELECT tid, vid, " +
        "row_number() OVER (PARTITION BY tid ORDER BY sim DESC, vid) AS r " +
        "FROM (SELECT q.tid, e.vec_id AS vid, " +
        s"round(${cosSql("e.embedding", "q.tv")}, 6) AS sim " +
        "FROM embeddings e, qs q WHERE e.vec_id <> q.tid)) " +
        s"WHERE r <= $k)")
    val perBudget = beams.zipWithIndex.flatMap { case (b, i) =>
      val init = Seq(
        s"v0_$i AS MATERIALIZED (SELECT q.tid, e.vec_id AS vid, " +
          s"round(${cosSql("e.embedding", "q.tv")}, 6) AS sim " +
          "FROM qs q, en, embeddings e WHERE e.vec_id = en.eid)",
        s"b0_$i AS (SELECT tid, vid, sim FROM v0_$i)")
      val hopCtes = (1 to hops).flatMap { h =>
        val p = h - 1
        Seq(
          s"c${h}_$i AS (SELECT DISTINCT bm.tid, g.dst AS vid " +
            s"FROM b${p}_$i bm JOIN g ON g.src = bm.vid)",
          s"n${h}_$i AS (SELECT c.tid, c.vid, " +
            s"round(${cosSql("e.embedding", "q.tv")}, 6) AS sim " +
            s"FROM c${h}_$i c JOIN embeddings e ON e.vec_id = c.vid " +
            "JOIN qs q ON q.tid = c.tid " +
            s"LEFT JOIN v${p}_$i v ON v.tid = c.tid AND v.vid = c.vid " +
            "WHERE v.vid IS NULL)",
          s"v${h}_$i AS MATERIALIZED (SELECT tid, vid, sim FROM v${p}_$i " +
            s"UNION ALL SELECT tid, vid, sim FROM n${h}_$i)",
          s"b${h}_$i AS (SELECT tid, vid, sim FROM (SELECT tid, vid, sim, " +
            "row_number() OVER (PARTITION BY tid ORDER BY sim DESC, vid) " +
            s"AS r FROM v${h}_$i) WHERE r <= $b)")
      }
      val tail = Seq(
        s"ap_$i AS (SELECT tid, vid FROM (SELECT tid, vid, " +
          "row_number() OVER (PARTITION BY tid ORDER BY sim DESC, vid) " +
          s"AS r FROM v${hops}_$i WHERE vid <> tid) WHERE r <= $k)",
        s"hv_$i AS (SELECT q.tid, coalesce(h.nh, 0) AS nh, " +
          "coalesce(nv.nv, 0) AS nv FROM qs q " +
          s"LEFT JOIN (SELECT tid, count(*) AS nh FROM ap_$i " +
          "JOIN ex USING (tid, vid) GROUP BY 1) h ON h.tid = q.tid " +
          s"LEFT JOIN (SELECT tid, count(*) AS nv FROM v${hops}_$i " +
          "GROUP BY 1) nv ON nv.tid = q.tid)",
        s"row_$i AS (SELECT CAST($b AS BIGINT) AS beam, " +
          "CAST(count(*) AS BIGINT) AS n_queries, " +
          s"round(avg(CAST(nh AS DOUBLE) / $k), 4) AS mean_recall, " +
          "round(avg(CAST(nv AS DOUBLE)), 2) AS mean_visited " +
          s"FROM hv_$i)")
      init ++ hopCtes ++ tail
    }
    val unionAll = beams.indices.map(i => s"SELECT * FROM row_$i")
      .mkString(" UNION ALL ")
    s"WITH ${(head ++ perBudget).mkString(", ")} " +
      s"SELECT beam, n_queries, mean_recall, mean_visited " +
      s"FROM ($unionAll) ORDER BY beam"
  }

  /** DuckDB twin of [[Similarity.ivfRecallCurve]] (queries vec_id%50=0,
    * k=10, 16 centroids, probes 1/2/4/8): the knnJoin oracle's cand frame
    * carries each vector's cell PROBE RANK per query (crn), so every
    * probe level is just `crn <= p` ranked through the shared
    * rounded-sim/id window; exact = all 16 cells. cand/rex MATERIALIZED —
    * referenced once per level (the CLAUDE.md CTE-inlining rule). */
  private def ivfRecallOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
       |  WHERE vec_id % 50 = 0),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS MATERIALIZED (SELECT p.qid, a.vec_id, p.rn AS crn,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN pr p USING (cid) WHERE a.vec_id <> p.qid),
       |rex AS MATERIALIZED (SELECT qid, vec_id FROM (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS r
       |  FROM cand) WHERE r <= 10),
       |ecnt AS (SELECT qid, CAST(count(*) AS BIGINT) AS ne FROM rex
       |  GROUP BY 1),
       |lvl AS (SELECT unnest([1, 2, 4, 8]) AS p),
       |apx AS (SELECT p, qid, vec_id FROM (SELECT l.p, c.qid, c.vec_id,
       |  row_number() OVER (PARTITION BY l.p, c.qid
       |    ORDER BY c.sim DESC, c.vec_id) AS r
       |  FROM lvl l JOIN cand c ON c.crn <= l.p) WHERE r <= 10),
       |icnt AS (SELECT p, qid, CAST(count(*) AS BIGINT) AS ni
       |  FROM apx JOIN rex USING (qid, vec_id) GROUP BY 1, 2),
       |grid AS (SELECT l.p, e.qid, e.ne FROM lvl l, ecnt e),
       |rec AS (SELECT g.p, CAST(count(*) AS BIGINT) AS n_queries,
       |  round(avg(CAST(COALESCE(i.ni, 0) AS DOUBLE) / g.ne), 4)
       |    AS mean_recall
       |  FROM grid g LEFT JOIN icnt i ON i.p = g.p AND i.qid = g.qid
       |  GROUP BY 1)
       |SELECT CAST(p AS BIGINT) AS n_probe,
       |round(CAST(p AS DOUBLE) / 16, 4) AS scan_frac, n_queries,
       |mean_recall FROM rec ORDER BY n_probe""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.knnDensityOutliers]] (all queries,
    * 16 centroids, 4 probes, k=10, bottom 25). Same assignment/probe/rank
    * tie-breaks as the knnJoin oracle. */
  private def knnOutlierOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS (SELECT p.qid, a.vec_id,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN (SELECT qid, qv, cid FROM pr WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |r AS (SELECT qid, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS knn_rank
       |  FROM cand)
       |SELECT qid AS vec_id, sim AS knn_sim FROM r WHERE knn_rank = 10
       |ORDER BY knn_sim ASC, vec_id LIMIT 25""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.knnLabelConsistency]] (all queries,
    * 16 centroids, 4 probes, k=10). The kNN core is the knnJoin oracle's
    * CTE chain; labels join at query / neighbor grain and roll up per
    * class with the strict-majority vote on the REALIZED neighbor count. */
  private def knnConsistencyOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS (SELECT p.qid, a.vec_id,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN (SELECT qid, qv, cid FROM pr WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |r AS (SELECT qid, vec_id, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS knn_rank
       |  FROM cand),
       |knn AS (SELECT qid, vec_id FROM r WHERE knn_rank <= 10),
       |j AS (SELECT k.qid, gq.label AS gold, gn.label AS nl FROM knn k
       |  JOIN embeddings gq ON k.qid = gq.vec_id
       |  JOIN embeddings gn ON k.vec_id = gn.vec_id),
       |per AS (SELECT qid, any_value(gold) AS gold,
       |  CAST(count(*) AS BIGINT) AS kk,
       |  CAST(sum(CASE WHEN nl = gold THEN 1 ELSE 0 END) AS BIGINT) AS same
       |  FROM j GROUP BY 1),
       |g AS (SELECT CAST(gold AS BIGINT) AS label,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(CASE WHEN same * 2 > kk THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_consistent,
       |  round(avg(CAST(same AS DOUBLE) / kk), 4) AS purity
       |  FROM per GROUP BY 1)
       |SELECT label, n, n_consistent,
       |round(CAST(n_consistent AS DOUBLE) / n, 4) AS consistency_rate, purity
       |FROM g ORDER BY label""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Similarity.knnMeanAveragePrecision]] (all queries,
    * 16 centroids, 4 probes, k=10). The kNN core is the knnJoin oracle's
    * CTE chain; AP@k per query is the standard Σ rel·P@i over the ranked
    * list normalized by min(R, k), R = label count − 1. */
  private def knnMapOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS (SELECT p.qid, a.vec_id,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN (SELECT qid, qv, cid FROM pr WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |r AS (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS knn_rank
       |  FROM cand),
       |knn AS (SELECT qid, vec_id, knn_rank FROM r WHERE knn_rank <= 10),
       |j AS (SELECT k.qid, k.knn_rank, gq.label AS gold,
       |  CASE WHEN gn.label = gq.label THEN 1 ELSE 0 END AS rel
       |  FROM knn k JOIN embeddings gq ON k.qid = gq.vec_id
       |  JOIN embeddings gn ON k.vec_id = gn.vec_id),
       |c AS (SELECT qid, gold, rel, knn_rank,
       |  sum(rel) OVER (PARTITION BY qid ORDER BY knn_rank
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM j),
       |rt AS (SELECT label, CAST(count(*) - 1 AS BIGINT) AS r
       |  FROM embeddings GROUP BY 1),
       |apn AS (SELECT qid, gold,
       |  sum(rel * CAST(cum AS DOUBLE) / knn_rank) AS apnum
       |  FROM c GROUP BY 1, 2),
       |ap AS (SELECT apn.qid, apn.gold,
       |  apnum / least(rt.r, 10) AS ap FROM apn
       |  JOIN rt ON apn.gold = rt.label)
       |SELECT CAST(gold AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
       |round(avg(ap), 4) AS map_at_k FROM ap GROUP BY 1 ORDER BY label"""
      .stripMargin.replace("\n", " ")

  /** DuckDB twin of [[Sampling.halfSampleCi]] (16 replicates on the
    * documents table): the replicate membership is the same md5 hex
    * digit test, the conditional sums the same single-pass fold. */
  private def halfSampleOracleSql(reps: Int): String = {
    val sums = (1 to reps).map { r =>
      s"sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), $r, 1) >= '8' " +
        s"THEN n_chars ELSE 0 END) AS s$r, " +
        s"sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), $r, 1) >= '8' " +
        s"THEN 1 ELSE 0 END) AS c$r"
    }.mkString(", ")
    val terms = (1 to reps).map(r =>
      s"(CAST(s$r AS DOUBLE)/c$r - mean)*(CAST(s$r AS DOUBLE)/c$r - mean)")
      .mkString(" + ")
    val minc = (1 to reps).map("c" + _).mkString("least(", ", ", ")")
    s"""WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
       |CAST(sum(n_chars) AS BIGINT) AS sx, $sums
       |FROM documents GROUP BY 1),
       |m AS (SELECT *, CAST(sx AS DOUBLE)/n AS mean FROM a),
       |f AS (SELECT source, n, mean, $minc AS mc,
       |sqrt(($terms)/$reps.0) AS se FROM m)
       |SELECT source, n, round(mean, 4) AS mean_val,
       |CASE WHEN mc > 0 THEN round(se, 4) END AS se_rep,
       |CASE WHEN mc > 0 THEN round(mean - 1.96*se, 4) END AS ci_lo,
       |CASE WHEN mc > 0 THEN round(mean + 1.96*se, 4) END AS ci_hi
       |FROM f ORDER BY source""".stripMargin.replace("\n", " ")
  }

  /** One self-kNN CTE chain (the knnJoin oracle's shape) over source
    * relation `src`, emitting `k$sfx(qid, vec_id)` — suffixed so
    * [[matryoshkaOracleSql]] can instantiate it per truncation level. */
  private def knnChainSql(sfx: String, src: String): String =
    s"""cents$sfx AS (SELECT vec_id AS cid, embedding AS cv FROM $src
       |  ORDER BY vec_id LIMIT 16),
       |asg$sfx AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM $src e, cents$sfx c)),
       |a1$sfx AS (SELECT vec_id, embedding, cid FROM asg$sfx WHERE rn = 1),
       |qs$sfx AS (SELECT vec_id AS qid, embedding AS qv FROM $src),
       |pr$sfx AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs$sfx q, cents$sfx c)),
       |cand$sfx AS (SELECT p.qid, a.vec_id,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1$sfx a JOIN (SELECT qid, qv, cid FROM pr$sfx WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |r$sfx AS (SELECT qid, vec_id,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS knn_rank
       |  FROM cand$sfx),
       |k$sfx AS (SELECT qid, vec_id FROM r$sfx WHERE knn_rank <= 10)"""
      .stripMargin

  /** DuckDB twin of [[Similarity.truncationRecall]] (k=10, 16 centroids,
    * 4 probes): the full-dim chain is the reference; each truncation
    * level re-runs the chain over leading-d slices and joins back. */
  private def matryoshkaOracleSql(dims: Seq[Int]): String = {
    val perDim = dims.map { d =>
      s"""e$d AS (SELECT vec_id, embedding[1:$d] AS embedding
         |  FROM embeddings),
         |${knnChainSql(d.toString, s"e$d")},
         |i$d AS (SELECT t.qid, CAST(count(*) AS BIGINT) AS ni
         |  FROM k$d t JOIN kf f ON t.qid = f.qid AND t.vec_id = f.vec_id
         |  GROUP BY 1),
         |m$d AS (SELECT CAST($d AS BIGINT) AS dims,
         |  CAST(count(*) AS BIGINT) AS n_queries,
         |  round(avg(coalesce(ni, 0) / CAST(nf AS DOUBLE)), 4)
         |    AS mean_recall
         |  FROM fc LEFT JOIN i$d USING (qid))""".stripMargin
    }.mkString(",\n")
    val sel = dims.map(d => s"SELECT * FROM m$d").mkString(" UNION ALL ")
    (s"""WITH ${knnChainSql("f", "embeddings")},
        |fc AS (SELECT qid, CAST(count(*) AS BIGINT) AS nf FROM kf
        |  GROUP BY 1),
        |$perDim
        |$sel ORDER BY dims""".stripMargin).replace("\n", " ")
  }

  /** DuckDB twin of [[Similarity.kCenterCoreset]]: the same greedy
    * farthest-point sweep unrolled as chained 1-row CTEs (the mmr
    * fixed-point discipline) — each round's cosine distances round to
    * 6 dp BEFORE the argmax on both engines, so the pick trajectories
    * are identical. */
  private def kCenterOracle(k: Int): String = {
    def dst(a: String, b: String) = s"round(1 - ${cosSql(a, b)}, 6)"
    val head = "p1 AS MATERIALIZED (SELECT vec_id, embedding, 0.0 AS d " +
      "FROM embeddings ORDER BY vec_id LIMIT 1)"
    val rounds = (2 to k).map { r =>
      val ds = (1 until r).map(i => dst("e.embedding", s"p$i.embedding"))
      val mins = if (ds.size == 1) ds.head
                 else ds.mkString("least(", ", ", ")")
      val froms = (1 until r).map(i => s"p$i").mkString(", ")
      s"p$r AS MATERIALIZED (SELECT e.vec_id, e.embedding, $mins AS d " +
        s"FROM embeddings e, $froms ORDER BY d DESC, e.vec_id LIMIT 1)"
    }
    val sel = (1 to k).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, vec_id, d AS dist FROM p$i")
      .mkString(" UNION ALL ")
    ("WITH " + (head +: rounds).mkString(", ") +
      s" SELECT rnk, vec_id, dist FROM ($sel) ORDER BY rnk")
  }

  /** DuckDB twin of [[Similarity.randomProjection]] (16×64, salt "rp") —
    * the ±1 matrix is generated from the SAME [[Similarity.rpSigns]]
    * constants, and every fold runs left-to-right over the index order on
    * both engines. */
  private def rpOracleSql: String = {
    val rows = Similarity.rpSigns(16, 64, "rp")
      .map(_.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ",", "]"))
      .mkString("[", ",", "]")
    val normE = "sqrt(list_reduce(list_transform(generate_series(1, 64), " +
      "i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), " +
      "(x,y) -> x+y))"
    s"""WITH p AS (SELECT vec_id, $normE AS onorm,
       |sqrt(list_reduce(list_transform(generate_series(1, 16),
       |  j -> pow(list_reduce(list_transform(generate_series(1, 64),
       |    i -> CAST(embedding[i] AS DOUBLE) * ($rows)[j][i]),
       |    (x,y) -> x+y) / sqrt(16.0), 2)), (x,y) -> x+y)) AS pnorm
       |FROM embeddings)
       |SELECT vec_id, round(onorm, 4) AS orig_norm,
       |round(pnorm, 4) AS proj_norm,
       |round(CASE WHEN onorm = 0 THEN 0.0 ELSE pnorm / onorm END, 4)
       |  AS norm_ratio
       |FROM p ORDER BY vec_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[TextAnalysis.langId]] — generated from the same
    * marker sets. */
  private def langIdOracleSql: String = {
    val branches = TextAnalysis.langMarkers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"SELECT doc_id, '$lang' AS cand_lang, " +
        s"CAST(len(list_filter(t, x -> list_contains($lst, x))) AS INT) AS score FROM toks"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sc AS ($branches),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn FROM sc)
       |SELECT doc_id, cand_lang AS pred_lang, score FROM r WHERE rn = 1
       |ORDER BY doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[TextAnalysis.langIdMargin]] — the langId oracle's
    * candidate table with rank 1 AND 2 pulled per doc. */
  private def langIdMarginOracleSql(minMargin: Long): String = {
    val branches = TextAnalysis.langMarkers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"SELECT doc_id, '$lang' AS cand_lang, " +
        s"CAST(len(list_filter(t, x -> list_contains($lst, x))) AS BIGINT)" +
        s" AS score FROM toks"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sc AS ($branches),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn FROM sc),
       |b AS (SELECT doc_id, cand_lang AS pred_lang, score AS best_score
       |  FROM r WHERE rn = 1),
       |s2 AS (SELECT r.doc_id, max(r.score) AS second_score FROM r
       |  JOIN b ON r.doc_id = b.doc_id AND r.cand_lang <> b.pred_lang
       |  GROUP BY 1)
       |SELECT b.doc_id, pred_lang, best_score, second_score,
       |best_score - second_score AS margin,
       |best_score - second_score >= $minMargin AS confident
       |FROM b JOIN s2 ON b.doc_id = s2.doc_id
       |ORDER BY b.doc_id""".stripMargin.replace("\n", " ")
  }

  /** DuckDB twin of [[TextAnalysis.bpeTrain]]: the merge loop unrolled as
    * chained CTEs (fixed-point discipline) over the same double-space
    * symbol-string algebra — plain `replace` IS the greedy merge on both
    * engines. Pure integer counting, no rounding anywhere. */
  private def bpeTrainOracleSql(merges: Int): String = {
    val head =
      """w0 AS MATERIALIZED (SELECT '  ' ||
        | array_to_string(list_append(str_split(w, ''), '</w>'), '  ')
        | || '  ' AS s, CAST(count(*) AS BIGINT) AS cnt FROM
        | (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        | t -> t <> '')) AS w FROM documents) GROUP BY 1)"""
        .stripMargin.replace("\n", "")
    val rounds = (1 to merges).flatMap { i =>
      val p = i - 1
      Seq(
        s"sy$i AS (SELECT cnt, list_filter(str_split(s, '  '), " +
          s"x -> x <> '') AS sm FROM w$p)",
        s"p$i AS (SELECT pr.l AS lhs, pr.r AS rhs, " +
          "CAST(sum(cnt) AS BIGINT) AS n FROM (SELECT cnt, " +
          "unnest(CASE WHEN len(sm) >= 2 THEN " +
          "list_transform(generate_series(1, len(sm) - 1), " +
          "j -> struct_pack(l := sm[j], r := sm[j+1])) ELSE [] END) AS pr " +
          s"FROM sy$i) GROUP BY 1, 2)",
        s"t$i AS (SELECT lhs, rhs, n FROM p$i " +
          "ORDER BY n DESC, lhs, rhs LIMIT 1)",
        s"w$i AS MATERIALIZED (SELECT replace(w.s, " +
          "' ' || t.lhs || '  ' || t.rhs || ' ', " +
          "' ' || t.lhs || t.rhs || ' ') AS s, w.cnt " +
          s"FROM w$p w, t$i t)")
    }
    val finals = (1 to merges).map(i =>
      s"SELECT $i AS step, lhs, rhs, lhs || rhs AS merged, n FROM t$i")
      .mkString(" UNION ALL ")
    s"WITH ${(head +: rounds).mkString(", ")} " +
      s"SELECT CAST(step AS INT) AS step, lhs, rhs, merged, n " +
      s"FROM ($finals) ORDER BY step"
  }

  /** DuckDB twin of [[TextAnalysis.bpeEncode]] after an in-oracle train:
    * the x130 CTE chain, then the merge list replayed over the DISTINCT
    * word dictionary (the same vocabulary-grain replace chain the engine
    * runs) and per-doc subword totals from the (doc, word) counts. */
  private def bpeEncodeOracleSql(merges: Int): String = {
    val trainSql = bpeTrainOracleSql(merges)
    val ctes = trainSql.substring("WITH ".length,
      trainSql.indexOf(" SELECT CAST(step"))
    val encodeRounds = (1 to merges).map { i =>
      s"v$i AS (SELECT v.w, replace(v.s, " +
        "' ' || t.lhs || '  ' || t.rhs || ' ', " +
        s"' ' || t.lhs || t.rhs || ' ') AS s FROM v${i - 1} v, t$i t)"
    }.mkString(", ")
    s"WITH $ctes, " +
      "dw AS MATERIALIZED (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c " +
      "FROM (SELECT doc_id, " +
      """unnest(list_filter(regexp_split_to_array(text, '\s+'), """ +
      "t -> t <> '')) AS w FROM documents) GROUP BY 1, 2), " +
      "v0 AS (SELECT DISTINCT w, '  ' || " +
      "array_to_string(list_append(str_split(w, ''), '</w>'), '  ') " +
      "|| '  ' AS s FROM dw), " +
      s"$encodeRounds, " +
      s"enc AS (SELECT w, CAST(len(list_filter(str_split(s, '  '), " +
      s"x -> x <> '')) AS BIGINT) AS nsym FROM v$merges) " +
      "SELECT dw.doc_id, CAST(sum(dw.c) AS BIGINT) AS n_ws_tokens, " +
      "CAST(sum(dw.c * enc.nsym) AS BIGINT) AS n_bpe_tokens " +
      "FROM dw JOIN enc USING (w) GROUP BY 1 ORDER BY doc_id"
  }

  /** DuckDB twin of [[TextAnalysis.bpeFrontier]]: the x130 train chain at
    * the max budget, the x131 dictionary-encode chain with symbol counts
    * read at EVERY requested budget (merge lists nest), corpus totals
    * unioned per budget. */
  private def bpeFrontierOracleSql(budgets: Seq[Int], maxM: Int): String = {
    val trainSql = bpeTrainOracleSql(maxM)
    val ctes = trainSql.substring("WITH ".length,
      trainSql.indexOf(" SELECT CAST(step"))
    val encodeRounds = (1 to maxM).map { i =>
      s"v$i AS (SELECT v.w, replace(v.s, " +
        "' ' || t.lhs || '  ' || t.rhs || ' ', " +
        s"' ' || t.lhs || t.rhs || ' ') AS s FROM v${i - 1} v, t$i t)"
    }.mkString(", ")
    val encs = budgets.map(m =>
      s"e$m AS (SELECT w, CAST(len(list_filter(str_split(s, '  '), " +
        s"x -> x <> '')) AS BIGINT) AS nsym FROM v$m)").mkString(", ")
    val syms = budgets.map(m =>
      s"s$m AS (SELECT CAST(sum(d.c * e.nsym) AS BIGINT) AS ns " +
        s"FROM wc d JOIN e$m e USING (w))").mkString(", ")
    val sel = budgets.map(m =>
      s"SELECT $m AS merges, (SELECT ns FROM s$m) AS n_symbols")
      .mkString(" UNION ALL ")
    s"WITH $ctes, " +
      "wc AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS c " +
      "FROM (SELECT " +
      """unnest(list_filter(regexp_split_to_array(text, '\s+'), """ +
      "t -> t <> '')) AS w FROM documents) GROUP BY 1), " +
      "v0 AS (SELECT DISTINCT w, '  ' || " +
      "array_to_string(list_append(str_split(w, ''), '</w>'), '  ') " +
      "|| '  ' AS s FROM wc), " +
      s"$encodeRounds, $encs, " +
      "tot AS (SELECT CAST(sum(c) AS BIGINT) AS tok, " +
      "CAST(sum(c * length(w)) AS BIGINT) AS chars FROM wc), " +
      s"$syms " +
      "SELECT CAST(b.merges AS INT) AS merges, tot.tok AS n_ws_tokens, " +
      "tot.chars AS n_chars, b.n_symbols, " +
      "round(CAST(b.n_symbols AS DOUBLE) / tot.tok, 6) AS symbols_per_token, " +
      "round(CAST(b.n_symbols AS DOUBLE) / tot.chars, 6) AS symbols_per_char " +
      s"FROM ($sel) b CROSS JOIN tot ORDER BY merges"
  }

  /** DuckDB twin of the x128 declared-vs-predicted confusion matrix:
    * the langId CTEs joined back to the documents' lang column. */
  private def langConsistencyOracleSql: String = {
    val branches = TextAnalysis.langMarkers.map { case (lang, words) =>
      val lst = words.map(w => s"'$w'").mkString("[", ", ", "]")
      s"SELECT doc_id, '$lang' AS cand_lang, " +
        s"CAST(len(list_filter(t, x -> list_contains($lst, x))) AS INT) AS score FROM toks"
    }.mkString(" UNION ALL ")
    s"""WITH toks AS (SELECT doc_id,
       |  list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '') AS t FROM documents),
       |sc AS ($branches),
       |r AS (SELECT *, row_number() OVER
       |  (PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn FROM sc)
       |SELECT d.lang, r.cand_lang AS pred_lang,
       |CAST(count(*) AS BIGINT) AS n_docs
       |FROM documents d JOIN r ON r.doc_id = d.doc_id AND r.rn = 1
       |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin
      .replace("\n", " ")
  }

  // =========================================================================
  // Pipeline aggregations (SURVEY §2.3 A4-A9, §2.2 T1/T3)
  // =========================================================================

  /** x88's oracle: the SAME fixed-iteration power method the engine runs,
    * unrolled as chained materialized CTEs (DuckDB forbids aggregates in
    * recursive CTE terms). Mirrors operators/Similarity.pcaTopComponent
    * exactly: 6 dp-rounded dim means, covariance over centered values,
    * `iters` normalize(C·v) rounds from the 1/√64 start, sign fix by the
    * largest-|component|, 6 dp-rounded final axis, per-label projection
    * stats + the Rayleigh eigenvalue. */
  /** DuckDB twin of [[Similarity.mutualNnMatches]] (all queries, 16
    * centroids, 4 probes): the knnJoin oracle at k=1 plus the reciprocal
    * self-join. */
  private def mutualNnOracleSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  ORDER BY vec_id LIMIT 16),
       |asg AS (SELECT vec_id, embedding, cid,
       |  row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT e.vec_id, e.embedding, c.cid,
       |    ${cosSql("e.embedding", "c.cv")} AS d FROM embeddings e, cents c)),
       |a1 AS (SELECT vec_id, embedding, cid FROM asg WHERE rn = 1),
       |qs AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings),
       |pr AS (SELECT qid, qv, cid,
       |  row_number() OVER (PARTITION BY qid ORDER BY d DESC, cid) AS rn
       |  FROM (SELECT q.qid, q.qv, c.cid, ${cosSql("c.cv", "q.qv")} AS d
       |    FROM qs q, cents c)),
       |cand AS (SELECT p.qid, a.vec_id,
       |  round(${cosSql("a.embedding", "p.qv")}, 6) AS sim
       |  FROM a1 a JOIN (SELECT qid, qv, cid FROM pr WHERE rn <= 4) p
       |  USING (cid) WHERE a.vec_id <> p.qid),
       |t1 AS (SELECT qid, vec_id AS nn, sim FROM (SELECT qid, vec_id, sim,
       |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id)
       |    AS rn FROM cand) WHERE rn = 1)
       |SELECT a.qid AS id_a, b.qid AS id_b, a.sim FROM t1 a
       |JOIN t1 b ON a.nn = b.qid AND b.nn = a.qid AND a.qid < b.qid
       |ORDER BY id_a""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[graft.operators.TimeSeries.holtForecast]] on the
    * daily event-type series: the recurrence unrolled as two chained CTEs
    * per step (fixed-point discipline). Coefficients interpolate the
    * SCALA-computed doubles (1.0−β ≠ the SQL literal 0.7 in IEEE; the
    * round-trip decimal keeps both engines on the identical constant). */
  /** DuckDB twin of [[graft.operators.TimeSeries.forecastBacktest]]
    * (season 7) — shared verbatim by batch j56 and streaming s37 (the
    * converged stream state IS the batch day grain). */
  private val forecastBacktestOracle: String =
    """WITH daily AS (SELECT event_type,
      |CAST(date_trunc('day', ts) AS DATE) AS d,
      |CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
      |bounds AS (SELECT event_type, min(d) AS d0, max(d) AS d1
      |FROM daily GROUP BY 1),
      |grid AS (SELECT b.event_type,
      |unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE AS d
      |FROM bounds b),
      |dense AS (SELECT g.event_type, g.d, coalesce(y, 0) AS y
      |FROM grid g LEFT JOIN daily dd
      |ON dd.event_type = g.event_type AND dd.d = g.d),
      |lagged AS (SELECT event_type, d, y,
      |lag(y, 1) OVER (PARTITION BY event_type ORDER BY d) AS f1,
      |lag(y, 7) OVER (PARTITION BY event_type ORDER BY d) AS fs
      |FROM dense),
      |bt AS (SELECT * FROM lagged WHERE fs IS NOT NULL)
      |SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
      |CAST(sum(abs(y - f1)) AS BIGINT) AS abs_err_naive,
      |CAST(sum(abs(y - fs)) AS BIGINT) AS abs_err_snaive,
      |CASE WHEN sum(abs(y - f1)) > 0 THEN
      |round(CAST(sum(abs(y - fs)) AS DOUBLE) / sum(abs(y - f1)), 6)
      |END AS mase,
      |round(avg(CASE WHEN y + fs = 0 THEN 0.0
      |ELSE 2.0 * abs(y - fs) / (y + fs) END), 4) AS smape_snaive
      |FROM bt GROUP BY event_type ORDER BY event_type"""
      .stripMargin.replace("\n", " ")

  /** DuckDB twin of [[graft.operators.TimeSeries.madAnomaly]] (z > 3)
    * — shared verbatim by batch j57 and streaming s38. */
  private val madAnomalyOracle: String =
    """WITH daily AS (SELECT event_type,
        |CAST(date_trunc('day', ts) AS DATE) AS d,
        |CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |bounds AS (SELECT event_type, min(d) AS d0, max(d) AS d1
        |FROM daily GROUP BY 1),
        |grid AS (SELECT b.event_type,
        |unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE AS d
        |FROM bounds b),
        |dense AS MATERIALIZED (SELECT g.event_type, g.d,
        |coalesce(y, 0) AS y FROM grid g LEFT JOIN daily dd
        |ON dd.event_type = g.event_type AND dd.d = g.d),
        |med AS (SELECT event_type, median(y) AS med FROM dense
        |GROUP BY 1),
        |dev AS MATERIALIZED (SELECT d.event_type, d.d, d.y,
        |abs(d.y - m.med) AS ad, m.med FROM dense d JOIN med m
        |USING (event_type)),
        |mad AS (SELECT event_type, median(ad) AS mad FROM dev
        |GROUP BY 1),
        |z AS MATERIALIZED (SELECT v.event_type, v.d, v.y, v.med, m.mad,
        |CASE WHEN m.mad > 0 THEN round(v.ad / (1.4826 * m.mad), 4) END
        |AS z FROM dev v JOIN mad m USING (event_type)),
        |pk AS (SELECT event_type, d, y, z, row_number() OVER
        |(PARTITION BY event_type ORDER BY z DESC NULLS LAST, d) AS rn
        |FROM z)
        |SELECT z.event_type, CAST(count(*) AS BIGINT) AS n_days,
        |round(any_value(z.med), 1) AS med,
        |round(any_value(z.mad), 2) AS mad,
        |CAST(sum(CASE WHEN z.z > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
        |AS n_flagged,
        |CAST(any_value(p.d) - DATE '1970-01-01' AS BIGINT) AS peak_day,
        |any_value(p.y) AS peak_y, any_value(p.z) AS peak_z
        |FROM z JOIN (SELECT * FROM pk WHERE rn = 1) p USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " ")

  /** DuckDB twin of [[graft.operators.Funnel.newVsReturning]] — shared
    * verbatim by batch j60 and streaming s39. */
  private val newVsReturningOracle: String =
    """WITH ud AS (SELECT DISTINCT user_id,
        |CAST(date_trunc('day', ts) AS DATE) AS d FROM events),
        |fs AS (SELECT user_id, min(d) AS first_d FROM ud GROUP BY 1)
        |SELECT CAST(ud.d - DATE '1970-01-01' AS BIGINT) AS day,
        |CAST(count(*) AS BIGINT) AS active_users,
        |CAST(sum(CASE WHEN ud.d = fs.first_d THEN 1 ELSE 0 END) AS BIGINT)
        |AS new_users,
        |CAST(sum(CASE WHEN ud.d > fs.first_d THEN 1 ELSE 0 END) AS BIGINT)
        |AS returning_users,
        |round(CAST(sum(CASE WHEN ud.d > fs.first_d THEN 1 ELSE 0 END)
        |AS DOUBLE) / count(*), 4) AS returning_share
        |FROM ud JOIN fs USING (user_id) GROUP BY 1 ORDER BY 1"""
        .stripMargin.replace("\n", " ")

  private def holtOracle(alpha: Double, beta: Double, horizon: Int,
                         steps: Int): String = {
    val (a, oa, bg, ob) =
      (alpha.toString, (1.0 - alpha).toString,
        beta.toString, (1.0 - beta).toString)
    val head = Seq(
      "d AS MATERIALIZED (SELECT event_type, " +
        "row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn, " +
        "y FROM (SELECT event_type, date_trunc('day', ts) AS day, " +
        "CAST(count(*) AS DOUBLE) AS y FROM events GROUP BY 1, 2))",
      "h1 AS (SELECT a.event_type, a.y AS l, b.y - a.y AS b FROM d a " +
        "JOIN d b ON b.event_type = a.event_type " +
        "AND a.rn = 1 AND b.rn = 2)")
    val stepCtes = (2 to steps).flatMap { t =>
      Seq(
        s"l$t AS (SELECT h.event_type, " +
          s"round($a * s.y + $oa * (h.l + h.b), 6) AS ln_, " +
          s"h.l AS lp, h.b AS bp FROM h${t - 1} h " +
          s"JOIN d s ON s.event_type = h.event_type AND s.rn = $t)",
        s"h$t AS (SELECT event_type, ln_ AS l, " +
          s"round($bg * (ln_ - lp) + $ob * bp, 6) AS b FROM l$t)")
    }
    s"WITH ${(head ++ stepCtes).mkString(", ")}, " +
      "nn AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_obs " +
      "FROM d GROUP BY 1) " +
      s"SELECT h.event_type, nn.n_obs, h.l AS level, h.b AS trend, " +
      s"round(h.l + $horizon * h.b, 6) AS forecast_$horizon " +
      s"FROM h$steps h JOIN nn USING (event_type) ORDER BY event_type"
  }

  /** DuckDB twin of [[graft.operators.Graph.kCore]] on the urgent-order
    * co-purchase graph: the peel rounds unrolled as chained CTEs (the
    * fixed-point-iteration oracle discipline). */
  /** Unrolled synchronous-LPA oracle (the pcaPowerOracle/kcoreOracle
    * discipline): labels init to vertex ids over the urgent co-purchase
    * graph's BOTH-direction edge view, each round re-derives every
    * vertex's argmax neighbor label (count DESC, label ASC — the engine's
    * min(struct(-cnt, label)) tie-break) as a chained CTE. */
  private def labelPropagationOracle(rounds: Int, limit: Int): String = {
    val head = Seq(
      "li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderpriority = '1-URGENT')",
      "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey)",
      "bth AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0 " +
        "UNION ALL SELECT v, u FROM e0)",
      "l0 AS (SELECT DISTINCT src AS vertex, src AS label FROM bth)")
    val steps = (1 to rounds).map { r =>
      val p = r - 1
      s"l$r AS MATERIALIZED (SELECT vertex, label FROM (" +
        s"SELECT b.src AS vertex, l.label, " +
        "row_number() OVER (PARTITION BY b.src " +
        "ORDER BY count(*) DESC, l.label ASC) AS rn " +
        s"FROM bth b JOIN l$p l ON l.vertex = b.dst GROUP BY 1, 2) " +
        "WHERE rn = 1)"
    }
    s"WITH ${(head ++ steps).mkString(", ")} " +
      s"SELECT label, CAST(count(*) AS BIGINT) AS size, " +
      "CAST(min(vertex) AS BIGINT) AS min_vertex, " +
      "CAST(max(vertex) AS BIGINT) AS max_vertex " +
      s"FROM l$rounds GROUP BY 1 ORDER BY size DESC, label ASC LIMIT $limit"
  }

  /** DuckDB twin of [[graft.operators.Graph.landmarkBetweenness]]: the
    * same co-purchase graph head as [[labelPropagationOracle]], then the
    * Brandes forward BFS (σ as exact BIGINTs, first-visit levels via
    * anti-join against the running visited set) and the backward
    * dependency fold, both UNROLLED level by level with the per-level
    * 6 dp rounding the Spark side applies — the fixed-point-trajectory
    * discipline. */
  private def betweennessOracle(lms: Int, depth: Int, topN: Int): String = {
    val head = Seq(
      "li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderpriority = '1-URGENT')",
      "e0 AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v " +
        "FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey)",
      "bth AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0 " +
        "UNION ALL SELECT v, u FROM e0)",
      "vt AS MATERIALIZED (SELECT DISTINCT src AS vertex FROM bth)",
      s"lm AS (SELECT vertex FROM vt " +
        s"ORDER BY (vertex % 9973) * 2654435761 % 9973, vertex LIMIT $lms)",
      "f0 AS MATERIALIZED (SELECT vertex AS s, vertex, " +
        "CAST(1 AS BIGINT) AS sigma FROM lm)",
      "vis0 AS (SELECT s, vertex FROM f0)")
    val fwd = (1 to depth).flatMap { d =>
      val p = d - 1
      Seq(
        s"f$d AS MATERIALIZED (SELECT c.s, c.vertex, " +
          "CAST(sum(c.sigma) AS BIGINT) AS sigma " +
          "FROM (SELECT f.s AS s, b.dst AS vertex, f.sigma AS sigma " +
          s"FROM f$p f JOIN bth b ON b.src = f.vertex) c " +
          s"LEFT JOIN vis$p x ON x.s = c.s AND x.vertex = c.vertex " +
          "WHERE x.vertex IS NULL GROUP BY 1, 2)",
        s"vis$d AS MATERIALIZED (SELECT s, vertex FROM vis$p " +
          s"UNION ALL SELECT s, vertex FROM f$d)")
    }
    // δ in integer micro-units (1e-6): per-term round → BIGINT, then an
    // ASSOCIATIVE integer sum — mirrors the Spark side exactly (a double
    // trajectory flips 6-dp cells from summation-order drift alone).
    val dDeep =
      s"d$depth AS (SELECT s, vertex, CAST(0 AS BIGINT) AS delta_u " +
        s"FROM f$depth)"
    val bwd = (depth - 1 to 0 by -1).map { d =>
      val n = d + 1
      s"d$d AS MATERIALIZED (SELECT v.s, v.vertex, " +
        "coalesce(CAST(sum(CAST(round(CAST(v.sigma AS DOUBLE) / w.sigma " +
        "* (1 + w.delta_u / 1000000.0) * 1000000.0) AS BIGINT)) " +
        "AS BIGINT), 0) AS delta_u " +
        s"FROM f$d v LEFT JOIN bth b ON b.src = v.vertex " +
        s"LEFT JOIN (SELECT f.s, f.vertex, f.sigma, dd.delta_u FROM f$n f " +
        s"JOIN d$n dd ON dd.s = f.s AND dd.vertex = f.vertex) w " +
        "ON w.s = v.s AND w.vertex = b.dst GROUP BY 1, 2)"
    }
    val unionAll = (0 to depth)
      .map(d => s"SELECT s, vertex, delta_u FROM d$d")
      .mkString(" UNION ALL ")
    s"WITH ${(head ++ fwd ++ Seq(dDeep) ++ bwd).mkString(", ")}, " +
      s"alld AS ($unionAll) " +
      "SELECT CAST(vertex AS BIGINT) AS vertex, " +
      "round(CAST(sum(delta_u) AS DOUBLE) / 1000000.0 * " +
      s"((SELECT count(*) FROM vt) / (2.0 * $lms)), 4) AS bc_est " +
      s"FROM alld WHERE vertex <> s " +
      s"GROUP BY 1 ORDER BY bc_est DESC, vertex LIMIT $topN"
  }

  /** DuckDB twin of [[graft.operators.Curation.curationPipeline]]: the
    * x25/x42 recursive-closure + keep-best chain, then the composition
    * stages — token gate, CLUSTER-grain residue-permuted split, and
    * offset packing via a (split, bucket)-partitioned running token
    * sum. */
  private def curationOracleSql: String =
    s"""WITH RECURSIVE $minHashPairsCtes,
       |p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
       |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
       |reach(n, r) AS (
       |  SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM e)
       |  UNION
       |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
       |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1),
       |sc AS (SELECT doc_id,
       |  CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS INT) AS ws_tokens
       |  FROM documents),
       |lab AS (SELECT d.doc_id, coalesce(c.root, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c ON c.n = d.doc_id),
       |r AS (SELECT lab.doc_id, cluster_id, ws_tokens,
       |  row_number() OVER (PARTITION BY cluster_id
       |    ORDER BY ws_tokens DESC, lab.doc_id) AS rn
       |  FROM lab JOIN sc ON lab.doc_id = sc.doc_id),
       |kept AS (SELECT doc_id, cluster_id, ws_tokens,
       |  CASE WHEN (cluster_id % 9973) * 2654435761 % 9973 % 1000 < 200
       |    THEN 'val' ELSE 'train' END AS split,
       |  (doc_id % 9973) * 2654435761 % 9973 AS h
       |  FROM r WHERE rn = 1 AND ws_tokens >= 20),
       |b AS (SELECT doc_id, cluster_id, ws_tokens, split,
       |  CAST(h % 4 AS INT) AS bucket, h FROM kept)
       |SELECT doc_id, cluster_id, ws_tokens, split, bucket,
       |  CAST(floor((sum(ws_tokens) OVER (PARTITION BY split, bucket
       |    ORDER BY h, doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ws_tokens)
       |    / 1000.0) AS BIGINT) AS shard
       |FROM b ORDER BY doc_id""".stripMargin.replace("\n", " ")

  /** Quantile-normalization oracle: the same grid snap and pooled
    * interpolated quantile list, with the grid literal rendered from the
    * identical Scala doubles the engine embeds (shortest-repr doubles
    * parse identically in both engines). */
  private def quantileNormalizeOracle(gridPoints: Int): String = {
    val grid = (0 to gridPoints).map(i => i.toDouble / gridPoints)
      .mkString(", ")
    s"""WITH s AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score
       |FROM documents),
       |n AS (SELECT source, count(*) AS n FROM s GROUP BY 1),
       |q AS (SELECT quantile_cont(score, [$grid]) AS qs FROM s),
       |r AS (SELECT s.doc_id, s.source, s.score,
       |CAST(round((row_number() OVER (PARTITION BY s.source
       |ORDER BY s.score, s.doc_id) - 0.5) / n.n * $gridPoints) AS INT)
       |AS grid_idx
       |FROM s JOIN n ON n.source = s.source)
       |SELECT r.doc_id, r.source, r.score, r.grid_idx,
       |round(q.qs[r.grid_idx + 1], 6) AS normalized
       |FROM r CROSS JOIN q ORDER BY r.doc_id"""
      .stripMargin.replace("\n", " ")
  }

  private def kcoreOracle(k: Int, rounds: Int, limit: Int): String = {
    val head = Seq(
      "li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l " +
        "JOIN orders o ON o.o_orderkey = l.l_orderkey " +
        "WHERE o.o_orderpriority = '1-URGENT')",
      "e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, " +
        "b.l_partkey AS v FROM li a " +
        "JOIN li b ON a.l_orderkey = b.l_orderkey " +
        "AND a.l_partkey < b.l_partkey)")
    val peels = (1 to rounds).flatMap { r =>
      val p = r - 1
      Seq(
        s"d$r AS (SELECT w, count(*) AS deg FROM (SELECT u AS w FROM e$p " +
          s"UNION ALL SELECT v FROM e$p) GROUP BY 1)",
        s"v$r AS (SELECT w FROM d$r WHERE deg >= $k)",
        s"e$r AS MATERIALIZED (SELECT e.u, e.v FROM e$p e " +
          s"JOIN v$r a ON a.w = e.u JOIN v$r b ON b.w = e.v)")
    }
    s"WITH ${(head ++ peels).mkString(", ")}, " +
      s"fd AS (SELECT w AS vertex, CAST(count(*) AS BIGINT) AS core_degree " +
      s"FROM (SELECT u AS w FROM e$rounds UNION ALL SELECT v FROM e$rounds) " +
      "GROUP BY 1) SELECT vertex, core_degree FROM fd " +
      s"ORDER BY core_degree DESC, vertex LIMIT $limit"
  }

  private def pcaPowerOracle(iters: Int): String = {
    val head = Seq(
      """u AS MATERIALIZED (SELECT vec_id, label, g.i - 1 AS i,
        |CAST(g.v AS DOUBLE) AS v FROM embeddings,
        |LATERAL (SELECT UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i) g)""",
      """nrow AS MATERIALIZED (SELECT count(DISTINCT vec_id) AS n FROM u)""",
      """mu AS MATERIALIZED (SELECT i, round(avg(v), 6) AS m FROM u GROUP BY 1)""",
      """cu AS MATERIALIZED (SELECT u.vec_id, u.i, u.v - mu.m AS v
        |FROM u JOIN mu ON u.i = mu.i)""",
      """cov AS MATERIALIZED (SELECT a.i AS i, b.i AS j,
        |sum(a.v * b.v) / ((SELECT n FROM nrow) - 1) AS c
        |FROM cu a JOIN cu b ON a.vec_id = b.vec_id GROUP BY 1, 2)""",
      """v0 AS (SELECT i, 0.125 AS val FROM range(64) t(i))""")
    val rounds = (1 to iters).flatMap { k =>
      Seq(
        s"""w$k AS MATERIALIZED (SELECT c.i AS i, sum(c.c * v${k - 1}.val) AS val
           |FROM cov c JOIN v${k - 1} ON c.j = v${k - 1}.i GROUP BY 1)""",
        s"""v$k AS MATERIALIZED (SELECT i,
           |val / (SELECT sqrt(sum(val * val)) FROM w$k) AS val FROM w$k)""")
    }
    val tail = Seq(
      s"""sgn AS (SELECT CASE WHEN (SELECT val FROM v$iters
         |ORDER BY abs(val) DESC, i LIMIT 1) < 0 THEN -1.0 ELSE 1.0 END AS s)""",
      s"""vf AS MATERIALIZED (SELECT i, round(val * s, 6) AS val FROM v$iters, sgn)""",
      s"""lam AS (SELECT sum(w.val * v.val) AS ev
         |FROM w$iters w JOIN v${iters - 1} v ON w.i = v.i)""",
      """proj AS (SELECT cu.vec_id, sum(cu.v * vf.val) AS p
        |FROM cu JOIN vf ON cu.i = vf.i GROUP BY 1)""")
    ("WITH " + (head ++ rounds ++ tail).mkString(", ") + """
      |SELECT e.label, CAST(count(*) AS BIGINT) AS n,
      |round(avg(p.p), 4) AS mean_pc1, round(stddev_samp(p.p), 4) AS sd_pc1,
      |round((SELECT ev FROM lam), 4) AS eigenvalue
      |FROM proj p JOIN embeddings e ON e.vec_id = p.vec_id
      |GROUP BY 1 ORDER BY label""").stripMargin.replace("\n", " ")
  }

  /** j25's oracle: HITS unrolled — the same fixed halves the engine runs
    * (authority gather → L2 normalize → 6 dp round, then hubs), as
    * generated CTEs over the urgent-order customer→part edge set. */
  private def hitsOracle(iters: Int): String = {
    val head = Seq(
      """e AS MATERIALIZED (SELECT DISTINCT o.o_custkey AS s, l.l_partkey AS t
        |FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT')""",
      """h0 AS (SELECT DISTINCT s AS node, 1.0 AS score FROM e)""")
    val rounds = (1 to iters).flatMap { k =>
      Seq(
        s"""ar$k AS MATERIALIZED (SELECT e.t AS node, sum(h${k - 1}.score) AS raw
           |FROM e JOIN h${k - 1} ON e.s = h${k - 1}.node GROUP BY 1)""",
        s"""a$k AS MATERIALIZED (SELECT node,
           |round(raw / (SELECT sqrt(sum(raw*raw)) FROM ar$k), 6) AS score FROM ar$k)""",
        s"""hr$k AS MATERIALIZED (SELECT e.s AS node, sum(a$k.score) AS raw
           |FROM e JOIN a$k ON e.t = a$k.node GROUP BY 1)""",
        s"""h$k AS MATERIALIZED (SELECT node,
           |round(raw / (SELECT sqrt(sum(raw*raw)) FROM hr$k), 6) AS score FROM hr$k)""")
    }
    val tail = Seq(
      s"""ranked AS (SELECT 'authority' AS role, node, score,
         |row_number() OVER (ORDER BY score DESC, node) AS rnk FROM a$iters
         |UNION ALL SELECT 'hub', node, score,
         |row_number() OVER (ORDER BY score DESC, node) FROM h$iters)""")
    ("WITH " + (head ++ rounds ++ tail).mkString(", ") +
      """ SELECT role, node, score, CAST(rnk AS BIGINT) AS rnk FROM ranked
        |WHERE rnk <= 10 ORDER BY role, rnk""").stripMargin.replace("\n", " ")
  }

  /** Shared CDC chunk-sharing pair CTEs (m4's candidate generation):
    * content-defined chunks per payload, boilerplate dropped, pairs
    * sharing >= 3 distinct chunks (`mp`). m4 reads `mp` directly; m5
    * closes over it transitively. */
  private val chunkPairsCtes: String =
    """m AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents),
      |cuts AS (SELECT media_id, text, len,
      |CASE WHEN len >= 8 THEN list_filter(generate_series(1, len - 7),
      |p -> md5(substr(text, CAST(p AS INT), 8)) LIKE '0%')
      |ELSE CAST([] AS BIGINT[]) END AS cs FROM m WHERE len >= 1),
      |spans AS (SELECT media_id, text, len,
      |list_prepend(CAST(1 AS BIGINT), list_transform(cs, c -> c + 1)) AS starts,
      |list_append(cs, CAST(len AS BIGINT)) AS ends FROM cuts),
      |ch AS (SELECT DISTINCT media_id,
      |unnest(list_transform(generate_series(1, len(starts)),
      |i -> md5(substr(text, CAST(starts[CAST(i AS INT)] AS INT),
      |CAST(ends[CAST(i AS INT)] - starts[CAST(i AS INT)] + 1 AS INT))))) AS h
      |FROM spans),
      |freq AS (SELECT h, count(*) AS nm FROM ch GROUP BY h),
      |rare AS (SELECT ch.media_id, ch.h FROM ch JOIN freq USING (h)
      |WHERE freq.nm <= 20 AND freq.nm > 1),
      |pr AS (SELECT a.media_id AS id_a, b.media_id AS id_b
      |FROM rare a JOIN rare b ON a.h = b.h AND a.media_id < b.media_id),
      |mp AS (SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
      |FROM pr GROUP BY 1, 2 HAVING count(*) >= 3)"""
      .stripMargin.replace("\n", " ")

  /** x96's oracle: the MMR greedy unrolled — candidate top-k by rounded
    * cosine, pairwise candidate sims, then one CTE per pick mirroring
    * the engine's argmax(λ·rel − (1−λ)·maxsim) with 6 dp rounds and the
    * id tie-break at every step. */
  private def mmrOracle(k: Int, picks: Int, lam: Double): String = {
    def cosSql(a: String, b: String): String =
      s"""round(list_reduce(list_transform(generate_series(1, len($a)),
         |i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y) /
         |(sqrt(list_reduce(list_transform(generate_series(1, len($a)),
         |i -> CAST($a[i] AS DOUBLE) * CAST($a[i] AS DOUBLE)), (x,y) -> x+y)) *
         |sqrt(list_reduce(list_transform(generate_series(1, len($b)),
         |i -> CAST($b[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)), (x,y) -> x+y))), 6)"""
    val oneMinus = 1 - lam
    val head = Seq(
      "q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)",
      s"""scored AS MATERIALIZED (SELECT vec_id, ${cosSql("embedding", "qv")} AS rel
         |FROM embeddings, q WHERE vec_id <> 0)""",
      s"cand AS MATERIALIZED (SELECT vec_id, rel FROM scored ORDER BY rel DESC, vec_id LIMIT $k)",
      s"""sim AS MATERIALIZED (SELECT a.vec_id AS ia, b.vec_id AS ib,
         |${cosSql("a.embedding", "b.embedding")} AS s
         |FROM (SELECT e.vec_id, e.embedding FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id) a
         |JOIN (SELECT e.vec_id, e.embedding FROM embeddings e JOIN cand c ON c.vec_id = e.vec_id) b
         |ON a.vec_id <> b.vec_id)""",
      s"""p1 AS (SELECT vec_id, rel, round($lam * rel, 6) AS mmr FROM cand
         |ORDER BY mmr DESC, vec_id LIMIT 1)""")
    val rounds = (2 to picks).map { r =>
      val prev = (1 until r).map(i => s"SELECT vec_id FROM p$i").mkString(" UNION ALL ")
      s"""p$r AS (SELECT c.vec_id, c.rel,
         |round($lam * c.rel - $oneMinus * max(s.s), 6) AS mmr
         |FROM cand c JOIN sim s ON s.ia = c.vec_id AND s.ib IN ($prev)
         |WHERE c.vec_id NOT IN ($prev)
         |GROUP BY c.vec_id, c.rel ORDER BY mmr DESC, c.vec_id LIMIT 1)"""
    }
    val sel = (1 to picks).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rnk, vec_id, rel, mmr FROM p$i").mkString(" UNION ALL ")
    ("WITH " + (head ++ rounds).mkString(", ") +
      s" SELECT rnk, vec_id, rel, mmr FROM ($sel) ORDER BY rnk")
      .stripMargin.replace("\n", " ")
  }

  val entries: Seq[(String, Q, Option[String])] = Seq(

    ("a4_channel_stats",
      (s: SparkSession, dir: String) =>
        channelStats(s, dir).orderBy(col("channel"), col("ts")),
      Some(s"SELECT * FROM ($csSql) ORDER BY channel, ts")),

    ("a5_user_stats",
      (s: SparkSession, dir: String) =>
        userStats(s, dir).orderBy(col("channel"), col("username"), col("ts")),
      Some(s"SELECT * FROM ($usSql) ORDER BY channel, username, ts")),

    ("a6_emote_stats",
      (s: SparkSession, dir: String) =>
        StatsPipeline.emoteStats(docEmotes(s, dir))
          .orderBy(col("channel"), col("emote")),
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT channel, emote, count(*) AS occurrences FROM occ " +
        "GROUP BY 1, 2 ORDER BY channel, emote")),

    ("a7_user_emote_stats",
      (s: SparkSession, dir: String) =>
        StatsPipeline.userEmoteStats(docEmotes(s, dir))
          .orderBy(col("channel"), col("emote"), col("username")),
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT channel, emote, username, count(*) AS occurrences FROM occ " +
        "GROUP BY 1, 2, 3 ORDER BY channel, emote, username")),

    ("a8_phrase_stats",
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
          .select(col("lang").as("channel"), col("text"))
        val matched = StatsPipeline.matchPhrases(docs, Tables.phrases, "text")
        StatsPipeline.phraseStats(matched)
          .orderBy(col("channel"), col("phrase_name"))
      },
      Some(
        """WITH m AS (
          | SELECT lang AS channel, 'p_the' AS phrase_name, len(regexp_extract_all(text, '(?i)the')) AS matches FROM documents
          | UNION ALL SELECT lang, 'p_scan', len(regexp_extract_all(text, '(?i)scan|merge')) FROM documents
          | UNION ALL SELECT lang, 'p_en_row', len(regexp_extract_all(text, '(?i)row')) FROM documents WHERE regexp_matches(lang, '(?i)en'))
          |SELECT channel, phrase_name, CAST(sum(matches) AS BIGINT) AS matches
          |FROM m WHERE matches > 0 GROUP BY 1, 2 ORDER BY channel, phrase_name"""
          .stripMargin.replace("\n", " "))),

    ("a9_alltime_totals",
      (s: SparkSession, dir: String) =>
        StatsPipeline.allTimeTotals(channelStats(s, dir), Seq("channel"), "messages")
          .orderBy(col("channel")),
      Some("SELECT event_type AS channel, count(*) AS messages FROM events " +
        "GROUP BY 1 ORDER BY channel")),

    ("a10_sentinel_union",
      (s: SparkSession, dir: String) =>
        StatsPipeline.withSentinelTotals(channelStats(s, dir), Seq("channel"), "messages")
          .orderBy(col("channel"), col("ts")),
      Some(s"WITH cs AS ($csSql) " +
        "SELECT * FROM (SELECT * FROM cs UNION ALL " +
        "SELECT channel, CAST(0 AS BIGINT) AS ts, CAST(sum(messages) AS BIGINT) " +
        "FROM cs GROUP BY 1) ORDER BY channel, ts")),

    // =======================================================================
    // Serving queries (SURVEY §2.4)
    // =======================================================================

    ("q1_point_lookup_totals",
      (s: SparkSession, dir: String) =>
        StatsPipeline.allTimeTotals(channelStats(s, dir), Seq("channel"), "messages")
          .filter(col("channel").isin("error", "signup"))
          .orderBy(col("channel")),
      Some("SELECT event_type AS channel, count(*) AS messages FROM events " +
        "WHERE event_type IN ('error', 'signup') GROUP BY 1 ORDER BY channel")),

    ("q2_visible_channel_totals",
      (s: SparkSession, dir: String) =>
        Serving.visibleOnly(
          StatsPipeline.allTimeTotals(channelStats(s, dir), Seq("channel"), "messages"),
          Tables.channels(s, dir))
          .orderBy(col("channel")),
      Some("SELECT event_type AS channel, count(*) AS messages FROM events " +
        "WHERE event_type <> 'click' GROUP BY 1 ORDER BY channel")),

    ("q3_last_seen",
      (s: SparkSession, dir: String) =>
        Tables.messages(s, dir)
          .groupBy(col("username"), col("channel"))
          .agg(floor(max(unix_millis(col("ts"))) / 1000).cast("long").as("last_seen"))
          .orderBy(col("username"), col("channel")),
      Some("SELECT CAST(user_id AS VARCHAR) AS username, event_type AS channel, " +
        "epoch_ms(max(ts)) // 1000 AS last_seen FROM events " +
        "GROUP BY 1, 2 ORDER BY username, channel")),

    ("q4_left_join_default",
      (s: SparkSession, dir: String) => {
        val ch = Tables.channels(s, dir).select("channel")
        val u = Tables.messages(s, dir)
          .filter(col("username") === "13")
          .groupBy(col("channel")).agg(count(lit(1)).as("messages"))
        ch.join(u, Seq("channel"), "left_outer")
          .select(col("channel"), coalesce(col("messages"), lit(0L)).as("messages"))
          .orderBy(col("channel"))
      },
      Some("WITH ch AS (SELECT DISTINCT event_type AS channel FROM events), " +
        "u AS (SELECT event_type AS channel, count(*) AS messages FROM events " +
        "WHERE CAST(user_id AS VARCHAR) = '13' GROUP BY 1) " +
        "SELECT ch.channel, COALESCE(u.messages, CAST(0 AS BIGINT)) AS messages " +
        "FROM ch LEFT JOIN u USING (channel) ORDER BY channel")),

    ("q5_trailing_sums",
      (s: SparkSession, dir: String) =>
        Serving.trailingSums(
          channelStats(s, dir).filter(col("channel") === "view"), NOW,
          Seq("m5" -> 300000L, "h1" -> 3600000L, "d1" -> 86400000L,
            "d7" -> 604800000L, "d30" -> 2592000000L),
          "messages"),
      Some {
        val cases = Seq("m5" -> 300000L, "h1" -> 3600000L, "d1" -> 86400000L,
          "d7" -> 604800000L, "d30" -> 2592000000L).map { case (n, span) =>
          s"CAST(COALESCE(SUM(CASE WHEN ts > ${NOW - span} THEN messages END), 0) AS BIGINT) AS $n"
        }.mkString(", ")
        s"WITH cs AS ($csSql) SELECT $cases FROM cs WHERE channel = 'view'"
      }),

    ("q6_top_emotes",
      (s: SparkSession, dir: String) =>
        Serving.leaderboard(docEmotes(s, dir).withColumn("occurrences", lit(1L)),
          Seq("emote"), "occurrences", 10),
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT emote, count(*) AS occurrences FROM occ GROUP BY 1 " +
        "ORDER BY occurrences DESC, emote LIMIT 10")),

    ("q7_leaderboard_chatters",
      (s: SparkSession, dir: String) =>
        Serving.leaderboard(
          userStats(s, dir).filter(col("ts").between(T0, T1)),
          Seq("username"), "messages", 25),
      Some(s"WITH us AS ($usSql) " +
        s"SELECT username, CAST(sum(messages) AS BIGINT) AS messages FROM us " +
        s"WHERE ts BETWEEN $T0 AND $T1 GROUP BY 1 " +
        "ORDER BY messages DESC, username LIMIT 25")),

    ("q8_cumulative_base",
      // Fed from channelStats directly: the `ts > 0` sentinel-exclusion
      // filter makes the sentinel rows invisible to this query anyway, so
      // materializing withSentinelTotals here would be a second full
      // aggregation + union that the filter immediately discards.
      (s: SparkSession, dir: String) =>
        Serving.cumulativeBase(channelStats(s, dir),
          Seq("channel"), "messages", T1)
          .orderBy(col("channel")),
      Some(s"WITH cs AS ($csSql) " +
        s"SELECT channel, CAST(COALESCE(sum(messages), 0) AS BIGINT) AS messages " +
        s"FROM cs WHERE ts > 0 AND ts < $T1 GROUP BY 1 ORDER BY channel")),

    ("q9_series_scan",
      (s: SparkSession, dir: String) =>
        channelStats(s, dir)
          .filter(col("channel") === "error" && col("ts").between(T0, T1))
          .select(col("ts"), col("messages"))
          .orderBy(col("ts")),
      Some(s"WITH cs AS ($csSql) SELECT ts, messages FROM cs " +
        s"WHERE channel = 'error' AND ts BETWEEN $T0 AND $T1 ORDER BY ts")),

    ("q10_cumulative_sums",
      (s: SparkSession, dir: String) =>
        Serving.cumulativeSums(channelStats(s, dir), Seq("channel"), "messages")
          .orderBy(col("channel"), col("ts")),
      Some(s"WITH cs AS ($csSql) SELECT channel, ts, " +
        "CAST(sum(messages) OVER (PARTITION BY channel ORDER BY ts) AS BIGINT) AS messages " +
        "FROM cs ORDER BY channel, ts")),

    ("q11_resample",
      // Resample each channel's windowed series in [T0, T1] down to 50
      // points (MainController.php:593-680; dashboard cap 500/100 points,
      // :21). Channels with n <= 50 samples pass through as-is (:612-613).
      (s: SparkSession, dir: String) =>
        Serving.resample(
          channelStats(s, dir)
            .filter(col("ts").between(T0, T1))
            .select(col("channel"), col("ts"), col("messages")),
          Seq("channel"), "messages", 50, Some(T0), Some(T1))
          .orderBy(col("channel"), col("ts")),
      Some {
        val np = 50
        s"""WITH cs AS ($csSql),
           |ser AS (SELECT channel, ts, messages FROM cs WHERE ts BETWEEN $T0 AND $T1),
           |p AS (SELECT channel, min(ts) AS first_ts, max(ts) AS last_ts,
           |  arg_min(messages, ts) AS first_v, arg_max(messages, ts) AS last_v,
           |  count(*) AS n FROM ser GROUP BY 1),
           |p2 AS (SELECT *, (CAST($T1 AS BIGINT) - $T0 + $np - 2) // ($np - 1) AS c
           |  FROM p WHERE n > $np),
           |grid AS (SELECT channel, unnest(generate_series($T0, $T1 - 1, c)) AS ts FROM p2
           |  UNION ALL SELECT channel, $T1 FROM p2),
           |u AS (SELECT channel, ts, messages AS v, ts AS sts, 0 AS is_grid FROM ser
           |    WHERE channel IN (SELECT channel FROM p2)
           |  UNION ALL SELECT channel, ts, NULL, NULL, 1 FROM grid),
           |w AS (SELECT *,
           |  last_value(v IGNORE NULLS) OVER wb AS b_v,
           |  last_value(sts IGNORE NULLS) OVER wb AS b_ts,
           |  first_value(v IGNORE NULLS) OVER wa AS a_v,
           |  first_value(sts IGNORE NULLS) OVER wa AS a_ts
           |  FROM u
           |  WINDOW wb AS (PARTITION BY channel ORDER BY ts, is_grid
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           |  wa AS (PARTITION BY channel ORDER BY ts, is_grid
           |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
           |res AS (SELECT w.channel, w.ts,
           |  CAST(CASE WHEN w.ts <= p2.first_ts THEN p2.first_v
           |            WHEN w.ts >= p2.last_ts THEN p2.last_v
           |       ELSE round(b_v + (w.ts - b_ts) / (a_ts - b_ts) * (a_v - b_v))
           |       END AS BIGINT) AS messages
           |  FROM w JOIN p2 USING (channel) WHERE is_grid = 1),
           |asis AS (SELECT channel, ts, messages FROM ser JOIN p USING (channel)
           |  WHERE p.n <= $np)
           |SELECT * FROM (SELECT * FROM res UNION ALL SELECT * FROM asis)
           |ORDER BY channel, ts""".stripMargin.replace("\n", " ")
      }),

    ("q12_empty_series",
      // Empty-series placeholder (MainController.php:697-706): a series with
      // no rows yields two zero samples at the range bounds.
      (s: SparkSession, dir: String) =>
        Serving.orEmptyPlaceholder(
          channelStats(s, dir)
            .filter(col("channel") === "no_such_channel")
            .select(col("ts"), col("messages")),
          T0, T1, "messages")
          .orderBy(col("ts")),
      Some(s"WITH cs AS ($csSql), " +
        "ser AS (SELECT ts, messages FROM cs WHERE channel = 'no_such_channel') " +
        "SELECT * FROM (SELECT * FROM ser UNION ALL " +
        s"SELECT * FROM (VALUES (CAST($T0 AS BIGINT), CAST(0 AS BIGINT)), " +
        s"(CAST($T1 AS BIGINT), CAST(0 AS BIGINT))) v(ts, messages) " +
        "WHERE (SELECT count(*) FROM ser) = 0) ORDER BY ts")),

    ("q13_leaderboard_rank",
      (s: SparkSession, dir: String) =>
        Serving.ranked(
          StatsPipeline.emoteStats(docEmotes(s, dir))
            .groupBy(col("emote")).agg(sum(col("occurrences")).cast("long").as("occurrences")),
          "occurrences", "emote")
          .orderBy(col("rank")),
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT emote, occurrences, row_number() OVER (ORDER BY occurrences DESC, emote) AS rank " +
        "FROM (SELECT emote, count(*) AS occurrences FROM occ GROUP BY 1) ORDER BY rank")),

    ("q14_exclusion_filter",
      (s: SparkSession, dir: String) =>
        Serving.leaderboard(
          userStats(s, dir).filter(!col("username").isin(Tables.ExcludedChatters: _*)),
          Seq("username"), "messages", 25),
      Some {
        val excl = Tables.ExcludedChatters.map(u => s"'$u'").mkString(", ")
        s"WITH us AS ($usSql) SELECT username, CAST(sum(messages) AS BIGINT) AS messages " +
          s"FROM us WHERE username NOT IN ($excl) GROUP BY 1 " +
          "ORDER BY messages DESC, username LIMIT 25"
      }),

    ("q15_max_per_group",
      (s: SparkSession, dir: String) =>
        Serving.maxPerGroupWithShare(
          Tables.messages(s, dir)
            .groupBy(col("username"), col("channel")).agg(count(lit(1)).as("messages")),
          "username", "messages")
          .orderBy(col("username")),
      Some("WITH t AS (SELECT CAST(user_id AS VARCHAR) AS username, event_type, " +
        "count(*) AS c FROM events GROUP BY 1, 2), " +
        "m AS (SELECT username, CAST(max(c) AS BIGINT) AS messages FROM t GROUP BY 1) " +
        "SELECT username, messages, round(messages * 100.0 / sum(messages) OVER (), 4) AS pct " +
        "FROM m ORDER BY username")),

    ("q16_stddev",
      (s: SparkSession, dir: String) =>
        channelStats(s, dir)
          .groupBy(col("channel"))
          .agg(round(stddev_samp(col("messages")), 4).as("sd"))
          .orderBy(col("channel")),
      Some(s"WITH cs AS ($csSql) SELECT channel, round(stddev_samp(messages), 4) AS sd " +
        "FROM cs GROUP BY 1 ORDER BY channel")),

    ("q17_date_scalars",
      (s: SparkSession, dir: String) =>
        Tables.messages(s, dir)
          .groupBy(col("channel"))
          .agg(
            date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("first_seen"),
            floor(max(unix_millis(col("ts"))) / 1000).cast("long").as("last_seen_s"))
          .orderBy(col("channel")),
      Some("SELECT event_type AS channel, " +
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_seen, " +
        "epoch_ms(max(ts)) // 1000 AS last_seen_s " +
        "FROM events GROUP BY 1 ORDER BY channel")),

    ("q20_json_extract",
      (s: SparkSession, dir: String) =>
        Tables.messages(s, dir)
          .withColumn("k", get_json_object(col("message"), "$.k").cast("long"))
          .groupBy(col("channel"))
          .agg(sum(col("k")).as("k_sum"), round(avg(col("k")), 4).as("k_avg"))
          .orderBy(col("channel")),
      Some("SELECT event_type AS channel, " +
        "CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum, " +
        "round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS k_avg " +
        "FROM events GROUP BY 1 ORDER BY channel")),

    // =======================================================================
    // Transforms, serde, sessions, merge semantics (SURVEY §2.1-2.2 S2/S3/
    // S10, T4/T6, §2.4 Q18/Q19) + streaming parity (S1/S5/A3/T2)
    // =======================================================================

    ("t4_matched_log",
      // Matched-message side output: full message rows, once per matching
      // phrase with log_message=true (PhraseExtractor.java:82-86;
      // MessagesMatchingPhraseExporter.java:43-50 shape).
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir).select(
          col("doc_id").as("message_id"), col("lang").as("channel"),
          col("source").as("username"), col("text"))
        val matched = StatsPipeline.matchPhrases(docs, Tables.phrases, "text")
        StatsPipeline.matchedMessageLog(matched, Tables.phrases)
          .select(col("message_id"), col("channel").as("message_channel"),
            col("username").as("message_user"), col("text").as("message_text"),
            col("phrase_name").as("matched_phrase"))
          .orderBy(col("matched_phrase"), col("message_id"))
      },
      Some("SELECT doc_id AS message_id, lang AS message_channel, " +
        "source AS message_user, text AS message_text, " +
        "'p_the' AS matched_phrase FROM documents " +
        "WHERE len(regexp_extract_all(text, '(?i)the')) > 0 " +
        "ORDER BY matched_phrase, message_id")),

    ("t6_clean_validate",
      // Input validation/cleanup (Bot.java:114-128): a deliberately dirtied
      // stream (padded/uppercased channel, one user's messages nulled) run
      // through cleanMessages — null-drop, trim, lowercase — then counted.
      (s: SparkSession, dir: String) => {
        val dirty = Tables.messages(s, dir)
          .withColumn("channel",
            concat(lit("  "), upper(col("channel")), lit(" ")))
          .withColumn("message",
            when(col("username") === "5", lit(null).cast("string"))
              .otherwise(concat(lit(" "), col("message"))))
        StatsPipeline.cleanMessages(dirty)
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("messages"))
          .orderBy(col("channel"))
      },
      Some("SELECT lower(trim('  ' || upper(event_type) || ' ')) AS channel, " +
        "count(*) AS messages FROM events " +
        "WHERE CAST(user_id AS VARCHAR) <> '5' GROUP BY 1 ORDER BY channel")),

    ("s2_json_roundtrip",
      // S3 serialize (to_json of the Message envelope, Message.java:26-33)
      // then S2 deserialize (from_json with the explicit envelope
      // StructType, MessageDeserializationSchema.java:9-25); the output
      // proves field-exact round-trip (mismatch count must be 0).
      (s: SparkSession, dir: String) => {
        val parsed = Tables.messages(s, dir)
          .withColumn("json", to_json(struct(
            unix_millis(col("ts")).as("instant"), col("channel"),
            col("username"), col("message"))))
          .withColumn("m", from_json(col("json"), graft.Schemas.messageEnvelope))
          .withColumn("bad",
            when(col("m.instant") === unix_millis(col("ts")) &&
              col("m.channel") === col("channel") &&
              col("m.username") === col("username") &&
              col("m.message") === col("message"), 0L).otherwise(1L))
        parsed.groupBy(col("channel"))
          .agg(count(lit(1)).as("n"),
            sum(col("bad")).cast("long").as("roundtrip_mismatches"))
          .orderBy(col("channel"))
      },
      Some("SELECT event_type AS channel, count(*) AS n, " +
        "CAST(0 AS BIGINT) AS roundtrip_mismatches " +
        "FROM events GROUP BY 1 ORDER BY channel")),

    ("s10_sessions",
      // Gap-based sessionization (30 min gap) reproducing the streams
      // uptime table `(channel, started_at, ended_at)` (Bot.java:145-232)
      // via session_window — one shuffle, no self-join. The ts is floored to
      // epoch-ms first (the engine's external timestamp precision, SURVEY
      // §1.4) so a gap straddling the 30-min boundary within <1ms splits or
      // merges identically here and in the ms-grain oracle.
      (s: SparkSession, dir: String) =>
        graft.operators.Sessionize.sessions(
          Tables.messages(s, dir).select(col("channel"),
            timestamp_millis(unix_millis(col("ts"))).as("ts")),
          Seq("channel"), "ts", 1800000L)
          .orderBy(col("channel"), col("started_at")),
      Some(sessionsOracleSql)),

    ("s10b_stream_sessions",
      // The SAME session semantics under Structured Streaming with CUSTOM
      // state: flatMapGroupsWithState carrying one open session per channel,
      // closed sessions emitted append-only exactly once (streaming/
      // StreamingSessionize.scala; per-channel flush sentinels close the
      // final sessions of the finite replay). Must reproduce the batch s10
      // oracle row-for-row.
      (s: SparkSession, dir: String) => {
        val base = scratch("s10b")
        graft.streaming.StreamingSessionize.runSessions(
          s, dir, base + "/sessions", 1800000L, NOW + 1800000L)
          .orderBy(col("channel"), col("started_at"))
      },
      Some(sessionsOracleSql)),

    ("q21_asof_enrich",
      // As-of (backward) join: every message enriched with the latest
      // closed stats window at-or-before its timestamp (operators/
      // AsofJoin.scala — union + running window, no join, one shuffle).
      // DuckDB's native ASOF LEFT JOIN is the oracle.
      (s: SparkSession, dir: String) => {
        val msgs = Tables.messages(s, dir).select(
          col("channel"), unix_millis(col("ts")).as("ts"), col("username"))
        graft.operators.AsofJoin.asofBackward(
          msgs, channelStats(s, dir), Seq("channel"), "ts", Seq("messages"))
          .select(col("channel"), col("ts"), col("username"),
            coalesce(col("asof_ts"), lit(0L)).as("asof_ts"),
            coalesce(col("messages"), lit(0L)).as("messages"))
          .orderBy(col("channel"), col("ts"), col("username"))
      },
      Some(s"WITH cs AS ($csSql), " +
        "m AS (SELECT event_type AS channel, epoch_ms(ts) AS ts, " +
        "CAST(user_id AS VARCHAR) AS username FROM events) " +
        "SELECT m.channel, m.ts, m.username, " +
        "COALESCE(cs.ts, 0) AS asof_ts, COALESCE(cs.messages, 0) AS messages " +
        "FROM m ASOF LEFT JOIN cs ON m.channel = cs.channel AND m.ts >= cs.ts " +
        "ORDER BY m.channel, m.ts, m.username")),

    ("q22_session_attribution",
      // Interval (range) join: messages attributed to the stream session
      // they happened in (streams ⋈ messages — the join the reference's PHP
      // does per-request), via the bucketed equi-join in operators/
      // RangeJoin.scala; oracle is DuckDB's plain inequality join.
      (s: SparkSession, dir: String) => {
        val msgs = Tables.messages(s, dir).select(
          col("channel"), unix_millis(col("ts")).as("ts"), col("username"))
        val sess = graft.operators.Sessionize.sessions(
          Tables.messages(s, dir).select(col("channel"),
            timestamp_millis(unix_millis(col("ts"))).as("ts")),
          Seq("channel"), "ts", 1800000L).drop("n_events")
        graft.operators.RangeJoin.pointInInterval(
          msgs, sess, Seq("channel"), "ts", "started_at", "ended_at", 1800000L)
          .groupBy(col("channel"), col("started_at"), col("ended_at"))
          .agg(count(lit(1)).as("n_msgs"),
            countDistinct(col("username")).as("n_chatters"))
          .orderBy(col("channel"), col("started_at"))
      },
      Some("""WITH e AS (SELECT event_type AS channel, epoch_ms(ts) AS t,
        |  CAST(user_id AS VARCHAR) AS username FROM events),
        |d AS (SELECT channel, t, username, CASE WHEN t - lag(t) OVER
        |  (PARTITION BY channel ORDER BY t) >= 1800000 THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT channel, t, username, sum(ns) OVER (PARTITION BY channel ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d),
        |sess AS (SELECT channel, min(t) AS started_at, max(t) + 1800000 AS ended_at
        |  FROM g GROUP BY channel, sid)
        |SELECT s.channel, s.started_at, s.ended_at, count(*) AS n_msgs,
        |  count(DISTINCT e.username) AS n_chatters
        |FROM sess s JOIN e ON e.channel = s.channel
        |  AND e.t >= s.started_at AND e.t < s.ended_at
        |GROUP BY 1, 2, 3 ORDER BY s.channel, s.started_at"""
        .stripMargin.replace("\n", " "))),

    ("q18_string_ops",
      // The string scalar family in one query: trim, lower, split,
      // rlike, regexp_count (EmoteExtractor.java:92-94, Bot.java:126,
      // PhraseExtractor.java:62-72).
      (s: SparkSession, dir: String) =>
        Tables.documents(s, dir).select(
          col("doc_id"),
          lower(element_at(split(trim(col("text")), "\\s+"), 1)).as("first_token"),
          col("text").rlike("(?i)row").as("has_row"),
          regexp_count(col("text"), lit("(?i)the")).cast("int").as("n_the"))
          .orderBy(col("doc_id")),
      Some("SELECT doc_id, " +
        "lower(regexp_split_to_array(trim(text), '\\s+')[1]) AS first_token, " +
        "regexp_matches(text, '(?i)row') AS has_row, " +
        "CAST(len(regexp_extract_all(text, '(?i)the')) AS INT) AS n_the " +
        "FROM documents ORDER BY doc_id")),

    ("q19_upsert_merge",
      // Additive upsert merge (`SET x = x + EXCLUDED.x`,
      // ChannelStatsAggregation.java:45-50): totals from two disjoint
      // halves of the stream merged via Merge.additiveUpsert must equal
      // the single-pass totals — the batch-split equivalence invariant
      // (SURVEY §5.3).
      (s: SparkSession, dir: String) => {
        val msgs = Tables.messages(s, dir)
        def totals(half: DataFrame) =
          StatsPipeline.allTimeTotals(
            StatsPipeline.channelStats(half, W), Seq("channel"), "messages")
        val state = totals(msgs.filter(unix_millis(col("ts")) < T1))
        val delta = totals(msgs.filter(unix_millis(col("ts")) >= T1))
        graft.operators.Merge.additiveUpsert(
          state, delta, Seq("channel"), Seq("messages"))
          .orderBy(col("channel"))
      },
      Some("SELECT event_type AS channel, count(*) AS messages FROM events " +
        "GROUP BY 1 ORDER BY channel")),

    ("q19b_insert_ignore",
      // `ON CONFLICT DO NOTHING` (EmoteExtractor.java:200-202): existing
      // keys keep their state row; new keys insert with a DETERMINISTIC
      // survivor among duplicate-key delta rows (lexicographically
      // smallest values — mirrored by the oracle's row_number pick).
      (s: SparkSession, dir: String) => {
        val msgs = Tables.messages(s, dir)
        def totals(half: DataFrame) =
          StatsPipeline.allTimeTotals(
            StatsPipeline.channelStats(half, W), Seq("channel"), "messages")
        val t2 = T1 + 604800000L
        val state = totals(msgs.filter(unix_millis(col("ts")) < T1))
          .filter(col("channel") =!= "click")
        val delta = totals(msgs.filter(
            unix_millis(col("ts")) >= T1 && unix_millis(col("ts")) < t2))
          .unionByName(totals(msgs.filter(unix_millis(col("ts")) >= t2)))
        graft.operators.Merge.insertIgnore(state, delta, Seq("channel"))
          .orderBy(col("channel"))
      },
      Some {
        val t2 = T1 + 604800000L
        s"""WITH state AS (SELECT event_type AS channel, count(*) AS messages
          |  FROM events WHERE epoch_ms(ts) < $T1 AND event_type <> 'click' GROUP BY 1),
          |delta AS (
          |  SELECT event_type AS channel, count(*) AS messages FROM events
          |    WHERE epoch_ms(ts) >= $T1 AND epoch_ms(ts) < $t2 GROUP BY 1
          |  UNION ALL
          |  SELECT event_type AS channel, count(*) AS messages FROM events
          |    WHERE epoch_ms(ts) >= $t2 GROUP BY 1),
          |surv AS (SELECT channel, messages FROM (SELECT channel, messages,
          |  row_number() OVER (PARTITION BY channel ORDER BY messages) AS rn
          |  FROM delta) WHERE rn = 1)
          |SELECT * FROM (SELECT * FROM state UNION ALL
          |  SELECT * FROM surv WHERE channel NOT IN (SELECT channel FROM state))
          |ORDER BY channel""".stripMargin.replace("\n", " ")
      }),

    ("s5_stream_upsert",
      // Structured Streaming parity (S1 replay source + S4 watermark + A3
      // update mode + S5 idempotent upsert sink): the streamed stats table
      // must equal the batch aggregation (a4) exactly.
      (s: SparkSession, dir: String) => {
        val base = scratch("s5")
        graft.streaming.Streaming.runChannelStats(
          s, dir, base + "/state", W)
          .orderBy(col("channel"), col("ts"))
      },
      Some(s"SELECT * FROM ($csSql) ORDER BY channel, ts")),

    ("t2_stream_emotes",
      // T2 side-input refresh: emote extraction under streaming where the
      // dictionary is re-read every micro-batch, per-batch delta counts
      // merged additively (Q19). Must equal the batch a6 aggregation.
      (s: SparkSession, dir: String) => {
        val base = scratch("t2")
        graft.streaming.Streaming.runEmoteStats(
          s, dir, base + "/state", () => Tables.emoteDict(s, dir))
          .orderBy(col("channel"), col("emote"))
      },
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT channel, emote, count(*) AS occurrences FROM occ " +
        "GROUP BY 1, 2 ORDER BY channel, emote")),

    ("s5b_stream_user_stats",
      // A5 under Structured Streaming: the UserStatsAggregation branch of
      // the reference's five-way streaming job (EmoteAnalyser.java:80-151)
      // — update mode, replace-upsert into a (channel, day-bucket)
      // partitioned state table. Must equal the batch a5 aggregation.
      (s: SparkSession, dir: String) => {
        val base = scratch("s5b")
        graft.streaming.Streaming.runUserStats(s, dir, base + "/state", W)
          .orderBy(col("channel"), col("username"), col("ts"))
      },
      Some(s"SELECT * FROM ($usSql) ORDER BY channel, username, ts")),

    ("s5c_stream_user_emotes",
      // A7 under Structured Streaming with T2 side-input refresh: per-batch
      // (channel, emote, username) delta counts merged additively. Must
      // equal the batch a7 aggregation.
      (s: SparkSession, dir: String) => {
        val base = scratch("s5c")
        graft.streaming.Streaming.runUserEmoteStats(
          s, dir, base + "/state", () => Tables.emoteDict(s, dir))
          .orderBy(col("channel"), col("emote"), col("username"))
      },
      Some(s"WITH occ AS ($emoteOccSql) " +
        "SELECT channel, emote, username, count(*) AS occurrences FROM occ " +
        "GROUP BY 1, 2, 3 ORDER BY channel, emote, username")),

    ("s5d_stream_phrases",
      // A8 under Structured Streaming: per-batch phrase-match SUM deltas
      // merged additively, phrase table re-read per micro-batch. Must equal
      // the batch a8 aggregation.
      (s: SparkSession, dir: String) => {
        val base = scratch("s5d")
        graft.streaming.Streaming.runPhraseStats(
          s, dir, base + "/state", () => Tables.phrases)
          .orderBy(col("channel"), col("phrase_name"))
      },
      Some(
        """WITH m AS (
          | SELECT lang AS channel, 'p_the' AS phrase_name, len(regexp_extract_all(text, '(?i)the')) AS matches FROM documents
          | UNION ALL SELECT lang, 'p_scan', len(regexp_extract_all(text, '(?i)scan|merge')) FROM documents
          | UNION ALL SELECT lang, 'p_en_row', len(regexp_extract_all(text, '(?i)row')) FROM documents WHERE regexp_matches(lang, '(?i)en'))
          |SELECT channel, phrase_name, CAST(sum(matches) AS BIGINT) AS matches
          |FROM m WHERE matches > 0 GROUP BY 1, 2 ORDER BY channel, phrase_name"""
          .stripMargin.replace("\n", " "))),

    ("s7_stream_dedup",
      // Streaming exact dedup: dropDuplicates state emits each distinct
      // payload hash exactly once across all micro-batches; the streamed
      // distinct set must equal the batch DISTINCT.
      (s: SparkSession, dir: String) => {
        val base = scratch("s7")
        graft.streaming.Streaming.runStreamDedup(s, dir, base + "/dedup")
          .orderBy(col("content_hash"))
      },
      Some("SELECT DISTINCT md5(props) AS content_hash FROM events " +
        "ORDER BY content_hash")),

    ("s7b_stream_dedup_bounded",
      // Watermark-bounded streaming dedup: dropDuplicatesWithinWatermark
      // evicts a key's state once the watermark passes its event time +
      // horizon. Input restricted to one horizon (events before
      // 2024-01-08, 8-day bound) so every duplicate is in-bound and the
      // oracle is the exact DISTINCT over the slice.
      (s: SparkSession, dir: String) => {
        val base = scratch("s7b")
        graft.streaming.Streaming.runStreamDedupBounded(
          s, dir, base + "/dedup", 1704672000000L, "8 days")
          .orderBy(col("content_hash"))
      },
      Some("SELECT DISTINCT md5(props) AS content_hash FROM events " +
        "WHERE epoch_ms(ts) < 1704672000000 ORDER BY content_hash")),

    ("s12_stream_neardup",
      // Streaming NEAR-dup: documents replayed as three real micro-batches
      // (maxFilesPerTrigger=1), each LSH-joining only the persisted
      // signature index of earlier batches, pairs through the idempotent
      // AppendOnceSink. Union over batches ≡ the one-shot batch answer —
      // x2's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s12")
        graft.streaming.Streaming.runStreamNearDup(s, dir, base + "/nd")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(minHashOracleSql)),

    ("s40_stream_clusters",
      // Streaming incremental CLUSTER maintenance: x157's mergeComponents
      // fold under real micro-batches (maxFilesPerTrigger=1) — each
      // batch's incrementalNearDup emission merges into a versioned
      // labels snapshot (write-new-version + pointer flip; replay drains
      // via the pointer-as-marker). Final doc labeling ≡ the one-shot x25
      // rebuild by the split-equivalence law, so x25's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s40")
        graft.streaming.Streaming.runStreamIncrementalClusters(
            s, dir, base + "/ic")
          .orderBy(col("doc_id"))
      },
      Some(nearDupClustersOracleSql)),

    ("s13_stream_scd2",
      // Streaming SCD2 dimension maintenance: events replayed as three
      // time-sliced micro-batches (maxFilesPerTrigger=1), each folded into
      // a versioned history snapshot (write-new-version, flip pointer —
      // readers always pin one complete snapshot) via scd2Merge. Final
      // snapshot ≡ the one-shot j9 build by the split-equivalence
      // contract, so j9's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s13")
        graft.streaming.Streaming.runStreamScd2(s, dir, base + "/scd",
            Seq(T1, T2))
          .orderBy(col("user_id"), col("version"))
      },
      Some(scd2OracleSql)),

    ("s11_stream_join_attribution",
      // Stream-STREAM interval join: clicks joined to same-user purchases
      // within 24 h after the click, both sides watermarked so join state
      // is horizon-bounded. Inner join in append mode through the
      // idempotent append sink; oracle is the batch interval join.
      (s: SparkSession, dir: String) => {
        val base = scratch("s11")
        graft.streaming.Streaming.runClickAttribution(
          s, dir, base + "/attr", "24 hours")
          .orderBy(col("click_id"), col("purchase_id"))
      },
      Some("""SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        |epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
        |FROM events c JOIN events p ON p.user_id = c.user_id
        |WHERE c.event_type = 'click' AND p.event_type = 'purchase'
        |AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
        |ORDER BY click_id, purchase_id""".stripMargin.replace("\n", " "))),

    ("s11b_stream_join_outer",
      // LEFT OUTER stream-stream join: same attribution, but unconverted
      // clicks surface as purchase_id = -1 — emitted only once the global
      // watermark proves no purchase can still arrive. Clicks cut off at
      // 2024-01-27 (≥ 2 horizons before the replay's end) so every click's
      // outcome is watermark-decidable in the bounded replay; the oracle
      // applies the identical cutoff.
      (s: SparkSession, dir: String) => {
        val base = scratch("s11b")
        graft.streaming.Streaming.runClickAttribution(
          s, dir, base + "/attr", "24 hours", "left_outer",
          Some(1706313600000L))
          .orderBy(col("click_id"), col("purchase_id"))
      },
      Some("""SELECT c.user_id, c.event_id AS click_id,
        |coalesce(p.event_id, -1) AS purchase_id,
        |epoch_ms(c.ts) AS click_ms,
        |coalesce(epoch_ms(p.ts), -1) AS purchase_ms
        |FROM events c LEFT JOIN events p ON p.user_id = c.user_id
        |AND p.event_type = 'purchase'
        |AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 24 HOUR
        |WHERE c.event_type = 'click' AND epoch_ms(c.ts) < 1706313600000
        |ORDER BY click_id, purchase_id""".stripMargin.replace("\n", " "))),

    // =======================================================================
    // Training-data pipeline operators (north-star: dedup, similarity,
    // text analysis over documents/embeddings)
    // =======================================================================

    ("x1_exact_dedup",
      // Exact content dedup over the event payloads: identical `props`
      // payloads collapse to the minimum event_id. Single hash aggregation
      // on the content hash.
      (s: SparkSession, dir: String) =>
        Dedup.exactDedup(
          Tables.events(s, dir).select(col("event_id"), col("props")),
          "event_id", "props")
          .orderBy(col("content_hash")),
      Some("SELECT md5(props) AS content_hash, min(event_id) AS event_id, " +
        "count(*) AS n_copies FROM events GROUP BY 1 ORDER BY content_hash")),

    ("x2_near_dedup",
      // MinHash+LSH near-duplicate pairs over documents (3-gram shingles,
      // banded signatures, bucket-join candidates, exact-Jaccard verify at
      // 0.8). Never an all-pairs comparison.
      (s: SparkSession, dir: String) =>
        Dedup.minHashNearDup(Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
          .orderBy(col("id_a"), col("id_b")),
      Some(minHashOracleSql)),

    ("x25_neardup_clusters",
      // Pairs are half the dedup story: transitive near-dup CLUSTERS via
      // min-label-propagation connected components over the LSH pair graph
      // (a~b, b~c ⇒ {a,b,c} one cluster). Every doc labeled with its
      // cluster's min doc_id; keep=1 marks the canonical survivor. Oracle:
      // recursive-CTE transitive closure over the same pairs.
      (s: SparkSession, dir: String) =>
        Dedup.nearDupClusters(Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
          .orderBy(col("doc_id")),
      Some(nearDupClustersOracleSql)),

    ("x25b_neardup_clusters_star",
      // Same clusters through alternating large-star/small-star rounds —
      // round count bounded by O(log n), not component diameter: the CC
      // variant for long-chain graphs. Same oracle as x25 by construction.
      (s: SparkSession, dir: String) =>
        Dedup.nearDupClustersStar(Tables.documents(s, dir), "doc_id", "text",
          3, 0.8)
          .orderBy(col("doc_id")),
      Some(nearDupClustersOracleSql)),

    ("x42_cluster_keep_best",
      // Quality-aware survivor selection per near-dup cluster (the
      // FineWeb/SemDeDup keep policy): x25's clusters ranked by the x10
      // whitespace token count, longest member (id tie-break) survives —
      // diverges from min-id keep in 10 of the 23 sf0.01 clusters.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        Dedup.keepBestPerCluster(
            Dedup.nearDupClusters(docs, "doc_id", "text", 3, 0.8),
            "doc_id", "cluster_id",
            TextAnalysis.tokenCounts(docs).select(col("doc_id"),
              col("ws_tokens").cast("int").as("ws_tokens")),
            "ws_tokens")
          .orderBy(col("doc_id"))
      },
      Some(clusterKeepBestOracleSql)),

    ("x26_chunks",
      // Token-window chunking (16-token windows, 4-token overlap): the
      // training/RAG segmentation pre-pass. Narrow transform end to end —
      // tokenize, arithmetic chunk count, array slices, posexplode.
      (s: SparkSession, dir: String) =>
        TextAnalysis.chunk(Tables.documents(s, dir), "doc_id", "text", 16, 4)
          .orderBy(col("doc_id"), col("chunk_idx")),
      Some("""WITH toks AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |n AS (SELECT doc_id, t,
        |  greatest(1, CAST(ceil((len(t) - 4) / 12.0) AS BIGINT)) AS nc FROM toks),
        |c AS (SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS ci FROM n)
        |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
        |  CAST(len(list_slice(t, ci*12 + 1, ci*12 + 16)) AS INT) AS n_tokens,
        |  array_to_string(list_slice(t, ci*12 + 1, ci*12 + 16), ' ') AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin.replace("\n", " "))),

    ("x27_boilerplate",
      // Cross-document repeated-segment detection (C4-style boilerplate
      // pass): 6-token chunks occurring more than once, with the distinct
      // document count. One hash aggregate on the chunk hash.
      (s: SparkSession, dir: String) =>
        TextAnalysis.boilerplate(Tables.documents(s, dir), "doc_id", "text", 6)
          .orderBy(col("chunk_hash")),
      Some("""WITH toks AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |n AS (SELECT doc_id, t,
        |  greatest(1, CAST(ceil(len(t) / 6.0) AS BIGINT)) AS nc FROM toks),
        |c AS (SELECT doc_id, t, unnest(generate_series(0, nc - 1)) AS ci FROM n),
        |ch AS (SELECT doc_id,
        |  array_to_string(list_slice(t, ci*6 + 1, ci*6 + 6), ' ') AS chunk_text FROM c)
        |SELECT md5(chunk_text) AS chunk_hash,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
        |  CAST(count(*) AS BIGINT) AS n_occurrences
        |FROM ch GROUP BY 1 HAVING count(*) > 1
        |ORDER BY chunk_hash""".stripMargin.replace("\n", " "))),

    ("x3_cosine_topk",
      // Brute-force cosine top-10 against the vec_id=0 query vector
      // (broadcast); deterministic left-fold double arithmetic.
      (s: SparkSession, dir: String) =>
        Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          0L, 10, Seq("label")),
      Some("""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |s AS (SELECT vec_id, label,
        |  list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a,b) -> a+b) AS dt,
        |  sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
        |    i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a+b)) AS na,
        |  sqrt(list_reduce(list_transform(generate_series(1, len(qv)),
        |    i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a,b) -> a+b)) AS nq
        |  FROM embeddings, q WHERE vec_id <> 0)
        |SELECT vec_id, label, round(dt / (na * nq), 6) AS sim FROM s
        |ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin.replace("\n", " "))),

    ("x4_text_stats",
      // Corpus stats per language facet over documents.
      (s: SparkSession, dir: String) =>
        TextAnalysis.textStats(Tables.documents(s, dir))
          .orderBy(col("lang")),
      Some("SELECT lang, count(*) AS n_docs, " +
        "CAST(sum(ntok) AS BIGINT) AS n_tokens, round(avg(ntok), 4) AS avg_tokens, " +
        "CAST(sum(n_chars) AS BIGINT) AS n_chars, count(DISTINCT source) AS n_sources " +
        "FROM (SELECT lang, source, n_chars, " +
        "len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS ntok " +
        "FROM documents) GROUP BY 1 ORDER BY lang")),

    ("x5_simhash_pairs",
      // SimHash near-dup: 32-bit signatures, 8-bit band buckets, Hamming<=3.
      (s: SparkSession, dir: String) =>
        Dedup.simHashNearDup(Tables.documents(s, dir), "doc_id", "text", 3)
          .orderBy(col("id_a"), col("id_b")),
      Some(simHashOracleSql)),

    ("x6_ngram_jaccard",
      // Exact n-gram Jaccard via prefix-filtered inverted index (lossless
      // AllPairs-style pruning), threshold 0.8 — the deterministic
      // complement of x2; oracle is the unpruned ground truth.
      (s: SparkSession, dir: String) =>
        Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
          .orderBy(col("id_a"), col("id_b")),
      Some(ngramJaccardOracleSql)),

    ("x73_lsh_eval",
      // LSH-recall evaluation: x2's banded MinHash pairs measured against
      // x6's exact n-gram-Jaccard ground truth (same shingles, same 0.8
      // threshold) — the number you read before tuning bands/rows.
      // Precision pins 1.0 because x2 exact-verifies its candidates; any
      // recall below 1.0 is banding misses, quantified. Both inputs are
      // output-scale pair frames; no corpus data moves in the eval.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        Dedup.pairSetEval(
          Dedup.minHashNearDup(docs, "doc_id", "text", 3, 0.8),
          Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8),
          "id_a", "id_b")
      },
      Some(s"""WITH $minHashPairsCtes,
        |a AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
        |ei AS (SELECT x.doc_id AS ia, y.doc_id AS ib, count(*) AS i
        |FROM shd x JOIN shd y ON x.s = y.s AND x.doc_id < y.doc_id
        |GROUP BY 1, 2),
        |e AS (SELECT ia AS id_a, ib AS id_b FROM ei
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.8),
        |h AS (SELECT * FROM a INTERSECT SELECT * FROM e),
        |c AS (SELECT (SELECT count(*) FROM e) AS n_exact,
        |(SELECT count(*) FROM a) AS n_approx,
        |(SELECT count(*) FROM h) AS n_hit)
        |SELECT CAST(n_exact AS BIGINT) AS n_exact,
        |CAST(n_approx AS BIGINT) AS n_approx,
        |CAST(n_hit AS BIGINT) AS n_hit,
        |round(CASE WHEN n_approx = 0 THEN 1.0
        |ELSE CAST(n_hit AS DOUBLE) / n_approx END, 4) AS precision,
        |round(CASE WHEN n_exact = 0 THEN 1.0
        |ELSE CAST(n_hit AS DOUBLE) / n_exact END, 4) AS recall
        |FROM c""".stripMargin.replace("\n", " "))),

    ("x41_overlap_dedup",
      // Overlap-coefficient (containment) near-dup — doc-IN-doc detection,
      // the duplication mode Jaccard misses (subset copy ⇒ overlap 1.0,
      // jaccard → 0). Engine side prunes candidates with the smaller-side
      // prefix filter (prefix ⋈ full); oracle is unpruned ground truth.
      (s: SparkSession, dir: String) =>
        Dedup.overlapPairs(Tables.documents(s, dir), "doc_id", "text", 3, 0.8)
          .orderBy(col("id_a"), col("id_b")),
      Some(overlapOracleSql)),

    ("x7_ann_ivf",
      // IVF-bucketed approximate top-k: 16 coarse centroids, probe 4.
      (s: SparkSession, dir: String) =>
        Similarity.ivfTopK(Tables.embeddings(s, dir), "vec_id", "embedding",
          0L, 10, 16, 4),
      Some(ivfOracleSql)),

    ("x7b_ann_ivf_index",
      // The materialized-index form of x7: centroid assignment persisted
      // partitioned by centroid_id, probe via literal partition pruning
      // (PartitionFilters on the scan — spec-pinned). Same oracle as x7.
      (s: SparkSession, dir: String) => {
        val idx = scratch("x7b")
        Similarity.ivfIndexTopK(Tables.embeddings(s, dir), "vec_id",
          "embedding", 0L, 10, 16, 4, idx + "/index")
      },
      Some(ivfOracleSql)),

    ("x144_ivf_append",
      // Incremental IVF maintenance (Similarity.appendToIvfIndex — the
      // r8-named last gap in the incremental family): the index builds on
      // a base slice, the remainder lands as an append-only batch
      // assigned with the FROZEN signature centroids (only touched
      // partitions receive files), and a duplicate re-ingest anti-joins
      // away against partition-pruned existing ids. The probe then
      // answers over the maintained layout — same semantics and oracle
      // as x7/x7b, pinning probe-equivalence with a full build (base
      // holds vec_id < 250 ⊇ the first 16 ids, so the full-corpus
      // centroid set IS the frozen one).
      (s: SparkSession, dir: String) => {
        val emb = Tables.embeddings(s, dir)
        val idx = scratch("x144") + "/index"
        Similarity.buildIvfIndex(emb.filter(col("vec_id") < 250), "vec_id",
          "embedding", 16, idx)
        val batch = emb.filter(col("vec_id") >= 250)
        Similarity.appendToIvfIndex(batch, "vec_id", "embedding", idx)
        // Idempotent re-ingest: second append must be a no-op.
        Similarity.appendToIvfIndex(batch, "vec_id", "embedding", idx)
        Similarity.ivfIndexTopK(emb, "vec_id", "embedding", 0L, 10, 16, 4,
          idx)
      },
      Some(ivfOracleSql)),

    ("s34_stream_ivf_append",
      // STREAMING IVF maintenance (streaming/Streaming.runStreamIvfAppend):
      // x144's append-only discipline under real micro-batches
      // (maxFilesPerTrigger=1) — base index built one-shot on vec_id < 250
      // with the quantizer frozen in the sidecar, the remainder replayed
      // as three batches each appended via appendToIvfIndex behind a
      // committed-batch marker (replayed batches drain and skip; the
      // residual crash window re-runs into the existing-id anti-join —
      // spec-pinned). Probe over the maintained index ≡ the one-shot
      // build, so x7's oracle verifies the whole maintenance path.
      (s: SparkSession, dir: String) => {
        val base = scratch("s34")
        graft.streaming.Streaming.runStreamIvfAppend(s, dir, base)
      },
      Some(ivfOracleSql)),

    ("x146_pq_append",
      // Incremental PQ re-encode (Similarity.buildPqCodeTable /
      // appendToPqCodeTable / pqAdcTopKOverTable — the r9 verdict's named
      // gap): codebooks train ONCE on the base slice (vec_id < 250) and
      // freeze in the _codebooks sidecar; the remainder encodes against
      // them and appends into the code_0-partitioned layout (only touched
      // cells receive files, existing-id scan partition-pruned); a
      // duplicate re-ingest anti-joins away. ADC top-k then searches the
      // MAINTAINED table — the oracle unrolls the same base-trained Lloyd
      // trajectory and encodes the full table against it.
      (s: SparkSession, dir: String) => {
        val emb = Tables.embeddings(s, dir)
        val tbl = scratch("x146") + "/codes"
        Similarity.buildPqCodeTable(emb.filter(col("vec_id") < 250),
          "vec_id", "embedding", 2, 4, 2, tbl)
        val batch = emb.filter(col("vec_id") >= 250)
        Similarity.appendToPqCodeTable(batch, "vec_id", "embedding", tbl)
        // Idempotent re-ingest: second append must be a no-op.
        Similarity.appendToPqCodeTable(batch, "vec_id", "embedding", tbl)
        Similarity.pqAdcTopKOverTable(emb, "vec_id", "embedding", 3L, 12, tbl)
      },
      Some(pqAppendAdcOracleSql(3L, 12))),

    ("s35_stream_pq_append",
      // STREAMING PQ code-table maintenance (Streaming.runStreamPqAppend):
      // x146's frozen-codebook append under real micro-batches — the s34
      // replay/crash discipline applied to the compressed-corpus layout;
      // base built one-shot on vec_id < 250, remainder appended per batch
      // behind the committed-batch marker. ADC over the maintained table
      // ≡ the one-shot answer — x146's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s35")
        graft.streaming.Streaming.runStreamPqAppend(s, dir, base)
      },
      Some(pqAppendAdcOracleSql(3L, 12))),

    ("s36_stream_kmeans",
      // STREAMING mini-batch k-means (Streaming.runStreamKmeansUpdate):
      // x145's quantizer maintenance always-on — state is the (centroid,
      // population) table persisted as versioned files, each micro-batch
      // assigns against the CURRENT centroids and folds in by the
      // count-weighted merge. Path-dependent (unlike the additive
      // monitors), so the oracle unrolls the same three ordered batch
      // merges; replay drains via the marker, a pre-marker crash re-runs
      // from the same predecessor state into the same versioned file.
      (s: SparkSession, dir: String) => {
        val base = scratch("s36")
        graft.streaming.Streaming.runStreamKmeansUpdate(s, dir, base)
      },
      Some(kMeansStreamOracleSql)),

    ("x145_kmeans_update",
      // Mini-batch k-means centroid maintenance (Similarity.kMeansUpdate,
      // Sculley 2010): the quantizer-side member of the incremental
      // family — x144 appends vectors into the IVF layout, this keeps the
      // TRAINED quantizer current. Base-trained centroids (vec_id < 250,
      // x69's fixed-point discipline) merge the batch by the
      // count-weighted mean c' = (n·c + m·b)/(n+m); untouched clusters
      // stay bit-identical; summary scalars fold pos-ordered.
      (s: SparkSession, dir: String) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.kMeansUpdate(emb.filter(col("vec_id") < 250),
            emb.filter(col("vec_id") >= 250), "vec_id", "embedding", 8, 3)
          .orderBy(col("cluster_id"))
      },
      Some(kMeansUpdateOracleSql)),

    ("j54_skew_diagnostics",
      // Join-key skew pre-flight over the events user key
      // (Maintenance.skewDiagnostics): counts-of-counts distribution,
      // discrete p50/p99 key sizes, key entropy, heaviest-key share, and
      // the exact-integer salt factor j7's salted join takes as input.
      // The quantile/entropy folds run over the pos-sorted
      // counts-of-counts ARRAY — array-local ordered arithmetic, no
      // single-partition window, no collect.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.skewDiagnostics(
          Tables.events(s, dir), "user_id"),
      Some("""WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS c
        |FROM events GROUP BY 1),
        |d AS MATERIALIZED (SELECT c, CAST(count(*) AS BIGINT) AS k
        |FROM c GROUP BY 1),
        |s AS (SELECT CAST(sum(k) AS BIGINT) AS n_keys,
        |CAST(sum(c * k) AS BIGINT) AS n_rows,
        |CAST(max(c) AS BIGINT) AS max_count FROM d),
        |l AS (SELECT list(c ORDER BY c) AS cl, list(k ORDER BY c) AS kl
        |FROM d),
        |cum AS (SELECT c, sum(k) OVER (ORDER BY c) AS ck FROM d),
        |q AS (SELECT
        |(SELECT min(c) FROM cum, s
        |WHERE ck >= CAST(ceil(0.5 * n_keys) AS BIGINT)) AS p50,
        |(SELECT min(c) FROM cum, s
        |WHERE ck >= CAST(ceil(0.99 * n_keys) AS BIGINT)) AS p99),
        |e AS (SELECT round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |list_transform(generate_series(1, len(cl)),
        |i -> -(CAST(kl[i] AS DOUBLE) * (CAST(cl[i] AS DOUBLE) / n_rows) *
        |ln(CAST(cl[i] AS DOUBLE) / n_rows)))), (x, y) -> x + y), 6)
        |AS entropy_nats FROM l, s)
        |SELECT n_keys, n_rows, max_count,
        |round(CAST(max_count AS DOUBLE) / n_rows, 6) AS top1_share,
        |CAST(p50 AS BIGINT) AS p50_count, CAST(p99 AS BIGINT) AS p99_count,
        |entropy_nats,
        |CAST((max_count * n_keys + n_rows - 1) // n_rows AS BIGINT)
        |AS recommended_salt
        |FROM s, q, e""".stripMargin.replace("\n", " "))),

    ("j55_top_paths",
      // Top-20 user journey paths over the events stream (Funnel.topPaths,
      // depth 5): the Sankey read — j15's transition matrix loses order
      // beyond one hop, q24's funnel presumes the steps; this discovers
      // the dominant first-5-event sequences. Per-user first-k cut via
      // window row_number (bounded agg buffers), (ts, event_id)
      // tie-broken so both engines build identical paths.
      (s: SparkSession, dir: String) =>
        graft.operators.Funnel.topPaths(Tables.events(s, dir),
          "user_id", "event_type", "ts", "event_id", 5, 20),
      Some("""WITH r AS (SELECT user_id, event_type,
        |row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |AS rn FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        |AS path FROM r WHERE rn <= 5 GROUP BY 1)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM p
        |GROUP BY 1 ORDER BY n_users DESC, path
        |LIMIT 20""".stripMargin.replace("\n", " "))),

    ("x40_knn_join",
      // Batch kNN JOIN: top-10 cosine neighbors for EVERY query vector
      // (vec_id % 50 = 0) at once through the shared IVF probe —
      // Similarity.knnJoin; corpus assignment is one codegen projection,
      // the query side broadcasts, the corpus never shuffles.
      (s: SparkSession, dir: String) =>
        Similarity.knnJoin(Tables.embeddings(s, dir), "vec_id", "embedding",
          col("vec_id") % 50 === 0, 10, 16, 4)
          .orderBy(col("qid"), col("knn_rank")),
      Some(knnJoinOracleSql)),

    ("x148_pq_adc_join",
      // Batched ADC search (Similarity.pqAdcJoin): x118's single-query
      // ADC lifted to EVERY query at once — per-query LUTs computed
      // in-engine against the codebook literals, broadcast slim query
      // frame, one scan of the encoded corpus summing m lookups per
      // (row, query), per-query rank window on the rounded ADC.
      (s: SparkSession, dir: String) =>
        Similarity.pqAdcJoin(Tables.embeddings(s, dir), "vec_id",
          "embedding", col("vec_id") % 50 === 0, 2, 4, 2, 8)
          .orderBy(col("qid"), col("adc_rank")),
      Some(pqAdcJoinOracleSql(8))),

    ("x150_adc_refine",
      // ADC-then-refine (Similarity.pqAdcRefine): the standard IVF-PQ
      // serving shape — x148's batched ADC cut at candK=32 per query,
      // candidates re-scored EXACTLY against the raw vectors (one
      // broadcast pass, output-scale candidate frame), exact-L2 top-8
      // with both ranks emitted so quantization reordering is legible.
      (s: SparkSession, dir: String) =>
        Similarity.pqAdcRefine(Tables.embeddings(s, dir), "vec_id",
          "embedding", col("vec_id") % 50 === 0, 2, 4, 2, 32, 8)
          .orderBy(col("qid"), col("refine_rank")),
      Some(pqAdcRefineOracleSql(32, 8))),

    ("x156_refine_recall",
      // Refine-budget recall curve (Similarity.pqRefineRecallCurve,
      // candK 8/32/128, k=10): x147's frontier read on the COMPRESSED
      // leg — the ADC scan may be wrong about order (x150's refine
      // fixes that) but a true neighbor outside the top-candK is LOST;
      // this prices that risk per budget. One checkpointed exact-L2
      // reference reused by every level; recall = exact-integer hits
      // over n_queries*k.
      (s: SparkSession, dir: String) =>
        Similarity.pqRefineRecallCurve(Tables.embeddings(s, dir),
          "vec_id", "embedding", col("vec_id") % 50 === 0, 2, 4, 2,
          Seq(8, 32, 128), 10)
          .orderBy(col("cand_k")),
      Some(pqRefineRecallOracleSql(Seq(8, 32, 128), 10))),

    ("x147_ivf_recall",
      // IVF probe-budget tuning curve (Similarity.ivfRecallCurve):
      // recall@10 of the IVF self-kNN at nProbe 1/2/4/8 vs the exact
      // (probe-all) self-kNN, with the scan fraction each budget costs —
      // the frontier nProbe is chosen on (x141 audits balance, this
      // measures what the budget buys). One checkpointed exact reference;
      // one knnJoin per level over the shared assignment.
      (s: SparkSession, dir: String) =>
        Similarity.ivfRecallCurve(Tables.embeddings(s, dir), "vec_id",
          "embedding", col("vec_id") % 50 === 0, 10, 16, Seq(1, 2, 4, 8))
          .orderBy(col("n_probe")),
      Some(ivfRecallOracleSql)),

    ("x8_lang_id",
      // Marker-token language ID (argmax score, ties to smallest code).
      (s: SparkSession, dir: String) =>
        TextAnalysis.langId(Tables.documents(s, dir)).orderBy(col("doc_id")),
      Some(langIdOracleSql)),

    ("x9_quality_score",
      // Cheap pre-training quality filters: token/char counts, punctuation,
      // uppercase and stopword ratios.
      (s: SparkSession, dir: String) =>
        TextAnalysis.qualityScore(Tables.documents(s, dir), Seq("the", "a"))
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS INT) AS n_tokens,
        |CAST(length(text) AS INT) AS len_chars,
        |round(CAST(len(regexp_extract_all(text, '[\.,;:!?]')) AS DOUBLE) / greatest(length(text), 1), 4) AS punct_ratio,
        |round(CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) / greatest(length(text), 1), 4) AS upper_ratio,
        |round(CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t IN ('the', 'a'))) AS DOUBLE) /
        |  greatest(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')), 1), 4) AS stopword_ratio
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x10_token_count",
      // Whitespace tokens + BPE-ish pre-tokenizer regex token count.
      (s: SparkSession, dir: String) =>
        TextAnalysis.tokenCounts(Tables.documents(s, dir)).orderBy(col("doc_id")),
      Some("""SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS INT) AS ws_tokens,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS INT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x11_fingerprint",
      // Winnowing-lite fingerprint: min 32-bit hash over char 8-grams.
      (s: SparkSession, dir: String) =>
        TextAnalysis.fingerprints(Tables.documents(s, dir), 8).orderBy(col("doc_id")),
      Some("""WITH g AS (SELECT doc_id, unnest(CASE WHEN length(text) >= 8 THEN
        |list_transform(generate_series(1, length(text) - 7), i -> substr(text, i, 8))
        |ELSE [text] END) AS g FROM documents)
        |SELECT doc_id, min(('0x' || substr(md5(g), 1, 8))::BIGINT) AS fingerprint,
        |count(DISTINCT g) AS n_grams FROM g GROUP BY 1 ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    ("x12_embed_neardup",
      // Embedding-cosine near-dup: sign-LSH banding (8 bands × 8 bits over
      // the 64-dim vectors) + exact-cosine verify at 0.35, both engines
      // rounding to 6 dp before the cut.
      (s: SparkSession, dir: String) =>
        Dedup.embeddingNearDup(Tables.embeddings(s, dir), "vec_id", "embedding",
          8, 8, 0.35)
          .orderBy(col("id_a"), col("id_b")),
      Some(embedNearDupOracleSql)),

    ("x29_semantic_dedup",
      // SemDeDup-style semantic cluster assignment: the x12 embedding pair
      // graph closed transitively (connected components), every vector
      // labeled with its semantic cluster's min vec_id, keep=1 on the
      // canonical representative — the row set a semantic-dedup pass
      // retains. Oracle: recursive-CTE closure over the same pairs.
      (s: SparkSession, dir: String) =>
        Dedup.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
          8, 8, 0.35)
          .orderBy(col("vec_id")),
      Some(semanticDedupOracleSql)),

    ("x31_quantize_int8",
      // Symmetric per-vector int8 quantization of the embedding store:
      // exact integer checksums of the quantized vector plus the
      // reconstruction MSE (scaled 1e6, 4 dp). One narrow projection.
      (s: SparkSession, dir: String) =>
        graft.operators.Similarity.quantizeInt8(
          Tables.embeddings(s, dir), "vec_id", "embedding")
          .orderBy(col("vec_id")),
      Some(quantizeOracleSql)),

    ("x13_split",
      // Deterministic train/val/test assignment: pure per-row hash
      // projection, reproducible across engines/runs/partitionings
      // (operators/Sampling.scala).
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.split(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", "split", 80, 10)
          .orderBy(col("doc_id")),
      Some("""WITH b AS (SELECT doc_id,
        |('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        |FROM documents)
        |SELECT doc_id, bucket, CASE WHEN bucket < 80 THEN 'train'
        |WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x14_sample",
      // Deterministic 10% sample — same hash family, different salt, so
      // sampling is independent of the split assignment.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.sample(
          Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          "doc_id", "sample", 10)
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, n_chars FROM documents
        |WHERE ('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x28_stratified_sample",
      // Mixture-shaping stratified sample: per-language keep percentages
      // (downsample dominant en, keep more of the rest) as ONE codegen'd
      // filter — literal pct map, no join, no shuffle.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.stratifiedSample(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          "lang", "doc_id", "strat",
          Map("en" -> 25, "de" -> 80, "zh" -> 60), 50)
          .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang FROM documents
        |WHERE ('0x' || substr(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
        |  CASE lang WHEN 'en' THEN 25 WHEN 'de' THEN 80 WHEN 'zh' THEN 60 ELSE 50 END
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x32_kmv_distinct",
      // Approximate distinct users per event type via the mergeable
      // bottom-k (KMV) sketch aggregate: the shuffle carries k-long
      // sketches, never the distinct value set — and the md5 hash family
      // makes the estimate engine-exact, so the oracle hash-matches.
      (s: SparkSession, dir: String) =>
        graft.operators.Sketch.kmvDistinct(
          Tables.events(s, dir).select(col("event_type"), col("user_id")),
          Seq("event_type"), "user_id", 64)
          .orderBy(col("event_type")),
      Some("""WITH d AS (SELECT DISTINCT event_type,
        |('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |FROM events),
        |r AS (SELECT event_type, h,
        |row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM d),
        |t AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |max(h) AS kth_min FROM r WHERE rn <= 64 GROUP BY 1)
        |SELECT event_type, n_kept, kth_min,
        |CASE WHEN n_kept < 64 THEN n_kept ELSE 270582939648 // kth_min END AS n_est
        |FROM t ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("x30_shard_layout",
      // Deterministic global shuffle + training-shard layout: shard =
      // hash(salt:id) mod 8, pos = the row's 0-based rank within its shard
      // in (hash, id) order — a reproducible pseudo-random corpus order
      // with ONE shuffle and per-shard windows, no global sort.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.shardLayout(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", "shard", 8)
          .orderBy(col("doc_id")),
      Some("""WITH h AS (SELECT doc_id,
        |('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM documents)
        |SELECT doc_id, CAST(hv % 8 AS INT) AS shard,
        |row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) - 1 AS pos
        |FROM h ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x15_tfidf",
      // TF-IDF top-3 terms per doc: two hash aggs (tf, df) + broadcast N +
      // per-doc window top-k (operators/TextAnalysis.scala tfIdf).
      (s: SparkSession, dir: String) =>
        TextAnalysis.tfIdf(Tables.documents(s, dir), 3)
          .orderBy(col("doc_id"), col("term")),
      Some("""WITH toks AS (SELECT doc_id,
        |unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n FROM documents),
        |sc AS (SELECT doc_id, term, tf, df,
        |  round(tf * ln(CAST(n AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN df USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn FROM sc)
        |SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 3
        |ORDER BY doc_id, term""".stripMargin.replace("\n", " "))),

    ("x16_repetition",
      // Within-doc repetition ratio (Gopher/C4-style boilerplate filter):
      // 1 - distinct/total word 2-grams, array-local (no explode/shuffle).
      (s: SparkSession, dir: String) =>
        TextAnalysis.repetitionRatio(Tables.documents(s, dir), 2)
          .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])
        |ELSE [] END AS g FROM toks)
        |SELECT doc_id, CAST(len(g) AS INT) AS n_grams,
        |CAST(len(list_distinct(g)) AS INT) AS n_distinct,
        |CASE WHEN len(g) = 0 THEN 0.0 ELSE
        |round(1.0 - CAST(len(list_distinct(g)) AS DOUBLE) / len(g), 4) END AS rep_ratio
        |FROM g ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x17_top_ngrams",
      // Corpus-level top-20 word 2-grams: one explode + one map-side-
      // combined hash agg + TakeOrderedAndProject.
      (s: SparkSession, dir: String) =>
        TextAnalysis.topNgrams(Tables.documents(s, dir), 2, 20),
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |g AS (SELECT unnest(CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t)-1), i -> t[i] || ' ' || t[i+1])
        |ELSE [] END) AS ngram FROM toks)
        |SELECT ngram, count(*) AS occurrences FROM g GROUP BY 1
        |ORDER BY occurrences DESC, ngram LIMIT 20"""
        .stripMargin.replace("\n", " "))),

    ("x18_decontaminate",
      // Benchmark decontamination: distinct 3-gram overlap of each corpus
      // doc against a (deterministic 10%) benchmark set — broadcast
      // left-semi on the gram, corpus never shuffles on the gram key.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        val bench = graft.operators.Sampling.sample(docs, "doc_id", "bench", 10)
        val corpus = docs.filter(
          graft.operators.Sampling.hashBucket(col("doc_id"), "bench", 100) >= 10)
        Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH h AS (SELECT doc_id, text,
        |('0x' || substr(md5('bench:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |FROM documents),
        |ct AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM h WHERE b >= 10),
        |bt AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM h WHERE b < 10),
        |cg AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS s FROM ct),
        |bg AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS s FROM bt),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
        |ovl AS (SELECT doc_id, count(*) AS n_overlap FROM cg
        |WHERE s IN (SELECT s FROM bg) GROUP BY 1)
        |SELECT tot.doc_id, n_grams, COALESCE(n_overlap, 0) AS n_overlap,
        |round(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_grams, 4) AS contamination
        |FROM tot LEFT JOIN ovl USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    ("x43_bloom_decontaminate",
      // Bloom-prefiltered decontamination: x18's check for when the
      // benchmark gram set outgrows a per-gram broadcast — bench grams
      // compact into a 2^16-bit Bloom bitset (8 KiB driver metadata)
      // tested array-locally; only Bloom-positive grams explode into the
      // exact verify join (no false negatives ⇒ exact result). Bench =
      // the src0 slice, corpus = every other source; oracle is the
      // bloom-free ground truth.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        Dedup.bloomDecontaminate(docs.filter(col("source") =!= "src0"),
            docs.filter(col("source") === "src0"), "doc_id", "text", 3)
          .orderBy(col("doc_id"))
      },
      Some("""WITH ct AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents WHERE source <> 'src0'),
        |bt AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents WHERE source = 'src0'),
        |cg AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS s FROM ct),
        |bg AS (SELECT DISTINCT unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS s FROM bt),
        |tot AS (SELECT doc_id, count(*) AS n_grams FROM cg GROUP BY 1),
        |ovl AS (SELECT doc_id, count(*) AS n_overlap FROM cg
        |WHERE s IN (SELECT s FROM bg) GROUP BY 1)
        |SELECT tot.doc_id, n_grams, COALESCE(n_overlap, 0) AS n_overlap,
        |round(CAST(COALESCE(n_overlap, 0) AS DOUBLE) / n_grams, 4) AS contamination
        |FROM tot LEFT JOIN ovl USING (doc_id) ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    ("x44_cms_heavy_hitters",
      // Exact heavy-hitter 3-grams (count >= 5) through a count-min
      // pre-filter: the full gram stream folds into one 4x16384 sketch
      // (shuffle carries matrices, not values), candidates are an
      // array-local estimate test against the literal matrix, and only
      // candidate rows reach the exact count. CMS never underestimates,
      // so the verified result is exact — the oracle is the naive
      // ground-truth GROUP BY.
      (s: SparkSession, dir: String) =>
        graft.operators.Sketch.cmsHeavyHitters(
            TextAnalysis.corpusGrams(Tables.documents(s, dir), 3)
              .withColumnRenamed("ngram", "gram"),
            "gram", 5L)
          .orderBy(desc("n"), col("gram")),
      Some("""WITH toks AS (SELECT
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |g AS (SELECT unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS gram FROM toks)
        |SELECT gram, CAST(count(*) AS BIGINT) AS n FROM g
        |GROUP BY 1 HAVING count(*) >= 5 ORDER BY n DESC, gram"""
        .stripMargin.replace("\n", " "))),

    ("x19_cap_per_group",
      // Stratified cap: at most 50 docs per language stratum, picked by
      // deterministic hash order — corpus rebalancing (one shuffle +
      // windowed row_number, no global window).
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.capPerGroup(
          Tables.documents(s, dir).select(col("doc_id"), col("lang")),
          Seq("lang"), "doc_id", "cap", 50)
          .orderBy(col("doc_id")),
      Some("""WITH h AS (SELECT doc_id, lang,
        |('0x' || substr(md5('cap:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM documents),
        |r AS (SELECT doc_id, lang,
        |row_number() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn FROM h)
        |SELECT doc_id, lang FROM r WHERE rn <= 50 ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    ("x20_norm_dedup",
      // Exact dedup on NORMALIZED text (lowercase, trim, collapsed
      // whitespace): catches trivially-reformatted copies; same
      // one-shuffle hash-agg shape as x1.
      (s: SparkSession, dir: String) =>
        Dedup.normalizedDedup(Tables.documents(s, dir), "doc_id", "text")
          .orderBy(col("content_hash")),
      Some("SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) " +
        "AS content_hash, min(doc_id) AS doc_id, count(*) AS n_copies " +
        "FROM documents GROUP BY 1 ORDER BY content_hash")),

    ("x39_weighted_sample",
      // Deterministic weighted sample without replacement: 10 docs per
      // language, length-weighted (Efraimidis–Spirakis exponential keys
      // over the salted md5 uniform — Sampling.weightedSamplePerGroup).
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.weightedSamplePerGroup(
          Tables.documents(s, dir).select(col("lang"), col("doc_id"), col("n_chars")),
          "lang", "doc_id", "n_chars", "wsamp", 10)
          .orderBy(col("lang"), col("smp_rank")),
      Some("""WITH t AS (SELECT lang, doc_id, n_chars,
        |round(pow((('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT + 0.5)
        |    / 4294967296.0,
        |    1.0 / greatest(CAST(n_chars AS DOUBLE), 1.0)), 12) AS k
        |FROM documents),
        |r AS (SELECT lang, doc_id, n_chars,
        |CAST(row_number() OVER (PARTITION BY lang ORDER BY k DESC, doc_id) AS INT) AS smp_rank
        |FROM t)
        |SELECT lang, doc_id, n_chars, smp_rank FROM r WHERE smp_rank <= 10
        |ORDER BY lang, smp_rank""".stripMargin.replace("\n", " "))),

    ("x38_incremental_neardup",
      // Incremental NEAR-dup ingest: the corpus flows through in three
      // disjoint doc_id batches, each batch LSH-joining only the persisted
      // signature index of the batches before it (Dedup.incrementalNearDup)
      // and then appending its own signatures. The union of per-batch pair
      // emissions must equal the one-shot batch answer — the oracle is
      // x2's, verbatim.
      (s: SparkSession, dir: String) => {
        val idx = scratch("x38")
        val docs = Tables.documents(s, dir)
        (0 until 3).map(b =>
            Dedup.incrementalNearDup(docs.where(col("doc_id") % 3 === b),
              "doc_id", "text", 3, 0.8, idx + "/index"))
          .reduce(_ unionByName _)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(minHashOracleSql)),

    ("x157_incremental_clusters",
      // Incremental near-dup CLUSTER maintenance (Dedup.mergeComponents):
      // x38 maintains the pair stream incrementally but x25's labels
      // rebuilt from scratch per refresh — this folds each batch's
      // incrementalNearDup emission into the standing labeling via
      // merge-then-relabel (contract endpoints to existing labels, CC on
      // the batch-sized contracted graph, one broadcast relabel join —
      // the standing labels never shuffle). Equivalence to the one-shot
      // rebuild is scalacheck-pinned; oracle = x25's recursive closure.
      (s: SparkSession, dir: String) => {
        val idx = scratch("x157")
        val docs = Tables.documents(s, dir)
        val empty = docs
          .select(col("doc_id").as("node"), col("doc_id").as("label"))
          .limit(0)
        val labels = (0 until 3).foldLeft(empty) { (lab, b) =>
          Dedup.mergeComponents(lab,
              Dedup.incrementalNearDup(docs.where(col("doc_id") % 3 === b),
                "doc_id", "text", 3, 0.8, idx + "/index"),
              "id_a", "id_b")
            .localCheckpoint(eager = true)
        }
        Dedup.labelClusters(docs, labels, "doc_id").orderBy(col("doc_id"))
      },
      Some(nearDupClustersOracleSql)),

    ("x33_incremental_dedup",
      // Incremental ingest dedup: a deterministic 10% hash slice of the
      // documents table plays the "new batch", the rest the existing
      // corpus; the batch anti-joins the corpus's distinct normalized-hash
      // index, then collapses its own internal dups. Corpus-internal
      // duplicates are untouched by construction.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        val b = graft.operators.Sampling.hashBucket(col("doc_id"), "inc", 100)
        Dedup.incrementalDedup(
          docs.filter(b < 10), docs.filter(b >= 10), "doc_id", "text")
          .orderBy(col("content_hash"))
      },
      Some("""WITH k AS (SELECT doc_id,
        |md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
        |('0x' || substr(md5('inc:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |FROM documents)
        |SELECT content_hash, min(doc_id) AS doc_id, count(*) AS n_copies
        |FROM k WHERE b < 10 AND content_hash NOT IN
        |(SELECT content_hash FROM k WHERE b >= 10)
        |GROUP BY 1 ORDER BY content_hash""".stripMargin.replace("\n", " "))),

    ("x34_compaction",
      // Small-file compaction: a deliberately fragmented partitioned copy
      // of events (16 files per leaf) rewritten to ONE file per leaf by
      // Maintenance.compactPartitioned; the query pins both invariants —
      // data identical (row counts per partition) and layout fixed
      // (n_files = 1, counted via input_file_name).
      (s: SparkSession, dir: String) => {
        val base = scratch("x34")
        Tables.events(s, dir)
          .select(col("event_id"), col("event_type"), col("user_id"))
          .repartition(16)
          .write.partitionBy("event_type").mode("overwrite")
          .parquet(base + "/t")
        graft.operators.Maintenance.compactPartitioned(
          s, base + "/t", Seq("event_type"))
        s.read.parquet(base + "/t")
          .select(col("event_type"), input_file_name().as("_f"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("_f")).cast("int").as("n_files"))
          .orderBy(col("event_type"))
      },
      Some("SELECT event_type, count(*) AS n_rows, 1 AS n_files " +
        "FROM events GROUP BY 1 ORDER BY event_type")),

    ("x35_zorder",
      // Z-order (Morton) clustering key over (user_id mod 256, day mod
      // 256): one codegen'd bit-interleave projection; the layout benefit
      // (narrow per-file min/max in BOTH dims) is spec-pinned in
      // ZOrderSpec, the arithmetic itself oracle-checked here.
      (s: SparkSession, dir: String) =>
        Tables.events(s, dir)
          .select(col("event_id"),
            expr("user_id % 256").as("d1"),
            expr("(unix_millis(ts) div 86400000) % 256").as("d2"))
          .withColumn("zval", graft.operators.ZOrder.zValue(
            Seq(col("d1"), col("d2")), 8))
          .orderBy(col("event_id")),
      Some(zOrderOracleSql)),

    ("x21_pii_scrub",
      // PII redaction pass: count + replace emails/phones/IPs with typed
      // placeholders; pure projection, scrubbed text verified via md5.
      (s: SparkSession, dir: String) =>
        TextAnalysis.piiScrub(Tables.documents(s, dir)).orderBy(col("doc_id")),
      Some {
        val Seq(em, ph, ip) = TextAnalysis.piiPatterns.map(_._2)
        val scrub = s"regexp_replace(regexp_replace(regexp_replace(text, " +
          s"'$em', '<EMAIL>', 'g'), '$ph', '<PHONE>', 'g'), '$ip', '<IP>', 'g')"
        s"SELECT doc_id, " +
          s"CAST(len(regexp_extract_all(text, '$em')) AS INT) AS n_email, " +
          s"CAST(len(regexp_extract_all(text, '$ph')) AS INT) AS n_phone, " +
          s"CAST(len(regexp_extract_all(text, '$ip')) AS INT) AS n_ip, " +
          s"md5($scrub) AS scrubbed_hash FROM documents ORDER BY doc_id"
      }),

    ("x22_pack_sequences",
      // Deterministic sequence packing: per-language shards, docs in
      // salted-hash order, exclusive prefix token sum div 512-token budget.
      (s: SparkSession, dir: String) => {
        val withTok = Tables.documents(s, dir).select(
          col("doc_id"), col("lang"),
          size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
        graft.operators.Sampling.packSequences(
          withTok, Seq("lang"), "doc_id", "n_tokens", "pack", 512L)
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, lang,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS INT) AS n_tokens,
        |('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM documents),
        |p AS (SELECT doc_id, lang, n_tokens,
        |CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY hv, doc_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prefix FROM t)
        |SELECT doc_id, lang, n_tokens, CAST(prefix // 512 AS BIGINT) AS seq_id,
        |CAST(prefix % 512 AS BIGINT) AS seq_offset FROM p ORDER BY doc_id"""
        .stripMargin.replace("\n", " "))),

    ("x23_mixture_weights",
      // α-smoothed (α=0.3) per-source sampling weights for the training
      // mix: one hash agg + two broadcast scalars.
      (s: SparkSession, dir: String) =>
        TextAnalysis.mixtureWeights(Tables.documents(s, dir), "source", 0.3)
          .orderBy(col("source")),
      Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1),
        |t AS (SELECT sum(n_docs) AS n FROM c),
        |r AS (SELECT source, n_docs, pow(CAST(n_docs AS DOUBLE) / n, 0.3) AS w FROM c, t),
        |z AS (SELECT sum(w) AS z FROM r)
        |SELECT source, n_docs, round(w / z, 6) AS weight FROM r, z
        |ORDER BY source""".stripMargin.replace("\n", " "))),

    ("x24_length_quantiles",
      // Exact token-length quantiles (p50/p90/p99) per language facet —
      // Spark exact percentile vs DuckDB quantile_cont (same linear
      // interpolation), rounded 4 dp on both sides.
      (s: SparkSession, dir: String) =>
        TextAnalysis.lengthQuantiles(Tables.documents(s, dir),
          Seq(0.5, 0.9, 0.99))
          .orderBy(col("lang")),
      Some("""WITH t AS (SELECT lang,
        |len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS ntok
        |FROM documents)
        |SELECT lang, count(*) AS n_docs,
        |round(quantile_cont(ntok, 0.5), 4) AS p50,
        |round(quantile_cont(ntok, 0.9), 4) AS p90,
        |round(quantile_cont(ntok, 0.99), 4) AS p99
        |FROM t GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", " "))),

    ("m1_media_features",
      // Multimodal plumbing: opaque binary payload + typed metadata +
      // deterministic fake featurizer (codec stub documented in
      // operators/Multimodal.scala).
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal.mediaFeatures(
          graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, dir)))
          .orderBy(col("media_id")),
      Some {
        val feats = (0 until 4).map(i =>
          s"round(('0x' || substr(md5(text), ${i * 8 + 1}, 8))::BIGINT::DOUBLE / 4294967296.0, 6) AS f$i")
          .mkString(", ")
        "SELECT doc_id AS media_id, 'text/plain' AS mime, " +
          "CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes, " +
          s"md5(text) AS content_hash, $feats FROM documents ORDER BY media_id"
      }),

    ("m2_frame_sample",
      // Multimodal frame sampling: up to 4 frames of 64 bytes at even
      // stride per payload (decode stubbed; plumbing real — see
      // operators/Multimodal.scala). Oracle slices VARCHAR: byte==char
      // because the fixture corpus is pure ASCII (verified octet_length ==
      // length for every row).
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal.sampleFrames(
          graft.operators.Multimodal.mediaFromDocuments(Tables.documents(s, dir)),
          4, 64)
          .orderBy(col("media_id"), col("frame_idx")),
      Some("""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents),
        |n AS (SELECT media_id, text, len, least(4, greatest(len // 64, 1)) AS n FROM m),
        |f AS (SELECT media_id, text, len, n, len // n AS stride,
        |  unnest(generate_series(0, n - 1)) AS fi FROM n)
        |SELECT media_id, CAST(fi AS INT) AS frame_idx,
        |  CAST(fi * stride AS BIGINT) AS frame_off,
        |  CAST(length(substring(text, fi * stride + 1, 64)) AS BIGINT) AS frame_len,
        |  md5(substring(text, fi * stride + 1, 64)) AS frame_hash
        |FROM f ORDER BY media_id, frame_idx""".stripMargin.replace("\n", " "))),

    ("m3_cdc_chunks",
      // Content-defined chunking dedup (the rsync/LBFS primitive): cut
      // after any byte whose 8-byte window md5 starts with '0' (expected
      // chunk ~16+8 B), then report every chunk seen >= 2 times across the
      // media corpus — the storage-dedup index. Boundaries depend only on
      // local windows, so shared spans chunk identically regardless of
      // offset shifts (m2's fixed-stride frames only match aligned
      // content). Chunking is array-local per payload; the only exchange
      // carries 16-byte chunk hashes.
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal.contentDefinedChunks(
            graft.operators.Multimodal.mediaFromDocuments(
              Tables.documents(s, dir)), 8, "0")
          .groupBy(col("chunk_hash"))
          .agg(max(col("chunk_len")).cast("long").as("chunk_len"),
            countDistinct(col("media_id")).cast("long").as("n_media"),
            count(lit(1)).cast("long").as("n_occ"))
          .filter(col("n_occ") >= 2)
          .orderBy(col("chunk_hash")),
      Some("""WITH m AS (SELECT doc_id AS media_id, text, length(text) AS len FROM documents),
        |cuts AS (SELECT media_id, text, len,
        |CASE WHEN len >= 8 THEN list_filter(generate_series(1, len - 7),
        |p -> md5(substr(text, CAST(p AS INT), 8)) LIKE '0%')
        |ELSE CAST([] AS BIGINT[]) END AS cs FROM m WHERE len >= 1),
        |spans AS (SELECT media_id, text, len,
        |list_prepend(CAST(1 AS BIGINT), list_transform(cs, c -> c + 1)) AS starts,
        |list_append(cs, CAST(len AS BIGINT)) AS ends FROM cuts),
        |ch AS (SELECT media_id,
        |unnest(list_transform(generate_series(1, len(starts)),
        |i -> {'h': md5(substr(text, CAST(starts[CAST(i AS INT)] AS INT),
        |CAST(ends[CAST(i AS INT)] - starts[CAST(i AS INT)] + 1 AS INT))),
        |'l': ends[CAST(i AS INT)] - starts[CAST(i AS INT)] + 1})) AS c
        |FROM spans),
        |g AS (SELECT c.h AS chunk_hash, CAST(max(c.l) AS BIGINT) AS chunk_len,
        |CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
        |CAST(count(*) AS BIGINT) AS n_occ FROM ch GROUP BY 1)
        |SELECT chunk_hash, chunk_len, n_media, n_occ FROM g
        |WHERE n_occ >= 2 ORDER BY chunk_hash""".stripMargin.replace("\n", " "))),

    ("m7_cdc_savings",
      // Chunk-dedup storage savings (m3's business read): what would a
      // content-addressed store actually save on this corpus — total vs
      // unique chunk bytes over the same CDC chunking, the number a
      // 100 TB dedup rollout is justified (or killed) on. One chunk-hash
      // agg then a scalar fold; the exchange carries 16-byte hashes +
      // lengths, never payloads.
      (s: SparkSession, dir: String) => {
        val ch = graft.operators.Multimodal.contentDefinedChunks(
          graft.operators.Multimodal.mediaFromDocuments(
            Tables.documents(s, dir)), 8, "0")
        val uniq = ch.groupBy(col("chunk_hash"))
          .agg(max(col("chunk_len")).cast("long").as("_l"),
            count(lit(1)).cast("long").as("_occ"))
        ch.agg(countDistinct(col("media_id")).cast("long").as("n_media"),
            count(lit(1)).cast("long").as("n_chunks"),
            sum(col("chunk_len")).cast("long").as("total_bytes"))
          .crossJoin(broadcast(uniq.agg(
            count(lit(1)).cast("long").as("n_unique"),
            sum(col("_l")).cast("long").as("unique_bytes"),
            max(col("_occ")).cast("long").as("max_occ"))))
          .select(col("n_media"), col("n_chunks"), col("n_unique"),
            col("total_bytes"), col("unique_bytes"),
            round(lit(1.0) - col("unique_bytes").cast("double") /
              col("total_bytes"), 4).as("savings_pct"),
            col("max_occ"))
      },
      Some("""WITH m AS (SELECT doc_id AS media_id, text,
        |length(text) AS len FROM documents),
        |cuts AS (SELECT media_id, text, len,
        |CASE WHEN len >= 8 THEN list_filter(generate_series(1, len - 7),
        |p -> md5(substr(text, CAST(p AS INT), 8)) LIKE '0%')
        |ELSE CAST([] AS BIGINT[]) END AS cs FROM m WHERE len >= 1),
        |spans AS (SELECT media_id, text, len,
        |list_prepend(CAST(1 AS BIGINT), list_transform(cs, c -> c + 1)) AS starts,
        |list_append(cs, CAST(len AS BIGINT)) AS ends FROM cuts),
        |ch AS (SELECT media_id,
        |unnest(list_transform(generate_series(1, len(starts)),
        |i -> {'h': md5(substr(text, CAST(starts[CAST(i AS INT)] AS INT),
        |CAST(ends[CAST(i AS INT)] - starts[CAST(i AS INT)] + 1 AS INT))),
        |'l': ends[CAST(i AS INT)] - starts[CAST(i AS INT)] + 1})) AS c
        |FROM spans),
        |flat AS (SELECT media_id, c.h AS h, c.l AS l FROM ch),
        |uniq AS (SELECT h, max(l) AS l, count(*) AS occ FROM flat
        |GROUP BY 1),
        |tot AS (SELECT CAST(count(DISTINCT media_id) AS BIGINT) AS n_media,
        |CAST(count(*) AS BIGINT) AS n_chunks,
        |CAST(sum(l) AS BIGINT) AS total_bytes FROM flat),
        |un AS (SELECT CAST(count(*) AS BIGINT) AS n_unique,
        |CAST(sum(l) AS BIGINT) AS unique_bytes,
        |CAST(max(occ) AS BIGINT) AS max_occ FROM uniq)
        |SELECT n_media, n_chunks, n_unique, total_bytes, unique_bytes,
        |round(1.0 - CAST(unique_bytes AS DOUBLE) / total_bytes, 4)
        |AS savings_pct, max_occ FROM tot CROSS JOIN un"""
        .stripMargin.replace("\n", " "))),

    // =======================================================================
    // Relational core on the TPC-H-ish tables (joins, top-N at scale)
    // =======================================================================

    ("j1_pricing_summary",
      (s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
            round(avg(col("l_quantity")), 4).as("avg_qty"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("SELECT l_returnflag, l_linestatus, " +
        "round(sum(l_quantity), 2) AS sum_qty, " +
        "round(sum(l_extendedprice), 2) AS sum_base_price, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, count(*) AS count_order " +
        "FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus")),

    ("j2_top_orders",
      (s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
            col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10),
      Some("SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms, o_orderpriority, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10")),

    ("j4_bucketed_top_orders",
      // j2 through BUCKETED tables: both fact sides persisted bucketed +
      // bucket-sorted on the order key, so the join itself is co-located —
      // no Exchange at query time (operators/Bucketing.scala; the
      // Exchange-free plan is spec-pinned in JoinOpsSpec). Same oracle as
      // j2 — bucketing must never change results.
      (s: SparkSession, dir: String) => {
        val base = scratch("j4")
        val li = graft.operators.Bucketing.bucketTable(
          Tables.lineitem(s, dir).select(col("l_orderkey"),
            col("l_extendedprice"), col("l_discount")),
          "graft_j4_lineitem", "l_orderkey", 16, base + "/li")
        val ord = graft.operators.Bucketing.bucketTable(
          Tables.orders(s, dir).select(col("o_orderkey"), col("o_orderdate"),
            col("o_orderpriority")),
          "graft_j4_orders", "o_orderkey", 16, base + "/ord")
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("o_date_ms"),
            col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("SELECT l_orderkey, epoch_ms(o_orderdate) AS o_date_ms, o_orderpriority, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, l_orderkey LIMIT 10")),

    ("j5_rollup_pricing",
      // OLAP ROLLUP over the pricing summary: per-(flag, status) rows plus
      // per-flag subtotals plus the grand total in ONE pass — Spark
      // `rollup` compiles to a single Expand + hash agg, not three scans.
      // gid disambiguates the grouping level (Spark grouping_id ≡ DuckDB
      // GROUPING, both MSB-first).
      (s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping_id().cast("int").as("gid"),
            round(sum(col("l_quantity")), 2).as("sum_qty"),
            count(lit(1)).as("n_rows"))
          .select(
            coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
            coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
            col("gid"), col("sum_qty"), col("n_rows"))
          .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
        |coalesce(l_linestatus, 'ALL') AS l_linestatus,
        |CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
        |round(sum(l_quantity), 2) AS sum_qty, count(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus"""
        .stripMargin.replace("\n", " "))),

    ("j6_pivot_daily_events",
      // PIVOT: daily event counts spread into one column per event type —
      // explicit value list so the output schema is static (no
      // driver-side distinct scan), nulls filled to 0. One hash agg under
      // a pivot projection.
      (s: SparkSession, dir: String) =>
        Tables.events(s, dir)
          .select(date_format(col("ts"), "yyyy-MM-dd").as("day"),
            col("event_type"))
          .groupBy(col("day"))
          .pivot("event_type",
            Seq("click", "error", "purchase", "signup", "view"))
          .agg(count(lit(1)))
          .na.fill(0L)
          .orderBy(col("day")),
      Some("""SELECT strftime(ts, '%Y-%m-%d') AS day,
        |count(*) FILTER (event_type = 'click') AS click,
        |count(*) FILTER (event_type = 'error') AS error,
        |count(*) FILTER (event_type = 'purchase') AS purchase,
        |count(*) FILTER (event_type = 'signup') AS signup,
        |count(*) FILTER (event_type = 'view') AS "view"
        |FROM events GROUP BY 1 ORDER BY day"""
        .stripMargin.replace("\n", " "))),

    ("j7_salted_revenue",
      // j2's join through the SALTED skew shape (operators/Bucketing
      // .saltedEquiJoin): big side salted from the whole row, small side
      // replicated 4x, join on (key, salt). Same oracle as the plain
      // join — salting must never change the match set.
      (s: SparkSession, dir: String) =>
        graft.operators.Bucketing.saltedEquiJoin(
          Tables.lineitem(s, dir).select(col("l_orderkey"),
            col("l_extendedprice"), col("l_discount")),
          Tables.orders(s, dir).select(col("o_orderkey"),
            col("o_orderpriority")),
          "l_orderkey", "o_orderkey", 4)
          .groupBy(col("o_orderpriority"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("o_orderpriority")),
      Some("SELECT o_orderpriority, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "GROUP BY 1 ORDER BY o_orderpriority")),

    ("j3_region_nation_revenue",
      (s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy(col("r_name"), col("n_name")),
      Some("SELECT r_name, n_name, " +
        "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, " +
        "count(*) AS n_items " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "GROUP BY 1, 2 ORDER BY r_name, n_name")),

    ("q26_sql_surface",
      // The pure-SQL user path end to end: GraftExtensions-registered
      // native codegen cosine + a scalar subquery + ORDER BY/LIMIT
      // (TakeOrderedAndProject), all through spark.sql — no Column API.
      (s: SparkSession, dir: String) => {
        graft.functions.GraftExtensions.register(s)
        Tables.embeddings(s, dir).createOrReplaceTempView("g_emb")
        s.sql("""SELECT vec_id, label,
          round(graft_cosine(embedding,
            (SELECT embedding FROM g_emb WHERE vec_id = 0)), 6) AS sim
          FROM g_emb WHERE vec_id <> 0
          ORDER BY sim DESC, vec_id LIMIT 20""")
      },
      Some("SELECT vec_id, label, " +
        s"round(${cosSql("e.embedding", "q.qv")}, 6) AS sim " +
        "FROM embeddings e, " +
        "(SELECT embedding AS qv FROM embeddings WHERE vec_id = 0) q " +
        "WHERE vec_id <> 0 ORDER BY sim DESC, vec_id LIMIT 20")),

    ("q25_set_ops",
      // Set operators over user cohorts: high-value viewers INTERSECT
      // high-value buyers EXCEPT severe-error users (every user has every
      // event type in the synthetic corpus, so cohorts discriminate on
      // value). Spark intersect/except are the DISTINCT set semantics (same
      // as SQL), planned as aggregating semi/anti joins — no
      // distinct-then-join double shuffle.
      (s: SparkSession, dir: String) => {
        val e = Tables.events(s, dir)
        def cohort(t: String, minValue: Double) =
          e.where(col("event_type") === t && col("value") > minValue)
            .select(col("user_id"))
        cohort("view", 90).intersect(cohort("purchase", 90))
          .except(cohort("error", 98))
          .orderBy(col("user_id"))
      },
      Some("SELECT user_id FROM events WHERE event_type = 'view' AND value > 90 " +
        "INTERSECT SELECT user_id FROM events " +
        "WHERE event_type = 'purchase' AND value > 90 " +
        "EXCEPT SELECT user_id FROM events " +
        "WHERE event_type = 'error' AND value > 98 " +
        "ORDER BY user_id")),

    ("j8_cube_events",
      // CUBE completes the multi-grain trio (j5 ROLLUP, j6 PIVOT): all four
      // grouping combinations of (event_type, day) in ONE Expand + hash agg
      // pass; gid disambiguates the level (Spark grouping_id ≡ DuckDB
      // GROUPING, both MSB-first).
      (s: SparkSession, dir: String) =>
        Tables.events(s, dir)
          .withColumn("day", date_format(col("ts"), "yyyy-MM-dd"))
          .cube(col("event_type"), col("day"))
          .agg(grouping_id().cast("int").as("gid"),
            count(lit(1)).as("n_events"),
            round(sum(col("value")), 2).as("sum_value"))
          .select(coalesce(col("event_type"), lit("ALL")).as("event_type"),
            coalesce(col("day"), lit("ALL")).as("day"),
            col("gid"), col("n_events"), col("sum_value"))
          .orderBy(col("gid"), col("event_type"), col("day")),
      Some("""SELECT coalesce(event_type, 'ALL') AS event_type,
        |coalesce(day, 'ALL') AS day,
        |CAST(GROUPING(event_type, day) AS INT) AS gid,
        |count(*) AS n_events, round(sum(value), 2) AS sum_value
        |FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, value FROM events)
        |GROUP BY CUBE (event_type, day)
        |ORDER BY gid, event_type, day""".stripMargin.replace("\n", " "))),

    ("j9_scd2_history",
      // SCD type-2 dimension history: each user's event_type runs become
      // validity intervals [valid_from, valid_to) with is_current on the
      // open tail — the warehouse twin of the reference's DO-UPDATE
      // upsert (Bot.java:156-159 keeps only the latest; this keeps every
      // version). One shuffle: change window, (key,version) aggregate,
      // and valid_to lead all cluster by user_id.
      (s: SparkSession, dir: String) =>
        graft.operators.Scd.scd2(Tables.events(s, dir), "user_id",
            "event_type", unix_millis(col("ts")), "event_id", NOW)
          .orderBy(col("user_id"), col("version")),
      Some(scd2OracleSql)),

    ("j9b_scd2_incremental",
      // The incremental form of j9: history built from events before T1,
      // then one scd2Merge folds the tail batch in — open versions
      // extend or close, numbering continues, the event corpus is never
      // rescanned (per-batch cost is O(batch + dimension)). Same oracle
      // as the one-shot build by the operator's split-equivalence
      // contract (property-pinned in ScdSpec).
      (s: SparkSession, dir: String) => {
        val ev = Tables.events(s, dir)
        val hist = graft.operators.Scd.scd2(
          ev.filter(unix_millis(col("ts")) < T1), "user_id",
          "event_type", unix_millis(col("ts")), "event_id", NOW)
        graft.operators.Scd.scd2Merge(hist,
            ev.filter(unix_millis(col("ts")) >= T1), "user_id",
            "event_type", unix_millis(col("ts")), "event_id", NOW)
          .orderBy(col("user_id"), col("version"))
      },
      Some(scd2OracleSql)),

    ("j10_pit_join",
      // Point-in-time enrichment: even events build the SCD2 dimension
      // (the user's state machine), odd events are the fact stream — each
      // fact picks the version valid AT its timestamp (nulls before the
      // key's first version), the feature-store no-future-leakage rule.
      // Delegates to the as-of union+window pass: one shuffle, no range
      // join, history stays version-grain. Oracle is the interval
      // containment LEFT JOIN over the same history CTE.
      (s: SparkSession, dir: String) => {
        val ev = Tables.events(s, dir)
        val hist = graft.operators.Scd.scd2(
          ev.filter(col("event_id") % 2 === 0), "user_id",
          "event_type", unix_millis(col("ts")), "event_id", NOW)
          .withColumnRenamed("event_type", "state")
        val facts = ev.filter(col("event_id") % 2 === 1)
          .select(col("event_id"), col("user_id"),
            unix_millis(col("ts")).as("t"), col("event_type").as("ev_type"))
        graft.operators.Scd.pitJoin(facts, hist, "user_id", "t",
            Seq("version", "state"), "state_from")
          .orderBy(col("event_id"))
      },
      Some(pitJoinOracleSql)),

    ("j11_pagerank",
      // Weighted PageRank (5 iterations, d=0.85) over the bidirectional
      // customer↔supplier transaction graph (suppliers negated into their
      // own id space; edge weight = lineitem count) — the link-graph
      // quality prior of web-corpus curation. Per-iteration 6-dp rounding
      // makes the fixed-point iteration engine-portable; top-20 by rank.
      (s: SparkSession, dir: String) => {
        val base = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .agg(count(lit(1)).cast("double").as("w"))
        val e = base.select(col("c").as("src"), (-col("s")).as("dst"), col("w"))
          .unionByName(
            base.select((-col("s")).as("src"), col("c").as("dst"), col("w")))
        graft.operators.Graph.pageRank(e, "src", "dst", "w", 5)
          .orderBy(col("rank").desc, col("node").asc).limit(20)
      },
      Some(pageRankOracleSql)),

    ("j41_ppr",
      // Personalized PageRank (operators/Graph.personalizedPageRank,
      // seeds = customers 1-3, 5 iterations) on j11's transaction graph:
      // teleport concentrated on the seeds turns global importance into
      // proximity-to-the-seeds — the "more like these" recommender /
      // seed-expansion read. Top-20 by rank.
      (s: SparkSession, dir: String) => {
        val base = Tables.lineitem(s, dir)
          .select(col("l_orderkey"), col("l_suppkey"))
          .join(Tables.orders(s, dir)
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("c"), col("l_suppkey").as("s"))
          .agg(count(lit(1)).cast("double").as("w"))
        val e = base.select(col("c").as("src"), (-col("s")).as("dst"), col("w"))
          .unionByName(
            base.select((-col("s")).as("src"), col("c").as("dst"), col("w")))
        graft.operators.Graph.personalizedPageRank(
            e, "src", "dst", "w", Seq(1L, 2L, 3L), 5)
          .orderBy(col("rank").desc, col("node").asc).limit(20)
      },
      Some(pprOracleSql)),

    ("x69_kmeans",
      // Lloyd k-means training (k=8, 3 rounds, cosine) — trains the
      // coarse quantizer x7's IVF takes as given. Per round: one codegen
      // centroid-literal argmax projection (no join/shuffle) + one
      // (cid,dim)-grain mean agg whose k·d rows are the bounded driver
      // metadata seeding the next round; means round 6 dp + quantize to
      // float so the oracle iterates bit-identically.
      (s: SparkSession, dir: String) =>
        Similarity.kMeansTrain(Tables.embeddings(s, dir),
            "vec_id", "embedding", 8, 3)
          .orderBy(col("vec_id")),
      Some(kMeansOracleSql)),

    ("x72_cluster_balanced",
      // Cluster-balanced sampling (the DCLM/SemDeDup diversity move):
      // train the x69 quantizer, then keep at most 40 vectors per
      // cluster by x19's deterministic salted-hash order — dense regions
      // downsample, sparse regions keep everything, and the kept set is
      // reproducible across runs/partitionings. Composition of two
      // spec-pinned parts; oracle = the unrolled k-means CTEs + the
      // hash-capped window.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.capPerGroup(
            Similarity.kMeansTrain(Tables.embeddings(s, dir),
                "vec_id", "embedding", 8, 3)
              .select(col("vec_id"), col("cluster_id")),
            Seq("cluster_id"), "vec_id", "cbal", 40)
          .orderBy(col("vec_id")),
      Some(clusterBalancedOracleSql)),

    ("x71_split_leakage",
      // Train/test contamination audit: x2's near-dup pairs joined
      // against x13's split assignment — every pair whose members landed
      // in DIFFERENT splits is memorization leakage (the GPT-3/Lee et
      // al. post-hoc check; the fix is cluster-grain assignment). The
      // output-scale pair frame broadcasts; the assignment never
      // shuffles.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Sampling.crossSplitPairs(
            Dedup.minHashNearDup(docs, "doc_id", "text", 3, 0.8),
            "id_a", "id_b",
            graft.operators.Sampling.split(
              docs.select(col("doc_id")), "doc_id", "split", 80, 10),
            "doc_id", "split")
          .select(col("id_a"), col("id_b"), col("jaccard"),
            col("split_a"), col("split_b"))
          .orderBy(col("id_a"), col("id_b"))
      },
      Some(s"""WITH $minHashPairsCtes,
        |p AS (SELECT id_a, id_b, round(jac, 4) AS jaccard FROM j WHERE jac >= 0.8),
        |s AS (SELECT doc_id,
        |CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |FROM documents))
        |SELECT p.id_a, p.id_b, p.jaccard, sa.split AS split_a, sb.split AS split_b
        |FROM p JOIN s sa ON sa.doc_id = p.id_a JOIN s sb ON sb.doc_id = p.id_b
        |WHERE sa.split <> sb.split
        |ORDER BY p.id_a, p.id_b""".stripMargin.replace("\n", " "))),

    ("x45_bm25_search",
      // BM25 top-20 lexical retrieval for the query bag {hash, join,
      // scan}: collection stats (N, total length, per-term df) in ONE
      // full-scan aggregate broadcast back as a single row; tf is
      // array-local per doc; top-k via TakeOrderedAndProject. The corpus
      // never shuffles. Per-term contributions fold in fixed query
      // order, so the double arithmetic is engine-portable.
      (s: SparkSession, dir: String) =>
        TextAnalysis.bm25Search(Tables.documents(s, dir), "doc_id", "text",
          Seq("hash", "join", "scan"), 20),
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(sum(len(t)) AS BIGINT) AS total_len,
        |CAST(sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |CAST(sum(CASE WHEN list_contains(t, 'scan') THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |FROM toks),
        |sc AS (SELECT doc_id,
        |len(list_filter(t, x -> x = 'hash')) AS tf0,
        |len(list_filter(t, x -> x = 'join')) AS tf1,
        |len(list_filter(t, x -> x = 'scan')) AS tf2,
        |len(t) AS dl, n_docs, total_len, df0, df1, df2 FROM toks, stats),
        |s2 AS (SELECT doc_id,
        |ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE))) AS score,
        |tf0 + tf1 + tf2 AS ntf FROM sc)
        |SELECT doc_id, round(score, 4) AS bm25 FROM s2 WHERE ntf > 0
        |ORDER BY round(score, 4) DESC, doc_id LIMIT 20"""
        .stripMargin.replace("\n", " "))),

    ("x46_snapshot_diff",
      // Corpus version diff: old = docs with doc_id % 7 <> 0, new = all
      // but doc_id % 13 == 0 with text amended for doc_id % 11 == 0 —
      // added/removed/changed by content md5. Each side reduces to
      // (id, hash) before the full-outer join, so the shuffle carries
      // two slim columns; unchanged rows drop in a codegen filter.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        val oldSnap = docs.filter(col("doc_id") % 7 =!= 0)
        val newSnap = docs.filter(col("doc_id") % 13 =!= 0)
          .withColumn("text", when(col("doc_id") % 11 === 0,
            concat(col("text"), lit(" v2"))).otherwise(col("text")))
        graft.operators.Maintenance.snapshotDiff(oldSnap, newSnap,
            "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH old AS (SELECT doc_id, md5(text) AS h FROM documents
        |WHERE doc_id % 7 <> 0),
        |new AS (SELECT doc_id,
        |md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END) AS h
        |FROM documents WHERE doc_id % 13 <> 0)
        |SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id,
        |CASE WHEN old.doc_id IS NULL THEN 'added'
        |WHEN new.doc_id IS NULL THEN 'removed'
        |ELSE 'changed' END AS status,
        |old.h AS old_hash, new.h AS new_hash
        |FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
        |WHERE old.doc_id IS NULL OR new.doc_id IS NULL OR old.h <> new.h
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x47_dataset_profile",
      // Per-column QA card over documents (row count, nulls, exact
      // distinct) — one pass, one Expand-fed hash aggregate, long-form
      // stack of the 1-row result. Nulls injected (lang of doc_id % 9 == 0
      // nulled) so the null accounting is actually exercised.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.datasetCard(
          Tables.documents(s, dir).withColumn("lang",
            when(col("doc_id") % 9 === 0, lit(null)).otherwise(col("lang"))),
          profileCols),
      Some(profileOracleSql)),

    ("x48_hard_negatives",
      // Contrastive hard-negative mining: for 4 anchor vectors, the top-5
      // most-similar corpus vectors with cosine in [0.10, 0.95) — the
      // informative-but-not-duplicate band. Anchors broadcast; only band
      // survivors reach the per-anchor top-k window.
      (s: SparkSession, dir: String) =>
        Similarity.hardNegatives(Tables.embeddings(s, dir), "vec_id",
          "embedding", hardNegAnchors, 5, 0.10, 0.95),
      Some(hardNegativesOracleSql)),

    ("x49_substring_dedup",
      // Exact repeated-substring pairs (Lee et al. 2022 criterion): doc
      // pairs sharing a verbatim >= 60-char substring, found via stride-1
      // window md5s bucketed by an equi-self-join — never all-pairs; the
      // oracle hashes identically so both engines bucket the same.
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.substringPairs(
          Tables.documents(s, dir), "doc_id", "text", 60),
      Some("""WITH g AS (SELECT doc_id, unnest(CASE WHEN length(text) >= 60 THEN
        |list_transform(generate_series(1, length(text) - 59),
        |i -> md5(substr(text, CAST(i AS INT), 60)))
        |ELSE CAST([] AS VARCHAR[]) END) AS h FROM documents),
        |w AS (SELECT DISTINCT doc_id, h FROM g),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |CAST(count(*) AS BIGINT) AS n_shared
        |FROM w a JOIN w b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared FROM p
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x68_span_removal",
      // Exact duplicated-SPAN removal — the acting half of x49's
      // detection (Lee et al. 2022: dedup the repeated spans, not whole
      // docs): every char covered by a >= 40-char window shared with
      // another doc is dropped; uncovered chars concatenate in order.
      // Window hashes shuffle once at hash grain; coverage + cleanup are
      // array-local per doc; untouched docs pass through a left-outer
      // miss. Single-pass contract: computed against the ORIGINAL corpus.
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.removeDuplicatedSpans(
            Tables.documents(s, dir), "doc_id", "text", 40)
          .orderBy(col("doc_id")),
      Some("""WITH w0 AS (SELECT doc_id, text,
        |unnest(generate_series(1, length(text) - 39)) AS i
        |FROM documents WHERE length(text) >= 40),
        |wins AS (SELECT doc_id, i AS p,
        |md5(substr(text, CAST(i AS INT), 40)) AS h FROM w0),
        |duph AS (SELECT h FROM wins GROUP BY h
        |HAVING count(DISTINCT doc_id) >= 2),
        |dstarts AS (SELECT doc_id, list(p ORDER BY p) AS ps FROM wins
        |WHERE h IN (SELECT h FROM duph) GROUP BY doc_id),
        |cleaned AS (SELECT d.doc_id, length(d.text) AS lt,
        |CASE WHEN s.ps IS NULL THEN d.text ELSE
        |list_aggregate(list_transform(list_filter(generate_series(1, length(d.text)),
        |j -> len(list_filter(s.ps, p -> j >= p AND j < p + 40)) = 0),
        |j -> substr(d.text, CAST(j AS INT), 1)), 'string_agg', '') END AS ct
        |FROM documents d LEFT JOIN dstarts s USING (doc_id))
        |SELECT doc_id, COALESCE(ct, '') AS clean_text,
        |CAST(length(COALESCE(ct, '')) AS BIGINT) AS n_kept,
        |CAST(lt - length(COALESCE(ct, '')) AS BIGINT) AS n_removed
        |FROM cleaned ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x70_winnowing",
      // Winnowed substring-pair detection (Schleimer et al. 2003) — x49's
      // documented scale knob made real: each doc ships only the min hash
      // of every 8 consecutive 40-char window hashes (~4.6x fewer rows
      // into the equi-join at sf0.01), detection GUARANTEED for verbatim
      // shares >= 40 + 8 - 1 = 47 chars. Fingerprint selection is
      // array-local (sliding array_min — no explode, no window function);
      // md5-hex min under binary collation is engine-portable.
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.winnowedSubstringPairs(
          Tables.documents(s, dir), "doc_id", "text", 40, 8),
      Some("""WITH g AS (SELECT doc_id, CASE WHEN length(text) >= 40 THEN
        |list_transform(generate_series(1, length(text) - 39),
        |i -> md5(substr(text, CAST(i AS INT), 40)))
        |ELSE CAST([] AS VARCHAR[]) END AS hs FROM documents),
        |f AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |generate_series(1, greatest(len(hs) - 7, 1)),
        |p -> list_min(hs[CAST(p AS INT):CAST(p + 7 AS INT)])))) AS h
        |FROM g WHERE len(hs) >= 1),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |CAST(count(*) AS BIGINT) AS n_shared_fp
        |FROM f a JOIN f b ON a.h = b.h AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, n_shared_fp FROM p
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x50_fuzzy_linkage",
      // Record-linkage blocking + edit-distance verify over doc "titles"
      // (first 30 chars): candidates only within equal 4-char block
      // prefixes (the blocking key is part of the contract), kept iff
      // levenshtein <= 3 — near-identical titles with small edits, i.e.
      // the same article re-crawled under light mutation.
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.blockedEditDistancePairs(
          Tables.documents(s, dir)
            .select(col("doc_id"), substring(col("text"), 1, 30).as("title")),
          "doc_id", "title", substring(col("title"), 1, 4), 3),
      Some("""WITH e AS (SELECT doc_id, substr(text, 1, 30) AS title FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |CAST(levenshtein(a.title, b.title) AS BIGINT) AS dist
        |FROM e a JOIN e b ON substr(a.title, 1, 4) = substr(b.title, 1, 4)
        |AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, dist FROM p WHERE dist <= 3
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x55_bpe_pairs",
      // BPE tokenizer-training signal: top-20 adjacent character pairs
      // weighted by word frequency — the argmax row is the first BPE
      // merge. Word counts aggregate first (shuffle carries distinct
      // words); pair generation stays array-local per distinct word.
      (s: SparkSession, dir: String) =>
        TextAnalysis.bpePairCandidates(Tables.documents(s, dir), "text", 20),
      Some("""WITH w AS (SELECT tok AS word, CAST(count(*) AS BIGINT) AS wc
        |FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |x -> x <> '')) AS tok FROM documents) GROUP BY 1),
        |p AS (SELECT unnest(CASE WHEN length(word) >= 2 THEN
        |list_transform(generate_series(1, length(word) - 1),
        |i -> substr(word, CAST(i AS INT), 2))
        |ELSE CAST([] AS VARCHAR[]) END) AS pair, wc FROM w)
        |SELECT pair, CAST(sum(wc) AS BIGINT) AS weighted_count FROM p
        |GROUP BY 1 ORDER BY weighted_count DESC, pair
        |LIMIT 20""".stripMargin.replace("\n", " "))),

    ("x54_label_outliers",
      // Embedding-space label QA: per-label centroid, every vector's
      // cosine to its own label's centroid, 5 least-similar per label —
      // the likely-mislabeled review queue. Centroids are label-grain
      // broadcasts; similarity rounded 6 dp so both engines rank alike.
      (s: SparkSession, dir: String) =>
        Similarity.labelOutliers(Tables.embeddings(s, dir), "vec_id",
          "embedding", "label", 5),
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, avg(v) AS m FROM p GROUP BY 1, 2),
        |cl AS (SELECT label, list(m ORDER BY pos) AS cent FROM c GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label,
        |round(${cosSql("e.embedding", "cl.cent")}, 6) AS sim
        |FROM embeddings e JOIN cl ON e.label = cl.label),
        |r AS (SELECT vec_id, label, sim,
        |CAST(row_number() OVER (PARTITION BY label ORDER BY sim ASC, vec_id)
        |AS BIGINT) AS out_rank FROM d)
        |SELECT vec_id, label, sim, out_rank FROM r WHERE out_rank <= 5
        |ORDER BY label, out_rank""".stripMargin.replace("\n", " "))),

    ("x52_vocab_oov",
      // Tokenizer-coverage: top-200 corpus vocabulary (count desc, token
      // tie-break), then every doc's out-of-vocabulary rate against it —
      // the coverage check before committing to a vocab. Vocab is bounded
      // and broadcast; the corpus shuffles token counts, never documents.
      (s: SparkSession, dir: String) =>
        TextAnalysis.vocabOovRate(Tables.documents(s, dir), "doc_id",
          "text", 200).orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id,
        |unnest(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS tok
        |FROM documents),
        |v AS (SELECT tok FROM (SELECT tok, count(*) AS c FROM t GROUP BY 1)
        |ORDER BY c DESC, tok LIMIT 200)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |CAST(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |round(sum(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS oov_rate
        |FROM t LEFT JOIN v ON t.tok = v.tok GROUP BY 1
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x53_k_anonymity",
      // Pre-release privacy QA: quasi-identifier combos (event_type, day,
      // user-id bucket) shared by fewer than 3 rows re-identify — emit the
      // risky groups, most identifying first. One hash agg + HAVING.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.kAnonymityAudit(
          Tables.events(s, dir).select(
            col("event_type"),
            date_format(col("ts"), "yyyy-MM-dd").as("day"),
            (col("user_id") % 10).as("uid_bucket")),
          Seq("event_type", "day", "uid_bucket"), 3),
      Some("""SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
        |user_id % 10 AS uid_bucket, CAST(count(*) AS BIGINT) AS group_size
        |FROM events GROUP BY 1, 2, 3 HAVING count(*) < 3
        |ORDER BY group_size, event_type, day, uid_bucket"""
        .stripMargin.replace("\n", " "))),

    ("x51_domain_reweight",
      // DoReMi-style mixture reshaping: target shares {src0 .4, src1 .3,
      // src2 .2, src3 .1} over the uniform 20-source corpus → computed
      // keep rates {1.0, .75, .5, .25}, everything else dropped (target
      // 0). Deterministic id-hash selection; rates derived from measured
      // shares, rounded 6 dp on both sides.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.domainReweight(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", "source",
          Map("src0" -> 0.4, "src1" -> 0.3, "src2" -> 0.2, "src3" -> 0.1),
          "mix")
          .orderBy(col("doc_id")),
      Some("""WITH s AS (SELECT source, CAST(count(*) AS DOUBLE) AS cnt
        |FROM documents GROUP BY 1),
        |t AS (SELECT source, cnt, CASE source
        |WHEN 'src0' THEN CAST(0.4 AS DOUBLE) WHEN 'src1' THEN CAST(0.3 AS DOUBLE)
        |WHEN 'src2' THEN CAST(0.2 AS DOUBLE) WHEN 'src3' THEN CAST(0.1 AS DOUBLE)
        |ELSE CAST(0.0 AS DOUBLE) END AS tgt FROM s),
        |r AS (SELECT source, tgt * (SELECT sum(cnt) FROM s) / cnt AS ratio FROM t),
        |rates AS (SELECT source,
        |round(ratio / (SELECT max(ratio) FROM r), 6) AS keep_rate FROM r)
        |SELECT d.doc_id, d.source, rates.keep_rate
        |FROM documents d JOIN rates ON d.source = rates.source
        |WHERE (('0x' || substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |% 10000) / 10000.0 < keep_rate
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("q23_window_suite",
      // Navigation + ranking + distribution window functions in one pass:
      // lag/lead/row_number/ntile over the per-user event-time order,
      // percent_rank/cume_dist over the per-type value order. Both window
      // orders carry an event_id tie-break, so every rank/percentile is
      // deterministic and peer-group-free on both engines.
      (s: SparkSession, dir: String) => {
        val e = Tables.events(s, dir).select(col("event_id"), col("user_id"),
          col("event_type"), unix_millis(col("ts")).as("ms"), col("value"))
        val wU = Window.partitionBy(col("user_id"))
          .orderBy(col("ms"), col("event_id"))
        val wT = Window.partitionBy(col("event_type"))
          .orderBy(col("value"), col("event_id"))
        e.select(col("event_id"), col("user_id"),
            round(lag(col("value"), 1).over(wU), 4).as("prev_value"),
            round(lead(col("value"), 1).over(wU), 4).as("next_value"),
            row_number().over(wU).as("seq_in_user"),
            ntile(4).over(wU).as("quartile_in_user"),
            round(percent_rank().over(wT), 6).as("pct_rank_in_type"),
            round(cume_dist().over(wT), 6).as("cume_dist_in_type"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
        |round(lag(value, 1) OVER wu, 4) AS prev_value,
        |round(lead(value, 1) OVER wu, 4) AS next_value,
        |CAST(row_number() OVER wu AS INT) AS seq_in_user,
        |CAST(ntile(4) OVER wu AS INT) AS quartile_in_user,
        |round(percent_rank() OVER wt, 6) AS pct_rank_in_type,
        |round(cume_dist() OVER wt, 6) AS cume_dist_in_type
        |FROM events
        |WINDOW wu AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id),
        |wt AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin.replace("\n", " "))),

    ("q24_funnel",
      // Conversion funnel view -> click -> purchase per user: earliest view,
      // earliest click strictly after it, earliest purchase strictly after
      // that (operators/Funnel.scala — one shuffle, chained conditional-min
      // windows, no per-user array state). Oracle is the equivalent
      // min-chain as three grouped CTE joins.
      (s: SparkSession, dir: String) =>
        Funnel.funnel(
          Tables.events(s, dir).select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms")),
          "user_id", "event_type", "ms", Seq("view", "click", "purchase"))
          .select(col("user_id"), col("step0_ms").as("view_ms"),
            col("step1_ms").as("click_ms"), col("step2_ms").as("purchase_ms"),
            col("converted"))
          .orderBy(col("user_id")),
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, min(ms) AS view_ms FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ms) AS click_ms FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > v.view_ms GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ms) AS purchase_ms FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > c.click_ms GROUP BY 1)
        |SELECT v.user_id, view_ms, click_ms, purchase_ms,
        |CAST(purchase_ms IS NOT NULL AS INT) AS converted
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin.replace("\n", " "))),

    ("x36_lm_score",
      // Unigram-LM "perplexity filter" scoring: per-doc mean token
      // log-probability under the corpus's own unigram distribution
      // (TextAnalysis.unigramLmScore — tokenize once, vocab re-agged from
      // the same shuffle, broadcast scalar total).
      (s: SparkSession, dir: String) =>
        TextAnalysis.unigramLmScore(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id,
        |  unnest(list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '')) AS token
        |  FROM documents),
        |dt AS (SELECT doc_id, token, count(*) AS cnt FROM tok GROUP BY 1, 2),
        |vocab AS (SELECT token, sum(cnt) AS freq FROM dt GROUP BY 1),
        |n AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM vocab)
        |SELECT dt.doc_id, CAST(sum(dt.cnt) AS BIGINT) AS n_tokens,
        |round(sum(dt.cnt * ln(CAST(vocab.freq AS DOUBLE) / n.total)) / sum(dt.cnt), 4)
        |  AS lm_score
        |FROM dt JOIN vocab USING (token), n
        |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin.replace("\n", " "))),

    ("x37_source_gate",
      // Per-source (domain) quality gate: keep documents only from sources
      // whose mean doc length clears the corpus-wide mean
      // (TextAnalysis.sourceQualityGate — agg to source grain, broadcast
      // join back; the corpus side never shuffles).
      (s: SparkSession, dir: String) =>
        TextAnalysis.sourceQualityGate(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH s AS (SELECT source, sum(n_chars) AS sc, count(*) AS n
        |  FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(sc) AS DOUBLE) / CAST(sum(n) AS DOUBLE) AS gavg FROM s)
        |SELECT doc_id, d.source, round(CAST(sc AS DOUBLE) / n, 4) AS src_avg_chars
        |FROM documents d JOIN s USING (source), g
        |WHERE CAST(sc AS DOUBLE) / n >= g.gavg
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x56_char_entropy",
      // Character-entropy gibberish filter (TextAnalysis.charEntropy) —
      // fully array-local per row, zero shuffles/joins; the oracle
      // recomputes the identical log2(L) − Σ n·log2(n)/L via unnest.
      (s: SparkSession, dir: String) =>
        TextAnalysis.charEntropy(Tables.documents(s, dir), "doc_id", "text")
          .orderBy(col("doc_id")),
      Some("""WITH c AS (SELECT doc_id,
        |unnest(list_transform(range(1, length(text)+1),
        |  x -> substring(text, CAST(x AS INT), 1))) AS ch FROM documents),
        |cnt AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY 1, 2),
        |e AS (SELECT doc_id, CAST(sum(n) AS DOUBLE) AS tot, count(*) AS nd,
        |  sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE))) AS s
        |FROM cnt GROUP BY 1)
        |SELECT doc_id, CAST(tot AS BIGINT) AS len_chars,
        |CAST(nd AS BIGINT) AS n_distinct_chars,
        |round(log2(tot) - s / tot, 4) AS char_entropy
        |FROM e ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x57_topk_per_group",
      // Per-group top-k through the bounded mergeable aggregate
      // (functions/TopKAgg.scala) — map-side partial keeps ≤k candidates
      // per (partition, group), so the exchange carries k rows per group
      // per partition instead of every row a row_number window would ship
      // and SORT. Oracle is the window ground truth.
      (s: SparkSession, dir: String) => {
        val topk = graft.functions.TopKAgg.topK(3)
        Tables.events(s, dir).filter(col("event_type") === "purchase")
          .groupBy(col("user_id"))
          .agg(topk(col("value"), col("event_id")).as("_top"))
          .select(col("user_id"), posexplode(col("_top")).as(Seq("_i", "_s")))
          .select(col("user_id"), (col("_i") + 1).cast("long").as("rnk"),
            col("_s.id").as("event_id"), round(col("_s.score"), 4).as("value"))
          .orderBy(col("user_id"), col("rnk"))
      },
      Some("""WITH r AS (SELECT user_id, event_id, value,
        |row_number() OVER (PARTITION BY user_id
        |  ORDER BY value DESC, event_id ASC) AS rnk
        |FROM events WHERE event_type = 'purchase')
        |SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id,
        |round(value, 4) AS value
        |FROM r WHERE rnk <= 3 ORDER BY user_id, rnk"""
        .stripMargin.replace("\n", " "))),

    ("x58_embed_standardize",
      // Per-dimension z-score standardization of the embedding store
      // (Similarity.standardizeEmbeddings) — d-row stats agg, 1-row
      // broadcast, zip_with projection; emits the norms-before/after +
      // mean-z sanity scalars.
      (s: SparkSession, dir: String) =>
        Similarity.standardizeEmbeddings(
          Tables.embeddings(s, dir), "vec_id", "embedding")
          .orderBy(col("vec_id")),
      Some("""WITH d AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
        |unnest(range(1, len(embedding)+1)) AS pos FROM embeddings),
        |st AS (SELECT pos, avg(x) AS m, stddev_pop(x) AS s FROM d GROUP BY 1),
        |z AS (SELECT vec_id, d.x,
        |CASE WHEN st.s = 0 THEN 0.0 ELSE (d.x - st.m) / st.s END AS z
        |FROM d JOIN st USING (pos))
        |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_dims,
        |round(sqrt(sum(x*x)), 4) AS pre_norm,
        |round(sqrt(sum(z*z)), 4) AS z_norm,
        |round(sum(z) / count(*), 6) AS z_mean
        |FROM z GROUP BY 1 ORDER BY vec_id""".stripMargin.replace("\n", " "))),

    ("x59_curriculum",
      // Curriculum epoch ordering (Sampling.curriculumOrder): quartile
      // difficulty tiles from one exact-percentile aggregate + a
      // deterministic intra-tile shuffle key — no window, no ntile, the
      // corpus is one codegen projection.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.curriculumOrder(
          Tables.documents(s, dir).select(col("doc_id"), col("n_chars")),
          "doc_id", "n_chars", "curr")
          .orderBy(col("tile"), col("shuffle_key"), col("doc_id")),
      Some("""WITH q AS (SELECT
        |round(quantile_cont(n_chars, 0.25), 4) AS q1,
        |round(quantile_cont(n_chars, 0.50), 4) AS q2,
        |round(quantile_cont(n_chars, 0.75), 4) AS q3 FROM documents)
        |SELECT doc_id, n_chars,
        |1 + CAST(CAST(n_chars AS DOUBLE) > q1 AS BIGINT)
        |  + CAST(CAST(n_chars AS DOUBLE) > q2 AS BIGINT)
        |  + CAST(CAST(n_chars AS DOUBLE) > q3 AS BIGINT) AS tile,
        |('0x' || substr(md5('curr:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |  % 1000000 AS shuffle_key
        |FROM documents, q
        |ORDER BY tile, shuffle_key, doc_id""".stripMargin.replace("\n", " "))),

    ("x60_contribution_cap",
      // User-contribution capping (Maintenance.contributionCap) — the DP
      // preprocessing / heavy-poster guard: per-group raw vs user-capped
      // totals, cap 20 per (user, type).
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.contributionCap(
          Tables.events(s, dir), "user_id", "event_type", 20L)
          .orderBy(col("event_type")),
      Some("""WITH ug AS (SELECT user_id, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2)
        |SELECT event_type, CAST(sum(n) AS BIGINT) AS raw_count,
        |CAST(sum(least(n, 20)) AS BIGINT) AS capped_count,
        |CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ug GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x61_bigram_lm",
      // Bigram-LM fluency scoring (TextAnalysis.bigramLmScore) — per-doc
      // mean ln P(w2|w1) under the corpus's own bigram table; the
      // conditional upgrade of x36.
      (s: SparkSession, dir: String) =>
        TextAnalysis.bigramLmScore(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |bi AS (SELECT doc_id, unnest(t[1:len(t)-1]) AS w1,
        |unnest(t[2:len(t)]) AS w2 FROM tok WHERE len(t) >= 2),
        |bc AS (SELECT w1, w2, count(*) AS bc FROM bi GROUP BY 1, 2),
        |uc AS (SELECT w1, CAST(sum(bc) AS DOUBLE) AS uc FROM bc GROUP BY 1)
        |SELECT bi.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |round(sum(ln(CAST(bc.bc AS DOUBLE) / uc.uc)) / count(*), 4) AS bi_score
        |FROM bi JOIN bc USING (w1, w2) JOIN uc USING (w1)
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    ("x62_length_outliers",
      // Robust per-source Tukey-fence outlier gate
      // (TextAnalysis.lengthOutliers) — quartile fences broadcast back,
      // corpus never shuffles; fences rounded 4 dp pre-comparison.
      (s: SparkSession, dir: String) =>
        TextAnalysis.lengthOutliers(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH st AS (SELECT source,
        |round(quantile_cont(n_chars, 0.25), 4) AS q1,
        |round(quantile_cont(n_chars, 0.75), 4) AS q3
        |FROM documents GROUP BY 1),
        |b AS (SELECT source, round(q1 - 1.5*(q3-q1), 4) AS lo,
        |round(q3 + 1.5*(q3-q1), 4) AS hi FROM st)
        |SELECT doc_id, d.source, n_chars, lo, hi
        |FROM documents d JOIN b USING (source)
        |WHERE CAST(n_chars AS DOUBLE) < lo OR CAST(n_chars AS DOUBLE) > hi
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("j12_cooccurrence_pmi",
      // Item-item co-occurrence + PMI (Graph.cooccurrencePmi) over the
      // click log's item facet (props.k) — the "related items" bipartite
      // projection, pairs with >= 5 shared distinct users.
      (s: SparkSession, dir: String) =>
        graft.operators.Graph.cooccurrencePmi(
          Tables.events(s, dir).filter(col("event_type") === "click")
            .select(col("user_id"),
              get_json_object(col("props"), "$.k").cast("int").as("item")),
          "user_id", "item", 5L)
          .orderBy(col("item_a"), col("item_b")),
      Some("""WITH ui AS (SELECT DISTINCT user_id,
        |CAST(json_extract(props, '$.k') AS INT) AS item
        |FROM events WHERE event_type = 'click'),
        |c AS (SELECT item, count(*) AS c1 FROM ui GROUP BY 1),
        |n AS (SELECT CAST(count(DISTINCT user_id) AS DOUBLE) AS nu FROM ui),
        |p AS (SELECT a.item AS item_a, b.item AS item_b, count(*) AS c12
        |FROM ui a JOIN ui b ON a.user_id = b.user_id AND a.item < b.item
        |GROUP BY 1, 2)
        |SELECT item_a, item_b, CAST(c12 AS BIGINT) AS c12,
        |round(ln(nu * c12 / (CAST(ca.c1 AS DOUBLE) * cb.c1)), 4) AS pmi
        |FROM p JOIN c ca ON p.item_a = ca.item
        |JOIN c cb ON p.item_b = cb.item, n
        |WHERE c12 >= 5
        |ORDER BY item_a, item_b""".stripMargin.replace("\n", " "))),

    ("s15_stream_transitions",
      // J15 under streaming: the transition matrix folded incrementally
      // over three time-sliced micro-batches — within-batch lag pairs
      // plus the carried last-event boundary pair merge through the
      // additive upsert; per-user last-event state in a replace sink.
      // Union over time-disjoint batches ≡ the one-shot window answer,
      // so j15's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s15")
        graft.streaming.Streaming.runStreamTransitions(s, dir,
            base + "/tr", Seq(T1, T2))
          .select(col("from_type"), col("to_type"),
            col("n").cast("long").as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH o AS (SELECT user_id, event_type, lag(event_type) OVER
        |(PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        |FROM events)
        |SELECT prev AS from_type, event_type AS to_type,
        |CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"""
        .stripMargin.replace("\n", " "))),

    ("x67_novelty",
      // N-gram novelty (TextAnalysis.ngramNovelty): share of each doc's
      // distinct 3-grams with corpus df = 1 — the diversity complement of
      // decontamination overlap.
      (s: SparkSession, dir: String) =>
        TextAnalysis.ngramNovelty(Tables.documents(s, dir), 3)
          .orderBy(col("doc_id")),
      Some("""WITH tok AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |g AS (SELECT DISTINCT doc_id, unnest(CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END) AS s FROM tok),
        |df AS (SELECT s, count(*) AS df FROM g GROUP BY 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        |CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
        |round(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |  / count(*), 4) AS novelty
        |FROM g JOIN df USING (s) GROUP BY 1 ORDER BY 1"""
        .stripMargin.replace("\n", " "))),

    ("j15_transition_matrix",
      // Event-type transition (Markov) matrix: per-user time-ordered lag
      // pairs counted at (from, to) grain — path analysis. One
      // user-partitioned window (never global) + one bounded agg
      // (|types|² rows out).
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(unix_millis(col("ts")), col("event_id"))
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
          .withColumn("_prev", lag(col("event_type"), 1).over(w))
          .filter(col("_prev").isNotNull)
          .groupBy(col("_prev").as("from_type"), col("event_type").as("to_type"))
          .agg(count(lit(1)).cast("long").as("n"))
          .orderBy(col("from_type"), col("to_type"))
      },
      Some("""WITH o AS (SELECT user_id, event_type, lag(event_type) OVER
        |(PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev
        |FROM events)
        |SELECT prev AS from_type, event_type AS to_type,
        |CAST(count(*) AS BIGINT) AS n
        |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2 ORDER BY 1, 2"""
        .stripMargin.replace("\n", " "))),

    ("j16_cdc_apply",
      // CDC change-log collapse: the events log read as an op stream over
      // user_id (event_type 'error' = the delete tombstone, anything else
      // an upsert), folded to final per-key state — last writer by
      // (ts, event_id) wins, keys whose last op is a delete vanish. ONE
      // map-side-combined max_by hash agg (the exchange carries keys, not
      // the log) vs the window phrasing that sorts and ships every row.
      (s: SparkSession, dir: String) =>
        graft.operators.Merge.applyChangeLog(
            Tables.events(s, dir)
              .select(col("user_id"), col("event_type").as("op"),
                col("event_type").as("last_type"), col("value"),
                unix_millis(col("ts")).as("ts"), col("event_id")),
            Seq("user_id"), "op", "error", Seq("ts", "event_id"))
          .select(col("user_id"), col("last_type"),
            round(col("value"), 2).as("last_value"), col("ts"))
          .orderBy(col("user_id")),
      Some(cdcApplyOracleSql)),

    ("s16_stream_cdc",
      // STREAMING CDC maintenance: the same op log folded incrementally —
      // three time-sliced micro-batches, each union+re-collapsed into a
      // versioned state snapshot behind a `_current` pointer flip
      // (tombstones persist as rows; readers filter). The collapse is
      // order-insensitive (per-key max over a total order), so the final
      // state ≡ one-shot j16 for any slicing — j16's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s16")
        graft.streaming.Streaming.runStreamCdc(s, dir, base + "/cdc",
            Seq(T1, T2))
          .orderBy(col("user_id"))
      },
      Some(cdcApplyOracleSql)),

    ("j17_rolling_features",
      // Per-user trailing range-frame features (feature-store staple):
      // every event stamped with its user's 7d/24h trailing count and
      // value sum AS OF that event — point-in-time correct by frame
      // construction. One Exchange on user_id + one per-key sort serves
      // all four frames; never a global sort.
      (s: SparkSession, dir: String) =>
        Serving.rollingFeatures(
            Tables.events(s, dir).select(col("event_id"), col("user_id"),
              unix_millis(col("ts")).as("ts"), col("value")),
            "user_id", "ts", "value",
            Seq(("7d", 604800000L), ("24h", 86400000L)))
          .orderBy(col("event_id")),
      Some("""WITH e AS (SELECT event_id, user_id,
        |CAST(epoch_ms(ts) AS BIGINT) AS ts, value FROM events)
        |SELECT event_id, user_id, ts, value,
        |CAST(count(*) OVER w7 AS BIGINT) AS n_7d,
        |round(sum(value) OVER w7, 2) AS sum_7d,
        |CAST(count(*) OVER w1 AS BIGINT) AS n_24h,
        |round(sum(value) OVER w1, 2) AS sum_24h
        |FROM e
        |WINDOW w7 AS (PARTITION BY user_id ORDER BY ts
        |RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW),
        |w1 AS (PARTITION BY user_id ORDER BY ts
        |RANGE BETWEEN 86399999 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin.replace("\n", " "))),

    ("j18_grouping_sets",
      // Arbitrary GROUPING SETS — completes the multi-grain family (j5
      // ROLLUP is prefix-closed, j8 CUBE is the power set; grouping sets
      // are the explicitly-chosen strata): (type, day), (type), (day) in
      // ONE Expand + hash-agg pass, GROUPING() flags disambiguating the
      // grouped-out nulls. Within a stratum the grouped-out column is
      // constant null, so the ORDER BY is engine-portable.
      (s: SparkSession, dir: String) => {
        Tables.events(s, dir).createOrReplaceTempView("g_events")
        s.sql("""SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
          CAST(grouping(event_type) AS INT) AS g_type,
          CAST(grouping(day) AS INT) AS g_day
          FROM (SELECT event_type, unix_millis(ts) div 86400000 AS day
                FROM g_events)
          GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
          ORDER BY g_type, g_day, event_type, day""")
      },
      Some("""SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
        |CAST(grouping(event_type) AS INT) AS g_type,
        |CAST(grouping(day) AS INT) AS g_day
        |FROM (SELECT event_type, epoch_ms(ts) // 86400000 AS day FROM events)
        |GROUP BY GROUPING SETS ((event_type, day), (event_type), (day))
        |ORDER BY g_type, g_day, event_type, day"""
        .stripMargin.replace("\n", " "))),

    ("q28_conversion_latency",
      // Conversion-latency distribution: first view -> first subsequent
      // purchase per user, exact latency percentiles over converters —
      // the funnel's timing complement (q24). Two user-grain min aggs
      // co-partitioned on user_id, one scalar percentile agg.
      (s: SparkSession, dir: String) => {
        val e = Tables.events(s, dir).select(col("user_id"),
          col("event_type"), unix_millis(col("ts")).as("_ms"))
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("_ms")).as("_view"))
        val p = e.join(v, "user_id")
          .filter(col("event_type") === "purchase" && col("_ms") > col("_view"))
          .groupBy(col("user_id")).agg(min(col("_ms")).as("_purch"))
        v.join(p, "user_id")
          .select((col("_purch") - col("_view")).as("_lat"))
          .agg(count(lit(1)).cast("long").as("n_converted"),
            round(expr("percentile(_lat, 0.5)"), 4).as("p50_ms"),
            round(expr("percentile(_lat, 0.9)"), 4).as("p90_ms"),
            round(expr("percentile(_lat, 0.99)"), 4).as("p99_ms"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms
        |FROM events),
        |v AS (SELECT user_id, min(ms) AS view_ms FROM e
        |WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ms) AS purch_ms FROM e JOIN v
        |USING (user_id)
        |WHERE e.event_type = 'purchase' AND e.ms > v.view_ms GROUP BY 1),
        |lat AS (SELECT v.user_id, purch_ms - view_ms AS lat_ms
        |FROM v JOIN p USING (user_id))
        |SELECT CAST(count(*) AS BIGINT) AS n_converted,
        |round(quantile_cont(lat_ms, 0.5), 4) AS p50_ms,
        |round(quantile_cont(lat_ms, 0.9), 4) AS p90_ms,
        |round(quantile_cont(lat_ms, 0.99), 4) AS p99_ms
        |FROM lat""".stripMargin.replace("\n", " "))),

    ("x66_random_projection",
      // Johnson-Lindenstrauss sign projection 64 -> 16 dims
      // (Similarity.randomProjection): deterministic ±1/√m literal matrix
      // in one codegen projection, zero shuffles; output is the per-vector
      // norm-distortion audit the JL lemma bounds.
      (s: SparkSession, dir: String) =>
        Similarity.randomProjection(
          Tables.embeddings(s, dir), "vec_id", "embedding", 16, 64, "rp")
          .orderBy(col("vec_id")),
      Some(rpOracleSql)),

    ("x65_quality_ensemble",
      // Multi-signal quality ensemble (TextAnalysis.qualityEnsemble):
      // token count, punct density, char entropy each vs its corpus
      // median; survivors pass >= 2 of 3.
      (s: SparkSession, dir: String) =>
        TextAnalysis.qualityEnsemble(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH c AS (SELECT doc_id,
        |unnest(list_transform(range(1, length(text)+1),
        |  x -> substring(text, CAST(x AS INT), 1))) AS ch FROM documents),
        |cnt AS (SELECT doc_id, ch, count(*) AS n FROM c GROUP BY 1, 2),
        |ent AS (SELECT doc_id, round(log2(CAST(sum(n) AS DOUBLE))
        |  - sum(CAST(n AS DOUBLE) * log2(CAST(n AS DOUBLE)))
        |    / CAST(sum(n) AS DOUBLE), 4) AS ent FROM cnt GROUP BY 1),
        |sig AS (SELECT d.doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |  t -> t <> '')) AS DOUBLE) AS ntok,
        |round(CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
        |  AS DOUBLE) / greatest(length(text), 1), 4) AS punct,
        |ent FROM documents d JOIN ent ON d.doc_id = ent.doc_id),
        |med AS (SELECT round(quantile_cont(ntok, 0.5), 4) AS m_ntok,
        |round(quantile_cont(punct, 0.5), 4) AS m_punct,
        |round(quantile_cont(ent, 0.5), 4) AS m_ent FROM sig)
        |SELECT doc_id, CAST(ntok >= m_ntok AS INT)
        |  + CAST(punct <= m_punct AS INT)
        |  + CAST(ent >= m_ent AS INT) AS n_pass
        |FROM sig, med
        |WHERE CAST(ntok >= m_ntok AS INT) + CAST(punct <= m_punct AS INT)
        |  + CAST(ent >= m_ent AS INT) >= 2
        |ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("q27_decayed_counts",
      // Exponential-decay trend counts (tau = 7 days): recency-weighted
      // activity per type — the "trending now" serving scalar. The
      // anchor (max ts) is one scalar agg broadcast back; the decay sum
      // is a single map-side-combined agg over a codegen exp projection.
      (s: SparkSession, dir: String) => {
        val mx = Tables.events(s, dir)
          .agg(max(unix_millis(col("ts"))).cast("double").as("_mts"))
        Tables.events(s, dir).crossJoin(broadcast(mx))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum(exp((unix_millis(col("ts")) - col("_mts")) /
              604800000.0d)), 4).as("decayed"))
          .orderBy(col("event_type"))
      },
      Some("""WITH mx AS (SELECT CAST(max(epoch_ms(ts)) AS DOUBLE) AS mts
        |FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |round(sum(exp((epoch_ms(ts) - mts) / 604800000.0)), 4) AS decayed
        |FROM events, mx GROUP BY event_type ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("j14_retention_cohorts",
      // Retention cohort matrix: cohort = user's first activity day,
      // counts of distinct users active at each day offset 0..7 — the
      // product-analytics staple. User-grain min agg joins back
      // co-partitioned on user_id; the (cohort, offset) agg is distinct
      // user counts at cohort-day grain.
      (s: SparkSession, dir: String) => {
        val ev = Tables.events(s, dir)
          .select(col("user_id"), date_trunc("day", col("ts")).as("_day"))
        val f = ev.groupBy(col("user_id")).agg(min(col("_day")).as("_cohort"))
        ev.join(f, "user_id")
          .select(col("user_id"), col("_cohort"),
            datediff(col("_day"), col("_cohort")).as("_off"))
          .distinct()
          .filter(col("_off") <= 7)
          .groupBy(unix_millis(col("_cohort")).as("cohort_ms"),
            col("_off").cast("long").as("offset_d"))
          .agg(count(lit(1)).cast("long").as("n_users"))
          .orderBy(col("cohort_ms"), col("offset_d"))
      },
      Some("""WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
        |FROM events GROUP BY 1),
        |act AS (SELECT DISTINCT e.user_id, f.cohort,
        |date_diff('day', f.cohort, date_trunc('day', e.ts)) AS offset_d
        |FROM events e JOIN f USING (user_id))
        |SELECT epoch_ms(cohort) AS cohort_ms, CAST(offset_d AS BIGINT)
        |  AS offset_d, CAST(count(*) AS BIGINT) AS n_users
        |FROM act WHERE offset_d <= 7 GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin.replace("\n", " "))),

    ("x64_knn_outliers",
      // kNN-density outlier mining (Similarity.knnDensityOutliers): each
      // vector's sim to its 10th neighbor through the shared IVF probe as
      // a density proxy; the 25 most isolated vectors surface for review.
      (s: SparkSession, dir: String) =>
        Similarity.knnDensityOutliers(
          Tables.embeddings(s, dir), "vec_id", "embedding", 10, 16, 4, 25),
      Some(knnOutlierOracleSql)),

    ("x63_approx_quantiles",
      // Mergeable quantile SKETCH path (percentile_approx / Greenwald-
      // Khanna): the 100 TB replacement for x24's exact percentile — the
      // sketch aggregates map-side and merges across partitions, the
      // shuffle carries summaries, never values. At this accuracy
      // (1e6 ≫ group sizes) GK stores every value, so the result is
      // EXACT and the oracle is DuckDB's discrete quantile.
      (s: SparkSession, dir: String) =>
        Tables.documents(s, dir)
          .groupBy(col("lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"),
            expr("percentile_approx(n_chars, array(0.5, 0.9, 0.99), 1000000)")
              .as("_q"))
          .select(col("lang"), col("n_docs"),
            element_at(col("_q"), 1).cast("long").as("p50"),
            element_at(col("_q"), 2).cast("long").as("p90"),
            element_at(col("_q"), 3).cast("long").as("p99"))
          .orderBy(col("lang")),
      Some("""SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |quantile_disc(n_chars, 0.5) AS p50,
        |quantile_disc(n_chars, 0.9) AS p90,
        |quantile_disc(n_chars, 0.99) AS p99
        |FROM documents GROUP BY lang ORDER BY lang"""
        .stripMargin.replace("\n", " "))),

    ("j13_rate_anomaly",
      // Event-rate anomaly detection: per-type daily counts z-scored
      // against that type's own mean/stddev — the ingest-monitoring
      // query run before trusting a day's data. Two map-side-combined
      // aggs (day grain, then type grain — 5 rows) + a broadcast join
      // back; σ=0 types (constant rate) get z=0, not NaN. Emits EVERY
      // day with its z so the audit is reviewable, anomalies flagged at
      // |z| >= 2 on the UNROUNDED z (both engines).
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("day", col("ts"))).as("day_ms"))
          .agg(count(lit(1)).as("n"))
        val st = daily.groupBy(col("event_type")).agg(
          avg(col("n")).as("_m"), stddev_samp(col("n")).as("_s"))
        val z = when(col("_s").isNull || col("_s") === 0.0, 0.0)
          .otherwise((col("n") - col("_m")) / col("_s"))
        daily.join(broadcast(st), "event_type")
          .select(col("event_type"), col("day_ms"),
            col("n").cast("long").as("n"), round(z, 4).as("z"),
            when(abs(z) >= 2.0, 1).otherwise(0).as("is_anomaly"))
          .orderBy(col("event_type"), col("day_ms"))
      },
      Some("""WITH d AS (SELECT event_type,
        |epoch_ms(date_trunc('day', ts)) AS day_ms, count(*) AS n
        |FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(n) AS m, stddev_samp(n) AS s
        |FROM d GROUP BY 1)
        |SELECT d.event_type, day_ms, CAST(n AS BIGINT) AS n,
        |round(CASE WHEN s = 0 OR s IS NULL THEN 0.0
        |  ELSE (n - m) / s END, 4) AS z,
        |CAST(abs(CASE WHEN s = 0 OR s IS NULL THEN 0.0
        |  ELSE (n - m) / s END) >= 2 AS INT) AS is_anomaly
        |FROM d JOIN st USING (event_type)
        |ORDER BY event_type, day_ms""".stripMargin.replace("\n", " "))),

    ("s14_stream_topk",
      // Streaming running top-k leaderboard: x57's bounded aggregate as a
      // streaming STATEFUL aggregation over a three-slice replay — state
      // per event_type is the k-capped buffer, update-mode re-emissions
      // replace-upsert the exploded ranks. Oracle is the one-shot window
      // ground truth over all events.
      (s: SparkSession, dir: String) => {
        val base = scratch("s14")
        graft.streaming.Streaming.runStreamTopK(s, dir, base + "/tk", 3)
          .select(col("event_type"), col("rnk"), col("event_id"),
            round(col("value"), 4).as("value"))
          .orderBy(col("event_type"), col("rnk"))
      },
      Some("""WITH r AS (SELECT event_type, event_id, value,
        |row_number() OVER (PARTITION BY event_type
        |  ORDER BY value DESC, event_id) AS rnk
        |FROM events)
        |SELECT event_type, CAST(rnk AS BIGINT) AS rnk, event_id,
        |round(value, 4) AS value
        |FROM r WHERE rnk <= 3 ORDER BY event_type, rnk"""
        .stripMargin.replace("\n", " "))),

    ("j19_max_concurrency",
      // Sweep-line interval concurrency over the s10 stream sessions: the
      // step function of how many channels were live at once (peak-
      // concurrency — the capacity metric the reference's streams table
      // exists to answer). Distributed prefix sum: t-grain net deltas,
      // day-bucket carry-ins as bounded driver metadata broadcast back,
      // per-bucket parallel windows — never a global single-task window.
      (s: SparkSession, dir: String) =>
        graft.operators.Overlap.concurrency(
          graft.operators.Sessionize.sessions(
            Tables.messages(s, dir).select(col("channel"),
              timestamp_millis(unix_millis(col("ts"))).as("ts")),
            Seq("channel"), "ts", 1800000L),
          "started_at", "ended_at")
          .orderBy(col("t")),
      Some("""WITH e AS (SELECT event_type AS channel, epoch_ms(ts) AS t FROM events),
        |d AS (SELECT channel, t, CASE WHEN t - lag(t) OVER
        |  (PARTITION BY channel ORDER BY t) >= 1800000 THEN 1 ELSE 0 END AS ns FROM e),
        |g AS (SELECT channel, t, sum(ns) OVER (PARTITION BY channel ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM d),
        |sess AS (SELECT channel, min(t) AS started_at, max(t) + 1800000 AS ended_at
        |  FROM g GROUP BY channel, sid),
        |deltas AS (SELECT started_at AS t, 1 AS delta FROM sess
        |  UNION ALL SELECT ended_at AS t, -1 AS delta FROM sess),
        |steps AS (SELECT t, sum(delta) AS net FROM deltas GROUP BY t)
        |SELECT t, CAST(sum(net) OVER (ORDER BY t
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS concurrent
        |FROM steps ORDER BY t""".stripMargin.replace("\n", " "))),

    ("x74_hll_distinct",
      // HyperLogLog distinct users per (day, event_type) — the relational
      // sketch: registers are a second grouping level (two map-side-
      // combined aggs), ranks are exact integers via length(bin(w)), the
      // 2^-M sums are exact doubles, and the md5 hash family makes every
      // register engine-portable. Linear counting below 2.5m (the
      // standard small-range correction).
      (s: SparkSession, dir: String) =>
        graft.operators.Sketch.hllDistinct(
          Tables.events(s, dir).select(
            unix_millis(date_trunc("day", col("ts"))).as("day"),
            col("event_type"), col("user_id")),
          Seq("day", "event_type"), "user_id", 8)
          .orderBy(col("day"), col("event_type")),
      Some("""WITH h AS (SELECT DISTINCT epoch_ms(date_trunc('day', ts)) AS day,
        |event_type,
        |('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM events),
        |br AS (SELECT day, event_type, hv // 16777216 AS bucket,
        |CASE WHEN hv % 16777216 = 0 THEN 25
        |     ELSE 25 - length(bin(hv % 16777216)) END AS rank FROM h),
        |reg AS (SELECT day, event_type, bucket, max(rank) AS m FROM br GROUP BY 1, 2, 3),
        |agg AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS v_buckets,
        |CAST(max(m) AS BIGINT) AS max_rank, sum(power(2.0, -m)) AS s FROM reg GROUP BY 1, 2),
        |est AS (SELECT day, event_type, v_buckets, max_rank,
        |(0.7213 / (1 + 1.079 / 256)) * 65536 / ((256 - v_buckets) + s) AS raw FROM agg)
        |SELECT day, event_type, v_buckets, max_rank,
        |round(CASE WHEN raw <= 640 AND v_buckets < 256
        |  THEN 256 * ln(256.0 / (256 - v_buckets)) ELSE raw END, 2) AS n_est
        |FROM est ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    ("x75_rrf_fusion",
      // Hybrid retrieval: BM25 top-20 (x45's lexical list) fused with
      // embedding-cosine top-20 (x3's semantic list, doc_id ≡ vec_id) by
      // reciprocal-rank fusion, 1/(60+rank) per list. Ranks come from the
      // range-partition+zipWithIndex path (never a global window); the
      // fuse itself is a union + one tiny hash agg over ≤ 2k rows.
      (s: SparkSession, dir: String) => {
        val lex = Serving.ranked(
          TextAnalysis.bm25Search(Tables.documents(s, dir), "doc_id", "text",
            Seq("hash", "join", "scan"), 20),
          "bm25", "doc_id").select(col("doc_id"), col("rank"))
        val sem = Serving.ranked(
          Similarity.cosineTopK(Tables.embeddings(s, dir), "vec_id",
            "embedding", 0L, 20).select(col("vec_id").as("doc_id"), col("sim")),
          "sim", "doc_id").select(col("doc_id"), col("rank"))
        TextAnalysis.rrfFusion(Seq(("lex", lex), ("sem", sem)), "doc_id", 10)
          .orderBy(col("rrf").desc, col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(sum(len(t)) AS BIGINT) AS total_len,
        |CAST(sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |CAST(sum(CASE WHEN list_contains(t, 'scan') THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |FROM toks),
        |sc AS (SELECT doc_id,
        |len(list_filter(t, x -> x = 'hash')) AS tf0,
        |len(list_filter(t, x -> x = 'join')) AS tf1,
        |len(list_filter(t, x -> x = 'scan')) AS tf2,
        |len(t) AS dl, n_docs, total_len, df0, df1, df2 FROM toks, stats),
        |s2 AS (SELECT doc_id,
        |ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE))) AS score,
        |tf0 + tf1 + tf2 AS ntf FROM sc),
        |lex AS (SELECT doc_id, row_number() OVER (ORDER BY round(score, 4) DESC, doc_id) AS r
        |FROM s2 WHERE ntf > 0 QUALIFY r <= 20),
        |q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        |simt AS (SELECT vec_id,
        |round(list_reduce(list_transform(generate_series(1, len(embedding)),
        |  i -> CAST(embedding[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a,b) -> a+b)
        |/ (sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
        |  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a+b))
        |* sqrt(list_reduce(list_transform(generate_series(1, len(qv)),
        |  i -> CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE)), (a,b) -> a+b))), 6) AS sim
        |FROM embeddings, q WHERE vec_id <> 0),
        |sem AS (SELECT vec_id AS doc_id, row_number() OVER (ORDER BY sim DESC, vec_id) AS r
        |FROM simt QUALIFY r <= 20),
        |fused AS (SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
        |round(COALESCE(1.0/(60+lex.r), 0) + COALESCE(1.0/(60+sem.r), 0), 6) AS rrf,
        |CAST(COALESCE(lex.r, 0) AS BIGINT) AS lex_rank,
        |CAST(COALESCE(sem.r, 0) AS BIGINT) AS sem_rank
        |FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
        |SELECT doc_id, rrf, lex_rank, sem_rank FROM fused
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin.replace("\n", " "))),

    ("x76_source_overlap",
      // Cross-source contamination matrix: pairs of sources sharing an
      // 8-token prefix fingerprint (template/syndication leakage report).
      // Fingerprint-grain aggregation → array-local pair expansion
      // (bounded by the source dictionary) → pair-grain agg; never a
      // fingerprint self-join.
      (s: SparkSession, dir: String) =>
        Dedup.sourceOverlapMatrix(Tables.documents(s, dir),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 8), " "),
          "source")
          .orderBy(col("src_a"), col("src_b")),
      Some("""WITH f AS (SELECT source,
        |array_to_string(list_filter(regexp_split_to_array(text, '\s+'),
        |  t -> t <> '')[1:8], ' ') AS fp FROM documents),
        |p AS (SELECT DISTINCT fp, a.source AS src_a, b.source AS src_b
        |FROM f a JOIN f b USING (fp) WHERE a.source < b.source)
        |SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS shared_fps
        |FROM p GROUP BY 1, 2 ORDER BY src_a, src_b"""
        .stripMargin.replace("\n", " "))),

    ("x77_l_diversity",
      // l-diversity audit over documents: quasi-identifiers (lang,
      // 200-char size bucket) vs the sensitive `source` — groups whose
      // sources are too homogeneous (l < 14) leak provenance even when
      // k-anonymous. Full audit table with the risky flag, one agg.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.lDiversityAudit(
          Tables.documents(s, dir).select(col("lang"),
            expr("n_chars div 200").as("size_bucket"), col("source")),
          Seq("lang", "size_bucket"), "source", 14),
      Some("""SELECT lang, n_chars // 200 AS size_bucket,
        |CAST(count(*) AS BIGINT) AS group_size,
        |CAST(count(DISTINCT source) AS BIGINT) AS l_distinct,
        |CAST(count(DISTINCT source) < 14 AS INT) AS risky
        |FROM documents GROUP BY 1, 2
        |ORDER BY l_distinct, lang, size_bucket"""
        .stripMargin.replace("\n", " "))),

    ("x78_stopword_discovery",
      // Corpus-driven stoplist: tokens document-frequent in >= 40% of
      // docs (vs x52's FIXED external vocabulary). Vocabulary-grain agg +
      // broadcast scalar doc count.
      (s: SparkSession, dir: String) =>
        TextAnalysis.stopwordDiscovery(Tables.documents(s, dir), "text", 0.4)
          .orderBy(col("df").desc, col("tok")),
      Some("""WITH toks AS (SELECT doc_id,
        |unnest(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
        |  t -> t <> ''))) AS tok FROM documents),
        |n AS (SELECT count(*) AS n_docs FROM documents),
        |d AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok)
        |SELECT tok, df, round(df * 1.0 / n_docs, 4) AS doc_frac
        |FROM d, n WHERE df * 1.0 / n_docs >= 0.4
        |ORDER BY df DESC, tok""".stripMargin.replace("\n", " "))),

    ("j20_weighted_median",
      // Exact weighted median of line price weighted by quantity per
      // return flag: one exchange serves both windows (running cumsum +
      // group total), filter + min — the robust-center statistic under
      // price skew.
      (s: SparkSession, dir: String) =>
        Serving.weightedMedian(
          Tables.lineitem(s, dir).select(col("l_returnflag").as("flag"),
            col("l_extendedprice").as("v"), col("l_quantity").as("wt")),
          Seq("flag"), "v", "wt")
          .orderBy(col("flag")),
      Some("""WITH w AS (SELECT l_returnflag AS flag, l_extendedprice AS v,
        |l_quantity AS wt FROM lineitem),
        |c AS (SELECT flag, v, wt,
        |sum(wt) OVER (PARTITION BY flag ORDER BY v, wt
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
        |sum(wt) OVER (PARTITION BY flag) AS tw FROM w)
        |SELECT flag, round(min(v), 2) AS wmedian FROM c
        |WHERE cw >= tw / 2 GROUP BY flag ORDER BY flag"""
        .stripMargin.replace("\n", " "))),

    ("x79_incremental_hll",
      // Incremental sketch maintenance (the x33 discipline applied to
      // x74): a 10% hash slice of events plays the "new batch", the rest
      // the summarized corpus; each side's HLL register TABLE is built
      // independently and merged at register grain (max is associative
      // and idempotent) — the estimate must equal the one-shot x74
      // exactly, which is what the shared oracle asserts.
      (s: SparkSession, dir: String) => {
        val ev = Tables.events(s, dir).select(col("event_id"),
          unix_millis(date_trunc("day", col("ts"))).as("day"),
          col("event_type"), col("user_id"))
        val b = graft.operators.Sampling.hashBucket(col("event_id"), "ihll", 100)
        val keys = Seq("day", "event_type")
        val merged = graft.operators.Sketch.hllMergeRegisters(
          graft.operators.Sketch.hllRegisters(ev.filter(b >= 10), keys, "user_id", 8),
          graft.operators.Sketch.hllRegisters(ev.filter(b < 10), keys, "user_id", 8),
          keys)
        graft.operators.Sketch.hllEstimate(merged, keys, 8)
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH h AS (SELECT DISTINCT epoch_ms(date_trunc('day', ts)) AS day,
        |event_type,
        |('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM events),
        |br AS (SELECT day, event_type, hv // 16777216 AS bucket,
        |CASE WHEN hv % 16777216 = 0 THEN 25
        |     ELSE 25 - length(bin(hv % 16777216)) END AS rank FROM h),
        |reg AS (SELECT day, event_type, bucket, max(rank) AS m FROM br GROUP BY 1, 2, 3),
        |agg AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS v_buckets,
        |CAST(max(m) AS BIGINT) AS max_rank, sum(power(2.0, -m)) AS s FROM reg GROUP BY 1, 2),
        |est AS (SELECT day, event_type, v_buckets, max_rank,
        |(0.7213 / (1 + 1.079 / 256)) * 65536 / ((256 - v_buckets) + s) AS raw FROM agg)
        |SELECT day, event_type, v_buckets, max_rank,
        |round(CASE WHEN raw <= 640 AND v_buckets < 256
        |  THEN 256 * ln(256.0 / (256 - v_buckets)) ELSE raw END, 2) AS n_est
        |FROM est ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    ("x83_zipf_fit",
      // Corpus-health Zipf fit: slope/r² of log-freq vs log-rank over the
      // top-200 token types — natural text sits near -1; this synthetic
      // corpus's flat slope is exactly what the metric is built to
      // expose. Vocab-grain agg → TakeOrdered → zipWithIndex ranks → one
      // scalar moment aggregate.
      (s: SparkSession, dir: String) =>
        TextAnalysis.zipfFit(Tables.documents(s, dir), "text", 200),
      Some("""WITH toks AS (SELECT unnest(list_filter(
        |regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok FROM documents),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
        |top AS (SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank
        |FROM f QUALIFY rank <= 200)
        |SELECT CAST(count(*) AS BIGINT) AS n_tokens,
        |round(regr_slope(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS zipf_slope,
        |round(regr_r2(ln(CAST(freq AS DOUBLE)), ln(CAST(rank AS DOUBLE))), 4) AS r2
        |FROM top""".stripMargin.replace("\n", " "))),

    ("x84_vocab_coverage",
      // Tokenizer-vocab sizing curve: share of all token occurrences the
      // top-k types cover, k in {5, 10, 20}. Vocab-grain agg +
      // zipWithIndex ranks + one broadcast scalar total.
      (s: SparkSession, dir: String) =>
        TextAnalysis.vocabCoverage(Tables.documents(s, dir), "text",
          Seq(5, 10, 20))
          .orderBy(col("k")),
      Some("""WITH toks AS (SELECT unnest(list_filter(
        |regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok FROM documents),
        |f AS (SELECT tok, CAST(count(*) AS BIGINT) AS freq FROM toks GROUP BY tok),
        |tot AS (SELECT sum(freq) AS t FROM f),
        |rk AS (SELECT tok, freq, row_number() OVER (ORDER BY freq DESC, tok) AS rank FROM f),
        |ks AS (SELECT CAST(unnest([5, 10, 20]) AS BIGINT) AS k)
        |SELECT k, CAST(sum(CASE WHEN rank <= k THEN freq ELSE 0 END) AS BIGINT) AS covered,
        |CAST(any_value(t) AS BIGINT) AS total,
        |round(sum(CASE WHEN rank <= k THEN freq ELSE 0 END) * 1.0 / any_value(t), 4) AS coverage
        |FROM rk, ks, tot GROUP BY k ORDER BY k"""
        .stripMargin.replace("\n", " "))),

    ("j22_equiheight_hist",
      // Equi-height histogram of event values: rows bucketed by the
      // column's own exact decile edges (x80's complement for long
      // tails); the edge list is bounded driver metadata inlined as
      // codegen literal comparisons.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.equiHeightHistogram(
          Tables.events(s, dir).select(col("value")), "value", 10)
          .orderBy(col("bucket")),
      Some("""WITH e AS (SELECT quantile_disc(value,
        |[0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q FROM events),
        |b AS (SELECT value,
        |1 + len(list_filter((SELECT q FROM e), x -> value > x)) AS bucket
        |FROM events)
        |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
        |round(min(value), 4) AS lo, round(max(value), 4) AS hi
        |FROM b GROUP BY bucket ORDER BY bucket"""
        .stripMargin.replace("\n", " "))),

    ("j21_mad",
      // Robust spread per event type: median absolute deviation — the
      // outlier-immune stddev (q16's robust sibling). Two sketch
      // aggregates + one broadcast of the group-grain median table.
      (s: SparkSession, dir: String) =>
        Serving.medianAbsoluteDeviation(
          Tables.events(s, dir).select(col("event_type"), col("value")),
          Seq("event_type"), "value")
          .orderBy(col("event_type")),
      Some("""WITH med AS (SELECT event_type, quantile_disc(value, 0.5) AS m
        |FROM events GROUP BY 1),
        |dev AS (SELECT e.event_type, med.m, abs(e.value - med.m) AS d
        |FROM events e JOIN med USING (event_type)),
        |mad AS (SELECT event_type, round(any_value(m), 4) AS median,
        |round(quantile_disc(d, 0.5), 4) AS mad FROM dev GROUP BY 1)
        |SELECT event_type, median, mad FROM mad ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("m4_chunk_neardup",
      // Binary near-dup pairs from m3's CDC chunk index: payload pairs
      // sharing >= 3 distinct content-defined chunks, boilerplate chunks
      // (> 20 holders) dropped before the capped array-local pair
      // expansion — never a chunk self-join.
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal.chunkNearDupPairs(
          graft.operators.Multimodal.mediaFromDocuments(
            Tables.documents(s, dir)), 8, "0", 20, 3L)
          .orderBy(col("id_a"), col("id_b")),
      Some(s"WITH $chunkPairsCtes SELECT id_a, id_b, n_shared FROM mp " +
        "ORDER BY id_a, id_b")),

    ("m5_media_dup_groups",
      // Binary duplicate GROUPS: connected components over m4's chunk-
      // sharing pairs (a~b, b~c ⇒ one group) — the media-side twin of
      // x25's text clustering; per group the min-id label, member count,
      // and id span. Same min-label-propagation loop, same recursive-
      // closure oracle discipline.
      (s: SparkSession, dir: String) => {
        val pairs = graft.operators.Multimodal.chunkNearDupPairs(
          graft.operators.Multimodal.mediaFromDocuments(
            Tables.documents(s, dir)), 8, "0", 20, 3L)
        graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
          .groupBy(col("label").as("group_id"))
          .agg(count(lit(1)).cast("long").as("n_media"),
            max(col("node")).cast("long").as("max_member"))
          .orderBy(col("group_id"))
      },
      Some(s"""WITH RECURSIVE $chunkPairsCtes,
        |e AS (SELECT id_a AS a, id_b AS b FROM mp UNION SELECT id_b, id_a FROM mp),
        |reach(n, r) AS (
        |  SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
        |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1)
        |SELECT root AS group_id, CAST(count(*) AS BIGINT) AS n_media,
        |CAST(max(n) AS BIGINT) AS max_member
        |FROM comp GROUP BY 1 ORDER BY group_id""".stripMargin.replace("\n", " "))),

    ("x80_histogram",
      // Equal-width value histogram per event type (20 bins, sparse form)
      // — the dataset-card distribution profile. Group-grain (lo, hi)
      // broadcast back + one (group, bin) agg.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.histogram(
          Tables.events(s, dir).select(col("event_type"), col("value")),
          Seq("event_type"), "value", 20)
          .orderBy(col("event_type"), col("bin")),
      Some("""WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1),
        |h AS (SELECT e.event_type,
        |CAST(least(floor((e.value - b.lo) / ((b.hi - b.lo) / 20)), 19) AS BIGINT) AS bin
        |FROM events e JOIN b USING (event_type))
        |SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
        |FROM h GROUP BY 1, 2 ORDER BY event_type, bin"""
        .stripMargin.replace("\n", " "))),

    ("x81_quantile_drift",
      // Distribution-shift gate between corpus snapshots (x46's old/new
      // convention): exact discrete quantiles per side — one GK-sketch
      // aggregate each — compared per probability. A tail-heavy delta is
      // the truncation/unit-change signature the mean never shows.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Maintenance.quantileDrift(
          docs.filter(col("doc_id") % 7 =!= 0).select(col("n_chars")),
          docs.filter(col("doc_id") % 13 =!= 0).select(col("n_chars")),
          "n_chars", Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99))
          .orderBy(col("p"))
      },
      Some("""WITH o AS (SELECT quantile_disc(n_chars,
        |  [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS v
        |FROM documents WHERE doc_id % 7 <> 0),
        |n AS (SELECT quantile_disc(n_chars,
        |  [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS v
        |FROM documents WHERE doc_id % 13 <> 0),
        |p AS (SELECT CAST(unnest([0.1, 0.25, 0.5, 0.75, 0.9, 0.99]) AS DOUBLE) AS p,
        |generate_subscripts([0.1, 0.25, 0.5, 0.75, 0.9, 0.99], 1) AS i)
        |SELECT p.p, CAST(o.v[p.i] AS BIGINT) AS v_old,
        |CAST(n.v[p.i] AS BIGINT) AS v_new,
        |CAST(n.v[p.i] - o.v[p.i] AS BIGINT) AS delta
        |FROM p, o, n ORDER BY p.p""".stripMargin.replace("\n", " "))),

    ("x82_label_compactness",
      // Label-quality report: per-label centroid (6 dp float-quantized,
      // the kMeans determinism discipline) and the member-to-centroid
      // cosine distribution — a low min_cos names the label with
      // intruders (x54 then finds which vectors). Zero-join scoring pass
      // against one broadcast map literal.
      (s: SparkSession, dir: String) =>
        Similarity.labelCompactness(Tables.embeddings(s, dir), "vec_id",
          "embedding", "label")
          .orderBy(col("label")),
      Some("""WITH dims AS (SELECT label, i,
        |CAST(CAST(round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS REAL) AS DOUBLE) AS c
        |FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(i)
        |GROUP BY label, i),
        |cent AS (SELECT label, list(c ORDER BY i) AS cv FROM dims GROUP BY label),
        |s AS (SELECT e.vec_id, e.label,
        |round(list_reduce(list_transform(generate_series(1, len(embedding)),
        |  i -> CAST(embedding[i] AS DOUBLE) * cv[i]), (a,b) -> a+b)
        |/ (sqrt(list_reduce(list_transform(generate_series(1, len(embedding)),
        |  i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)), (a,b) -> a+b))
        |* sqrt(list_reduce(list_transform(generate_series(1, len(cv)),
        |  i -> cv[i] * cv[i]), (a,b) -> a+b))), 6) AS sim
        |FROM embeddings e JOIN cent USING (label))
        |SELECT label, CAST(count(*) AS BIGINT) AS n,
        |round(avg(sim), 4) AS mean_cos, round(min(sim), 4) AS min_cos
        |FROM s GROUP BY label ORDER BY label"""
        .stripMargin.replace("\n", " "))),

    ("s18_stream_hll",
      // x74's HLL under Structured Streaming: the register table IS the
      // state (one monotone max aggregate at (day, type, bucket) grain),
      // replace-upserted per micro-batch; the estimate folds at read
      // time. Must equal the one-shot batch sketch exactly — shared
      // oracle with x74.
      (s: SparkSession, dir: String) => {
        val base = scratch("s18")
        graft.streaming.Streaming.runStreamHll(s, dir, base + "/hll", 8)
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH h AS (SELECT DISTINCT epoch_ms(date_trunc('day', ts)) AS day,
        |event_type,
        |('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM events),
        |br AS (SELECT day, event_type, hv // 16777216 AS bucket,
        |CASE WHEN hv % 16777216 = 0 THEN 25
        |     ELSE 25 - length(bin(hv % 16777216)) END AS rank FROM h),
        |reg AS (SELECT day, event_type, bucket, max(rank) AS m FROM br GROUP BY 1, 2, 3),
        |agg AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS v_buckets,
        |CAST(max(m) AS BIGINT) AS max_rank, sum(power(2.0, -m)) AS s FROM reg GROUP BY 1, 2),
        |est AS (SELECT day, event_type, v_buckets, max_rank,
        |(0.7213 / (1 + 1.079 / 256)) * 65536 / ((256 - v_buckets) + s) AS raw FROM agg)
        |SELECT day, event_type, v_buckets, max_rank,
        |round(CASE WHEN raw <= 640 AND v_buckets < 256
        |  THEN 256 * ln(256.0 / (256 - v_buckets)) ELSE raw END, 2) AS n_est
        |FROM est ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    ("s17_stream_kmv",
      // x32's KMV distinct sketch as STREAMING state over a three-slice
      // replay: a bottom-k SET is order- and merge-independent, so the
      // incrementally-streamed sketch equals the one-shot batch sketch
      // exactly — same oracle SQL shape as x32, windowed by day.
      (s: SparkSession, dir: String) => {
        val base = scratch("s17")
        graft.streaming.Streaming.runStreamKmv(s, dir, base + "/kmv", 64)
          .orderBy(col("day"), col("event_type"))
      },
      Some("""WITH d AS (SELECT DISTINCT epoch_ms(date_trunc('day', ts)) AS day,
        |event_type,
        |('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        |FROM events),
        |r AS (SELECT day, event_type, h, row_number() OVER
        |  (PARTITION BY day, event_type ORDER BY h) AS rn FROM d),
        |t AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS n_kept,
        |max(h) AS kth_min FROM r WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT day, event_type, n_kept, kth_min,
        |CASE WHEN n_kept < 64 THEN n_kept ELSE 270582939648 // kth_min END AS n_est
        |FROM t ORDER BY day, event_type""".stripMargin.replace("\n", " "))),

    ("j23_referential_integrity",
      // Star-schema FK audit (operators/Maintenance.referentialIntegrity):
      // per relationship, child rows / null keys / orphans / distinct keys
      // / parents referenced — child collapsed to key grain BEFORE the
      // parent left join, so the check joins distinct keys, not rows.
      (s: SparkSession, dir: String) => {
        import graft.operators.Maintenance.FkRelation
        graft.operators.Maintenance.referentialIntegrity(Seq(
          FkRelation("lineitem.l_orderkey->orders",
            Tables.lineitem(s, dir), "l_orderkey",
            Tables.orders(s, dir), "o_orderkey"),
          FkRelation("lineitem.l_partkey->part",
            Tables.lineitem(s, dir), "l_partkey",
            Tables.part(s, dir), "p_partkey"),
          FkRelation("lineitem.l_suppkey->supplier",
            Tables.lineitem(s, dir), "l_suppkey",
            Tables.supplier(s, dir), "s_suppkey"),
          FkRelation("orders.o_custkey->customer",
            Tables.orders(s, dir), "o_custkey",
            Tables.customer(s, dir), "c_custkey"),
          FkRelation("customer.c_nationkey->nation",
            Tables.customer(s, dir), "c_nationkey",
            Tables.nation(s, dir), "n_nationkey")))
          .orderBy(col("relation"))
      },
      Some("""WITH a AS (
        |SELECT 'lineitem.l_orderkey->orders' AS relation,
        |  CAST(count(*) AS BIGINT) AS child_rows,
        |  CAST(count(*) FILTER (l_orderkey IS NULL) AS BIGINT) AS null_keys,
        |  CAST(count(*) FILTER (l_orderkey IS NOT NULL AND l_orderkey NOT IN
        |    (SELECT o_orderkey FROM orders)) AS BIGINT) AS orphan_rows,
        |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS distinct_child_keys,
        |  (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)) AS parents_referenced
        |FROM lineitem
        |UNION ALL SELECT 'lineitem.l_partkey->part', CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (l_partkey IS NULL) AS BIGINT),
        |  CAST(count(*) FILTER (l_partkey IS NOT NULL AND l_partkey NOT IN
        |    (SELECT p_partkey FROM part)) AS BIGINT),
        |  CAST(count(DISTINCT l_partkey) AS BIGINT),
        |  (SELECT CAST(count(DISTINCT p_partkey) AS BIGINT) FROM part
        |    WHERE p_partkey IN (SELECT l_partkey FROM lineitem))
        |FROM lineitem
        |UNION ALL SELECT 'lineitem.l_suppkey->supplier', CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (l_suppkey IS NULL) AS BIGINT),
        |  CAST(count(*) FILTER (l_suppkey IS NOT NULL AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier)) AS BIGINT),
        |  CAST(count(DISTINCT l_suppkey) AS BIGINT),
        |  (SELECT CAST(count(DISTINCT s_suppkey) AS BIGINT) FROM supplier
        |    WHERE s_suppkey IN (SELECT l_suppkey FROM lineitem))
        |FROM lineitem
        |UNION ALL SELECT 'orders.o_custkey->customer', CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT),
        |  CAST(count(*) FILTER (o_custkey IS NOT NULL AND o_custkey NOT IN
        |    (SELECT c_custkey FROM customer)) AS BIGINT),
        |  CAST(count(DISTINCT o_custkey) AS BIGINT),
        |  (SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) FROM customer
        |    WHERE c_custkey IN (SELECT o_custkey FROM orders))
        |FROM orders
        |UNION ALL SELECT 'customer.c_nationkey->nation', CAST(count(*) AS BIGINT),
        |  CAST(count(*) FILTER (c_nationkey IS NULL) AS BIGINT),
        |  CAST(count(*) FILTER (c_nationkey IS NOT NULL AND c_nationkey NOT IN
        |    (SELECT n_nationkey FROM nation)) AS BIGINT),
        |  CAST(count(DISTINCT c_nationkey) AS BIGINT),
        |  (SELECT CAST(count(DISTINCT n_nationkey) AS BIGINT) FROM nation
        |    WHERE n_nationkey IN (SELECT c_nationkey FROM customer))
        |FROM customer)
        |SELECT relation, child_rows, null_keys, orphan_rows,
        |distinct_child_keys, parents_referenced FROM a ORDER BY relation"""
        .stripMargin.replace("\n", " "))),

    ("j24_triangles",
      // Per-part triangle participation on the urgent-order co-purchase
      // graph (operators/Graph.trianglesPerVertex): degree-ordered
      // orientation bounds the wedge join at O(E^1.5); the oracle
      // enumerates the same triangle set via the simpler id-ordered
      // orientation (the SET is orientation-invariant).
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.trianglesPerVertex(pairs, "pa", "pb")
          .orderBy(col("triangles").desc, col("vertex").asc)
          .limit(20)
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pv AS (SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri
        |UNION ALL SELECT c FROM tri)
        |SELECT vertex, CAST(count(*) AS BIGINT) AS triangles FROM pv
        |GROUP BY 1 ORDER BY triangles DESC, vertex LIMIT 20"""
        .stripMargin.replace("\n", " "))),

    ("x85_autocorrelation",
      // Lag-1..3 ACF of each event type's daily-count series
      // (operators/TimeSeries.autocorrelation) — the seasonality probe a
      // corpus-ingest monitor runs on its own volume curves.
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("DAY", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.autocorrelation(
            daily, Seq("event_type"), "day", "n", 3)
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, n, lag(n, 1) OVER w AS n1,
        |lag(n, 2) OVER w AS n2, lag(n, 3) OVER w AS n3 FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY day))
        |SELECT event_type, round(corr(n, n1), 4) AS acf1,
        |round(corr(n, n2), 4) AS acf2, round(corr(n, n3), 4) AS acf3
        |FROM l GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x86_ewma",
      // Renormalized truncated EWMA (alpha 0.3, span 14) over the daily
      // series (operators/TimeSeries.ewma): one bounded window frame +
      // array fold per row — no self-join. Oracle is the equivalent
      // weighted self-join (DuckDB has no HOF window).
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("DAY", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.ewma(
            daily, Seq("event_type"), "day", "n", 0.3, 14)
          .select(col("event_type"), col("day"), col("n").cast("long").as("n"),
            col("ewma"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, day, n, row_number() OVER
        |(PARTITION BY event_type ORDER BY day) AS rn FROM d)
        |SELECT a.event_type, a.day, CAST(max(CASE WHEN b.rn = a.rn THEN b.n END) AS BIGINT) AS n,
        |round(sum(0.3 * power(0.7, a.rn - b.rn) * b.n) /
        |sum(0.3 * power(0.7, a.rn - b.rn)), 4) AS ewma
        |FROM r a JOIN r b ON a.event_type = b.event_type
        |AND b.rn BETWEEN a.rn - 13 AND a.rn
        |GROUP BY a.event_type, a.day ORDER BY a.event_type, a.day"""
        .stripMargin.replace("\n", " "))),

    ("j26_interarrival",
      // Per-type inter-event gap distribution within each user's
      // sub-series (operators/TimeSeries.interarrivalStats): exact
      // interpolated percentiles over the gap table — same grain as the
      // input, so exact is affordable at any scale.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.interarrivalStats(
            Tables.events(s, dir).select(col("event_type"), col("user_id"),
              unix_millis(col("ts")).as("ms"), col("event_id")),
            Seq("event_type"), "user_id", "ms", "event_id")
          .orderBy(col("event_type")),
      Some("""WITH g AS (SELECT event_type, CAST(epoch_ms(ts) - epoch_ms(lag(ts) OVER
        |(PARTITION BY event_type, user_id ORDER BY ts, event_id)) AS BIGINT) AS gap_ms
        |FROM events),
        |f AS (SELECT event_type, gap_ms FROM g WHERE gap_ms IS NOT NULL)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
        |CAST(min(gap_ms) AS BIGINT) AS min_ms,
        |CAST(floor(quantile_cont(gap_ms, 0.5)) AS BIGINT) AS p50_ms,
        |CAST(floor(quantile_cont(gap_ms, 0.9)) AS BIGINT) AS p90_ms,
        |CAST(max(gap_ms) AS BIGINT) AS max_ms
        |FROM f GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x87_silhouette",
      // Simplified (centroid-based) silhouette per label
      // (operators/Similarity.simplifiedSilhouette): O(n·k) distances,
      // never the O(n²) textbook form; centroids fixed-point rounded on
      // both sides so the engines score identical axes.
      (s: SparkSession, dir: String) =>
        graft.operators.Similarity.simplifiedSilhouette(
            Tables.embeddings(s, dir), "vec_id", "embedding", "label")
          .orderBy(col("label")),
      Some("""WITH u AS MATERIALIZED (SELECT vec_id, label, g.i AS i,
        |CAST(g.v AS DOUBLE) AS v FROM embeddings,
        |LATERAL (SELECT UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i) g),
        |c AS MATERIALIZED (SELECT label, i, round(avg(v), 6) AS cv FROM u GROUP BY 1, 2),
        |d AS (SELECT u.vec_id, u.label AS row_label, c.label AS cand_label,
        |sqrt(sum((u.v - c.cv) * (u.v - c.cv))) AS dist
        |FROM u JOIN c ON u.i = c.i GROUP BY 1, 2, 3),
        |s AS (SELECT vec_id, row_label,
        |max(CASE WHEN cand_label = row_label THEN dist END) AS a,
        |min(CASE WHEN cand_label <> row_label THEN dist END) AS b
        |FROM d GROUP BY 1, 2)
        |SELECT row_label AS label, CAST(count(*) AS BIGINT) AS n,
        |round(avg((b - a) / greatest(a, b)), 4) AS mean_silhouette
        |FROM s GROUP BY 1 ORDER BY label"""
        .stripMargin.replace("\n", " "))),

    ("x88_pca_power",
      // Top principal component by 20 deterministic power iterations
      // (operators/Similarity.pcaTopComponent): Gram upper triangle via
      // ONE mergeable array aggregate (functions/GramMatrixAgg), d×d
      // eigensolve as bounded driver metadata, zero-join projection pass.
      // Oracle unrolls the same 20 iterations as chained CTEs.
      (s: SparkSession, dir: String) =>
        graft.operators.Similarity.pcaTopComponent(
            Tables.embeddings(s, dir), "vec_id", "embedding", "label", 20)
          .orderBy(col("label")),
      Some(pcaPowerOracle(20))),

    ("s19_stream_funnel",
      // Q24's funnel under streaming (streaming/Streaming.runStreamFunnel):
      // per-user chained-min state replayed as synthetic step events each
      // batch — exact because replay slices are time-ordered, so union
      // over slices ≡ the one-shot batch funnel. q24's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s19")
        graft.streaming.Streaming.runStreamFunnel(s, dir, base + "/fn",
            Seq(T1, T2), Seq("view", "click", "purchase"))
          .select(col("user_id"), col("step0_ms").as("view_ms"),
            col("step1_ms").as("click_ms"), col("step2_ms").as("purchase_ms"),
            col("converted"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, min(ms) AS view_ms FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ms) AS click_ms FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > v.view_ms GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ms) AS purchase_ms FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > c.click_ms GROUP BY 1)
        |SELECT v.user_id, view_ms, click_ms, purchase_ms,
        |CAST(purchase_ms IS NOT NULL AS INT) AS converted
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
        |ORDER BY user_id""".stripMargin.replace("\n", " "))),

    ("x89_seasonal_decompose",
      // STL-lite additive decomposition of the daily series
      // (operators/TimeSeries.seasonalDecompose): 7-day centered MA
      // trend, day-of-week seasonal means, residual — the ingest-curve
      // explainer separating weekly rhythm from real anomaly.
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("DAY", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.seasonalDecompose(
            daily, Seq("event_type"), "day", "n", 7)
          .select(col("event_type"), col("day"), col("n").cast("long").as("n"),
            col("trend"), col("seasonal"), col("residual"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, day, n,
        |CASE WHEN count(*) OVER w = 7 THEN round(avg(n) OVER w, 4) END AS trend
        |FROM d WINDOW w AS (PARTITION BY event_type ORDER BY day
        |ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |s AS (SELECT *, n - trend AS detr, (day // 86400000) % 7 AS dow FROM t),
        |m AS (SELECT event_type, dow, round(avg(detr), 4) AS seasonal
        |FROM s WHERE detr IS NOT NULL GROUP BY 1, 2)
        |SELECT s.event_type, s.day, s.n, s.trend, m.seasonal,
        |round(s.n - s.trend - m.seasonal, 4) AS residual
        |FROM s JOIN m ON s.event_type = m.event_type AND s.dow = m.dow
        |ORDER BY s.event_type, s.day""".stripMargin.replace("\n", " "))),

    ("x90_cusum",
      // CUSUM change-point locator (operators/TimeSeries.cusumChangepoint):
      // running standardized sum reported at its |max| — rounded 4 dp
      // BEFORE the arg-max ranking so the tie-broken winner is portable.
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("DAY", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.cusumChangepoint(
            daily, Seq("event_type"), "day", "n")
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd FROM d GROUP BY 1),
        |c AS (SELECT d.event_type, d.day, round(sum((d.n - st.mu) / st.sd)
        |OVER (PARTITION BY d.event_type ORDER BY d.day), 4) AS cusum
        |FROM d JOIN st USING (event_type)),
        |r AS (SELECT event_type, day, cusum, row_number() OVER
        |(PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn FROM c)
        |SELECT event_type, day AS change_point, cusum AS max_cusum
        |FROM r WHERE rn = 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x91_ks_drift",
      // Two-sample Kolmogorov-Smirnov drift per type between the month's
      // halves (operators/TimeSeries.ksDistance): peer-inclusive RANGE
      // ecdfs so tied values resolve identically on both engines; one
      // per-key sort, never global.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.ksDistance(
            Tables.events(s, dir).select(col("event_type"), col("value"),
              when(unix_millis(col("ts")) < T1, 0).otherwise(1).as("half")),
            Seq("event_type"), "value", "half")
          .orderBy(col("event_type")),
      Some(s"""WITH e AS (SELECT event_type, value,
        |CASE WHEN epoch_ms(ts) < $T1 THEN 0 ELSE 1 END AS half FROM events),
        |n AS (SELECT event_type,
        |CAST(sum(CASE WHEN half = 0 THEN 1 END) AS DOUBLE) AS n0,
        |CAST(sum(CASE WHEN half = 1 THEN 1 END) AS DOUBLE) AS n1
        |FROM e GROUP BY 1),
        |c AS (SELECT event_type, value,
        |sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) OVER w AS c0,
        |sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) OVER w AS c1
        |FROM e WINDOW w AS (PARTITION BY event_type ORDER BY value))
        |SELECT c.event_type, round(max(abs(c.c0/n.n0 - c.c1/n.n1)), 4) AS ks_d
        |FROM c JOIN n USING (event_type) GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x92_gini",
      // Gini concentration of per-user activity within each type
      // (operators/Maintenance.giniConcentration): the inequality audit
      // behind contribution capping; exact-integer core, one rank window
      // at entity grain.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.giniConcentration(
            Tables.events(s, dir).select(col("event_type"), col("user_id")),
            "event_type", "user_id")
          .orderBy(col("event_type")),
      Some("""WITH u AS (SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS x
        |FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, x, row_number() OVER
        |(PARTITION BY event_type ORDER BY x, user_id) AS i FROM u),
        |g AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_entities,
        |sum(i * x) AS six, sum(x) AS sx FROM r GROUP BY 1)
        |SELECT event_type, n_entities,
        |round(2.0 * six / (n_entities * sx) - (n_entities + 1.0) / n_entities, 4) AS gini
        |FROM g ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("x93_chi_square",
      // Chi-square independence of language x length-bucket over
      // documents (operators/TextAnalysis.chiSquareIndependence): the
      // stratification check before trusting per-facet samples; per-lang
      // contributions name the driver of any dependence.
      (s: SparkSession, dir: String) =>
        graft.operators.TextAnalysis.chiSquareIndependence(
            Tables.documents(s, dir).select(col("lang"),
              least(floor(col("n_chars") / 100), lit(5L)).as("bucket")),
            "lang", "bucket")
          .orderBy(col("lang")),
      Some("""WITH d AS (SELECT lang, least(n_chars // 100, 5) AS bucket FROM documents),
        |o AS (SELECT lang, bucket, CAST(count(*) AS BIGINT) AS obs FROM d GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(obs) AS BIGINT) AS row_tot FROM o GROUP BY 1),
        |ct AS (SELECT bucket, CAST(sum(obs) AS BIGINT) AS col_tot FROM o GROUP BY 1),
        |n AS (SELECT CAST(sum(obs) AS DOUBLE) AS tot FROM o),
        |grid AS (SELECT rt.lang, ct.bucket, rt.row_tot, ct.col_tot,
        |coalesce(o.obs, 0) AS obs FROM rt CROSS JOIN ct
        |LEFT JOIN o ON o.lang = rt.lang AND o.bucket = ct.bucket),
        |x AS (SELECT g.lang, g.obs, g.row_tot * g.col_tot / n.tot AS exp
        |FROM grid g, n)
        |SELECT lang, CAST(sum(obs) AS BIGINT) AS n_rows,
        |round(sum((obs - exp) * (obs - exp) / exp), 4) AS chi2_contrib
        |FROM x GROUP BY 1 ORDER BY lang""".stripMargin.replace("\n", " "))),

    ("j25_hits",
      // HITS hub/authority over the urgent-order customer->part bipartite
      // graph (operators/Graph.hits): 5 fixed halves with the pageRank
      // 6-dp fixed-point discipline; top-10 per role via the BOUNDED
      // TopKAgg (k-capped map-side buffer, never a full sort).
      (s: SparkSession, dir: String) => {
        val edges = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("cust"), col("l_partkey").as("part"))
        val scores = graft.operators.Graph.hits(edges, "cust", "part", 5)
        val topk = graft.functions.TopKAgg.topK(10)
        scores.groupBy(col("role"))
          .agg(topk(col("score"), col("node")).as("_t"))
          .select(col("role"), posexplode(col("_t")).as(Seq("_p", "_e")))
          .select(col("role"), col("_e.id").as("node"),
            col("_e.score").as("score"),
            (col("_p") + 1).cast("long").as("rnk"))
          .orderBy(col("role"), col("rnk"))
      },
      Some(hitsOracle(5))),

    ("s20_stream_rate_anomaly",
      // J13 under streaming (streaming/Streaming.runStreamRateAnomaly):
      // the (type, day) count table maintained as streaming state,
      // z-scores folded over it at read time — j13's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s20")
        graft.streaming.Streaming.runStreamRateAnomaly(s, dir, base + "/ra")
          .orderBy(col("event_type"), col("day_ms"))
      },
      Some("""WITH d AS (SELECT event_type,
        |epoch_ms(date_trunc('day', ts)) AS day_ms, count(*) AS n
        |FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(n) AS m, stddev_samp(n) AS s
        |FROM d GROUP BY 1)
        |SELECT d.event_type, day_ms, CAST(n AS BIGINT) AS n,
        |round(CASE WHEN s IS NULL OR s = 0 THEN 0
        |ELSE (n - m) / s END, 4) AS z,
        |CASE WHEN abs(CASE WHEN s IS NULL OR s = 0 THEN 0
        |ELSE (n - m) / s END) >= 2 THEN 1 ELSE 0 END AS is_anomaly
        |FROM d JOIN st USING (event_type) ORDER BY event_type, day_ms"""
        .stripMargin.replace("\n", " "))),

    ("x94_sketch_set_ops",
      // KMV sketch set algebra (operators/Sketch.kmvSetOps): union +
      // intersection cardinality estimates for every type pair from the
      // persisted bottom-64 sketches alone — array-local merge, never an
      // exact-distinct rescan; md5 family makes the estimates hash-exact.
      (s: SparkSession, dir: String) =>
        graft.operators.Sketch.kmvSetOps(
          Tables.events(s, dir).select(col("event_type"),
            concat(col("user_id").cast("string"), lit("@"),
              unix_millis(date_trunc("DAY", col("ts"))).cast("string"))
              .as("entity")),
          "event_type", "entity", 64)
          .orderBy(col("type_a"), col("type_b")),
      Some("""WITH h AS (SELECT DISTINCT event_type,
        |('0x' || substr(md5('kmv:' || CAST(user_id AS VARCHAR) || '@' ||
        |CAST(epoch_ms(date_trunc('day', ts)) AS VARCHAR)), 1, 8))::BIGINT AS h FROM events),
        |r AS (SELECT event_type, h, row_number() OVER
        |(PARTITION BY event_type ORDER BY h) AS rn FROM h),
        |sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
        |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b FROM
        |(SELECT DISTINCT event_type FROM events) a
        |JOIN (SELECT DISTINCT event_type FROM events) b ON a.event_type < b.event_type),
        |ud AS (SELECT type_a, type_b, h, row_number() OVER
        |(PARTITION BY type_a, type_b ORDER BY h) AS rn
        |FROM (SELECT DISTINCT p.type_a, p.type_b, s.h FROM p
        |JOIN sk s ON s.event_type IN (p.type_a, p.type_b))),
        |uk AS (SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_kept, max(h) AS kth
        |FROM ud WHERE rn <= 64 GROUP BY 1, 2),
        |inter AS (SELECT ud.type_a, ud.type_b, CAST(count(*) AS BIGINT) AS n_both
        |FROM ud JOIN sk a ON a.event_type = ud.type_a AND a.h = ud.h
        |JOIN sk b ON b.event_type = ud.type_b AND b.h = ud.h
        |WHERE ud.rn <= 64 GROUP BY 1, 2)
        |SELECT uk.type_a, uk.type_b, uk.n_kept,
        |CASE WHEN uk.n_kept < 64 THEN uk.n_kept ELSE 270582939648 // uk.kth END AS union_est,
        |coalesce(inter.n_both, 0) AS n_both,
        |CAST(round(1.0 * coalesce(inter.n_both, 0) / uk.n_kept *
        |(CASE WHEN uk.n_kept < 64 THEN uk.n_kept ELSE 270582939648 // uk.kth END), 0) AS BIGINT)
        |AS intersect_est
        |FROM uk LEFT JOIN inter USING (type_a, type_b) ORDER BY type_a, type_b"""
        .stripMargin.replace("\n", " "))),

    ("x95_winsorize",
      // Winsorization audit (operators/Maintenance.winsorize): exact
      // [p05, p95] fences rounded 4 dp so both engines clamp identically;
      // clipped counts + mean before/after per type.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.winsorize(
            Tables.events(s, dir).select(col("event_type"), col("value")),
            "event_type", "value", 0.05, 0.95)
          .orderBy(col("event_type")),
      Some("""WITH f AS (SELECT event_type, round(quantile_cont(value, 0.05), 4) AS lo,
        |round(quantile_cont(value, 0.95), 4) AS hi FROM events GROUP BY 1)
        |SELECT e.event_type, CAST(count(*) AS BIGINT) AS n, f.lo, f.hi,
        |CAST(sum(CASE WHEN e.value < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo,
        |CAST(sum(CASE WHEN e.value > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi,
        |round(avg(e.value), 4) AS mean_raw,
        |round(avg(greatest(f.lo, least(f.hi, e.value))), 4) AS mean_winsor
        |FROM events e JOIN f USING (event_type)
        |GROUP BY 1, 3, 4 ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("j27_khop_reachability",
      // Bounded BFS blast radius (operators/Graph.kHopCounts): nodes
      // first reached at each hop from the minimum part over the
      // DIRECTED urgent co-purchase graph; per hop one frontier join +
      // anti-join, localCheckpoint loop discipline.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") =!= col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        val seed = pairs.agg(min(col("pa")).as("s"))
        graft.operators.Graph.kHopCounts(pairs, "pa", "pb", seed, "s", 3)
          .orderBy(col("hop"))
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey WHERE o.o_orderpriority = '1-URGENT'),
        |e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
        |h0 AS (SELECT min(u) AS node FROM e),
        |h1 AS (SELECT DISTINCT e.v AS node FROM e JOIN h0 ON e.u = h0.node
        |WHERE e.v NOT IN (SELECT node FROM h0)),
        |h2 AS (SELECT DISTINCT e.v AS node FROM e JOIN h1 ON e.u = h1.node
        |WHERE e.v NOT IN (SELECT node FROM h0) AND e.v NOT IN (SELECT node FROM h1)),
        |h3 AS (SELECT DISTINCT e.v AS node FROM e JOIN h2 ON e.u = h2.node
        |WHERE e.v NOT IN (SELECT node FROM h0) AND e.v NOT IN (SELECT node FROM h1)
        |AND e.v NOT IN (SELECT node FROM h2))
        |SELECT 0 AS hop, CAST(count(*) AS BIGINT) AS n_nodes FROM h0
        |UNION ALL SELECT 1, count(*) FROM h1
        |UNION ALL SELECT 2, count(*) FROM h2
        |UNION ALL SELECT 3, count(*) FROM h3 ORDER BY hop"""
        .stripMargin.replace("\n", " "))),

    ("j28_medoids",
      // Cluster exemplars (operators/Similarity.medoids): the real member
      // nearest each label's 6 dp-rounded centroid, distance rounded
      // before the id-tie-broken rank — x54 finds intruders, this picks
      // the representative.
      (s: SparkSession, dir: String) =>
        graft.operators.Similarity.medoids(
            Tables.embeddings(s, dir), "vec_id", "embedding", "label")
          .orderBy(col("label")),
      Some("""WITH u AS MATERIALIZED (SELECT vec_id, label, g.i AS i,
        |CAST(g.v AS DOUBLE) AS v FROM embeddings,
        |LATERAL (SELECT UNNEST(embedding) AS v, generate_subscripts(embedding, 1) AS i) g),
        |c AS MATERIALIZED (SELECT label, i, round(avg(v), 6) AS cv FROM u GROUP BY 1, 2),
        |d AS (SELECT u.vec_id, u.label, round(sqrt(sum((u.v - c.cv) * (u.v - c.cv))), 6) AS dist
        |FROM u JOIN c ON u.i = c.i AND u.label = c.label GROUP BY 1, 2),
        |r AS (SELECT label, vec_id, dist, row_number() OVER
        |(PARTITION BY label ORDER BY dist, vec_id) AS rn FROM d)
        |SELECT label, vec_id AS medoid_id, dist FROM r WHERE rn = 1 ORDER BY label"""
        .stripMargin.replace("\n", " "))),

    ("q29_keyset_page",
      // Keyset pagination (queries/Serving.keysetPage): page 3 of the
      // spend leaderboard via the cursor predicate — sargable, plans as
      // TakeOrderedAndProject, O(page) at any depth (vs OFFSET's
      // rank-and-discard). Cursor = last row of page 2, obtained as
      // bounded driver metadata exactly like an API layer would hold it.
      (s: SparkSession, dir: String) => {
        val totals = Tables.events(s, dir)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).cast("long").as("n_events"),
            round(sum(col("value")), 2).as("total"))
        val cur = totals.orderBy(col("total").desc, col("user_id").asc)
          .limit(20).orderBy(col("total").asc, col("user_id").desc)
          .limit(1).select(col("total"), col("user_id")).head()
        Serving.keysetPage(totals, "total", "user_id",
            (cur.getDouble(0), cur.getLong(1)), 10)
          .select(col("user_id"), col("n_events"), col("total"))
      },
      Some("""WITH t AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |round(sum(value), 2) AS total FROM events GROUP BY 1),
        |cur AS (SELECT total, user_id FROM t ORDER BY total DESC, user_id LIMIT 1 OFFSET 19)
        |SELECT t.user_id, t.n_events, t.total FROM t, cur
        |WHERE t.total < cur.total OR (t.total = cur.total AND t.user_id > cur.user_id)
        |ORDER BY t.total DESC, t.user_id LIMIT 10"""
        .stripMargin.replace("\n", " "))),

    ("x97_golden_record",
      // Entity-resolution survivorship (the "golden record"): x50's
      // blocked fuzzy-linkage pairs closed transitively
      // (Dedup.connectedComponents), then per entity the merge rules a
      // master-data pipeline applies — member count, best (max) length,
      // canonical (min) lang, distinct sources. Only multi-member
      // entities surface: the review queue.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        val pairs = graft.operators.Dedup.blockedEditDistancePairs(
          docs.select(col("doc_id"), substring(col("text"), 1, 30).as("title")),
          "doc_id", "title", substring(col("title"), 1, 4), 3)
        val cc = graft.operators.Dedup.connectedComponents(pairs, "id_a", "id_b")
        docs.join(cc, docs("doc_id") === cc("node"), "left_outer")
          .select(col("doc_id"),
            coalesce(col("label"), col("doc_id")).as("entity_id"),
            col("lang"), col("source"), col("n_chars"))
          .groupBy(col("entity_id"))
          .agg(count(lit(1)).cast("long").as("n_members"),
            max(col("n_chars")).cast("long").as("best_n_chars"),
            min(col("lang")).as("lang_min"),
            countDistinct(col("source")).cast("long").as("n_sources"))
          .where(col("n_members") > 1)
          .orderBy(col("entity_id"))
      },
      Some("""WITH RECURSIVE e0 AS (SELECT doc_id, substr(text, 1, 30) AS title FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |FROM e0 a JOIN e0 b ON substr(a.title, 1, 4) = substr(b.title, 1, 4)
        |AND a.doc_id < b.doc_id WHERE levenshtein(a.title, b.title) <= 3),
        |e AS (SELECT id_a AS a, id_b AS b FROM p UNION SELECT id_b, id_a FROM p),
        |reach(n, r) AS (
        |  SELECT a, a FROM (SELECT DISTINCT a FROM e)
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
        |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1),
        |lab AS (SELECT d.doc_id, coalesce(c.root, d.doc_id) AS entity_id,
        |d.lang, d.source, d.n_chars
        |FROM documents d LEFT JOIN comp c ON c.n = d.doc_id)
        |SELECT entity_id, CAST(count(*) AS BIGINT) AS n_members,
        |CAST(max(n_chars) AS BIGINT) AS best_n_chars,
        |min(lang) AS lang_min, CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM lab GROUP BY 1 HAVING count(*) > 1 ORDER BY entity_id"""
        .stripMargin.replace("\n", " "))),

    ("j29_interval_union",
      // Interval-UNION coverage (operators/Overlap.coveredTime): total ms
      // covered by >= 1 open 30-min event window per type — j19's
      // concurrency asks how deep, this asks how long at all; overlaps
      // never double count. Sweep at (key, t) grain, per-key parallel.
      (s: SparkSession, dir: String) =>
        graft.operators.Overlap.coveredTime(
            Tables.events(s, dir).select(col("event_type"),
              unix_millis(col("ts")).as("s"),
              (unix_millis(col("ts")) + 1800000L).as("e")),
            Seq("event_type"), "s", "e")
          .orderBy(col("event_type")),
      Some("""WITH iv AS (SELECT event_type, epoch_ms(ts) AS s,
        |epoch_ms(ts) + 1800000 AS e FROM events),
        |pts AS (SELECT event_type, s AS t, 1 AS d FROM iv
        |UNION ALL SELECT event_type, e, -1 FROM iv),
        |sw AS (SELECT event_type, t, sum(d) AS delta FROM pts GROUP BY 1, 2),
        |run AS (SELECT event_type, t,
        |sum(delta) OVER (PARTITION BY event_type ORDER BY t) AS conc,
        |lead(t) OVER (PARTITION BY event_type ORDER BY t) AS nxt FROM sw)
        |SELECT event_type,
        |CAST(sum(CASE WHEN conc > 0 THEN nxt - t ELSE 0 END) AS BIGINT) AS covered_ms,
        |CAST(count(*) AS BIGINT) AS n_points
        |FROM run WHERE nxt IS NOT NULL GROUP BY 1 ORDER BY event_type"""
        .stripMargin.replace("\n", " "))),

    ("x98_hill_tail",
      // Heavy-tail exponent of per-user activity (operators/Maintenance.
      // hillTailIndex): Hill estimator over the top-50 order statistics
      // from the BOUNDED TopKAgg — one scalar aggregate + an array-local
      // log fold; x83's Zipf fit reads the rank curve, this the tail.
      (s: SparkSession, dir: String) => {
        val u = Tables.events(s, dir)
          .groupBy(col("user_id")).agg(count(lit(1)).as("x"))
        graft.operators.Maintenance.hillTailIndex(u, "x", "user_id", 50)
      },
      Some("""WITH u AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS x
        |FROM events GROUP BY 1),
        |r AS (SELECT x, row_number() OVER (ORDER BY x DESC, user_id) AS rn FROM u),
        |k AS (SELECT x AS xk FROM r WHERE rn = 50)
        |SELECT CAST(50 AS BIGINT) AS k,
        |round(49.0 / sum(ln(r.x / k.xk)), 4) AS hill_alpha,
        |round(max(r.x), 1) AS x_max
        |FROM r, k WHERE r.rn < 50""".stripMargin.replace("\n", " "))),

    ("x99_moments",
      // Four-moment profile per type (operators/Maintenance.
      // momentsProfile): skew/kurtosis from raw power sums — built-in
      // skewness/kurtosis differ across engines in bias correction, the
      // power-sum closed form is the portable (and mergeable) contract.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.momentsProfile(
            Tables.events(s, dir).select(col("event_type"), col("value")),
            "event_type", "value")
          .orderBy(col("event_type")),
      Some("""WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |avg(value) AS m1, avg(value * value) AS m2,
        |avg(value * value * value) AS m3,
        |avg(value * value * value * value) AS m4 FROM events GROUP BY 1),
        |c AS (SELECT event_type, n, m1, m2 - m1 * m1 AS v,
        |m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS c3,
        |m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1 AS c4 FROM s)
        |SELECT event_type, n, round(m1, 4) AS mean, round(sqrt(v), 4) AS sd,
        |round(c3 / power(v, 1.5), 4) AS skewness,
        |round(c4 / (v * v) - 3, 4) AS excess_kurtosis
        |FROM c ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("x100_mutual_info",
      // Mutual information lang x source (operators/TextAnalysis.
      // mutualInformation): how much provenance the language column
      // leaks — the redundancy read before dropping a facet; exact
      // counts feed every log so the doubles are portable.
      (s: SparkSession, dir: String) =>
        graft.operators.TextAnalysis.mutualInformation(
          Tables.documents(s, dir).select(col("lang"), col("source")),
          "lang", "source"),
      Some("""WITH o AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS c
        |FROM documents GROUP BY 1, 2),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS tot FROM o),
        |rt AS (SELECT lang, CAST(sum(c) AS BIGINT) AS rc FROM o GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(c) AS BIGINT) AS cc FROM o GROUP BY 1),
        |mi AS (SELECT sum((o.c / n.tot) * ln(o.c * n.tot / (rt.rc * CAST(ct.cc AS DOUBLE)))) AS mi
        |FROM o JOIN rt USING (lang) JOIN ct USING (source), n),
        |hx AS (SELECT -sum((rc / n.tot) * ln(rc / n.tot)) AS h FROM rt, n),
        |hy AS (SELECT -sum((cc / n.tot) * ln(cc / n.tot)) AS h FROM ct, n)
        |SELECT round(mi.mi, 4) AS mi_nats, round(hx.h, 4) AS h_a,
        |round(hy.h, 4) AS h_b,
        |round(mi.mi / least(hx.h, hy.h), 4) AS normalized_mi
        |FROM mi, hx, hy""".stripMargin.replace("\n", " "))),

    ("x101_kl_divergence",
      // Per-source KL from the corpus unigram distribution
      // (operators/TextAnalysis.klFromCorpus): the source-drift
      // fingerprint completing the entropy/MI/KL trio; token counts at
      // vocabulary grain, never the corpus.
      (s: SparkSession, dir: String) =>
        graft.operators.TextAnalysis.klFromCorpus(
            Tables.documents(s, dir), "source", "text")
          .orderBy(col("source")),
      Some("""WITH toks AS (SELECT source,
        |unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS tok
        |FROM documents),
        |st AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
        |v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab,
        |CAST(sum(c) AS DOUBLE) AS n FROM st),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n_s FROM st GROUP BY 1),
        |ct AS (SELECT tok, CAST(sum(c) AS BIGINT) AS c_tot FROM st GROUP BY 1)
        |SELECT st.source, CAST(count(*) AS BIGINT) AS n_types,
        |round(sum(((st.c + 0.5) / (ns.n_s + 0.5 * v.vocab)) *
        |ln(((st.c + 0.5) / (ns.n_s + 0.5 * v.vocab)) / (ct.c_tot / v.n))), 4) AS kl_nats
        |FROM st JOIN ns USING (source) JOIN ct USING (tok), v
        |GROUP BY st.source ORDER BY source""".stripMargin.replace("\n", " "))),

    ("x102_benford",
      // Benford first-digit audit (operators/Maintenance.benfordAudit):
      // observed vs log10(1+1/d) digit shares per type — digits extracted
      // numerically (double->string formatting differs across engines).
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.benfordAudit(
            Tables.events(s, dir).select(col("event_type"), col("value")),
            "event_type", "value")
          .orderBy(col("event_type"), col("fd")),
      Some("""WITH d AS (SELECT event_type,
        |CAST(floor(abs(value) / power(10, floor(log10(abs(value))))) AS INT) AS fd
        |FROM events WHERE abs(value) >= 1),
        |o AS (SELECT event_type, fd, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS tot FROM o GROUP BY 1)
        |SELECT o.event_type, o.fd, o.n, round(o.n / t.tot, 4) AS observed_p,
        |round(ln(1.0 + 1.0 / o.fd) / ln(10), 4) AS benford_p
        |FROM o JOIN t USING (event_type) ORDER BY event_type, fd"""
        .stripMargin.replace("\n", " "))),

    ("s21_stream_moments",
      // X99 under streaming (streaming/Streaming.runStreamMoments): the
      // state per type is the mergeable sufficient statistics (n, Σx..Σx⁴)
      // accrued through the additive upsert; central moments assemble at
      // read time — x99's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s21")
        graft.streaming.Streaming.runStreamMoments(s, dir, base + "/mo")
          .orderBy(col("event_type"))
      },
      Some("""WITH s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |avg(value) AS m1, avg(value * value) AS m2,
        |avg(value * value * value) AS m3,
        |avg(value * value * value * value) AS m4 FROM events GROUP BY 1),
        |c AS (SELECT event_type, n, m1, m2 - m1 * m1 AS v,
        |m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1 AS c3,
        |m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1 AS c4 FROM s)
        |SELECT event_type, n, round(m1, 4) AS mean, round(sqrt(v), 4) AS sd,
        |round(c3 / power(v, 1.5), 4) AS skewness,
        |round(c4 / (v * v) - 3, 4) AS excess_kurtosis
        |FROM c ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("q30_period_over_period",
      // Week-over-week deltas per type — the dashboard comparison staple
      // (the reference UI's time-range views imply exactly this read):
      // weekly agg + one lag window on the (type, week) grain series.
      (s: SparkSession, dir: String) => {
        val w = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("WEEK", col("ts"))).as("week"))
          .agg(count(lit(1)).as("n"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("week"))
        w.withColumn("prev_n", lag(col("n"), 1).over(win))
          .select(col("event_type"), col("week"),
            col("n").cast("long").as("n"),
            col("prev_n").cast("long").as("prev_n"),
            (col("n") - col("prev_n")).cast("long").as("delta"),
            round(lit(100.0) * (col("n") - col("prev_n")) / col("prev_n"), 2)
              .as("pct_change"))
          .orderBy(col("event_type"), col("week"))
      },
      Some("""WITH w AS (SELECT event_type, epoch_ms(date_trunc('week', ts)) AS week,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, week, n, lag(n) OVER
        |(PARTITION BY event_type ORDER BY week) AS prev_n FROM w)
        |SELECT event_type, week, n, prev_n,
        |CAST(n - prev_n AS BIGINT) AS delta,
        |round(100.0 * (n - prev_n) / prev_n, 2) AS pct_change
        |FROM l ORDER BY event_type, week""".stripMargin.replace("\n", " "))),

    ("j30_markov_entropy",
      // Behavioral predictability: H(next | prev) per from-type over
      // j15's transition counts — low entropy = deterministic flows
      // (bot-like), high = exploratory; one user-partitioned lag window +
      // two bounded |types|-grain aggs.
      (s: SparkSession, dir: String) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(unix_millis(col("ts")), col("event_id"))
        val t = Tables.events(s, dir)
          .withColumn("_prev", lag(col("event_type"), 1).over(w))
          .where(col("_prev").isNotNull)
          .groupBy(col("_prev"), col("event_type"))
          .agg(count(lit(1)).as("_c"))
        val m = t.groupBy(col("_prev")).agg(sum(col("_c")).as("_tot"))
        t.join(broadcast(m), Seq("_prev"))
          .groupBy(col("_prev").as("from_type"))
          .agg(first(col("_tot")).cast("long").as("n_transitions"),
            round(-sum((col("_c") / col("_tot").cast("double")) *
              log(col("_c") / col("_tot").cast("double"))), 4)
              .as("cond_entropy_nats"))
          .orderBy(col("from_type"))
      },
      Some("""WITH o AS (SELECT user_id, event_type, lag(event_type) OVER
        |(PARTITION BY user_id ORDER BY epoch_ms(ts), event_id) AS prev FROM events),
        |t AS (SELECT prev, event_type AS nxt, CAST(count(*) AS BIGINT) AS c
        |FROM o WHERE prev IS NOT NULL GROUP BY 1, 2),
        |m AS (SELECT prev, CAST(sum(c) AS BIGINT) AS tot FROM t GROUP BY 1)
        |SELECT t.prev AS from_type, CAST(m.tot AS BIGINT) AS n_transitions,
        |round(-sum((t.c / CAST(m.tot AS DOUBLE)) * ln(t.c / CAST(m.tot AS DOUBLE))), 4)
        |AS cond_entropy_nats
        |FROM t JOIN m USING (prev) GROUP BY 1, 2 ORDER BY from_type"""
        .stripMargin.replace("\n", " "))),

    ("x103_sim_histogram",
      // Threshold-tuning read for the dedup family: the verified-Jaccard
      // DISTRIBUTION of x6's candidate pairs at a floor of 0.05, bucketed
      // by 0.1 — shows WHERE the corpus's similarity mass sits before
      // anyone picks a cutoff (this corpus: bimodal — trigram-share noise
      // near 0, true near-dups at 0.9+, nothing between).
      (s: SparkSession, dir: String) =>
        Dedup.ngramJaccardPairs(
            Tables.documents(s, dir).where(col("lang") === "en"),
            "doc_id", "text", 3, 0.05)
          .select(least(floor(col("jaccard") * 10), lit(9)).cast("int")
            .as("bucket"), col("jaccard"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).cast("long").as("n_pairs"),
            round(min(col("jaccard")), 4).as("min_jac"),
            round(max(col("jaccard")), 4).as("max_jac"))
          .orderBy(col("bucket")),
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents WHERE lang = 'en'),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t)-2), i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS (SELECT DISTINCT doc_id, unnest(sl) AS s FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |j0 AS (SELECT CAST(i AS DOUBLE) / (sa.n + sb.n - i) AS raw FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id),
        |b AS (SELECT CAST(least(floor(round(raw, 4) * 10), 9) AS INT) AS bucket,
        |round(raw, 4) AS jac FROM j0 WHERE raw >= 0.05)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_pairs,
        |round(min(jac), 4) AS min_jac, round(max(jac), 4) AS max_jac
        |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin.replace("\n", " "))),

    ("s22_stream_benford",
      // X102 under streaming (streaming/Streaming.runStreamBenford): the
      // (type, digit) count table IS the state — bounded at |types|·9
      // groups forever — with the audit folded at read; x102's oracle
      // verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s22")
        graft.streaming.Streaming.runStreamBenford(s, dir, base + "/bf")
          .orderBy(col("event_type"), col("fd"))
      },
      Some("""WITH d AS (SELECT event_type,
        |CAST(floor(abs(value) / power(10, floor(log10(abs(value))))) AS INT) AS fd
        |FROM events WHERE abs(value) >= 1),
        |o AS (SELECT event_type, fd, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(sum(n) AS DOUBLE) AS tot FROM o GROUP BY 1)
        |SELECT o.event_type, o.fd, o.n, round(o.n / t.tot, 4) AS observed_p,
        |round(ln(1.0 + 1.0 / o.fd) / ln(10), 4) AS benford_p
        |FROM o JOIN t USING (event_type) ORDER BY event_type, fd"""
        .stripMargin.replace("\n", " "))),

    ("x96_mmr_rerank",
      // Diversified retrieval (operators/Similarity.mmrRerank): MMR
      // greedy top-5 of the cosine top-20 against the vec_id=0 query —
      // candidate generation distributed (codegen cosine +
      // TakeOrdered), greedy loop on the bounded k-candidate block;
      // 6 dp rounds at every step make the trajectory engine-portable.
      (s: SparkSession, dir: String) =>
        graft.operators.Similarity.mmrRerank(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          0L, 20, 5, 0.7)
          .orderBy(col("rnk")),
      Some(mmrOracle(20, 5, 0.7))),

    ("x104_centroid_auc",
      // Embedding-quality scalar (operators/Eval.centroidAuc): one-vs-rest
      // Mann-Whitney AUC per class of cosine-to-class-centroid as the
      // retrieval score. Centroids are bounded driver metadata inlined as
      // literals; the rank-sum folds at (class, distinct-score) grain with
      // a PER-CLASS window; the half-integer numerator is exact in double,
      // so both engines agree bitwise before the final division.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.centroidAuc(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label")
          .orderBy(col("class")),
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, round(avg(v), 6) AS m FROM p GROUP BY 1, 2),
        |cl AS MATERIALIZED (SELECT label AS cls, list(m ORDER BY pos) AS cent
        |FROM c GROUP BY 1),
        |d AS (SELECT e.label AS gold, cl.cls,
        |round(${cosSql("e.embedding", "cl.cent")}, 6) AS score
        |FROM embeddings e CROSS JOIN cl),
        |g AS (SELECT cls, score,
        |CAST(sum(CASE WHEN gold = cls THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |CAST(sum(CASE WHEN gold = cls THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |FROM d GROUP BY 1, 2),
        |w AS (SELECT cls, np, nn, coalesce(sum(nn) OVER (PARTITION BY cls
        |ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |FROM g)
        |SELECT CAST(cls AS BIGINT) AS class, CAST(sum(np) AS BIGINT) AS n_pos,
        |CAST(sum(nn) AS BIGINT) AS n_neg,
        |round(sum(np * (cum + nn / 2.0)) / (sum(np) * sum(nn)), 6) AS auc
        |FROM w GROUP BY 1 ORDER BY class""".stripMargin.replace("\n", " "))),

    ("x105_calibration",
      // Reliability diagram (operators/Eval.calibrationBins): per-class
      // equal-width bins over the centroid-cosine range with count, mean
      // score, and positive fraction — the ECE read before treating
      // similarity as a probability. Pure classes x bins aggregation over
      // the same no-join scored projection as x104.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.calibrationBins(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", 10)
          .orderBy(col("class"), col("bin")),
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, round(avg(v), 6) AS m FROM p GROUP BY 1, 2),
        |cl AS MATERIALIZED (SELECT label AS cls, list(m ORDER BY pos) AS cent
        |FROM c GROUP BY 1),
        |d AS (SELECT e.label AS gold, cl.cls,
        |round(${cosSql("e.embedding", "cl.cent")}, 6) AS score
        |FROM embeddings e CROSS JOIN cl),
        |b AS (SELECT cls, CAST(greatest(0, least(floor((score + 1.0) * 5.0), 9))
        |AS INT) AS bin, score,
        |CASE WHEN gold = cls THEN 1.0 ELSE 0.0 END AS y FROM d)
        |SELECT CAST(cls AS BIGINT) AS class, bin, CAST(count(*) AS BIGINT) AS n,
        |round(avg(score), 4) AS avg_score, round(avg(y), 4) AS frac_pos
        |FROM b GROUP BY 1, 2 ORDER BY class, bin"""
        .stripMargin.replace("\n", " "))),

    ("x106_lang_kappa",
      // Chance-corrected agreement (operators/Eval.cohensKappa) between
      // x8's marker-token language ID and the gold lang column — the
      // "is the heuristic better than chance?" gate before using it to
      // route 100 TB. kappa folds to exact-integer arithmetic; the oracle
      // re-derives the predictions from langId's own generated SQL.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.cohensKappa(
          TextAnalysis.langId(Tables.documents(s, dir))
            .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
              Seq("doc_id")),
          "pred_lang", "lang"),
      Some(s"""WITH pr AS MATERIALIZED (SELECT doc_id, pred_lang
        |FROM ($langIdOracleSql) t),
        |j AS (SELECT pr.pred_lang AS p, d.lang AS g
        |FROM pr JOIN documents d USING (doc_id)),
        |o AS (SELECT p, g, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |CAST(sum(CASE WHEN p = g THEN c ELSE 0 END) AS BIGINT) AS agree FROM o),
        |rt AS (SELECT p, CAST(sum(c) AS BIGINT) AS rc FROM o GROUP BY 1),
        |ct AS (SELECT g, CAST(sum(c) AS BIGINT) AS cc FROM o GROUP BY 1),
        |pp AS (SELECT coalesce(CAST(sum(rt.rc * ct.cc) AS BIGINT), 0) AS x
        |FROM rt JOIN ct ON rt.p = ct.g)
        |SELECT t.n, round(t.agree / CAST(t.n AS DOUBLE), 4) AS po,
        |round(pp.x / CAST(t.n * t.n AS DOUBLE), 4) AS pe,
        |round(CAST(t.agree * t.n - pp.x AS DOUBLE) / (t.n * t.n - pp.x), 4)
        |AS kappa FROM t, pp""".stripMargin.replace("\n", " "))),

    ("j31_theil_sen",
      // Robust trend per type (operators/TimeSeries.theilSen, the ONE
      // Theil–Sen since the r12 consolidation): median of pairwise
      // slopes over the daily count series — the drift read an outlier
      // day can't drag. The pair expansion is bounded at |days|² per
      // type (435 pairs / 30-day series); slopes round to the legacy
      // 6 dp grid BEFORE the median (slopeGridDp — both engines then
      // sort identical grid values); j63 runs the same operator on raw
      // slopes with the intercept.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.theilSen(
          Tables.events(s, dir)
            .groupBy(col("event_type"),
              (unix_millis(date_trunc("DAY", col("ts"))) / lit(86400000L))
                .cast("long").as("_day"))
            .agg(count(lit(1)).cast("long").as("_n")),
          Seq("event_type"), "_day", "_n", slopeGridDp = Some(6))
          .select(col("event_type"), col("n_pairs"), col("slope"))
          .orderBy(col("event_type")),
      Some("""WITH d AS (SELECT event_type,
        |epoch_ms(date_trunc('day', ts)) // 86400000 AS x,
        |CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |round(CAST(b.y - a.y AS DOUBLE) / (b.x - a.x), 6) AS s
        |FROM d a JOIN d b ON a.event_type = b.event_type AND a.x < b.x)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |round(quantile_cont(s, 0.5), 6) AS slope
        |FROM p GROUP BY 1 ORDER BY event_type""".stripMargin
        .replace("\n", " "))),

    ("x107_token_budget",
      // Water-filling source budget (operators/Sampling.tokenBudget):
      // level per-source token allocations under a 50%-of-corpus budget —
      // small sources keep everything, big ones are capped at the common
      // water line. The cap is closed-form over the bounded source-grain
      // table; exact integers end to end.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.tokenBudget(
          Tables.documents(s, dir).select(col("source"),
            size(TextAnalysis.tokens(col("text"))).as("_ntok")),
          "source", "_ntok", 0.5)
          .orderBy(col("source")),
      Some("""WITH d AS (SELECT source,
        |len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS ntok
        |FROM documents),
        |c AS MATERIALIZED (SELECT source, CAST(sum(ntok) AS BIGINT) AS tokens
        |FROM d GROUP BY 1),
        |t AS (SELECT CAST(floor(0.5 * sum(tokens)) AS BIGINT) AS b FROM c),
        |r AS (SELECT source, tokens,
        |coalesce(sum(tokens) OVER (ORDER BY tokens, source
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prefix,
        |count(*) OVER () - (row_number() OVER (ORDER BY tokens, source) - 1) AS rest
        |FROM c),
        |f AS (SELECT r.*, t.b FROM r, t
        |WHERE r.prefix + r.rest * r.tokens >= t.b
        |ORDER BY tokens, source LIMIT 1),
        |cap AS (SELECT CASE WHEN (SELECT count(*) FROM f) = 0 THEN NULL
        |ELSE (SELECT CAST(floor(CAST(b - prefix AS DOUBLE) / rest) AS BIGINT)
        |FROM f) END AS cap)
        |SELECT c.source, c.tokens,
        |CAST(CASE WHEN cap.cap IS NULL THEN c.tokens
        |ELSE least(c.tokens, cap.cap) END AS BIGINT) AS allocated,
        |(cap.cap IS NOT NULL AND c.tokens > cap.cap) AS capped
        |FROM c, cap ORDER BY source""".stripMargin.replace("\n", " "))),

    ("s23_stream_auc",
      // X104 under streaming (streaming/Streaming.runStreamAuc): the
      // embedding-drift monitor — vectors scored against frozen reference
      // centroids, state = the (class, milli-score) pos/neg count table
      // (bounded at |classes|·2001 rows forever), additive upserts,
      // Mann-Whitney folded at read time. Oracle = the one-shot batch AUC
      // at the monitor's 3 dp score grain.
      (s: SparkSession, dir: String) => {
        val base = scratch("s23")
        graft.streaming.Streaming.runStreamAuc(s, dir, base + "/auc")
          .orderBy(col("class"))
      },
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, round(avg(v), 6) AS m FROM p GROUP BY 1, 2),
        |cl AS MATERIALIZED (SELECT label AS cls, list(m ORDER BY pos) AS cent
        |FROM c GROUP BY 1),
        |d AS (SELECT e.label AS gold, cl.cls,
        |CAST(round(round(${cosSql("e.embedding", "cl.cent")}, 6) * 1000, 0)
        |AS INT) AS sm
        |FROM embeddings e CROSS JOIN cl),
        |g AS (SELECT cls, sm,
        |CAST(sum(CASE WHEN gold = cls THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |CAST(sum(CASE WHEN gold = cls THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |FROM d GROUP BY 1, 2),
        |w AS (SELECT cls, np, nn, coalesce(sum(nn) OVER (PARTITION BY cls
        |ORDER BY sm ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |FROM g)
        |SELECT CAST(cls AS BIGINT) AS class, CAST(sum(np) AS BIGINT) AS n_pos,
        |CAST(sum(nn) AS BIGINT) AS n_neg,
        |round(sum(np * (cum + nn / 2.0)) / (sum(np) * sum(nn)), 6) AS auc
        |FROM w GROUP BY 1 ORDER BY class""".stripMargin.replace("\n", " "))),

    ("x108_quantile_normalize",
      // Cross-source comparability (Eval.quantileNormalize, the ONE
      // quantile-normalization since the r12 consolidation; here the
      // legacy percent_rank convention, midRank = false): within-source
      // percent-rank of doc length mapped through the GLOBAL equi-spaced
      // quantile table (one broadcast scalar row — never a global sort),
      // so one threshold can gate heterogeneous sources. The quantile
      // probe list is generated once and interpolated into BOTH engines'
      // SQL verbatim.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.quantileNormalize(
          Tables.documents(s, dir).select(col("doc_id"), col("source"),
            col("n_chars")),
          "doc_id", "source", "n_chars", 100, midRank = false)
          .select(col("doc_id"), col("source"), col("n_chars"),
            round(col("p"), 6).as("pct_rank"),
            round(col("normalized"), 4).as("normalized"))
          .orderBy(col("doc_id")),
      Some {
        val ps = (0 to 100).map(_.toDouble / 100).mkString(", ")
        s"""WITH e AS (SELECT quantile_cont(n_chars, [$ps]) AS edges
        |FROM documents),
        |r AS (SELECT doc_id, source, n_chars, percent_rank() OVER
        |(PARTITION BY source ORDER BY n_chars, doc_id) AS p FROM documents)
        |SELECT doc_id, source, n_chars, round(p, 6) AS pct_rank,
        |round(e.edges[CAST(round(p * 100, 0) AS INT) + 1], 4) AS normalized
        |FROM r, e ORDER BY doc_id""".stripMargin.replace("\n", " ")
      }),

    ("x109_knn_label_consistency",
      // Label-noise estimate (Similarity.knnLabelConsistency): per class,
      // how often a member's 10-NN strict-majority agrees with its label —
      // 1 - consistency_rate is the cheap noisy-label rate read before
      // training on the labels. Rides knnJoin's shared-IVF self-kNN
      // (corpus never broadcast); vote on the realized neighbor count.
      (s: SparkSession, dir: String) =>
        Similarity.knnLabelConsistency(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", 10, 16, 4)
          .orderBy(col("label")),
      Some(knnConsistencyOracleSql)),

    ("s24_stream_histogram",
      // X80 under streaming (streaming/Streaming.runStreamHistogram):
      // bin ranges frozen at deploy (the s23 frozen-reference
      // discipline), state = the (type, bin) count table bounded at
      // |types|·bins forever, additive upserts exactly-once; x80's
      // oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s24")
        graft.streaming.Streaming.runStreamHistogram(s, dir, base + "/hg", 20)
          .orderBy(col("event_type"), col("bin"))
      },
      Some("""WITH b AS (SELECT event_type, min(value) AS lo, max(value) AS hi
        |FROM events GROUP BY 1),
        |h AS (SELECT e.event_type,
        |CAST(least(floor((e.value - b.lo) / ((b.hi - b.lo) / 20)), 19) AS BIGINT) AS bin
        |FROM events e JOIN b USING (event_type))
        |SELECT event_type, bin, CAST(count(*) AS BIGINT) AS n
        |FROM h GROUP BY 1, 2 ORDER BY event_type, bin"""
        .stripMargin.replace("\n", " "))),

    ("x110_kcenter_coreset",
      // Diversity coreset (Similarity.kCenterCoreset): greedy farthest-
      // point 6-pick over the corpus — the 2-approx k-center cover used
      // to pull a maximally-diverse annotation/eval subset. Each round is
      // one scan + TakeOrdered(1) with the selected centers as bounded
      // literals; dist is the coverage-radius trajectory.
      (s: SparkSession, dir: String) =>
        Similarity.kCenterCoreset(Tables.embeddings(s, dir),
          "vec_id", "embedding", 6)
          .orderBy(col("rnk")),
      Some(kCenterOracle(6))),

    ("j32_ols_trend",
      // Parametric trend per type (operators/TimeSeries.olsTrend) over
      // j31's daily series: slope/intercept/r² from six mergeable power
      // sums — a big robust-vs-OLS gap names the outlier days. x shifted
      // by the global min day so the normal-equation numerators are exact
      // integers on both engines; one double division each at the end.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.olsTrend(
          Tables.events(s, dir)
            .groupBy(col("event_type"),
              (unix_millis(date_trunc("DAY", col("ts"))) / lit(86400000L))
                .cast("long").as("_day"))
            .agg(count(lit(1)).cast("long").as("_n")),
          "event_type", "_day", "_n")
          .orderBy(col("event_type")),
      Some("""WITH d AS (SELECT event_type,
        |epoch_ms(date_trunc('day', ts)) // 86400000 AS x,
        |CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |x0 AS (SELECT min(x) AS x0 FROM d),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(x - x0.x0) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |CAST(sum((x - x0.x0) * y) AS BIGINT) AS sxy,
        |CAST(sum((x - x0.x0) * (x - x0.x0)) AS BIGINT) AS sxx,
        |CAST(sum(y * y) AS BIGINT) AS syy FROM d, x0 GROUP BY 1),
        |q AS (SELECT event_type, n, sx, sy,
        |CAST(n * sxy - sx * sy AS BIGINT) AS a,
        |CAST(n * sxx - sx * sx AS BIGINT) AS b,
        |CAST(n * syy - sy * sy AS BIGINT) AS c FROM s)
        |SELECT event_type, n AS n_points,
        |round(CAST(a AS DOUBLE) / b, 6) AS slope,
        |round(CAST(sy * b - a * sx AS DOUBLE) / (n * b), 6) AS intercept,
        |round(CASE WHEN c = 0 THEN 0.0
        |ELSE CAST(a AS DOUBLE) * a / (b * c) END, 6) AS r2
        |FROM q ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("s25_stream_ols",
      // J32 under streaming (streaming/Streaming.runStreamOls): the
      // volume-drift monitor — day-grain count state (counts ARE
      // additive; power sums of partial days are not, so they fold at
      // read time), bounded at |types|·|days|; j32's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s25")
        graft.streaming.Streaming.runStreamOls(s, dir, base + "/ols")
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type,
        |epoch_ms(date_trunc('day', ts)) // 86400000 AS x,
        |CAST(count(*) AS BIGINT) AS y FROM events GROUP BY 1, 2),
        |x0 AS (SELECT min(x) AS x0 FROM d),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(x - x0.x0) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |CAST(sum((x - x0.x0) * y) AS BIGINT) AS sxy,
        |CAST(sum((x - x0.x0) * (x - x0.x0)) AS BIGINT) AS sxx,
        |CAST(sum(y * y) AS BIGINT) AS syy FROM d, x0 GROUP BY 1),
        |q AS (SELECT event_type, n, sx, sy,
        |CAST(n * sxy - sx * sy AS BIGINT) AS a,
        |CAST(n * sxx - sx * sx AS BIGINT) AS b,
        |CAST(n * syy - sy * sy AS BIGINT) AS c FROM s)
        |SELECT event_type, n AS n_points,
        |round(CAST(a AS DOUBLE) / b, 6) AS slope,
        |round(CAST(sy * b - a * sx AS DOUBLE) / (n * b), 6) AS intercept,
        |round(CASE WHEN c = 0 THEN 0.0
        |ELSE CAST(a AS DOUBLE) * a / (b * c) END, 6) AS r2
        |FROM q ORDER BY event_type""".stripMargin.replace("\n", " "))),

    ("x111_ndcg",
      // Ranking-quality eval (operators/Eval.bm25Ndcg): NDCG@10 of x45's
      // BM25 ranking against graded term-coverage relevance — x73 grades
      // the candidate SET, this grades the ORDER. Discounts written as
      // ln(rank+1)/ln(2) on both engines; ranks via the bounded
      // zipWithIndex path, never a single-partition window.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.bm25Ndcg(Tables.documents(s, dir), "doc_id",
          "text", Seq("hash", "join", "scan"), 10),
      Some("""WITH toks AS (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t FROM documents),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |CAST(sum(len(t)) AS BIGINT) AS total_len,
        |CAST(sum(CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |CAST(sum(CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |CAST(sum(CASE WHEN list_contains(t, 'scan') THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |FROM toks),
        |sc AS (SELECT doc_id,
        |len(list_filter(t, x -> x = 'hash')) AS tf0,
        |len(list_filter(t, x -> x = 'join')) AS tf1,
        |len(list_filter(t, x -> x = 'scan')) AS tf2,
        |len(t) AS dl, n_docs, total_len, df0, df1, df2 FROM toks, stats),
        |s2 AS (SELECT doc_id,
        |ln(1 + (n_docs - df0 + 0.5) / (df0 + 0.5)) * (tf0 * 2.2) / (tf0 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df1 + 0.5) / (df1 + 0.5)) * (tf1 * 2.2) / (tf1 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE)))
        |+ ln(1 + (n_docs - df2 + 0.5) / (df2 + 0.5)) * (tf2 * 2.2) / (tf2 + 1.2 * (0.25 + 0.75 * dl * n_docs / CAST(total_len AS DOUBLE))) AS score,
        |tf0 + tf1 + tf2 AS ntf FROM sc),
        |top AS (SELECT doc_id, round(score, 4) AS bm25 FROM s2 WHERE ntf > 0
        |ORDER BY round(score, 4) DESC, doc_id LIMIT 10),
        |rk AS (SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank FROM top),
        |rel AS MATERIALIZED (SELECT doc_id,
        |CAST((CASE WHEN list_contains(t, 'hash') THEN 1 ELSE 0 END)
        |+ (CASE WHEN list_contains(t, 'join') THEN 1 ELSE 0 END)
        |+ (CASE WHEN list_contains(t, 'scan') THEN 1 ELSE 0 END) AS BIGINT) AS rel
        |FROM toks),
        |dcg AS (SELECT sum((pow(2.0, rel) - 1) / (ln(rank + 1.0) / ln(2.0))) AS v
        |FROM rk JOIN rel USING (doc_id)),
        |itop AS (SELECT doc_id, rel FROM rel ORDER BY rel DESC, doc_id LIMIT 10),
        |irk AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id) AS rank FROM itop),
        |idcg AS (SELECT sum((pow(2.0, rel) - 1) / (ln(rank + 1.0) / ln(2.0))) AS v
        |FROM irk)
        |SELECT CAST(10 AS BIGINT) AS k, round(dcg.v, 6) AS dcg,
        |round(idcg.v, 6) AS idcg, round(dcg.v / idcg.v, 6) AS ndcg
        |FROM dcg, idcg""".stripMargin.replace("\n", " "))),

    ("j33_funnel_ci",
      // Funnel step rates with Wilson score intervals (operators/Funnel.
      // funnelWilson): the "really worse, or cohort-size luck?" read over
      // q24's funnel — z/z² computed once and interpolated into BOTH
      // engines' arithmetic verbatim, every CI term in the same op order.
      (s: SparkSession, dir: String) =>
        Funnel.funnelWilson(
          Funnel.funnel(
            Tables.events(s, dir).select(col("user_id"), col("event_type"),
              unix_millis(col("ts")).as("ms")),
            "user_id", "event_type", "ms", Seq("view", "click", "purchase")),
          Seq("view", "click", "purchase"), 1.96)
          .orderBy(col("step")),
      Some {
        val z = 1.96
        val z2 = z * z
        s"""WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, min(ms) AS view_ms FROM e
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(e.ms) AS click_ms FROM e JOIN v USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ms > v.view_ms GROUP BY 1),
        |p AS (SELECT e.user_id, min(e.ms) AS purchase_ms FROM e JOIN c USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ms > c.click_ms GROUP BY 1),
        |f AS (SELECT v.user_id, view_ms, click_ms, purchase_ms
        |FROM v LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)),
        |cnt AS (SELECT CAST(count(*) AS BIGINT) AS n0,
        |CAST(sum(CASE WHEN click_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |CAST(sum(CASE WHEN purchase_ms IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |FROM f),
        |st AS (SELECT 0 AS step, 'view' AS step_name, n0 AS k, n0 AS b FROM cnt
        |UNION ALL SELECT 1, 'click', n1, n0 FROM cnt
        |UNION ALL SELECT 2, 'purchase', n2, n0 FROM cnt),
        |w AS (SELECT step, step_name, k,
        |CAST(k AS DOUBLE) / CAST(b AS DOUBLE) AS pp, CAST(b AS DOUBLE) AS n FROM st)
        |SELECT CAST(step AS BIGINT) AS step, step_name,
        |CAST(k AS BIGINT) AS n_reached, round(pp, 6) AS rate,
        |round((pp + $z2 / (2.0 * n)) / (1.0 + $z2 / n) -
        |$z * sqrt(pp * (1.0 - pp) / n + $z2 / (4.0 * n * n)) / (1.0 + $z2 / n), 6) AS ci_lo,
        |round((pp + $z2 / (2.0 * n)) / (1.0 + $z2 / n) +
        |$z * sqrt(pp * (1.0 - pp) / n + $z2 / (4.0 * n * n)) / (1.0 + $z2 / n), 6) AS ci_hi
        |FROM w ORDER BY step""".stripMargin.replace("\n", " ")
      }),

    ("s26_stream_kappa",
      // X106 under streaming (streaming/Streaming.runStreamKappa): live
      // classifier-agreement monitoring — state = the (pred, gold)
      // confusion matrix, bounded at |classes|² forever, additive upserts
      // exactly-once, exact-integer kappa folded at read; x106's oracle
      // verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s26")
        graft.streaming.Streaming.runStreamKappa(s, dir, base + "/kp")
      },
      Some(s"""WITH pr AS MATERIALIZED (SELECT doc_id, pred_lang
        |FROM ($langIdOracleSql) t),
        |j AS (SELECT pr.pred_lang AS p, d.lang AS g
        |FROM pr JOIN documents d USING (doc_id)),
        |o AS (SELECT p, g, CAST(count(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(c) AS BIGINT) AS n,
        |CAST(sum(CASE WHEN p = g THEN c ELSE 0 END) AS BIGINT) AS agree FROM o),
        |rt AS (SELECT p, CAST(sum(c) AS BIGINT) AS rc FROM o GROUP BY 1),
        |ct AS (SELECT g, CAST(sum(c) AS BIGINT) AS cc FROM o GROUP BY 1),
        |pp AS (SELECT coalesce(CAST(sum(rt.rc * ct.cc) AS BIGINT), 0) AS x
        |FROM rt JOIN ct ON rt.p = ct.g)
        |SELECT t.n, round(t.agree / CAST(t.n AS DOUBLE), 4) AS po,
        |round(pp.x / CAST(t.n * t.n AS DOUBLE), 4) AS pe,
        |round(CAST(t.agree * t.n - pp.x AS DOUBLE) / (t.n * t.n - pp.x), 4)
        |AS kappa FROM t, pp""".stripMargin.replace("\n", " "))),

    ("j34_kaplan_meier",
      // Kaplan-Meier time-to-purchase after each signup, administratively
      // right-censored at 24 h (operators/Survival) — the unbiased
      // complement of q28's converters-only latency percentiles. The
      // product-limit fold is two bounded literal-grid roll-ups (the
      // vocabCoverage discipline), never a global window.
      (s: SparkSession, dir: String) => {
        val e = Tables.events(s, dir).select(col("event_id"),
          col("user_id"), col("event_type"), unix_millis(col("ts")).as("_ms"))
        graft.operators.Survival.kaplanMeier(
          graft.operators.Survival.timeToEvent(e, "event_id", "user_id",
            "event_type", "_ms", "signup", "purchase", 24, 3600000L), 24)
          .orderBy(col("t"))
      },
      Some("""WITH s AS (SELECT event_id, user_id, epoch_ms(ts) AS sms
        |FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_ms(ts) AS pms FROM events
        |WHERE event_type = 'purchase'),
        |subj0 AS (SELECT s.event_id, min(p.pms - s.sms) AS diff
        |FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.pms > s.sms
        |AND p.pms - s.sms <= 86400000 GROUP BY s.event_id),
        |subj AS (SELECT CASE WHEN diff IS NULL THEN 24
        |ELSE CAST(floor(diff / 3600000.0) AS BIGINT) END AS t,
        |CASE WHEN diff IS NULL THEN 0 ELSE 1 END AS d FROM subj0),
        |byt AS (SELECT t, CAST(sum(d) AS BIGINT) AS dd,
        |CAST(count(*) AS BIGINT) AS c FROM subj GROUP BY t),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM subj),
        |grid AS (SELECT CAST(range AS BIGINT) AS tt FROM range(0, 25)),
        |ar AS (SELECT g.tt,
        |CAST(sum(CASE WHEN b.t = g.tt THEN b.dd ELSE 0 END) AS BIGINT) AS d,
        |CAST(max(n.nn) - sum(CASE WHEN b.t < g.tt THEN b.c ELSE 0 END)
        |AS BIGINT) AS n_risk
        |FROM grid g CROSS JOIN byt b CROSS JOIN n GROUP BY g.tt),
        |km AS (SELECT g2.tt AS t,
        |max(CASE WHEN a.tt = g2.tt THEN a.d END) AS d,
        |max(CASE WHEN a.tt = g2.tt THEN a.n_risk END) AS n_risk,
        |sum(CASE WHEN a.tt <= g2.tt AND a.d > 0 AND a.d < a.n_risk
        |THEN ln(1.0 - CAST(a.d AS DOUBLE) / a.n_risk) ELSE 0.0 END) AS logs,
        |max(CASE WHEN a.tt <= g2.tt AND a.d > 0 AND a.d = a.n_risk
        |THEN 1 ELSE 0 END) AS dead
        |FROM grid g2 CROSS JOIN ar a GROUP BY g2.tt)
        |SELECT t, d, n_risk, CASE WHEN dead = 1 THEN 0.0
        |ELSE round(exp(logs), 6) END AS survival
        |FROM km WHERE d > 0 ORDER BY t""".stripMargin.replace("\n", " "))),

    ("j58_logrank",
      // Two-sample log-rank test (operators/Survival.logRank): j34's KM
      // curves compared properly — even/odd user cohorts on the same
      // signup->purchase subjects, observed vs hypergeometric-expected
      // events at every bucket with an event, chi2 = (sum(o-e))^2/sum v
      // on 1 df. Every term derives from exact integer (d, n_risk)
      // counts and rounds 6 dp before the fold; sums round again before
      // the final ratio. At-risk roll-up = the KM literal-grid
      // discipline per group, never a global window.
      (s: SparkSession, dir: String) => {
        val e = Tables.events(s, dir).select(col("event_id"),
          col("user_id"), (col("user_id") % 2).as("cohort"),
          col("event_type"), unix_millis(col("ts")).as("_ms"))
        graft.operators.Survival.logRank(
          graft.operators.Survival.timeToEventGrouped(e, "event_id",
            "user_id", "event_type", "_ms", "signup", "purchase",
            24, 3600000L, "cohort"),
          "cohort", 24)
      },
      Some("""WITH s AS (SELECT event_id, user_id, user_id % 2 AS g,
        |epoch_ms(ts) AS sms FROM events WHERE event_type = 'signup'),
        |p AS (SELECT user_id, epoch_ms(ts) AS pms FROM events
        |WHERE event_type = 'purchase'),
        |subj0 AS (SELECT s.event_id, any_value(s.g) AS g,
        |min(p.pms - s.sms) AS diff
        |FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.pms > s.sms
        |AND p.pms - s.sms <= 86400000 GROUP BY s.event_id),
        |subj AS (SELECT g, CASE WHEN diff IS NULL THEN 24
        |ELSE CAST(floor(diff / 3600000.0) AS BIGINT) END AS t,
        |CASE WHEN diff IS NULL THEN 0 ELSE 1 END AS d FROM subj0),
        |bygt AS (SELECT g, t, CAST(sum(d) AS BIGINT) AS dd,
        |CAST(count(*) AS BIGINT) AS c FROM subj GROUP BY 1, 2),
        |ng AS (SELECT g, CAST(count(*) AS BIGINT) AS nn FROM subj
        |GROUP BY 1),
        |grid AS (SELECT CAST(range AS BIGINT) AS tt FROM range(0, 25)),
        |ar AS (SELECT n.g, g2.tt,
        |CAST(coalesce(sum(CASE WHEN b.t = g2.tt THEN b.dd END), 0)
        |AS BIGINT) AS d,
        |CAST(max(n.nn) - coalesce(sum(CASE WHEN b.t < g2.tt THEN b.c END),
        |0) AS BIGINT) AS n_risk
        |FROM grid g2 CROSS JOIN ng n LEFT JOIN bygt b ON b.g = n.g
        |GROUP BY 1, 2),
        |pv AS (SELECT a0.tt, a0.d AS d0, a0.n_risk AS n0, a1.d AS d1,
        |a1.n_risk AS n1
        |FROM (SELECT * FROM ar WHERE g = 0) a0
        |JOIN (SELECT * FROM ar WHERE g = 1) a1 USING (tt)),
        |terms AS (SELECT tt, d0, d1, n0, n1, d0 + d1 AS dt,
        |n0 + n1 AS nt FROM pv WHERE d0 + d1 > 0 AND n0 + n1 > 1),
        |ft AS (SELECT
        |round(CAST(dt AS DOUBLE) * n0 / nt, 6) AS e0,
        |round(CAST(dt AS DOUBLE) * n1 / nt, 6) AS e1,
        |round(d1 - CAST(dt AS DOUBLE) * n1 / nt, 6) AS oe,
        |round(CAST(dt AS DOUBLE) * n1 * n0 * (nt - dt) /
        |(CAST(nt AS DOUBLE) * nt * (nt - 1)), 6) AS v,
        |d0, d1 FROM terms)
        |SELECT (SELECT nn FROM ng WHERE g = 0) AS n0,
        |(SELECT nn FROM ng WHERE g = 1) AS n1,
        |CAST(sum(d0) AS BIGINT) AS obs0, round(sum(e0), 6) AS exp0,
        |CAST(sum(d1) AS BIGINT) AS obs1, round(sum(e1), 6) AS exp1,
        |round(round(sum(oe), 6) * round(sum(oe), 6) /
        |round(sum(v), 6), 4) AS chi2 FROM ft"""
        .stripMargin.replace("\n", " "))),

    ("j60_new_vs_returning",
      // New-vs-returning daily actives (operators/Funnel.newVsReturning):
      // every day's DAU decomposed into first-ever appearances vs
      // returns — the growth-accounting split j14's fixed-cohort
      // retention can't give. One (user, day) distinct, a user-grain
      // first-seen min, one same-grain equi-join, day-grain agg.
      (s: SparkSession, dir: String) =>
        Funnel.newVsReturning(Tables.events(s, dir), "user_id", "ts")
          .orderBy(col("day")),
      Some(newVsReturningOracle)),

    ("s39_stream_new_returning",
      // J60 under streaming (streaming/Streaming.runStreamNewVsReturning):
      // "new" is a global first-ever property no per-batch row can
      // decide, so state is the (user, day) PRESENCE table - count
      // values never matter, which makes replay harmless by
      // construction - and the first-seen/decompose fold runs at read
      // time; j60's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s39")
        graft.streaming.Streaming.runStreamNewVsReturning(
            s, dir, base + "/nvr")
          .orderBy(col("day"))
      },
      Some(newVsReturningOracle)),

    ("j59_abc_pareto",
      // ABC/Pareto inventory classification (queries/Serving.cumulated):
      // parts ranked by revenue, running cumulative share, classes at
      // 80/95% — the merchandising cut. The cumulative sum is the NEW
      // scale-safe distributed prefix sum (range-partition sort +
      // per-partition (count, sum) offsets, the ranked() discipline) —
      // never an Exchange SinglePartition window. Part revenue rounds
      // 4 dp (cent-product grid), then the FOLD RUNS ON INTEGER GRID
      // UNITS (_revu = round(rev*1e4)): integer-valued doubles add
      // exactly in any association, so cum — and the 6-dp share the
      // 0.80/0.95 class cuts read — is bit-identical under any shuffle
      // partitioning AND to the oracle's sequential window (the
      // cumulated() exactness contract). Shares divide out in grid
      // units (cum/Σrevu ≡ cumrev/Σrev), so no precision is lost.
      // Scale bound (r11 advice): grid-unit exactness holds while every
      // prefix sum of rev·1e4 stays below 2^53 — total lineitem revenue
      // crosses that around sf≈5; past it, move the grid to cents (1e2)
      // or widen to DECIMAL before trusting bit-identity.
      (s: SparkSession, dir: String) => {
        val pr = Tables.lineitem(s, dir).groupBy(col("l_partkey"))
          .agg(round(sum(col("l_extendedprice") *
            (lit(1) - col("l_discount"))), 4).as("rev"))
          .withColumn("_revu", round(col("rev") * 10000, 0))
        val tot = pr.agg(sum(col("_revu")).as("_t"))
        val cs = round(col("cum") / col("_t"), 6)
        graft.queries.Serving.cumulated(pr, "_revu", "l_partkey")
          .crossJoin(broadcast(tot))
          .withColumn("abc", when(cs <= 0.80, "A")
            .when(cs <= 0.95, "B").otherwise("C"))
          .groupBy(col("abc"))
          .agg(count(lit(1)).cast("long").as("n_parts"),
            round(sum(col("rev")), 2).as("revenue"),
            round(sum(col("_revu")) / first(col("_t")), 6).as("rev_share"),
            min(col("rank")).cast("long").as("min_rank"),
            max(col("rank")).cast("long").as("max_rank"))
          .orderBy(col("abc"))
      },
      Some("""WITH pr AS (SELECT l_partkey,
        |round(sum(l_extendedprice * (1 - l_discount)), 4) AS rev,
        |round(round(sum(l_extendedprice * (1 - l_discount)), 4) * 10000)
        |AS revu
        |FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(revu) AS t FROM pr),
        |c AS (SELECT l_partkey, rev, revu,
        |row_number() OVER (ORDER BY revu DESC, l_partkey) AS rnk,
        |sum(revu) OVER (ORDER BY revu DESC, l_partkey
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM pr),
        |lab AS (SELECT c.*, t.t,
        |CASE WHEN round(cum / t.t, 6) <= 0.80 THEN 'A'
        |WHEN round(cum / t.t, 6) <= 0.95 THEN 'B' ELSE 'C' END AS abc
        |FROM c CROSS JOIN tot t)
        |SELECT abc, CAST(count(*) AS BIGINT) AS n_parts,
        |round(sum(rev), 2) AS revenue,
        |round(sum(revu) / any_value(t), 6) AS rev_share,
        |CAST(min(rnk) AS BIGINT) AS min_rank,
        |CAST(max(rnk) AS BIGINT) AS max_rank
        |FROM lab GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    ("j35_assortativity",
      // Degree assortativity of the urgent-order co-purchase graph
      // (operators/Graph.assortativity) — j24's edge derivation, Newman's
      // Pearson-of-end-degrees; exact-integer sums up to one division.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .distinct()
        graft.operators.Graph.assortativity(pairs, "pa", "pb")
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'),
        |e AS (SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
        |FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
        |AND a.l_partkey < b.l_partkey),
        |bi AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
        |deg AS (SELECT u AS n, CAST(count(*) AS BIGINT) AS k
        |FROM bi GROUP BY 1),
        |ek AS (SELECT du.k AS ku, dv.k AS kv FROM bi
        |JOIN deg du ON du.n = bi.u JOIN deg dv ON dv.n = bi.v),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m2,
        |CAST(sum(ku * kv) AS BIGINT) AS sjk,
        |CAST(sum(ku) AS BIGINT) AS sj,
        |CAST(sum(ku * ku) AS BIGINT) AS sj2 FROM ek),
        |f AS (SELECT m2,
        |CAST(sjk AS DOUBLE) / m2
        |- (CAST(sj AS DOUBLE) / m2) * (CAST(sj AS DOUBLE) / m2) AS num,
        |CAST(sj2 AS DOUBLE) / m2
        |- (CAST(sj AS DOUBLE) / m2) * (CAST(sj AS DOUBLE) / m2) AS den
        |FROM m)
        |SELECT CAST(m2 / 2 AS BIGINT) AS n_edges,
        |CASE WHEN den <> 0.0 THEN round(num / den, 6) END
        |AS assortativity FROM f""".stripMargin.replace("\n", " "))),

    ("j36_leadlag_xcorr",
      // Lead-lag cross-correlation of the click vs purchase daily volume
      // curves (operators/TimeSeries.leadLagCorr): which curve LEADS and
      // by how many days — literal lag explode, one shifted-bucket
      // equi-join at series grain, exact BIGINT power sums per lag.
      (s: SparkSession, dir: String) => {
        val d = Tables.events(s, dir).select(
          floor(unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("event_type"))
        def daily(t: String) = d.where(col("event_type") === t)
          .groupBy(col("day")).agg(count(lit(1)).cast("long").as("c"))
        graft.operators.TimeSeries.leadLagCorr(
            daily("click"), daily("purchase"), "day", "c", "c", 3)
          .orderBy(col("lag"))
      },
      Some("""WITH d AS (SELECT CAST(floor(epoch_ms(ts) / 86400000.0)
        |AS BIGINT) AS day, event_type FROM events),
        |x AS (SELECT day, CAST(count(*) AS BIGINT) AS xc FROM d
        |WHERE event_type = 'click' GROUP BY 1),
        |y AS (SELECT day, CAST(count(*) AS BIGINT) AS yc FROM d
        |WHERE event_type = 'purchase' GROUP BY 1),
        |lags AS (SELECT CAST(range AS BIGINT) - 3 AS lag FROM range(0, 7)),
        |p AS (SELECT l.lag, x.xc, y.yc FROM lags l
        |JOIN x ON TRUE JOIN y ON y.day = x.day + l.lag),
        |s AS (SELECT lag, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(xc) AS BIGINT) AS sx, CAST(sum(yc) AS BIGINT) AS sy,
        |CAST(sum(xc * yc) AS BIGINT) AS sxy,
        |CAST(sum(xc * xc) AS BIGINT) AS sx2,
        |CAST(sum(yc * yc) AS BIGINT) AS sy2 FROM p GROUP BY 1),
        |f AS (SELECT lag, n,
        |CAST(n * sxy - sx * sy AS DOUBLE) AS num,
        |sqrt(CAST(n * sx2 - sx * sx AS DOUBLE))
        |* sqrt(CAST(n * sy2 - sy * sy AS DOUBLE)) AS den FROM s)
        |SELECT lag, n, CASE WHEN den <> 0.0 THEN round(num / den, 6) END
        |AS xcorr FROM f ORDER BY lag""".stripMargin.replace("\n", " "))),

    ("x112_t_closeness",
      // t-closeness audit per source over the document-length distribution
      // (operators/Maintenance.tClosenessAudit): ordered-attribute EMD
      // between each group's bucket distribution and the global one —
      // completes the x53 k-anonymity / x77 l-diversity privacy family.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.tClosenessAudit(
            Tables.documents(s, dir), "source", "n_chars", 50.0, 10)
          .orderBy(col("source")),
      Some("""WITH b AS (SELECT source,
        |least(CAST(floor(n_chars / 50.0) AS BIGINT), 9) AS bucket
        |FROM documents),
        |g AS (SELECT source, bucket, CAST(count(*) AS BIGINT) AS c
        |FROM b GROUP BY 1, 2),
        |gt AS (SELECT source, CAST(sum(c) AS BIGINT) AS tot
        |FROM g GROUP BY 1),
        |gd AS (SELECT bucket, CAST(count(*) AS BIGINT) AS gc
        |FROM b GROUP BY 1),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS nn FROM b),
        |grid AS (SELECT s.source, gr.bucket
        |FROM (SELECT DISTINCT source FROM b) s
        |CROSS JOIN (SELECT CAST(range AS BIGINT) AS bucket
        |FROM range(0, 10)) gr),
        |p AS (SELECT grid.source, grid.bucket,
        |coalesce(g.c, 0) / CAST(gt.tot AS DOUBLE) AS pg,
        |coalesce(gd.gc, 0) / CAST(n.nn AS DOUBLE) AS pq
        |FROM grid LEFT JOIN g ON g.source = grid.source
        |AND g.bucket = grid.bucket
        |JOIN gt ON gt.source = grid.source
        |LEFT JOIN gd ON gd.bucket = grid.bucket CROSS JOIN n),
        |cum AS (SELECT source, bucket,
        |sum(pg - pq) OVER (PARTITION BY source ORDER BY bucket) AS cd
        |FROM p)
        |SELECT source, round(sum(abs(cd)) / 9.0, 6) AS emd
        |FROM cum WHERE bucket < 9 GROUP BY source
        |ORDER BY source""".stripMargin.replace("\n", " "))),

    ("x113_fleiss_kappa",
      // Fleiss' kappa of three cheap quality "raters" (length class,
      // token-count class, vocabulary-richness class at corpus-tercile
      // literal cuts) over every document (operators/Eval.fleissKappa) —
      // the do-our-signals-even-agree gate before x65's ensemble.
      (s: SparkSession, dir: String) => {
        import graft.operators.TextAnalysis
        val f = Tables.documents(s, dir).select(col("doc_id"),
          col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).as("_wt"),
          size(array_distinct(TextAnalysis.tokens(col("text")))).as("_dt"))
        def cls(c: org.apache.spark.sql.Column, t1: Int, t2: Int) =
          when(c < t1, 0).when(c < t2, 1).otherwise(2)
        val ratings = f.select(col("doc_id"),
            cls(col("n_chars"), 216, 372).as("cat"))
          .unionByName(f.select(col("doc_id"),
            cls(col("_wt"), 39, 68).as("cat")))
          .unionByName(f.select(col("doc_id"),
            cls(col("_dt"), 22, 27).as("cat")))
        graft.operators.Eval.fleissKappa(ratings, "doc_id", "cat", 3)
      },
      Some("""WITH f AS (SELECT doc_id, n_chars,
        |len(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> '')) AS wt,
        |len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> ''))) AS dt FROM documents),
        |r AS (SELECT doc_id, CASE WHEN n_chars < 216 THEN 0
        |WHEN n_chars < 372 THEN 1 ELSE 2 END AS cat FROM f
        |UNION ALL SELECT doc_id, CASE WHEN wt < 39 THEN 0
        |WHEN wt < 68 THEN 1 ELSE 2 END FROM f
        |UNION ALL SELECT doc_id, CASE WHEN dt < 22 THEN 0
        |WHEN dt < 27 THEN 1 ELSE 2 END FROM f),
        |m AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS nij
        |FROM r GROUP BY 1, 2),
        |s AS (SELECT CAST(sum(nij * nij) AS BIGINT) AS s2,
        |CAST(count(DISTINCT doc_id) AS BIGINT) AS ni FROM m),
        |cj AS (SELECT cat, CAST(sum(nij) AS BIGINT) AS c FROM m GROUP BY 1),
        |sc AS (SELECT CAST(sum(c * c) AS BIGINT) AS sc2 FROM cj),
        |k AS (SELECT ni,
        |CAST(s2 - ni * 3 AS DOUBLE) / CAST(ni * 3 * 2 AS DOUBLE) AS pbar,
        |CAST(sc2 AS DOUBLE) / CAST((ni * 3) * (ni * 3) AS DOUBLE) AS pe
        |FROM s CROSS JOIN sc)
        |SELECT ni AS n_items, round(pbar, 6) AS p_bar,
        |round(pe, 6) AS p_e,
        |CASE WHEN pe <> 1.0 THEN round((pbar - pe) / (1.0 - pe), 6) END
        |AS kappa FROM k""".stripMargin.replace("\n", " "))),

    ("x114_rouge_pairs",
      // Clipped-count ROUGE-2 over x6's exact-Jaccard candidate pairs at
      // 0.5 (operators/Eval.rougeN): the multiset metric distinct-set
      // Dice can't express — repeated bigrams only score up to the other
      // side's copy count. Oracle re-derives the pair set unpruned.
      // The pair frame materializes once (eager checkpoint): the scorer
      // references it as both endpoint pruner and pair list, and replays
      // of the embedded x6 candidate pipeline were the r8-measured waste.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Eval.rougeN(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text", 2)
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |bg0 AS (SELECT doc_id, CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END AS bl FROM toks),
        |bg AS MATERIALIZED (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |FROM (SELECT doc_id, unnest(bl) AS g FROM bg0) GROUP BY 1, 2),
        |bsz AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n
        |FROM bg GROUP BY 1),
        |bi AS (SELECT p.id_a, p.id_b,
        |CAST(sum(least(a.c, b.c)) AS BIGINT) AS i FROM prs p
        |JOIN bg a ON a.doc_id = p.id_a
        |JOIN bg b ON b.doc_id = p.id_b AND b.g = a.g GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, coalesce(bi.i, 0) AS overlap,
        |round(coalesce(bi.i, 0) / CAST(sb.n AS DOUBLE), 6) AS rouge_p,
        |round(coalesce(bi.i, 0) / CAST(sa.n AS DOUBLE), 6) AS rouge_r,
        |round(2 * coalesce(bi.i, 0) / CAST(sa.n + sb.n AS DOUBLE), 6)
        |AS rouge_f1 FROM prs p
        |LEFT JOIN bi ON bi.id_a = p.id_a AND bi.id_b = p.id_b
        |JOIN bsz sa ON sa.doc_id = p.id_a
        |JOIN bsz sb ON sb.doc_id = p.id_b
        |ORDER BY p.id_a, p.id_b""".stripMargin.replace("\n", " "))),

    ("x115_pq_encode",
      // Product quantization (Similarity.pqTrainEncode): 2 subspaces x 4
      // L2 centroids, 2 Lloyd rounds, every vector encoded as its
      // per-subspace nearest codewords + reconstruction distance — the
      // memory-compression leg of the ANN stack (IVF prunes WHERE to
      // look, PQ shrinks WHAT is stored).
      (s: SparkSession, dir: String) =>
        Similarity.pqTrainEncode(Tables.embeddings(s, dir),
            "vec_id", "embedding", 2, 4, 2)
          .orderBy(col("vec_id")),
      Some(pqOracleSql)),

    ("x116_psi",
      // Population Stability Index of each source's document-length
      // distribution against the corpus (operators/Maintenance.psi):
      // fixed literal bin edges, +0.5-smoothed proportions. The third
      // leg of the drift family — x91 tests (KS), x101 fingerprints
      // (KL), PSI scores against the 0.1/0.25 action thresholds.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.psi(Tables.documents(s, dir),
            "source", "n_chars", Seq(120d, 200d, 280d, 360d, 440d))
          .orderBy(col("source")),
      Some("""WITH b AS (SELECT source,
        |CASE WHEN n_chars < 120 THEN 0 WHEN n_chars < 200 THEN 1
        |WHEN n_chars < 280 THEN 2 WHEN n_chars < 360 THEN 3
        |WHEN n_chars < 440 THEN 4 ELSE 5 END AS bin FROM documents),
        |sb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
        |FROM b GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |FROM sb GROUP BY 1),
        |cb AS (SELECT bin, CAST(count(*) AS BIGINT) AS c
        |FROM b GROUP BY 1),
        |ct AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cb),
        |grid AS (SELECT st.source, st.n, g.bin FROM st
        |CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS bin) g),
        |p AS (SELECT grid.source, grid.bin,
        |(coalesce(sb.c, 0) + 0.5) / (grid.n + 3.0) AS p,
        |(coalesce(cb.c, 0) + 0.5) / (ct.n + 3.0) AS q
        |FROM grid LEFT JOIN sb ON sb.source = grid.source
        |AND sb.bin = grid.bin
        |LEFT JOIN cb ON cb.bin = grid.bin CROSS JOIN ct)
        |SELECT source, round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM p GROUP BY 1 ORDER BY source""".stripMargin
        .replace("\n", " "))),

    ("j37_adamic_adar",
      // Adamic-Adar link prediction on the urgent-order co-purchase graph
      // (operators/Graph.adamicAdar): top-20 NOT-yet-connected part pairs
      // by Σ 1/ln(deg) over common neighbors — j24's clique read turned
      // into a recommendation. The oracle enumerates the same wedges from
      // the bidirectional edge list.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.adamicAdar(pairs, "pa", "pb", 20)
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'),
        |e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
        |b.l_partkey AS v FROM li a
        |JOIN li b ON a.l_orderkey = b.l_orderkey
        |AND a.l_partkey < b.l_partkey),
        |und AS MATERIALIZED (SELECT u, v FROM e
        |UNION ALL SELECT v, u FROM e),
        |deg AS (SELECT u AS w, CAST(count(*) AS BIGINT) AS d
        |FROM und GROUP BY 1),
        |wedge AS (SELECT a.u AS x, b.u AS y, a.v AS w FROM und a
        |JOIN und b ON a.v = b.v AND a.u < b.u),
        |aa AS (SELECT x, y, CAST(count(*) AS BIGINT) AS common_neighbors,
        |round(sum(1.0 / ln(deg.d)), 6) AS aa_score
        |FROM wedge JOIN deg ON deg.w = wedge.w GROUP BY 1, 2),
        |nonadj AS (SELECT aa.* FROM aa
        |LEFT JOIN e ON e.u = aa.x AND e.v = aa.y WHERE e.u IS NULL)
        |SELECT x AS part_a, y AS part_b, common_neighbors, aa_score
        |FROM nonadj ORDER BY aa_score DESC, part_a, part_b LIMIT 20"""
        .stripMargin.replace("\n", " "))),

    ("j38_local_clustering",
      // Local clustering coefficient (operators/Graph.localClustering)
      // on the same co-purchase graph: 2T(v)/(d(v)(d(v)-1)) per part —
      // j24's triangle counts normalized into the clique-membership
      // scalar; degree-1 parts emit NULL, not a divide error.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.localClustering(pairs, "pa", "pb")
          .orderBy(col("lcc").desc_nulls_last, col("vertex").asc)
          .limit(30)
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'),
        |e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS u,
        |b.l_partkey AS v FROM li a
        |JOIN li b ON a.l_orderkey = b.l_orderkey
        |AND a.l_partkey < b.l_partkey),
        |tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        |FROM e e1 JOIN e e2 ON e1.v = e2.u
        |JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |pv AS (SELECT a AS vertex FROM tri UNION ALL SELECT b FROM tri
        |UNION ALL SELECT c FROM tri),
        |tc AS (SELECT vertex AS tv, CAST(count(*) AS BIGINT) AS triangles
        |FROM pv GROUP BY 1),
        |deg AS (SELECT vertex, CAST(count(*) AS BIGINT) AS degree FROM
        |(SELECT u AS vertex FROM e UNION ALL SELECT v FROM e) GROUP BY 1)
        |SELECT deg.vertex, deg.degree,
        |coalesce(tc.triangles, 0) AS triangles,
        |CASE WHEN deg.degree > 1 THEN round(2.0 * coalesce(tc.triangles, 0)
        |/ (deg.degree * (deg.degree - 1)), 6) END AS lcc
        |FROM deg LEFT JOIN tc ON tc.tv = deg.vertex
        |ORDER BY lcc DESC NULLS LAST, deg.vertex LIMIT 30""".stripMargin
        .replace("\n", " "))),

    ("x117_mrr",
      // Per-class Mean Reciprocal Rank of the centroid classifier
      // (operators/Eval.centroidMrr): each vector ranks all ten class
      // centroids by 6 dp cosine with class-id tie-breaks; the gold
      // class's 1/rank averages per class. The between-AUC-and-NDCG
      // ranking read; hits_at_1 is plain accuracy.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.centroidMrr(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label")
          .orderBy(col("class")),
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, round(avg(v), 6) AS m FROM p GROUP BY 1, 2),
        |cl AS MATERIALIZED (SELECT label AS cls, list(m ORDER BY pos) AS cent
        |FROM c GROUP BY 1),
        |d AS (SELECT e.vec_id, e.label AS gold, cl.cls,
        |round(${cosSql("e.embedding", "cl.cent")}, 6) AS score
        |FROM embeddings e CROSS JOIN cl),
        |r AS (SELECT vec_id, gold, cls,
        |row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cls) AS rk
        |FROM d)
        |SELECT CAST(gold AS BIGINT) AS class, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_1,
        |round(avg(1.0 / rk), 6) AS mrr
        |FROM r WHERE gold = cls GROUP BY 1 ORDER BY class""".stripMargin
        .replace("\n", " "))),

    ("x118_pq_adc",
      // PQ asymmetric-distance search (Similarity.pqAdcTopK): x115's
      // codebooks + per-subspace query LUTs; every encoded vector costs
      // m table lookups, the corpus is never decompressed. Top-15
      // neighbors of vec_id=7 by 6 dp ADC with id tie-breaks.
      (s: SparkSession, dir: String) =>
        Similarity.pqAdcTopK(Tables.embeddings(s, dir),
          "vec_id", "embedding", 2, 4, 2, 7L, 15),
      Some(pqAdcOracleSql(7L, 15))),

    ("x119_bleu_pairs",
      // BLEU-2 with brevity penalty over x6's exact-Jaccard candidate
      // pairs at 0.5 (operators/Eval.bleuPairs): the precision twin of
      // x114's ROUGE — clipped unigram+bigram precisions, geometric mean
      // as exp-of-half-log-sum identically on both engines, zero p_n
      // floors at 0 instead of a log(0) error. Pair frame eagerly
      // checkpointed — x114's replay rationale.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Eval.bleuPairs(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |g1 AS MATERIALIZED (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |FROM (SELECT doc_id, unnest(t) AS g FROM toks) GROUP BY 1, 2),
        |n1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM g1
        |GROUP BY 1),
        |bg0 AS (SELECT doc_id, CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END AS bl FROM toks),
        |g2 AS MATERIALIZED (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
        |FROM (SELECT doc_id, unnest(bl) AS g FROM bg0) GROUP BY 1, 2),
        |n2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM g2
        |GROUP BY 1),
        |i1 AS (SELECT p.id_a, p.id_b,
        |CAST(sum(least(a.c, b.c)) AS BIGINT) AS i FROM prs p
        |JOIN g1 a ON a.doc_id = p.id_a
        |JOIN g1 b ON b.doc_id = p.id_b AND b.g = a.g GROUP BY 1, 2),
        |i2 AS (SELECT p.id_a, p.id_b,
        |CAST(sum(least(a.c, b.c)) AS BIGINT) AS i FROM prs p
        |JOIN g2 a ON a.doc_id = p.id_a
        |JOIN g2 b ON b.doc_id = p.id_b AND b.g = a.g GROUP BY 1, 2),
        |f AS (SELECT p.id_a, p.id_b, ca.n AS cand_len, ra.n AS ref_len,
        |coalesce(i1.i, 0) AS v1, coalesce(i2.i, 0) AS v2,
        |coalesce(i1.i, 0) / CAST(ca.n AS DOUBLE) AS p1,
        |coalesce(i2.i, 0) / CAST(cb2.n AS DOUBLE) AS p2,
        |least(1.0, exp(1.0 - CAST(ra.n AS DOUBLE) / ca.n)) AS bp
        |FROM prs p
        |LEFT JOIN i1 ON i1.id_a = p.id_a AND i1.id_b = p.id_b
        |LEFT JOIN i2 ON i2.id_a = p.id_a AND i2.id_b = p.id_b
        |JOIN n1 ca ON ca.doc_id = p.id_a JOIN n1 ra ON ra.doc_id = p.id_b
        |JOIN n2 cb2 ON cb2.doc_id = p.id_a)
        |SELECT id_a, id_b, cand_len, ref_len, round(p1, 6) AS p1,
        |round(p2, 6) AS p2, round(bp, 6) AS bp,
        |round(CASE WHEN v1 > 0 AND v2 > 0
        |THEN bp * exp((ln(p1) + ln(p2)) / 2.0) ELSE 0.0 END, 6) AS bleu
        |FROM f ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("m6_phash_pairs",
      // Perceptual-hash (aHash) near-dup pairs over media payloads
      // (operators/Multimodal.perceptualHashPairs): 64 window-mean bits,
      // 8-band LSH candidates (lossless for Hamming <= 7 by pigeonhole),
      // exact zip_with verify. The statistics member of the binary-dedup
      // family — m1 is exact, m4 needs shared spans.
      (s: SparkSession, dir: String) =>
        graft.operators.Multimodal.perceptualHashPairs(
            graft.operators.Multimodal.mediaFromDocuments(
              Tables.documents(s, dir)), 8, 7)
          .orderBy(col("id_a"), col("id_b")),
      Some("""WITH m AS (SELECT doc_id AS media_id, text, len(text) AS n
        |FROM documents WHERE len(text) >= 64),
        |w AS (SELECT media_id, n // 64 AS wd,
        |list_transform(generate_series(0, 63), i ->
        |list_reduce(list_transform(
        |generate_series(i * (n // 64) + 1, (i + 1) * (n // 64)),
        |j -> ord(text[j])), (x, y) -> x + y)) AS ws FROM m),
        |b AS MATERIALIZED (SELECT media_id,
        |list_transform(ws, s -> CASE WHEN s * 64 >
        |list_reduce(ws, (x, y) -> x + y) THEN 1 ELSE 0 END) AS bits
        |FROM w),
        |bands AS (SELECT media_id, bnd,
        |list_aggregate(bits[bnd*8+1 : bnd*8+8], 'string_agg', '') AS bv
        |FROM b, (SELECT unnest(generate_series(0, 7)) AS bnd)),
        |cand AS (SELECT DISTINCT a.media_id AS id_a, c.media_id AS id_b
        |FROM bands a JOIN bands c ON a.bnd = c.bnd AND a.bv = c.bv
        |AND a.media_id < c.media_id),
        |ver AS (SELECT id_a, id_b,
        |list_reduce(list_transform(generate_series(1, 64),
        |i -> abs(x.bits[i] - y.bits[i])), (p, q) -> p + q) AS hamming
        |FROM cand JOIN b x ON x.media_id = cand.id_a
        |JOIN b y ON y.media_id = cand.id_b)
        |SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM ver
        |WHERE hamming <= 7 ORDER BY id_a, id_b""".stripMargin
        .replace("\n", " "))),

    ("s27_stream_cusum",
      // X90 under streaming (streaming/Streaming.runStreamCusum): CUSUM
      // needs the FULL series mean/sd, so state is the additive day-grain
      // count table and the standardize-accumulate-argmax folds at read
      // time from the converged counts; x90's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s27")
        graft.streaming.Streaming.runStreamCusum(s, dir, base + "/cusum")
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type, epoch_ms(date_trunc('day', ts)) AS day,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, avg(n) AS mu, stddev_samp(n) AS sd FROM d GROUP BY 1),
        |c AS (SELECT d.event_type, d.day, round(sum((d.n - st.mu) / st.sd)
        |OVER (PARTITION BY d.event_type ORDER BY d.day), 4) AS cusum
        |FROM d JOIN st USING (event_type)),
        |r AS (SELECT event_type, day, cusum, row_number() OVER
        |(PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn FROM c)
        |SELECT event_type, day AS change_point, cusum AS max_cusum
        |FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin
        .replace("\n", " "))),

    ("x120_ece",
      // Expected Calibration Error (operators/Eval
      // .expectedCalibrationError): x105's reliability diagram folded to
      // the bin-weighted |confidence - accuracy| scalar per class — the
      // single number a score-gating decision reads; folds from the
      // 4 dp-rounded bin columns so it is bit-derivable from the diagram.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.expectedCalibrationError(
            Tables.embeddings(s, dir), "vec_id", "embedding", "label", 10)
          .orderBy(col("class")),
      Some(s"""WITH x AS (SELECT label, vec_id,
        |unnest(list_transform(generate_series(1, len(embedding)),
        |i -> struct_pack(p := i, v := CAST(embedding[i] AS DOUBLE)))) AS s
        |FROM embeddings),
        |p AS (SELECT label, vec_id, s.p AS pos, s.v AS v FROM x),
        |c AS (SELECT label, pos, round(avg(v), 6) AS m FROM p GROUP BY 1, 2),
        |cl AS MATERIALIZED (SELECT label AS cls, list(m ORDER BY pos) AS cent
        |FROM c GROUP BY 1),
        |d AS (SELECT e.label AS gold, cl.cls,
        |round(${cosSql("e.embedding", "cl.cent")}, 6) AS score
        |FROM embeddings e CROSS JOIN cl),
        |b AS (SELECT cls, CAST(greatest(0, least(floor((score + 1.0) * 5.0), 9))
        |AS INT) AS bin, score,
        |CASE WHEN gold = cls THEN 1.0 ELSE 0.0 END AS y FROM d),
        |bins AS (SELECT cls, bin, CAST(count(*) AS BIGINT) AS n,
        |round(avg(score), 4) AS avg_score, round(avg(y), 4) AS frac_pos
        |FROM b GROUP BY 1, 2)
        |SELECT CAST(cls AS BIGINT) AS class, CAST(sum(n) AS BIGINT) AS n,
        |round(sum(n * abs(frac_pos - avg_score)) / sum(n), 6) AS ece
        |FROM bins GROUP BY 1 ORDER BY class""".stripMargin
        .replace("\n", " "))),

    ("s28_stream_psi",
      // X116 under streaming (streaming/Streaming.runStreamPsi): the
      // ingest-drift monitor — additive (source, bin) count state at
      // fixed literal edges, smoothed PSI folded at read time via the
      // shared psiFromCounts; x116's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s28")
        graft.streaming.Streaming.runStreamPsi(s, dir, base + "/psi",
            Seq(120d, 200d, 280d, 360d, 440d))
          .orderBy(col("source"))
      },
      Some("""WITH b AS (SELECT source,
        |CASE WHEN n_chars < 120 THEN 0 WHEN n_chars < 200 THEN 1
        |WHEN n_chars < 280 THEN 2 WHEN n_chars < 360 THEN 3
        |WHEN n_chars < 440 THEN 4 ELSE 5 END AS bin FROM documents),
        |sb AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
        |FROM b GROUP BY 1, 2),
        |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS n
        |FROM sb GROUP BY 1),
        |cb AS (SELECT bin, CAST(count(*) AS BIGINT) AS c
        |FROM b GROUP BY 1),
        |ct AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cb),
        |grid AS (SELECT st.source, st.n, g.bin FROM st
        |CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS bin) g),
        |p AS (SELECT grid.source, grid.bin,
        |(coalesce(sb.c, 0) + 0.5) / (grid.n + 3.0) AS p,
        |(coalesce(cb.c, 0) + 0.5) / (ct.n + 3.0) AS q
        |FROM grid LEFT JOIN sb ON sb.source = grid.source
        |AND sb.bin = grid.bin
        |LEFT JOIN cb ON cb.bin = grid.bin CROSS JOIN ct)
        |SELECT source, round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM p GROUP BY 1 ORDER BY source""".stripMargin
        .replace("\n", " "))),

    ("j61_label_propagation",
      // Synchronous LPA community detection (operators/Graph.
      // labelPropagation, 4 rounds) on the urgent-order co-purchase
      // graph: min-id labels, per-round neighbor-majority adoption with
      // the smallest-label tie-break — the fixed round budget IS the
      // determinism contract (synchronous LPA can oscillate, so both
      // engines replay the trajectory). Communities summarize to
      // (label, size) with per-community member extremes so the output
      // stays bounded; j41's modularity is the grade for partitions
      // like this one.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.labelPropagation(pairs, "pa", "pb", 4)
          .groupBy(col("label"))
          .agg(count(lit(1)).cast("long").as("size"),
            min(col("vertex")).cast("long").as("min_vertex"),
            max(col("vertex")).cast("long").as("max_vertex"))
          .orderBy(col("size").desc, col("label").asc)
          .limit(30)
      },
      Some(labelPropagationOracle(4, 30))),

    ("j62_mann_whitney",
      // Mann–Whitney U per return flag (TimeSeries.mannWhitney): do
      // HIGH-DISCOUNT lines (>= 5%) price differently than low-discount
      // ones, tested nonparametrically with average-rank ties and the
      // tie-corrected normal z? Rank sums carried as 2R1 LONGs (exact on
      // the half grid under any partitioning); the value-grain window
      // runs per key, never globally.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.mannWhitney(
            Tables.lineitem(s, dir).select(col("l_returnflag"),
              col("l_extendedprice").cast("double").as("price"),
              when(col("l_discount") >= 0.05, 1).otherwise(0).as("side")),
            Seq("l_returnflag"), "price", "side")
          .orderBy(col("l_returnflag")),
      Some("""WITH vg AS (SELECT l_returnflag, l_extendedprice AS v,
        |sum(CASE WHEN l_discount >= 0.05 THEN 0 ELSE 1 END) AS c0,
        |sum(CASE WHEN l_discount >= 0.05 THEN 1 ELSE 0 END) AS c1
        |FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, c0, c1, c0 + c1 AS c,
        |sum(c0 + c1) OVER (PARTITION BY l_returnflag ORDER BY v
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumincl
        |FROM vg),
        |r2 AS (SELECT l_returnflag, c0, c1, c,
        |(cumincl - c) * 2 + c + 1 AS avg2 FROM r),
        |agg AS (SELECT l_returnflag,
        |CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |CAST(sum(c1 * avg2) AS BIGINT) AS r2s,
        |CAST(sum(c * c * c - c) AS BIGINT) AS ties
        |FROM r2 GROUP BY 1)
        |SELECT l_returnflag, n0, n1,
        |CAST(r2s - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
        |CASE WHEN CAST(n0 AS DOUBLE) * n1 / 12.0 *
        |(CAST(n0 + n1 + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
        |(CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1))) > 0 THEN
        |round((CAST(r2s - n1 * (n1 + 1) AS DOUBLE) / 2.0 -
        |CAST(n0 AS DOUBLE) * n1 / 2.0) /
        |sqrt(CAST(n0 AS DOUBLE) * n1 / 12.0 *
        |(CAST(n0 + n1 + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
        |(CAST(n0 + n1 AS DOUBLE) * (n0 + n1 - 1)))), 6) END AS z
        |FROM agg ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    ("j63_theil_sen",
      // Theil–Sen robust trend per event type (TimeSeries.theilSen) over
      // the daily-count series: median pairwise slope + median intercept
      // — the outlier-immune trend read next to x86's EWMA level and
      // x90's CUSUM (one spiked day drags OLS; it moves one slope in
      // n(n−1)/2 here). Series grain first, so the pairwise join is
      // days², never row-grain; medians are exact interpolated
      // percentiles rounded 6 dp on both engines.
      (s: SparkSession, dir: String) => {
        val d = Tables.events(s, dir)
          .groupBy(col("event_type"),
            floor(unix_millis(col("ts")) / 86400000L).cast("long")
              .as("day"))
          .agg(count(lit(1)).cast("long").as("c"))
        graft.operators.TimeSeries.theilSen(d, Seq("event_type"),
            "day", "c")
          .orderBy(col("event_type"))
      },
      Some("""WITH d AS (SELECT event_type,
        |CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day,
        |CAST(count(*) AS DOUBLE) AS c FROM events GROUP BY 1, 2),
        |p AS (SELECT a.event_type,
        |(b.c - a.c) / CAST(b.day - a.day AS DOUBLE) AS s
        |FROM d a JOIN d b ON a.event_type = b.event_type
        |AND a.day < b.day),
        |sl AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
        |round(quantile_cont(s, 0.5), 6) AS slope FROM p GROUP BY 1)
        |SELECT d.event_type, CAST(count(*) AS BIGINT) AS n_points,
        |any_value(sl.n_pairs) AS n_pairs, any_value(sl.slope) AS slope,
        |round(quantile_cont(d.c - sl.slope * d.day, 0.5), 6) AS intercept
        |FROM d JOIN sl ON d.event_type = sl.event_type
        |GROUP BY 1 ORDER BY 1""".stripMargin.replace("\n", " "))),

    ("j64_kruskal_wallis",
      // Kruskal–Wallis H per ship year (TimeSeries.kruskalWallis):
      // j62's k-sample extension — do the THREE return-flag cohorts'
      // price distributions differ within each year, in one test instead
      // of three pairwise U's? Pooled average ranks as 2R_g longs, tie
      // correction from exact t³−t longs, per-key windows only.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.kruskalWallis(
            Tables.lineitem(s, dir).select(
              year(col("l_shipdate")).cast("int").as("ship_year"),
              col("l_extendedprice").cast("double").as("price"),
              col("l_returnflag").as("flag")),
            Seq("ship_year"), "price", "flag")
          .orderBy(col("ship_year")),
      Some("""WITH vgg AS (SELECT CAST(year(l_shipdate) AS INT)
        |AS ship_year, l_extendedprice AS v, l_returnflag AS g,
        |count(*) AS cg FROM lineitem GROUP BY 1, 2, 3),
        |vg AS (SELECT ship_year, v, sum(cg) AS c FROM vgg GROUP BY 1, 2),
        |a2 AS (SELECT ship_year, v, c,
        |(sum(c) OVER (PARTITION BY ship_year ORDER BY v
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) * 2
        |+ c + 1 AS avg2 FROM vg),
        |pg AS (SELECT vgg.ship_year, vgg.g,
        |CAST(sum(vgg.cg) AS BIGINT) AS ng,
        |CAST(sum(vgg.cg * a2.avg2) AS BIGINT) AS r2g
        |FROM vgg JOIN a2 ON a2.ship_year = vgg.ship_year AND a2.v = vgg.v
        |GROUP BY 1, 2),
        |ties AS (SELECT ship_year,
        |CAST(sum(c * c * c - c) AS BIGINT) AS t3t FROM a2 GROUP BY 1),
        |agg AS (SELECT ship_year,
        |CAST(count(*) AS BIGINT) AS n_groups,
        |CAST(sum(ng) AS BIGINT) AS n_total,
        |sum(CAST(r2g AS DOUBLE) * r2g / (4.0 * ng)) AS sr2
        |FROM pg GROUP BY 1)
        |SELECT a.ship_year, a.n_groups, a.n_total,
        |round(12.0 / (CAST(a.n_total AS DOUBLE) *
        |(CAST(a.n_total AS DOUBLE) + 1)) * a.sr2 -
        |3.0 * (CAST(a.n_total AS DOUBLE) + 1), 6) AS h,
        |CASE WHEN CAST(t.t3t AS DOUBLE) <
        |CAST(a.n_total AS DOUBLE) * CAST(a.n_total AS DOUBLE) *
        |CAST(a.n_total AS DOUBLE) - CAST(a.n_total AS DOUBLE) THEN
        |round((12.0 / (CAST(a.n_total AS DOUBLE) *
        |(CAST(a.n_total AS DOUBLE) + 1)) * a.sr2 -
        |3.0 * (CAST(a.n_total AS DOUBLE) + 1)) /
        |(1.0 - CAST(t.t3t AS DOUBLE) /
        |(CAST(a.n_total AS DOUBLE) * CAST(a.n_total AS DOUBLE) *
        |CAST(a.n_total AS DOUBLE) - CAST(a.n_total AS DOUBLE))), 6)
        |END AS h_tie_corrected
        |FROM agg a JOIN ties t ON t.ship_year = a.ship_year
        |ORDER BY a.ship_year""".stripMargin.replace("\n", " "))),

    ("j39_kcore",
      // Bounded-round k-core peeling (operators/Graph.kCore, k=15, 4
      // rounds) on the urgent-order co-purchase graph: the cascading
      // weak-vertex peel whose fixed round budget IS the determinism
      // contract; top-30 survivors by in-core degree. One notch stronger
      // than j38's lcc — a clique fringe peels, core members don't.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.kCore(pairs, "pa", "pb", 15, 4)
          .orderBy(col("core_degree").desc, col("vertex").asc)
          .limit(30)
      },
      Some(kcoreOracle(15, 4, 30))),

    ("x121_heaps",
      // Heaps'-law vocabulary-growth fit (operators/TextAnalysis
      // .heapsFit) on word-BIGRAM types (the corpus's unigram vocabulary
      // is a deliberately tiny 31 — bigrams give a real growth curve):
      // log-log OLS over a 50-point cumulative curve built windowless
      // via suffix-grid explode. beta near 0 = saturating vocabulary.
      (s: SparkSession, dir: String) => {
        import graft.operators.TextAnalysis
        val t = TextAnalysis.tokens(lower(col("text")))
        val bigrams = when(size(t) >= 2,
            transform(sequence(lit(1), size(t) - 1),
              i => concat_ws(" ", element_at(t, i), element_at(t, i + 1))))
          .otherwise(array().cast("array<string>"))
        TextAnalysis.heapsFit(Tables.documents(s, dir), "doc_id",
          bigrams, 50)
      },
      Some("""WITH wd AS (SELECT (max(doc_id) // 50) + 1 AS w
        |FROM documents),
        |tk AS (SELECT doc_id, list_filter(
        |regexp_split_to_array(lower(text), '\s+'), t -> t <> '') AS t
        |FROM documents),
        |toks AS (SELECT doc_id // wd.w AS b,
        |unnest(CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS tok FROM tk, wd),
        |bt AS (SELECT b, CAST(count(*) AS BIGINT) AS nt
        |FROM toks GROUP BY 1),
        |ct AS (SELECT gb, CAST(sum(nt) AS BIGINT) AS ctok FROM
        |(SELECT unnest(generate_series(b, 49)) AS gb, nt FROM bt)
        |GROUP BY 1),
        |fb AS (SELECT tok, min(b) AS b FROM toks GROUP BY 1),
        |nv0 AS (SELECT b, CAST(count(*) AS BIGINT) AS nv
        |FROM fb GROUP BY 1),
        |cv AS (SELECT gb, CAST(sum(nv) AS BIGINT) AS cvoc FROM
        |(SELECT unnest(generate_series(b, 49)) AS gb, nv FROM nv0)
        |GROUP BY 1),
        |pts AS (SELECT ln(CAST(ctok AS DOUBLE)) AS x,
        |ln(CAST(cvoc AS DOUBLE)) AS y, ctok, cvoc
        |FROM ct JOIN cv USING (gb)),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |max(ctok) AS total_tokens, max(cvoc) AS vocab,
        |sum(x) AS sx, sum(y) AS sy, sum(x*y) AS sxy, sum(x*x) AS sxx
        |FROM pts)
        |SELECT n AS n_points, total_tokens, vocab,
        |round((n*sxy - sx*sy)/(n*sxx - sx*sx), 4) AS beta,
        |round((sy - ((n*sxy - sx*sy)/(n*sxx - sx*sx))*sx)/n, 4) AS ln_k
        |FROM s""".stripMargin.replace("\n", " "))),

    ("x122_jsd_matrix",
      // Pairwise Jensen-Shannon divergence between source unigram
      // distributions (operators/TextAnalysis.jsdMatrix): the symmetric
      // bounded companion of x101's KL, via the entropy decomposition
      // H(m) - (H(p)+H(q))/2 so one token-keyed equi-self-join covers
      // every pair - no per-pair full-outer join anywhere.
      (s: SparkSession, dir: String) =>
        graft.operators.TextAnalysis.jsdMatrix(
            Tables.documents(s, dir), "source", "text")
          .orderBy(col("src_a"), col("src_b")),
      Some("""WITH st AS (SELECT source AS s,
        |unnest(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |t -> t <> '')) AS t FROM documents),
        |c AS (SELECT s, t, CAST(count(*) AS BIGINT) AS c
        |FROM st GROUP BY 1, 2),
        |ns AS (SELECT s, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        |p AS MATERIALIZED (SELECT c.s, c.t, CAST(c.c AS DOUBLE) / ns.n AS p
        |FROM c JOIN ns USING (s)),
        |scal AS (SELECT s, sum((p/2) * ln(p/2)) AS hh,
        |sum(p * ln(p)) AS hp FROM p GROUP BY 1),
        |pr AS (SELECT a.s AS src_a, b.s AS src_b,
        |CAST(count(*) AS BIGINT) AS n_shared_types,
        |sum(((a.p + b.p)/2) * ln((a.p + b.p)/2)) AS mb,
        |sum((a.p/2) * ln(a.p/2)) AS ab,
        |sum((b.p/2) * ln(b.p/2)) AS bb
        |FROM p a JOIN p b ON a.t = b.t AND a.s < b.s GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared_types,
        |round(-(mb + (sa.hh - ab) + (sb.hh - bb)) + (sa.hp + sb.hp)/2, 4)
        |AS jsd
        |FROM pr JOIN scal sa ON sa.s = src_a
        |JOIN scal sb ON sb.s = src_b
        |ORDER BY src_a, src_b""".stripMargin.replace("\n", " "))),

    ("j40_holt",
      // Holt double-exponential level+trend forecast (operators/
      // TimeSeries.holtForecast, alpha .45, beta .35, 7-day horizon; the
      // non-dyadic gains keep per-step 6 dp rounds off the exact .5e-6
      // boundaries a .5 gain manufactures from integer counts) over
      // each event type's daily volume: the capacity-planning read x86's
      // level-only EWMA lags on ramps; sequential recurrence folds
      // array-locally per key, 6 dp per step, oracle unrolled.
      (s: SparkSession, dir: String) => {
        val daily = Tables.events(s, dir)
          .groupBy(col("event_type"),
            unix_millis(date_trunc("DAY", col("ts"))).as("day"))
          .agg(count(lit(1)).as("n"))
        graft.operators.TimeSeries.holtForecast(
            daily, Seq("event_type"), "day", "n", 0.45, 0.35, 7)
          .orderBy(col("event_type"))
      },
      Some(holtOracle(0.45, 0.35, 7, 30))),

    ("x123_mutual_nn",
      // Mutual nearest-neighbor matches (Similarity.mutualNnMatches):
      // reciprocal top-1 pairs through the shared-IVF self-kNN —
      // the record-linkage precision filter that kills hub-induced
      // one-directional matches; x40's probe trajectory at k=1 plus one
      // reversed-pair self-join.
      (s: SparkSession, dir: String) =>
        Similarity.mutualNnMatches(Tables.embeddings(s, dir),
            "vec_id", "embedding", 16, 4)
          .orderBy(col("id_a")),
      Some(mutualNnOracleSql)),

    ("s29_stream_holt",
      // J40 under streaming (streaming/Streaming.runStreamHolt): the
      // sequential recurrence cannot absorb partial-day state, so state
      // is the additive day-grain count table and the whole Holt fold
      // runs at read time on converged counts; j40's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s29")
        graft.streaming.Streaming.runStreamHolt(s, dir, base + "/holt",
            0.45, 0.35, 7)
          .orderBy(col("event_type"))
      },
      Some(holtOracle(0.45, 0.35, 7, 30))),

    ("x124_rebalance",
      // Shard-rebalance audit (operators/Sampling.rebalanceAudit,
      // 8 -> 12): what fraction of keys MOVE under x30's modulo layout
      // (stay prob = old/lcm ≈ 1/3) vs rendezvous hashing (move ≈
      // (new-old)/new = 1/3 MOVED, i.e. 2x fewer) — the recopy-cost
      // number that decides a 100 TB resharding strategy.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.rebalanceAudit(
            Tables.documents(s, dir).select(col("doc_id")),
            "doc_id", "shard", 8, 12)
          .orderBy(col("strategy")),
      Some("""WITH h AS (SELECT doc_id,
        |('0x' || substr(md5('shard:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS hv
        |FROM documents),
        |hrw AS (SELECT doc_id, s,
        |('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' || s), 1, 8))::BIGINT AS hw
        |FROM documents, (SELECT unnest(generate_series(0, 11)) AS s)),
        |ho AS (SELECT doc_id, s AS so FROM (SELECT doc_id, s,
        |row_number() OVER (PARTITION BY doc_id ORDER BY hw DESC, s) AS rn
        |FROM hrw WHERE s < 8) WHERE rn = 1),
        |hn AS (SELECT doc_id, s AS sn FROM (SELECT doc_id, s,
        |row_number() OVER (PARTITION BY doc_id ORDER BY hw DESC, s) AS rn
        |FROM hrw) WHERE rn = 1),
        |a AS (SELECT h.doc_id, hv % 8 AS mo, hv % 12 AS mn, ho.so, hn.sn
        |FROM h JOIN ho USING (doc_id) JOIN hn USING (doc_id)),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(CASE WHEN mo <> mn THEN 1 ELSE 0 END) AS BIGINT) AS mm,
        |CAST(sum(CASE WHEN so <> sn THEN 1 ELSE 0 END) AS BIGINT) AS hm
        |FROM a)
        |SELECT 'mod' AS strategy, n AS n_keys, mm AS n_moved,
        |round(CAST(mm AS DOUBLE)/n, 4) AS move_frac FROM t
        |UNION ALL SELECT 'rendezvous', n, hm,
        |round(CAST(hm AS DOUBLE)/n, 4) FROM t
        |ORDER BY strategy""".stripMargin.replace("\n", " "))),

    ("x125_kripp_alpha",
      // Krippendorff's alpha (operators/Eval.krippendorffAlpha) over
      // x113's three quality raters with the third DELIBERATELY partial
      // (vocabulary richness only rated where n_chars >= 150) — the
      // missing-ratings agreement read Fleiss structurally cannot give;
      // per-unit disagreement folds without any value-pair join.
      (s: SparkSession, dir: String) => {
        import graft.operators.TextAnalysis
        val f = Tables.documents(s, dir).select(col("doc_id"),
          col("n_chars"),
          size(TextAnalysis.tokens(col("text"))).as("_wt"),
          size(array_distinct(TextAnalysis.tokens(col("text")))).as("_dt"))
        def cls(c: org.apache.spark.sql.Column, t1: Int, t2: Int) =
          when(c < t1, 0).when(c < t2, 1).otherwise(2)
        val ratings = f.select(col("doc_id"),
            cls(col("n_chars"), 216, 372).as("cat"))
          .unionByName(f.select(col("doc_id"),
            cls(col("_wt"), 39, 68).as("cat")))
          .unionByName(f.where(col("n_chars") >= 150).select(col("doc_id"),
            cls(col("_dt"), 22, 27).as("cat")))
        graft.operators.Eval.krippendorffAlpha(ratings, "doc_id", "cat")
      },
      Some("""WITH f AS (SELECT doc_id, n_chars,
        |len(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> '')) AS wt,
        |len(list_distinct(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> ''))) AS dt FROM documents),
        |r AS (SELECT doc_id, CASE WHEN n_chars < 216 THEN 0
        |WHEN n_chars < 372 THEN 1 ELSE 2 END AS cat FROM f
        |UNION ALL SELECT doc_id, CASE WHEN wt < 39 THEN 0
        |WHEN wt < 68 THEN 1 ELSE 2 END FROM f
        |UNION ALL SELECT doc_id, CASE WHEN dt < 22 THEN 0
        |WHEN dt < 27 THEN 1 ELSE 2 END FROM f WHERE n_chars >= 150),
        |m AS (SELECT doc_id, cat, CAST(count(*) AS BIGINT) AS nuc
        |FROM r GROUP BY 1, 2),
        |it AS (SELECT doc_id, CAST(sum(nuc) AS BIGINT) AS mu,
        |CAST(sum(nuc * nuc) AS BIGINT) AS s2 FROM m GROUP BY 1),
        |pi AS (SELECT * FROM it WHERE mu >= 2),
        |sc AS (SELECT CAST(count(*) AS BIGINT) AS n_items,
        |CAST(sum(mu) AS BIGINT) AS n,
        |sum(CAST(mu * mu - s2 AS DOUBLE) / (mu - 1)) AS du FROM pi),
        |mg AS (SELECT CAST(coalesce(sum(nc * nc), 0) AS BIGINT) AS snc2
        |FROM (SELECT m.cat, CAST(sum(m.nuc) AS BIGINT) AS nc FROM m
        |JOIN pi ON pi.doc_id = m.doc_id GROUP BY 1))
        |SELECT n_items, n AS n_ratings,
        |CASE WHEN n * n <> snc2 THEN
        |round(1.0 - ((n - 1) * du) / CAST(n * n - snc2 AS DOUBLE), 6) END
        |AS alpha FROM sc CROSS JOIN mg""".stripMargin.replace("\n", " "))),

    ("x126_cluster_split",
      // Cluster-grain train/val/test split — the FIX x71's leakage audit
      // prescribes: hash the near-dup CLUSTER label (x25's components),
      // not the doc id, so every near-dup family lands in one split
      // atomically and cross-split memorization pairs are structurally
      // zero (spec-pinned). Composition: x25 clustering -> x13's hash
      // split keyed on cluster_id.
      (s: SparkSession, dir: String) => {
        val lab = Dedup.nearDupClusters(Tables.documents(s, dir),
            "doc_id", "text", 3, 0.8)
          .select(col("doc_id"), col("cluster_id"))
        graft.operators.Sampling.split(lab, "cluster_id", "csplit", 80, 10)
          .select(col("doc_id"), col("cluster_id"), col("split"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH RECURSIVE $minHashPairsCtes,
        |p AS (SELECT id_a, id_b FROM j WHERE jac >= 0.8),
        |e AS (SELECT id_a AS a, id_b AS b FROM p
        |UNION SELECT id_b, id_a FROM p),
        |reach(n, r) AS (
        |SELECT a AS n, a AS r FROM (SELECT DISTINCT a FROM e)
        |UNION
        |SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.n),
        |comp AS (SELECT n, min(r) AS root FROM reach GROUP BY 1),
        |lab AS (SELECT d.doc_id, coalesce(c.root, d.doc_id) AS cluster_id
        |FROM documents d LEFT JOIN comp c ON c.n = d.doc_id),
        |h AS (SELECT doc_id, cluster_id,
        |('0x' || substr(md5('csplit:' || CAST(cluster_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
        |FROM lab)
        |SELECT doc_id, cluster_id,
        |CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
        |ELSE 'test' END AS split
        |FROM h ORDER BY doc_id""".stripMargin.replace("\n", " "))),

    ("x127_threshold_sweep",
      // Dedup-yield curve: pair and affected-doc counts at each Jaccard
      // threshold 0.5..0.9, from ONE run of the x2 pipeline at the
      // loosest base (banding is threshold-independent, the exact jac
      // verifies once, the sweep is a literal explode + one agg) — the
      // evidence a threshold choice is made on, instead of folklore.
      (s: SparkSession, dir: String) => {
        val pairs = Dedup.minHashNearDup(Tables.documents(s, dir),
          "doc_id", "text", 3, 0.5)
        pairs
          .select(explode(typedLit(Seq(0.5, 0.6, 0.7, 0.8, 0.9)))
            .as("threshold"), col("jaccard"), col("id_a"), col("id_b"))
          .where(col("jaccard") >= col("threshold"))
          .select(col("threshold"),
            explode(array(col("id_a"), col("id_b"))).as("_id"))
          .groupBy(col("threshold"))
          .agg((count(lit(1)) / lit(2)).cast("long").as("n_pairs"),
            countDistinct(col("_id")).cast("long").as("n_docs"))
          .orderBy(col("threshold"))
      },
      Some(s"""WITH $minHashPairsCtes,
        |p AS (SELECT round(jac, 4) AS jr, id_a, id_b FROM j
        |WHERE jac >= 0.5),
        |t AS (SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS threshold),
        |f AS (SELECT t.threshold, unnest([p.id_a, p.id_b]) AS id
        |FROM p JOIN t ON p.jr >= t.threshold)
        |SELECT threshold, CAST(count(*) // 2 AS BIGINT) AS n_pairs,
        |CAST(count(DISTINCT id) AS BIGINT) AS n_docs
        |FROM f GROUP BY 1 ORDER BY threshold""".stripMargin
        .replace("\n", " "))),

    ("j42_sole_late_supplier",
      // TPC-H Q21's correlated-EXISTS shape (suppliers who kept orders
      // waiting, Q21 per SURVEY's relational-pattern coverage): per
      // finished multi-supplier order, the supplier who shipped late
      // (> 60 days past order date) while EVERY co-supplier shipped on
      // time — one (order, supplier)-grain agg, then a LEFT SEMI (has a
      // co-supplier) and a LEFT ANTI (no late co-supplier) against the
      // same frame, broadcast supplier dim, TakeOrdered(20).
      (s: SparkSession, dir: String) => {
        val g = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), col("o_orderdate")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_suppkey"),
            (col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"))
              .cast("int").as("_late"))
          .groupBy(col("l_orderkey"), col("l_suppkey"))
          .agg(max(col("_late")).as("_late"))
          .localCheckpoint(eager = true) // probed three ways below
        val others = g.select(col("l_orderkey").as("_ok"),
          col("l_suppkey").as("_os"), col("_late").as("_ol"))
        val sole = g.where(col("_late") === 1)
          .join(others,
            col("l_orderkey") === col("_ok") &&
              col("_os") =!= col("l_suppkey"), "left_semi")
          .join(others.where(col("_ol") === 1),
            col("l_orderkey") === col("_ok") &&
              col("_os") =!= col("l_suppkey"), "left_anti")
        sole
          .join(broadcast(Tables.supplier(s, dir)
            .select(col("s_suppkey"), col("s_name"))),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).cast("long").as("numwait"))
          .orderBy(col("numwait").desc, col("s_name").asc)
          .limit(20)
      },
      Some("""WITH l AS (SELECT l_orderkey, l_suppkey,
        |CAST(l_shipdate > o_orderdate + INTERVAL 60 DAY AS INT) AS late
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderstatus = 'F'),
        |g AS (SELECT l_orderkey, l_suppkey, max(late) AS late
        |FROM l GROUP BY 1, 2),
        |f AS (SELECT a.l_orderkey, a.l_suppkey FROM g a
        |WHERE a.late = 1
        |AND EXISTS (SELECT 1 FROM g b WHERE b.l_orderkey = a.l_orderkey
        |AND b.l_suppkey <> a.l_suppkey)
        |AND NOT EXISTS (SELECT 1 FROM g c WHERE c.l_orderkey = a.l_orderkey
        |AND c.l_suppkey <> a.l_suppkey AND c.late = 1))
        |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM f JOIN supplier s ON s.s_suppkey = f.l_suppkey
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin
        .replace("\n", " "))),

    ("x128_lang_consistency",
      // Declared-vs-predicted language confusion matrix: x8's marker
      // langId joined back to the documents' own `lang` column — the
      // metadata-trust audit run before filtering BY declared language
      // (a mislabeled source silently empties a language bucket). One
      // doc-key equi-join of two projections, one dictionary-grain agg.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        docs.select(col("doc_id"), col("lang"))
          .join(TextAnalysis.langId(docs)
            .select(col("doc_id"), col("pred_lang")), Seq("doc_id"))
          .groupBy(col("lang"), col("pred_lang"))
          .agg(count(lit(1)).cast("long").as("n_docs"))
          .orderBy(col("lang"), col("pred_lang"))
      },
      Some(langConsistencyOracleSql)),

    ("x129_welch_t",
      // Welch's t of each source's mean length vs the REST
      // (operators/Maintenance.welchTTest): x99's moments turned into a
      // decision statistic with the Welch-Satterthwaite df; complement
      // sums by subtraction from one broadcast global row — one pass,
      // zero summation-order noise (all inputs exact BIGINT sums).
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.welchTTest(
            Tables.documents(s, dir), "source", "n_chars")
          .orderBy(col("source")),
      Some("""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(n_chars) AS BIGINT) AS sx,
        |CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
        |CAST(sum(sx) AS BIGINT) AS gsx,
        |CAST(sum(sxx) AS BIGINT) AS gsxx FROM s),
        |w AS (SELECT s.source, s.n, g.gn - s.n AS m,
        |CAST(s.sx AS DOUBLE) / s.n AS mean1,
        |CAST(g.gsx - s.sx AS DOUBLE) / (g.gn - s.n) AS mean2,
        |(s.sxx - CAST(s.sx AS DOUBLE) * s.sx / s.n) / (s.n - 1) AS v1,
        |((g.gsxx - s.sxx) - CAST(g.gsx - s.sx AS DOUBLE) * (g.gsx - s.sx)
        |/ (g.gn - s.n)) / (g.gn - s.n - 1) AS v2
        |FROM s CROSS JOIN g),
        |f AS (SELECT source, n, m, mean1, mean2, v1 / n AS a, v2 / m AS b
        |FROM w)
        |SELECT source, n, round(mean1, 4) AS mean_src,
        |round(mean2, 4) AS mean_rest,
        |CASE WHEN n >= 2 AND m >= 2 AND a + b > 0 THEN
        |round((mean1 - mean2) / sqrt(a + b), 4) END AS t_stat,
        |CASE WHEN n >= 2 AND m >= 2 AND a + b > 0 THEN
        |round((a + b) * (a + b) / (a * a / (n - 1) + b * b / (m - 1)), 4)
        |END AS df
        |FROM f ORDER BY source""".stripMargin.replace("\n", " "))),

    ("j43_mann_whitney",
      // Mann-Whitney U per source vs rest (TimeSeries.mannWhitneyVsRest,
      // riding the ONE rank fold shared with j62 since the r12
      // consolidation) on document lengths: x129's nonparametric twin —
      // rank-based, tie-credited-half via the AUC family's rank-sum
      // fold; z by the legacy no-ties normal approximation.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.mannWhitneyVsRest(
            Tables.documents(s, dir), "source", "n_chars")
          .orderBy(col("source")),
      Some("""WITH g AS (SELECT source, n_chars AS v,
        |CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |gv AS (SELECT v, CAST(sum(c) AS BIGINT) AS ct FROM g GROUP BY 1),
        |sv AS (SELECT s.source, gv.v,
        |coalesce(g.c, 0) AS np, gv.ct - coalesce(g.c, 0) AS nn
        |FROM (SELECT DISTINCT source FROM g) s
        |CROSS JOIN gv
        |LEFT JOIN g ON g.source = s.source AND g.v = gv.v),
        |w AS (SELECT source, v, np, nn,
        |coalesce(sum(nn) OVER (PARTITION BY source ORDER BY v
        |ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
        |FROM sv),
        |u AS (SELECT source, CAST(sum(np) AS BIGINT) AS n1,
        |CAST(sum(nn) AS BIGINT) AS n2,
        |sum(np * (cum + nn / 2.0)) AS uu FROM w GROUP BY 1)
        |SELECT source, n1, round(uu, 1) AS u_stat,
        |CASE WHEN n1 > 0 AND n2 > 0 THEN
        |round((uu - n1 * n2 / 2.0) /
        |sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0), 4) END AS z
        |FROM u ORDER BY source""".stripMargin.replace("\n", " "))),

    ("s30_stream_welch",
      // X129 under streaming (streaming/Streaming.runStreamWelch):
      // power sums are GENUINELY additive, so the source-grain state
      // absorbs partial sums directly — no day-grain detour — and the
      // read-time Welch fold equals batch x129 exactly; its oracle
      // verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s30")
        graft.streaming.Streaming.runStreamWelch(s, dir, base + "/welch")
          .orderBy(col("source"))
      },
      Some("""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(n_chars) AS BIGINT) AS sx,
        |CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |FROM documents GROUP BY 1),
        |g AS (SELECT CAST(sum(n) AS BIGINT) AS gn,
        |CAST(sum(sx) AS BIGINT) AS gsx,
        |CAST(sum(sxx) AS BIGINT) AS gsxx FROM s),
        |w AS (SELECT s.source, s.n, g.gn - s.n AS m,
        |CAST(s.sx AS DOUBLE) / s.n AS mean1,
        |CAST(g.gsx - s.sx AS DOUBLE) / (g.gn - s.n) AS mean2,
        |(s.sxx - CAST(s.sx AS DOUBLE) * s.sx / s.n) / (s.n - 1) AS v1,
        |((g.gsxx - s.sxx) - CAST(g.gsx - s.sx AS DOUBLE) * (g.gsx - s.sx)
        |/ (g.gn - s.n)) / (g.gn - s.n - 1) AS v2
        |FROM s CROSS JOIN g),
        |f AS (SELECT source, n, m, mean1, mean2, v1 / n AS a, v2 / m AS b
        |FROM w)
        |SELECT source, n, round(mean1, 4) AS mean_src,
        |round(mean2, 4) AS mean_rest,
        |CASE WHEN n >= 2 AND m >= 2 AND a + b > 0 THEN
        |round((mean1 - mean2) / sqrt(a + b), 4) END AS t_stat,
        |CASE WHEN n >= 2 AND m >= 2 AND a + b > 0 THEN
        |round((a + b) * (a + b) / (a * a / (n - 1) + b * b / (m - 1)), 4)
        |END AS df
        |FROM f ORDER BY source""".stripMargin.replace("\n", " "))),

    ("x130_bpe_train",
      // Full BPE merge training (operators/TextAnalysis.bpeTrain, 8
      // merges): the actual tokenizer-training loop x55's one-shot pair
      // count stops short of — per round a corpus-weighted pair count on
      // the word-frequency table, lexicographic-tie top-1, and a greedy
      // left-to-right merge via double-space string algebra; pure
      // integer counting, oracle unrolled.
      (s: SparkSession, dir: String) =>
        TextAnalysis.bpeTrain(Tables.documents(s, dir), "text", 8),
      Some(bpeTrainOracleSql(8))),

    ("x131_bpe_encode",
      // BPE encode (operators/TextAnalysis.bpeEncode): x130's trained
      // merge list replayed over the corpus — per-doc REAL subword
      // counts, the sequence-length number x10's whitespace proxy stands
      // in for; merges apply once to the distinct-word dictionary, never
      // per occurrence.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        TextAnalysis.bpeEncode(docs, "doc_id", "text",
            TextAnalysis.bpeMerges(docs, "text", 8))
          .orderBy(col("doc_id"))
      },
      Some(bpeEncodeOracleSql(8))),

    ("x154_bpe_frontier",
      // BPE compression frontier (TextAnalysis.bpeFrontier, budgets
      // 0/2/4/8): what each merge budget actually buys — the x147
      // probe-frontier shape on the tokenizer leg. ONE train at the max
      // budget (merge lists nest), symbol counts snapshot at every
      // budget on the distinct-word dictionary, corpus totals +
      // symbols-per-token / per-char per budget. Integer counts end to
      // end; budget 0 is the char-level floor (chars + </w> sentinel).
      (s: SparkSession, dir: String) =>
        TextAnalysis.bpeFrontier(Tables.documents(s, dir), "text",
          Seq(0, 2, 4, 8))
          .orderBy(col("merges")),
      Some(bpeFrontierOracleSql(Seq(0, 2, 4, 8), 8))),

    ("j44_spearman",
      // Spearman rank correlation per return flag between quantity and
      // discount (operators/Maintenance.spearman): tie-corrected
      // (Pearson over average ranks), computed entirely at the joint
      // value-grid grain — the monotone-association read Pearson on raw
      // values can't give under heavy tails.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.spearman(
            Tables.lineitem(s, dir), "l_returnflag", "l_quantity",
            "l_discount")
          .orderBy(col("l_returnflag")),
      Some("""WITH cell AS (SELECT l_returnflag AS g, l_quantity AS x,
        |l_discount AS y, CAST(count(*) AS BIGINT) AS c
        |FROM lineitem GROUP BY 1, 2, 3),
        |rx AS (SELECT g, x, coalesce(sum(cx) OVER (PARTITION BY g
        |ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |+ (cx + 1) / 2.0 AS rx FROM (SELECT g, x,
        |CAST(sum(c) AS BIGINT) AS cx FROM cell GROUP BY 1, 2)),
        |ry AS (SELECT g, y, coalesce(sum(cy) OVER (PARTITION BY g
        |ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |+ (cy + 1) / 2.0 AS ry FROM (SELECT g, y,
        |CAST(sum(c) AS BIGINT) AS cy FROM cell GROUP BY 1, 2)),
        |s AS (SELECT cell.g, CAST(sum(c) AS BIGINT) AS n,
        |sum(c * rx) AS sx, sum(c * ry) AS sy, sum(c * rx * rx) AS sxx,
        |sum(c * ry * ry) AS syy, sum(c * rx * ry) AS sxy
        |FROM cell JOIN rx ON cell.g = rx.g AND cell.x = rx.x
        |JOIN ry ON cell.g = ry.g AND cell.y = ry.y GROUP BY 1)
        |SELECT g AS l_returnflag, n,
        |CASE WHEN sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy) > 0
        |THEN round((n * sxy - sx * sy) /
        |(sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 4) END AS rho
        |FROM s ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    ("j45_anova",
      // One-way ANOVA F of document length across sources
      // (operators/Maintenance.anovaF): x129's k-group generalization —
      // the single "do the means differ at all" scalar with its effect
      // size (eta^2), read before any per-source one-vs-rest test.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.anovaF(
          Tables.documents(s, dir), "source", "n_chars"),
      Some("""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(n_chars) AS BIGINT) AS sx,
        |CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |FROM documents GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS gsx,
        |CAST(sum(sxx) AS BIGINT) AS gsxx,
        |sum(CAST(sx AS DOUBLE) * sx / n) AS sgm FROM s)
        |SELECT k, n,
        |round(sgm - CAST(gsx AS DOUBLE) * gsx / n, 2) AS ss_between,
        |round(gsxx - sgm, 2) AS ss_within,
        |CASE WHEN k > 1 AND n > k AND gsxx - sgm > 0 THEN
        |round(((sgm - CAST(gsx AS DOUBLE) * gsx / n) / (k - 1)) /
        |((gsxx - sgm) / (n - k)), 4) END AS f_stat,
        |CASE WHEN gsxx - CAST(gsx AS DOUBLE) * gsx / n > 0 THEN
        |round((sgm - CAST(gsx AS DOUBLE) * gsx / n) /
        |(gsxx - CAST(gsx AS DOUBLE) * gsx / n), 6) END AS eta_sq
        |FROM g""".stripMargin.replace("\n", " "))),

    ("j46_kendall_tau",
      // Kendall tau-b per return flag between quantity and discount
      // (operators/Maintenance.kendallTauB): j44's pair-probability
      // twin — O(grid^2) via the joint value-grid collapse, never
      // O(rows^2); ties normalized out of both margins.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.kendallTauB(
            Tables.lineitem(s, dir), "l_returnflag", "l_quantity",
            "l_discount")
          .orderBy(col("l_returnflag")),
      Some("""WITH cell AS (SELECT l_returnflag AS g, l_quantity AS x,
        |l_discount AS y, CAST(count(*) AS BIGINT) AS c
        |FROM lineitem GROUP BY 1, 2, 3),
        |cd AS (SELECT a.g, sum(a.c * b.c * CASE WHEN b.y > a.y THEN 1
        |WHEN b.y < a.y THEN -1 ELSE 0 END) AS s
        |FROM cell a JOIN cell b ON a.g = b.g AND a.x < b.x GROUP BY 1),
        |n AS (SELECT g, CAST(sum(c) AS BIGINT) AS n FROM cell GROUP BY 1),
        |tx AS (SELECT g, sum(t * (t - 1) / 2) AS n1 FROM (SELECT g, x,
        |CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY 1, 2) GROUP BY 1),
        |ty AS (SELECT g, sum(t * (t - 1) / 2) AS n2 FROM (SELECT g, y,
        |CAST(sum(c) AS BIGINT) AS t FROM cell GROUP BY 1, 2) GROUP BY 1)
        |SELECT n.g AS l_returnflag, n.n,
        |CASE WHEN n.n * (n.n - 1) / 2 > n1 AND n.n * (n.n - 1) / 2 > n2
        |THEN round(coalesce(s, 0) / (sqrt(n.n * (n.n - 1) / 2 - n1) *
        |sqrt(n.n * (n.n - 1) / 2 - n2)), 4) END AS tau_b
        |FROM n LEFT JOIN cd ON n.g = cd.g JOIN tx ON n.g = tx.g
        |JOIN ty ON n.g = ty.g
        |ORDER BY l_returnflag""".stripMargin.replace("\n", " "))),

    ("x132_knn_map",
      // Mean Average Precision at 10 of label-mates in the self-kNN
      // (Similarity.knnMeanAveragePrecision): the position-sensitive
      // retrieval read x109's order-blind purity can't give — AP@k per
      // query normalized by min(R, k), averaged per class. Completes
      // the eval ladder AUC (x104) → MRR (x117) → NDCG (x111) → MAP.
      (s: SparkSession, dir: String) =>
        Similarity.knnMeanAveragePrecision(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", 10, 16, 4)
          .orderBy(col("label")),
      Some(knnMapOracleSql)),

    ("x133_chrf_pairs",
      // chrF over x6's exact-Jaccard candidate pairs at 0.5
      // (operators/Eval.chrfPairs): the character-level member of the
      // pair-scoring family — clipped char 1/2-gram overlap,
      // recall-weighted F_2 per n (chrF's defining beta), averaged.
      // Catches morphology/tokenization near-matches that word-level
      // ROUGE (x114) and BLEU (x119) miss entirely. Pair frame eagerly
      // checkpointed — x114's replay rationale.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Eval.chrfPairs(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |st AS MATERIALIZED (SELECT doc_id,
        |regexp_replace(text, '\s+', '', 'g') AS s FROM documents),
        |g1 AS MATERIALIZED (SELECT doc_id, g,
        |CAST(count(*) AS BIGINT) AS c FROM (SELECT doc_id,
        |unnest(CASE WHEN len(s) >= 1 THEN
        |list_transform(generate_series(1, len(s)), i -> substr(s, i, 1))
        |ELSE [] END) AS g FROM st) GROUP BY 1, 2),
        |n1 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM g1
        |GROUP BY 1),
        |g2 AS MATERIALIZED (SELECT doc_id, g,
        |CAST(count(*) AS BIGINT) AS c FROM (SELECT doc_id,
        |unnest(CASE WHEN len(s) >= 2 THEN
        |list_transform(generate_series(1, len(s) - 1), i -> substr(s, i, 2))
        |ELSE [] END) AS g FROM st) GROUP BY 1, 2),
        |n2 AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM g2
        |GROUP BY 1),
        |i1 AS (SELECT p.id_a, p.id_b,
        |CAST(sum(least(a.c, b.c)) AS BIGINT) AS i FROM prs p
        |JOIN g1 a ON a.doc_id = p.id_a
        |JOIN g1 b ON b.doc_id = p.id_b AND b.g = a.g GROUP BY 1, 2),
        |i2 AS (SELECT p.id_a, p.id_b,
        |CAST(sum(least(a.c, b.c)) AS BIGINT) AS i FROM prs p
        |JOIN g2 a ON a.doc_id = p.id_a
        |JOIN g2 b ON b.doc_id = p.id_b AND b.g = a.g GROUP BY 1, 2),
        |f AS (SELECT p.id_a, p.id_b,
        |CASE WHEN coalesce(i1.i, 0) > 0 THEN
        |5.0 * (i1.i / CAST(ca1.n AS DOUBLE)) * (i1.i / CAST(cb1.n AS DOUBLE))
        |/ (4.0 * (i1.i / CAST(ca1.n AS DOUBLE)) +
        |(i1.i / CAST(cb1.n AS DOUBLE))) ELSE 0.0 END AS f1,
        |CASE WHEN coalesce(i2.i, 0) > 0 THEN
        |5.0 * (i2.i / CAST(ca2.n AS DOUBLE)) * (i2.i / CAST(cb2.n AS DOUBLE))
        |/ (4.0 * (i2.i / CAST(ca2.n AS DOUBLE)) +
        |(i2.i / CAST(cb2.n AS DOUBLE))) ELSE 0.0 END AS f2
        |FROM prs p
        |LEFT JOIN i1 ON i1.id_a = p.id_a AND i1.id_b = p.id_b
        |LEFT JOIN i2 ON i2.id_a = p.id_a AND i2.id_b = p.id_b
        |JOIN n1 ca1 ON ca1.doc_id = p.id_a
        |JOIN n1 cb1 ON cb1.doc_id = p.id_b
        |JOIN n2 ca2 ON ca2.doc_id = p.id_a
        |JOIN n2 cb2 ON cb2.doc_id = p.id_b)
        |SELECT id_a, id_b, round(f1, 6) AS f1_char,
        |round(f2, 6) AS f2_char, round((f1 + f2) / 2.0, 6) AS chrf
        |FROM f ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x149_wer_pairs",
      // Word error rate over x6's exact-Jaccard candidate pairs at 0.5
      // (operators/Eval.werPairs): the alignment member of the
      // pair-scoring family — token-sequence Levenshtein / reference
      // length via the native SeqEditDistance kernel (one array-local
      // codegen DP per pair, no gram explode). Pair frame eagerly
      // checkpointed — x114's replay rationale. Oracle: DuckDB has no
      // word-level levenshtein and its char-level one is BYTE-based, so
      // tokens are dictionary-encoded to single-byte chars (offset 32;
      // per-pair dict <= 94 symbols holds on this corpus, vocab = 31)
      // where byte == codepoint distance — the encode trick the Spark
      // side deliberately does NOT need (scaladoc). The 94-symbol bound
      // is ENFORCED in the oracle (error() guard in the enc CTE): a
      // corpus change that pushes any pair past chr(126) fails the
      // oracle loudly instead of silently scoring multi-byte UTF-8.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Eval.werPairs(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |pt AS (SELECT p.id_a, p.id_b, a.t AS ta, b.t AS tb
        |FROM prs p JOIN toks a ON a.doc_id = p.id_a
        |JOIN toks b ON b.doc_id = p.id_b),
        |enc0 AS (SELECT id_a, id_b, ta, tb,
        |list_sort(list_distinct(list_concat(ta, tb))) AS dict FROM pt),
        |enc AS (SELECT id_a, id_b, ta, tb,
        |CASE WHEN len(dict) > 94 THEN error('x149 oracle: pair dict '
        ||| len(dict) || ' > 94 single-byte symbols; byte levenshtein '
        ||| 'would diverge') ELSE dict END AS dict FROM enc0),
        |st AS (SELECT id_a, id_b,
        |array_to_string(list_transform(ta,
        |x -> chr(list_position(dict, x) + 32)), '') AS sa,
        |array_to_string(list_transform(tb,
        |x -> chr(list_position(dict, x) + 32)), '') AS sb,
        |len(tb) AS n_ref FROM enc)
        |SELECT id_a, id_b, CAST(n_ref AS BIGINT) AS n_ref,
        |CAST(levenshtein(sa, sb) AS BIGINT) AS edit_dist,
        |round(CAST(levenshtein(sa, sb) AS DOUBLE) / greatest(n_ref, 1), 6)
        |AS wer FROM st ORDER BY id_a, id_b"""
        .stripMargin.replace("\n", " "))),

    ("x158_cer_pairs",
      // Character error rate over x6's exact-Jaccard candidate pairs at
      // 0.5 (operators/Eval.cerPairs): werPairs' sub-word twin — raw-text
      // Levenshtein / reference chars via Spark's codegen levenshtein
      // (code-point based; DuckDB's is BYTE based, identical only on
      // ASCII, so the oracle ERRORS on a non-ASCII corpus instead of
      // silently diverging — the x149 guard discipline applied up front).
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Eval.cerPairs(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |pt AS (SELECT p.id_a, p.id_b, a.text AS sa, b.text AS sb
        |FROM prs p JOIN documents a ON a.doc_id = p.id_a
        |JOIN documents b ON b.doc_id = p.id_b)
        |SELECT id_a, id_b,
        |CAST(length(sb) AS BIGINT) AS n_ref_chars,
        |CAST(levenshtein(sa, sb) AS BIGINT) AS edit_dist,
        |round(CAST(levenshtein(sa, sb) AS DOUBLE) /
        |greatest(length(sb), 1), 6) AS cer
        |FROM pt WHERE (SELECT CASE WHEN count(*) > 0 THEN
        |error('x158 oracle: non-ASCII corpus; byte levenshtein diverges')
        |ELSE 1 END FROM documents
        |WHERE octet_length(CAST(text AS BLOB)) <> length(text)) = 1
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x160_conformal",
      // Split-conformal prediction interval (Eval.splitConformal,
      // alpha=0.1): a one-slope unit-price model fits on the hash-half
      // calibration split of lineitem (slope = round(Σprice/Σqty, 6)),
      // absolute residuals round to the 4 dp grid, q̂ is the exact
      // ⌈(n+1)·0.9⌉-th smallest calibration residual via the scale-safe
      // global rank, and the held-out half's measured coverage checks
      // the ≥ 0.9 distribution-free guarantee. The row key is
      // l_orderkey·10 + l_linenumber (linenumber ≤ 7 in TPC-H).
      // r13 OPT: the hashed/split base materializes ONCE (lazy local
      // checkpoint) — the original re-scanned lineitem and re-md5'd
      // every row for each of its four consumers (slope, n_cal, cal
      // residuals, test residuals), 4 full hash passes for 1 (guide
      // §1.2: don't recompute what you already have). Same rows, same
      // split, same 4 dp residual grid.
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .select((col("l_orderkey") * 10 + col("l_linenumber")).as("k"),
            col("l_quantity").cast("double").as("qty"),
            col("l_extendedprice").cast("double").as("y"))
          .withColumn("_cal", graft.operators.Sampling.hashBucket(
            col("k"), "x160", 100) < 50)
          .localCheckpoint(eager = false)
        val cal0 = li.filter(col("_cal"))
        val test0 = li.filter(!col("_cal"))
        val slope = cal0.agg(
          round(sum(col("y")) / sum(col("qty")), 6).as("_m"))
        def resid(df: org.apache.spark.sql.DataFrame) =
          df.crossJoin(broadcast(slope))
            .select(col("k"),
              round(abs(col("y") - col("_m") * col("qty")), 4).as("r"))
        graft.operators.Eval.splitConformal(
          resid(cal0), resid(test0), "k", "r", 0.1)
      },
      Some("""WITH li AS (SELECT
        |l_orderkey * 10 + l_linenumber AS k,
        |CAST(l_quantity AS DOUBLE) AS qty,
        |CAST(l_extendedprice AS DOUBLE) AS y,
        |('0x' || substr(md5('x160:' || CAST(l_orderkey * 10 + l_linenumber
        |AS VARCHAR)), 1, 8))::BIGINT % 100 AS b FROM lineitem),
        |m AS (SELECT round(sum(y) / sum(qty), 6) AS m FROM li WHERE b < 50),
        |cal AS (SELECT k, round(abs(y - m.m * qty), 4) AS r
        |FROM li, m WHERE b < 50),
        |tst AS (SELECT k, round(abs(y - m.m * qty), 4) AS r
        |FROM li, m WHERE b >= 50),
        |n AS (SELECT count(*) AS n_cal FROM cal),
        |rk AS (SELECT r, row_number() OVER (ORDER BY r ASC, k ASC) AS rnk
        |FROM cal),
        |q AS (SELECT n.n_cal,
        |CAST(ceil((n.n_cal + 1) * 0.9) AS BIGINT) AS k_order,
        |(SELECT r FROM rk, n WHERE rnk = CAST(ceil((n.n_cal + 1) * 0.9)
        |AS BIGINT)) AS q_hat FROM n)
        |SELECT CAST(q.n_cal AS BIGINT) AS n_cal, q.k_order, q.q_hat,
        |CAST(count(*) AS BIGINT) AS n_test,
        |CAST(count(*) FILTER (WHERE t.r <= q.q_hat) AS BIGINT)
        |AS n_covered,
        |round(CAST(count(*) FILTER (WHERE t.r <= q.q_hat) AS DOUBLE) /
        |count(*), 6) AS coverage
        |FROM tst t CROSS JOIN q
        |GROUP BY q.n_cal, q.k_order, q.q_hat"""
        .stripMargin.replace("\n", " "))),

    ("x161_quantile_normalize",
      // Cross-source quantile normalization (Eval.quantileNormalize,
      // 200-point grid) of the per-doc char-length score: each doc maps
      // to its within-source quantile position and re-values at the
      // pooled distribution's grid quantile — the batch-effect
      // correction that makes ONE global threshold mean the same thing
      // in every source. Per-source windows (parallel across sources),
      // one bounded pooled-percentile literal, codegen remap.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.quantileNormalize(
            Tables.documents(s, dir)
              .select(col("doc_id"), col("source"),
                col("n_chars").cast("double").as("score")),
            "doc_id", "source", "score", 200)
          .select(col("doc_id"), col("source"), col("score"),
            col("grid_idx"), round(col("normalized"), 6).as("normalized"))
          .orderBy(col("doc_id")),
      Some(quantileNormalizeOracle(200))),

    ("x159_paired_permutation",
      // Paired sign-flip permutation significance (Eval.
      // pairedPermutationTest, B=500): is the chars/5 token-estimate
      // heuristic (the classic pricing rule of thumb) biased against the
      // real whitespace tokenizer beyond chance on this corpus? Integer
      // per-doc deltas (ws_tokens − round(chars/5); length/5.0 never
      // lands on .5 so the two engines' round modes can't split),
      // deterministic md5-parity sign flips, add-one-smoothed two-sided
      // p — the system-comparison significance read the eval ladder was
      // missing (Koehn 2004's exact-test sibling). One B-per-item grid
      // explode into a map-side-combined per-resample sum; B groups, no
      // window. (x10's ws-vs-BPE pair is per-doc IDENTICAL on this
      // corpus — a degenerate p = 1 — hence the heuristic comparison.)
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        val deltas = docs.select(col("doc_id"),
          (size(filter(split(col("text"), "\\s+"), x => length(x) > 0))
            .cast("long") -
            round(length(col("text")) / 5.0, 0).cast("long")).as("delta"))
        graft.operators.Eval.pairedPermutationTest(deltas, "doc_id",
          "delta", 500, "x159")
      },
      Some("""WITH t AS (SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> '')) AS BIGINT) -
        |CAST(round(length(text) / 5.0) AS BIGINT) AS d
        |FROM documents),
        |obs AS (SELECT sum(d) AS s, count(*) AS n FROM t),
        |g AS (SELECT unnest(generate_series(1, 500)) AS b),
        |f AS (SELECT g.b, CASE WHEN
        |('0x' || substr(md5('x159:' || g.b || ':' || t.doc_id), 1, 2))
        |::BIGINT % 2 = 0 THEN t.d ELSE -t.d END AS fd
        |FROM g CROSS JOIN t),
        |sm AS (SELECT b, sum(fd) AS fs FROM f GROUP BY 1)
        |SELECT CAST(any_value(o.n) AS BIGINT) AS n_items,
        |CAST(any_value(o.s) AS BIGINT) AS obs_delta_sum,
        |CAST(500 AS BIGINT) AS n_resamples,
        |CAST(count(*) FILTER (WHERE abs(fs) >= abs(o.s)) AS BIGINT)
        |AS n_as_extreme,
        |round(CAST(count(*) FILTER (WHERE abs(fs) >= abs(o.s)) + 1
        |AS DOUBLE) / 501, 6) AS p_value
        |FROM sm CROSS JOIN obs o""".stripMargin.replace("\n", " "))),

    ("x151_rake_keyphrases",
      // RAKE keyphrase extraction (TextAnalysis.rakeKeyphrases,
      // stopwords {a, the}, top 3): the unsupervised per-doc tagger —
      // maximal non-stopword runs as candidate phrases, word score
      // deg/freq from document-local stats (no corpus pass, no IDF),
      // phrase = sum of word scores with the two-stage 6 dp rounding.
      // Run-id via a doc-partitioned cumulative stopword count; all
      // grains are (doc, word)/(doc, run) — never corpus-wide.
      (s: SparkSession, dir: String) =>
        TextAnalysis.rakeKeyphrases(Tables.documents(s, dir), "doc_id",
          "text", Seq("a", "the"), 3)
          .orderBy(col("doc_id"), col("rnk")),
      Some("""WITH toks AS (SELECT doc_id,
        |unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> '')) AS w,
        |unnest(range(1, len(list_filter(regexp_split_to_array(text, '\s+'),
        |t -> t <> '')) + 1)) AS pos FROM documents),
        |marked AS (SELECT doc_id, pos, w,
        |CASE WHEN w IN ('a', 'the') THEN 1 ELSE 0 END AS st FROM toks),
        |runs AS (SELECT doc_id, pos, w, st,
        |sum(st) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
        |FROM marked),
        |pw AS MATERIALIZED (SELECT doc_id, run_id, pos, w FROM runs
        |WHERE st = 0),
        |phr AS MATERIALIZED (SELECT doc_id, run_id,
        |string_agg(w, ' ' ORDER BY pos) AS phrase, count(*) AS plen
        |FROM pw GROUP BY 1, 2),
        |wscore AS (SELECT p.doc_id, p.w,
        |round(CAST(sum(ph.plen) AS DOUBLE) / count(*), 6) AS ws
        |FROM pw p JOIN phr ph ON ph.doc_id = p.doc_id
        |AND ph.run_id = p.run_id GROUP BY 1, 2),
        |pscore AS (SELECT p.doc_id, p.run_id, any_value(ph.phrase) AS phrase,
        |round(sum(ws.ws), 6) AS score
        |FROM pw p JOIN phr ph ON ph.doc_id = p.doc_id
        |AND ph.run_id = p.run_id
        |JOIN wscore ws ON ws.doc_id = p.doc_id AND ws.w = p.w
        |GROUP BY 1, 2),
        |dedup AS (SELECT doc_id, phrase, max(score) AS score FROM pscore
        |GROUP BY 1, 2),
        |rk AS (SELECT doc_id, phrase, score,
        |CAST(row_number() OVER (PARTITION BY doc_id
        |ORDER BY score DESC, phrase) AS INT) AS rnk FROM dedup)
        |SELECT doc_id, rnk, phrase, score FROM rk WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin.replace("\n", " "))),

    ("x152_embedding_drift",
      // Per-dimension embedding drift (Similarity.embeddingDrift):
      // reference = even vec_ids, current = odd — x116's PSI read
      // applied dimension-wise to the vector space plus the mean-shift
      // PSI can't see; psiFromCounts smoothing, shift differenced on
      // the rounded 6 dp grid. Dictionary-grain everywhere (64 and
      // 64x6 rows) regardless of snapshot size.
      (s: SparkSession, dir: String) => {
        val emb = Tables.embeddings(s, dir)
        Similarity.embeddingDrift(
            emb.where(col("vec_id") % 2 === 0),
            emb.where(col("vec_id") % 2 === 1),
            "embedding", Seq(-0.5, -0.25, 0.0, 0.25, 0.5))
          .orderBy(col("dim"))
      },
      Some("""WITH ex AS (SELECT vec_id % 2 AS side, pos - 1 AS dim,
        |CAST(v AS DOUBLE) AS v FROM (SELECT vec_id,
        |unnest(embedding) AS v,
        |unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings)),
        |binned AS (SELECT side, dim,
        |(CASE WHEN v >= -0.5 THEN 1 ELSE 0 END +
        |CASE WHEN v >= -0.25 THEN 1 ELSE 0 END +
        |CASE WHEN v >= 0.0 THEN 1 ELSE 0 END +
        |CASE WHEN v >= 0.25 THEN 1 ELSE 0 END +
        |CASE WHEN v >= 0.5 THEN 1 ELSE 0 END) AS bin FROM ex),
        |cnt AS (SELECT side, dim, bin, CAST(count(*) AS BIGINT) AS c
        |FROM binned GROUP BY 1, 2, 3),
        |stats AS (SELECT side, dim, CAST(count(*) AS BIGINT) AS n,
        |avg(v) AS m FROM ex GROUP BY 1, 2),
        |grid AS (SELECT s.dim, s.n AS n_ref, c.n AS n_cur, s.m AS m_ref,
        |c.m AS m_cur, b.bin
        |FROM (SELECT * FROM stats WHERE side = 0) s
        |JOIN (SELECT * FROM stats WHERE side = 1) c USING (dim)
        |CROSS JOIN (SELECT unnest(range(0, 6)) AS bin) b),
        |pq AS (SELECT g.dim, g.n_ref, g.n_cur, g.m_ref, g.m_cur,
        |(coalesce(cc.c, 0) + 0.5) / (g.n_cur + 3.0) AS p,
        |(coalesce(cr.c, 0) + 0.5) / (g.n_ref + 3.0) AS q
        |FROM grid g
        |LEFT JOIN cnt cr ON cr.side = 0 AND cr.dim = g.dim
        |AND cr.bin = g.bin
        |LEFT JOIN cnt cc ON cc.side = 1 AND cc.dim = g.dim
        |AND cc.bin = g.bin)
        |SELECT CAST(dim AS BIGINT) AS dim, n_ref, n_cur,
        |round(m_ref, 6) AS mean_ref, round(m_cur, 6) AS mean_cur,
        |round(round(m_cur, 6) - round(m_ref, 6), 6) AS mean_shift,
        |round(sum((p - q) * ln(p / q)), 6) AS psi
        |FROM pq GROUP BY 1, 2, 3, 4, 5, 6 ORDER BY dim"""
        .stripMargin.replace("\n", " "))),

    ("x153_weighted_jaccard",
      // IDF-weighted token-set Jaccard over x6's candidate pairs
      // (Dedup.weightedJaccardPairs): the rarity-aware verify — plain
      // Jaccard weighs boilerplate and content words equally; here each
      // token carries smoothed idf (ln((N+1)/(df+1))+1, 6 dp) and the
      // plain jaccard rides along so the wjaccard-vs-jaccard gap IS the
      // boilerplate read. df table = one corpus pass (the x67 budget);
      // everything pair-ward is endpoint-pruned. Pair frame eagerly
      // checkpointed — x114's replay rationale.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
        Dedup.weightedJaccardPairs(docs,
            Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
              .localCheckpoint(eager = true),
            "doc_id", "text")
          .orderBy(col("id_a"), col("id_b"))
      },
      Some("""WITH toks AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |sh0 AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        |list_transform(generate_series(1, len(t) - 2),
        |i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
        |ELSE [] END AS sl FROM toks),
        |shd AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(sl) AS s
        |FROM sh0),
        |inter0 AS (SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS i
        |FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
        |GROUP BY 1, 2),
        |sizes AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1),
        |prs AS (SELECT ia AS id_a, ib AS id_b FROM inter0
        |JOIN sizes sa ON ia = sa.doc_id JOIN sizes sb ON ib = sb.doc_id
        |WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5),
        |dt AS MATERIALIZED (SELECT DISTINCT doc_id, unnest(t) AS w
        |FROM toks),
        |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        |idf AS MATERIALIZED (SELECT w,
        |round(ln((nn.n + 1.0) / (count(*) + 1.0)) + 1.0, 6) AS idf
        |FROM dt, nn GROUP BY w, nn.n),
        |dw AS MATERIALIZED (SELECT d.doc_id,
        |CAST(count(*) AS BIGINT) AS n_toks, sum(i.idf) AS w
        |FROM dt d JOIN idf i USING (w) GROUP BY 1),
        |pi AS (SELECT p.id_a AS pa, p.id_b AS pb,
        |CAST(count(*) AS BIGINT) AS n_shared, sum(i.idf) AS wi
        |FROM prs p JOIN dt a ON a.doc_id = p.id_a
        |JOIN dt b ON b.doc_id = p.id_b AND b.w = a.w
        |JOIN idf i ON i.w = a.w GROUP BY 1, 2)
        |SELECT p.id_a, p.id_b, coalesce(pi.n_shared, 0) AS n_shared,
        |round(CAST(coalesce(pi.n_shared, 0) AS DOUBLE) /
        |(wa.n_toks + wb.n_toks - coalesce(pi.n_shared, 0)), 6) AS jaccard,
        |round(coalesce(pi.wi, 0) / (wa.w + wb.w - coalesce(pi.wi, 0)), 6)
        |AS wjaccard
        |FROM prs p LEFT JOIN pi ON pi.pa = p.id_a AND pi.pb = p.id_b
        |JOIN dw wa ON wa.doc_id = p.id_a
        |JOIN dw wb ON wb.doc_id = p.id_b
        |ORDER BY p.id_a, p.id_b""".stripMargin.replace("\n", " "))),

    ("x155_length_pareto",
      // Corpus length Pareto (queries/Serving.cumulated, second seat):
      // docs ranked by byte length, cumulative byte share read at every
      // rank decile — the truncation-policy sizing read ("the longest
      // 10% of docs hold 17% of the bytes"). Byte counts are integer-
      // valued doubles, so every fold is EXACT in any order; the decile
      // marks are a broadcast 10-row literal joined on rank.
      (s: SparkSession, dir: String) => {
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("n_chars").cast("double").as("b"))
        val marks = docs
          .agg(count(lit(1)).cast("long").as("_n"), sum(col("b")).as("_t"))
          .select(col("_n"), col("_t"),
            explode(typedLit((1L to 10L))).as("decile"))
          .withColumn("rnk",
            ceil(col("_n") * col("decile") / 10.0).cast("long"))
        graft.queries.Serving.cumulated(docs, "b", "doc_id")
          .join(broadcast(marks), col("rank") === col("rnk"))
          .select(col("decile"), col("rnk"),
            col("b").cast("long").as("chars_at_rank"),
            round(col("cum") / col("_t"), 6).as("cum_share"))
          .orderBy(col("decile"))
      },
      Some("""WITH c AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS b,
        |row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rnk,
        |sum(CAST(n_chars AS DOUBLE)) OVER (ORDER BY n_chars DESC, doc_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |sum(CAST(n_chars AS DOUBLE)) AS t FROM documents),
        |d AS (SELECT CAST(range AS BIGINT) AS dec FROM range(1, 11))
        |SELECT d.dec AS decile,
        |CAST(ceil(n.n * d.dec / 10.0) AS BIGINT) AS rnk,
        |CAST(c.b AS BIGINT) AS chars_at_rank,
        |round(c.cum / n.t, 6) AS cum_share
        |FROM d CROSS JOIN n JOIN c
        |ON c.rnk = CAST(ceil(n.n * d.dec / 10.0) AS BIGINT)
        |ORDER BY decile""".stripMargin.replace("\n", " "))),

    ("x134_distinct_n",
      // Distinct-1/-2 diversity per source (TextAnalysis.distinctN):
      // the mode-collapse read for generated corpora — a source whose
      // distinct-2 craters is recycling phrasings even when every
      // individual doc passes x16's per-doc repetition gate.
      (s: SparkSession, dir: String) =>
        TextAnalysis.distinctN(Tables.documents(s, dir), "source", "text")
          .orderBy(col("source")),
      Some("""WITH toks AS MATERIALIZED (SELECT source,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |u AS (SELECT source, CAST(count(*) AS BIGINT) AS t1,
        |CAST(count(DISTINCT g) AS BIGINT) AS d1
        |FROM (SELECT source, unnest(t) AS g FROM toks) GROUP BY 1),
        |b AS (SELECT source, CAST(count(*) AS BIGINT) AS t2,
        |CAST(count(DISTINCT g) AS BIGINT) AS d2
        |FROM (SELECT source, unnest(CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS g FROM toks)
        |GROUP BY 1)
        |SELECT u.source, t1 AS n_unigrams,
        |round(CAST(d1 AS DOUBLE) / t1, 6) AS distinct_1,
        |t2 AS n_bigrams, round(CAST(d2 AS DOUBLE) / t2, 6) AS distinct_2
        |FROM u JOIN b ON u.source = b.source
        |ORDER BY u.source""".stripMargin.replace("\n", " "))),

    ("j47_modularity",
      // Modularity of the brand partition over the urgent-order
      // co-purchase graph (operators/Graph.modularity): per-community
      // q_c = e_c/m - (d_c/2m)^2 — the audit read for whether a given
      // labeling explains the graph at all (brands shouldn't: Q ~ 0).
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .distinct()
        graft.operators.Graph.modularity(pairs, "pa", "pb",
            Tables.part(s, dir), "p_partkey", "p_brand")
          .orderBy(col("community"))
      },
      Some("""WITH li AS (SELECT l.l_orderkey, l.l_partkey FROM lineitem l
        |JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderpriority = '1-URGENT'),
        |e AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS pa,
        |b.l_partkey AS pb FROM li a JOIN li b
        |ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
        |ec AS (SELECT ca.p_brand AS brand, CAST(count(*) AS BIGINT) AS e_in
        |FROM e JOIN part ca ON e.pa = ca.p_partkey
        |JOIN part cb ON e.pb = cb.p_partkey
        |WHERE ca.p_brand = cb.p_brand GROUP BY 1),
        |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
        |(SELECT pa AS v FROM e UNION ALL SELECT pb AS v FROM e)
        |GROUP BY 1),
        |dc AS (SELECT p.p_brand AS brand, CAST(sum(d) AS BIGINT) AS d_sum
        |FROM deg JOIN part p ON deg.v = p.p_partkey GROUP BY 1)
        |SELECT dc.brand AS community, coalesce(e_in, 0) AS edges_within,
        |d_sum AS degree_sum, round(coalesce(e_in, 0) / CAST(m.m AS DOUBLE)
        |- (CAST(d_sum AS DOUBLE) / (2 * m.m)) *
        |(CAST(d_sum AS DOUBLE) / (2 * m.m)), 6) AS q_c
        |FROM dc LEFT JOIN ec ON dc.brand = ec.brand CROSS JOIN m
        |ORDER BY community""".stripMargin.replace("\n", " "))),

    ("s31_stream_anova",
      // J45 under streaming (streaming/Streaming.runStreamAnova):
      // power sums are genuinely additive, so the source-grain state
      // absorbs partial (n, sum x, sum x^2) directly — the s30 Welch
      // discipline — and the read-time scalar fold equals batch j45
      // exactly; its oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s31")
        graft.streaming.Streaming.runStreamAnova(s, dir, base + "/anova")
      },
      Some("""WITH s AS (SELECT source, CAST(count(*) AS BIGINT) AS n,
        |CAST(sum(n_chars) AS BIGINT) AS sx,
        |CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx
        |FROM documents GROUP BY 1),
        |g AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |CAST(sum(n) AS BIGINT) AS n, CAST(sum(sx) AS BIGINT) AS gsx,
        |CAST(sum(sxx) AS BIGINT) AS gsxx,
        |sum(CAST(sx AS DOUBLE) * sx / n) AS sgm FROM s)
        |SELECT k, n,
        |round(sgm - CAST(gsx AS DOUBLE) * gsx / n, 2) AS ss_between,
        |round(gsxx - sgm, 2) AS ss_within,
        |CASE WHEN k > 1 AND n > k AND gsxx - sgm > 0 THEN
        |round(((sgm - CAST(gsx AS DOUBLE) * gsx / n) / (k - 1)) /
        |((gsxx - sgm) / (n - k)), 4) END AS f_stat,
        |CASE WHEN gsxx - CAST(gsx AS DOUBLE) * gsx / n > 0 THEN
        |round((sgm - CAST(gsx AS DOUBLE) * gsx / n) /
        |(gsxx - CAST(gsx AS DOUBLE) * gsx / n), 6) END AS eta_sq
        |FROM g""".stripMargin.replace("\n", " "))),

    ("j48_kruskal_wallis",
      // Kruskal-Wallis H of document length across sources
      // (TimeSeries.kruskalWallis with NO keys — the corpus-wide test on
      // the ONE implementation shared with j64 since the r12
      // consolidation; the pooled running rank routes through the dense
      // group×value frame so the window never collapses to a single
      // partition): j45's nonparametric twin and j43's k-group
      // generalization — average ranks for ties, the standard tie
      // correction emitted alongside raw H, legacy 4 dp grid.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.kruskalWallis(
            Tables.documents(s, dir), Seq(), "n_chars", "source", dp = 4)
          .select(col("n_groups").as("k"), col("n_total").as("n"),
            col("h"), col("h_tie_corrected")),
      Some("""WITH g AS MATERIALIZED (SELECT source AS grp, n_chars AS v,
        |CAST(count(*) AS BIGINT) AS c FROM documents GROUP BY 1, 2),
        |gv AS MATERIALIZED (SELECT v, CAST(sum(c) AS BIGINT) AS ct
        |FROM g GROUP BY 1),
        |rk AS (SELECT a.v, a.ct, coalesce(sum(b.ct), 0)
        |+ (a.ct + 1) / 2.0 AS r
        |FROM gv a LEFT JOIN gv b ON b.v < a.v GROUP BY a.v, a.ct),
        |rg AS (SELECT g.grp, CAST(sum(g.c) AS BIGINT) AS n,
        |sum(g.c * rk.r) AS rsum
        |FROM g JOIN rk ON g.v = rk.v GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn,
        |CAST(count(*) AS BIGINT) AS k, sum(rsum * rsum / n) AS s FROM rg),
        |tie AS (SELECT sum(CAST(ct AS DOUBLE) * ct * ct - ct) AS t FROM gv)
        |SELECT k, nn AS n,
        |round(12.0 / (nn * (nn + 1.0)) * s - 3 * (nn + 1), 4) AS h,
        |CASE WHEN t < CAST(nn AS DOUBLE) * nn * nn - nn THEN
        |round((12.0 / (nn * (nn + 1.0)) * s - 3 * (nn + 1)) /
        |(1 - t / (CAST(nn AS DOUBLE) * nn * nn - nn)), 4) END
        |AS h_tie_corrected
        |FROM tot CROSS JOIN tie""".stripMargin.replace("\n", " "))),

    ("x135_cramers_v",
      // Cramér's V between language and source
      // (TextAnalysis.cramersV): the EFFECT SIZE x93's raw chi-square
      // can't give — at corpus n chi-square trips significance on
      // associations too weak to act on; V in [0,1] is comparable
      // across tables and the guard against that.
      (s: SparkSession, dir: String) =>
        TextAnalysis.cramersV(Tables.documents(s, dir), "lang", "source"),
      Some("""WITH obs AS MATERIALIZED (SELECT lang, source,
        |CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM obs
        |GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM obs
        |GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs),
        |grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct,
        |coalesce(obs.o, 0) AS o, rt.rt * ct.ct / n.n AS e
        |FROM rt CROSS JOIN ct
        |LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
        |CROSS JOIN n),
        |f AS (SELECT CAST(max(e0.n) AS BIGINT) AS n,
        |CAST(count(DISTINCT lang) AS BIGINT) AS r,
        |CAST(count(DISTINCT source) AS BIGINT) AS c,
        |sum((o - e) * (o - e) / e) AS chi2
        |FROM grid CROSS JOIN n e0)
        |SELECT n, r, c, round(chi2, 4) AS chi2,
        |CASE WHEN least(r - 1, c - 1) > 0 THEN
        |round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) END AS v
        |FROM f""".stripMargin.replace("\n", " "))),

    ("x136_jaro_linkage",
      // X50's blocking with Jaro-Winkler verify
      // (Dedup.blockedJaroWinklerPairs): similarity-normalized name/
      // title matching through the native codegen'd JaroWinkler
      // expression (functions/JaroWinkler.scala) — DuckDB's
      // jaro_winkler_similarity reproduces its conventions exactly
      // (fuzz-pinned in JaroWinklerSpec).
      (s: SparkSession, dir: String) =>
        graft.operators.Dedup.blockedJaroWinklerPairs(
          Tables.documents(s, dir)
            .select(col("doc_id"), substring(col("text"), 1, 30).as("title")),
          "doc_id", "title", substring(col("title"), 1, 4), 0.9),
      Some("""WITH e AS (SELECT doc_id, substr(text, 1, 30) AS title
        |FROM documents),
        |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |round(jaro_winkler_similarity(a.title, b.title), 6) AS jw
        |FROM e a JOIN e b ON substr(a.title, 1, 4) = substr(b.title, 1, 4)
        |AND a.doc_id < b.doc_id)
        |SELECT id_a, id_b, jw FROM p WHERE jw >= 0.9
        |ORDER BY id_a, id_b""".stripMargin.replace("\n", " "))),

    ("x137_halfsample_ci",
      // Hash-seeded half-sample replication CI for mean doc length per
      // source (Sampling.halfSampleCi, 16 replicates): the survey-
      // bootstrap standard error from ONE aggregation pass — the
      // uncertainty read point estimates can't give, with replicate
      // membership deterministic (engine-portable) by the md5 discipline
      // every sampler here uses.
      (s: SparkSession, dir: String) =>
        graft.operators.Sampling.halfSampleCi(Tables.documents(s, dir), "source",
          "doc_id", "n_chars", 16)
          .orderBy(col("source")),
      Some(halfSampleOracleSql(16))),

    ("j49_unpivot",
      // The melt surface, j6's pivot inverse (Dataset.unpivot — Spark's
      // native wide-to-long, a generator projection with NO shuffle
      // until the aggregate): lineitem's four measures unpivot to
      // (measure, value) rows and aggregate per return flag — the
      // "one metrics table instead of four queries" reshape.
      // r13 OPT: aggregate FIRST (one pass over lineitem, 4 sums + a
      // count per flag), THEN unpivot the |flags|-row aggregate — the
      // original unpivoted 4× the fact rows through the generator before
      // aggregating (guide §2.3 "aggregate before you shuffle"). Melt
      // keeps nulls on both shapes, so n = count(*) per flag for every
      // measure and each total = the same column sum — identical output.
      (s: SparkSession, dir: String) =>
        Tables.lineitem(s, dir)
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).cast("long").as("n"),
            round(sum(col("l_quantity")), 2).as("l_quantity"),
            round(sum(col("l_extendedprice")), 2).as("l_extendedprice"),
            round(sum(col("l_discount")), 2).as("l_discount"),
            round(sum(col("l_tax")), 2).as("l_tax"))
          .unpivot(
            Array(col("l_returnflag"), col("n")),
            Array(col("l_quantity"), col("l_extendedprice"),
              col("l_discount"), col("l_tax")),
            "measure", "total")
          .select(col("l_returnflag"), col("measure"), col("n"),
            col("total"))
          .orderBy(col("l_returnflag"), col("measure")),
      Some("""WITH m AS (
        |SELECT l_returnflag, 'l_quantity' AS measure, l_quantity AS value
        |FROM lineitem UNION ALL
        |SELECT l_returnflag, 'l_extendedprice', l_extendedprice
        |FROM lineitem UNION ALL
        |SELECT l_returnflag, 'l_discount', l_discount FROM lineitem
        |UNION ALL
        |SELECT l_returnflag, 'l_tax', l_tax FROM lineitem)
        |SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        |round(sum(value), 2) AS total
        |FROM m GROUP BY 1, 2
        |ORDER BY l_returnflag, measure""".stripMargin.replace("\n", " "))),

    ("j50_rfm_segments",
      // RFM segmentation at segment grain (queries/Serving.rfmSegments):
      // the classic CRM cube — per-customer recency/frequency/monetary
      // quintile scores from ONE broadcast exact-percentile row, scored
      // as a projection (no ntile, no global sort); monetary rounds to
      // cents before scoring so edges are engine-exact.
      (s: SparkSession, dir: String) =>
        graft.queries.Serving.rfmSegments(Tables.orders(s, dir),
            "o_custkey", "o_orderdate", "o_totalprice")
          .orderBy(col("r_score"), col("f_score"), col("m_score")),
      Some("""WITH c AS MATERIALIZED (SELECT o_custkey,
        |date_diff('day', max(o_orderdate),
        |(SELECT max(o_orderdate) FROM orders)) AS rec,
        |CAST(count(*) AS BIGINT) AS freq,
        |round(sum(o_totalprice), 2) AS mon
        |FROM orders GROUP BY 1),
        |e AS (SELECT
        |quantile_cont(rec, 0.2) AS r20, quantile_cont(rec, 0.4) AS r40,
        |quantile_cont(rec, 0.6) AS r60, quantile_cont(rec, 0.8) AS r80,
        |quantile_cont(freq, 0.2) AS f20, quantile_cont(freq, 0.4) AS f40,
        |quantile_cont(freq, 0.6) AS f60, quantile_cont(freq, 0.8) AS f80,
        |quantile_cont(mon, 0.2) AS m20, quantile_cont(mon, 0.4) AS m40,
        |quantile_cont(mon, 0.6) AS m60, quantile_cont(mon, 0.8) AS m80
        |FROM c),
        |s AS (SELECT o_custkey,
        |5 - CAST(rec > r20 AS INT) - CAST(rec > r40 AS INT)
        |- CAST(rec > r60 AS INT) - CAST(rec > r80 AS INT) AS r_score,
        |1 + CAST(freq > f20 AS INT) + CAST(freq > f40 AS INT)
        |+ CAST(freq > f60 AS INT) + CAST(freq > f80 AS INT) AS f_score,
        |1 + CAST(mon > m20 AS INT) + CAST(mon > m40 AS INT)
        |+ CAST(mon > m60 AS INT) + CAST(mon > m80 AS INT) AS m_score,
        |mon FROM c CROSS JOIN e)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |CAST(f_score AS BIGINT) AS f_score,
        |CAST(m_score AS BIGINT) AS m_score,
        |CAST(count(*) AS BIGINT) AS n_customers,
        |round(sum(mon), 2) AS total_monetary
        |FROM s GROUP BY 1, 2, 3
        |ORDER BY r_score, f_score, m_score""".stripMargin
        .replace("\n", " "))),

    ("s32_stream_cramers",
      // X135 under streaming (streaming/Streaming.runStreamCramersV):
      // contingency cell counts are genuinely additive — the s28 PSI
      // discipline — so the (lang, source) count state absorbs each
      // micro-batch directly and the read-time sparse-identity fold
      // equals batch x135 exactly; its oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s32")
        graft.streaming.Streaming.runStreamCramersV(s, dir,
          base + "/cramers")
      },
      Some("""WITH obs AS MATERIALIZED (SELECT lang, source,
        |CAST(count(*) AS BIGINT) AS o FROM documents GROUP BY 1, 2),
        |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS rt FROM obs
        |GROUP BY 1),
        |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS ct FROM obs
        |GROUP BY 1),
        |n AS (SELECT CAST(sum(o) AS DOUBLE) AS n FROM obs),
        |grid AS (SELECT rt.lang, ct.source, rt.rt, ct.ct,
        |coalesce(obs.o, 0) AS o, rt.rt * ct.ct / n.n AS e
        |FROM rt CROSS JOIN ct
        |LEFT JOIN obs ON obs.lang = rt.lang AND obs.source = ct.source
        |CROSS JOIN n),
        |f AS (SELECT CAST(max(e0.n) AS BIGINT) AS n,
        |CAST(count(DISTINCT lang) AS BIGINT) AS r,
        |CAST(count(DISTINCT source) AS BIGINT) AS c,
        |sum((o - e) * (o - e) / e) AS chi2
        |FROM grid CROSS JOIN n e0)
        |SELECT n, r, c, round(chi2, 4) AS chi2,
        |CASE WHEN least(r - 1, c - 1) > 0 THEN
        |round(sqrt(chi2 / (n * least(r - 1, c - 1))), 6) END AS v
        |FROM f""".stripMargin.replace("\n", " "))),

    ("x138_trigram_backoff",
      // Trigram stupid-backoff LM scoring
      // (TextAnalysis.trigramBackoffScore): counts train on the md5-half
      // of the corpus, the other half scores with the genuine Brants
      // cascade trigram -> 0.4 bigram -> 0.16 add-one unigram — x61's
      // held-out upgrade, the "score fresh crawl against yesterday's
      // model" shape; backoff_rate is the novelty read alongside.
      (s: SparkSession, dir: String) =>
        TextAnalysis.trigramBackoffScore(Tables.documents(s, dir))
          .orderBy(col("doc_id")),
      Some("""WITH tok AS MATERIALIZED (SELECT doc_id,
        |list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS t,
        |substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '8' AS train
        |FROM documents),
        |tct AS (SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS t3 FROM
        |(SELECT unnest(t[1:len(t)-2]) AS w1, unnest(t[2:len(t)-1]) AS w2,
        |unnest(t[3:len(t)]) AS w3 FROM tok WHERE train AND len(t) >= 3)
        |GROUP BY 1, 2, 3),
        |bct AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS b FROM
        |(SELECT unnest(t[1:len(t)-1]) AS w1, unnest(t[2:len(t)]) AS w2
        |FROM tok WHERE train AND len(t) >= 2) GROUP BY 1, 2),
        |uct AS (SELECT w1, CAST(count(*) AS BIGINT) AS u FROM
        |(SELECT unnest(t) AS w1 FROM tok WHERE train AND len(t) >= 1)
        |GROUP BY 1),
        |nv AS (SELECT CAST(sum(u) AS DOUBLE) AS nn,
        |CAST(count(*) AS DOUBLE) AS vv FROM uct),
        |inst AS (SELECT doc_id, unnest(t[1:len(t)-2]) AS w1,
        |unnest(t[2:len(t)-1]) AS w2, unnest(t[3:len(t)]) AS w3
        |FROM tok WHERE NOT train AND len(t) >= 3),
        |sc AS (SELECT i.doc_id, coalesce(tct.t3, 0) AS t3,
        |CASE WHEN coalesce(tct.t3, 0) > 0
        |THEN CAST(tct.t3 AS DOUBLE) / b12.b
        |WHEN coalesce(b23.b, 0) > 0
        |THEN 0.4 * CAST(b23.b AS DOUBLE) / u2.u
        |ELSE 0.4 * 0.4 * (coalesce(u3.u, 0) + 1) / (nv.nn + nv.vv)
        |END AS s
        |FROM inst i
        |LEFT JOIN tct ON i.w1 = tct.w1 AND i.w2 = tct.w2 AND i.w3 = tct.w3
        |LEFT JOIN bct b12 ON i.w1 = b12.w1 AND i.w2 = b12.w2
        |LEFT JOIN bct b23 ON i.w2 = b23.w1 AND i.w3 = b23.w2
        |LEFT JOIN uct u2 ON i.w2 = u2.w1
        |LEFT JOIN uct u3 ON i.w3 = u3.w1
        |CROSS JOIN nv)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |round(sum(CASE WHEN t3 > 0 THEN 0 ELSE 1 END)
        |/ CAST(count(*) AS DOUBLE), 4) AS backoff_rate,
        |round(sum(ln(s)) / count(*), 4) AS tri_score
        |FROM sc GROUP BY 1 ORDER BY doc_id""".stripMargin
        .replace("\n", " "))),

    ("x139_unseen_mass",
      // Good-Turing unseen mass + Chao1 richness per source at bigram
      // grain (TextAnalysis.unseenMassEstimate): n1/N predicts the
      // probability the next bigram drawn is novel, Chao1 estimates the
      // true bigram vocabulary — "does more data from this source buy
      // novelty or reruns", the predictive twin of x138's realized
      // backoff_rate.
      (s: SparkSession, dir: String) =>
        TextAnalysis.unseenMassEstimate(Tables.documents(s, dir),
          "source", "text", 2)
          .orderBy(col("source")),
      Some("""WITH tok AS (SELECT source, list_filter(
        |regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |w AS (SELECT source, unnest(CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS g FROM tok),
        |wc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
        |FROM w GROUP BY 1, 2),
        |f AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |CAST(count(*) AS BIGINT) AS v,
        |CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |FROM wc GROUP BY 1)
        |SELECT source, n AS n_grams, v AS vocab, n1, n2,
        |round(CAST(n1 AS DOUBLE) / n, 6) AS gt_unseen_mass,
        |round(v + CAST(n1 AS DOUBLE) * (n1 - 1) / (2 * (n2 + 1)), 2)
        |AS chao1
        |FROM f ORDER BY source""".stripMargin.replace("\n", " "))),

    ("s33_stream_unseen_mass",
      // X139 under streaming (streaming/Streaming.runStreamUnseenMass):
      // gram counts add; SINGLETON counts don't (a gram seen once in two
      // batches isn't a singleton), so state is the vocabulary-grain
      // count table and the freq-of-freq fold runs at read time — equals
      // batch x139 exactly; its oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s33")
        graft.streaming.Streaming.runStreamUnseenMass(s, dir,
            base + "/unseen")
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (SELECT source, list_filter(
        |regexp_split_to_array(text, '\s+'), t -> t <> '') AS t
        |FROM documents),
        |w AS (SELECT source, unnest(CASE WHEN len(t) >= 2 THEN
        |list_transform(generate_series(1, len(t) - 1),
        |i -> t[i] || ' ' || t[i+1]) ELSE [] END) AS g FROM tok),
        |wc AS (SELECT source, g, CAST(count(*) AS BIGINT) AS c
        |FROM w GROUP BY 1, 2),
        |f AS (SELECT source, CAST(sum(c) AS BIGINT) AS n,
        |CAST(count(*) AS BIGINT) AS v,
        |CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
        |FROM wc GROUP BY 1)
        |SELECT source, n AS n_grams, v AS vocab, n1, n2,
        |round(CAST(n1 AS DOUBLE) / n, 6) AS gt_unseen_mass,
        |round(v + CAST(n1 AS DOUBLE) * (n1 - 1) / (2 * (n2 + 1)), 2)
        |AS chao1
        |FROM f ORDER BY source""".stripMargin.replace("\n", " "))),

    ("x140_matryoshka_recall",
      // Matryoshka truncation eval (Similarity.truncationRecall):
      // recall@10 of the leading-16 and leading-32-dim self-kNN against
      // the full 64-dim reference — the sizing read before shipping
      // truncated embeddings to a cheaper index tier. One checkpointed
      // full kNN reused against every level; truncation is an
      // array-local slice.
      (s: SparkSession, dir: String) =>
        Similarity.truncationRecall(Tables.embeddings(s, dir),
          "vec_id", "embedding", Seq(16, 32), 10, 16, 4)
          .orderBy(col("dims")),
      Some(matryoshkaOracleSql(Seq(16, 32)))),

    ("x141_ivf_balance",
      // IVF balance audit (Similarity.ivfBalanceAudit): the coarse
      // assignment's imbalance factor (expected probe-cost multiplier,
      // 1.0 = uniform) and hot-bucket max/mean — the go/no-go read on
      // an index layout before queries ship; x7's cost model assumes
      // balance and this measures it.
      (s: SparkSession, dir: String) =>
        Similarity.ivfBalanceAudit(Tables.embeddings(s, dir),
          "vec_id", "embedding", 16),
      Some(s"""WITH cents AS (SELECT vec_id AS cid, embedding AS cv
        |FROM embeddings ORDER BY vec_id LIMIT 16),
        |asg AS (SELECT vec_id, cid,
        |row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rn
        |FROM (SELECT e.vec_id, c.cid, ${cosSql("e.embedding", "c.cv")} AS d
        |FROM embeddings e, cents c)),
        |sz AS (SELECT cid, CAST(count(*) AS BIGINT) AS n FROM asg
        |WHERE rn = 1 GROUP BY 1),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS k,
        |CAST(sum(n) AS BIGINT) AS n, CAST(max(n) AS BIGINT) AS max_bucket,
        |sum(CAST(n AS DOUBLE) * n) AS ss FROM sz)
        |SELECT k, n, max_bucket,
        |round(CAST(max_bucket AS DOUBLE) * k / n, 4) AS max_over_mean,
        |round(ss * k / (CAST(n AS DOUBLE) * n), 4) AS imbalance_factor
        |FROM f""".stripMargin.replace("\n", " "))),

    ("j51_clamped_balance",
      // Clamped running balance per user (TimeSeries.clampedBalance):
      // inventory/credit semantics — signed deltas floored at zero at
      // EVERY step, the stateful scan SQL windows can't express
      // (cumsum-then-greatest is wrong). One shuffle to key grain, then
      // an array-local struct-accumulator fold; both engines walk the
      // identical sorted sequence so every clamp decision is portable.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.clampedBalance(
            Tables.events(s, dir), "user_id", "ts", "event_id",
            col("value") - lit(50.0))
          .orderBy(col("user_id")),
      // NOTE the oracle folds with a 2-element LIST accumulator, not a
      // struct: DuckDB 1.0 prunes unreferenced struct fields INTO the
      // list_reduce lambda, and pruning the balance out of the hits
      // projection silently changes every clamp decision (verified:
      // struct form returns different n_floor_hits for whole-struct vs
      // per-field projections on the same data).
      Some("""WITH s AS (SELECT user_id,
        |list(value - 50.0 ORDER BY ts, event_id) AS vs FROM events
        |GROUP BY 1),
        |f AS (SELECT user_id, len(vs) AS n,
        |list_reduce(list_prepend([0.0, 0.0],
        |list_transform(vs, v -> [v, 0.0])),
        |(acc, v) -> CASE WHEN acc[1] + v[1] < 0
        |THEN [0.0, acc[2] + 1]
        |ELSE [acc[1] + v[1], acc[2]] END) AS r
        |FROM s)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |round(r[1], 4) AS final_balance,
        |CAST(r[2] AS BIGINT) AS n_floor_hits
        |FROM f ORDER BY user_id""".stripMargin.replace("\n", " "))),

    ("j52_association_rules",
      // Association rules over order baskets (Graph.associationRules):
      // support / confidence / lift with the Apriori support prune —
      // the merchandiser's read j12's PMI doesn't give; top-20 by lift.
      (s: SparkSession, dir: String) =>
        graft.operators.Graph.associationRules(
          Tables.lineitem(s, dir), "l_orderkey", "l_partkey", 3, 20),
      Some("""WITH li AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o,
        |l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n FROM li),
        |ic AS (SELECT p, CAST(count(*) AS BIGINT) AS c FROM li
        |GROUP BY 1),
        |pc AS (SELECT a.p AS pa, b.p AS pb, CAST(count(*) AS BIGINT) AS cp
        |FROM li a JOIN li b ON a.o = b.o AND a.p < b.p GROUP BY 1, 2
        |HAVING count(*) >= 3)
        |SELECT pa, pb, cp AS n_pair,
        |round(CAST(cp AS DOUBLE) / n.n, 6) AS support,
        |round(CAST(cp AS DOUBLE) / ia.c, 6) AS conf_a_to_b,
        |round(CAST(cp AS DOUBLE) * n.n / (ia.c * CAST(ib.c AS DOUBLE)), 4)
        |AS lift
        |FROM pc JOIN ic ia ON pc.pa = ia.p JOIN ic ib ON pc.pb = ib.p
        |CROSS JOIN n
        |ORDER BY lift DESC, pa, pb LIMIT 20""".stripMargin
        .replace("\n", " "))),

    ("x142_negative_sampling",
      // Word2vec negative-sampling table
      // (TextAnalysis.negativeSamplingTable, alpha = 0.75, top-30): the
      // smoothed unigram distribution contrastive text trainers draw
      // negatives from, emitted beside the raw unigram probability so
      // the smoothing's per-token effect is visible.
      (s: SparkSession, dir: String) =>
        TextAnalysis.negativeSamplingTable(Tables.documents(s, dir),
          "text", 0.75, 30),
      Some("""WITH w AS (SELECT unnest(list_filter(
        |regexp_split_to_array(text, '\s+'), t -> t <> '')) AS w
        |FROM documents),
        |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1),
        |z AS (SELECT sum(pow(CAST(c AS DOUBLE), 0.75)) AS z,
        |CAST(sum(c) AS BIGINT) AS n FROM wc)
        |SELECT w AS token, c,
        |round(CAST(c AS DOUBLE) / z.n, 6) AS p_unigram,
        |round(pow(CAST(c AS DOUBLE), 0.75) / z.z, 6) AS p_negative
        |FROM wc CROSS JOIN z
        |ORDER BY c DESC, token LIMIT 30""".stripMargin
        .replace("\n", " "))),

    ("j56_forecast_backtest",
      // Seasonal-naive forecast backtest (TimeSeries.forecastBacktest,
      // season 7): naive (lag-1) vs seasonal-naive (lag-7) walked over
      // each event type's DENSE daily-count series, MASE as the ratio of
      // the two exact integer error sums (< 1 = weekly signal worth
      // modeling — the gate before anything like j40's Holt ships),
      // sMAPE alongside (avg of per-day doubles, rounded 4 dp — the
      // summation-order convention). Events collapse to (type, day) in
      // one pass; everything after runs on that series frame.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.forecastBacktest(
          Tables.events(s, dir), "event_type", "ts", 7)
          .orderBy(col("event_type")),
      Some(forecastBacktestOracle)),

    ("s37_stream_forecast",
      // J56 under streaming (streaming/Streaming.runStreamForecastBacktest):
      // the dense-grid lags can't absorb partial-day state, so state is
      // the additive day-grain count table (the s29/s27 resolution) and
      // the whole grid/lag/error fold runs at read time on converged
      // counts; j56's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s37")
        graft.streaming.Streaming.runStreamForecastBacktest(
            s, dir, base + "/fb", 7)
          .orderBy(col("event_type"))
      },
      Some(forecastBacktestOracle)),

    ("j57_mad_anomaly",
      // Robust day-level anomaly read (TimeSeries.madAnomaly, z > 3):
      // the median/MAD twin of j13's mean-based rate anomaly — a single
      // spike inflates a z-score's own sigma and hides itself, the MAD
      // barely moves. Dense daily grid (j56's), robust z with the 1.4826
      // consistency constant, per-type flag count + peak day (earliest
      // tie-break, NULLS LAST for constant series). Medians of integer
      // counts land on the exact 0.25 grid — every statistic
      // deterministic, rounding presentational.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.madAnomaly(
          Tables.events(s, dir), "event_type", "ts", 3.0)
          .orderBy(col("event_type")),
      Some(madAnomalyOracle)),

    ("s38_stream_mad",
      // J57 under streaming (streaming/Streaming.runStreamMadAnomaly):
      // medians can't absorb partial-day state (a half-day batch is a
      // fake low day that drags the median), so the s37 resolution
      // applies - the SAME additive day-grain count state, the whole
      // median/MAD/z/peak fold at read time; j57's oracle verbatim.
      (s: SparkSession, dir: String) => {
        val base = scratch("s38")
        graft.streaming.Streaming.runStreamMadAnomaly(
            s, dir, base + "/mad", 3.0)
          .orderBy(col("event_type"))
      },
      Some(madAnomalyOracle)),

    ("j53_dow_hour_profile",
      // Day-of-week x hour heatmap (queries/Serving.dowHourProfile):
      // the dashboard calendar read — one agg to the fixed 7x24 grid,
      // share from a broadcast scalar; dow is 1=Sunday on both engines.
      (s: SparkSession, dir: String) =>
        graft.queries.Serving.dowHourProfile(Tables.events(s, dir), "ts")
          .orderBy(col("dow"), col("hod")),
      Some("""WITH h AS (SELECT dayofweek(ts) + 1 AS dow, hour(ts) AS hod,
        |CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM h)
        |SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod, n,
        |round(CAST(n AS DOUBLE) / t.t, 6) AS share
        |FROM h CROSS JOIN t ORDER BY dow, hod""".stripMargin
        .replace("\n", " "))),

    ("x143_langid_margin",
      // Language-ID with a confidence margin
      // (TextAnalysis.langIdMargin, min margin 2): best minus
      // second-best score — the abstention read x8's bare argmax can't
      // give; margin 0 is a coin flip a lang-specific pipeline should
      // not consume. One struct-min aggregate, no rank window.
      (s: SparkSession, dir: String) =>
        TextAnalysis.langIdMargin(Tables.documents(s, dir), 2L)
          .orderBy(col("doc_id")),
      Some(langIdMarginOracleSql(2L))),

    ("q31_rank_movers",
      // Leaderboard rank movers (queries/Serving.rankMovers): first-half
      // vs second-half counts from ONE conditional-aggregate scan, each
      // half ranked via the scale-safe ranked() (range partition +
      // zipWithIndex, never a one-task window), rank delta emitted —
      // the "who's rising" read a raw count delta buries.
      (s: SparkSession, dir: String) =>
        graft.queries.Serving.rankMovers(Tables.events(s, dir),
            "event_type", "ts")
          .orderBy(col("rank_curr"), col("event_type")),
      Some("""WITH b AS (SELECT (epoch_ms(min(ts)) + epoch_ms(max(ts)))
        |// 2 AS mid FROM events),
        |c AS (SELECT event_type,
        |CAST(sum(CASE WHEN epoch_ms(ts) <= b.mid THEN 1 ELSE 0 END)
        |AS BIGINT) AS n_prev,
        |CAST(sum(CASE WHEN epoch_ms(ts) > b.mid THEN 1 ELSE 0 END)
        |AS BIGINT) AS n_curr
        |FROM events CROSS JOIN b GROUP BY 1),
        |r AS (SELECT event_type, n_prev, n_curr,
        |CAST(row_number() OVER (ORDER BY n_prev DESC, event_type)
        |AS BIGINT) AS rank_prev,
        |CAST(row_number() OVER (ORDER BY n_curr DESC, event_type)
        |AS BIGINT) AS rank_curr FROM c)
        |SELECT event_type, n_prev, n_curr, rank_prev, rank_curr,
        |rank_prev - rank_curr AS rank_delta
        |FROM r ORDER BY rank_curr, event_type""".stripMargin
        .replace("\n", " "))),

    ("x162_dbscan_lsh",
      // DBSCAN-style density clustering over the sign-LSH bucket graph
      // (Dedup.dbscanLsh, 8×8 bands, ε = cosine 0.3, minPts 3): the
      // clustering read x29's plain CC and x69's k-means can't give —
      // core/border/noise roles, with border points attached to their
      // min adjacent core cluster WITHOUT bridging clusters (the chaining
      // failure of CC dedup at loose thresholds). Pairs from banded LSH,
      // never all-pairs; CC on the core-core subgraph only.
      (s: SparkSession, dir: String) =>
        Dedup.dbscanLsh(Tables.embeddings(s, dir), "vec_id", "embedding",
          8, 8, 0.3, 3)
          .orderBy(col("vec_id")),
      Some(dbscanLshOracleSql)),

    ("x163_knn_shapley",
      // Exact KNN-Shapley data valuation (Similarity.knnShapley, k=10,
      // test = the 20 ids with smallest residue-permuted hash — a
      // deterministic hash-ordered limit, BOUNDED BY CONSTRUCTION at any
      // corpus scale per the r12 verdict, never a corpus fraction): the
      // closed-form per-training-point Shapley value for the k-NN task —
      // the does-this-example-help-or-hurt read quality scores can't
      // give, with Σφ = k-NN test accuracy by the efficiency axiom
      // (spec-pinned). Similarities round 6 dp before ranking; the
      // suffix recurrence rides per-test-point windows.
      (s: SparkSession, dir: String) =>
        Similarity.knnShapley(Tables.embeddings(s, dir), "vec_id",
          "embedding", "label", 10, 20)
          .orderBy(col("vec_id")),
      Some("""WITH tst AS MATERIALIZED (SELECT vec_id AS tid,
        |embedding AS tv, label AS ty FROM embeddings
        |ORDER BY (vec_id % 9973) * 2654435761 % 9973, vec_id LIMIT 20),
        |trn AS MATERIALIZED (SELECT vec_id, embedding, label
        |FROM embeddings
        |WHERE vec_id NOT IN (SELECT tid FROM tst)),
        |n AS (SELECT count(*) AS n FROM trn),
        |prs AS (SELECT t.tid, t.ty, a.vec_id, a.label,
        |round(list_reduce(list_transform(generate_series(1,
        |len(a.embedding)),
        |i -> CAST(a.embedding[i] AS DOUBLE) * CAST(t.tv[i] AS DOUBLE)),
        |(x,y) -> x+y)
        |/ (sqrt(list_reduce(list_transform(generate_series(1,
        |len(a.embedding)),
        |i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i]
        |AS DOUBLE)), (x,y) -> x+y))
        |* sqrt(list_reduce(list_transform(generate_series(1, len(t.tv)),
        |i -> CAST(t.tv[i] AS DOUBLE) * CAST(t.tv[i] AS DOUBLE)),
        |(x,y) -> x+y))), 6) AS sim,
        |CASE WHEN a.label = t.ty THEN 1.0 ELSE 0.0 END AS m
        |FROM trn a CROSS JOIN tst t),
        |rk AS (SELECT *, row_number() OVER (PARTITION BY tid
        |ORDER BY sim DESC, vec_id) AS r FROM prs),
        |inc AS (SELECT tid, vec_id, m, r,
        |lag(m) OVER (PARTITION BY tid ORDER BY r DESC) AS mnext FROM rk),
        |sv AS (SELECT tid, vec_id, r,
        |first_value(m) OVER (PARTITION BY tid ORDER BY r DESC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / n.n
        |+ sum(CASE WHEN mnext IS NULL THEN 0.0
        |ELSE (m - mnext) / 10.0 * least(10, r) / r END)
        |OVER (PARTITION BY tid ORDER BY r DESC
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
        |FROM inc, n)
        |SELECT t.vec_id, any_value(t.label) AS label,
        |CAST(count(*) AS BIGINT) AS n_test,
        |round(avg(sv.s), 6) AS shapley
        |FROM sv JOIN trn t ON t.vec_id = sv.vec_id
        |GROUP BY 1 ORDER BY t.vec_id""".stripMargin.replace("\n", " "))),

    ("x164_isotonic",
      // Isotonic calibration (Eval.isotonicCalibration — PAVA on the
      // bounded bin table, driver-side bounded metadata): the monotone
      // non-decreasing fit of P(lang = 'en') against the n_chars//50
      // score bin, pooling adjacent violators into weighted averages —
      // the probability-calibration map x105's raw bin rates can't give
      // (they zig-zag from sampling noise). Oracle computes the same fit
      // via the closed-form minimax; every value is one division of
      // exact longs, bit-identical both engines.
      (s: SparkSession, dir: String) =>
        graft.operators.Eval.isotonicCalibration(
          Tables.documents(s, dir).select(
            floor(col("n_chars") / 50L).cast("long").as("bin"),
            when(col("lang") === "en", 1L).otherwise(0L).as("is_en")),
          "bin", "is_en")
          .orderBy(col("bin")),
      Some(isotonicOracleSql)),

    ("j65_sprt",
      // Wald's sequential probability ratio test (TimeSeries.sprt) per
      // A/B arm (user_id % 2) on the daily purchase rate — H0: p = 0.19
      // vs H1: p = 0.21 at alpha = beta = 0.05: the SEQUENTIAL-testing
      // read fixed-horizon tests can't give — the first DAY each arm's
      // evidence crossed a Wald boundary (arm 0 accepts H0, arm 1
      // accepts H1 at sf0.01 — a genuine split; at sf0.001 both emit
      // 'continue' with a null decision day). Exact long cumulative
      // counts x inlined ln coefficients; bounded day-grain windows.
      (s: SparkSession, dir: String) =>
        graft.operators.TimeSeries.sprt(
          Tables.events(s, dir).select(
            (col("user_id") % 2).as("arm"),
            floor(unix_millis(col("ts")) / 86400000L).as("day"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("hit")),
          Seq("arm"), "day", "hit", 0.19, 0.21, 0.05, 0.05)
          .orderBy(col("arm")),
      Some(sprtOracle(0.19, 0.21, 0.05, 0.05))),

    ("s41_stream_labelprop",
      // Streaming COMMUNITY maintenance (Streaming.runStreamLabelProp,
      // top-3 graph, 4 LPA rounds — the r11 verdict's named open seat):
      // click (user, item) observations replayed as three micro-batches,
      // each folding the DISTINCT bipartite store (split-order-invariant)
      // and recomputing the top-K co-occurrence graph + fixed-round LPA
      // into a versioned labels snapshot behind a pointer flip. LPA has
      // no incremental contraction law (unlike s40's CC), so the honest
      // shape is recompute over the CONTRACTED observation store — item-
      // count-sized regardless of stream volume. Final snapshot ≡ the
      // one-shot build; the oracle unrolls that trajectory.
      (s: SparkSession, dir: String) => {
        val base = scratch("s41")
        graft.streaming.Streaming.runStreamLabelProp(s, dir,
            base + "/lp", 3, 4)
          .orderBy(col("size").desc, col("label"))
      },
      Some(streamLabelPropOracle(3, 4))),

    ("x165_isolation_depth",
      // Isolation-depth anomaly score (Maintenance.isolationDepth, 8
      // trees × depth 10, top-50): the density-free outlier read — a
      // point alone in its hashed-axis-sign cell after few splits is
      // anomalous (Liu et al. 2008, deterministic axis-aligned-zero
      // variant). Narrow trees×depth grid explode, one (tree, prefix)
      // cell-count exchange, two id-grain folds; avg depth on the 1/8
      // grid, (avg_depth, vec_id) ordering.
      (s: SparkSession, dir: String) =>
        graft.operators.Maintenance.isolationDepth(
          Tables.embeddings(s, dir), "vec_id", "embedding", "label",
          8, 10, 50),
      Some("""WITH e AS (SELECT vec_id, embedding, label FROM embeddings),
        |tr AS (SELECT unnest(generate_series(0, 7)) AS t),
        |paths AS (SELECT e.vec_id, e.label, tr.t,
        |list_reduce(list_transform(generate_series(0, 9),
        |l -> CASE WHEN embedding[((7*tr.t + 13*l + 3) % len(embedding)) + 1] >= 0
        |THEN '1' ELSE '0' END), (a,b) -> a || b) AS path
        |FROM e, tr),
        |lv AS (SELECT vec_id, label, t, path,
        |unnest(generate_series(1, 10)) AS l FROM paths),
        |pc AS (SELECT t, l, substr(path, 1, l) AS pre, count(*) AS cnt
        |FROM lv GROUP BY 1, 2, 3),
        |iso AS (SELECT lv.vec_id, lv.label, lv.t,
        |coalesce(min(CASE WHEN pc.cnt = 1 THEN lv.l END), 10) AS depth
        |FROM lv JOIN pc ON pc.t = lv.t AND pc.l = lv.l
        |AND pc.pre = substr(lv.path, 1, lv.l)
        |GROUP BY 1, 2, 3)
        |SELECT vec_id, any_value(label) AS label,
        |CAST(min(depth) AS BIGINT) AS min_depth,
        |round(avg(depth), 4) AS avg_depth
        |FROM iso GROUP BY 1
        |ORDER BY avg_depth ASC, vec_id LIMIT 50""".stripMargin
        .replace("\n", " "))),

    ("j66_betweenness",
      // Landmark-sampled betweenness (Graph.landmarkBetweenness, 8
      // landmarks × depth 4, top-40) on the urgent-order co-purchase
      // graph: Brandes' σ/δ accumulation from a hash-ordered BOUNDED
      // landmark set — the brokerage/centrality read the cohesion
      // entries (j39 k-core, j61 LPA) can't give: which parts BRIDGE
      // the co-purchase communities. σ exact longs; δ rounded 6 dp per
      // level (trajectory discipline); estimate scaled n/(2L).
      (s: SparkSession, dir: String) => {
        val li = Tables.lineitem(s, dir)
          .join(Tables.orders(s, dir)
            .where(col("o_orderpriority") === "1-URGENT")
            .select(col("o_orderkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("l_orderkey"), col("l_partkey"))
        val pairs = li.as("a").join(li.as("b"),
            col("a.l_orderkey") === col("b.l_orderkey") &&
              col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
        graft.operators.Graph.landmarkBetweenness(pairs, "pa", "pb", 8, 4, 40)
          .select(col("vertex").cast("long").as("vertex"), col("bc_est"))
          .orderBy(col("bc_est").desc, col("vertex"))
      },
      Some(betweennessOracle(8, 4, 40))),

    ("x166_curation_pipeline",
      // End-to-end curation composition (operators/Curation
      // .curationPipeline — the r12 verdict's named integration seat):
      // near-dup clusters → longest-member survivor → ≥20-token quality
      // gate → train/val split hashed at CLUSTER grain (near-dups can
      // never straddle the split — the contamination leak a doc-grain
      // split commits) → token-budget shard packing (4 hash buckets ×
      // 1000-token offset packing). One chained-CTE oracle replays every
      // stage.
      (s: SparkSession, dir: String) =>
        graft.operators.Curation.curationPipeline(
          Tables.documents(s, dir), "doc_id", "text", 3, 0.8, 20, 200, 4,
          1000L)
          .orderBy(col("doc_id")),
      Some(curationOracleSql)),

    ("x167_graph_ann",
      // Graph-ANN recall frontier (Similarity.graphAnnFrontier — the r12
      // verdict's named graph-baseline seat): greedy beam search over the
      // top-6 IVF-built kNN graph from the corpus-min entry vertex,
      // 6 hops, beams 2/4/8, graded against exact top-10 over 12
      // hash-ordered queries. One row per beam budget —
      // recall-vs-touched-nodes, directly comparable to x147's
      // recall-vs-scan-fraction IVF frontier; search cost O(hops·B·M)
      // point lookups, corpus-size-independent like x7's pruned probe.
      (s: SparkSession, dir: String) =>
        Similarity.graphAnnFrontier(Tables.embeddings(s, dir), "vec_id",
          "embedding", 6, Seq(2, 4, 8), 6, 10, 12, 16, 4)
          .orderBy(col("beam")),
      Some(graphAnnOracleSql(6, Seq(2, 4, 8), 6, 10, 12, 16, 4)))
  )

  def queries: Map[String, Q] =
    entries.map { case (n, q, _) => n -> q }.toMap

  def oracleSql: Map[String, String] =
    entries.flatMap { case (n, _, sql) => sql.map(n -> _) }.toMap
}
