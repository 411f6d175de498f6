package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

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
    */
  def ivfTopK(embeddings: DataFrame, idCol: String, vecCol: String,
              queryId: Long, k: Int, nCentroids: Int, nProbe: Int): DataFrame = {
    val cents = embeddings.orderBy(col(idCol).asc).limit(nCentroids)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cv"))
    // Assignment: nearest centroid per vector (broadcast centroids; the
    // argmax is a per-row array computation, no shuffle).
    val assigned = embeddings.crossJoin(broadcast(cents))
      .withColumn("_d", cosine(col(vecCol), col("_cv")))
      .withColumn("_rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(idCol)).orderBy(col("_d").desc, col("_cid").asc)))
      .filter(col("_rn") === 1)
      .select(col(idCol), col(vecCol), col("_cid"))
    // Probe set: the nProbe centroids closest to the query vector.
    val q = embeddings.filter(col(idCol) === queryId)
      .select(col(vecCol).as("_qv"))
    val probed = cents.crossJoin(broadcast(q))
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
}
