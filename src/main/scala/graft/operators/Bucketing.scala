package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed (co-located) joins — the storage-level answer to repeated
  * fact-fact joins at 100 TB: both sides persisted bucketed (and
  * bucket-sorted) on the join key, so the join needs NO Exchange and no
  * sort at query time; every executor joins bucket i against bucket i
  * locally. This is the pre-partitioning/bucketing strategy SURVEY §4.2
  * calls out; the Exchange-free plan is spec-pinned in JoinOpsSpec.
  *
  * The bucket function is Spark's Murmur3 `pmod(hash(key), n)` — the same
  * partitioning `repartition(n, key)` produces, so the pre-shuffle below
  * aligns tasks with buckets and each bucket gets exactly one file (no
  * small-file fan-out at write time either).
  */
object Bucketing {

  /** Persist `df` as a bucketed, bucket-sorted parquet table registered in
    * the session catalog (bucket metadata lives there — a plain
    * `spark.read.parquet` would not know the layout). Returns the table. */
  def bucketTable(df: DataFrame, name: String, key: String, nBuckets: Int,
                  path: String): DataFrame = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $name")
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .option("path", path).mode("overwrite")
      .format("parquet").saveAsTable(name)
    spark.table(name)
  }

  /** SALTED equi-join — the manual answer to a pathologically hot join key
    * when AQE's skew-join split isn't available or isn't enough (a single
    * key holding >> one task's worth of rows): the big side adds a salt in
    * [0, nSalts) derived from the WHOLE row (rows sharing the hot key
    * spread across nSalts sub-keys), the small side replicates nSalts×,
    * and the join runs on (key, salt) — so the hot key's rows land on
    * nSalts tasks instead of one. Result is EXACTLY the plain equi-join
    * (spec-pinned): the salt only refines the partitioning, never the
    * match set.
    *
    * Cost model: small side shuffles/broadcasts nSalts× its size — use
    * single-digit salts for mild skew, and prefer AQE
    * (`spark.sql.adaptive.skewJoin`) when the runtime split suffices. */
  def saltedEquiJoin(big: DataFrame, small: DataFrame,
                     bigKey: String, smallKey: String, nSalts: Int): DataFrame = {
    require(nSalts > 0, "need at least one salt")
    val salted = big.withColumn("_salt",
      pmod(hash(big.columns.map(col): _*), lit(nSalts)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }
}
