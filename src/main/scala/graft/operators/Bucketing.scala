package graft.operators

import org.apache.spark.sql.DataFrame

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
}
