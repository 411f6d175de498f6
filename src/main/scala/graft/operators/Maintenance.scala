package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Table-maintenance operators. A 100 TB lake accretes small files — every
  * streaming micro-batch and every incremental ingest lands a few per
  * partition, and scan cost degrades with file COUNT (task scheduling,
  * footer reads, row-group fragmentation) long before it degrades with
  * bytes. Compaction is the maintenance pass that rewrites each partition
  * directory down to its target file count. */
object Maintenance {

  /** Rewrite a partitioned parquet table so each leaf partition holds
    * `filesPerPartition` files (default 1). The rewrite goes through the
    * same `repartition(partitionCols)` discipline as every partitioned
    * write here (CLAUDE.md: without it each task fans a file into every
    * leaf dir), with an extra file-count salt when >1 file per leaf is
    * wanted.
    *
    * Swap is write-to-temp + rename: the brief window between delete and
    * rename is acceptable for a MAINTENANCE pass that never changes data
    * (a reader retries; contrast the upsert sink, whose per-partition
    * epoch markers exist because its swaps change state). Scale shape:
    * one shuffle on the partition key; each leaf is written by the tasks
    * that own its key — no global sort, no driver data. */
  def compactPartitioned(spark: SparkSession, path: String,
                         partitionCols: Seq[String],
                         filesPerPartition: Int = 1): Unit = {
    require(filesPerPartition > 0, "need at least one file per partition")
    val df = spark.read.parquet(path)
    val shuffleCols =
      if (filesPerPartition == 1) partitionCols.map(col)
      else partitionCols.map(col) :+
        (abs(hash(df.columns.map(col): _*)) % filesPerPartition)
    val tmp = new Path(path + ".compacting")
    val dst = new Path(path)
    val fs = FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)
    fs.delete(tmp, true)
    df.repartition(shuffleCols: _*)
      .write.partitionBy(partitionCols: _*)
      .mode("overwrite").parquet(tmp.toString)
    val old = new Path(path + ".old")
    fs.delete(old, true)
    require(fs.rename(dst, old), s"compact: could not stage out $dst")
    require(fs.rename(tmp, dst), s"compact: could not swap in $tmp")
    fs.delete(old, true)
  }
}
