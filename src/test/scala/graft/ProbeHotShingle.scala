package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only skew probe for the direct-AllPairs candidate join (r13 verdict
  * ask #2): a synthetic corpus where ONE shingle appears in every doc — the
  * stopword-like hot key the oracle SFs never exercise (max df 25 at
  * sf0.1). Times ngramJaccardPairs' low-threshold path with the salted
  * hot-shingle guard ON (default caps) vs OFF (cap = 2^62) at two corpus
  * scales, and prints the pair counts (which must be equal — the guard is
  * exactness-preserving, spec-pinned in DedupSpec). The hot key yields k²
  * candidate rows; unsalted they land in ONE join task, salted they
  * spread over SPARK_GRAFT_ALLPAIRS_SALTS tasks (guide §2.5: a single
  * enormous key is the case AQE's skew split cannot divide). Test scope. */
object ProbeHotShingle {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(2000, 4000)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // Warmup: codegen + parquet/broadcast machinery, never measured.
    operators.Dedup.ngramJaccardPairs(
      (1 to 50).map(i => (i.toLong, s"hot common gram w$i a$i b$i c$i"))
        .toDF("doc_id", "text"), "doc_id", "text", 3, 0.05)
      .write.format("noop").mode("overwrite").save()
    sizes.foreach { k =>
      // Every doc: the shared hot 3-gram plus a unique 4-token tail.
      val docs = (1 to k).map(i =>
        (i.toLong, s"hot common gram u${i}a u${i}b u${i}c u${i}d"))
        .toDF("doc_id", "text")
        .repartition(32)
        .localCheckpoint(eager = true)
      Seq(("plain", (1L << 62).toString), ("salted", "256")).foreach {
        case (label, cap) =>
          spark.conf.set("spark.graft.allpairs.hotDf", cap)
          val walls = (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            operators.Dedup.ngramJaccardPairs(
              docs, "doc_id", "text", 3, 0.05)
              .write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }
          val n = operators.Dedup.ngramJaccardPairs(
            docs, "doc_id", "text", 3, 0.05).count()
          println(f"[hotshingle] k=$k%5d $label%-6s wall ${walls.min}%7.2f s  pairs $n%d")
          spark.conf.unset("spark.graft.allpairs.hotDf")
      }
    }
    spark.stop()
  }
}
