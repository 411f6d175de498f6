package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only scale-up generator for the growth-ladder benches (r11 verdict
  * ask #6): no sf1.0 testdata exists, so this derives an N× corpus from
  * sf0.1 with the STRUCTURE the heavy families are sensitive to held
  * fixed per replica:
  *
  *  - documents: replica r > 0 suffixes every token with `_r`, so the
  *    shingle/token space is DISJOINT across replicas — zero
  *    cross-replica candidate pairs, and the within-replica dup/near-dup
  *    structure is exactly isomorphic to the source. Pair counts, LSH
  *    bucket sizes, and cluster layouts therefore scale exactly N×
  *    (linear), which is what a documented-linear operator must track.
  *  - embeddings: replica r applies a deterministic per-(r, dim)
  *    coordinate reflection (an isometry — within-replica distances
  *    exact, cross-replica sign patterns decorrelated).
  *  - events (r12 verdict ask #5, the streaming-ladder input): replica r
  *    offsets event_id AND user_id, keeping ts/event_type/value/props —
  *    N× parallel user populations with identical per-user behavior, so
  *    distinct (user, item) observation stores scale exactly N× while
  *    the (type, day) and item dictionaries stay FIXED: exactly the
  *    contrast the contracted-state streaming claims are about
  *    (store-sized vs stream-volume-sized per-batch cost).
  *
  * Ids offset by r·10^9. Test scope — not part of the driver contract;
  * writes ONLY under the destination dir given on the command line. */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleGen <srcDir> <destDir> <factor>")
    val Array(src, dest, factorS) = args
    val factor = factorS.toInt
    require(factor >= 1 && factor <= 100)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = explode(sequence(lit(0), lit(factor - 1))).as("_r")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    docs.select(col("*"), reps)
      .select(
        (col("doc_id") + col("_r") * lit(1000000000L)).as("doc_id"),
        when(col("_r") === 0, col("text"))
          .otherwise(array_join(
            transform(
              filter(split(col("text"), "\\s+"), t => length(t) > 0),
              t => concat(t, lit("_"), col("_r"))), " ")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dest/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    emb.select(col("*"), reps)
      .select(
        (col("vec_id") + col("_r") * lit(1000000000L)).as("vec_id"),
        transform(col("embedding"), (v, i) =>
          when(col("_r") =!= 0 && pmod(hash(col("_r"), i), lit(2)) === 1,
            -v).otherwise(v)).as("embedding"),
        col("label"))
      .repartition(16)
      .write.mode("overwrite").parquet(s"$dest/embeddings.parquet")

    val ev = spark.read.parquet(s"$src/events.parquet")
    ev.select(col("*"), reps)
      .select(
        (col("event_id") + col("_r") * lit(1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + col("_r") * lit(1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dest/events.parquet")

    println(s"[scalegen] wrote ${factor}x of $src to $dest")
    spark.stop()
  }
}
