package graft

import org.apache.spark.sql.functions._
import graft.operators.Curation

/** The end-to-end curation composition (r12 verdict ask #6): the stage
  * interactions — cluster-grain split, survivor-then-gate ordering,
  * offset packing — on a hand-computable corpus.
  */
class CurationSpec extends SparkSpec {

  private def words(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("curationPipeline: dup collapses to longest survivor, short docs gate out, packing follows the hash order with offset shards") {
    import spark.implicits._
    // doc 0/1: identical 30-token texts → one cluster, min-id tie-break
    // keeps doc 0 (equal length). doc 2: 10 tokens → gated (< 20).
    // docs 3/4/5: distinct vocabularies (no LSH collision), 25/40/50
    // tokens. valPermille=0 → all train; one bucket → one running sum.
    val t30 = words("alpha", 30)
    val docs = Seq(
      (0L, t30), (1L, t30), (2L, words("beta", 10)),
      (3L, words("gamma", 25)), (4L, words("delta", 40)),
      (5L, words("eps", 50)))
      .toDF("doc_id", "text")
    val out = Curation.curationPipeline(docs, "doc_id", "text", 3, 0.8,
        20, 0, 1, 60L)
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3),
        r.getInt(4), r.getLong(5)))
    // Scatter h(id) = id·2135 mod 9973 for small ids: 0→0, 5→702,
    // 3→6405, 4→8540 — the pack order. Preceding token sums over that
    // order: 0, 30, 80, 105 → shards 0, 0, 1, 1 at budget 60.
    assert(out.toSeq === Seq(
      (0L, 0L, 30, "train", 0, 0L),
      (3L, 3L, 25, "train", 0, 1L),
      (4L, 4L, 40, "train", 0, 1L),
      (5L, 5L, 50, "train", 0, 0L)))
  }

  test("curationPipeline: the split hashes the CLUSTER id — near-duplicates can never straddle train/val") {
    import spark.implicits._
    // 40 clusters of 2 identical docs each (ids 2k, 2k+1 share text) →
    // survivors alone decide the split, and BOTH members of a pair get
    // the same split label before the survivor cut. valPermille=500
    // splits the clusters roughly in half.
    val docs = (0L until 80L).map { id =>
      (id, words(s"tok${id / 2}x", 30))
    }.toDF("doc_id", "text")
    val full = Curation.curationPipeline(docs, "doc_id", "text", 3, 0.8,
      20, 500, 2, 1000L)
    // Survivors: exactly one per cluster (the even id), 40 rows.
    val rows = full.collect()
    assert(rows.length === 40)
    assert(rows.forall(r => r.getLong(0) % 2 === 0L))
    // Both split labels actually occur at this permille.
    val splits = rows.map(_.getString(3)).toSet
    assert(splits === Set("train", "val"))
    // The survivor's split is a pure function of cluster_id — recompute
    // the residue-permuted hash and check every row.
    rows.foreach { r =>
      val h = ((r.getLong(1) % 9973L) * 2654435761L) % 9973L
      val expect = if (h % 1000L < 500L) "val" else "train"
      assert(r.getString(3) === expect, s"doc ${r.getLong(0)}")
    }
  }
}
