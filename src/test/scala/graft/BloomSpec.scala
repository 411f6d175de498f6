package graft

import org.apache.spark.sql.functions._
import graft.functions.Bloom
import graft.operators.Dedup

/** The Bloom filter's load-bearing properties: membership is NEVER a
  * false negative (that is what makes it a lossless pre-filter), the
  * false-positive rate is bounded, and the bloom-prefiltered
  * decontamination path is row-identical to the exact broadcast path. */
class BloomSpec extends SparkSpec {

  private val M = 1 << 12 // small bitset so false positives are plausible
  private val K = 4

  test("no false negatives: every inserted value tests positive") {
    import spark.implicits._
    // Adversarial-ish domain: near-identical strings, empties of content.
    val values = ((1 to 500).map(i => s"gram $i tail") ++
      Seq("a", " ", "0", "gram 1 tail ")).distinct
    val df = values.toDF("v").repartition(7) // build across partitions
    val bits = Bloom.build(df, "v", M, K)
    val bitsLit = Bloom.bitsLiteral(bits)
    val misses = values.toDF("v")
      .filter(!Bloom.mightContain(bitsLit, M, K, col("v")))
      .count()
    assert(misses === 0L, "a Bloom filter must never reject a member")
  }

  test("false-positive rate stays near theory, build is partitioning-independent") {
    import spark.implicits._
    val members = (1 to 500).map(i => s"member $i")
    val bits = Bloom.build(members.toDF("v"), "v", M, K)
    // Same values, different partitioning → identical bitset (bit_or is
    // commutative/associative; the hash family is deterministic).
    val bits2 = Bloom.build(members.toDF("v").repartition(13), "v", M, K)
    assert(bits.toSeq === bits2.toSeq)
    val bitsLit = Bloom.bitsLiteral(bits)
    val nonMembers = (1 to 2000).map(i => s"other $i")
    val fp = nonMembers.toDF("v")
      .filter(Bloom.mightContain(bitsLit, M, K, col("v"))).count()
    // Theoretical fp ≈ (1 - e^(-kn/m))^k ≈ 2.4% at n=500, m=4096, k=4;
    // accept up to 4x that — the point is "bounded", not the constant.
    assert(fp < 200, s"false-positive rate implausibly high: $fp / 2000")
  }

  test("native BloomCandidates === SQL mightContain filter; padEmpty contract") {
    import spark.implicits._
    import graft.functions.BloomCandidates
    val members = (1 to 300).map(i => s"member $i")
    val bits = Bloom.build(members.toDF("v"), "v", M, K)
    val bitsLit = Bloom.bitsLiteral(bits)
    // Mixed member/non-member gram arrays, including empty and
    // all-non-member arrays, exercised through a real plan (codegen path).
    val arrays = Seq(
      (1L, Seq("member 1", "other x", "member 299")),
      (2L, Seq("other a", "other b")),
      (3L, Seq.empty[String]),
      (4L, members.take(50)))
    val df = arrays.toDF("id", "grams").repartition(3)
    val viaSql = df.select(col("id"),
      filter(col("grams"), g => Bloom.mightContain(bitsLit, M, K, g)).as("c"))
    val viaNative = df.select(col("id"),
      BloomCandidates(col("grams"), bits, M, K, padEmpty = false).as("c"))
    assertSameRows(viaSql, viaNative) // hash parity, element for element
    // padEmpty: [] for an empty input (a plain explode DROPS the row),
    // [null] sentinel when no candidates (the row SURVIVES the explode).
    val padded = df.select(col("id"),
      explode(BloomCandidates(col("grams"), bits, M, K, padEmpty = true))
        .as("g"))
    val perId = padded.groupBy("id")
      .agg(count(lit(1)).as("n"), count(col("g")).as("nonNull"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!perId.contains(3L), "empty grams must vanish under explode")
    assert(perId(2L)._1 === 1L && perId(2L)._2 === 0L,
      "zero-candidate doc must survive as one null-gram sentinel row")
    assert(perId(4L)._2 >= 50L - 0L) // all members are candidates
  }

  test("bloomDecontaminate is row-identical to the exact broadcast path") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.filter(col("source") === "src0")
    val corpus = docs.filter(col("source") =!= "src0")
    val exact = Dedup.decontaminate(corpus, bench, "doc_id", "text", 3)
    // A deliberately tiny bitset (heavy false positives) must STILL be
    // exact — false positives are verified away, negatives can't happen.
    val viaBloomTiny = Dedup.bloomDecontaminate(corpus, bench, "doc_id",
      "text", 3, mBits = 256, kHashes = 2)
    assertSameRows(exact, viaBloomTiny)
    val viaBloom = Dedup.bloomDecontaminate(corpus, bench, "doc_id", "text", 3)
    assertSameRows(exact, viaBloom)
  }
}
