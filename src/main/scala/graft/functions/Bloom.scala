package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic Bloom filter over per-probe-seeded xxhash64 — the
  * membership structure for set-filter pushdown when the set outgrows a
  * literal `isin` or a per-row broadcast join is the dominant cost.
  *
  * Unlike Spark's built-in `BloomFilterAggregate` (an opaque aggregate
  * with driver-side sizing), the bitset here is a pure function of the
  * value set: the same inputs always build the same bits, across runs
  * and partitionings. Engine portability is NOT required of the hash —
  * exactness is recovered downstream, because a Bloom filter never
  * produces FALSE NEGATIVES, so `mightContain` is a lossless pre-filter
  * in front of an exact verify join whose oracle is bloom-free.
  *
  * Scale shape: `build` aggregates bit positions into at most mBits/64
  * packed words (ONE map-side-combined shuffle of word ids, never the
  * value set) and collects bounded metadata — the default 2^16 bits are
  * 1 KiB·8 = 8 KiB on the driver. `mightContain` is a pure codegen'd
  * column expression against the literal word array: no join, no
  * shuffle, usable inside array higher-order lambdas. */
object Bloom {

  /** The k deterministic bit positions of a value: xxhash64, independently
    * seeded by probe index, modulo mBits. Unlike the dedup-family md5
    * hashes, Bloom positions need NO engine portability — the filter is a
    * PREFILTER ahead of an exact verify, so the false-positive set never
    * reaches a result; what matters is that build and probe use the same
    * function. xxhash64 is a native codegen'd expression, an order of
    * magnitude cheaper than the md5+conv family inside the per-gram
    * higher-order probe loop (measured 10.2 s → 2.6 s on x43 at sf0.1). */
  private def positions(value: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map { i =>
      pmod(xxhash64(lit(i), value), lit(mBits.toLong))
    }

  /** Build the packed bitset from a DataFrame column of values.
    * Driver-side result is bounded metadata: mBits/64 longs, independent
    * of the input cardinality. */
  def build(df: DataFrame, valueCol: String, mBits: Int, kHashes: Int): Array[Long] = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(kHashes > 0, "kHashes must be positive")
    val words = df
      .select(explode(array(positions(col(valueCol), mBits, kHashes): _*)).as("_p"))
      .select(floor(col("_p") / 64).cast("int").as("_w"),
        call_function("shiftleft", lit(1L), (col("_p") % 64).cast("int")).as("_m"))
      .groupBy(col("_w"))
      .agg(expr("bit_or(_m)").as("_bits"))
      .collect() // bounded metadata: at most mBits/64 rows
    val bits = new Array[Long](mBits / 64)
    words.foreach(r => bits(r.getInt(0)) = r.getLong(1))
    bits
  }

  /** Literal column form of a built bitset (pass to [[mightContain]]). */
  def bitsLiteral(bits: Array[Long]): Column = typedLit(bits.toSeq)

  /** Membership test against the literal bitset — true for every value
    * that was inserted (no false negatives), and for a bounded share of
    * others. Pure built-in expressions: safe inside higher-order lambdas
    * and fully codegen'd. */
  def mightContain(bitsLit: Column, mBits: Int, kHashes: Int, value: Column): Column =
    positions(value, mBits, kHashes).map { p =>
      call_function("shiftrightunsigned",
        element_at(bitsLit, floor(p / 64).cast("int") + 1),
        (p % 64).cast("int")).bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
}
