package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Deterministic Bloom filter over the engine-portable md5 hash family
  * ([[graft.operators.Dedup.shingleHash]], seeded per probe) — the
  * membership structure for set-filter pushdown when the set outgrows a
  * literal `isin` or a per-row broadcast join is the dominant cost.
  *
  * Unlike Spark's built-in `BloomFilterAggregate` (whose bit layout no
  * oracle engine reproduces), every hash here is the same md5-prefix
  * arithmetic the rest of the engine uses, so the structure is
  * deterministic across engines and runs: the same inputs always build
  * the same bitset. Exactness is recovered downstream — a Bloom filter
  * never produces FALSE NEGATIVES, so `mightContain` is a lossless
  * pre-filter in front of an exact verify join.
  *
  * Scale shape: `build` aggregates bit positions into at most mBits/64
  * packed words (ONE map-side-combined shuffle of word ids, never the
  * value set) and collects bounded metadata — the default 2^16 bits are
  * 1 KiB·8 = 8 KiB on the driver. `mightContain` is a pure codegen'd
  * column expression against the literal word array: no join, no
  * shuffle, usable inside array higher-order lambdas. */
object Bloom {

  /** The k deterministic bit positions of a value: md5-family hashes,
    * independently seeded by probe index, modulo mBits. */
  private def positions(value: Column, mBits: Int, kHashes: Int): Seq[Column] =
    (0 until kHashes).map { i =>
      pmod(Dedup.shingleHash(concat(lit(s"bf$i:"), value)), lit(mBits.toLong))
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
