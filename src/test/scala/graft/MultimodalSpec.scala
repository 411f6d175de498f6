package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, String)*) = {
    import spark.implicits._
    Multimodal.mediaFromDocuments(rows.toSeq.toDF("doc_id", "text"))
  }

  test("frame sampling: stride, count, and tail-frame truncation") {
    val df = media(
      (1L, "x" * 20),   // shorter than one frame -> 1 frame, truncated
      (2L, "y" * 64),   // exactly one frame
      (3L, "z" * 300))  // 300 div 64 = 4 frames, stride 75
      .transform(Multimodal.sampleFrames(_, 4, 64))
    val out = df.orderBy("media_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1L, 0, 0L, 20L),
      (2L, 0, 0L, 64L),
      (3L, 0, 0L, 64L), (3L, 1, 75L, 64L), (3L, 2, 150L, 64L), (3L, 3, 225L, 64L)))
  }

  test("frame hash matches the payload slice") {
    val df = media((7L, "a" * 10)).transform(Multimodal.sampleFrames(_, 4, 64))
    val r = df.collect()(0)
    val expected = java.security.MessageDigest.getInstance("MD5")
      .digest(("a" * 10).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r.getAs[String]("frame_hash") === expected)
  }

  test("CDC chunks partition the payload exactly; short payloads are one chunk") {
    val text = (1 to 60).map(i => s"word$i piece").mkString(" ") // ~700 chars
    val out = media((1L, text), (2L, "tiny"))
      .transform(Multimodal.contentDefinedChunks(_, 8, "0"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (id, rows) =>
        id -> rows.sortBy(_.getInt(1))
          .map(r => (r.getLong(2), r.getLong(3), r.getString(4)))
      }
    // Partition invariant: offsets contiguous from 1, lengths cover the text.
    val chunks = out(1L)
    assert(chunks.head._1 === 1L)
    chunks.sliding(2).foreach {
      case Array((o1, l1, _), (o2, _, _)) => assert(o2 === o1 + l1)
      case _ =>
    }
    assert(chunks.map(_._2).sum === text.length.toLong)
    // Reassembly: each chunk hash is the md5 of the corresponding slice.
    chunks.foreach { case (off, len, h) =>
      val slice = text.substring(off.toInt - 1, off.toInt - 1 + len.toInt)
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(h === md)
    }
    assert(chunks.length > 1) // the boundary predicate actually fired
    // A payload shorter than the window is a single whole-payload chunk.
    assert(out(2L) === Array((1L, 4L,
      java.security.MessageDigest.getInstance("MD5")
        .digest("tiny".getBytes("UTF-8")).map("%02x".format(_)).mkString)))
  }

  test("CDC chunking is shift-robust where fixed-stride framing is not") {
    val shared = (1 to 80).map(i => s"tok$i unit").mkString(" ") // ~900 chars
    val a = media((1L, shared), (2L, "PREFIX-SHIFTS-EVERYTHING " + shared))
    val cdc = a.transform(Multimodal.contentDefinedChunks(_, 8, "0"))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(4)).toSet }
    // Interior chunks of the shared span re-align within one expected
    // chunk length of the edit: the overwhelming majority of doc 1's
    // chunks reappear verbatim in doc 2.
    val overlap = (cdc(1L) & cdc(2L)).size.toDouble / cdc(1L).size
    assert(overlap > 0.8, s"CDC overlap $overlap")
    // Fixed-stride frames at the same payloads share nothing: every
    // sampled window is offset by the prefix.
    val frames = a.transform(Multimodal.sampleFrames(_, 4, 64))
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getString(4)).toSet }
    assert((frames(1L) & frames(2L)).isEmpty)
  }

  test("chunkNearDupPairs: shifted twin pairs up; unrelated payload pairs with nothing; boilerplate cap silences a flood") {
    val shared = (1 to 80).map(i => s"tok$i unit").mkString(" ")
    val df = media(
      (1L, shared),
      (2L, "PREFIX-SHIFTS-EVERYTHING " + shared), // near-dup of 1
      (3L, (1 to 80).map(i => s"other$i thing").mkString(" ")))
    val pairs = Multimodal.chunkNearDupPairs(df, 8, "0", 20, 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
    // With the cap at 1, every shared chunk is "boilerplate" → no pairs.
    assert(Multimodal.chunkNearDupPairs(df, 8, "0", 1, 1L).count() === 0L)
  }

  test("AHashBits: native expression is exactly the HOF fold; NULL below 64 code points") {
    import spark.implicits._
    // Mixed payloads: 1-cp windows (64 chars), wide windows (300 chars),
    // a repeated-block pattern, a non-ASCII probe (multi-byte + BMP code
    // points — ascii()/ord() parity is the risky seam), and a too-short
    // payload that must be NULL on both sides.
    val texts = Seq(
      "a" * 32 + "b" * 32,
      "a" * 31 + "b" * 33,
      (1 to 60).map(i => s"word$i piece").mkString(" "),
      ("é" * 40 + "ß" * 20 + "日本語テキスト" * 8),
      "x" * 63,
      "short")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "payload")
      .select(col("id"),
        graft.functions.AHashBits(col("payload")).as("native"),
        operators.Multimodal.aHashBitsFold(col("payload")).as("fold"))
      .orderBy(col("id"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(1) === r.isNullAt(2), s"nullability diverged: $r")
      if (!r.isNullAt(1))
        assert(r.getSeq[Int](1) === r.getSeq[Int](2), s"bits diverged: $r")
    }
    assert(df.count(_.isNullAt(1)) === 2) // the 63-char and 5-char payloads
  }

  test("GR8 decode: header round-trip, length validation, non-GR8 stays unimplemented") {
    val px = Array.tabulate(6 * 4)(i => i.toByte)
    val payload = Array[Byte]('G', 'R', '8', 0, 6, 0, 4) ++ px
    val img = Multimodal.decodeStub(payload)
    assert((img.w, img.h) === ((6, 4)))
    assert(img.pixels.toSeq === px.toSeq)
    intercept[IllegalArgumentException] { // truncated body fails loudly
      Multimodal.decodeRawGray(payload.dropRight(1))
    }
    intercept[NotImplementedError] { // a real codec is still a stub
      Multimodal.decodeStub("JFIFnotraw".getBytes("UTF-8"))
    }
  }

  test("aHashBitsOnBlocks: hand-computed block grid; diverges from the byte-window path on 2-D structure") {
    import spark.implicits._
    // Hand case: 8x8 image (1-px blocks), top half 200, bottom half 10 —
    // global mean 105, top 32 blocks fire, bottom 32 don't.
    val halves = Multimodal.GrayImage(8, 8,
      Array.fill(32)(200.toByte) ++ Array.fill(32)(10.toByte))
    assert(Multimodal.aHashBitsOnBlocks(halves) ===
      Some(Seq.fill(32)(1) ++ Seq.fill(32)(0)))
    // Sub-grid image has no 8x8 block structure.
    assert(Multimodal.aHashBitsOnBlocks(
      Multimodal.GrayImage(7, 8, Array.fill(56)(1.toByte))) === None)
    // DIVERGENCE pin (the reason the image path is not just the byte
    // path): a 16x16 row-mirrored stripe image — even rows bright-left
    // ('a'*8 + '!'*8), odd rows bright-right. Every SPATIAL 2x2 block
    // holds 2 bright + 2 dark pixels, so every block mean EQUALS the
    // global mean and the strict compare gives all-zero bits; the byte-
    // stream path's 64 consecutive 4-byte windows each sit inside one
    // half-row, so exactly half of them fire. ASCII pixels keep the
    // payload valid UTF-8, so byte == code point for AHashBits.
    val bright = "a"; val dark = "!"
    val evenRow = bright * 8 + dark * 8
    val oddRow = dark * 8 + bright * 8
    val rows = (0 until 16).map(r => if (r % 2 == 0) evenRow else oddRow)
    val streamed = rows.mkString
    val img = Multimodal.GrayImage(16, 16, streamed.getBytes("UTF-8"))
    val blockBits = Multimodal.aHashBitsOnBlocks(img).get
    assert(blockBits === Seq.fill(64)(0))
    val windowBits = Seq((1L, streamed)).toDF("id", "payload")
      .select(graft.functions.AHashBits(col("payload")).as("bits"))
      .head.getSeq[Int](0)
    assert(windowBits.count(_ == 1) === 32)
    assert(blockBits !== windowBits)
  }

  test("perceptualHashPairs: window-mean bits pair near-identical payloads; far payloads verify out; short drop") {
    // 64-char payloads, window width 1. Docs 1-3 share the a*32/b*32 bit
    // pattern (doc 3's trailing 'c' stays above the mean → same bits);
    // doc 5 flips exactly window 31 → Hamming 1; doc 4 (all 'a', bits all
    // 0) shares zero-bands with doc 1 as a CANDIDATE but verifies out at
    // Hamming 32; doc 6 is under 64 chars and never appears.
    val df = media(
      1L -> ("a" * 32 + "b" * 32), 2L -> ("a" * 32 + "b" * 32),
      3L -> ("a" * 32 + "b" * 31 + "c"), 4L -> ("a" * 64),
      5L -> ("a" * 31 + "b" * 33), 6L -> "short")
    val out = Multimodal.perceptualHashPairs(df, 8, 7)
      .orderBy(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 0L), (1L, 3L, 0L), (1L, 5L, 1L),
      (2L, 3L, 0L), (2L, 5L, 1L), (3L, 5L, 1L)))
  }
}
