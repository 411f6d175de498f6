package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for the training-data pipeline: media payloads
  * travel as opaque `binary` columns with a typed metadata struct; decode /
  * feature-extraction runs per-row, embarrassingly parallel, with the bytes
  * never leaving the executor.
  *
  * The actual codec step (image/audio/video decode) is NOT implementable in
  * this container (no codec libraries) — [[decodeStub]] marks it; the
  * pipeline around it (schema, batching, partition behavior, feature
  * arithmetic on the raw bytes) is real and oracle-checked. In production
  * the stub body is the only thing that changes.
  */
object Multimodal {

  /** The media-table schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = false),
      StructField("n_bytes", LongType, nullable = false))), nullable = false)))

  /** A decoded single-channel image: `pixels` row-major, one byte per
    * pixel (0 = black). The minimal carrier the block-grid aHash needs. */
  final case class GrayImage(w: Int, h: Int, pixels: Array[Byte])

  /** The one deterministic format the stub CAN decode (r10 ask #7): a
    * trivial raw-grayscale container — magic `GR8`, big-endian u16 width
    * and height, then exactly w·h gray bytes. Enough codec surface to
    * exercise the real image path (header parse, dimension-dependent
    * layout, length validation) without any library. */
  def decodeRawGray(bytes: Array[Byte]): GrayImage = {
    require(bytes.length >= 7 &&
      bytes(0) == 'G'.toByte && bytes(1) == 'R'.toByte &&
      bytes(2) == '8'.toByte, "not a GR8 payload")
    val w = ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff)
    val h = ((bytes(5) & 0xff) << 8) | (bytes(6) & 0xff)
    require(bytes.length == 7 + w * h,
      s"GR8 payload: header says ${w}x$h (${7 + w * h} bytes) but got ${bytes.length}")
    GrayImage(w, h, java.util.Arrays.copyOfRange(bytes, 7, bytes.length))
  }

  /** Real decoder entry point. Production codecs (JPEG/PNG/audio/video)
    * are not available in this build environment, so anything but the
    * synthetic [[decodeRawGray]] format still throws; the rest of the
    * pipeline is agnostic to what lands here. */
  def decodeStub(bytes: Array[Byte]): GrayImage =
    if (bytes.length >= 3 && bytes(0) == 'G'.toByte &&
        bytes(1) == 'R'.toByte && bytes(2) == '8'.toByte)
      decodeRawGray(bytes)
    else throw new NotImplementedError(
      "media codec not available in this environment; use fake features")

  /** The IMAGE-path aHash [[perceptualHashPairs]]' scaladoc promises: 64
    * bits over the 8×8 BLOCK GRID of a decoded image — bit b set iff
    * block b's mean luma exceeds the global mean — versus the byte-stream
    * path's 64 consecutive windows over the row-major payload. Blocks are
    * SPATIAL (a block spans h/8 rows × w/8 columns), so the two paths
    * genuinely diverge on 2-D structure (spec-pinned: a row-mirrored
    * stripe image is all-zero under blocks but half-ones under windows).
    * Same integer discipline as [[graft.functions.AHashBits]]: the
    * compare is the cross-product `blockSum·N > total·blockPixels` — no
    * division, no floats. Size bound: the cross-products stay inside a
    * signed 64-bit long only while 255·(h·w)·(h·w)/64 < 2^63, i.e.
    * pixels ≲ 4.8e10 (~219k × 219k) — far above the 2 GB payload bound's
    * worst case only for near-square images; a pathological 1×N strip at
    * the payload limit could wrap, so callers feeding decoded frames
    * beyond ~10^10 pixels must downsample first (real aHash resizes to
    * 8×8 anyway). Only the top-left 8·(w/8) × 8·(h/8) region
    * participates (the floor-crop analog of aHash's resize step);
    * images under 8×8 have no grid and return null. */
  def aHashBitsOnBlocks(img: GrayImage): Option[Seq[Int]] = {
    val bw = img.w / 8
    val bh = img.h / 8
    if (bw == 0 || bh == 0) None
    else {
      val sums = Array.ofDim[Long](64)
      var total = 0L
      var r = 0
      while (r < 8 * bh) {
        var c = 0
        while (c < 8 * bw) {
          val v = (img.pixels(r * img.w + c) & 0xff).toLong
          sums((r / bh) * 8 + (c / bw)) += v
          total += v
          c += 1
        }
        r += 1
      }
      val nPix = 64L * bh * bw
      val nBlock = bh.toLong * bw
      Some(sums.map(s => if (s * nPix > total * nBlock) 1 else 0).toSeq)
    }
  }

  /** Deterministic stand-in featurizer: 4 doubles in [0,1) derived from the
    * md5 of the payload (8 hex chars per feature / 2^32). Stands in for a
    * decoded-content embedding; exercises the exact column plumbing a real
    * featurizer needs. Takes the hex digest (not the payload) so callers
    * hash once and slice — the digest is computed in one projection and
    * shared with the content_hash column. */
  def fakeFeatures(digestHex: Column): Column =
    transform(sequence(lit(0), lit(3)), i =>
      round(conv(digestHex.substr(i * lit(8) + 1, lit(8)), 16, 10)
        .cast("double") / lit(4294967296.0), 6))

  /** Build the media view from the documents corpus: the text payload as
    * utf-8 bytes (the fixture's opaque blob), typed metadata attached. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("media"),
      struct(lit("text/plain").as("mime"),
        length(col("text").cast("binary")).cast("long").as("n_bytes")).as("meta"))

  /** Per-media feature extraction: metadata passthrough + content hash +
    * fake features. Two narrow projections — no shuffle, no driver data;
    * the payload is hashed exactly ONCE (the digest is materialized as a
    * column, then content_hash and all four features slice it — not five
    * md5 evaluations per row). Features surfaced as scalar columns (f0..f3)
    * so the result is hash-comparable across engines. */
  def mediaFeatures(media: DataFrame): DataFrame = {
    val featCols = (0 until 4).map(i =>
      element_at(fakeFeatures(col("_digest")), i + 1).as(s"f$i"))
    media.withColumn("_digest", md5(col("media")))
      .select(Seq(
        col("media_id"),
        col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"),
        col("_digest").as("content_hash")) ++ featCols: _*)
  }

  /** M2: frame sampling — the video half of the multimodal plumbing.
    * Samples up to `nFrames` fixed-size byte windows at even stride from
    * each payload: frame i of a payload with n sampled frames starts at
    * byte `i * (len div n)`. The decode of each window (a real pipeline
    * would parse container/codec structure around keyframes) stays behind
    * [[decodeStub]]; the distributed plumbing — offset arithmetic, bounded
    * posexplode row growth (≤ nFrames per media), binary slicing, per-frame
    * hashing — is real.
    *
    * Plan shape: two narrow projections + one generator. No shuffle, no
    * driver state; at 100 TB this is a pure map over the media table with
    * output ≤ nFrames× rows of `frameBytes` payloads. Output:
    * (media_id, frame_idx, frame_off, frame_len, frame_hash). */
  /** M3: content-defined chunking (CDC) — the rsync/LBFS/backup-dedup
    * primitive for binary payloads: a chunk boundary falls AFTER byte
    * position p whenever the `windowBytes`-byte window starting at p
    * hashes to a digest with hex prefix `boundaryHexPrefix` (prefix
    * length k → boundary probability 16^-k → expected chunk ≈ 16^k +
    * windowBytes bytes). Because the cut decision depends ONLY on the
    * local window, an insertion or deletion re-aligns chunking within
    * one expected chunk length — the interior chunks of a shared span
    * hash identically in every payload that contains it, which is what
    * makes cross-media chunk-level dedup shift-robust where fixed-stride
    * framing ([[sampleFrames]]) only matches aligned content.
    *
    * Scale shape: cut positions, spans, and chunk hashes all compute
    * ARRAY-LOCALLY per payload (the cut list materializes in its own
    * projection — the same interpreted-HOF O(n²) trap the winnowing
    * operator documents); output is one row per chunk (≈ payload bytes /
    * expected chunk size), a pure map with no shuffle — downstream
    * chunk-grain aggregation is the only exchange, and it carries 16-byte
    * hashes, never payloads.
    *
    * Output: (media_id, chunk_idx, chunk_off, chunk_len, chunk_hash);
    * chunks partition the payload exactly (offsets contiguous from 1,
    * lengths sum to the payload length — spec-pinned). */
  def contentDefinedChunks(media: DataFrame, windowBytes: Int,
                           boundaryHexPrefix: String): DataFrame = {
    val len = length(col("media")).cast("long")
    val cutsExpr = when(len >= windowBytes,
      filter(sequence(lit(1L), len - (windowBytes - 1)),
        p => md5(col("media").substr(p.cast("int"), lit(windowBytes)))
          .like(s"$boundaryHexPrefix%")))
      .otherwise(array().cast("array<bigint>"))
    val staged = media
      .filter(length(col("media")) >= 1)
      .select(col("media_id"), col("media"), cutsExpr.as("_cuts"))
    val starts = concat(array(lit(1L)), transform(col("_cuts"), c => c + 1))
    val ends = concat(col("_cuts"), array(length(col("media")).cast("long")))
    staged
      .select(col("media_id"), col("media"),
        posexplode(zip_with(starts, ends,
          (s, e) => struct(s.as("s"), e.as("e")))).as(Seq("chunk_idx", "_c")))
      .select(
        col("media_id"),
        col("chunk_idx"),
        col("_c.s").as("chunk_off"),
        (col("_c.e") - col("_c.s") + 1).as("chunk_len"),
        md5(col("media").substr(col("_c.s").cast("int"),
          (col("_c.e") - col("_c.s") + 1).cast("int"))).as("chunk_hash"))
  }

  /** Binary near-duplicate pairs via SHARED CDC CHUNKS — the acting half
    * of m3's chunk index: two payloads that share `minShared`+ distinct
    * content-defined chunks overlap materially even when byte offsets
    * shift (m2's fixed-stride frames only catch aligned content). Chunks
    * held by more than `maxMediaPerChunk` payloads are dropped first —
    * boilerplate chunks carry no pairing signal and would expand
    * quadratically ([[Dedup.sharedKeyPairCounts]] has the scale
    * argument).
    *
    * Output: (id_a, id_b, n_shared) with id_a < id_b, n_shared >=
    * minShared distinct shared chunks. */
  def chunkNearDupPairs(media: DataFrame, windowBytes: Int,
                        boundaryHexPrefix: String, maxMediaPerChunk: Int,
                        minShared: Long): DataFrame =
    Dedup.sharedKeyPairCounts(
      contentDefinedChunks(media, windowBytes, boundaryHexPrefix)
        .select(col("chunk_hash"), col("media_id")),
      col("chunk_hash"), col("media_id"), maxMediaPerChunk)
      .filter(col("n_shared") >= minShared)

  /** M6: perceptual-hash near-dup pairs — the SIMILARITY member of the
    * binary-dedup family (m1's content_hash is exact-only, m4's chunk
    * sharing needs long shared spans; a perceptual hash matches payloads
    * whose CONTENT STATISTICS agree even when no byte span does). This is
    * average-hash (aHash) semantics applied to the payload stream: split
    * into 64 equal windows, bit i = [window-i mean > global mean] — for
    * images the windows would be 8×8 luma blocks after [[decodeStub]];
    * here they are utf-8 char windows, exercising the identical plumbing.
    * The mean compare is written as the integer cross-product
    * `winsum·64 > total` so no division or float enters the bits.
    *
    * Pairing is the MinHash-LSH discipline, not all-pairs: the 64 bits
    * split into `bands` exact-match bands (band value = the bit substring)
    * joined as equi-keys; by pigeonhole any pair within Hamming distance
    * `bands − 1` shares ≥ 1 exact band, so with maxHamming < bands the
    * candidate join is LOSSLESS for the reported set. Candidates then
    * verify exactly via one zip_with fold over the two bit vectors.
    *
    * Scale shape: bits compute array-locally in ONE codegen pass per
    * payload ([[graft.functions.AHashBits]] — the native-Expression knob
    * notes_r8ao called for; the retired interpreted-HOF composition
    * re-sliced the string per character, O(n²) per payload under
    * multi-byte encodings, and is kept only as [[aHashBitsFold]], the
    * spec's semantic reference); the shuffle carries (band, 8-char key)
    * — never payloads; verify joins the 64-int bit vectors only for
    * candidates. Payloads shorter than 64 units are dropped (no window). */
  def perceptualHashPairs(media: DataFrame, bands: Int,
                          maxHamming: Int): DataFrame = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs < bands=$bands for lossless banding")
    val bw = 64 / bands
    val txt = decode(col("media"), "UTF-8")
    val bits = media
      .select(col("media_id"),
        graft.functions.AHashBits(txt).as("bits"))
      .filter(col("bits").isNotNull) // < 64 code points: no window
      .localCheckpoint(eager = true) // referenced by banding AND both verify sides
    val bandRows = bits.select(col("media_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        concat_ws("", transform(slice(col("bits"), b * bw + 1, lit(bw)),
          x => x.cast("string"))))).as(Seq("_bnd", "_bv")))
    val cand = bandRows.as("a").join(bandRows.as("b"),
        col("a._bnd") === col("b._bnd") && col("a._bv") === col("b._bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    cand
      .join(bits.select(col("media_id").as("id_a"), col("bits").as("_ba")),
        Seq("id_a"))
      .join(bits.select(col("media_id").as("id_b"), col("bits").as("_bb")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("_ba"), col("_bb"),
            (x, y) => abs(x - y).cast("long")),
          lit(0L), _ + _).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** The aHash bit vector as the built-in higher-order-function
    * composition — the semantic reference [[graft.functions.AHashBits]]
    * replaced in the hot path (the [[graft.operators.Similarity.cosineFold]]
    * pattern: HOFs evaluate interpreted and re-slice the string per
    * character, so the hot path uses the one-pass native expression; the
    * spec asserts exact === equality between the two on every fixture
    * payload, 1-code-point windows included). NULL below 64 code points,
    * matching the expression. */
  private[graft] def aHashBitsFold(payload: Column): Column = {
    val n = length(payload).cast("long")
    val wd = (n / 64L).cast("long")
    val winsums = transform(sequence(lit(0L), lit(63L)), i =>
      aggregate(sequence(i * wd + 1L, (i + 1L) * wd), lit(0L),
        (acc, j) => acc + ascii(payload.substr(j.cast("int"), lit(1)))))
    when(n >= 64L,
      transform(winsums,
        s => when(s * 64L > aggregate(winsums, lit(0L), _ + _), 1)
          .otherwise(0)))
  }

  def sampleFrames(media: DataFrame, nFrames: Int, frameBytes: Int): DataFrame =
    media
      .select(col("media_id"), col("media"),
        length(col("media")).cast("long").as("_len"))
      .withColumn("_n",
        least(lit(nFrames.toLong), greatest(expr(s"_len div $frameBytes"), lit(1L))))
      .withColumn("_stride", expr("_len div _n"))
      .select(col("media_id"), col("media"),
        posexplode(transform(sequence(lit(0L), col("_n") - 1),
          i => i * col("_stride"))).as(Seq("frame_idx", "frame_off")))
      .select(
        col("media_id"),
        col("frame_idx"),
        col("frame_off"),
        length(col("media").substr(col("frame_off").cast("int") + 1, lit(frameBytes)))
          .cast("long").as("frame_len"),
        md5(col("media").substr(col("frame_off").cast("int") + 1, lit(frameBytes)))
          .as("frame_hash"))
}
