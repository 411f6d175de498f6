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
}
