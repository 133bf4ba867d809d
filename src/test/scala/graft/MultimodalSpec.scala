package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "abcd"), (1L, "b"), (2L, ""), (3L, "hello world")
  ).toDF("doc_id", "text")

  private lazy val blobs = Multimodal.packBlobs(docs, "doc_id", "text")

  test("packBlobs: UTF-8 payload, round-robin modality, typed metadata") {
    val rows = blobs.collect().map(r => r.getAs[Long]("id") ->
      (r.getAs[String]("modality"), r.getAs[Array[Byte]]("blob"))).toMap
    assert(rows(0L)._1 == "audio" && rows(1L)._1 == "image" &&
      rows(2L)._1 == "video" && rows(3L)._1 == "audio")
    assert(new String(rows(3L)._2, "UTF-8") == "hello world")
    val meta = blobs.filter($"id" === 3L).select("meta.n_bytes").as[Long].head()
    assert(meta == 11L)
  }

  test("format sniff: empty vs first-byte parity") {
    val f = blobs
      .select($"id", Multimodal.sniffFormat($"modality", $"blob").as("fmt"))
      .as[(Long, String)].collect().toMap
    assert(f(2L) == "video/empty")
    assert(f(0L) == "audio/fmt1") // 'a' = 97, odd
    assert(f(1L) == "image/fmt0") // 'b' = 98, even
  }

  test("byteFeatures: histogram and entropy, hand-computed") {
    val bf = Multimodal.byteFeatures(blobs).collect()
      .map(f => f.id -> f).toMap
    // "abcd" → all four bytes have high nibble 6
    assert(bf(0L).byte_hist(6) == 4L && bf(0L).byte_hist.sum == 4L)
    assert(bf(0L).entropy_milli == 0L) // single bucket → zero entropy
    assert(bf(2L).n_bytes == 0L && bf(2L).entropy_milli == 0L)
    // "hello world": 'h'..'w' nibble 6/7, ' ' nibble 2 → >1 bucket
    assert(bf(3L).entropy_milli > 0L)
  }

  test("frameSample: contiguous slices, tail frame short, empty blob none") {
    val fr = Multimodal.frameSample(blobs, frameSize = 4, maxFrames = 8)
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("frame_idx")) ->
        r.getAs[Long]("frame_bytes")).toMap
    assert(fr((3L, 0L)) == 4L)  // "hell"
    assert(fr((3L, 1L)) == 4L)  // "o wo"
    assert(fr((3L, 2L)) == 3L)  // "rld"
    assert(!fr.contains((3L, 3L)))
    assert(!fr.keys.exists(_._1 == 2L)) // empty blob yields no frames
  }

  test("decode stub is the documented unimplemented seam") {
    intercept[UnsupportedOperationException] {
      Multimodal.decodeStub(Array[Byte](1, 2))
    }
  }
}
