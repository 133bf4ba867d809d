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

  test("perceptualHashes: constant blob hashes to zero; ramp sets high " +
      "aHash chunks; short blobs leave empty-chunk bits clear; 1-byte " +
      "edit stays Hamming-near") {
    val spark2 = spark
    import spark2.implicits._
    val constant = Array.fill[Byte](256)(65)
    val ramp = Array.tabulate[Byte](256)(i => i.toByte)
    val rampTweak = ramp.clone(); rampTweak(7) = 120.toByte
    val short = Array[Byte](1, 2, 3) // 3 bytes → 61 empty chunks
    val df = Seq(0L -> constant, 1L -> ramp, 2L -> rampTweak,
      3L -> short, 4L -> constant).toDF("id", "blob")
    val h = Multimodal.perceptualHashes(df).collect()
      .map(p => p.id -> p).toMap
    // constant: strict > never fires
    assert(h(0L).ahash_lo == 0L && h(0L).ahash_hi == 0L &&
      h(0L).dhash_lo == 0L && h(0L).dhash_hi == 0L)
    // unsigned ramp 0..255: chunks 32..63 sit above the mean, none below
    assert(h(1L).ahash_lo == 0L &&
      h(1L).ahash_hi == 0xFFFFFFFFL) // all 32 half-bits set
    // strictly increasing chunk means → no dHash bit (next is larger)
    assert(h(1L).dhash_lo == 0L && h(1L).dhash_hi == 0L)
    // 3-byte blob: bytes 1,2,3 land in chunks 0,21,42; mean fires only
    // where a nonempty chunk exceeds it; empty chunks always clear
    val s3 = h(3L)
    assert(s3.n_bytes == 3L)
    assert((s3.ahash_lo | (1L << 21)) == (1L << 21) &&
      (s3.ahash_hi | (1L << 10)) == (1L << 10)) // only chunks 21/42 can set
    // one edited byte: aHash moves by at most a few bits
    val hamming = java.lang.Long.bitCount(h(1L).ahash_lo ^ h(2L).ahash_lo) +
      java.lang.Long.bitCount(h(1L).ahash_hi ^ h(2L).ahash_hi)
    assert(hamming <= 3, s"hamming $hamming")
    // banded near-dup: the exact-dup pair (0,4) retrieved at hamming 0;
    // ramp vs constant never pairs
    val pairs = Multimodal.phashNearDupPairs(
        Multimodal.perceptualHashes(df).toDF(), maxHamming = 6)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairs.exists(p => p._1 == 0L && p._2 == 4L && p._3 == 0L))
    assert(!pairs.exists(p => p._1 == 0L && p._2 == 1L))
  }

  private def hexBytes(s: String): Array[Byte] =
    s.replaceAll("\\s", "").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray

  test("withImageDims: HAND-BUILT spec-valid PNG / JPEG / GIF headers " +
      "parse to their true dimensions (big- and little-endian); " +
      "truncated / SOS-before-SOF / non-image blobs yield NULL instead " +
      "of crashing") {
    // real 800×600 PNG header: signature, IHDR len 13, type, w, h,
    // bit-depth/color/etc, CRC
    val png800x600 = hexBytes(
      "89504E470D0A1A0A 0000000D 49484452 00000320 00000258" +
        " 0802000000 907753DE")
    // real-shaped progressive JPEG: SOI, APP0 JFIF (len 16), a DQT
    // segment (len 0x43 = 67), then SOF2 with height 1080 / width 1920
    val dqt = "FFDB 0043 00" + "11" * 64
    val jpeg1920x1080 = hexBytes(
      "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 0000 " + dqt +
        " FFC2 0011 08 0438 0780 03 011100 021101 031101")
    // malformed: SOS (FF DA) appears before any SOF
    val sosFirst = hexBytes(
      "FFD8 FFE0 0010 4A46494600 0101 00 0001 0001 0000 " +
        "FFDA 0008 01 01 00 003F 00")
    // real GIF89a logical-screen descriptor: 320×200, LITTLE-endian
    val gif320x200 = hexBytes("474946383961 4001 C800 F7 00 00")
    val fixture = Seq(
      (1L, png800x600),
      (2L, jpeg1920x1080),
      (3L, png800x600.take(12)), // truncated mid-IHDR
      (4L, jpeg1920x1080.take(7)), // truncated mid-APP0
      (5L, sosFirst),
      (6L, "just some text bytes".getBytes("UTF-8")),
      (7L, gif320x200),
      (8L, gif320x200.take(8))) // truncated mid-descriptor
      .toDF("id", "blob")
    val got = Multimodal.withImageDims(fixture, "blob")
      .select($"id", $"img_format",
        $"img_width".cast("string"), $"img_height".cast("string"))
      .as[(Long, String, Option[String], Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == (("png", Some("800"), Some("600"))))
    assert(got(2L) == (("jpeg", Some("1920"), Some("1080"))))
    assert(got(3L) == (("png", None, None)))
    assert(got(4L) == (("jpeg", None, None)))
    assert(got(5L) == (("jpeg", None, None)))
    assert(got(6L) == (("unknown", None, None)))
    assert(got(7L) == (("gif", Some("320"), Some("200"))))
    assert(got(8L) == (("gif", None, None)))
  }

  test("withWavMeta: a HAND-BUILT spec-valid PCM WAV parses to its true " +
      "format fields; an ODD-sized LIST chunk before fmt exercises the " +
      "even-padding walk; truncated and non-WAV blobs yield NULLs") {
    // canonical 44.1 kHz stereo 16-bit header, 8 payload bytes
    val wav = hexBytes(
      "52494646 2C000000 57415645 666D7420 10000000 0100 0200" +
        " 44AC0000 10B10200 0400 1000 64617461 08000000" +
        " 0011223344556677")
    // LIST chunk of ODD size 5 (walk must skip 8+5+1 pad) before fmt
    val wavList = hexBytes(
      "52494646 3A000000 57415645 4C495354 05000000 494E464F41 00" +
        " 666D7420 10000000 0100 0100 803E0000 007D0000 0200 1000" +
        " 64617461 04000000 00112233")
    val fixture = Seq(
      (1L, wav),
      (2L, wavList),
      (3L, wav.take(11)), // truncated mid-"WAVE"
      (4L, "RIFFnotawave".getBytes("UTF-8")))
      .toDF("id", "blob")
    val got = Multimodal.withWavMeta(fixture, "blob")
      .collect().map(r => r.getAs[Long]("id") -> ((
        Option(r.get(r.fieldIndex("wav_channels"))),
        Option(r.get(r.fieldIndex("wav_sample_rate"))),
        Option(r.get(r.fieldIndex("wav_bits"))),
        Option(r.get(r.fieldIndex("wav_data_bytes"))),
        Option(r.get(r.fieldIndex("wav_duration_ms")))))).toMap
    assert(got(1L) == ((Some(2L), Some(44100L), Some(16L), Some(8L),
      Some(0L)))) // 8·1000 div 176400 = 0
    // 16000 Hz mono 16-bit: byte rate 32000, 4 bytes → 0 ms; the LIST
    // chunk was skipped with its pad byte
    assert(got(2L) == ((Some(1L), Some(16000L), Some(16L), Some(4L),
      Some(0L))))
    assert(got(3L) == ((None, None, None, None, None)))
    assert(got(4L) == ((None, None, None, None, None)))
  }

  test("packAudioBlobs → withWavMeta round trip recovers the id " +
      "formulas (incl. the %89 truncation) and the exact duration") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 89L, 178L)
    val docs2 = ids.map(i => (i, "x" * (100 + i.toInt)))
      .toDF("doc_id", "text")
    val got = Multimodal.withWavMeta(
        Multimodal.packAudioBlobs(docs2, "doc_id", "text"), "blob")
      .collect().map(r => r.getAs[Long]("id") -> ((
        Option(r.get(r.fieldIndex("wav_channels"))),
        Option(r.get(r.fieldIndex("wav_sample_rate"))),
        Option(r.get(r.fieldIndex("wav_data_bytes"))),
        Option(r.get(r.fieldIndex("wav_duration_ms")))))).toMap
    val rates = Seq(8000L, 16000L, 22050L, 44100L, 48000L)
    ids.foreach { i =>
      val exp =
        if (i % 89 == 0) (None, None, None, None)
        else {
          val ch = 1 + i % 2; val sr = rates((i % 5).toInt)
          val db = 100L + i
          (Some(ch), Some(sr), Some(db),
            Some(db * 1000 / (sr * ch * 2)))
        }
      assert(got(i) == exp, s"id $i: got ${got(i)}, want $exp")
    }
  }

  test("withMp4Meta: HAND-BUILT ISO-BMFF headers parse brand/timescale/" +
      "duration for BOTH mvhd versions (v0 32-bit and v1 64-bit " +
      "offsets); truncated and non-MP4 blobs yield NULLs") {
    // ftyp(isom) + 12-byte free + moov[mvhd v0: timescale 600,
    // duration 1800] → 3000 ms
    val v0 = hexBytes(
      "00000010 66747970 69736F6D 00000200" +
        " 0000000C 66726565 41414141" +
        " 00000074 6D6F6F76" +
        " 0000006C 6D766864 00000000 00000000 00000000" +
        " 00000258 00000708" + "00" * 80)
    // mvhd v1: 64-bit ctime/mtime/duration; timescale 90000 at +28,
    // duration 450000 at +32 → 5000 ms
    val v1 = hexBytes(
      "00000010 66747970 6D703432 00000200" +
        " 00000080 6D6F6F76" +
        " 00000078 6D766864 01000000" +
        " 0000000000000000 0000000000000000" +
        " 00015F90 00000000 0006DDD0" + "00" * 80)
    val fixture = Seq(
      (1L, v0), (2L, v1),
      (3L, v0.take(9)), // truncated mid-ftyp
      (4L, "nothing like an mp4 here".getBytes("UTF-8")))
      .toDF("id", "blob")
    val got = Multimodal.withMp4Meta(fixture, "blob")
      .collect().map(r => r.getAs[Long]("id") -> ((
        Option(r.get(r.fieldIndex("mp4_brand"))),
        Option(r.get(r.fieldIndex("mp4_timescale"))),
        Option(r.get(r.fieldIndex("mp4_duration_units"))),
        Option(r.get(r.fieldIndex("mp4_duration_ms")))))).toMap
    assert(got(1L) == ((Some("isom"), Some(600L), Some(1800L),
      Some(3000L))))
    assert(got(2L) == ((Some("mp42"), Some(90000L), Some(450000L),
      Some(5000L))))
    assert(got(3L) == ((None, None, None, None)))
    assert(got(4L) == ((None, None, None, None)))
  }

  test("packVideoBlobs → withMp4Meta round trip recovers the id " +
      "formulas (incl. the variable-size free box and %83 truncation)") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 7L, 83L, 166L)
    val docs2 = ids.map(i => (i, "v" * (50 + i.toInt)))
      .toDF("doc_id", "text")
    val got = Multimodal.withMp4Meta(
        Multimodal.packVideoBlobs(docs2, "doc_id", "text"), "blob")
      .collect().map(r => r.getAs[Long]("id") -> ((
        Option(r.get(r.fieldIndex("mp4_brand"))),
        Option(r.get(r.fieldIndex("mp4_timescale"))),
        Option(r.get(r.fieldIndex("mp4_duration_ms")))))).toMap
    val grid = Seq(600L, 1000L, 90000L, 44100L, 24L)
    ids.foreach { i =>
      val exp =
        if (i % 83 == 0) (None, None, None)
        else {
          val tsc = grid((i % 5).toInt); val du = 50L + i
          (Some(if (i % 2 == 0) "isom" else "mp42"), Some(tsc),
            Some(du * 1000 / tsc))
        }
      assert(got(i) == exp, s"id $i: got ${got(i)}, want $exp")
    }
  }

  test("packImageBlobs → withImageDims round trip recovers the id " +
      "formulas (incl. the 1×1 corner and the %97 truncation)") {
    val ids = Seq(0L, 1L, 2L, 3L, 97L, 194L, 1023L, 1024L, 2049L)
    val docs2 = ids.map(i => (i, s"payload text for $i"))
      .toDF("doc_id", "text")
    val got = Multimodal.withImageDims(
        Multimodal.packImageBlobs(docs2, "doc_id", "text"), "blob")
      .select($"id", $"img_format", $"img_width", $"img_height")
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[String]("img_format"),
          Option(r.get(r.fieldIndex("img_width"))),
          Option(r.get(r.fieldIndex("img_height")))))).toMap
    ids.foreach { i =>
      val fmt = if (i % 2 == 0) "png" else "jpeg"
      val exp =
        if (i % 97 == 0) (fmt, None, None)
        else (fmt, Some(1L + i % 1024), Some(1L + (i * 31) % 1024))
      assert(got(i) == exp, s"id $i: got ${got(i)}, want $exp")
    }
  }
}
