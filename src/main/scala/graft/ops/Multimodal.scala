package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: image/audio/
  * video payloads are opaque `binary` columns with typed metadata, and
  * every Spark-side mechanic — schema, binary expressions, partition-
  * parallel decode, frame slicing — is real and tested.
  *
  * This container ships no image/audio codecs, so the *codec* step is
  * stubbed: [[decodeStub]] documents the seam where a real decoder plugs
  * in, and [[byteFeatures]] is the deterministic stand-in feature
  * extractor (byte histogram + entropy) exercising the exact execution
  * shape a real decoder would use — a typed `mapPartitions` over
  * `(id, bytes)` pairs, so heavyweight per-partition init (codec contexts,
  * model weights) happens once per partition, not per row.
  *
  * Scale notes: blobs stay columnar in parquet (binary column, never
  * base64 strings); metadata extraction is expression-only (codegen'd,
  * no shuffle); decode parallelism is data parallelism — repartition by
  * size/count before the decode stage if blob sizes are skewed.
  */
object Multimodal {

  /** Typed per-blob features produced by the decode stand-in. */
  case class BlobFeatures(id: Long, n_bytes: Long, byte_hist: Array[Long],
    entropy_milli: Long)

  /** Synthesizes an (id, modality, blob, meta) relation from a text
    * corpus — UTF-8 bytes as the opaque payload, modality round-robined —
    * the shape a real ingest would produce from object-store pointers.
    */
  def packBlobs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val modality = element_at(
      array(lit("audio"), lit("image"), lit("video")),
      (pmod(col(idCol), lit(3)) + 1).cast("int"))
    df.select(col(idCol).as("id"), modality.as("modality"),
        encode(col(textCol), "UTF-8").as("blob"))
      .withColumn("meta", struct(
        length(col("blob")).cast("long").as("n_bytes"),
        md5(col("blob")).as("digest")))
  }

  /** First byte of a binary column as an integer (0–255) — the magic-number
    * probe. Real format sniffing switches on multi-byte magics; the
    * expression shape (binary slice → int compare) is identical.
    */
  def firstByte(blobCol: Column): Column =
    conv(hex(substring(blobCol, 1, 1)), 16, 10).cast("int")

  /** Container-format sniff, stubbed over the synthetic payloads: derives a
    * per-modality sub-format from the leading byte's parity. Expression-
    * only — no shuffle, stays in codegen.
    */
  def sniffFormat(modalityCol: Column, blobCol: Column): Column =
    when(length(blobCol) === 0, concat(modalityCol, lit("/empty")))
      .when(pmod(firstByte(blobCol), lit(2)) === 0,
        concat(modalityCol, lit("/fmt0")))
      .otherwise(concat(modalityCol, lit("/fmt1")))

  /** THE CODEC SEAM — a real deployment implements this with an actual
    * decoder (image decode, audio resample, video demux). Deliberately
    * unimplemented here: this container has no codec libraries.
    */
  def decodeStub(bytes: Array[Byte]): Nothing =
    throw new UnsupportedOperationException(
      "codec not available in this build — see Multimodal.byteFeatures " +
        "for the deterministic stand-in wired through the same plumbing")

  /** Deterministic decode stand-in: per-blob 16-bucket byte histogram (high
    * nibble) + Shannon entropy over the buckets in milli-nats. Typed
    * `mapPartitions` so per-partition init cost is amortized — the exact
    * execution shape of a real codec pass.
    */
  def byteFeatures(blobs: DataFrame): Dataset[BlobFeatures] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init happens HERE (codec context, model weights…)
        it.map { case (id, bytes) =>
          val hist = new Array[Long](16)
          var i = 0
          while (i < bytes.length) {
            hist((bytes(i) & 0xff) >> 4) += 1
            i += 1
          }
          val n = bytes.length.toDouble
          val entropy =
            if (bytes.isEmpty) 0.0
            else -hist.iterator.filter(_ > 0L)
              .map { c => val p = c / n; p * math.log(p) }.sum
          BlobFeatures(id, bytes.length.toLong, hist,
            math.round(entropy * 1000))
        }
      }
  }

  /** Typed per-blob perceptual hashes. */
  case class BlobPHash(id: Long, n_bytes: Long, ahash_lo: Long,
    ahash_hi: Long, dhash_lo: Long, dhash_hi: Long)

  /** Codec-free perceptual hashes (aHash + dHash, Krawetz's average/
    * difference-hash constructions) over the raw byte grid: the payload
    * splits into 64 equal chunks (byte p belongs to chunk p·64 div n — an
    * integer rule any engine replays), and
    *
    *  - aHash bit c = chunk c's mean byte exceeds the blob's mean byte,
    *    as the strict integer cross-multiply `sum_c·n > total·len_c`;
    *  - dHash bit c = chunk c's mean exceeds chunk c+1's mean,
    *    `sum_c·len_{c+1} > sum_{c+1}·len_c` (bit 63 always 0) —
    *
    * no division anywhere, so the 64-bit codes are integer-exact. A real
    * image deployment runs the same construction over DECODED pixel
    * grids inside this same seam; over raw bytes it is already a real
    * capability — format-robust image/audio near-dup via Hamming
    * distance, with the [[graft.ops.Similarity.binaryHammingTopK]]
    * XOR+popcount funnel downstream (codes pack as two 32-bit halves in
    * BIGINTs, the binaryCodes layout). Cross-multiplies bound the blob at
    * ~190 MB (255·n² must fit a long) — chunk the payload upstream past
    * that.
    *
    * Same typed `mapPartitions` seam as [[byteFeatures]]: per-partition
    * init amortized, blobs stay columnar until the one decode pass.
    */
  def perceptualHashes(blobs: DataFrame): Dataset[BlobPHash] = {
    val spark = blobs.sparkSession
    import spark.implicits._
    blobs.select(col("id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val n = bytes.length
          val sums = new Array[Long](64)
          val lens = new Array[Long](64)
          var i = 0
          while (i < n) {
            val c = ((i.toLong * 64) / n).toInt
            sums(c) += bytes(i) & 0xff
            lens(c) += 1
            i += 1
          }
          val tot = sums.sum
          var alo = 0L; var ahi = 0L; var dlo = 0L; var dhi = 0L
          var c = 0
          while (c < 64) {
            val abit = sums(c) * n > tot * lens(c)
            val dbit = c < 63 &&
              sums(c) * lens(c + 1) > sums(c + 1) * lens(c)
            if (abit) { if (c < 32) alo |= 1L << c else ahi |= 1L << (c - 32) }
            if (dbit) { if (c < 32) dlo |= 1L << c else dhi |= 1L << (c - 32) }
            c += 1
          }
          BlobPHash(id, n.toLong, alo, ahi, dlo, dhi)
        }
      }
  }

  /** Banded perceptual near-dup pairs: candidates agree EXACTLY on one of
    * the two aHash halves (the LSH-band discipline — two equi-joins, a
    * Σ bucket² candidate bound, never corpus²), then verify by full
    * 64-bit aHash Hamming ≤ `maxHamming` via XOR+popcount. Returns
    * (id_a, id_b, hamming_a, hamming_d) per surviving pair.
    */
  def phashNearDupPairs(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val a = hashes.select(col("id").as("id_a"),
      col("ahash_lo").as("alo_a"), col("ahash_hi").as("ahi_a"),
      col("dhash_lo").as("dlo_a"), col("dhash_hi").as("dhi_a"))
    val b = hashes.select(col("id").as("id_b"),
      col("ahash_lo").as("alo_b"), col("ahash_hi").as("ahi_b"),
      col("dhash_lo").as("dlo_b"), col("dhash_hi").as("dhi_b"))
    val band0 = a.join(b, col("alo_a") === col("alo_b") &&
      col("id_a") < col("id_b"))
    val band1 = a.join(b, col("ahi_a") === col("ahi_b") &&
      col("id_a") < col("id_b"))
    band0.unionByName(band1)
      .select(col("id_a"), col("id_b"),
        (bit_count(col("alo_a").bitwiseXOR(col("alo_b"))) +
          bit_count(col("ahi_a").bitwiseXOR(col("ahi_b"))))
          .cast("long").as("hamming_a"),
        (bit_count(col("dlo_a").bitwiseXOR(col("dlo_b"))) +
          bit_count(col("dhi_a").bitwiseXOR(col("dhi_b"))))
          .cast("long").as("hamming_d"))
      .distinct()
      .filter(col("hamming_a") <= maxHamming)
  }

  // ---- container-header parsing (PNG IHDR / JPEG SOF) ----------------------
  // Image DIMENSIONS need no codec: PNG stores width/height big-endian at
  // fixed IHDR offsets (bytes 17-24, 1-based) and JPEG stores them in the
  // first SOF segment of its marker stream. Both parse as pure byte
  // expressions (binary substr → hex → conv), so the whole extraction is
  // codegen'd columnar scan work — no shuffle, no UDF, and at 100 TB the
  // parquet scan dominates while the parse touches only each blob's first
  // kilobyte.

  /** PNG signature probe (8-byte magic, PNG spec §5.2). */
  def isPng(blob: Column): Column =
    length(blob) >= 8 && hex(substring(blob, 1, 8)) === "89504E470D0A1A0A"

  /** JPEG SOI probe (FF D8, ITU T.81 §B.1.1.3). */
  def isJpeg(blob: Column): Column =
    length(blob) >= 2 && hex(substring(blob, 1, 2)) === "FFD8"

  /** GIF signature probe (GIF87a / GIF89a, GIF89a spec §17). */
  def isGif(blob: Column): Column =
    length(blob) >= 6 &&
      (hex(substring(blob, 1, 6)) === "474946383761" ||
        hex(substring(blob, 1, 6)) === "474946383961")

  /** GIF logical-screen width: bytes 7–8 LITTLE-endian (GIF89a §18 —
    * unlike PNG/JPEG, GIF's multi-byte fields are LE). NULL when
    * truncated or non-GIF.
    */
  def gifWidth(blob: Column): Column =
    when(isGif(blob) && length(blob) >= 10,
      beUint(blob, lit(7L), 1) + beUint(blob, lit(8L), 1) * 256L)

  /** GIF logical-screen height: bytes 9–10 little-endian. */
  def gifHeight(blob: Column): Column =
    when(isGif(blob) && length(blob) >= 10,
      beUint(blob, lit(9L), 1) + beUint(blob, lit(10L), 1) * 256L)

  /** Big-endian unsigned int of `len` bytes (≤ 7) at 1-based `pos` —
    * the byte-arithmetic primitive both parsers ride. NULL when the
    * slice is short/empty (conv of "" is engine-null).
    */
  private def beUint(blob: Column, pos: Column, len: Int): Column =
    when(pos + (len - 1) <= length(blob),
      conv(hex(blob.substr(pos.cast("int"), lit(len))), 16, 10)
        .cast("long"))

  /** PNG IHDR width: bytes 17–20 big-endian, guarded on the signature
    * and the IHDR chunk type at bytes 13–16 (PNG spec §11.2.2 — IHDR is
    * required to be the first chunk). NULL on anything truncated or
    * non-PNG.
    */
  def pngWidth(blob: Column): Column =
    when(isPng(blob) && length(blob) >= 24 &&
      hex(substring(blob, 13, 4)) === "49484452", // "IHDR"
      beUint(blob, lit(17L), 4))

  /** PNG IHDR height: bytes 21–24 big-endian (same guards). */
  def pngHeight(blob: Column): Column =
    when(isPng(blob) && length(blob) >= 24 &&
      hex(substring(blob, 13, 4)) === "49484452",
      beUint(blob, lit(21L), 4))

  /** JPEG marker-stream walk to the first SOF segment: adds `__jw`/`__jh`
    * (NULL when no SOF appears within `maxSegments` segments, the stream
    * is malformed, or the blob isn't a JPEG). ITU T.81 §B.2.2: each
    * segment is FF <marker> <2-byte BE length incl. itself>; SOF0–SOF15
    * (C0–CF except C4 DHT / C8 JPG / CC DAC) carry precision(1) then
    * height(2) and width(2) big-endian; SOF always precedes SOS (FF DA),
    * so hitting SOS or EOI without a SOF means unparsable.
    *
    * The walk is UNROLLED `maxSegments` times as one withColumns chain —
    * per step the live state is exactly three columns (pos, h, w), and
    * Spark ≥ 3.2's CollapseProject keeps multiply-referenced non-cheap
    * aliases projected instead of inlined, so the plan stays linear in
    * `maxSegments`. Real camera JPEGs put SOF within the first handful
    * of segments (JFIF/EXIF APPn + quantization tables); bump the bound
    * for exotic streams.
    */
  def jpegSofWalk(df: DataFrame, blobCol: String,
      maxSegments: Int = 8): DataFrame = {
    val blob = col(blobCol)
    def byteAt(p: Column): Column = beUint(blob, p, 1).cast("int")
    var cur = df
      .withColumn("__jp", when(isJpeg(blob), lit(3L)))
      .withColumn("__jh", lit(null).cast("long"))
      .withColumn("__jw", lit(null).cast("long"))
    for (_ <- 1 to maxSegments) {
      val p = col("__jp")
      val done = col("__jh").isNotNull || p.isNull
      val okHdr = byteAt(p) === 0xFF
      val mk = byteAt(p + 1)
      val isSof = mk.isin(0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF)
      val segLen = beUint(blob, p + 2, 2)
      cur = cur.withColumns(Map(
        "__jh" -> when(done, col("__jh"))
          .when(okHdr && isSof, beUint(blob, p + 5, 2)),
        "__jw" -> when(done, col("__jw"))
          .when(okHdr && isSof, beUint(blob, p + 7, 2)),
        // advance past a non-SOF segment; SOS/EOI before SOF, a missing
        // FF, a short length field or a standalone marker all kill the
        // walk (pos → NULL = unparsable)
        "__jp" -> when(done, p)
          .when(okHdr && isSof, p)
          .when(okHdr && !mk.isin(0xDA, 0xD9) && segLen >= 2,
            p + 2 + segLen)))
    }
    cur
  }

  /** Corpus-facing dimension extraction: adds `img_format` (png / jpeg /
    * gif / unknown from the magic bytes) and `img_width`/`img_height`
    * (NULL when the header is truncated or malformed — the audit
    * signal, never an exception). One pass, expression-only.
    */
  def withImageDims(df: DataFrame, blobCol: String): DataFrame = {
    val blob = col(blobCol)
    jpegSofWalk(df, blobCol)
      .withColumn("img_format",
        when(isPng(blob), "png").when(isJpeg(blob), "jpeg")
          .when(isGif(blob), "gif")
          .otherwise("unknown"))
      .withColumn("img_width",
        when(isPng(blob), pngWidth(blob))
          .when(isJpeg(blob), col("__jw"))
          .when(isGif(blob), gifWidth(blob)))
      .withColumn("img_height",
        when(isPng(blob), pngHeight(blob))
          .when(isJpeg(blob), col("__jh"))
          .when(isGif(blob), gifHeight(blob)))
      .drop("__jp", "__jh", "__jw")
  }

  // ---- RIFF/WAVE header parsing (audio modality) ---------------------------

  /** RIFF/WAVE container probe ("RIFF" at 1–4, "WAVE" at 9–12). */
  def isWav(blob: Column): Column =
    length(blob) >= 12 && hex(substring(blob, 1, 4)) === "52494646" &&
      hex(substring(blob, 9, 4)) === "57415645"

  /** Little-endian unsigned int of `len` bytes at 1-based `pos` — RIFF's
    * multi-byte fields are LE (unlike PNG/JPEG). Built from per-byte
    * reads so each field costs `len` tiny codegen'd expressions; NULL
    * when the slice is short.
    */
  private def leUint(blob: Column, pos: Column, len: Int): Column =
    when(pos + (len - 1) <= length(blob),
      (0 until len).map(i => beUint(blob, pos + i, 1) *
        (1L << (8 * i))).reduce(_ + _))

  /** RIFF chunk walk to the "fmt " and "data" chunks: adds `__wch`
    * (channels), `__wsr` (sample rate), `__wbr` (byte rate), `__wbps`
    * (bits/sample) and `__wdb` (data-chunk byte count) — NULL when the
    * header is truncated, malformed or not a WAV. RIFF structure
    * (Microsoft/IBM 1991 spec): chunks of [id(4) | size(4 LE) | data],
    * each padded to an even boundary; "fmt " carries the PCM format
    * block (channels at +10, sample rate +12, byte rate +16, bits +22,
    * all LE), "data" carries `size` payload bytes. Same unrolled
    * withColumns discipline as [[jpegSofWalk]] — live state is six
    * columns, `maxChunks` projection steps, no shuffle.
    */
  def wavChunkWalk(df: DataFrame, blobCol: String,
      maxChunks: Int = 6): DataFrame = {
    val blob = col(blobCol)
    var cur = df
      .withColumn("__wp", when(isWav(blob), lit(13L)))
      .withColumn("__wch", lit(null).cast("long"))
      .withColumn("__wsr", lit(null).cast("long"))
      .withColumn("__wbr", lit(null).cast("long"))
      .withColumn("__wbps", lit(null).cast("long"))
      .withColumn("__wdb", lit(null).cast("long"))
    for (_ <- 1 to maxChunks) {
      val p = col("__wp")
      val done = p.isNull ||
        (col("__wch").isNotNull && col("__wdb").isNotNull)
      val cid = hex(blob.substr(p.cast("int"), lit(4)))
      val csize = leUint(blob, p + 4, 4)
      val isFmt = cid === "666D7420" // "fmt "
      val isData = cid === "64617461" // "data"
      val fmtReadable = p + 23 <= length(blob)
      // advance past the chunk, honoring RIFF's even-boundary padding;
      // a short/garbled size field kills the walk (pos → NULL)
      val next = p + 8 + csize + pmod(csize, lit(2L))
      cur = cur.withColumns(Map(
        "__wch" -> when(done || col("__wch").isNotNull, col("__wch"))
          .when(isFmt && fmtReadable, leUint(blob, p + 10, 2)),
        "__wsr" -> when(done || col("__wsr").isNotNull, col("__wsr"))
          .when(isFmt && fmtReadable, leUint(blob, p + 12, 4)),
        "__wbr" -> when(done || col("__wbr").isNotNull, col("__wbr"))
          .when(isFmt && fmtReadable, leUint(blob, p + 16, 4)),
        "__wbps" -> when(done || col("__wbps").isNotNull, col("__wbps"))
          .when(isFmt && fmtReadable, leUint(blob, p + 22, 2)),
        "__wdb" -> when(done || col("__wdb").isNotNull, col("__wdb"))
          .when(isData && csize.isNotNull, csize),
        "__wp" -> when(done, p).when(csize.isNotNull, next)))
    }
    cur
  }

  /** Corpus-facing audio metadata: `wav_channels`, `wav_sample_rate`,
    * `wav_bits`, `wav_data_bytes` and the exact integer
    * `wav_duration_ms` = data_bytes·1000 div byte_rate (NULL anywhere
    * the header fails to parse — the audit signal). One expression-only
    * pass; at 100 TB the parse reads each blob's first chunk headers
    * while the scan dominates.
    */
  def withWavMeta(df: DataFrame, blobCol: String): DataFrame =
    wavChunkWalk(df, blobCol)
      .withColumn("wav_channels", col("__wch"))
      .withColumn("wav_sample_rate", col("__wsr"))
      .withColumn("wav_bits", col("__wbps"))
      .withColumn("wav_data_bytes", col("__wdb"))
      .withColumn("wav_duration_ms",
        when(col("__wbr") > 0 && col("__wdb").isNotNull,
          expr("(__wdb * 1000) DIV __wbr")))
      .drop("__wp", "__wch", "__wsr", "__wbr", "__wbps", "__wdb")

  // ---- MP4 / ISO-BMFF header parsing (video modality) ----------------------

  /** ISO-BMFF probe: the first box's type is "ftyp" at bytes 5–8
    * (ISO/IEC 14496-12 §4.3 — ftyp "shall be placed as early as
    * possible"; in practice it is first).
    */
  def isMp4(blob: Column): Column =
    length(blob) >= 8 && hex(substring(blob, 5, 4)) === "66747970"

  /** Walk a flat run of ISO-BMFF boxes ([32-bit BE size | 4-char type |
    * payload], §4.2) from `startCol`, recording the first box of
    * `typeHex`'s start offset into `out` (NULL when absent within
    * `maxBoxes`, the stream is malformed, or start was NULL). Size 0
    * ("to end of file") and 1 (64-bit largesize) kill the walk — the
    * corpus profile counts them unparsed rather than guessing. Same
    * unrolled withColumns discipline as [[jpegSofWalk]]/[[wavChunkWalk]].
    */
  private def mp4FindBox(df: DataFrame, blobCol: String,
      startCol: Column, typeHex: String, maxBoxes: Int, out: String)
      : DataFrame = {
    val blob = col(blobCol)
    var cur = df.withColumn("__bp", startCol)
      .withColumn(out, lit(null).cast("long"))
    for (_ <- 1 to maxBoxes) {
      val p = col("__bp")
      val done = p.isNull || col(out).isNotNull
      val size = beUint(blob, p, 4)
      val btype = hex(blob.substr((p + 4).cast("int"), lit(4)))
      cur = cur.withColumns(Map(
        out -> when(done, col(out))
          .when(size >= 8 && btype === typeHex, p),
        "__bp" -> when(done, p)
          .when(size >= 8 && btype =!= typeHex, p + size)))
    }
    cur.drop("__bp")
  }

  /** Corpus-facing video metadata: `mp4_brand` (ftyp major brand),
    * `mp4_timescale`, `mp4_duration_units` and the exact integer
    * `mp4_duration_ms` = units·1000 div timescale — NULL anywhere the
    * header fails to parse. Two nested box walks (top-level → `moov`,
    * then inside it → `mvhd`), then fixed-offset reads off the mvhd
    * (§8.2.2: version 0 puts timescale/duration at +20/+24 as 32-bit
    * BE; version 1 at +28/+32 with a 64-bit duration, composed here
    * from two 32-bit reads). Expression-only, no shuffle.
    */
  def withMp4Meta(df: DataFrame, blobCol: String): DataFrame = {
    val blob = col(blobCol)
    val d1 = mp4FindBox(
      df.withColumn("__st", when(isMp4(blob), lit(1L))),
      blobCol, col("__st"), "6D6F6F76", 4, "__mv") // "moov"
    val d2 = mp4FindBox(d1, blobCol, col("__mv") + 8,
      "6D766864", 3, "__mh") // "mvhd"
    d2.withColumn("mp4_brand",
        when(isMp4(blob) && length(blob) >= 12,
          decode(substring(blob, 9, 4), "UTF-8")))
      .withColumn("__ver", beUint(blob, col("__mh") + 8, 1))
      .withColumn("mp4_timescale",
        when(col("__ver") === 0, beUint(blob, col("__mh") + 20, 4))
          .when(col("__ver") === 1, beUint(blob, col("__mh") + 28, 4)))
      .withColumn("mp4_duration_units",
        when(col("__ver") === 0, beUint(blob, col("__mh") + 24, 4))
          .when(col("__ver") === 1,
            beUint(blob, col("__mh") + 32, 4) * 4294967296L +
              beUint(blob, col("__mh") + 36, 4)))
      .withColumn("mp4_duration_ms",
        when(col("mp4_timescale") > 0 &&
          col("mp4_duration_units").isNotNull,
          expr("(mp4_duration_units * 1000) DIV mp4_timescale")))
      .drop("__st", "__mv", "__mh", "__ver")
  }

  /** Synthesizes REAL ISO-BMFF headers over the corpus (the video leg
    * of the pack-parse triple): ftyp (brand isom/mp42 by id parity), a
    * VARIABLE-size free box (id%8 filler bytes — the walk must really
    * walk), moov wrapping a spec-faithful 108-byte version-0 mvhd, and
    * an mdat sized to the text payload. Every ~83rd blob truncates
    * mid-ftyp. Formulas (the oracle's independent ground truth):
    * timescale = [600, 1000, 90000, 44100, 24][id % 5], duration units
    * = octet_length(text), brand = isom (even) / mp42 (odd).
    */
  def packVideoBlobs(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    val tsc = element_at(
      array(lit(600L), lit(1000L), lit(90000L), lit(44100L), lit(24L)),
      (pmod(id, lit(5L)) + 1).cast("int"))
    val dataLen = length(encode(col(textCol), "UTF-8")).cast("long")
    def be(v: Column, hexDigits: Int): Column =
      lpad(hex(v), hexDigits, "0")
    val brandHex = when(pmod(id, lit(2L)) === 0, lit("69736F6D"))
      .otherwise(lit("6D703432")) // isom / mp42
    val freePay = pmod(id, lit(8L))
    val mvhdHex = concat(
      lit("0000006C6D766864"), // size 108, "mvhd"
      lit("00000000"), // version 0 + flags
      lit("0000000000000000"), // ctime, mtime
      be(tsc, 8), be(dataLen, 8), // timescale, duration
      lit("00" * 80)) // rate/volume/matrix/predefined/next_track
    val hexHdr = concat(
      lit("0000001066747970"), brandHex, lit("00000200"), // ftyp
      be(freePay + 8L, 8), lit("66726565"), // free, variable size
      expr(s"repeat('41', cast(pmod($idCol, 8) as int))"),
      lit("000000746D6F6F76"), mvhdHex, // moov (8 + 108)
      be(dataLen + 8L, 8), lit("6D646174")) // mdat
    val full = concat(unhex(hexHdr), encode(col(textCol), "UTF-8"))
    df.select(id.as("id"),
      when(pmod(id, lit(83L)) === 0, substring(full, 1, 9))
        .otherwise(full).as("blob"))
  }

  /** Synthesizes REAL RIFF/WAVE headers over the corpus (the audio twin
    * of [[packImageBlobs]]): canonical 44-byte PCM header — RIFF size,
    * "WAVE", a spec-exact "fmt " block, a "data" chunk sized to the
    * document's UTF-8 byte count — with the text as payload. Every
    * ~89th blob truncates mid-"WAVE". Formulas (the oracle's
    * independent ground truth): channels = 1 + id % 2, sample rate =
    * [8000, 16000, 22050, 44100, 48000][id % 5], 16-bit PCM, byte rate
    * = rate·channels·2, data bytes = octet_length(text).
    */
  def packAudioBlobs(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    val ch = lit(1L) + pmod(id, lit(2L))
    val sr = element_at(
      array(lit(8000L), lit(16000L), lit(22050L), lit(44100L),
        lit(48000L)), (pmod(id, lit(5L)) + 1).cast("int"))
    val br = sr * ch * 2L
    val dataLen = length(encode(col(textCol), "UTF-8")).cast("long")
    def le(v: Column, bytes: Int): Column = {
      // LE hex: byte i = (v >> 8i) & 255, emitted low-order first
      concat((0 until bytes).map(i =>
        lpad(hex(pmod(shiftright(v, 8 * i), lit(256L))), 2, "0")): _*)
    }
    val hexHdr = concat(
      lit("52494646"), le(dataLen + 36L, 4), lit("57415645"), // RIFF/WAVE
      lit("666D7420"), le(lit(16L), 4), le(lit(1L), 2), // fmt , PCM
      le(ch, 2), le(sr, 4), le(br, 4),
      le(ch * 2L, 2), le(lit(16L), 2), // block align, bits
      lit("64617461"), le(dataLen, 4)) // data
    val full = concat(unhex(hexHdr), encode(col(textCol), "UTF-8"))
    df.select(id.as("id"),
      when(pmod(id, lit(89L)) === 0, substring(full, 1, 11))
        .otherwise(full).as("blob"))
  }

  /** Synthesizes REAL image headers over the corpus — spec-valid PNG
    * (signature + IHDR) and JPEG (SOI + JFIF APP0 + variable-length COM
    * + SOF0/SOF2) byte streams whose dimensions derive from the id, with
    * the document text as trailing payload. Every ~97th blob is
    * truncated mid-header (the corrupt-file case a corpus profile must
    * count, not crash on). The whole construction is one unhex of a
    * concatenated hex string — expression-only, so the pack+parse round
    * trip stays inside whole-stage codegen.
    *
    * Dimension formulas (the oracle's independent ground truth):
    * width = 1 + id % 1024, height = 1 + (id·31) % 1024; even ids pack
    * PNG, odd ids JPEG (id % 4 == 1 → baseline SOF0, 3 → progressive
    * SOF2); id % 97 == 0 → first 10 bytes only.
    */
  def packImageBlobs(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val id = col(idCol)
    val w = lit(1L) + pmod(id, lit(1024L))
    val h = lit(1L) + pmod(id * 31, lit(1024L))
    def be(v: Column, hexDigits: Int): Column =
      lpad(hex(v), hexDigits, "0")
    val pngHex = concat(
      lit("89504E470D0A1A0A"), // signature
      lit("0000000D49484452"), // IHDR length 13 + type
      be(w, 8), be(h, 8),
      lit("0806000000"), // bit depth 8, RGBA, deflate, filter 0, no interlace
      lit("00000000")) // CRC placeholder (not validated by dimension parse)
    // COM payload of 2 + id%8 'A's makes segment lengths genuinely
    // variable so the SOF walk is exercised, not just offset arithmetic
    val comLen = (lit(4L) + pmod(id, lit(8L))).cast("int") // incl. 2 len bytes
    val jpegHex = concat(
      lit("FFD8"), // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0 JFIF, len 16
      lit("FFFE"), be(comLen, 4),
      expr(s"repeat('41', cast(2 + pmod($idCol, 8) as int))"),
      when(pmod(id, lit(4L)) === 1, lit("FFC0")).otherwise(lit("FFC2")),
      lit("001108"), // SOF length 17, precision 8
      be(h, 4), be(w, 4),
      lit("03011100021101031101")) // 3 components
    val full = concat(
      unhex(when(pmod(id, lit(2L)) === 0, pngHex).otherwise(jpegHex)),
      encode(col(textCol), "UTF-8"))
    df.select(id.as("id"),
      when(pmod(id, lit(97L)) === 0, substring(full, 1, 10))
        .otherwise(full).as("blob"))
  }

  /** Frame sampling: slice the payload into fixed-size frames (video-frame /
    * audio-window shape), keeping every frame index < maxFrames. Expression-
    * only — binary slicing happens columnar, one output row per frame via a
    * single `posexplode`, no shuffle.
    */
  def frameSample(blobs: DataFrame, frameSize: Int, maxFrames: Int): DataFrame = {
    val frames = array((0 until maxFrames).map(i =>
      substring(col("blob"), i * frameSize + 1, frameSize)): _*)
    blobs.select(col("id"),
        posexplode(filter(frames, f => length(f) > 0))
          .as(Seq("frame_idx", "frame")))
      .select(col("id"), col("frame_idx").cast("long").as("frame_idx"),
        length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_digest"))
  }
}
