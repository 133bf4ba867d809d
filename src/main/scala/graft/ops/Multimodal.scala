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
