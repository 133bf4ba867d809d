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
