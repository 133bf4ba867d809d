package graft.queries

import graft.ops.Multimodal
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked multimodal-column family (north-star operators; see
  * [[graft.ops.Multimodal]]): binary payloads synthesized from the
  * documents corpus, metadata extraction, format sniffing, frame sampling,
  * and the mapPartitions decode stand-in.
  *
  * Oracle notes: DuckDB's md5/substr don't accept BLOBs, so the oracle SQL
  * computes the same bytes on the VARCHAR side — equivalent because the
  * synthetic corpus is pure ASCII (one byte per char, and md5(VARCHAR)
  * hashes the UTF-8 bytes, exactly what Spark's md5(binary) sees).
  * `multimodal_byte_features` exercises the typed mapPartitions path that
  * has no SQL equivalent → registered without oracle SQL (rows-only check;
  * full semantics covered by MultimodalSpec).
  */
object MultimodalQueries {

  private val FrameSize = 64
  private val MaxFrames = 8

  private def blobs(spark: SparkSession, dir: String): DataFrame =
    Multimodal.packBlobs(Tables.documents(spark, dir), "doc_id", "text")

  /** Metadata + format-sniff rollup per (modality, format). */
  def meta(spark: SparkSession, dir: String): DataFrame =
    blobs(spark, dir)
      .withColumn("format", Multimodal.sniffFormat(col("modality"), col("blob")))
      .groupBy("modality", "format")
      .agg(count(lit(1)).as("n_blobs"),
        sum(col("meta.n_bytes")).as("total_bytes"),
        min(col("meta.digest")).as("min_digest"),
        max(col("meta.digest")).as("max_digest"))
      .orderBy("modality", "format")

  /** Frame sampling: per-frame digests for the video-modality blobs. */
  def frames(spark: SparkSession, dir: String): DataFrame =
    Multimodal.frameSample(
        blobs(spark, dir).filter(col("modality") === "video"),
        FrameSize, MaxFrames)
      .orderBy("id", "frame_idx")

  /** Decode stand-in over the typed mapPartitions path — no SQL oracle
    * (rows-only); asserted value-exactly in MultimodalSpec.
    */
  def byteFeatures(spark: SparkSession, dir: String): DataFrame =
    Multimodal.byteFeatures(blobs(spark, dir))
      .toDF()
      .select(col("id"), col("n_bytes"), col("entropy_milli"),
        concat_ws(",", col("byte_hist")).as("hist_csv"))
      .orderBy("id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "multimodal_meta" -> meta,
    "multimodal_frames" -> frames,
    "multimodal_byte_features" -> byteFeatures)

  val oracle: Map[String, String] = Map(
    "multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id AS id,
        |    ['audio', 'image', 'video'][(doc_id % 3 + 1)::INT] AS modality,
        |    text, octet_length(text::BLOB)::BIGINT AS n_bytes,
        |    md5(text) AS digest
        |  FROM documents),
        |f AS (
        |  SELECT *, CASE WHEN n_bytes = 0 THEN modality || '/empty'
        |    WHEN ascii(substr(text, 1, 1)) % 2 = 0 THEN modality || '/fmt0'
        |    ELSE modality || '/fmt1' END AS format
        |  FROM b)
        |SELECT modality, format, count(*) AS n_blobs,
        |  sum(n_bytes)::BIGINT AS total_bytes,
        |  min(digest) AS min_digest, max(digest) AS max_digest
        |FROM f GROUP BY modality, format
        |ORDER BY modality, format""".stripMargin,
    "multimodal_frames" ->
      s"""WITH b AS (
         |  SELECT doc_id AS id, text FROM documents WHERE doc_id % 3 = 2),
         |fr AS (
         |  SELECT id, i AS frame_idx0, substr(text, i * $FrameSize + 1, $FrameSize) AS frame
         |  FROM b, UNNEST(generate_series(0, ${MaxFrames - 1})) AS u(i)),
         |keep AS (
         |  SELECT id, frame,
         |    row_number() OVER (PARTITION BY id ORDER BY frame_idx0) - 1 AS frame_idx
         |  FROM fr WHERE length(frame) > 0)
         |SELECT id, frame_idx::BIGINT AS frame_idx,
         |  length(frame)::BIGINT AS frame_bytes, md5(frame) AS frame_digest
         |FROM keep ORDER BY id, frame_idx""".stripMargin)
}
