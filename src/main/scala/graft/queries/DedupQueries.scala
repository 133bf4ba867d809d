package graft.queries

import graft.ops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked deduplication family over the documents corpus
  * (north-star operators; see [[graft.ops.Dedup]] for the scale design).
  *
  * Texts are normalized to their sorted distinct token set for the exact
  * family — raw texts in the driver corpus are all unique, normalized
  * content has real duplicate groups, so the oracle discriminates.
  *
  * The MinHash/SimHash oracle SQL is generated programmatically so the hash
  * construction (md5-derived, engine-neutral) stays in lockstep with the
  * Scala implementation.
  */
object DedupQueries {

  private val NumHashes = 12
  private val Bands = 3
  private val Rows = NumHashes / Bands

  private def normText = concat_ws(" ",
    array_sort(array_distinct(filter(split(col("text"), " "), t => t =!= ""))))

  private def docsNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).withColumn("norm_text", normText)

  def exactGroups(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactGroups(docsNorm(spark, dir), "doc_id", "norm_text")
      .orderBy("content_md5")

  def exactKeepFirst(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactDedup(docsNorm(spark, dir), "doc_id", "norm_text")
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_checksum"))

  def jaccardPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.9)
      .orderBy("id_a", "id_b")

  def jaccard2gram(spark: SparkSession, dir: String): DataFrame =
    Dedup.jaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.5, n = 2)
      .orderBy("id_a", "id_b")

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.9, numHashes = NumHashes, bands = Bands)
      .orderBy("id_a", "id_b")

  def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    Dedup.simhash(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy("id")

  /** The 100 TB dedup outcome: minhash candidates → verified edges →
    * connected components → keep-first survivors. The iterative component
    * loop has no single-statement SQL twin → rows-only here; semantics
    * pinned by DedupSpec (components + survivor sets on fixtures).
    */
  def clusterSurvivors(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDupDedup(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.9)
      .agg(count(lit(1)).as("n_survivors"),
        sum(col("doc_id")).as("id_checksum"))

  /** Strictly-linear approximate cluster dedup (bucket-star edges with
    * per-edge verification) — rows-only; semantics pinned by DedupSpec.
    */
  def clusterSurvivorsFast(spark: SparkSession, dir: String): DataFrame =
    Dedup.nearDupDedupFast(Tables.documents(spark, dir), "doc_id", "text",
        threshold = 0.9)
      .agg(count(lit(1)).as("n_survivors"),
        sum(col("doc_id")).as("id_checksum"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_exact_groups" -> exactGroups,
    "dedup_exact_keep_first" -> exactKeepFirst,
    "dedup_jaccard_pairs" -> jaccardPairs,
    "dedup_jaccard_2gram" -> jaccard2gram,
    "dedup_minhash_lsh" -> minhashLsh,
    "dedup_cluster_survivors" -> clusterSurvivors,
    "dedup_cluster_fast" -> clusterSurvivorsFast,
    "dedup_simhash" -> simhashDocs)

  // ---- oracle SQL -------------------------------------------------------------

  private val normSql =
    "array_to_string(list_sort(list_distinct(list_filter(string_split(text, ' '), t -> t <> ''))), ' ')"

  private val tokCte =
    """tok AS (
      |  SELECT DISTINCT doc_id AS id, t AS token
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
      |  WHERE t <> '')""".stripMargin

  // 48-bit md5-derived token hashes — mirrors Dedup.tokenHash48; the
  // set-similarity path intersects hash sets, not raw strings
  private val thCte =
    """th AS (
      |  SELECT id, ('0x' || substr(md5(token), 1, 12))::BIGINT AS th FROM tok)""".stripMargin

  private def jaccardTail(threshold: Double, extraCols: String = "n_common, ") =
    s"""SELECT id_a, id_b, $extraCols
       |  n_common * 1.0 / (sa.n_tokens + sb.n_tokens - n_common) AS jaccard
       |FROM inter
       |JOIN sz sa ON id_a = sa.id
       |JOIN sz sb ON id_b = sb.id
       |WHERE n_common * 1.0 / (sa.n_tokens + sb.n_tokens - n_common) >= $threshold
       |ORDER BY id_a, id_b""".stripMargin

  // double-hashed MinHash permutations — must mirror Dedup.minhashSignatures
  private val hshCte =
    """hsh AS (
      |  SELECT id, ('0x' || substr(md5(token), 1, 12))::BIGINT AS ha,
      |         ('0x' || substr(md5(token), 13, 12))::BIGINT AS hb
      |  FROM tok)""".stripMargin

  private val sigSelect = (0 until NumHashes)
    .map(i => s"min((ha + $i * hb) % ${graft.ops.Dedup.MinhashMod}) AS s$i")
    .mkString(", ")

  // 48-bit band hashes — mirrors Dedup.lshBands / tokenHash48
  private val bandUnion = (0 until Bands).map { b =>
    val parts = (0 until Rows).map(r => s"s${b * Rows + r}::VARCHAR").mkString(" || '|' || ")
    s"SELECT id, $b AS band, ('0x' || substr(md5($parts), 1, 12))::BIGINT AS band_hash FROM sig"
  }.mkString(" UNION ALL ")

  private val simhashVotes = (0 until 32)
    .map(i => s"sum(CASE WHEN ascii(substr(md5(token), ${i + 1}, 1)) % 2 = 1 THEN 1 ELSE -1 END) AS v$i")
    .mkString(", ")
  private val simhashBits = (0 until 32)
    .map(i => s"CASE WHEN v$i >= 0 THEN ${1L << i} ELSE 0 END")
    .mkString(" + ")

  val oracle: Map[String, String] = Map(
    "dedup_exact_groups" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
         |SELECT md5(norm) AS content_md5, min(doc_id) AS canonical_id,
         |  count(*) AS group_size
         |FROM n GROUP BY md5(norm) ORDER BY content_md5""".stripMargin,
    "dedup_exact_keep_first" ->
      s"""WITH n AS (SELECT doc_id, $normSql AS norm FROM documents)
         |SELECT count(*) AS n_kept, CAST(sum(canonical_id) AS BIGINT) AS id_checksum
         |FROM (SELECT min(doc_id) AS canonical_id FROM n GROUP BY norm)""".stripMargin,
    "dedup_jaccard_pairs" ->
      s"""WITH $tokCte,
         |$thCte,
         |sz AS (SELECT id, count(*) AS n_tokens FROM th GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM th a JOIN th b ON a.th = b.th AND a.id < b.id
         |  GROUP BY 1, 2)
         |${jaccardTail(0.9)}""".stripMargin,
    "dedup_jaccard_2gram" ->
      s"""WITH d AS (SELECT doc_id, list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |           FROM documents),
         |tok AS (
         |  SELECT DISTINCT doc_id AS id, toks[i] || ' ' || toks[i + 1] AS token
         |  FROM d, UNNEST(generate_series(1, len(toks) - 1)) AS u(i)
         |  WHERE len(toks) >= 2),
         |$thCte,
         |sz AS (SELECT id, count(*) AS n_tokens FROM th GROUP BY id),
         |inter AS (
         |  SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_common
         |  FROM th a JOIN th b ON a.th = b.th AND a.id < b.id
         |  GROUP BY 1, 2)
         |${jaccardTail(0.5)}""".stripMargin,
    "dedup_minhash_lsh" ->
      s"""WITH $tokCte,
         |$thCte,
         |$hshCte,
         |sig AS (SELECT id, $sigSelect FROM hsh GROUP BY id),
         |band AS ($bandUnion),
         |cand AS (
         |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
         |  FROM band a JOIN band b
         |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.id < b.id),
         |sz AS (SELECT id, count(*) AS n_tokens FROM th GROUP BY id),
         |inter AS (
         |  SELECT c.id_a, c.id_b, count(*) AS n_common
         |  FROM cand c
         |  JOIN th a ON a.id = c.id_a
         |  JOIN th b ON b.id = c.id_b AND b.th = a.th
         |  GROUP BY 1, 2)
         |${jaccardTail(0.9, extraCols = "")}""".stripMargin,
    "dedup_simhash" ->
      s"""WITH $tokCte,
         |votes AS (SELECT id, $simhashVotes FROM tok GROUP BY id)
         |SELECT id, CAST($simhashBits AS BIGINT) AS simhash
         |FROM votes ORDER BY id""".stripMargin)
}
