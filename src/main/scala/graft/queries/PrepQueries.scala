package graft.queries

import graft.ops.Prep
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Oracle-checked training-data preparation family ([[graft.ops.Prep]]):
  * TF-IDF term weighting, per-group feature normalization, the hashing
  * trick, leakage-free group splits, sequence packing, and dataset-mixture
  * sampling. Every md5-threshold decision and every piece of double
  * arithmetic is mirrored verbatim in the DuckDB SQL.
  */
object PrepQueries {

  private val TopK = 3
  private val HashBuckets = 32
  private val PackBudget = 200
  private val MixWeights = Map("src0" -> 0.8, "src1" -> 0.5)
  private val MixDefault = 0.25

  /** Top-3 TF-IDF terms for the first 10 documents (idf fitted on the FULL
    * corpus — the filter applies to the output, not the statistics).
    */
  def tfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    Prep.tfidfTopTerms(Tables.documents(spark, dir), "doc_id", "text", TopK)
      .filter(col("doc_id") < 10)
      .orderBy("doc_id", "rank")

  /** Z-score + min-max of customer balances, normalized within market
    * segment; stats over ALL customers, output sliced to the first 20.
    */
  def normalizeAcctbal(spark: SparkSession, dir: String): DataFrame =
    Prep.standardize(Tables.customer(spark, dir), "c_acctbal",
        Seq("c_mktsegment"))
      .filter(col("c_custkey") < 20)
      .select("c_custkey", "c_mktsegment", "z", "minmax")
      .orderBy("c_custkey")

  /** Hashed (event_type=props) features into 32 signed buckets per user. */
  def featureHash(spark: SparkSession, dir: String): DataFrame =
    Prep.featureHash(
        Tables.events(spark, dir).filter(col("user_id") < 20),
        Seq("user_id"),
        concat(col("event_type"), lit("="), coalesce(col("props"), lit(""))),
        HashBuckets)
      .orderBy("user_id", "bucket")

  /** 80/10/10 user-level split of the events table — user counts per split
    * prove the assignment; leakage-freedom (one split per user) is pinned
    * by PrepSpec.
    */
  def groupSplit(spark: SparkSession, dir: String): DataFrame =
    Prep.groupSplit(Tables.events(spark, dir), "user_id", 80, 10)
      .groupBy("split")
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .orderBy("split")

  /** Documents packed onto 200-token streams per source; pack-level doc and
    * token counts.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame =
    Prep.packSequences(Tables.documents(spark, dir), "doc_id", "text",
        "source", PackBudget)
      .groupBy("source", "pack")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source", "pack")

  /** Weighted mixture over sources (src0 80%, src1 50%, rest 25%):
    * kept-vs-total per source.
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val kept = Prep.mixtureSample(docs, "doc_id", "source",
        MixWeights, MixDefault)
      .groupBy("source").agg(count(lit(1)).as("n_kept"))
    docs.groupBy("source").agg(count(lit(1)).as("n_total"))
      .join(kept, Seq("source"), "left")
      .select(col("source"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "prep_tfidf_top_terms" -> tfidfTopTerms,
    "prep_normalize_acctbal" -> normalizeAcctbal,
    "prep_feature_hash" -> featureHash,
    "prep_group_split" -> groupSplit,
    "prep_pack_sequences" -> packSequences,
    "prep_mixture_sample" -> mixtureSample)

  // ---- oracle SQL -------------------------------------------------------------

  private def md5Bucket(expr: String, buckets: Int) =
    s"('0x' || substr(md5($expr), 1, 12))::BIGINT % $buckets"

  val oracle: Map[String, String] = Map(
    "prep_tfidf_top_terms" ->
      s"""WITH d AS (SELECT doc_id,
         |  list_filter(string_split(text, ' '), t -> t <> '') AS toks
         |  FROM documents),
         |t AS (SELECT doc_id, unnest(toks) AS term FROM d),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |s AS (SELECT tf.doc_id, tf.term, tf.tf,
         |        round(tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0), 6)
         |          AS tfidf
         |      FROM tf JOIN df USING (term), n),
         |r AS (SELECT doc_id, term, tf, tfidf, row_number()
         |        OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank
         |      FROM s)
         |SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, tfidf
         |FROM r WHERE rank <= $TopK AND doc_id < 10
         |ORDER BY doc_id, rank""".stripMargin,
    "prep_normalize_acctbal" ->
      """WITH c AS (SELECT c_custkey, c_mktsegment,
        |  CAST(c_acctbal AS DECIMAL(18,2)) AS xd FROM customer),
        |s AS (SELECT c_mktsegment, count(*) AS n, sum(xd) AS s,
        |        sum(xd * xd) AS ss, min(xd) AS mn, max(xd) AS mx
        |      FROM c GROUP BY 1)
        |SELECT c.c_custkey, c.c_mktsegment,
        |  CASE WHEN CAST(s.ss AS DOUBLE) / s.n
        |            - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n) > 0
        |    THEN round((CAST(c.xd AS DOUBLE) - CAST(s.s AS DOUBLE) / s.n)
        |           / sqrt(CAST(s.ss AS DOUBLE) / s.n
        |                  - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n)),
        |           6) END AS z,
        |  CASE WHEN CAST(s.mx - s.mn AS DOUBLE) > 0
        |    THEN round(CAST(c.xd - s.mn AS DOUBLE) / CAST(s.mx - s.mn AS DOUBLE), 6)
        |    END AS minmax
        |FROM c JOIN s USING (c_mktsegment)
        |WHERE c_custkey < 20 ORDER BY c_custkey""".stripMargin,
    "prep_feature_hash" -> {
      val feat = "event_type || '=' || coalesce(props, '')"
      s"""WITH b AS (SELECT user_id,
         |  ${md5Bucket(feat, HashBuckets)} AS bucket,
         |  CASE WHEN ('0x' || substr(md5($feat), 13, 1))::BIGINT % 2 = 0
         |    THEN 1 ELSE -1 END AS sign
         |  FROM events WHERE user_id < 20)
         |SELECT user_id, bucket, CAST(sum(sign) AS BIGINT) AS value
         |FROM b GROUP BY 1, 2 ORDER BY user_id, bucket""".stripMargin
    },
    "prep_group_split" -> {
      val b = md5Bucket("user_id::VARCHAR", 100)
      s"""WITH s AS (SELECT user_id,
         |  CASE WHEN $b < 80 THEN 'train'
         |       WHEN $b < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |  FROM events)
         |SELECT split, count(DISTINCT user_id) AS n_users,
         |  count(*) AS n_events
         |FROM s GROUP BY 1 ORDER BY split""".stripMargin
    },
    "prep_pack_sequences" ->
      s"""WITH d AS (SELECT source, doc_id,
         |  len(list_filter(string_split(text, ' '), t -> t <> ''))::BIGINT
         |    AS n_tokens
         |  FROM documents),
         |o AS (SELECT source, doc_id, n_tokens,
         |        coalesce(sum(n_tokens) OVER (PARTITION BY source
         |          ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS start_offset
         |      FROM d)
         |SELECT source, CAST(floor(start_offset / $PackBudget) AS BIGINT) AS pack,
         |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS n_tokens
         |FROM o GROUP BY 1, 2 ORDER BY source, pack""".stripMargin,
    "prep_mixture_sample" -> {
      val b = md5Bucket("doc_id::VARCHAR", 10000)
      val thr = s"""CASE WHEN source = 'src0' THEN ${MixWeights("src0") * 10000}
                   |       WHEN source = 'src1' THEN ${MixWeights("src1") * 10000}
                   |       ELSE ${MixDefault * 10000} END""".stripMargin
      s"""WITH k AS (SELECT source, count(*) AS n_kept FROM documents
         |  WHERE $b < $thr
         |  GROUP BY 1),
         |t AS (SELECT source, count(*) AS n_total FROM documents GROUP BY 1)
         |SELECT t.source, t.n_total, coalesce(k.n_kept, 0) AS n_kept
         |FROM t LEFT JOIN k USING (source) ORDER BY source""".stripMargin
    })
}
