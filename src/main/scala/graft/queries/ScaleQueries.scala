package graft.queries

import graft.ops.Skew
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Scale-posture operators (SURVEY.md §7.2.7): the flagged alternates a
  * 100 TB deployment swaps in where exact operators stop scaling, plus the
  * skew-mitigation path.
  *
  * `skew_salted_agg` is oracle-checked against the PLAIN group-by SQL —
  * the whole point of salting is that the two-phase result is identical.
  * The approx queries (HLL distinct, approximate quantiles) have no DuckDB
  * twin by construction → registered without oracle SQL (rows-only check);
  * their exact counterparts are oracle-checked elsewhere
  * (`distinct_counts`, `quality_quantiles_lineitem`).
  */
object ScaleQueries {

  private val Money = DecimalType(18, 2)

  /** Salted two-phase per-user aggregate over the hot-keyed events table —
    * result must equal the plain GROUP BY (see [[graft.ops.Skew]]).
    */
  def skewSaltedAgg(spark: SparkSession, dir: String): DataFrame =
    Skew.saltedAgg(Tables.events(spark, dir), Seq("user_id"),
        saltBuckets = 16,
        partials = Seq(count(lit(1)).as("n_events"),
          sum(col("value").cast(Money)).as("pv")),
        merges = Seq(sum(col("n_events")).as("n_events"),
          sum(col("pv")).cast(DoubleType).as("total_value")))
      .orderBy("user_id")

  /** HLL distinct counts — the streaming/100 TB alternate to exact
    * `count(DISTINCT …)` (`distinct_counts`). Rows-only.
    */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).agg(
      approx_count_distinct(col("user_id")).as("approx_users"),
      approx_count_distinct(col("event_type")).as("approx_event_types"))

  /** Greenwald-Khanna approximate quantiles — the single-pass mergeable
    * alternate to exact `percentile` (`quality_quantiles_lineitem`).
    * Rows-only.
    */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir).agg(
      percentile_approx(col("l_extendedprice"), lit(0.25), lit(10000)).as("p25"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50"),
      percentile_approx(col("l_extendedprice"), lit(0.75), lit(10000)).as("p75"))

  /** Deterministic hash-bucket sampling — the reproducible, engine-portable
    * alternative to `TABLESAMPLE`/`rand()` sampling: a row is in the p%
    * sample iff md5(key) mod 100 < p. The same rows are sampled on any
    * engine, any partitioning, any run — which is what makes sampled
    * dev/CI pipelines debuggable at 100 TB.
    */
  def sampleHashBucket(spark: SparkSession, dir: String): DataFrame = {
    val bucket = pmod(conv(substring(md5(col("event_id").cast("string")), 1, 12),
      16, 10).cast("long"), lit(100))
    Tables.events(spark, dir)
      .filter(bucket < 10)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_sampled"),
        graft.functions.Exact.sumMoney(col("value")).as("sampled_value"))
      .orderBy("event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> skewSaltedAgg,
    "sample_hash_bucket" -> sampleHashBucket,
    "scale_approx_distinct" -> approxDistinct,
    "scale_approx_quantiles" -> approxQuantiles)

  val oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT user_id, count(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "sample_hash_bucket" ->
      """SELECT event_type, count(*) AS n_sampled,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sampled_value
        |FROM events
        |WHERE ('0x' || substr(md5(event_id::VARCHAR), 1, 12))::BIGINT % 100 < 10
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
}
