package graft.queries

import graft.ops.{PointInTime, Prep}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Oracle-checked feature-engineering family — the two serving shapes a
  * feature store exists for (the reference stores versioned feature rows
  * precisely to answer these, `ML Feature Store Pipeline.py:286-309`):
  * point-in-time-correct training-matrix assembly
  * ([[graft.ops.PointInTime]]) and trailing event-time window features
  * ([[graft.ops.Prep.rollingTimeFeatures]]).
  *
  * Both oracles run on native DuckDB machinery (chained `ASOF LEFT JOIN`,
  * `RANGE` frames over epoch microseconds), so the semantics — inclusive
  * as-of, peers-in-frame — are pinned against an independent
  * implementation, not a transliteration.
  */
object FeatureQueries {

  private val RollWindowMicros = 2L * 86400L * 1000000L // trailing 2 days

  /** Training matrix for purchase labels: each purchase event joined, as of
    * its timestamp, with (a) the user's latest click value and (b) the
    * user's running view count — two independently-built feature groups
    * folded onto the label spine through the NATIVE sorted-merge as-of
    * operator. Feature groups are pre-aggregated unique per (user, ts)
    * ([[graft.ops.AsofJoin]]'s contract; ties inside a timestamp resolve
    * by max event_id, mirrored in the oracle's `arg_max`).
    */
  def pitTrainingMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val labels = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value").as("label_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("c_ts_us"))
      .agg(max_by(col("value"), col("event_id")).as("last_click_value"))
    val views = ev.filter(col("event_type") === "view")
      .withColumn("__vs", count(lit(1)).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), unix_micros(col("ts")).as("v_ts_us"))
      .agg(max(col("__vs")).as("views_asof"))
    PointInTime.trainingMatrix(labels, "user_id", "ts_us",
        Seq(
          PointInTime.FeatureGroup(clicks, "user_id", "c_ts_us",
            Seq("last_click_value")),
          PointInTime.FeatureGroup(views, "user_id", "v_ts_us",
            Seq("views_asof"))),
        native = true)
      .withColumn("views_asof", coalesce(col("views_asof"), lit(0L)))
      .select("user_id", "event_id", "ts_us", "label_value",
        "last_click_value", "views_asof")
      .orderBy("user_id", "event_id")
  }

  /** Trailing-2-day rolling value sum + event count per user, for every
    * event row — RANGE frame over epoch micros, DECIMAL-exact sums.
    */
  def rollingWindow(spark: SparkSession, dir: String): DataFrame =
    Prep.rollingTimeFeatures(Tables.events(spark, dir), "user_id", "ts",
        "value", RollWindowMicros)
      .select("user_id", "event_id", "roll_value", "roll_events")
      .orderBy("user_id", "event_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pit_training_matrix" -> pitTrainingMatrix,
    "feat_rolling_window" -> rollingWindow)

  val oracle: Map[String, String] = Map(
    // chained native ASOF LEFT JOINs — inclusive (l.ts >= f.ts), one per
    // feature group, exactly the trainingMatrix fold
    "pit_training_matrix" ->
      """WITH l AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |             value AS label_value
        |           FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_ts_us,
        |        arg_max(value, event_id) AS last_click_value
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |vr AS (SELECT user_id, epoch_us(ts) AS v_ts_us,
        |         count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS UNBOUNDED PRECEDING) AS vs
        |       FROM events WHERE event_type = 'view'),
        |v AS (SELECT user_id, v_ts_us, max(vs) AS views_asof
        |      FROM vr GROUP BY 1, 2)
        |SELECT l.user_id, l.event_id, l.ts_us, l.label_value,
        |  c.last_click_value, coalesce(v.views_asof, 0) AS views_asof
        |FROM l
        |ASOF LEFT JOIN c ON l.user_id = c.user_id AND l.ts_us >= c.c_ts_us
        |ASOF LEFT JOIN v ON l.user_id = v.user_id AND l.ts_us >= v.v_ts_us
        |ORDER BY l.user_id, l.event_id""".stripMargin,
    "feat_rolling_window" ->
      s"""SELECT user_id, event_id,
         |  CAST(sum(CAST(round(value, 6) AS DECIMAL(18,6))) OVER w
         |       AS DOUBLE) AS roll_value,
         |  count(*) OVER w AS roll_events
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
         |  RANGE BETWEEN $RollWindowMicros PRECEDING AND CURRENT ROW)
         |ORDER BY user_id, event_id""".stripMargin)
}
