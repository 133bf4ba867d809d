package graft.extract

import graft.functions.Exact
import graft.model.FeatureConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Extractor interface mirroring the reference ABC
  * (`ML Feature Store Pipeline.py:59-67`): a whole-relation transform plus a
  * declared output schema. Implementations must stay in Column-expression
  * space (no row UDFs) so Catalyst can optimize the full plan.
  */
trait FeatureExtractor {
  def extract(df: DataFrame): DataFrame
  def featureConfigs: Seq[FeatureConfig]
}

/** The flagship query (`UserEventExtractor.extract`,
  * `ML Feature Store Pipeline.py:164-183`): one hash aggregation keyed on
  * `user_id` producing 8 aggregates and 2 derived columns.
  *
  * Physical shape at scale: FileScan(events, pruned to the 4 needed
  * columns) → partial HashAggregate → Exchange(user_id) → final
  * HashAggregate → Project. One shuffle; `countDistinct` adds an expand +
  * second aggregate, still key-partitioned. No driver materialization.
  *
  * Semantic traps carried over faithfully (SURVEY.md §2.3):
  *  - `total_purchases` counts rows with positive amount (`:167`).
  *  - `avg_amount` averages only positive amounts and is null for users
  *    with none (`:169`), repaired to 0 afterwards (`:177`).
  *  - `days_active` is pandas `Timedelta.days` — truncating *duration*
  *    days, not a calendar-date diff (`:173`): floor(Δµs / 86400e6) + 1.
  *
  * @param userCol   group key column
  * @param typeCol   event-type column (counted, distinct-counted)
  * @param amountCol monetary column (≤2 dp; aggregated exactly via DECIMAL)
  * @param tsCol     event-time TimestampType column (µs precision)
  */
final class UserEventExtractor(
    userCol: String = "user_id",
    typeCol: String = "event_type",
    amountCol: String = "value",
    tsCol: String = "ts")
  extends FeatureExtractor {

  def extract(df: DataFrame): DataFrame = {
    val amount = col(amountCol)
    val maxUs  = unix_micros(max(col(tsCol)))
    val minUs  = unix_micros(min(col(tsCol)))
    df.groupBy(col(userCol))
      .agg(
        count(col(typeCol)).as("total_events"),
        sum(when(amount > 0, 1L).otherwise(0L)).as("total_purchases"),
        Exact.sumMoney(amount).as("total_amount"),
        Exact.avgMoney(when(amount > 0, amount)).as("avg_amount"),
        max(col(tsCol)).as("last_event_time"),
        min(col(tsCol)).as("first_event_time"),
        countDistinct(col(typeCol)).as("unique_event_types"),
        (floor((maxUs - minUs) / lit(86400000000L)).cast("long") + 1L)
          .as("days_active"))
      .na.fill(0.0, Seq("avg_amount"))
      .withColumn("purchase_rate",
        col("total_purchases").cast("double") / col("total_events"))
      .withColumn("avg_events_per_day",
        col("total_events").cast("double") / col("days_active"))
  }

  def featureConfigs: Seq[FeatureConfig] = Seq(
    FeatureConfig(userCol, "int64", "User identifier"),
    FeatureConfig("total_events", "int64", "Total number of events"),
    FeatureConfig("total_purchases", "int64", "Events with positive amount"),
    FeatureConfig("total_amount", "float64", "Total amount"),
    FeatureConfig("avg_amount", "float64", "Average positive amount (0 if none)"),
    FeatureConfig("last_event_time", "datetime64[ns]", "Latest event time"),
    FeatureConfig("first_event_time", "datetime64[ns]", "Earliest event time"),
    FeatureConfig("unique_event_types", "int64", "Distinct event types"),
    FeatureConfig("days_active", "int64", "Truncated duration days + 1"),
    FeatureConfig("purchase_rate", "float64", "total_purchases / total_events"),
    FeatureConfig("avg_events_per_day", "float64", "total_events / days_active"))
}
