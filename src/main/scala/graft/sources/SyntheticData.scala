package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded synthetic event generator mirroring the reference's
  * `generate_advanced_example_data` (`ML Feature Store Pipeline.py:569-607`):
  * uniform user ids, categorical event types with the same probabilities,
  * exponential purchase amounts gated to purchase events, and
  * chronologically sorted exponential timestamps.
  *
  * Distribution-equivalent, not bit-equivalent: numpy's Mersenne-Twister
  * streams are not reproducible with Spark expressions; what is preserved
  * is every declared distribution and the determinism (same seed → same
  * data). Generation is `spark.range`-parallel — no driver-side row loop —
  * so the same generator scales to billions of rows.
  *
  * NEVER pointed at /root/testdata — utility for user pipelines and tests.
  */
object SyntheticData {

  private val EventTypes = Seq("click", "view", "purchase", "add_to_cart", "search")
  private val EventProbs = Seq(0.4, 0.3, 0.1, 0.15, 0.05)

  /** Generate `nEvents` events across `nUsers` users, seeded. */
  def events(
      spark: SparkSession,
      nEvents: Long = 1000,
      nUsers: Int = 100,
      seed: Long = 42L): DataFrame = {
    // categorical sampling via the cumulative-probability ladder
    val u = rand(seed + 1)
    val cum = EventProbs.scanLeft(0.0)(_ + _).tail
    val eventType = EventTypes.zip(cum).reverse
      .foldLeft(lit(EventTypes.last)) { case (acc, (name, c)) =>
        when(u < c, lit(name)).otherwise(acc)
      }
    // exponential(scale) = -scale · ln(1 − U); purchases only (`:585-589`)
    val amount = when(col("event_type") === "purchase",
      -lit(50.0) * log(lit(1.0) - rand(seed + 2))).otherwise(0.0)
    // exponential inter-hour offsets from a 2023-01-01 base, sorted (`:591-597`)
    val hours = -lit(2.0) * log(lit(1.0) - rand(seed + 3))
    spark.range(nEvents)
      .withColumn("user_id", (floor(rand(seed) * nUsers) + 1).cast("long"))
      .withColumn("event_type", eventType)
      .withColumn("amount", amount)
      .withColumn("timestamp", timestamp_seconds(
        unix_timestamp(lit("2023-01-01 00:00:00")).cast("double") +
          hours * 3600.0))
      .orderBy("timestamp")
      .select("user_id", "event_type", "amount", "timestamp")
  }

  /** Generate and persist as the reference-shaped raw-events CSV (`:606`). */
  def writeRawEventsCsv(spark: SparkSession, path: String,
      nEvents: Long = 1000, nUsers: Int = 100, seed: Long = 42L): Unit =
    Tables.writeCsv(events(spark, nEvents, nUsers, seed), path)
}
