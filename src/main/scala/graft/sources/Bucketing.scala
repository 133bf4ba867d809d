package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: pre-shuffle a fact table ONCE at write time so
  * every later equi-join/aggregation on the bucket key runs shuffle-free.
  *
  * At 100 TB this is the difference between re-exchanging the fact table on
  * every query and never exchanging it: two tables bucketed by the same key
  * into the same bucket count sort-merge-join with zero Exchange on either
  * side (verified by BucketingSpec against the physical plan). Bucket count
  * should be sized so one bucket ≈ one task's worth of data (128–512 MB).
  */
object Bucketing {

  /** Persist `df` as a bucketed+sorted managed table (parquet). Bucketing
    * requires the table catalog — plain `.parquet(path)` files cannot carry
    * bucket metadata.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the join key: no
    * Exchange on either side when bucket specs line up.
    */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      on: Seq[String],
      joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on, joinType)
}
