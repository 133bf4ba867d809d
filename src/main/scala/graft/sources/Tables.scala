package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed loaders for the driver parquet tables (TESTDATA.md).
  *
  * Design notes for scale:
  *  - Always `spark.read.parquet` (columnar, splittable); column pruning and
  *    predicate pushdown reach the scan because callers compose plain
  *    DataFrame ops on top.
  *  - `events.ts` is physically INT64 TIMESTAMP(NANOS) which Spark cannot
  *    read as a timestamp (PARQUET_TYPE_ILLEGAL). We read it as raw Long
  *    nanos (`spark.sql.legacy.parquet.nanosAsLong`) and convert with
  *    integer division to microseconds — bit-exact with DuckDB's
  *    `epoch_us(ts)` on the same file. Never route the ns value through a
  *    Double: 1.7e18 exceeds 2^53 and the division would wobble ±256 ns.
  */
object Tables {

  /** Canonical events relation: `ts` is TimestampType at microsecond
    * precision (matches DuckDB's read of the same parquet), `ts_us` the
    * epoch-micros Long used for exact integer arithmetic in oracle-checked
    * queries.
    *
    * The physical `ts` encoding has varied across driver data drops:
    * INT64 TIMESTAMP(NANOS) (unreadable as a Spark timestamp — read as raw
    * Long nanos and integer-divide to µs) vs TIMESTAMP(MICROS,
    * isAdjustedToUTC=false). For the latter we disable NTZ inference so the
    * stored µs value is read as a UTC instant — `unix_micros` then returns
    * the stored integer exactly, bit-equal with DuckDB's `epoch_us(ts)` on
    * the same file. Both paths dispatch on the file schema, never on
    * config.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val tsUs = raw.schema("ts").dataType match {
      case LongType => expr("ts div 1000").cast(LongType) // nanos-as-long
      case _        => unix_micros(col("ts"))             // native µs stamp
    }
    raw.withColumn("ts_us", tsUs)
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Reference-shaped raw-event CSV source (reference reads
    * `data/raw_events.csv` with a parsed timestamp column —
    * `ML Feature Store Pipeline.py:623`). Schema is explicit: production
    * scans never infer.
    */
  val rawEventsSchema: StructType = StructType(Seq(
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("amount", DoubleType),
    StructField("timestamp", TimestampType)))

  def rawEventsCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(rawEventsSchema).option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true")
      // pandas-shaped timestamps ("2023-01-01 00:05:37.123456"), matching
      // the reference CSV and the rawEventsCsv read format above
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss.SSSSSS")
      .csv(path)

  /** ORC sink/source — the OTHER columnar interchange format a warehouse
    * neighbor (Hive/Trino estates) hands over; Spark's native ORC reader
    * preserves nested arrays/structs and zlib-compresses by default, so a
    * round-trip is lossless for every table schema in this library
    * (spec-pinned on documents AND embeddings, incl. the float-array
    * column). Production scans never infer: the reader takes the writer's
    * file schema, same as parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
