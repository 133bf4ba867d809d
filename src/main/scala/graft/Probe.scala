package graft
import org.apache.spark.sql.SparkSession
/** Scratch probe for environment behavior (timestamp[ns] parquet, etc). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    import org.apache.spark.sql.functions._
    ev.select(col("ts"), timestamp_micros(floor(col("ts") / 1000L).cast("long")).as("tus"))
      .show(3, false)
    spark.stop()
  }
}
