package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's hot-stratum row: one stratum
  * holding ALL rows — the adversarial case for per-stratum ranking —
  * sampled via the naive single-window rank (serializes the stratum into
  * one task) vs the production two-phase salted rank
  * ([[graft.ops.Prep.stratifiedSample]]). Usage:
  * `runMain graft.ProbeHotStratum [nRows]`.
  */
object ProbeHotStratum {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 5000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(n).select(lit("hot").as("stratum"),
      col("id").as("key"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: $rows rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("naive single-window rank") {
      df.withColumn("__mh", md5(col("key").cast("string")))
        .withColumn("rn", row_number().over(
          Window.partitionBy("stratum").orderBy(col("__mh"), col("key"))))
        .filter(col("rn") <= ceil(lit(n) * 0.1))
        .count()
    }
    time("two-phase salted rank (Prep.stratifiedSample)") {
      graft.ops.Prep.stratifiedSample(df, Seq("stratum"), "key", 0.1)
        .count()
    }
    spark.stop()
  }
}
