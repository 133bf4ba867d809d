package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's ntile row: global
  * equal-frequency banding over a row-scale scored relation — the gains
  * table / RFM shape — via the naive `ntile().over(Window.orderBy(…))`
  * (serializes ALL rows into one task's sort) vs the production salted
  * rank + integer band split
  * ([[graft.ops.SaltedGrid.valueRanked]] / ntileBand). Also probes the
  * per-group dominant-slice case (one slice holding 90% of rows — the
  * CCNet one-language-corpus shape) where `partitionBy(slice)` devolves
  * to a single task anyway. Usage: `runMain graft.ProbeNtile [nRows]`.
  */
object ProbeNtile {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(n).select(col("id"),
      ((col("id") * 2654435761L) % 1000003).cast("double").as("score"),
      when((col("id") % 10) === 0, "rare").otherwise("dominant").as("grp"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"$tag: $rows rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    time("naive global ntile(10) single-task sort") {
      df.withColumn("b", ntile(10).over(
          Window.orderBy(col("score"), col("id"))))
        .groupBy("b").count().count()
    }
    time("salted valueRanked + ntileBand(10)") {
      graft.ops.SaltedGrid.valueRanked(df, Nil, col("score"),
          Seq(col("id")))
        .withColumn("b", graft.ops.SaltedGrid.ntileBand(
          col("__rank"), col("__n"), 10))
        .groupBy("b").count().count()
    }
    time("naive per-slice ntile(3), 90% dominant slice") {
      df.withColumn("b", ntile(3).over(
          Window.partitionBy("grp").orderBy(col("score"), col("id"))))
        .groupBy("grp", "b").count().count()
    }
    time("salted per-slice valueRanked + ntileBand(3)") {
      graft.ops.SaltedGrid.valueRanked(df, Seq("grp"), col("score"),
          Seq(col("id")))
        .withColumn("b", graft.ops.SaltedGrid.ntileBand(
          col("__rank"), col("__n"), 3))
        .groupBy("grp", "b").count().count()
    }
    // planted 50%-modal tie (the RFM frequency shape): half the rows share
    // one score value — without the composite (ord, tie-percentile) salt
    // the modal mass serializes into ONE bucket's window task
    val tied = df.withColumn("score",
      when((col("id") % 2) === 0, lit(42.0)).otherwise(col("score")))
    time("salted valueRanked + ntileBand(10), 50%-modal tie") {
      graft.ops.SaltedGrid.valueRanked(tied, Nil, col("score"),
          Seq(col("id")))
        .withColumn("b", graft.ops.SaltedGrid.ntileBand(
          col("__rank"), col("__n"), 10))
        .groupBy("b").count().count()
    }
    spark.stop()
  }
}
