package graft
import graft.queries.QualityQueries
import org.apache.spark.sql.SparkSession

/** Timing probe for the quality-query family at sf0.1 (backs SURVEY §6
  * numbers; same session settings as Bench).
  */
object ProbeQuality {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.range(1000000L).selectExpr("sum(id)").collect()
    t("quantiles warm1")(QualityQueries.quantilesLineitem(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("quantiles warm2")(QualityQueries.quantilesLineitem(spark, dir)
      .write.format("noop").mode("overwrite").save())
    t("drift_psi")(QualityQueries.queries("quality_drift_psi")(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
