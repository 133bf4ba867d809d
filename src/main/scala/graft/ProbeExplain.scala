package graft
import org.apache.spark.sql.SparkSession

/** Physical-plan dump for one registered query — the quick `.explain`
  * console the plan audits use (join strategies, exchanges, pushed
  * filters) without writing a bespoke main each time.
  *
  * Usage: `runMain graft.ProbeExplain <sfDir> <queryName>`.
  */
object ProbeExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
  }
}
