package graft
import org.apache.spark.sql.SparkSession
object ProbeWscg {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val q = args.lift(1).getOrElse("eval_map_at_k")
    val hml = args.lift(2).map(_.toInt).getOrElse(8000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", hml)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("INFO")
    SparkEntry.queries(q)(spark, dir).write.format("noop")
      .mode("overwrite").save()
    spark.stop()
  }
}
