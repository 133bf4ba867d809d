package graft
import org.apache.spark.sql.SparkSession

/** Writes `.explain("formatted")` for named registered queries to
  * `<outDir>/<query>_<tag>.txt` — the optimization-round evidence files
  * (plans/r16/<query>_before.txt / _after.txt). Formatted mode carries
  * the operator list with PushedFilters/ReadSchema, join strategy and
  * build side, and Exchange placement — the fields the plan audits key
  * on.
  *
  * Usage: `runMain graft.PlanDump <sfDir> <outDir> <tag> <q1,q2,...>`
  * (`all` dumps every registered query).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, list) = args.take(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (list == "all") SparkEntry.queries.keys.toSeq.sorted
      else list.split(",").map(_.trim).filter(_.nonEmpty).toSeq
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // same string explain("formatted") prints, captured instead
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"dumped $n (${txt.length} chars)")
    }
    spark.stop()
  }
}
