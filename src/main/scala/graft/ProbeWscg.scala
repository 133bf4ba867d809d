package graft
import org.apache.spark.sql.SparkSession

/** Whole-stage-codegen fallback detector (round-13 adjudication, SURVEY
  * §6.0d): runs one registered query at INFO logging and a chosen
  * `spark.sql.codegen.hugeMethodLimit`, so any "Found too long generated
  * codes" events (generated method > limit → stage falls back to
  * non-fused execution) surface with their bytecode sizes. Round 13's
  * finding: ZERO such events remain for eval_map_at_k / the jaccard
  * pair / text_lm_generate at either 8000 or 65535 — the round-12
  * oversized-method hypothesis is closed, and the residual first-pass
  * cost is C2 warm-up breadth, not over-limit methods.
  *
  * Usage: `runMain graft.ProbeWscg [sfDir] [queryName] [hml]`.
  */
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
