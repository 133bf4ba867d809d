package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the persisted-quantile-sketch family (round 9):
  * per-batch knot build at ~17× the sf0.1 events volume, then the three
  * consumers — merged-knot quantiles, sketch-fenced winsorize, and the
  * zero-rescan PSI — timed against their exact-rescan counterparts. The
  * claim under test: consumer cost is knot-sized (batches × K rows)
  * while the exact paths rescan the value history every evaluation.
  * Synthetic values on the 2-dp money grid over `days` ingest batches.
  *
  * Usage: runMain graft.ProbeSketch [nRows] [days]
  */
object ProbeSketch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[sk] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toInt).getOrElse(10000000)
    val days = args.lift(1).map(_.toInt).getOrElse(30)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // skewed-ish 2-dp values over `days` batches
    val ev = spark.range(nRows.toLong).select(
      (pmod(xxhash64(col("id")), lit(100000)).cast("double") / 100.0)
        .as("value"),
      pmod(xxhash64(col("id"), lit(7)), lit(days)).as("day"))
      .localCheckpoint()

    val knots = 64
    val sketch = t(s"knot build $nRows rows, $days batches, K=$knots")(
      graft.ops.Sketches.quantileSketchBuild(ev, col("value"), col("day"),
        knots).localCheckpoint())
    println(s"  knot rows: ${sketch.count()} (≤ batches×K = ${days * knots})")
    t("merged quantiles from knots (5 pcts)")(
      graft.ops.Sketches.quantileSketchQuantiles(sketch,
        Seq(5, 25, 50, 75, 95)).collect())
    t("EXACT percentile over history (the rescan this replaces)")(
      ev.agg(percentile(col("value"),
        array(lit(0.05), lit(0.25), lit(0.5), lit(0.75), lit(0.95))))
        .collect())
    val cur = ev.filter(col("day") === 0).localCheckpoint()
    t("zero-rescan PSI (baseline = knots only, current = 1 batch)")(
      graft.ops.Drift.psiAgainstSketch(sketch, cur, "value", 10).collect())
    t("exact-edge PSI (rescans baseline twice: edges + counts)")(
      graft.ops.Drift.psiBuckets(ev, cur, "value", 10).collect())
    t("sketch-fenced winsorize (fences from knots, one clip pass)")(
      println(graft.ops.Prep.winsorizeFromSketch(ev, "value", col("day"),
        knots, 5, 95).filter(col("clipped_lo") || col("clipped_hi"))
        .count()))
    spark.stop()
  }
}
