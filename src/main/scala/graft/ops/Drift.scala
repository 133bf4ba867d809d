package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature-drift detection between two relation snapshots — the
  * monitoring operator a production feature store runs between versions
  * (the reference's alerting stops at quality-score thresholds;
  * `ML Feature Store Pipeline.py:217-220`).
  *
  * Population Stability Index over quantile buckets of the BASELINE
  * distribution: `PSI = Σ_i (p_cur,i − p_base,i) · ln(p_cur,i / p_base,i)`.
  * Common reading: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 major.
  *
  * Scale design: breakpoints are computed IN-PLAN (exact `percentile` to
  * an array column, broadcast via a 1-row cross join — no driver collect),
  * bucketing is a CODEGEN'D chain of `element_at` comparisons — one
  * `when(value > breaks[i])` term per breakpoint, unrolled at plan time
  * (bucket counts are small constants) — NOT a higher-order `aggregate`
  * fold, which is CodegenFallback and was ~10× slower per row. Each side
  * then aggregates once. Swap `percentile` for `percentile_approx` at
  * 100 TB — the breakpoints only define buckets, exactness is not
  * load-bearing there.
  */
object Drift {

  private val MinP = 1e-6 // empty-bucket clamp so ln() stays finite

  /** Per-bucket PSI decomposition: (bucket, n_base, n_cur, p_base, p_cur,
    * contribution), buckets 1..`buckets` over baseline quantiles.
    */
  def psiBuckets(
      baseline: DataFrame,
      current: DataFrame,
      valueCol: String,
      buckets: Int = 10): DataFrame = {
    val qs = (1 until buckets).map(i => lit(i.toDouble / buckets))
    val breaks = baseline.agg(
      percentile(col(valueCol), array(qs: _*)).as("__breaks"))

    // bucket = 1 + |{breaks below value}|, unrolled per breakpoint index so
    // the whole expression stays inside whole-stage codegen (element_at and
    // when/sum chains codegen; a lambda `aggregate` fold does not)
    val bucketExpr = (1 until buckets)
      .map(i => when(col(valueCol) > element_at(col("__breaks"), i), 1)
        .otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)

    def bucketed(df: DataFrame, cntName: String): DataFrame =
      df.crossJoin(breaks)
        .select(bucketExpr.cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(cntName))

    val base = bucketed(baseline, "n_base")
    val cur = bucketed(current, "n_cur")
    // full outer: a bucket can be empty on either side
    val joined = base.join(cur, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_base"), lit(0L)).as("n_base"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum(col("n_base")).as("__tb"),
      sum(col("n_cur")).as("__tc"))
    def p(cnt: Column, tot: Column): Column =
      greatest(cnt.cast("double") / tot, lit(MinP))
    joined.crossJoin(totals)
      .select(col("bucket"), col("n_base"), col("n_cur"),
        round(p(col("n_base"), col("__tb")), 9).as("p_base"),
        round(p(col("n_cur"), col("__tc")), 9).as("p_cur"),
        round((p(col("n_cur"), col("__tc")) - p(col("n_base"), col("__tb"))) *
          log(p(col("n_cur"), col("__tc")) / p(col("n_base"), col("__tb"))), 9)
          .as("contribution"))
  }

  /** Scalar PSI (sum of bucket contributions). */
  def psi(baseline: DataFrame, current: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame =
    psiBuckets(baseline, current, valueCol, buckets)
      .agg(round(sum(col("contribution")), 9).as("psi"),
        count(lit(1)).as("n_buckets"))
}
