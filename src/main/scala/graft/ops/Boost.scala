package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Histogram-based gradient-boosted decision stumps — the LightGBM-style
  * split search (Ke et al., NeurIPS 2017, "LightGBM: A Highly Efficient
  * Gradient Boosting Decision Tree") re-expressed as relational algebra.
  * The reference ships feature ENGINEERING but no trainer beyond what a
  * notebook would bolt on (`ML Feature Store Pipeline.py:225-309` stops at
  * feature groups); a feature store that cannot cheaply fit a baseline
  * model on its own training matrix pushes that cost to every consumer,
  * so the trainer rides here as a first-class operator.
  *
  * Squared-error boosting, depth-1 trees, learning rate 1/2:
  *
  *   1. BIN once: each feature maps to `bins` fixed-width buckets via
  *      exact integer arithmetic on the feature's global [min, max] —
  *      `(x − mn)·B div (mx − mn + 1)` — so the histogram grid is
  *      engine-portable (no float bin edges, no quantile sketch drift).
  *   2. Per round: residuals against the current prediction are EXACT
  *      DECIMAL(28,9); ONE shuffle aggregates (feature, bin) → (Σg, n)
  *      over the stacked features; prefix sums over the bins give every
  *      candidate split's left/right mass from one tiny relation
  *      (features × bins rows, never row-scale).
  *   3. Split gain `G_L²/n_L + G_R²/n_R` is IEEE double computed from the
  *      exact sums, rounded to 6 dp; argmax is a lexicographic struct max
  *      with (−feature, −bin) tie-breaks — fully deterministic, mirrored
  *      verbatim in the DuckDB oracle.
  *   4. Leaf values `η·G/n` round to 9 dp (the [[graft.ops.TokenModels]]
  *      bits9 discipline) and fold into the prediction as an exact
  *      DECIMAL add, so round t+1's residuals are bit-identical on any
  *      engine/partitioning.
  *
  * Shape at scale: the row-scale work per round is one map (residual +
  * stack) and one bounded aggregation — the classic distributed-GBM
  * layout where only histograms cross the wire, never rows. The chosen
  * split is a 1-row broadcast back onto the data. With T rounds the
  * total is T bounded shuffles over an id-partitioned checkpoint; no
  * driver collect anywhere.
  */
object Boost {

  private val P = DecimalType(28, 9) // prediction / leaf-value carrier

  /** Exact floor division for BIGINT columns (any-sign numerator):
    * `(n − pmod(n, d)) / d` — both operands of the final `/` are exact
    * doubles below 2⁵³ whose quotient is an exact integer, so the IEEE
    * division is lossless; DuckDB spells the same thing `n // d`.
    */
  private def floorDiv(n: Column, d: Column): Column =
    ((n - pmod(n, d)) / d).cast("long")

  /** Fitted state: the binned base with its final prediction, plus the
    * per-round model rows.
    */
  private[graft] case class Fit(scored: DataFrame, model: DataFrame)

  /** Fit `rounds` stumps over BIGINT features `featCols` of `base`
    * (columns `idCol`, `labelCol` ∈ {0,1} or any small numeric, and the
    * features). Requires ≥ 1 non-constant feature. Returns the scored
    * base (`id`, `y`, `pred`) and the model (one row per round).
    */
  private[graft] def fit(base: DataFrame, idCol: String, labelCol: String,
      featCols: Seq[String], bins: Int = 16, rounds: Int = 3): Fit = {
    require(featCols.nonEmpty && bins >= 2 && rounds >= 1,
      "gbm needs >=1 feature, >=2 bins, >=1 round")
    val nf = featCols.length
    val mmAggs = featCols.zipWithIndex.flatMap { case (f, i) =>
      Seq(min(col(f)).as(s"__mn$i"), max(col(f)).as(s"__mx$i")) }
    val minmax = base.agg(mmAggs.head, mmAggs.tail: _*)
    val binCols = featCols.zipWithIndex.map { case (f, i) =>
      least(lit(bins - 1), floorDiv((col(f) - col(s"__mn$i")) * bins,
        col(s"__mx$i") - col(s"__mn$i") + 1)).cast("int").as(s"__b$i") }
    // base prediction = round(mean(y), 9): one row, broadcast
    val p0 = base.agg(round(sum(col(labelCol)).cast(DoubleType) /
        count(lit(1)), 9).cast(P).as("__p0"))
    var cur = base.crossJoin(broadcast(minmax)).crossJoin(broadcast(p0))
      .select(Seq(col(idCol).as("__id"),
        col(labelCol).cast(P).as("__y"), col("__p0").as("__pred")) ++
        binCols: _*)
      .localCheckpoint()
    val models = (1 to rounds).map { t =>
      // ONE bounded shuffle: stacked (feature, bin, residual) histogram
      val stacked = cur.select(col("__y"), col("__pred"),
          posexplode(array((0 until nf).map(i => col(s"__b$i")): _*))
            .as(Seq("__f", "__b")))
        .groupBy("__f", "__b")
        .agg(sum(col("__y") - col("__pred")).as("__g"),
          count(lit(1)).as("__n"))
      val w = Window.partitionBy("__f").orderBy("__b")
      // the RIGHT-side residual mass is its own following-frame window
      // sum, NOT total − left: subtracting two DECIMAL(38,9) window sums
      // needs precision 39 and Spark silently rescales the result to
      // (38,8) — an extra 8-dp rounding the oracle replay doesn't have
      // (BoostSpec's boundary fixture caught it). Counts subtract fine
      // (BIGINT).
      val wAfter = Window.partitionBy("__f").orderBy("__b")
        .rowsBetween(1, Window.unboundedFollowing)
      val tot = Window.partitionBy("__f")
      val pf = stacked.select(col("__f"), col("__b"),
        sum(col("__g")).over(w).as("__gl"),
        sum(col("__n")).over(w).as("__nl"),
        sum(col("__g")).over(wAfter).as("__gr0"),
        sum(col("__n")).over(tot).as("__nt"))
      val cand = pf.filter(col("__b") < bins - 1 &&
          col("__nl") > 0 && col("__nt") - col("__nl") > 0)
        .select(col("__f"), col("__b"),
          col("__gr0").as("__gr"),
          (col("__nt") - col("__nl")).as("__nr"),
          col("__gl"), col("__nl"))
        .select(col("__f"), col("__b"),
          round(col("__gl").cast(DoubleType) * col("__gl").cast(DoubleType)
              / col("__nl") +
            col("__gr").cast(DoubleType) * col("__gr").cast(DoubleType)
              / col("__nr"), 6).as("__gain"),
          round(col("__gl").cast(DoubleType) / (col("__nl") * 2), 9)
            .cast(P).as("__vl"),
          round(col("__gr").cast(DoubleType) / (col("__nr") * 2), 9)
            .cast(P).as("__vr"))
      val best = cand
        .agg(max(struct(col("__gain"), (-col("__f")).as("__mf"),
          (-col("__b")).as("__mb"), col("__vl"), col("__vr"))).as("__s"))
        .select(lit(t).as("round"), col("__s.__mf").as("__nf"),
          col("__s.__mb").as("__nb"), col("__s.__vl").as("__vl"),
          col("__s.__vr").as("__vr"), col("__s.__gain").as("__gain"))
        .localCheckpoint()
      val leaf = when((0 until nf).map(i =>
            col("__nf") === -i && col(s"__b$i") <= -col("__nb"))
          .reduce(_ || _), col("__vl")).otherwise(col("__vr"))
      cur = cur.crossJoin(broadcast(best))
        .select(Seq(col("__id"), col("__y"),
          (col("__pred") + leaf).cast(P).as("__pred")) ++
          (0 until nf).map(i => col(s"__b$i")): _*)
        .localCheckpoint()
      best
    }
    val model = models.reduce(_ union _)
      .select(col("round"),
        element_at(array(featCols.map(lit): _*), -col("__nf") + 1)
          .as("feature"),
        (-col("__nb")).cast("int").as("split_bin"),
        // re-round post-cast: the decimal value sits ON the 1e-9 grid, so
        // rounding the double normalizes any 1-ulp cast asymmetry between
        // engines (mirrored in the oracle's round(CAST(...), 9))
        round(col("__vl").cast(DoubleType), 9).as("left_value"),
        round(col("__vr").cast(DoubleType), 9).as("right_value"),
        col("__gain").as("gain"))
    Fit(cur.select(col("__id"), col("__y"), col("__pred")), model)
  }

  /** The fitted model, one row per boosting round:
    * (round, feature, split_bin, left_value, right_value, gain).
    */
  def gbmStumps(base: DataFrame, idCol: String, labelCol: String,
      featCols: Seq[String], bins: Int = 16, rounds: Int = 3): DataFrame =
    fit(base, idCol, labelCol, featCols, bins, rounds).model

  /** Final boosted predictions: (idCol, label, pred). `pred` is the exact
    * DECIMAL accumulation of p₀ + the chosen leaf values, cast to double.
    */
  def gbmScore(base: DataFrame, idCol: String, labelCol: String,
      featCols: Seq[String], bins: Int = 16, rounds: Int = 3): DataFrame =
    fit(base, idCol, labelCol, featCols, bins, rounds).scored
      .select(col("__id").as(idCol), col("__y").cast(DoubleType)
        .as("label"), round(col("__pred").cast(DoubleType), 9).as("pred"))
}
