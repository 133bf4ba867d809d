package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

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
  * then aggregates once. At 100 TB the breakpoints read off the PERSISTED
  * mergeable quantile sketch instead of a baseline rescan:
  * [[graft.ops.Sketches.quantileSketchQuantiles]] over the merged
  * per-ingest-batch knots ([[graft.ops.Sketches.quantileSketchBuild]])
  * answers the same percent grid within rank error N/K — the breakpoints
  * only define buckets, exactness is not load-bearing there.
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

    psiTail(bucketed(baseline, "n_base"), bucketed(current, "n_cur"))
  }

  /** The shared PSI arithmetic over per-bucket counts (full-outer join —
    * a bucket can be empty on either side — probability floor, round-9
    * contributions).
    */
  private def psiTail(base: DataFrame, cur: DataFrame): DataFrame = {
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

  /** PSI with the baseline breakpoints read off MERGED quantile-sketch
    * knots ([[Sketches.quantileSketchBuild]] per `batchCol` ingest batch →
    * [[Sketches.quantileSketchQuantiles]]) — the persisted-sketch form of
    * [[psiBuckets]], i.e. the N193 swap-in made concrete: a standing PSI
    * monitor re-derives its decile edges from a few KB of persisted knots
    * instead of rescanning baseline history. Edge positions sit within
    * 1/K rank of the exact percentiles — immaterial for bucket
    * DEFINITIONS (the same argument as percentile_approx), but unlike
    * percentile_approx the sketch path is deterministic and replayable,
    * so the whole monitor stays hash-checkable. Bucket counting and the
    * PSI tail are identical to [[psiBuckets]]; comparisons run in the
    * sketch's DECIMAL(18,2) value space.
    */
  def psiBucketsFromSketch(baseline: DataFrame, current: DataFrame,
      valueCol: String, batchCol: Column, knots: Int, buckets: Int = 10)
      : DataFrame = {
    require(buckets >= 2 && 100 % buckets == 0,
      s"buckets must divide 100: $buckets")
    val sketch = Sketches.quantileSketchBuild(baseline, col(valueCol),
      batchCol, knots)
    val pcts = (1 until buckets).map(i => i * (100 / buckets))
    val breaks = Sketches.quantileSketchQuantiles(sketch, pcts)
      .agg(sort_array(collect_list(col("est_value"))).as("__breaks"))
    val v = col(valueCol).cast(DecimalType(18, 2))
    val bucketExpr = (1 until buckets)
      .map(i => when(v > element_at(col("__breaks"), i), 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    def bucketed(df: DataFrame, cntName: String): DataFrame =
      df.crossJoin(broadcast(breaks))
        .select(bucketExpr.cast("long").as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as(cntName))
    psiTail(bucketed(baseline, "n_base"), bucketed(current, "n_cur"))
  }

  /** PSI where the BASELINE side never rescans at all — one step past
    * [[psiBucketsFromSketch]] (which reads edges from the knots but
    * still re-counts baseline rows per bucket): baseline bucket masses
    * come from the knots' own merged rank estimates
    * ([[Sketches.quantileSketchRanks]] — mass(bucket i) =
    * est_rank(edge_i) − est_rank(edge_{i−1}), last bucket = N − rank of
    * the top edge), each within buckets·N/K of exact by the sketch
    * guarantee. The current micro-batch is counted exactly with the same
    * edge rule; the PSI tail is [[psiBuckets]]'s verbatim. This is the
    * true standing-monitor shape: per evaluation the baseline cost is
    * the knot relation (batches × K rows), ZERO history reads —
    * compose with [[graft.store.FeatureStore.writeBatchSketches]]'s
    * persisted knots for drift-on-ingest. All integer arithmetic up to
    * the shared probability tail, so the whole monitor hash-replays.
    */
  def psiAgainstSketch(sketch: DataFrame, current: DataFrame,
      valueCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2 && 100 % buckets == 0,
      s"buckets must divide 100: $buckets")
    val pcts = (1 until buckets).map(i => i * (100 / buckets))
    val breaks = Sketches.quantileSketchQuantiles(sketch, pcts)
      .agg(sort_array(collect_list(col("est_value"))).as("__breaks"),
        max(col("n_total")).as("__n"))
    val ranks = Sketches.quantileSketchRanks(sketch)
    // est cumulative baseline count at each edge: the largest knot ≤ edge
    val baseCum = breaks
      .select(posexplode(col("__breaks")).as(Seq("__i", "__edge")),
        col("__n"))
      .join(ranks, col("v") <= col("__edge"), "left_outer")
      .groupBy(col("__i"), col("__edge"), col("__n"))
      .agg(coalesce(max(col("est_rank")), lit(0L)).as("__cum"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy(col("__i"))
    val base = baseCum
      .withColumn("__prev",
        coalesce(lag(col("__cum"), 1).over(wOrd), lit(0L)))
      .select((col("__i") + 1).cast("long").as("bucket"),
        (col("__cum") - col("__prev")).as("n_base"), col("__n"),
        col("__cum"))
    // rows above: buckets-1 edge rows; append the top bucket (N − cum)
    val topBucket = base.filter(col("bucket") === (buckets - 1).toLong)
      .select(lit(buckets.toLong).as("bucket"),
        (col("__n") - col("__cum")).as("n_base"))
    val baseCounts = base.select(col("bucket"), col("n_base"))
      .unionByName(topBucket)
    val v = col(valueCol).cast(DecimalType(18, 2))
    val bucketExpr = (1 until buckets)
      .map(i => when(v > element_at(col("__breaks"), i), 1).otherwise(0))
      .foldLeft(lit(1): Column)(_ + _)
    val curCounts = current
      .crossJoin(broadcast(breaks.select(col("__breaks"))))
      .select(bucketExpr.cast("long").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("n_cur"))
    psiTail(baseCounts, curCounts)
  }

  /** Scalar PSI (sum of bucket contributions). */
  def psi(baseline: DataFrame, current: DataFrame, valueCol: String,
      buckets: Int = 10): DataFrame =
    psiBuckets(baseline, current, valueCol, buckets)
      .agg(round(sum(col("contribution")), 9).as("psi"),
        count(lit(1)).as("n_buckets"))

  /** Total-variation distance between two CATEGORICAL distributions —
    * the drift check for label/segment/source columns, where PSI's
    * quantile buckets and W₁'s value metric don't apply: per category the
    * share gap, and `TV = ½ Σ_c |p_a(c) − p_b(c)|` (the largest possible
    * probability difference any event can have between the two
    * distributions).
    *
    * Same integer discipline as [[wasserstein1]]/KS: ONE group-by to
    * per-category counts, gaps as the integer cross-product
    * `|c_a·n_b − c_b·n_a|`, a window-sum of those integers, and one
    * double division each for the displayed shares/contribution/total.
    * Returns one row per category: (category, n_a, n_b, p_a, p_b,
    * abs_diff, tv); tv is the same on every row.
    */
  def tvDistance(df: DataFrame, catCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val perC = df.filter(col(groupCol).isin(a, b))
      .select(col(catCol).cast("string").as("category"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
      .groupBy("category").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    val all = Window.partitionBy()
    perC
      .withColumn("na", sum(col("ca")).over(all))
      .withColumn("nb", sum(col("cb")).over(all))
      .withColumn("dn", abs(col("ca") * col("nb") - col("cb") * col("na")))
      .select(col("category"), col("na").as("n_a"), col("nb").as("n_b"),
        round(col("ca").cast(DoubleType) / col("na"), 9).as("p_a"),
        round(col("cb").cast(DoubleType) / col("nb"), 9).as("p_b"),
        round(col("dn").cast(DoubleType) / (col("na") * col("nb")), 9)
          .as("abs_diff"),
        round(sum(col("dn")).over(all).cast(DoubleType) /
          (col("na") * col("nb") * 2), 9).as("tv"))
  }

  /** Bhattacharyya coefficient + Hellinger distance between the
    * `catCol` distributions of groups `a` and `b` —
    * BC = Σ_c √(p_c·q_c), H = √(1 − BC): the bounded-metric member of
    * the drift family ([[tvDistance]]'s L1 read, [[psi]]'s log read) —
    * H is a true metric on distributions and never blows up on empty
    * cells the way PSI's log-ratio does.
    *
    * Exactness: each cell's √(p·q) = √(ca·cb/(na·nb)) is ONE sqrt over
    * a ratio of exact integer products — but the value can be RATIONAL
    * (perfect-square ratios), so instead of a 9-dp round (half-ulp tie
    * risk, the Cramér's-V lesson) each contribution quantizes by
    * TRUNCATION: floor(√·10⁹) — floor is an exact function of the
    * shared double, bit-identical on any engine — and the nano longs
    * sum exactly. BC and H then emit UNROUNDED (one division; one
    * sqrt of an exact rational).
    *
    * Scale shape: identical to [[tvDistance]] — one category group-by,
    * windows over the category-bounded relation. Returns one row:
    * (n_a, n_b, n_categories, bc, hellinger).
    */
  def hellingerDistance(df: DataFrame, catCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val perC = df.filter(col(groupCol).isin(a, b))
      .select(col(catCol).cast("string").as("category"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
      .groupBy("category").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    val all = Window.partitionBy()
    val contribNano = floor(sqrt(
      (col("ca") * col("cb")).cast(DoubleType) /
        (col("na") * col("nb")).cast(DoubleType)) * lit(1.0e9))
      .cast("long")
    perC
      .withColumn("na", sum(col("ca")).over(all))
      .withColumn("nb", sum(col("cb")).over(all))
      .withColumn("__c", contribNano)
      .groupBy(col("na").as("n_a"), col("nb").as("n_b"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__c")).as("__bc_nano"))
      .select(col("n_a"), col("n_b"), col("n_categories"),
        (col("__bc_nano").cast(DoubleType) / lit(1.0e9)).as("bc"),
        sqrt(greatest(lit(1.0) -
          col("__bc_nano").cast(DoubleType) / lit(1.0e9), lit(0.0)))
          .as("hellinger"))
  }

  /** Exact 1-Wasserstein (earth-mover) distance between two samples of a
    * ≤2-dp value column — the drift metric with UNITS (W₁ is "average
    * value displacement", so a 0.4 shift on a dollar column means 40
    * cents), complementing PSI's unitless score and KS's sup-norm:
    * `W₁ = ∫ |F_a − F_b| dx` over the merged distinct-value grid.
    *
    * The KS-grid discipline end to end: one group-by collapses both sides
    * to per-distinct-value counts; cumulative windows over THAT bounded
    * grid. Exactness: |F_a − F_b| stays the INTEGER cross-product
    * `|cum_a·n_b − cum_b·n_a|`, the grid gap is an exact DECIMAL(18,2)
    * difference, contributions sum in DECIMAL(38,4), and ONE double
    * division by n_a·n_b happens at the very end — the only IEEE op in
    * the whole statistic. Returns (n_a, n_b, w1).
    */
  def wasserstein1(df: DataFrame, valueCol: String, groupCol: String,
      a: String, b: String): DataFrame = {
    val xd = col(valueCol).cast(DecimalType(18, 2))
    val perV = df.filter(col(groupCol).isin(a, b) && col(valueCol).isNotNull)
      .select(xd.as("v"),
        when(col(groupCol) === a, 1L).otherwise(0L).as("ia"),
        when(col(groupCol) === b, 1L).otherwise(0L).as("ib"))
      .groupBy("v").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    // two-phase salted CDF walk over the merged grid ([[SaltedGrid]]) —
    // a continuous column makes the grid row-scale; the helper also
    // carries the next grid value across bucket boundaries
    SaltedGrid.cumulative(perV, "v", Seq("ca", "cb"), withNext = true)
      // last grid point: __next is null → gap 0 → no contribution
      .withColumn("gap",
        coalesce(col("__next") - col("v"), lit(0).cast(DecimalType(18, 2))))
      .select(col("__tot_ca").as("na"), col("__tot_cb").as("nb"),
        (abs(col("__cum_ca") * col("__tot_cb") -
          col("__cum_cb") * col("__tot_ca")) * col("gap"))
          .cast(DecimalType(38, 4)).as("c"))
      .groupBy("na", "nb").agg(sum(col("c")).as("__num"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        round(col("__num").cast(DoubleType) / (col("na") * col("nb")), 9)
          .as("w1"))
  }
}
