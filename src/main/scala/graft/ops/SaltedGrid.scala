package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase distributed cumulative sums over a DISTINCT-VALUE grid — the
  * salted-grid fallback for the library's KS-grid family
  * ([[Eval.aucRoc]], [[Prep.rankNormalize]], [[Prep.quantileMatch]],
  * [[Drift.wasserstein1]], [[Screening.ksTwoSample]]).
  *
  * Those operators collapse the data to one row per distinct value and
  * walk a cumulative window over that grid. For bounded-support columns
  * (2-dp money) the grid is small and a global window is fine — but a
  * CONTINUOUS model-score column makes the grid row-scale, and a single
  * `Window.orderBy(v)` serializes it into one task. This helper is the
  * [[Prep.stratifiedSample]] two-phase discipline transplanted to a
  * VALUE-ORDERED axis, where the salt must be a monotone prefix of the
  * sort order rather than a hash byte:
  *
  *  1. `buckets−1` approximate percentile edges of the order column split
  *     the grid into near-equal ROW ranges (a GK summary — one
  *     partial-aggregable pass, no sort). Edge placement only balances
  *     load; the cumulative sums are exact integers regardless of where
  *     an edge lands, so `percentile_approx`'s partition-dependence
  *     cannot move a result.
  *  2. The bucket id comes from an UNROLLED `when` comparison chain (the
  *     [[Prep.quantileBucket]] codegen shape — never an interpreted
  *     higher-order fold), monotone in the order column by construction.
  *  3. Per-bucket subtotals (≤ `buckets` rows) get exclusive running
  *     offsets and global totals from windows over THAT bounded relation,
  *     broadcast back; each row's global cumulative = bucket offset +
  *     within-bucket running sum — the only data-scale window partitions
  *     by bucket, so a row-scale grid fans out over `buckets` tasks.
  *
  * At 1000 executors, raise `buckets` with the cluster (the offsets
  * relation stays trivially broadcastable at any sane value).
  *
  * Requires: one row per distinct `orderCol` value (what every KS-grid
  * caller produces by construction); `sumCols` are integer (LONG) counts,
  * so the two-phase reassociation is exact.
  *
  * Adds, for each c in `sumCols`: `__cum_<c>` (inclusive cumulative in
  * `orderCol` order) and `__tot_<c>` (global total); with `withNext`,
  * `__next` — the next distinct value in global order (null at the end).
  */
object SaltedGrid {

  def cumulative(grid: DataFrame, orderCol: String, sumCols: Seq[String],
      buckets: Int = 64, withNext: Boolean = false): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    require(sumCols.nonEmpty, "no columns to accumulate")
    val v = col(orderCol)
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val edges = grid.agg(
      percentile_approx(v, array(qs.map(lit): _*), lit(10000)).as("__edges"))
    val bin = qs.indices.reverse.foldLeft(lit(buckets - 1): Column) {
      case (acc, i) =>
        when(v <= element_at(col("__edges"), i + 1), i).otherwise(acc)
    }
    val binned = grid.crossJoin(broadcast(edges))
      .withColumn("__gbkt", bin.cast("int"))
      .drop("__edges")
    // phase 1: per-bucket subtotals — a ≤`buckets`-row relation; its
    // offset/total windows are the justified bounded single-partition form
    val aggs = sumCols.map(c => sum(col(c)).as(s"__b_$c")) :+
      min(v).as("__bmin")
    val wB = Window.orderBy("__gbkt")
    var offsets = binned.groupBy("__gbkt").agg(aggs.head, aggs.tail: _*)
    for (c <- sumCols) {
      offsets = offsets
        .withColumn(s"__off_$c", coalesce(sum(col(s"__b_$c")).over(
          wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn(s"__tot_$c",
          sum(col(s"__b_$c")).over(Window.partitionBy()))
    }
    if (withNext)
      offsets = offsets.withColumn("__bnext", lead(col("__bmin"), 1).over(wB))
    val keep = Seq("__gbkt") ++
      sumCols.flatMap(c => Seq(s"__off_$c", s"__tot_$c")) ++
      (if (withNext) Seq("__bnext") else Nil)
    // phase 2: the only data-scale window — partitioned by bucket
    val wLocal = Window.partitionBy("__gbkt").orderBy(v)
    var out = binned.join(broadcast(offsets.select(keep.map(col): _*)),
      Seq("__gbkt"))
    for (c <- sumCols) {
      out = out.withColumn(s"__cum_$c",
          sum(col(c)).over(wLocal.rowsBetween(
            Window.unboundedPreceding, Window.currentRow)) +
            col(s"__off_$c"))
        .drop(s"__off_$c")
    }
    if (withNext)
      out = out.withColumn("__next",
          coalesce(lead(v, 1).over(wLocal), col("__bnext")))
        .drop("__bnext")
    out.drop("__gbkt")
  }
}
