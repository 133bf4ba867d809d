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

  /** Global (or per-group) row_number over a VALUE order without a
    * single-task sort — the salted form of
    * `row_number().over(Window.orderBy(ord, ties))`.
    *
    * [[cumulative]] requires a distinct-value grid; this variant ranks the
    * ROWS themselves (duplicated order values allowed — a tie chain makes
    * the order total), which is what the ntile family needs. The salt is
    * the same monotone percentile-edge bucket: equal `ord` values land in
    * one bucket by construction, so bucket-major (local row_number +
    * exclusive bucket offset) IS the global order. The only data-scale
    * window partitions by (`partCols`, `__salt`); the offsets relation is
    * ≤ |groups|·`buckets` rows and arrives broadcast. Edge placement from
    * `percentile_approx` only balances load — the rank is exact wherever
    * an edge lands, so its partition-dependence cannot move a result.
    *
    * `ord` must be a numeric expression whose ASCENDING order is the
    * desired order (negate for descending) with no NULLs; `tieCols`
    * complete the order within equal `ord` (pass enough to make it total,
    * or accept row_number's tie-arbitrariness exactly as the global
    * window has it). Per-group edges (non-empty `partCols`) make a
    * dominant group fan out over `buckets` tasks instead of devolving to
    * one task per group — the CCNet one-language-corpus case.
    *
    * Adds `__rank` (1-based row_number within the group) and `__n`
    * (group row count).
    */
  def valueRanked(df: DataFrame, partCols: Seq[String], ord: Column,
      tieCols: Seq[Column], buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"need at least 2 buckets, got $buckets")
    val sc = partCols.map(col)
    val qs = (1 until buckets).map(_.toDouble / buckets)
    val edgeAgg =
      percentile_approx(ord, array(qs.map(lit): _*), lit(10000)).as("__edges")
    val withEdges =
      if (partCols.isEmpty) df.crossJoin(broadcast(df.agg(edgeAgg)))
      else df.join(broadcast(df.groupBy(sc: _*).agg(edgeAgg)), partCols)
    val bin = qs.indices.reverse.foldLeft(lit(buckets - 1): Column) {
      case (acc, i) =>
        when(ord <= element_at(col("__edges"), i + 1), i).otherwise(acc)
    }
    val salted = withEdges.withColumn("__salt", bin.cast("int"))
      .drop("__edges")
    // phase 1: per-(group, bucket) counts — a bounded relation; its
    // offset/total windows are the justified broadcast-sized form
    val offsets = salted
      .groupBy((sc :+ col("__salt")): _*).agg(count(lit(1)).as("__c"))
      .withColumn("__offset", coalesce(sum(col("__c")).over(
        Window.partitionBy(sc: _*).orderBy(col("__salt"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("__n", sum(col("__c")).over(Window.partitionBy(sc: _*)))
      .drop("__c")
    // phase 2: the only data-scale window — partitioned by the salt
    val wLocal = Window.partitionBy((sc :+ col("__salt")): _*)
      .orderBy(ord +: tieCols: _*)
    salted
      .withColumn("__lrn", row_number().over(wLocal).cast("long"))
      .join(broadcast(offsets), partCols :+ "__salt")
      .withColumn("__rank", col("__lrn") + col("__offset"))
      .drop("__salt", "__lrn", "__offset")
  }

  /** The SQL-standard `ntile(n)` band as ONE integer expression of the
    * global rank — `ntile` without its single-task global sort when
    * `rank`/`total` come from [[valueRanked]]. Standard split: the first
    * `total mod n` bands hold ⌈total/n⌉ rows, the rest ⌊total/n⌋ — the
    * exact assignment DuckDB/Spark/Postgres ntile produces for the same
    * total order, so salted callers stay hash-identical to an
    * `NTILE(n) OVER (ORDER BY …)` oracle.
    *
    * All-integer arithmetic (the divisions are exact: numerators are
    * pre-reduced to multiples of their denominators via `pmod`, and
    * IEEE division of exactly-representable operands with a
    * representable quotient is exact), so no engine can skew a band
    * boundary by an ulp. 1-based, like ntile.
    */
  def ntileBand(rank: Column, total: Column, n: Int): Column = {
    require(n >= 1, s"need at least 1 band, got $n")
    def exactDiv(a: Column, b: Column): Column =
      ((a - pmod(a, b)) / b).cast("long")
    def ceilDiv(a: Column, b: Column): Column = exactDiv(a + b - 1, b)
    val rem = pmod(total, lit(n.toLong))
    val q = exactDiv(total - rem, lit(n.toLong))
    val headRows = rem * (q + 1L)
    when(rank <= headRows, ceilDiv(rank, q + 1L))
      .otherwise(rem + ceilDiv(rank - headRows, greatest(q, lit(1L))))
  }
}
