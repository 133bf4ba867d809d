package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Single-pass table profiler — the "dataset card" summary every feature
  * catalog page needs (rows, nulls, cardinality, range, mean per column;
  * the reference prints an ad-hoc version of this after each pipeline run,
  * `ML Feature Store Pipeline.py:594-607`).
  *
  * All columns profile in ONE aggregate over one scan (multi-distinct goes
  * through Spark's Expand — still a single pass over the data), and the
  * wide 1-row result pivots to long form with a `stack` generator, so the
  * plan stays fully declarative. Means go through exact DECIMAL
  * ([[graft.functions.Exact]] discipline) so the profile is hash-stable
  * across engines.
  *
  * `approx = true` swaps exact `count(DISTINCT)` for HLL++
  * (`approx_count_distinct`) — at 100 TB the exact multi-distinct Expand
  * multiplies the shuffle by the column count, and cardinality on a
  * catalog page rarely needs the exact value.
  */
object Profiler {

  private val Money = DecimalType(18, 2)

  /** Profile numeric (≤2-dp money discipline) columns. Returns one row per
    * column: (col_name, n_rows, n_nulls, n_distinct, min_v, max_v,
    * mean_v).
    */
  def profile(df: DataFrame, numericCols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(numericCols.nonEmpty, "profile needs at least one column")
    val aggs = numericCols.flatMap { c =>
      val xd = col(c).cast(Money)
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        (if (approx) approx_count_distinct(col(c)) else countDistinct(col(c)))
          .as(s"__nd_$c"),
        min(xd).cast(DoubleType).as(s"__mn_$c"),
        max(xd).cast(DoubleType).as(s"__mx_$c"),
        sum(xd).cast(DoubleType).as(s"__sum_$c"))
    } :+ count(lit(1)).as("__n_rows")
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = numericCols
      .map(c => s"'$c', __cnt_$c, __nd_$c, __mn_$c, __mx_$c, __sum_$c")
      .mkString(", ")
    wide
      .select(col("__n_rows"),
        expr(s"stack(${numericCols.size}, $stacked) AS " +
          "(col_name, n_present, n_distinct, min_v, max_v, sum_v)"))
      .select(col("col_name"), col("__n_rows").as("n_rows"),
        (col("__n_rows") - col("n_present")).as("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"),
        (col("sum_v") / col("n_present")).as("mean_v"))
  }
}
