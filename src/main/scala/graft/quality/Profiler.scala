package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Single-pass table profiler — the "dataset card" summary every feature
  * catalog page needs (rows, nulls, cardinality, range, mean per column;
  * the reference prints an ad-hoc version of this after each pipeline run,
  * `ML Feature Store Pipeline.py:594-607`).
  *
  * Exact path: the table unpivots to (col_name, value) with a `stack`
  * generator (codegen'd, no extra scan) and pre-aggregates on that pair —
  * map-side combine collapses duplicate values BEFORE the one shuffle, and
  * every per-column statistic (present/distinct/min/max/sum) then reduces
  * over the distinct-value relation. This deliberately avoids Spark's
  * multi-DISTINCT Expand plan, which multiplies the shuffled rows by the
  * column count and keys the aggregate on all profiled columns at once
  * (measured 4.3 s → 1.3 s at sf0.1 for 4 columns).
  *
  * Approx path (`approx = true`): per-column HLL++ sketches in ONE wide
  * aggregate — a plain accumulator pass, no unpivot, no distinct shuffle
  * at all. At 100 TB this is the catalog-page default; cardinality rarely
  * needs the exact value.
  *
  * Means go through exact DECIMAL (value·multiplicity products —
  * [[graft.functions.Exact]] discipline) so the profile is hash-stable
  * across engines.
  */
object Profiler {

  /** Profile numeric (≤2-dp money discipline) columns. Returns one row per
    * column: (col_name, n_rows, n_nulls, n_distinct, min_v, max_v,
    * mean_v).
    */
  def profile(df: DataFrame, numericCols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(numericCols.nonEmpty, "profile needs at least one column")
    val stats =
      if (approx) {
        val aggs = numericCols.flatMap { c =>
          val xd = col(c).cast("decimal(18,2)")
          Seq(count(col(c)).as(s"__cnt_$c"),
            approx_count_distinct(col(c)).as(s"__nd_$c"),
            min(xd).cast(DoubleType).as(s"__mn_$c"),
            max(xd).cast(DoubleType).as(s"__mx_$c"),
            sum(xd).cast(DoubleType).as(s"__sum_$c"))
        } :+ count(lit(1)).as("__n_rows")
        val stacked = numericCols
          .map(c => s"'$c', __cnt_$c, __nd_$c, __mn_$c, __mx_$c, __sum_$c")
          .mkString(", ")
        df.agg(aggs.head, aggs.tail: _*)
          .select(col("__n_rows").as("n_rows"),
            expr(s"stack(${numericCols.size}, $stacked) AS " +
              "(col_name, n_present, n_distinct, min_v, max_v, sum_v)"))
      } else {
        // (col_name, NULL) groups carry the null multiplicity, so
        // n_rows = Σcnt and n_nulls fall out of the same aggregate.
        val stacked = numericCols
          .map(c => s"'$c', CAST($c AS DECIMAL(18,2))").mkString(", ")
        df.select(expr(
            s"stack(${numericCols.size}, $stacked) AS (col_name, v)"))
          .groupBy("col_name", "v")
          .agg(count(lit(1)).as("cnt"))
          .groupBy("col_name")
          .agg(
            sum(col("cnt")).as("n_rows"),
            coalesce(sum(when(col("v").isNotNull, col("cnt"))), lit(0L))
              .as("n_present"),
            count(col("v")).as("n_distinct"),
            min(col("v")).cast(DoubleType).as("min_v"),
            max(col("v")).cast(DoubleType).as("max_v"),
            sum(col("v") * col("cnt")).cast(DoubleType).as("sum_v"))
      }
    stats
      .select(col("col_name"), col("n_rows"),
        (col("n_rows") - col("n_present")).as("n_nulls"),
        col("n_distinct"), col("min_v"), col("max_v"),
        (col("sum_v") / col("n_present")).as("mean_v"))
  }

  /** Per-column profile drift between two snapshots of the same table —
    * the schema-level companion to the distribution drift family
    * ([[graft.ops.Drift]] PSI/KS/W₁ ask "did THIS column's distribution
    * move"; this asks "which columns moved at all, and did nulls or
    * cardinality jump" — the first page of any ingest-regression
    * investigation). Runs the exact [[profile]] on each side (one scan
    * each, same unpivot pre-aggregate shape) and joins the two
    * ≤|cols|-row results.
    *
    * Determinism: null rates and the distinct ratio are single rounded
    * IEEE divisions over exact integers; mean/min/max deltas subtract the
    * two sides' identically-computed doubles and round 9 dp — the same
    * fixed-sequence argument both engines share. Degenerate sides (zero
    * rows, zero distinct) yield NULL ratios, never a division error.
    * Returns one row per column: (col_name, a_rows, b_rows, a_null_rate,
    * b_null_rate, a_distinct, b_distinct, distinct_ratio, a_mean, b_mean,
    * mean_delta, min_delta, max_delta).
    */
  def profileDrift(a: DataFrame, b: DataFrame, numericCols: Seq[String])
      : DataFrame = {
    def side(df: DataFrame, p: String) =
      profile(df, numericCols).select(col("col_name"),
        col("n_rows").as(s"${p}_rows"), col("n_nulls").as(s"${p}_nulls"),
        col("n_distinct").as(s"${p}_distinct"),
        col("mean_v").as(s"${p}_mean"),
        col("min_v").as(s"${p}_min"), col("max_v").as(s"${p}_max"))
    side(a, "a").join(side(b, "b"), Seq("col_name"))
      .select(col("col_name"), col("a_rows"), col("b_rows"),
        when(col("a_rows") > 0,
          round(col("a_nulls").cast(DoubleType) / col("a_rows"), 9))
          .as("a_null_rate"),
        when(col("b_rows") > 0,
          round(col("b_nulls").cast(DoubleType) / col("b_rows"), 9))
          .as("b_null_rate"),
        col("a_distinct"), col("b_distinct"),
        when(col("a_distinct") > 0,
          round(col("b_distinct").cast(DoubleType) / col("a_distinct"), 9))
          .as("distinct_ratio"),
        col("a_mean"), col("b_mean"),
        round(col("b_mean") - col("a_mean"), 9).as("mean_delta"),
        round(col("b_min") - col("a_min"), 9).as("min_delta"),
        round(col("b_max") - col("a_max"), 9).as("max_delta"))
  }

  /** Per-column Shannon entropy (bits) and Gini impurity — the
    * information-content row of the dataset card (a 0-entropy column is
    * dead weight; a near-log2(n) one is an id in disguise). Same one-scan
    * unpivot → (col, value) pre-aggregate shape as the exact [[profile]]
    * path; both statistics then reduce over the distinct-value relation.
    *
    * Gini stays integer until ONE division: 1 − Σc²/n² = (n² − Σc²)/n².
    * Entropy contributions −(c/n)·log2(c/n) are a fixed IEEE sequence
    * rounded to 9 dp and DECIMAL-summed (the PMI/bigram-LM log
    * discipline). Values hash as strings so mixed-type column sets
    * profile in one pass. Returns (col_name, n, n_distinct, entropy_bits,
    * gini).
    */
  def entropyProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "entropyProfile needs at least one column")
    val Exact9 = org.apache.spark.sql.types.DecimalType(28, 9)
    val stacked = cols
      .map(c => s"'$c', CAST($c AS STRING)").mkString(", ")
    val counts = df
      .select(expr(s"stack(${cols.size}, $stacked) AS (col_name, v)"))
      .filter(col("v").isNotNull)
      .groupBy("col_name", "v")
      .agg(count(lit(1)).as("c"))
    val p = col("c").cast(DoubleType) / col("__n")
    counts
      .withColumn("__n", sum("c").over(
        org.apache.spark.sql.expressions.Window.partitionBy("col_name")))
      .groupBy("col_name")
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_distinct"),
        sum(round(-p * log2(p), 9).cast(Exact9)).cast(DoubleType)
          .as("entropy_bits"),
        sum(col("c") * col("c")).as("__ss"))
      .select(col("col_name"), col("n"), col("n_distinct"),
        col("entropy_bits"),
        round((col("n") * col("n") - col("__ss")).cast(DoubleType) /
          (col("n") * col("n")), 9).as("gini"))
  }

  /** Dataset card — the one-pager every corpus release ships (the
    * "datasheets for datasets" summary, Gebru et al. 2021): corpus size,
    * token mass, vocabulary, exact-duplicate share, empty-document share,
    * and the per-language composition, as ONE tall (metric, value)
    * relation so it lands in a report/diff pipeline unchanged.
    *
    * Everything is counts and count ratios — integer until one division
    * each, rounded 6 dp; language shares key as `lang_share:<code>`. Two
    * bounded aggregates (corpus scalars + per-language counts) and one
    * distinct-token count; no quadratic term anywhere. Returns
    * (metric, value) ordered by metric.
    */
  def datasetCard(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val t = filter(split(col(textCol), " "), s => s =!= "")
    val base = docs.agg(
      count(lit(1)).as("__n"),
      sum(size(t)).as("__tok"),
      sum(when(size(t) === 0, 1L).otherwise(0L)).as("__empty"),
      countDistinct(md5(col(textCol))).as("__uniq"))
    val vocab = docs.select(explode(t).as("__w"))
      .agg(countDistinct(col("__w")).as("__v"))
    val scalars = base.crossJoin(broadcast(vocab))
    def row(name: String, value: org.apache.spark.sql.Column) =
      scalars.select(lit(name).as("metric"),
        value.cast(DoubleType).as("value"))
    val langs = docs.groupBy(col(langCol).cast("string").as("__l"))
      .agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(base.select(col("__n"))))
      .select(concat(lit("lang_share:"), col("__l")).as("metric"),
        round(col("__c").cast(DoubleType) / col("__n"), 6).as("value"))
    row("n_docs", col("__n"))
      .unionByName(row("n_tokens", col("__tok")))
      .unionByName(row("vocab_size", col("__v")))
      .unionByName(row("mean_tokens_per_doc",
        round(col("__tok").cast(DoubleType) / col("__n"), 6)))
      .unionByName(row("empty_doc_share",
        round(col("__empty").cast(DoubleType) / col("__n"), 6)))
      .unionByName(row("exact_dup_share",
        round((col("__n") - col("__uniq")).cast(DoubleType) / col("__n"),
          6)))
      .unionByName(langs)
  }
}
