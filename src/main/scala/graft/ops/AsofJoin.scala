package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — the canonical feature-store lookup the
  * reference approximates with version filters (`ML Feature Store
  * Pipeline.py:395-408`): for each left row, the most recent right row with
  * the same key and right time ≤ left time.
  *
  * Scale design: tag + union the two inputs, then ONE key-partitioned
  * window pass carrying the latest right-side values forward
  * (`last(..., ignoreNulls = true)` over rows between unbounded preceding
  * and current). Cost is a single shuffle on the key, linear in
  * |left| + |right| — never the per-row range-scan blowup of a naive
  * `left.time >= right.time` theta join, and no per-key driver loop. Skewed
  * keys behave like any other hot group-by key (AQE skew handling applies).
  *
  * Right rows must be unique per (key, time) — pre-aggregate the right side
  * (e.g. `max_by`) to make the carried values deterministic; ties at equal
  * time resolve to the right row (inclusive ≤ semantics, matching DuckDB's
  * `ASOF JOIN ... ON l.t >= r.t`).
  */
object AsofJoin {

  /** Left-as-of-backward join.
    *
    * @param left     left relation (each row gets right values attached)
    * @param right    right relation, unique per (key, time)
    * @param keyCols  equality keys present on both sides
    * @param leftTime left event-time column name
    * @param rightTime right event-time column name
    * @param rightVals right value columns to attach (null when no right row
    *                  at or before the left time)
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // one unioned relation: __t is the event time, __r flags right rows
    // (ordered FIRST within equal timestamps so a left row at t sees a
    // right row at t — inclusive as-of)
    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__r", lit(0))
      .select(keyCols.map(col) ++ Seq(col("__t"), col("__r")) ++
        leftCols.filterNot(keyCols.contains).map(col) ++
        rightVals.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__r", lit(1))
      .select(keyCols.map(col) ++ Seq(col("__t"), col("__r")) ++
        leftCols.filterNot(keyCols.contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightVals.map(col): _*)
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("__r") === 0).drop("__t", "__r")
  }

  /** Backward as-of through the NATIVE Catalyst operator
    * ([[graft.plans.AsofJoinNode]] → sorted-merge [[graft.plans.AsofJoinExec]],
    * planned via the GraftExtensions strategy): one shuffle + sort per
    * side and a forward merge per partition — no window state carrying
    * every left row. Identical semantics to [[asofBackward]] (inclusive,
    * right unique per (key, time)); equivalence pinned by AsofNativeSpec.
    */
  def asofBackwardNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
    // Wrap each side in a fresh-alias Project: when both sides derive from
    // the same base relation, DeduplicateRelations rewrites the inner
    // duplicate exprIds; aliases keep their own ids through that rewrite,
    // so the node's captured key/time/value attributes stay valid.
    def freshSide(df: DataFrame): (LogicalPlan, Seq[Attribute]) = {
      val analyzed = df.queryExecution.analyzed
      val aliases = analyzed.output.map(a => Alias(a, a.name)())
      (Project(aliases, analyzed), aliases.map(_.toAttribute))
    }
    val (l, lOut) = freshSide(left)
    val (r, rOut) = freshSide(right)
    def attr(out: Seq[Attribute], n: String) = out.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"column '$n' not found in ${out.map(_.name).mkString(", ")}"))
    org.apache.spark.sql.GraftBridge.ofRows(left.sparkSession,
      graft.plans.AsofJoinNode(l, r,
        keyCols.map(attr(lOut, _)), keyCols.map(attr(rOut, _)),
        attr(lOut, leftTime), attr(rOut, rightTime),
        rightVals.map(attr(rOut, _))))
  }

  /** Forward as-of (earliest right row at or after the left time): swap the
    * time axis by negating — reuses the backward machinery unchanged.
    */
  def asofForward(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    def negate(df: DataFrame, t: String): DataFrame =
      df.withColumn(s"__neg_$t", -col(t))
    val out = asofBackward(
      negate(left, leftTime), negate(right, rightTime),
      keyCols, s"__neg_$leftTime", s"__neg_$rightTime", rightVals)
    out.drop(s"__neg_$leftTime")
  }

  /** Forward as-of through the native operator — the same time-negation
    * trick over [[asofBackwardNative]]: ascending order on the negated
    * time is descending on the original, so "latest right ≤ t" becomes
    * "earliest right ≥ t". Inclusive at equal time, like backward.
    */
  def asofForwardNative(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    def negate(df: DataFrame, t: String): DataFrame =
      df.withColumn(s"__neg_$t", -col(t))
    asofBackwardNative(
      negate(left, leftTime), negate(right, rightTime),
      keyCols, s"__neg_$leftTime", s"__neg_$rightTime", rightVals)
      .drop(s"__neg_$leftTime", s"__neg_$rightTime")
  }
}
