package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Linear models fitted by AGGREGATION — the classical complement to the
  * library's two other trainers ([[Boost]] fits by histogram split
  * search, [[TokenModels.sgdLinear]] by a gradient loop): ridge
  * regression has the closed form (X′X + λI)β = X′y, and for a bounded
  * feature set the whole fit is ONE pass of exact moment sums plus
  * fixed-size scalar algebra — the shape that survives any corpus size,
  * because nothing but the ≤(p+1)²-entry moment matrix ever leaves the
  * executors. The reference serves features for exactly this kind of
  * downstream model (`ML Feature Store Pipeline.py:286-309` retrieval);
  * this closes the loop with the simplest production regressor.
  */
object LinearModel {

  private val D38 = DecimalType(38, 0)

  /** Ridge regression over TWO integer features + intercept by exact
    * normal equations, solved with Cramer's rule (Hoerl & Kennard
    * 1970): minimize Σ(y − b₀ − b₁x₁ − b₂x₂)² + λ(b₁² + b₂²) — the
    * intercept is unpenalized, the textbook convention.
    *
    * Exactness: all nine moments (n, Σx₁, Σx₂, Σy, Σx₁², Σx₁x₂, Σx₂²,
    * Σx₁y, Σx₂y, Σy²) accumulate as exact DECIMAL(38,0) integers in one
    * partial-aggregable pass; the 3×3 Cramer determinants and the
    * R² = 1 − SSE/SST read are FIXED IEEE sequences over the
    * double-cast moments (identical parse tree in the SQL twin —
    * integer-to-double conversion rounds to nearest on both engines),
    * emitted UNROUNDED (the [[graft.ops.EventOps.olsTrend]]
    * discipline). A singular system (constant feature at λ = 0) yields
    * NULL coefficients rather than garbage; any λ > 0 restores
    * invertibility — the ridge's whole point.
    *
    * Feature/label magnitudes must keep Σ(x·y) inside DECIMAL(38,0) —
    * integer cents/days/counts at any corpus size qualify
    * (10⁷-scale values square to 10¹⁴; 10²⁴ rows of headroom).
    * Returns one row: (n, b0, b1, b2, r2).
    */
  def ridgeNormal(base: DataFrame, yCol: String, x1Col: String,
      x2Col: String, lambda: Long = 0L): DataFrame = {
    require(lambda >= 0, s"lambda must be >= 0: $lambda")
    val y = col(yCol).cast(D38)
    val x1 = col(x1Col).cast(D38)
    val x2 = col(x2Col).cast(D38)
    val m = base.agg(
      count(lit(1)).cast(D38).as("__n"),
      sum(x1).cast(D38).as("__s1"),
      sum(x2).cast(D38).as("__s2"),
      sum(y).cast(D38).as("__sy"),
      sum((x1 * x1).cast(D38)).cast(D38).as("__s11"),
      sum((x1 * x2).cast(D38)).cast(D38).as("__s12"),
      sum((x2 * x2).cast(D38)).cast(D38).as("__s22"),
      sum((x1 * y).cast(D38)).cast(D38).as("__s1y"),
      sum((x2 * y).cast(D38)).cast(D38).as("__s2y"),
      sum((y * y).cast(D38)).cast(D38).as("__syy"))
    val dbl = DoubleType
    // the (X′X + λ·diag(0,1,1)) entries, double-cast exact moments
    val a = col("__n").cast(dbl); val b = col("__s1").cast(dbl)
    val c = col("__s2").cast(dbl)
    val e = (col("__s11") + lit(lambda).cast(D38)).cast(dbl)
    val f = col("__s12").cast(dbl)
    val i = (col("__s22") + lit(lambda).cast(D38)).cast(dbl)
    val ry = col("__sy").cast(dbl); val r1 = col("__s1y").cast(dbl)
    val r2v = col("__s2y").cast(dbl)
    // symmetric 3×3: rows (a b c / b e f / c f i); fixed-sequence dets
    def det3(m00: Column, m01: Column, m02: Column, m10: Column,
        m11: Column, m12: Column, m20: Column, m21: Column,
        m22: Column): Column =
      m00 * (m11 * m22 - m12 * m21) - m01 * (m10 * m22 - m12 * m20) +
        m02 * (m10 * m21 - m11 * m20)
    val det = det3(a, b, c, b, e, f, c, f, i)
    val b0 = det3(ry, b, c, r1, e, f, r2v, f, i) / det
    val b1 = det3(a, ry, c, b, r1, f, c, r2v, i) / det
    val b2 = det3(a, b, ry, b, e, r1, c, f, r2v) / det
    val syy = col("__syy").cast(dbl)
    val sse = syy - lit(2.0) * (b0 * ry + b1 * r1 + b2 * r2v) +
      (b0 * b0 * a + b1 * b1 * col("__s11").cast(dbl) +
        b2 * b2 * col("__s22").cast(dbl) +
        lit(2.0) * (b0 * b1 * b + b0 * b2 * c + b1 * b2 * f))
    val sst = syy - ry * ry / a
    m.select(col("__n").cast("long").as("n"),
      when(det =!= 0.0, b0).as("b0"),
      when(det =!= 0.0, b1).as("b1"),
      when(det =!= 0.0, b2).as("b2"),
      when(det =!= 0.0 && sst > 0.0, lit(1.0) - sse / sst).as("r2"))
  }
}
