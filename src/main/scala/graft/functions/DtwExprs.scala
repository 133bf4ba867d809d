package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Banded dynamic-time-warping distance between two integer series as
  * ONE codegen'd expression — `graft_dtw(array<long>, array<long>,
  * band) -> long`: the alignment-tolerant series distance (Sakoe &
  * Chiba 1978) that plain Lp distances can't give (a one-day phase
  * shift costs a whole day of traffic in L1, but only the warp step in
  * DTW).
  *
  * The DP is an intrinsically sequential O(n·m) recurrence —
  * d(i,j) = |aᵢ−bⱼ| + min(d(i−1,j), d(i,j−1), d(i−1,j−1)) — which is
  * exactly the shape the SURVEY §6.0 negative result says NOT to build
  * from window passes or interpreted HOF lambdas: the whole table runs
  * inside one JVM call over two rolling rows (O(min-side) memory).
  * INTEGER in, INTEGER out — counts stay longs, costs are exact
  * absolute differences, so the distance is engine-exact with no
  * rounding discipline needed at all; the DuckDB oracle replays the
  * same DP as an anti-diagonal-wavefront recursive CTE (no intra-step
  * dependency on a diagonal) and matches bit-for-bit.
  *
  * `band` < 0 disables the Sakoe–Chiba constraint; otherwise the band
  * is widened to at least |n−m| so the corner stays reachable (the
  * standard practice). Empty inputs: 0 when both empty, −1 (documented
  * sentinel — codegen keeps the result a primitive long) when only one
  * side is.
  *
  * At scale the kernel is per-row compute on already-collapsed series
  * relations (entity × bounded-calendar arrays) — zero shuffle, and the
  * band turns O(T²) per row into O(T·band) for long series.
  */
case class DtwDistance(left: Expression, right: Expression, band: Int)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dtw"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DtwKernel.distance(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], band)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.DtwKernel.distance($a, $b, $band)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DtwDistance =
    copy(left = newLeft, right = newRight)
}

object DtwKernel {

  /** See [[DtwDistance]]. Two rolling rows; the band clamps the inner
    * loop to the Sakoe–Chiba corridor.
    */
  def distance(a: ArrayData, b: ArrayData, band: Int): Long = {
    val n = a.numElements()
    val m = b.numElements()
    if (n == 0 || m == 0) return if (n == m) 0L else -1L
    val w = if (band < 0) Int.MaxValue
      else math.max(band, math.abs(n - m))
    val inf = java.lang.Long.MAX_VALUE / 4
    val prev = new Array[Long](m + 1)
    val cur = new Array[Long](m + 1)
    java.util.Arrays.fill(prev, inf)
    prev(0) = 0L
    var i = 1
    while (i <= n) {
      java.util.Arrays.fill(cur, inf)
      var j = math.max(1, i - w)
      val hi = if (w == Int.MaxValue) m else math.min(m, i + w)
      while (j <= hi) {
        val cost = math.abs(a.getLong(i - 1) - b.getLong(j - 1))
        var best = prev(j)
        if (prev(j - 1) < best) best = prev(j - 1)
        if (cur(j - 1) < best) best = cur(j - 1)
        cur(j) = cost + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m + 1)
      i += 1
    }
    prev(m)
  }
}
