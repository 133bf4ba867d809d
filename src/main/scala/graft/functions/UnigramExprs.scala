package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word unigram-LM Viterbi segmentation as ONE codegen'd
  * expression (the fit half of a SentencePiece-style tokenizer, Kudo
  * 2018 — hard-EM variant: the E-step keeps only the single best
  * segmentation): given a piece→cost table (cost = −log₂ p in integer
  * NANO-BITS, so DP sums are exact longs matching an oracle's exact
  * 9-dp DECIMAL sums), find the minimum-total-cost segmentation of the
  * word; cost ties break to the lexicographically smallest
  * U+0001-joined piece path — a composable tie-break (at the first
  * divergence one side has the separator, which sorts below every
  * letter, so prefix order survives any common extension), which makes
  * the left-to-right DP equal the global (cost, path) minimum an oracle
  * computes by enumerating all segmentations.
  *
  * The same relational-formulation argument as [[BpeEncodeWord]]: a
  * per-position DP over (word, pos) state would cost maxWordLen join
  * rounds per EM iteration plus a backtrace chain; the kernel runs the
  * whole DP in one JVM call with the vocab riding as a reference object
  * (a real unigram vocab is tokenizer-sized — broadcast-equivalent).
  * Registered as `graft_unigram_segment(word, 'piece␁nanobits␂…',
  * maxPieceLen)` via [[graft.GraftExtensions]].
  *
  * Returns the piece array; an unsegmentable word (some character not
  * in the table) returns the EMPTY array and contributes nothing — the
  * caller guarantees segmentability by seeding all single characters.
  */
case class UnigramSegmentWord(child: Expression,
    costs: Map[String, Long], maxPieceLen: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
  require(costs.nonEmpty, "empty piece-cost table")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_unigram_segment"

  @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](costs.size * 2)
    costs.foreach { case (p, c) => m.put(p, java.lang.Long.valueOf(c)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    UnigramKernel.segmentWord(input.asInstanceOf[UTF8String], table,
      maxPieceLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("unigramCosts", table,
      "java.util.HashMap<String, Long>")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnigramKernel.segmentWord($c, $tableRef, $maxPieceLen)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : UnigramSegmentWord = copy(child = newChild)
}

object UnigramKernel {

  /** Decode the SQL-surface table spelling: entries `piece␁nanobits`
    * joined by U+0002.
    */
  def parseCosts(encoded: String): Map[String, Long] =
    encoded.split('\u0002').iterator.map { e =>
      val i = e.indexOf('\u0001')
      require(i > 0 && i < e.length - 1, s"bad piece-cost spelling: $e")
      e.substring(0, i) -> e.substring(i + 1).toLong
    }.toMap

  /** The Viterbi DP; see [[UnigramSegmentWord]]. */
  def segmentWord(word: UTF8String,
      costs: java.util.HashMap[String, java.lang.Long], maxPieceLen: Int)
      : ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val INF = java.lang.Long.MAX_VALUE
    val dpCost = new Array[Long](n + 1)
    val dpPath = new Array[String](n + 1)
    dpCost(0) = 0L
    dpPath(0) = ""
    var p = 1
    while (p <= n) {
      var best = INF
      var bestPath: String = null
      var j = 1
      val jMax = math.min(p, maxPieceLen)
      while (j <= jMax) {
        if (dpCost(p - j) != INF) {
          val piece = s.substring(p - j, p)
          val c = costs.get(piece)
          if (c != null) {
            val cost = dpCost(p - j) + c.longValue()
            val path =
              if (dpPath(p - j).isEmpty) piece
              else dpPath(p - j) + "\u0001" + piece
            if (cost < best ||
                (cost == best && path.compareTo(bestPath) < 0)) {
              best = cost
              bestPath = path
            }
          }
        }
        j += 1
      }
      dpCost(p) = best
      dpPath(p) = bestPath
      p += 1
    }
    if (dpCost(n) == INF) return new GenericArrayData(Array.empty[Any])
    val pieces = dpPath(n).split('\u0001')
    val out = new Array[Any](pieces.length)
    var m = 0
    while (m < pieces.length) {
      out(m) = UTF8String.fromString(pieces(m)); m += 1
    }
    new GenericArrayData(out)
  }
}
