package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word BPE encoding as ONE codegen'd expression — the native
  * kernel the round-8 negative result called for (SURVEY §6.0): the
  * per-round relational formulations pay either ~7 window passes per
  * round (positioned-row state) or interpreted higher-order lambdas
  * (array state). This expression runs the ENTIRE bounded merge loop for
  * a word in a single JVM call: split to characters, then up to
  * `maxRounds` rounds of "find the lowest-rank adjacent pair present,
  * merge ALL its occurrences greedily left-to-right" (a position
  * consumed by the previous merge is skipped — GPT-2's linear rescan,
  * byte-identical to the window machinery's run-parity semantics, pinned
  * by the shared TokenModelsSpec fixtures and the unrolled-CTE oracle).
  *
  * The merges table rides the expression as a reference object (the
  * plan-embedded equivalent of a broadcast — a production tokenizer's
  * ~50k merges is a few MB); rounds end early at a word's fixpoint,
  * which the relational version reaches by idempotent no-op rounds.
  * Registered as SQL function
  * `graft_bpe_word(word, 'a␁b␂c␁d…', rounds)` (pairs joined by U+0001
  * inside and U+0002 between — neither can appear in a `[a-z]+` word)
  * via [[graft.GraftExtensions]].
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)],
    maxRounds: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(maxRounds >= 1, s"maxRounds must be >= 1: $maxRounds")
  require(merges.nonEmpty, "empty merges table")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_word"

  // one rank table per executor/plan instance; keys use the same U+0001
  // separator as the SQL spelling
  @transient private lazy val rankTable: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      m.put(a + "\u0001" + b, Integer.valueOf(r))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.encodeWord(input.asInstanceOf[UTF8String], rankTable,
      maxRounds)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", rankTable,
      "java.util.HashMap<String, Integer>")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.encodeWord($c, $ranksRef, $maxRounds)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BpeEncodeWord = copy(child = newChild)
}

/** Adjacent symbol pairs of a word's symbol array —
  * `graft_bpe_pairs(array<string>) -> array<struct<a,b>>` — the
  * pair-counting feed of the BPE learner, native instead of a
  * higher-order `transform` lambda (interpreted, the SURVEY §6.0
  * negative result).
  */
case class BpeAdjacentPairs(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = false))

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_bpe_pairs"

  override protected def nullSafeEval(input: Any): Any =
    BpeKernel.adjacentPairs(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernel.adjacentPairs($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : BpeAdjacentPairs = copy(child = newChild)
}

/** One greedy left-to-right merge pass of a SINGLE pair over a symbol
  * array — `graft_bpe_apply(syms, a, b) -> array<string>` — the BPE
  * learner's per-round apply (the argmax pair arrives as columns from a
  * 1-row broadcast, so `a`/`b` are not literals here).
  */
case class BpeApplyPair(first: Expression, second: Expression,
    third: Expression)
  extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(StringType, containsNull = false), StringType, StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_bpe_apply"

  override protected def nullSafeEval(syms: Any, a: Any, b: Any): Any =
    BpeKernel.applyPair(syms.asInstanceOf[ArrayData],
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, a, b) =>
      s"graft.functions.BpeKernel.applyPair($s, $a, $b)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): BpeApplyPair =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object BpeKernel {

  /** See [[BpeAdjacentPairs]]. */
  def adjacentPairs(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        arr.getUTF8String(i), arr.getUTF8String(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** See [[BpeApplyPair]]. */
  def applyPair(arr: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && arr.getUTF8String(i).equals(a) &&
          arr.getUTF8String(i + 1).equals(b)) {
        out.add(UTF8String.concat(arr.getUTF8String(i),
          arr.getUTF8String(i + 1)))
        i += 2
      } else { out.add(arr.getUTF8String(i)); i += 1 }
    }
    val res = new Array[Any](out.size)
    var m = 0
    while (m < out.size) { res(m) = out.get(m); m += 1 }
    new GenericArrayData(res)
  }

  /** Decode the SQL-surface merges spelling (pairs `a␁b` joined by
    * U+0002) back into the ordered table. */
  def parseMerges(encoded: String): Seq[(String, String)] =
    encoded.split('\u0002').toSeq.map { p =>
      val i = p.indexOf('\u0001')
      require(i > 0 && i < p.length - 1, s"bad merge pair spelling: $p")
      (p.substring(0, i), p.substring(i + 1))
    }

  /** The bounded greedy merge loop; see [[BpeEncodeWord]]. */
  def encodeWord(word: UTF8String,
      ranks: java.util.HashMap[String, Integer], maxRounds: Int)
      : ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    var syms = new java.util.ArrayList[String](n)
    var i = 0
    while (i < n) { syms.add(String.valueOf(s.charAt(i))); i += 1 }
    var round = 0
    var done = false
    while (round < maxRounds && !done && syms.size > 1) {
      var minr = Integer.MAX_VALUE
      var j = 0
      while (j < syms.size - 1) {
        val r = ranks.get(syms.get(j) + "\u0001" + syms.get(j + 1))
        if (r != null && r.intValue() < minr) minr = r.intValue()
        j += 1
      }
      if (minr == Integer.MAX_VALUE) done = true
      else {
        val out = new java.util.ArrayList[String](syms.size)
        var k = 0
        while (k < syms.size) {
          if (k < syms.size - 1) {
            val r = ranks.get(syms.get(k) + "\u0001" + syms.get(k + 1))
            if (r != null && r.intValue() == minr) {
              out.add(syms.get(k) + syms.get(k + 1)); k += 2
            } else { out.add(syms.get(k)); k += 1 }
          } else { out.add(syms.get(k)); k += 1 }
        }
        syms = out
      }
      round += 1
    }
    val arr = new Array[Any](syms.size)
    var m = 0
    while (m < syms.size) {
      arr(m) = UTF8String.fromString(syms.get(m)); m += 1
    }
    new GenericArrayData(arr)
  }
}
