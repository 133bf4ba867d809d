package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Whole-word WordPiece encoding as ONE codegen'd expression — the
  * BERT-family tokenizer (Wu et al. 2016; Devlin et al. 2019 §A.2),
  * completing the kernel tokenizer triple with [[BpeEncodeWord]] and
  * [[UnigramSegmentWord]]: greedy LONGEST-match-first against a fixed
  * vocabulary, continuation pieces carrying the `##` prefix; a position
  * with no matching piece makes the WHOLE word the single `unk` token
  * (BERT's rule — no partial fallback). `maxPieceLen` bounds the raw
  * (un-prefixed) match length.
  *
  * The vocab rides as a reference HashSet (a production vocab is ~30k
  * strings — broadcast-equivalent, the BPE-merges discipline); encoding
  * is zero-shuffle, one kernel call per distinct word occurrence stream.
  * Registered as `graft_wordpiece_word(word, vocab, maxPieceLen, unk)`
  * via [[graft.GraftExtensions]] (vocab = U+0002-joined pieces, all but
  * `word` literals).
  */
case class WordpieceWord(child: Expression, vocab: Set[String],
    maxPieceLen: Int, unk: String)
  extends UnaryExpression with ExpectsInputTypes {

  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1: $maxPieceLen")
  require(vocab.nonEmpty, "empty wordpiece vocabulary")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_wordpiece_word"

  @transient private lazy val table: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.size * 2)
    vocab.foreach(s.add)
    s
  }

  @transient private lazy val unkUtf = UTF8String.fromString(unk)

  override protected def nullSafeEval(input: Any): Any =
    WordpieceKernel.encodeWord(input.asInstanceOf[UTF8String], table,
      maxPieceLen, unkUtf)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("wpVocab", table,
      "java.util.HashSet<String>")
    val unkRef = ctx.addReferenceObj("wpUnk", unkUtf,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordpieceKernel.encodeWord($c, $tableRef, " +
        s"$maxPieceLen, $unkRef)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : WordpieceWord = copy(child = newChild)
}

object WordpieceKernel {

  /** Decode the SQL-surface vocab spelling (U+0002-joined pieces). */
  def parseVocab(encoded: String): Set[String] =
    encoded.split('\u0002').toSet

  /** The greedy longest-match walk; see [[WordpieceWord]]. */
  def encodeWord(word: UTF8String, vocab: java.util.HashSet[String],
      maxPieceLen: Int, unk: UTF8String): ArrayData = {
    val s = word.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    while (start < n) {
      var len = math.min(maxPieceLen, n - start)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand =
          (if (start > 0) "##" else "") + s.substring(start, start + len)
        if (vocab.contains(cand)) found = cand
        len -= 1
      }
      if (found == null)
        return new GenericArrayData(Array[Any](unk))
      out += UTF8String.fromString(found)
      start += found.length - (if (start > 0) 2 else 0)
    }
    new GenericArrayData(out.toArray)
  }
}
