package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** DEFLATE-compressed byte length of a string as ONE codegen'd
  * expression — the compression-ratio quality signal production corpus
  * filters actually use (Rae et al. 2021's repetition family measures
  * the same redundancy; RefinedWeb-style pipelines threshold
  * deflate(bytes)/bytes directly): highly repetitive boilerplate
  * compresses far below fluent prose, and random gibberish compresses
  * above it. Zero shuffle — a per-row kernel over the corpus.
  *
  * The kernel is `java.util.zip.Deflater` at a LITERAL level with the
  * zlib wrapper off — deterministic for a given JDK (same input → same
  * length, spec-pinned), but NOT replayable in a SQL oracle, so the
  * registered query is a documented rows-only entry (the
  * `sim_ivf_topk` class). Registered as
  * `graft_deflate_len(text, level)` via [[graft.GraftExtensions]].
  */
case class DeflateLength(child: Expression, level: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(level >= 1 && level <= 9, s"deflate level out of range: $level")

  override def inputTypes: Seq[DataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateKernel.deflatedLen(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .getBytes, level)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.DeflateKernel.deflatedLen($c.getBytes(), $level)")

  override protected def withNewChildInternal(newChild: Expression)
      : DeflateLength = copy(child = newChild)
}

object DeflateKernel {

  /** Raw-DEFLATE (no zlib header) compressed length of `bytes`. */
  def deflatedLen(bytes: Array[Byte], level: Int): Long = {
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}
