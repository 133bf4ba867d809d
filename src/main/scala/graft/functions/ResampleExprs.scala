package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-category resample sums for the seeded randomization test
  * ([[graft.ops.Screening.permutationTestBh]]) — ONE aggregation pass
  * replaces the ×B explode.
  *
  * The composable plan hashes each row twice (md5 of `seed|id|0` and
  * `seed|id|1` through the builtin — a 32-char hex string each), explodes
  * every row into B = `resamples` (row, r) tuples, evaluates a
  * conv/substring/CASE bit-probe per tuple, and hash-aggregates the B·N
  * tuple stream down to (cat, r) partial sums. Measured at sf0.1 that
  * construction is the whole cost of `quality_perm_bh` (10.9 s judge
  * r11). This aggregate does the identical arithmetic in one typed
  * buffer pass: per input row it computes the two digests once (raw
  * bytes, no hex round-trip) and walks the B assignment bits straight
  * off the digest nibbles, accumulating per-resample group-A counts and
  * cent-sums plus the category totals; group B falls out by subtraction
  * at eval. Map-side partial aggregation applies as usual (the buffer is
  * 2B+2 longs per category — KBs), so the shuffle carries one buffer per
  * (partition, category) instead of B·N tuples.
  *
  * BIT-IDENTITY contract (spec-pinned against the explode spelling, and
  * what keeps the DuckDB oracle replay valid): assignment bit r reads
  * hex digit `((r−1) mod 128) div 4` of digest `(r−1) div 128`, bit
  * `(r−1) mod 4` of that digit, group A when the bit is 0 — exactly the
  * `conv(substring(...), 16, 10) div 2^k mod 2 = 0` expression; the
  * digest input mirrors `concat_ws("|", seed, id, suffix)` including its
  * null-skipping (a null id hashes `seed|suffix`).
  *
  * Returns `array<struct<r:int, nar:long, sar:long, nbr:long,
  * sbr:long>>` with r ascending 1..B — `explode` it to recover the
  * (cat, r) relation the downstream BH machinery consumes. Registered as
  * SQL aggregate `graft_perm_sums(id, v, seed, resamples)` (seed and
  * resamples literals) via [[graft.GraftExtensions]].
  */
case class PermSums(
    id: Expression,
    v: Expression,
    seed: String,
    resamples: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(resamples >= 1 && resamples <= 256,
    s"two 128-bit digests bound resamples at 256: $resamples")

  override def children: Seq[Expression] = Seq(id, v)

  override def nullable: Boolean = false

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("r", IntegerType, nullable = false),
      StructField("nar", LongType, nullable = false),
      StructField("sar", LongType, nullable = false),
      StructField("nbr", LongType, nullable = false),
      StructField("sbr", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "graft_perm_sums"

  // buffer layout: [0, B) nar per resample, [B, 2B) sar per resample,
  // [2B] total rows, [2B+1] total cent-sum (group B = total − group A)
  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](2 * resamples + 2)

  @transient private lazy val digestLocal = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  @transient private lazy val seedSep =
    (seed + "|").getBytes(java.nio.charset.StandardCharsets.UTF_8)
  private val Sep: Byte = '|'.toByte

  /** md5 of `concat_ws("|", seed, id, suffix)` with concat_ws's
    * null-skipping: null id → `seed|suffix`.
    */
  private def digest(idBytes: Array[Byte], suffix: Byte): Array[Byte] = {
    val md = digestLocal.get()
    md.reset()
    md.update(seedSep)
    if (idBytes != null) { md.update(idBytes); md.update(Sep) }
    md.update(suffix)
    md.digest()
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val idVal = id.eval(input)
    val vVal = v.eval(input)
    val idBytes =
      if (idVal == null) null else idVal.asInstanceOf[UTF8String].getBytes
    val d0 = digest(idBytes, '0'.toByte)
    val d1 = digest(idBytes, '1'.toByte)
    val b = resamples
    buffer(2 * b) += 1L
    val cents = if (vVal == null) 0L else vVal.asInstanceOf[Long]
    if (vVal != null) buffer(2 * b + 1) += cents
    var r = 1
    while (r <= b) {
      val bitIdx = (r - 1) % 128
      val d = if ((r - 1) / 128 == 0) d0 else d1
      val hexPos = bitIdx / 4
      val nib =
        if ((hexPos & 1) == 0) (d(hexPos >> 1) >> 4) & 0xf
        else d(hexPos >> 1) & 0xf
      if (((nib >> (bitIdx % 4)) & 1) == 0) {
        buffer(r - 1) += 1L
        if (vVal != null) buffer(b + r - 1) += cents
      }
      r += 1
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = {
    val b = resamples
    val nTot = buffer(2 * b)
    val sTot = buffer(2 * b + 1)
    val rows = new Array[Any](b)
    var r = 1
    while (r <= b) {
      val nar = buffer(r - 1)
      val sar = buffer(b + r - 1)
      rows(r - 1) = InternalRow(r, nar, sar, nTot - nar, sTot - sar)
      r += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    bb.asLongBuffer().put(buffer)
    bb.array()
  }

  override def deserialize(storageFormat: Array[Byte]): Array[Long] = {
    val out = new Array[Long](storageFormat.length / 8)
    java.nio.ByteBuffer.wrap(storageFormat).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): PermSums =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): PermSums =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PermSums =
    copy(id = newChildren(0), v = newChildren(1))
}
