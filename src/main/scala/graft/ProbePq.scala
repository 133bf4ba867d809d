package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-up probe for the PQ family (round 9): kernel-assignment fit /
  * encode / ADC serve and the IVFADC composition at 25× the sf0.1 corpus
  * (50k × 64-dim), plus the RETIRED relational coordinate-join
  * assignment re-inlined here for the measured comparison — it multiplied
  * every corpus coordinate by every centroid (N·dims·k joined rows per
  * pass), the term the `graft_pq_assign` kernel deletes. Synthetic
  * vectors from `spark.range` + hash arithmetic (the ProbeRound8 shape,
  * values in (−1, 1) + planted cluster directions scaled to stay inside
  * the kernel's |x| < 8 shift bound).
  *
  * Usage: runMain graft.ProbePq [nVecs]
  */
object ProbePq {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[pq] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  /** The retired coordinate-long-form assignment (one pass), verbatim
    * shape: explode to (id, sub, dim, xn), join every coordinate against
    * every centroid of its subspace, two group-bys. Kept ONLY as the
    * probe baseline.
    */
  private def relationalAssign(emb: DataFrame, dims: Int, m: Int,
      codebook: DataFrame): DataFrame = {
    val subDim = dims / m
    val x = emb.select(col("vec_id").as("id"),
        posexplode(col("embedding").cast("array<double>"))
          .as(Seq("__i", "__xd")))
      .select(col("id"), (col("__i") / subDim).cast("long").as("sub"),
        (col("__i") % subDim).cast("long").as("dim"),
        ((round(col("__xd"), 9).cast(DecimalType(12, 9)) *
          lit(1000000000L)).cast("long") + lit(8000000000L)).as("xn"))
    val dn = (col("xn") - col("cn")).cast(DecimalType(19, 0))
    x.join(broadcast(codebook), Seq("sub", "dim"))
      .groupBy(col("id"), col("sub"), col("cid"))
      .agg(sum((dn * dn).cast(DecimalType(38, 0))).as("__dist"))
      .groupBy("id", "sub")
      .agg(min(struct(col("__dist"), col("cid"))).as("__m"))
      .select(col("id"), col("sub"), col("__m.cid").as("code"))
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.range(nVecs.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(xxhash64(col("id"), d), lit(1000)) / 1000.0 - 0.5 +
          when(pmod(xxhash64(col("id")), lit(8)) === pmod(d, lit(8)),
            1.0).otherwise(0.0)).cast("double")).as("embedding"))
      .localCheckpoint()

    val (dims, m, k) = (64, 8, 32)
    val cb = t(s"pqFit $nVecs×64, m=$m k=$k, 3 rounds (kernel)")(
      graft.ops.Pq.pqFit(emb, "vec_id", "embedding", dims, m, k, 3)
        .localCheckpoint())
    t(s"pqEncode $nVecs (kernel, zero-shuffle)")(println(
      graft.ops.Pq.pqEncode(emb, "vec_id", "embedding", dims, m, cb)
        .count()))
    t(s"relational assign $nVecs (retired N·dims·k join, ONE pass)")(
      println(relationalAssign(emb, dims, m, cb).count()))
    t(s"pqAdcTopK $nVecs (fit+encode+serve)")(
      graft.ops.Pq.pqAdcTopK(emb, "vec_id", "embedding", 0L, dims, m, k,
        3, 10).collect())
    val anchors = graft.ops.Similarity.hyperplanes(8, dims, seed = 46L)
      .map(_.map(_.toDouble))
    t(s"ivfAdcTopK $nVecs (cells+residual fit+encode+serve)")(
      graft.ops.Pq.ivfAdcTopK(emb, "vec_id", "embedding", anchors, 0L,
        dims, m, k, 2, 3, 10).collect())
    spark.stop()
  }
}
