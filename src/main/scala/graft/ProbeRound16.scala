package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 measurement harness (SURVEY §6.1 rows):
  *
  * TEXT ⋈ EMBED AUDIT SCALING — the round-15 verdict noted the
  * Σ bucket² sub-quadratic claim for `quality_text_embed_drift` /
  * `quality_embed_text_drift` was asserted, not measured. Both
  * directions are timed at 1× and 10× documents, recording CANDIDATE
  * counts beside wall time so growth attributes to candidate volume,
  * not plan overhead.
  *
  * The 10× corpus is 10 id-shifted copies with per-copy token salting
  * (every token suffixed `_k`) and per-copy ±1 sign scrambles of the
  * embeddings (cos(P·a, P·b) = cos(a, b) for a diagonal ±1 P, so
  * WITHIN-copy geometry — and hence per-copy near-dup structure — is
  * exactly the original's, while cross-copy text shares zero tokens and
  * cross-copy cosines decorrelate). A naive 10× of identical copies
  * would instead plant every doc in a 10-way mutual near-dup clique and
  * measure that explosion, not the operator's scaling.
  *
  * Measurement-only code; registered queries untouched. Numbers land in
  * SURVEY §6.1. Usage: `runMain graft.ProbeRound16 [sfDir]`.
  */
object ProbeRound16 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[r16] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val M = 10000000L
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text")
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)

    def docsX(copies: Int): DataFrame =
      (0 until copies).map { k =>
        docs.select((col("doc_id") + k * M).as("doc_id"),
          regexp_replace(concat(col("text"), lit(" ")), " ", s"_$k ")
            .as("text"))
      }.reduce(_ unionByName _).localCheckpoint()

    def embX(copies: Int): DataFrame =
      (0 until copies).map { k =>
        val signs = array((0 until dim).map { i =>
          val bit = scala.util.hashing.MurmurHash3
            .productHash((k, i)) & 1
          lit(if (bit == 0) 1.0f else -1.0f)
        }: _*)
        emb.select((col("vec_id") + k * M).as("vec_id"),
          zip_with(col("embedding"), signs,
            (x, s) => (x * s).cast("float")).as("embedding"))
      }.reduce(_ unionByName _).localCheckpoint()

    Seq(1, 10).foreach { copies =>
      val d = docsX(copies); val e = embX(copies)
      val nCand = time(s"${copies}x minhash candidates (count)") {
        graft.ops.Dedup.minhashCandidates(d, "doc_id", "text",
          graft.queries.DedupQueries.NumHashes,
          graft.queries.DedupQueries.Bands).count()
      }
      println(s"[r16] ${copies}x minhash candidates: $nCand")
      Seq(1, 2).foreach { pass =>
        time(s"${copies}x text->embed drift pass$pass") {
          graft.queries.QualityQueries.textEmbedDriftFrom(d, e)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val fRows = graft.queries.QualityQueries.textEmbedDriftFrom(d, e)
        .count()
      println(s"[r16] ${copies}x text->embed rows: $fRows")
      Seq(1, 2).foreach { pass =>
        time(s"${copies}x embed->text drift pass$pass") {
          graft.queries.QualityQueries.embedTextDriftFrom(d, e)
            .write.format("noop").mode("overwrite").save()
        }
      }
      val rRows = graft.queries.QualityQueries.embedTextDriftFrom(d, e)
        .count()
      println(s"[r16] ${copies}x embed->text rows: $rRows")
    }
    spark.stop()
  }
}
