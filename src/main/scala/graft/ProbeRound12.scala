package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 measurement harness (SURVEY §6.1 rows):
  *
  *  - BITEXT FUNNEL: candidate volume, wall time and mined-pair recall
  *    of [[graft.ops.Similarity.bitextMarginFunnel]] across probe depths
  *    at sf0.1 — the sub-quadratic evidence for registering the funnel
  *    as `sim_bitext_margin`'s plan (full probe = the exact witness the
  *    oracle hash-checks; partial probes are the corpus-scale
  *    configuration).
  *
  * Usage: `runMain graft.ProbeRound12 [sfDir]`.
  */
object ProbeRound12 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, dir)
    val emb = graft.sources.Tables.embeddings(spark, dir)
    def side(lang: String) = docs.filter(col("lang") === lang)
      .select(col("doc_id"))
      .join(emb, col("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("embedding"))
      .localCheckpoint()
    val xs = side("en")
    val ys = side("es")
    val nx = xs.count(); val ny = ys.count()
    println(s"[bitext] sides: |en|=$nx |es|=$ny exact pairs=${nx * ny}")
    val anchors = graft.queries.SimilarityQueries.semAnchors
    val fullPairs = graft.ops.Similarity.bitextMarginFunnel(xs, ys,
        "doc_id", "embedding", 4, 1.02, anchors, anchors.length)
      .select("x_id", "y_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (np <- Seq(1, 2, 4, anchors.length)) {
      val t0 = System.nanoTime()
      val nCand = graft.ops.Similarity.bitextCandidates(xs, ys,
        "doc_id", "embedding", anchors, np).count()
      val mined = graft.ops.Similarity.bitextMarginFunnel(xs, ys,
          "doc_id", "embedding", 4, 1.02, anchors, np)
        .select("x_id", "y_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val hit = (mined intersect fullPairs).size
      println(f"[bitext] nProbe=$np%d candidates=$nCand%d " +
        f"(${100.0 * nCand / (nx * ny)}%.1f%% of exact) mined=${mined.size}%d " +
        f"recall_vs_exact=${if (fullPairs.isEmpty) 1.0 else hit.toDouble / fullPairs.size}%.3f " +
        f"time=$secs%.1f s")
    }
    spark.stop()
  }
}
