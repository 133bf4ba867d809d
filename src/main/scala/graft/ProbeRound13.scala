package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measurement harness (SURVEY §6.1 rows):
  *
  *  - PLANTED-MATE BITEXT RECALL: the round-12 nProbe-recall table
  *    measured retrieval agreement against the full-probe output on
  *    near-uniform embeddings — i.e. retrieval of RANDOM neighbors, not
  *    of true translation mates. This arm PLANTS mates (the ProbeItemCf
  *    planted-structure discipline): for every 5th en-side vector a
  *    synthetic es-side mate rides a deterministic ±6% per-dimension
  *    perturbation (cosine ≈ 0.999 to its source) among the real
  *    es-side distractors, and the table reports, per probe depth, the
  *    fraction of PLANTED pairs the funnel mines — the number that
  *    actually predicts mining quality at corpus scale.
  *
  * The registered `sim_bitext_margin` witness query is untouched — this
  * is measurement-only code; its numbers land in SURVEY §6.1.
  *
  * Usage: `runMain graft.ProbeRound13 [sfDir]`.
  */
object ProbeRound13 {
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
    val esReal = side("es")
    // planted mates: every 5th en vector, id shifted by 10^7, each
    // dimension scaled by 1 + ((id + dim) mod 7 - 3) * 0.02 — a
    // deterministic near-copy (cosine ~0.999) the funnel MUST find
    val MateShift = 10000000L
    val mates = xs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select((col("doc_id") + MateShift).as("doc_id"),
        transform(col("embedding"), (v, i) =>
          (v * (lit(1.0f) + (pmod(col("doc_id") + i, lit(7)) - lit(3))
            .cast("float") * lit(0.02f))).cast("float")).as("embedding"))
    val ys = esReal.unionByName(mates).localCheckpoint()
    val planted = xs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id")).collect().map(_.getLong(0))
      .map(id => (id, id + MateShift)).toSet
    val nx = xs.count(); val ny = ys.count()
    println(s"[planted-bitext] |en|=$nx |es+mates|=$ny " +
      s"planted=${planted.size} exact pairs=${nx * ny}")
    val anchors = graft.queries.SimilarityQueries.semAnchors
    val fullMined = graft.ops.Similarity.bitextMarginFunnel(xs, ys,
        "doc_id", "embedding", 4, 1.02, anchors, anchors.length)
      .select("x_id", "y_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val fullPlantedHit = (fullMined intersect planted).size
    println(f"[planted-bitext] full probe: mined=${fullMined.size}%d " +
      f"planted_found=$fullPlantedHit%d/${planted.size}%d " +
      f"(margin-threshold ceiling)")
    for (np <- Seq(1, 2, 4, anchors.length)) {
      val t0 = System.nanoTime()
      val nCand = graft.ops.Similarity.bitextCandidates(xs, ys,
        "doc_id", "embedding", anchors, np).count()
      val mined = graft.ops.Similarity.bitextMarginFunnel(xs, ys,
          "doc_id", "embedding", 4, 1.02, anchors, np)
        .select("x_id", "y_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val hitPlanted = (mined intersect planted).size
      val hitFull = (mined intersect fullMined).size
      println(f"[planted-bitext] nProbe=$np%d candidates=$nCand%d " +
        f"(${100.0 * nCand / (nx * ny)}%.1f%% of exact) " +
        f"planted_recall=${
          if (planted.isEmpty) 1.0
          else hitPlanted.toDouble / planted.size}%.3f " +
        f"planted_vs_ceiling=${
          if (fullPlantedHit == 0) 1.0
          else hitPlanted.toDouble / fullPlantedHit}%.3f " +
        f"agree_vs_full=${
          if (fullMined.isEmpty) 1.0
          else hitFull.toDouble / fullMined.size}%.3f " +
        f"time=$secs%.1f s")
    }
    spark.stop()
  }
}
