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

    // GBM DEPTH-2 scaling: per round the work is the root histogram +
    // ONE leaf-keyed histogram — wall should track rows ~linearly, like
    // the round-12 stumps arm. 1x vs 4x orders (key-shifted copies).
    def gbmBase(o: org.apache.spark.sql.DataFrame) = o
      .join(broadcast(graft.sources.Tables.customer(spark, dir)
          .select(col("c_custkey"),
            (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
              .as("acctbal_c"))),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("urgent"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_c"),
        floor(unix_micros(col("o_orderdate").cast("timestamp")) /
          86400000000L).cast("long").as("order_day"),
        col("acctbal_c"))
    val orders = graft.sources.Tables.orders(spark, dir)
    val orders4 = (0 until 4).map(i => orders.withColumn("o_orderkey",
        col("o_orderkey") + lit(i.toLong * 1000000000L)))
      .reduce(_ unionByName _)
    for ((nm, o) <- Seq("1x" -> orders, "4x" -> orders4)) {
      val base = gbmBase(o).localCheckpoint()
      val t0 = System.nanoTime()
      graft.ops.Boost.gbmTree2(base, "o_orderkey", "urgent",
          Seq("price_c", "order_day", "acctbal_c"), 16, 2)
        .write.format("noop").mode("overwrite").save()
      println(f"[gbm-tree2-scale] $nm%s rows=${base.count()}%d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // DOMAIN HARDNESS scaling: the bigram explode + model joins are the
    // row-scale work; the domain rollup is bounded. 1x vs 4x docs.
    val docs4 = (0 until 4).map(i => docs.withColumn("doc_id",
        col("doc_id") + lit(i.toLong * 1000000000L)))
      .reduce(_ unionByName _)
    for ((nm, d) <- Seq("1x" -> docs, "4x" -> docs4)) {
      val dd = d.localCheckpoint()
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.domainHardness(dd, "doc_id", "text",
          "source", 4)
        .write.format("noop").mode("overwrite").save()
      println(f"[hardness-scale] $nm%s docs=${dd.count()}%d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // MULTI-PASS LINKAGE scaling: union candidate volume vs naive pairs
    // (the recall query reports the same ratio at registry parameters)
    val (la, lb) = graft.queries.DedupQueries.linkViews(spark, dir)
    val nA = la.count(); val nB = lb.count()
    val nCand2 = graft.ops.Linkage.fellegiSunterMulti(la, lb, "rec_id",
      Seq("block", "block2"), Seq("name", "seg", "bal"),
      Double.NegativeInfinity).count()
    println(f"[multipass-scale] candidates=$nCand2%d of ${nA * nB}%d " +
      f"naive (${100.0 * nCand2 / (nA * nB)}%.2f%%)")
    spark.stop()
  }
}
