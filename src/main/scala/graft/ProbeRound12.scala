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

    // GBM STUMPS scaling: the per-round work is one stacked (feature,
    // bin) histogram shuffle — wall should track rows ~linearly. 1× vs
    // 4× orders (key-shifted copies so ids stay unique).
    import org.apache.spark.sql.functions._
    val orders = graft.sources.Tables.orders(spark, dir)
    val customer = graft.sources.Tables.customer(spark, dir)
    def gbmBase(o: org.apache.spark.sql.DataFrame) = o
      .join(broadcast(customer.select(col("c_custkey"),
        (col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .as("acctbal_c"))), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"),
        (col("o_orderpriority") === "1-URGENT").cast("int").as("urgent"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_c"),
        floor(unix_micros(col("o_orderdate").cast("timestamp")) /
          86400000000L).cast("long").as("order_day"),
        col("acctbal_c"))
    val o4 = (0 until 4).map(i => orders.withColumn("o_orderkey",
      col("o_orderkey") + lit(i * 100000000L))).reduce(_ union _)
    for ((tag, base) <- Seq("1x" -> gbmBase(orders),
        "4x" -> gbmBase(o4))) {
      val b = base.localCheckpoint()
      val n = b.count()
      val t0 = System.nanoTime()
      val model = graft.ops.Boost.gbmStumps(b, "o_orderkey", "urgent",
        Seq("price_c", "order_day", "acctbal_c")).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[gbm] $tag%s rows=$n%d wall=$wall%.1f s " +
        f"round1=${model.head.getString(1)}%s")
    }

    // LINKAGE candidate volume: blocking holds work at Σ|A_b|·|B_b|,
    // far under |A|·|B|; the EM fit collapses those candidates to ≤ 8
    // pattern rows, so its iteration cost is volume-independent.
    val cust = customer.count()
    val (av, bv) = (graft.queries.DedupQueries.linkViews(spark, dir))
    val cand = av.join(bv, Seq("block")).count()
    val t1 = System.nanoTime()
    graft.ops.Linkage.linkageEm(av, bv, "rec_id", "block",
      Seq("name", "seg", "bal"), 10).collect()
    val emS = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    graft.ops.Linkage.fellegiSunter(av, bv, "rec_id", "block",
      Seq("name", "seg", "bal"), 0.0).count()
    val fsS = (System.nanoTime() - t2) / 1e9
    println(f"[linkage] n=$cust%d naive_pairs=${cust * cust}%d " +
      f"blocked_candidates=$cand%d " +
      f"(${100.0 * cand / (cust * cust)}%.2f%%) em10_wall=$emS%.1f s " +
      f"fs_wall=$fsS%.1f s")
    spark.stop()
  }
}
