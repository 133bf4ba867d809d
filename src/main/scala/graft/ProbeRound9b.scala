package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress probe for the late-round-9 additions — the DTW
  * kernel (banded vs unbounded), HBOS anomaly ranking, and the
  * Mann–Whitney salted-grid walk — at ~10–100× the sf0.1 bench volumes
  * (the §6.1 measurement discipline). Synthetic inputs from
  * `spark.range` + hash arithmetic; writes nothing outside /tmp.
  *
  * Usage: runMain graft.ProbeRound9b [nPairs] [seriesLen] [nRows]
  */
object ProbeRound9b {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[r9b] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nPairs = args.headOption.map(_.toInt).getOrElse(100000)
    val len = args.lift(1).map(_.toInt).getOrElse(365)
    val nRows = args.lift(2).map(_.toInt).getOrElse(10000000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // per-row series pairs: year-long daily counts, phase-shifted noise
    val pairs = spark.range(nPairs.toLong).select(col("id"),
        transform(sequence(lit(1), lit(len)), d =>
          pmod(xxhash64(col("id"), d), lit(100))).as("sa"),
        transform(sequence(lit(1), lit(len)), d =>
          pmod(xxhash64(col("id"), d + 1), lit(100))).as("sb"))
      .localCheckpoint()
    t(s"graft_dtw unbounded $nPairs pairs × $len")(println(
      pairs.selectExpr("graft_dtw(sa, sb, -1) AS d")
        .agg(sum("d")).collect()(0)))
    t(s"graft_dtw band=7  $nPairs pairs × $len")(println(
      pairs.selectExpr("graft_dtw(sa, sb, 7) AS d")
        .agg(sum("d")).collect()(0)))

    // HBOS: 10M rows × 3 bounded-range features with a planted tail
    val rows = spark.range(nRows.toLong).select(col("id"),
        (pmod(xxhash64(col("id")), lit(10000)) / 100.0).as("f1"),
        (pmod(xxhash64(col("id"), lit(1)), lit(100000)) / 100.0).as("f2"),
        (when(pmod(xxhash64(col("id"), lit(2)), lit(100000)) === 0,
          9999.0).otherwise(pmod(xxhash64(col("id"), lit(3)), lit(1000))
            / 100.0)).as("f3"))
      .localCheckpoint()
    t(s"hbosTopK $nRows rows × 3 features, 16 bins, k=100")(println(
      graft.quality.DataQualityValidator.hbosTopK(rows,
        Seq("f1", "f2", "f3"), Seq("id"), 16, 100).count()))

    // Mann-Whitney on a CONTINUOUS 2-dp metric: the row-scale grid that
    // justifies the SaltedGrid walk (≈ nRows/2 distinct values)
    val ab = rows.select(
      when(pmod(col("id"), lit(2)) === 0, "a").otherwise("b").as("g"),
      (pmod(xxhash64(col("id"), lit(9)), lit(5000000)) / 100.0 +
        when(pmod(col("id"), lit(2)) === 0, 0.0).otherwise(25.0)).as("v"))
      .localCheckpoint()
    t(s"mannWhitneyU $nRows rows, ~${nRows / 2} distinct values")(
      graft.ops.Screening.mannWhitneyU(ab, "v", "g", "a", "b")
        .show(truncate = false))

    // k-truss on a community-planted graph: 10k cliques-of-20 worth of
    // intra-community edges plus 10% cross-community noise — the
    // triangle-dense regime the peel exists for
    val nEdges = 1000000L
    val comm = spark.range(nEdges).select(col("id"),
        (pmod(xxhash64(col("id")), lit(10000)) * 20).as("c"),
        pmod(xxhash64(col("id"), lit(1)), lit(20)).as("o1"),
        pmod(xxhash64(col("id"), lit(2)), lit(20)).as("o2"),
        pmod(xxhash64(col("id"), lit(3)), lit(10)).as("x"))
      .select(
        when(col("x") === 0,
          pmod(xxhash64(col("id"), lit(4)), lit(200000)))
          .otherwise(col("c") + col("o1")).as("u"),
        when(col("x") === 0,
          pmod(xxhash64(col("id"), lit(5)), lit(200000)))
          .otherwise(col("c") + col("o2")).as("v"))
      .filter(col("u") =!= col("v")).localCheckpoint()
    t(s"ktruss k=4, 2 rounds, ~${nEdges} raw edges")(println(
      graft.ops.Graph.ktruss(comm, "u", "v", 4, 2).count()))

    spark.stop()
  }
}
