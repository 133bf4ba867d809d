package graft

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress probe for the ITERATIVE graph family — the §6.1
  * measurement the dedup/similarity operators already have: a synthetic
  * directed graph ~10× the sf0.1 purchase graph (6M edges, 160k nodes by
  * default) with deliberate celebrity-hub skew (10% of all edges land on
  * ONE hub node, another 10% on four minor hubs — far more skewed than
  * the TPC-H-ish purchase graph, where the hottest supplier sees ~0.1% of
  * edges), timing pageRank / degreeStats / kcorePeel / randomWalks /
  * triangles. Writes nothing outside /tmp; never touches /root/testdata.
  *
  * Usage: runMain graft.ProbeGraph [nEdges] [nUsers]
  */
object ProbeGraph {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[graph] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toInt).getOrElse(6000000)
    val nUsers = args.lift(1).map(_.toInt).getOrElse(160000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 10% of edges -> hub h0 (the celebrity), 10% -> h1..h4, rest uniform
    val skew = pmod(xxhash64(col("id"), lit(0)), lit(10))
    val dst = when(skew === 0, lit("h0"))
      .when(skew === 1,
        concat(lit("h"), (pmod(xxhash64(col("id"), lit(3)), lit(4)) + 1)))
      .otherwise(concat(lit("u"),
        pmod(xxhash64(col("id"), lit(2)), lit(nUsers))))
    val edges = spark.range(nEdges.toLong)
      .select(concat(lit("u"),
        pmod(xxhash64(col("id"), lit(1)), lit(nUsers))).as("src"),
        dst.as("dst"))
    val path = java.nio.file.Files.createTempDirectory("graft-graph").toString
    t(s"write $nEdges edges")(edges.write.mode("overwrite")
      .parquet(s"$path/edges"))
    val e = spark.read.parquet(s"$path/edges")

    t("degreeStats")(println(
      Graph.degreeStats(e, "src", "dst").count()))
    t("pageRank 3 iters (dangling redistribution)")(println(
      Graph.pageRank(e, "src", "dst", iterations = 3).count()))
    t("kcorePeel k=4, 3 rounds")(println(
      Graph.kcorePeel(e, "src", "dst", k = 4, rounds = 3).count()))
    t("randomWalks length 3")(println(
      Graph.randomWalks(e, "src", "dst", length = 3,
        carryDeadEnds = false).count()))
    t("triangles (degree-ordered orientation)")(println(
      Graph.triangles(e, "src", "dst").count()))
    spark.stop()
  }
}
