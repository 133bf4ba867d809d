package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress probe for the round-8 operator families — relational
  * k-means, count-min / Bloom sketches, span corruption, JS divergence,
  * ROUGE — at ~10× the sf0.1 bench volumes (the §6.1 measurement the
  * dedup/similarity/graph families already have). Synthetic inputs from
  * `spark.range` + hash arithmetic; writes nothing outside /tmp.
  *
  * Usage: runMain graft.ProbeRound8 [nVecs] [nRows] [nDocs]
  */
object ProbeRound8 {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[r8] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toInt).getOrElse(50000)
    val nRows = args.lift(1).map(_.toInt).getOrElse(10000000)
    val nDocs = args.lift(2).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // 64-dim synthetic embeddings with 8 planted cluster directions
    val emb = spark.range(nVecs.toLong).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(64)), d =>
        (pmod(xxhash64(col("id"), d), lit(1000)) / 500.0 - 1.0 +
          when(pmod(xxhash64(col("id")), lit(8)) === pmod(d, lit(8)),
            2.0).otherwise(0.0)).cast("float")).as("embedding"))
      .localCheckpoint()
    t(s"kmeansFit $nVecs×64, k=16, 3 rounds")(println(
      graft.ops.Similarity.kmeansFit(emb, "vec_id", "embedding", 16, 3)
        .count()))

    // heavy-key stream: 10% of rows on ONE user (the celebrity shape)
    val ev = spark.range(nRows.toLong).select(
      when(pmod(xxhash64(col("id")), lit(10)) === 0, lit(0L))
        .otherwise(pmod(xxhash64(col("id"), lit(1)), lit(200000)))
        .as("user_id")).localCheckpoint()
    val sk = t(s"countMinBuild $nRows rows, 1024×5")(
      graft.ops.Sketches.countMinBuild(ev, col("user_id"), 1024, 5)
        .localCheckpoint())
    t("countMinEstimate 200k probes")(println(
      graft.ops.Sketches.countMinEstimate(sk, ev, col("user_id"), 1024, 5)
        .count()))
    val bloom = t(s"bloomBuild $nRows rows, 2^20 bits")(
      graft.ops.Sketches.bloomBuild(ev, col("user_id"), 1 << 20, 3)
        .localCheckpoint())
    t("bloomContains 200k probes")(println(
      graft.ops.Sketches.bloomContains(bloom, ev, col("user_id"),
        1 << 20, 3).count()))

    // ~120-token documents, 31-word vocabulary (the ProbeScale shape)
    val docs = spark.range(nDocs.toLong).select(col("id").as("doc_id"),
      array_join(transform(sequence(lit(1), lit(120)), j =>
        concat(lit("w"), pmod(xxhash64(col("id"), j), lit(31)))), " ")
        .as("text")).localCheckpoint()
    t(s"spanCorruption $nDocs docs")(println(
      graft.ops.Prep.spanCorruption(docs, "doc_id", "text", 5, 5).count()))
    t(s"jsDivergence $nDocs docs, 8 slices")(println(
      graft.ops.TextAnalysis.jsDivergence(
        docs.withColumn("lang", pmod(col("doc_id"), lit(8))),
        "lang", "text", 64).count()))
    val pairs = docs.select(col("doc_id"), col("text"),
      // candidate = text with every 7th token dropped (a cheap transform)
      array_join(filter(split(col("text"), " "),
        (_, i) => i % 7 =!= 0), " ").as("cand"))
    t(s"rougeN $nDocs pairs")(println(
      graft.ops.Eval.rougeN(pairs, "doc_id", "text", "cand", 2).count()))
    spark.stop()
  }
}
