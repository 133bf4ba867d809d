package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's round-11 rows: the two new
  * iterative/pairwise operators at synthetic row scale.
  *
  *  - [[graft.ops.Similarity.dbscan]]: the cell-bounded ε-graph's pair
  *    work is N·c̄/2 when the cell count scales WITH the corpus (constant
  *    mean cell size c̄ = N/cells — the SemDeDup sizing rule); assignment
  *    is N·cells broadcast-literal dots. The probe plants cluster
  *    structure (1% of points duplicated near 2⁠% anchor directions),
  *    runs N at cells ∝ N, and records wall + edge/core counts — the
  *    expected shape is ~linear wall in N, not N².
  *  - [[graft.ops.TokenModels.sgdLinear]]: 12 bounded rounds, each a
  *    broadcast of the (buckets+1)-row model + two map-side-combinable
  *    aggs over the ONE up-front (doc, bucket) count shuffle. Expected
  *    ~linear wall in N with a fixed per-round floor.
  *
  * Usage: `runMain graft.ProbeRound11 [scale]` (scale multiplies the
  * base sizes; default 1 → 200k vectors / 1M docs).
  */
object ProbeRound11 {
  def main(args: Array[String]): Unit = {
    val scale = if (args.nonEmpty) args(0).toInt else 1
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(f: => String): Unit = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$tag: $out, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    // ---- dbscan: N unit-ish vectors, dim 8; 1-in-100 rows are near-dups
    // of one of 64 seeded directions (the planted density), the rest
    // hash-noise; cells scale with N (the SemDeDup sizing rule)
    val nVec = 200000L * scale
    val cells = (256 * scale).min(4096)
    val dim = 8
    val anchors = graft.ops.Similarity.hyperplanes(cells, dim, seed = 47L)
    val centers = graft.ops.Similarity.hyperplanes(64, dim, seed = 48L)
    val vecs = spark.range(nVec).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(col("id") % 100 === 0,
          // planted: center ± tiny per-id jitter
          element_at(
            array(centers.map(c => array(c.map(x =>
              lit(x.toDouble)): _*)): _*),
            (pmod(col("id"), lit(64)) + 1).cast("int"))(d) +
            (pmod(hash(col("id"), d), lit(100)).cast("double") / 10000.0))
          .otherwise(pmod(hash(col("id") * 31 + d), lit(2001))
            .cast("double") / 1000.0 - 1.0)).as("v"))
      .localCheckpoint()
    time(s"dbscan n=$nVec cells=$cells (planted 1% dup mass)") {
      val out = graft.ops.Similarity.dbscan(vecs, "id", "v",
        tau = 0.995, minPts = 3, anchors = anchors)
      val roles = out.groupBy("role").count().collect()
        .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(" ")
      roles
    }

    // ---- sgdLinear: N docs of 5..40 tokens from a 1000-token vocab
    val nDoc = 1000000L * scale
    val docs = spark.range(nDoc).select(col("id"),
      concat_ws(" ", transform(
        sequence(lit(1), (pmod(hash(col("id")), lit(36)) + 5).cast("int")),
        i => concat(lit("t"), pmod(hash(col("id"), i), lit(1000))))).as("text"))
      .withColumn("long_doc", length(col("text")) >= 120)
      .localCheckpoint()
    if (args.length > 2 && args(2) == "occ") {
      time(s"occ-only: tokenize+hash+count n=$nDoc") {
        val occ = docs.select(col("id"),
          explode(filter(split(col("text"), " "), t => t =!= ""))
            .as("tok"))
          .select(col("id"),
            graft.ops.Prep.hashBucket(col("tok"), 16).as("bucket"))
          .groupBy("id", "bucket")
          .agg(count(lit(1)).as("c"))
        occ.count().toString
      }
      spark.stop(); return
    }
    val iters = if (args.length > 1) args(1).toInt else 12
    time(s"sgdLinear n=$nDoc buckets=16 iters=$iters") {
      val out = graft.ops.TokenModels.sgdLinear(docs, "id", "text",
        col("long_doc"), iters = iters)
      val acc = out.agg(avg((col("is_target") === col("predicted"))
        .cast("int"))).head().getDouble(0)
      f"accuracy=$acc%.3f"
    }
    spark.stop()
  }
}
