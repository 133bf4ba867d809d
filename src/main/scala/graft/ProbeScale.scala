package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up stress probe: generates a synthetic corpus ~10× the sf0.1
  * bench scale (50k documents with near-dup structure, 20k embeddings) in
  * a temp dir and times the heavy operators, to check how candidate
  * generation + verification scale with corpus size. Writes nothing
  * outside /tmp; never touches /root/testdata.
  *
  * Usage: runMain graft.ProbeScale [nDocs] [nVecs]
  */
object ProbeScale {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scale] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val nVecs = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // documents-like corpus mirroring the driver corpus shape (31-word
    // vocabulary, 10–100 tokens/doc — the adversarial hot-token case):
    // 20% of docs are near-dup copies of a base doc with ~5% of positions
    // substituted
    val vocab = (0 until 31).map(i => s"w$i")
    val vocabLit = array(vocab.map(lit): _*)
    val isCopy = col("id") % 5 === 0
    val baseId = when(isCopy, col("id") / 5).otherwise(col("id"))
    val docLen = (pmod(xxhash64(baseId + 7), lit(91)) + 10).cast("int")
    val docs = spark.range(nDocs.toLong)
      .withColumn("base_id", baseId)
      .withColumn("toks", transform(sequence(lit(1), docLen), i => {
        val perturb = isCopy && pmod(xxhash64(col("id"), i), lit(20)) === 0
        val key = when(perturb, col("id") * 1000 + i)
          .otherwise(col("base_id") * 1000 + i)
        element_at(vocabLit, (pmod(xxhash64(key), lit(31)) + 1).cast("int"))
      }))
      .select(col("id").as("doc_id"), concat_ws(" ", col("toks")).as("text"))
    val docPath = java.nio.file.Files.createTempDirectory("graft-scale").toString
    t(s"write $nDocs docs")(docs.write.mode("overwrite")
      .parquet(s"$docPath/documents"))
    val corpus = spark.read.parquet(s"$docPath/documents")

    t("exact groups")(println(
      Dedup.exactGroups(corpus, "doc_id", "text").count()))
    t("neardup cluster FAST (star edges, no verify)")(println(
      Dedup.nearDupDedupFast(corpus, "doc_id", "text").count()))
    t("neardup cluster FAST verified stars t=0.9")(println(
      Dedup.nearDupDedupFast(corpus, "doc_id", "text", threshold = 0.9).count()))
    if (!args.contains("fastonly")) {
      // pair LISTING is quadratic in cluster size — the exact scale path
      // is verified clustered keep-first dedup (linear output)
      t("neardup cluster dedup (minhash→CC→keep-first)")(println(
        Dedup.nearDupDedup(corpus, "doc_id", "text", 0.9).count()))
      t("simhash pairs")(println(
        Dedup.simhashPairs(corpus, "doc_id", "text", 3).count()))
    }

    // embeddings: unit-ish random vectors, 64-dim
    val emb = spark.range(nVecs.toLong)
      .withColumn("embedding", transform(sequence(lit(1), lit(64)), i =>
        (pmod(xxhash64(col("id"), i), lit(2000)).cast("double") - 1000.0) / 1000.0))
      .select(col("id").as("vec_id"), col("embedding"))
    emb.write.mode("overwrite").parquet(s"$docPath/embeddings")
    val vecs = spark.read.parquet(s"$docPath/embeddings")

    val q = vecs.filter(col("vec_id") === 0L)
    t("brute topk")(println(
      Similarity.bruteTopK(vecs, q, "vec_id", "embedding", 20).count()))
    t("neardup pairs t=0.9")(println(
      Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.9).count()))
    t("lsh topk")(println(Similarity.lshTopK(vecs, q, "vec_id", "embedding",
      20, Similarity.hyperplanes(8, 64)).count()))

    spark.stop()
  }
}
