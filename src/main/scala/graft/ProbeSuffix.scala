package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's suffix-rank row: the
  * Manber–Myers prefix-doubling span removal
  * ([[graft.ops.SuffixArray.suffixSpanRemoval]]) vs the gram-hash
  * [[graft.ops.Dedup.spanRemoval]] on the ProbeScale corpus shape
  * (31-word vocabulary, 10–100 tokens/doc, 20% near-dup copies — heavy
  * gram repetition, the adversarial case for both). Usage:
  * `runMain graft.ProbeSuffix [nDocs...]` (default 20000 50000 = 4× and
  * 10× the sf0.1 bench corpus).
  */
object ProbeSuffix {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(20000, 50000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // measure the SCALE path: cutoff 0 forces every doubling round onto
    // the salted two-phase ranking (the plan a 100 TB corpus takes)
    spark.conf.set("graft.salted.ntile.cutoff", "0")
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[suffix] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s ($r)")
    }
    val vocab = (0 until 31).map(i => s"w$i")
    val vocabLit = array(vocab.map(lit): _*)
    for (n <- sizes) {
      val isCopy = col("id") % 5 === 0
      val baseId = when(isCopy, col("id") / 5).otherwise(col("id"))
      val docLen = (pmod(xxhash64(baseId + 7), lit(91)) + 10).cast("int")
      val docs = spark.range(n.toLong)
        .withColumn("base_id", baseId)
        .withColumn("toks", transform(sequence(lit(1), docLen), i => {
          val perturb = isCopy && pmod(xxhash64(col("id"), i), lit(20)) === 0
          val key = when(perturb, col("id") * 1000 + i)
            .otherwise(col("base_id") * 1000 + i)
          element_at(vocabLit,
            (pmod(xxhash64(key), lit(31)) + 1).cast("int"))
        }))
        .select(col("id").as("doc_id"),
          concat_ws(" ", col("toks")).as("text"))
      val dir = java.nio.file.Files.createTempDirectory("graft-sx").toString
      docs.write.mode("overwrite").parquet(s"$dir/documents")
      val corpus = spark.read.parquet(s"$dir/documents")
      t(s"$n docs: gram-hash spanRemoval(8) removed-token mass") {
        graft.ops.Dedup.spanRemoval(corpus, "doc_id", "text", 8)
          .agg(sum("n_removed")).head().getLong(0)
      }
      t(s"$n docs: suffix-rank suffixSpanRemoval(8), 3 doubling rounds") {
        graft.ops.SuffixArray.suffixSpanRemoval(corpus, "doc_id", "text", 8)
          .agg(sum("n_removed")).head().getLong(0)
      }
      t(s"$n docs: suffixSpanRemoval(6) (combine step, rank4+shift)") {
        graft.ops.SuffixArray.suffixSpanRemoval(corpus, "doc_id", "text", 6)
          .agg(sum("n_removed")).head().getLong(0)
      }
    }
    spark.stop()
  }
}
