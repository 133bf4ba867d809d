package graft

import graft.ops.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CC-variant probe (SURVEY §6.1): isolate plain min-label
  * [[Dedup.connectedComponents]] vs alternating-star
  * [[Dedup.connectedComponentsStars]] on (a) the SAME verified edge set
  * from the 50k dup-dense ProbeScale corpus — separating CC cost from the
  * candidate-volume cost the 717 s end-to-end row bundles — and (b) a
  * high-DIAMETER chain graph, the regime the star variant exists for
  * (min-label needs diameter-many rounds; stars needs O(log n)).
  *
  * Usage: runMain graft.ProbeStars [nDocs] [chainLen]
  */
object ProbeStars {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[stars] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(50000)
    val chainLen = args.lift(1).map(_.toInt).getOrElse(200000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- (a) dup-dense corpus: same generator as ProbeScale ------------
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
      .localCheckpoint(true)

    val edges = t(s"verified minhash edges ($nDocs docs)") {
      val e = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9)
        .select(col("id_a"), col("id_b")).localCheckpoint(true)
      println("edges=" + e.count()); e
    }
    val ids = docs.select(col("doc_id").as("id")).localCheckpoint(true)

    val plain = t("plain min-label CC on verified edges") {
      val l = Dedup.connectedComponents(ids, edges).localCheckpoint(true)
      println("components=" + l.select("component").distinct().count()); l
    }
    val stars = t("alternating-star CC on same edges") {
      val l = Dedup.connectedComponentsStars(ids, edges)
        .localCheckpoint(true)
      println("components=" + l.select("component").distinct().count()); l
    }
    println("labelings identical: " +
      (plain.exceptAll(stars).isEmpty && stars.exceptAll(plain).isEmpty))

    // --- (b) chain graph: diameter = chainLen ---------------------------
    val chainIds = spark.range(chainLen.toLong).select(col("id"))
      .localCheckpoint(true)
    val chainEdges = spark.range(chainLen.toLong - 1)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      .localCheckpoint(true)
    t(s"chain $chainLen: plain min-label CC (default maxIter)") {
      val l = Dedup.connectedComponents(chainIds, chainEdges)
      // diameter ≫ maxIter: labels are PARTIAL (component count > 1)
      println("chain components (plain)=" +
        l.select("component").distinct().count())
    }
    t(s"chain $chainLen: alternating-star CC") {
      val l = Dedup.connectedComponentsStars(chainIds, chainEdges)
      println("chain components (stars)=" +
        l.select("component").distinct().count())
    }
    spark.stop()
  }
}
