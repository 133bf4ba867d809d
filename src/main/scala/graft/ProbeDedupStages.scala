package graft

import graft.ops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the hot dedup bench queries: where does
  * dedup_jaccard_2gram / dedup_minhash_lsh time actually go — token-set
  * building, candidate generation, or verification?
  */
object ProbeDedupStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables.documents(spark, dir)
    docs.write.format("noop").mode("overwrite").save()

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // --- jaccard 2gram, threshold 0.5 ---
    time("2g tokenSets")(
      Dedup.tokenSets(docs, "doc_id", "text", 2)
        .write.format("noop").mode("overwrite").save())
    val cand2 = time("2g candidates") {
      val c = Dedup.jaccardCandidates(docs, "doc_id", "text", 0.5, 2)
        .localCheckpoint(true)
      println("  2g n_candidates = " + c.count())
      c
    }
    time("2g full query")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, 2)
        .write.format("noop").mode("overwrite").save())

    // --- 1gram, threshold 0.9 ---
    val cand1 = time("1g candidates") {
      val c = Dedup.jaccardCandidates(docs, "doc_id", "text", 0.9, 1)
        .localCheckpoint(true)
      println("  1g n_candidates = " + c.count())
      c
    }
    time("1g full query")(
      Dedup.jaccardPairs(docs, "doc_id", "text", 0.9, 1)
        .write.format("noop").mode("overwrite").save())

    // --- minhash ---
    time("mh signatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 12)
        .write.format("noop").mode("overwrite").save())
    time("mh candidates") {
      val c = Dedup.minhashCandidates(docs, "doc_id", "text", 12, 3)
      println("  mh n_candidates = " + c.count())
    }
    time("mh full query")(
      Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9, 12, 3)
        .write.format("noop").mode("overwrite").save())
    cand2.unpersist(); cand1.unpersist()
    spark.stop()
  }
}
