package graft
import graft.ops.Dedup
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeDedup {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    t("cand2gram")(println("cand2gram=" + Dedup.jaccardCandidates(docs, "doc_id", "text", 0.5, 2).count()))
    t("jaccard2gram full")(println("out2gram=" + Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, n = 2).count()))
    t("cand1gram")(println("cand1=" + Dedup.jaccardCandidates(docs, "doc_id", "text", 0.9, 1).count()))
    t("jaccard1 full")(println("out1=" + Dedup.jaccardPairs(docs, "doc_id", "text", 0.9).count()))
    t("minhash cand")(println("candmh=" + Dedup.minhashCandidates(docs, "doc_id", "text", 12, 3).count()))
    t("minhash full")(println("outmh=" + Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9).count()))
    spark.stop()
  }
}
