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
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    t("shingles2 count")(println(Dedup.shingles(docs, "doc_id", "text", 2).count()))
    val sets2 = Dedup.tokenSets(docs, "doc_id", "text", 2)
    t("tokenSets2 count")(println(sets2.count()))
    t("tokenSets2 again")(println(sets2.count()))
    val pairs2 = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, n = 2)
    t("jaccard2gram full")(println(pairs2.count()))
    val pairs1 = Dedup.jaccardPairs(docs, "doc_id", "text", 0.9, n = 1)
    t("jaccard1 full")(println(pairs1.count()))
    val mh = Dedup.minhashLshPairs(docs, "doc_id", "text", 0.9)
    t("minhash full")(println(mh.count()))
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 12)
    t("signatures")(println(sig.count()))
    spark.stop()
  }
}
