package graft

import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-cost probe for the ROUGE dedup-damage audit — times the
  * span-removal input, the pair build, and the full rougeN separately so
  * a regression can be attributed to the right stage (the ProbeDedup
  * pattern). Writes nothing outside /tmp.
  */
object ProbeRouge {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[rouge] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    t("spanRemoval alone")(println(graft.ops.Dedup
      .spanRemoval(docs, "doc_id", "text", 8).count()))
    val cleaned = t("spanRemoval checkpoint")(graft.ops.Dedup
      .spanRemoval(docs, "doc_id", "text", 8)
      .select(col("doc_id"), col("clean_text")).localCheckpoint())
    val pairs = docs.join(cleaned, Seq("doc_id"))
    t("rougeN over checkpointed pairs")(println(graft.ops.Eval
      .rougeN(pairs, "doc_id", "text", "clean_text", 2).count()))
    t("registered query end-to-end")(println(
      graft.queries.EvalQueries.rougeDedup(spark, dir).count()))
    spark.stop()
  }
}
