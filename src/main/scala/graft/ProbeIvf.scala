package graft
import graft.ops.Ivf
import graft.sources.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Timing probe for the IVF build/probe split at sf0.1 (backs SURVEY §6). */
object ProbeIvf {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val emb = Tables.embeddings(spark, dir)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val path = s"/tmp/graft_ivf_probe_${System.nanoTime()}"
    val model = t("fitCentroids")(Ivf.fitCentroids(emb, "embedding", 16))
    val index = t("build(total)")(Ivf.build(emb, "vec_id", "embedding", 16,
      path + "b"))
    val q = emb.filter(col("vec_id") === 0L)
    t("probe cold")(Ivf.probe(index, q, 20, 4)
      .write.format("noop").mode("overwrite").save())
    t("probe warm")(Ivf.probe(index, q, 20, 4)
      .write.format("noop").mode("overwrite").save())
    val _ = model
    spark.stop()
  }
}
