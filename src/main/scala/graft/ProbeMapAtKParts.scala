package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-13 decomposition: which section of eval_map_at_k costs the
  * wall — train build, item-CF neighbors, scoring/rank, or the AP tail.
  */
object ProbeMapAtKParts {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import graft.sources.Tables

    def t[A](name: String)(f: => A): A = {
      System.gc()
      val t0 = System.nanoTime(); val r = f
      println(f"[mapk-parts] $name%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 2).foreach { pass =>
      println(s"[mapk-parts] === pass $pass ===")
      val li = Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      val ranked = t("ranked-checkpoint") {
        Tables.orders(spark, dir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
          .withColumn("__rn", row_number().over(w))
          .localCheckpoint() }
      val train = t("train-checkpoint") {
        ranked.filter(col("__rn") > 1)
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderkey").as("basket"),
            col("o_custkey").as("user"), col("l_partkey").as("item"))
          .localCheckpoint() }
      val neighbors = t("itemCf-neighbors") {
        graft.ops.EventOps.itemCfNeighbors(
            train.select("basket", "item"), "basket", "item", topK = 20)
          .localCheckpoint() }
      val profile = t("profile-checkpoint") {
        train.select("user", "item").distinct().localCheckpoint() }
      val recs = t("scoring+rank") {
        val scores = profile
          .join(neighbors.select(col("item"), col("neighbor"),
            round(col("sim") * 1e9).cast("long").as("__sim_nano")),
            Seq("item"))
          .groupBy(col("user"), col("neighbor").as("item"))
          .agg(sum(col("__sim_nano")).as("__score"))
          .join(profile, Seq("user", "item"), "left_anti")
        val wr = Window.partitionBy("user")
          .orderBy(col("__score").desc, col("item"))
        scores.withColumn("rank", row_number().over(wr).cast("long"))
          .filter(col("rank") <= 10).select("user", "item", "rank")
          .localCheckpoint() }
      t("ap-tail") {
        val relevant = ranked.filter(col("__rn") === 1)
          .join(li, col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey").as("user"), col("l_partkey").as("item"))
          .distinct()
          .join(profile, Seq("user", "item"), "left_anti")
        graft.ops.Eval.mapAtK(recs, relevant, 10).orderBy("n_users")
          .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
