package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-timing probe for the SGD training-loop packaging (optimization
  * round 16): times each weight-update round under (a) the historical
  * localCheckpoint iterate and (b) the driver-LocalRelation iterate, on
  * the registered classifier's count relation — adjudicates which part
  * of the loop the wall time lives in before/after the rewrite.
  */
object ProbeSgdRounds {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val occ = graft.ops.TokenModels.sgdCounts(docs, "doc_id", "text",
      length(col("text")) >= 400, 16, 32)
    occ.count()
    // (a) historical spelling: sgdRound + localCheckpoint per round
    var wa = graft.ops.TokenModels.sgdInitWeights(spark, 16)
    t("checkpoint loop 12 rounds") {
      for (i <- 1 to 12)
        wa = t(s"  ckpt round $i") {
          graft.ops.TokenModels.sgdRound(occ, wa, 8).localCheckpoint()
        }
    }
    // (b) localized spelling: hoisted n + LocalRelation iterate
    t("localized loop 12 rounds") {
      val n = occ.agg(count_distinct(col("id"))).collect()(0).getLong(0)
      var wb = graft.ops.TokenModels.sgdInitWeights(spark, 16)
      for (i <- 1 to 12)
        wb = t(s"  local round $i") {
          graft.ops.TokenModels.localized(graft.ops.TokenModels.sgdRoundN(
            occ, wb, 8,
            lit(n).cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        }
    }
    // and the registered learning-curve query end to end, twice
    (1 to 2).foreach { p =>
      t(s"text_sgd_learning_curve pass $p") {
        SparkEntry.queries("text_sgd_learning_curve")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    // per-round cost inside the level-keyed loop: iters=1 vs iters=12
    Seq(1, 12, 12).foreach { it =>
      t(s"sgdLearningCurve iters=$it") {
        graft.ops.TokenModels.sgdLearningCurve(docs, "doc_id", "text",
          col("n_chars") >= 400, 16, it, 8, 32, 8, Seq(1, 2, 4, 7))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
