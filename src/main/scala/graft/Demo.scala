package graft

import graft.extract.UserEventExtractor
import graft.model.{FeatureConfig, FeatureMetadata}
import graft.sources.Tables
import graft.store.FeatureStore
import org.apache.spark.sql.SparkSession

/** End-to-end pipeline demo mirroring the reference `main()`
  * (`ML Feature Store Pipeline.py:610-675`): read events → extract user
  * features → register version → read back → serve one user → list
  * versions → dashboard → cleanup.
  *
  * Usage: runMain graft.Demo [sfDir] [storeDir]
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val storeDir = args.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val extractor = new UserEventExtractor()
    val features = extractor.extract(Tables.events(spark, sfDir))
    val store = new FeatureStore(spark, storeDir)

    val version = store.registerFeatures(features, FeatureMetadata(
      featureVersion = "", description = "User behavioral features from events",
      createdAt = "", features = extractor.featureConfigs,
      lineage = Map("source_table" -> s"$sfDir/events.parquet",
        "extractor" -> "UserEventExtractor"),
      tags = Seq("user_features", "behavioral")))
    println(s"registered version: $version")

    val got = store.getFeatures(Some(version))
    println(s"feature rows: ${got.count()} cols: ${got.columns.length}")

    val served = store.serveFeatures(userId = 1L, Some(version))
    println(s"serve user 1: $served")

    store.listFeatureVersions().foreach(m =>
      println(s"version ${m.featureVersion} created ${m.createdAt} " +
        f"score ${m.dataQualityMetrics.map(_.overallScore).getOrElse(-1.0)}%.3f"))

    println(s"dashboard: ${store.monitoringDashboard}")
    println(s"cleanup(keep 5) deleted: ${store.cleanupOldVersions(5)}")
    spark.stop()
  }
}
