package graft

import graft.model.PipelineConfig
import graft.sources.{SyntheticData, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class ConfigAndSyntheticSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("config round-trips through its YAML form") {
    val dir = Files.createTempDirectory("graft-cfg")
    val cfg = PipelineConfig(cacheTtl = 60, dataQualityThreshold = 0.9,
      alertNullPercentage = 0.25, rawData = "x/events.csv")
    cfg.save(s"$dir/advanced_config.yml")
    assert(PipelineConfig.load(s"$dir/advanced_config.yml") == cfg)
    assert(PipelineConfig().toYaml.contains("cache_ttl: 3600"))
  }

  test("env vars override YAML config (reference README.md:227-231)") {
    val dir = Files.createTempDirectory("graft-cfg")
    val cfg = PipelineConfig(cacheTtl = 60, featureStorePath = "from_yaml")
    cfg.save(s"$dir/cfg.yml")
    val env = Map("FEATURE_STORE_DB_PATH" -> "/env/store",
      "CACHE_TTL" -> "120", "QUALITY_THRESHOLD" -> "0.95")
    val loaded = PipelineConfig.loadWithEnv(s"$dir/cfg.yml", env)
    assert(loaded.featureStorePath == "/env/store")
    assert(loaded.cacheTtl == 120L)
    assert(loaded.dataQualityThreshold == 0.95)
    // absent/garbage env keeps file values
    assert(PipelineConfig.loadWithEnv(s"$dir/cfg.yml", Map.empty) == cfg)
    val bad = PipelineConfig.loadWithEnv(s"$dir/cfg.yml",
      Map("CACHE_TTL" -> "not-a-number"))
    assert(bad.cacheTtl == 60L)
  }

  test("synthetic events: shape, determinism, gating, sortedness") {
    val df = SyntheticData.events(spark, nEvents = 2000, nUsers = 50).cache()
    assert(df.count() == 2000)
    // amounts only on purchases, positive there
    assert(df.filter($"event_type" =!= "purchase" && $"amount" =!= 0.0).count() == 0)
    assert(df.filter($"event_type" === "purchase" && $"amount" <= 0.0).count() == 0)
    // category mix roughly matches declared probabilities
    val clicks = df.filter($"event_type" === "click").count()
    assert(clicks > 2000 * 0.3 && clicks < 2000 * 0.5)
    // user ids in range
    val (lo, hi) = df.agg(min("user_id"), max("user_id"))
      .as[(Long, Long)].head()
    assert(lo >= 1L && hi <= 50L)
    // same seed → same data
    val again = SyntheticData.events(spark, nEvents = 2000, nUsers = 50)
    assert(df.exceptAll(again).isEmpty && again.exceptAll(df).isEmpty)
    df.unpersist()
  }

  test("raw-events CSV round-trip through the reference-shaped source") {
    val dir = Files.createTempDirectory("graft-csv").toString
    SyntheticData.writeRawEventsCsv(spark, s"$dir/raw", nEvents = 100, nUsers = 10)
    val back = Tables.rawEventsCsv(spark, s"$dir/raw")
    assert(back.count() == 100)
    assert(back.schema.fieldNames.toSeq ==
      Seq("user_id", "event_type", "amount", "timestamp"))
    assert(back.filter($"timestamp".isNull).count() == 0)
  }

  test("ORC round-trip is lossless for documents and embeddings " +
      "(incl. the float-array column)") {
    import graft.sources.Tables
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val docs = Tables.documents(spark, dir)
    Tables.writeOrc(docs, s"$base/docs.orc")
    val docsBack = Tables.readOrc(spark, s"$base/docs.orc")
    assert(docsBack.schema == docs.schema)
    assert(docsBack.orderBy("doc_id").collect().toSeq ==
      docs.orderBy("doc_id").collect().toSeq)
    val emb = Tables.embeddings(spark, dir)
    Tables.writeOrc(emb, s"$base/emb.orc")
    val embBack = Tables.readOrc(spark, s"$base/emb.orc")
    assert(embBack.schema == emb.schema)
    assert(embBack.orderBy("vec_id").collect().toSeq ==
      emb.orderBy("vec_id").collect().toSeq)
  }
}
