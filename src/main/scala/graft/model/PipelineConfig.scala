package graft.model

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Pipeline configuration mirroring the reference's YAML config surface
  * (`create_advanced_config`, `ML Feature Store Pipeline.py:544-566`):
  * source path, store location, cache TTL, quality threshold, cleanup
  * schedule, and monitoring alert thresholds.
  *
  * The offline build adds no YAML dependency; the file format is the strict
  * two-level subset of YAML the reference actually emits (scalars and one
  * nested mapping level), written and parsed here. Any YAML library reads
  * the emitted files.
  */
final case class PipelineConfig(
    rawData: String = "data/raw_events.csv",
    featureStorePath: String = "advanced_feature_store",
    featureTable: String = "features",
    featureMetadataTable: String = "feature_metadata",
    cacheTtl: Long = 3600,
    dataQualityThreshold: Double = 0.8,
    cleanupSchedule: String = "daily",
    enableAlerts: Boolean = true,
    alertQualityScore: Double = 0.8,
    alertNullPercentage: Double = 0.1) {

  /** Serialize in the reference's YAML shape (`:545-560`). */
  def toYaml: String =
    s"""raw_data: $rawData
       |feature_store_db: $featureStorePath
       |feature_table: $featureTable
       |feature_metadata_table: $featureMetadataTable
       |cache_ttl: $cacheTtl
       |data_quality_threshold: $dataQualityThreshold
       |cleanup_schedule: $cleanupSchedule
       |monitoring:
       |  enable_alerts: $enableAlerts
       |  alert_thresholds:
       |    quality_score: $alertQualityScore
       |    null_percentage: $alertNullPercentage
       |""".stripMargin

  def save(path: String): Path = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    Files.writeString(p, toYaml)
  }
}

object PipelineConfig {

  /** Environment-variable overrides layered over a loaded config, the
    * reference's documented deployment knobs (`README.md:227-231`:
    * `FEATURE_STORE_DB_PATH`, `CACHE_TTL`, `QUALITY_THRESHOLD`).
    * Unparseable numeric values are ignored (the config keeps its
    * file/default value) rather than failing startup.
    */
  def withEnvOverrides(base: PipelineConfig,
      env: Map[String, String] = sys.env): PipelineConfig = {
    def long(k: String) = env.get(k).flatMap(_.toLongOption)
    def dbl(k: String) = env.get(k).flatMap(_.toDoubleOption)
    base.copy(
      featureStorePath = env.getOrElse("FEATURE_STORE_DB_PATH",
        base.featureStorePath),
      cacheTtl = long("CACHE_TTL").getOrElse(base.cacheTtl),
      dataQualityThreshold = dbl("QUALITY_THRESHOLD")
        .getOrElse(base.dataQualityThreshold))
  }

  /** [[load]] + [[withEnvOverrides]] — the production entry point. */
  def loadWithEnv(path: String,
      env: Map[String, String] = sys.env): PipelineConfig =
    withEnvOverrides(load(path), env)

  /** Parse the two-level YAML subset emitted by [[PipelineConfig.toYaml]]
    * (and by the reference's `yaml.dump` of its flat config dict).
    */
  def load(path: String): PipelineConfig = {
    val kv = Files.readAllLines(Paths.get(path)).asScala
      .filter(l => l.trim.nonEmpty && l.trim.contains(":"))
      .map { l =>
        val Array(k, v) = l.split(":", 2)
        k.trim -> v.trim
      }.toMap
    def str(k: String, d: String) = kv.get(k).filter(_.nonEmpty).getOrElse(d)
    val d = PipelineConfig()
    PipelineConfig(
      rawData = str("raw_data", d.rawData),
      featureStorePath = str("feature_store_db", d.featureStorePath),
      featureTable = str("feature_table", d.featureTable),
      featureMetadataTable = str("feature_metadata_table", d.featureMetadataTable),
      cacheTtl = kv.get("cache_ttl").map(_.toLong).getOrElse(d.cacheTtl),
      dataQualityThreshold = kv.get("data_quality_threshold").map(_.toDouble)
        .getOrElse(d.dataQualityThreshold),
      cleanupSchedule = str("cleanup_schedule", d.cleanupSchedule),
      enableAlerts = kv.get("enable_alerts").map(_.toBoolean).getOrElse(d.enableAlerts),
      alertQualityScore = kv.get("quality_score").map(_.toDouble)
        .getOrElse(d.alertQualityScore),
      alertNullPercentage = kv.get("null_percentage").map(_.toDouble)
        .getOrElse(d.alertNullPercentage))
  }
}
