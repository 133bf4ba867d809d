package graft.store

import graft.model.DataQualityMetrics

import scala.collection.mutable.ListBuffer

/** Access/creation counters + quality alerts, mirroring the reference
  * `FeatureMonitor` (`ML Feature Store Pipeline.py:201-226`): creations with
  * an overall score below the threshold append an alert (`:217-220`,
  * threshold from config `:551,556-557`). Driver-side control plane — at
  * cluster scale these counters would be fed from a SparkListener, but the
  * semantics live here.
  */
final class FeatureMonitor(qualityThreshold: Double = 0.8) {
  private var accessCount = 0L
  private var creationCount = 0L
  private val alertList = ListBuffer[String]()
  private val accessByVersion = scala.collection.mutable.Map[String, Long]()

  def logFeatureAccess(version: String): Unit = synchronized {
    accessCount += 1
    accessByVersion(version) = accessByVersion.getOrElse(version, 0L) + 1
  }

  def logFeatureCreation(version: String, metrics: DataQualityMetrics): Unit =
    synchronized {
      creationCount += 1
      if (metrics.overallScore < qualityThreshold)
        alertList += f"Low quality features registered: $version (score: ${metrics.overallScore}%.3f)"
    }

  def dashboard: Map[String, Any] = synchronized {
    Map(
      "total_accesses" -> accessCount,
      "total_creations" -> creationCount,
      "alerts" -> alertList.toList,
      "access_by_version" -> accessByVersion.toMap)
  }
}
