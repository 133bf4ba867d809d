package graft

import java.nio.file.Files

import graft.store.{Compaction, FeatureStore}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CompactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(): String =
    Files.createTempDirectory("graft_compact").resolve("t").toString

  test("compact merges small files, content fingerprint unchanged") {
    val path = freshDir()
    val df = (1 to 5000).map(i => (i.toLong, s"v$i", i % 7)).toDF("id", "s", "g")
    df.repartition(32).write.parquet(path)
    val (before, bytes) = Compaction.tableFiles(spark, path)
    assert(before == 32)
    val fpBefore = FeatureStore.fingerprint(spark.read.parquet(path))
    val report = Compaction.compact(spark, path, targetFileBytes = bytes)
    assert(report.filesBefore == 32 && report.filesAfter < 32)
    assert(report.filesAfter <= 2)
    assert(FeatureStore.fingerprint(spark.read.parquet(path)) == fpBefore)
    assert(spark.read.parquet(path).count() == 5000)
  }

  test("compact with sortCols range-clusters output files") {
    val path = freshDir()
    (1 to 8000).map(i => (i.toLong, i % 13)).toDF("id", "g")
      .repartition(16).write.parquet(path)
    val (_, bytes) = Compaction.tableFiles(spark, path)
    // force ~4 output files, range-partitioned by id
    val report = Compaction.compact(spark, path, bytes / 4 + 1, Seq("id"))
    assert(report.filesAfter < report.filesBefore)
    // each output file covers a DISJOINT id range: per-file min/max
    // intervals must not overlap (that's what makes skipping work)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("id").as("mn"), max("id").as("mx"))
      .orderBy("mn")
      .collect()
    assert(perFile.length > 1)
    perFile.sliding(2).foreach {
      case Array(a, b) => assert(a.getAs[Long]("mx") < b.getAs[Long]("mn"))
      case _ =>
    }
  }

  test("already-compact table is a no-op") {
    val path = freshDir()
    (1 to 100).map(i => (i, i)).toDF("a", "b").coalesce(1).write.parquet(path)
    val (before, bytes) = Compaction.tableFiles(spark, path)
    val report = Compaction.compact(spark, path, targetFileBytes = bytes * 10)
    assert(report.filesBefore == before && report.filesAfter == before)
  }
}
