package graft

import java.nio.file.Files

import graft.sources.JsonLines
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JsonLinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("strict read routes malformed lines to quarantine, raw bytes intact") {
    val dir = Files.createTempDirectory("graft_jsonl")
    val f = dir.resolve("shard-00000.jsonl")
    Files.write(f, java.util.Arrays.asList(
      """{"doc_id": 1, "text": "hello world", "lang": "en"}""",
      """{"doc_id": 2, "text": "bonjour", "lang": "fr"}""",
      """{"doc_id": 3, "text": "missing lang is fine"}""",
      """{not json at all""",
      """{"doc_id": "also fine as null-field coercion?", "text": 7}"""))
    val (good, bad) = JsonLines.readWithQuarantine(spark, f.toString, schema)
    // line 3 parses with lang NULL (missing field ≠ malformed); line 4 is
    // unparseable and line 5 has a type mismatch — both quarantined (a
    // value that silently coerced to NULL would be data loss, not leniency)
    assert(good.count() == 3)
    assert(good.filter(col("doc_id") === 3 && col("lang").isNull).count() == 1)
    val q = bad.collect().sortBy(_.getAs[String]("raw_line"))
    assert(q.length == 2)
    assert(q.exists(_.getAs[String]("raw_line") == "{not json at all"))
    assert(q.forall(_.getAs[String]("source_file").contains("shard-00000")))
  }

  test("write/read round-trip preserves rows, bounded shard count") {
    val dir = Files.createTempDirectory("graft_jsonl_rt").resolve("out")
    val df = (1 to 200).map(i => (i.toLong, s"text $i", "en"))
      .toDF("doc_id", "text", "lang")
    JsonLines.write(df.repartition(16), dir.toString, shards = 2)
    val files = new java.io.File(dir.toString).listFiles()
      .count(_.getName.endsWith(".json"))
    assert(files == 2)
    val (back, bad) = JsonLines.readWithQuarantine(spark, dir.toString, schema)
    assert(bad.count() == 0)
    assert(back.count() == 200)
    assert(back.agg(sum("doc_id")).head().getLong(0) == (1 to 200).sum)
  }
}
