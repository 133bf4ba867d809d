package graft

import graft.ops.Similarity
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("probing every cell reproduces exact brute-force top-k") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter($"vec_id" === 0L)
    val brute = Similarity.bruteTopK(emb, q, "vec_id", "embedding", 10)
      .as[(Long, Double)].collect().toSeq
    val ivfAll = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10,
        nClusters = 8, nProbe = 8)
      .as[(Long, Double)].collect().toSeq
    assert(ivfAll == brute)
  }

  test("partial probe returns k results that are a subset-quality answer") {
    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter($"vec_id" === 0L)
    val out = Similarity.ivfTopK(emb, q, "vec_id", "embedding", 10,
      nClusters = 8, nProbe = 2).as[(Long, Double)].collect().toSeq
    assert(out.size == 10)
    // the query's own cell is always probed → self at cos 1.0 leads
    assert(out.head._1 == 0L && out.head._2 == 1.0)
    // scores are sorted descending
    assert(out.map(_._2) == out.map(_._2).sorted.reverse)
  }
}
