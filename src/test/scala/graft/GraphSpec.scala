package graft

import graft.ops.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // star toward "hub" plus one off-path edge; "lone" only points outward
  private lazy val edges = Seq(
    ("a", "hub"), ("b", "hub"), ("c", "hub"), ("lone", "a"))
    .toDF("src", "dst")

  test("pageRank: heavily-linked node outranks everything; ranks are " +
      "positive; two runs are bit-identical") {
    val r = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(x => x.getAs[String]("node") -> x.getAs[Double]("rank"))
      .toMap
    assert(r.size == 5)
    assert(r("hub") == r.values.max)
    // "a" has one in-link, "b"/"c" have none → a outranks them
    assert(r("a") > r("b") && r("b") == r("c"))
    assert(r.values.forall(_ > 0.0))
    val r2 = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(x => x.getAs[String]("node") -> x.getAs[Double]("rank"))
      .toMap
    assert(r == r2)
  }

  test("pageRank: total mass stays <= 1 (dangling leak) and > the " +
      "teleport floor") {
    val r = Graph.pageRank(edges, "src", "dst", iterations = 3)
      .collect().map(_.getAs[Double]("rank"))
    val total = r.sum
    assert(total <= 1.0 + 1e-9, s"mass $total")
    assert(total > 0.15, s"mass $total") // at least the teleport term
  }

  test("degreeStats: per-direction counts with zero-fill") {
    val d = Graph.degreeStats(edges, "src", "dst")
      .collect().map(x => x.getAs[String]("node") ->
        (x.getAs[Long]("out_deg"), x.getAs[Long]("in_deg"))).toMap
    assert(d("hub") == ((0L, 3L)))
    assert(d("a") == ((1L, 1L)))
    assert(d("lone") == ((1L, 0L)))
  }
}
