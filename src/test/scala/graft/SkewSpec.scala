package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // key 1 is hot (100 rows), keys 2..4 are cold
  private lazy val skewed = ((1 to 100).map(i => (1L, i.toDouble)) ++
    Seq((2L, 5.0), (3L, 7.0), (3L, 9.0), (4L, 1.0)))
    .toDF("k", "v")

  test("salted aggregation equals plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("total"), max("v").as("mx"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedAgg(skewed, Seq("k"), saltBuckets = 8,
        partials = Seq(count(lit(1)).as("n"), sum("v").as("total"),
          max("v").as("mx")),
        merges = Seq(sum("n").as("n"), sum("total").as("total"),
          max("mx").as("mx")))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("salted join equals plain join, inner and left") {
    val dim = Seq((1L, "hot"), (3L, "cold3")).toDF("k", "name")
    for (jt <- Seq("inner", "left")) {
      val plain = skewed.join(dim, Seq("k"), jt)
        .orderBy("k", "v").collect().toSeq
      val salted = Skew.saltedJoin(skewed, dim, Seq("k"), 4, jt)
        .orderBy("k", "v").collect().toSeq
      assert(salted == plain, s"join type $jt")
    }
  }
}
