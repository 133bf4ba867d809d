package graft

import graft.ops.AsofJoin
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // left: lookups at t; right: versioned values per key
  private lazy val left = Seq(
    (1L, 10L, "l1"), (1L, 25L, "l2"), (1L, 5L, "l0"), (2L, 10L, "l3")
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    (1L, 10L, "v@10"), (1L, 20L, "v@20"), (3L, 1L, "v-other")
  ).toDF("k", "rt", "v")

  test("backward as-of: latest right ≤ left time; inclusive; null if none") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("v")).toMap
    assert(out("l1") == "v@10")   // inclusive at equal time
    assert(out("l2") == "v@20")   // latest preceding, not first
    assert(out("l0") == null)     // nothing at or before t=5
    assert(out("l3") == null)     // key with no right rows
  }

  test("forward as-of: earliest right ≥ left time") {
    val out = AsofJoin.asofForward(left, right, Seq("k"), "t", "rt", Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("v")).toMap
    assert(out("l0") == "v@10")
    assert(out("l1") == "v@10")   // inclusive
    assert(out("l2") == null)     // nothing at or after t=25
  }

  test("left columns and row count are preserved") {
    val out = AsofJoin.asofBackward(left, right, Seq("k"), "t", "rt", Seq("v"))
    assert(out.count() == 4)
    assert(out.columns.toSet == Set("k", "t", "tag", "v"))
  }
}
