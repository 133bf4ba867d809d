package graft

import graft.ops.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bucketed: containment exact, multi-bucket spans, overlaps kept") {
    val points = Seq(("u", 5L), ("u", 10L), ("u", 25L), ("v", 5L))
      .toDF("k", "t")
    val intervals = Seq(
      ("u", 0L, 10L, "a"), // catches t=5 and t=10 (inclusive both ends)
      ("u", 8L, 30L, "b"), // spans 3 width-10 buckets; catches 10 and 25
      ("v", 6L, 9L, "c") // v's point at 5 is outside
    ).toDF("k", "lo", "hi", "name")
    val got = RangeJoin.bucketed(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 10L)
      .select("k", "t", "name").as[(String, Long, String)].collect().toSet
    assert(got == Set(("u", 5L, "a"), ("u", 10L, "a"), ("u", 10L, "b"),
      ("u", 25L, "b")))
  }

  test("bucketed ≡ naive BETWEEN join on random data") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(400)(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val intervals = Seq.tabulate(60) { i =>
      val lo = rnd.nextInt(950).toLong
      (s"k${rnd.nextInt(5)}", lo, lo + rnd.nextInt(120).toLong, i.toLong)
    }.toDF("k", "lo", "hi", "iid")
    val fast = RangeJoin.bucketed(points, intervals, Seq("k"),
        "t", "lo", "hi", bucketWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals, Seq("k"))
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(fast == naive && fast.nonEmpty)
  }
}
