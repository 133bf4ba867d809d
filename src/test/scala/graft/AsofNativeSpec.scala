package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class AsofNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val left = Seq(
    (1L, 10L, "l1"), (1L, 25L, "l2"), (1L, 5L, "l0"), (2L, 10L, "l3")
  ).toDF("k", "t", "tag")
  private lazy val right = Seq(
    (1L, 10L, "v@10"), (1L, 20L, "v@20"), (3L, 1L, "v-other")
  ).toDF("k", "rt", "v")

  test("native as-of matches the fixture semantics of the window path") {
    val out = AsofJoin.asofBackwardNative(left, right, Seq("k"), "t", "rt",
        Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("v")).toMap
    assert(out("l1") == "v@10")   // inclusive at equal time
    assert(out("l2") == "v@20")
    assert(out("l0") == null)
    assert(out("l3") == null)
  }

  test("plan uses the custom exec; no window, no nested-loop join") {
    val df = AsofJoin.asofBackwardNative(left, right, Seq("k"), "t", "rt",
      Seq("v"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("NestedLoop"), plan)
  }

  test("forward native: fixtures + plan shape") {
    val out = AsofJoin.asofForwardNative(left, right, Seq("k"), "t", "rt",
        Seq("v"))
      .collect().map(r => r.getAs[String]("tag") -> r.getAs[String]("v")).toMap
    assert(out("l0") == "v@10")   // earliest right at/after t=5
    assert(out("l1") == "v@10")   // inclusive at equal time
    assert(out("l2") == null)     // nothing after t=25
    assert(out("l3") == null)     // no key-2 right rows
  }

  test("forward native ≡ forward window formulation on random data") {
    val rnd = new Random(7)
    val l = Seq.fill(400)((rnd.nextInt(20).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .toDF("k", "t", "payload")
    val r = Seq.fill(300)((rnd.nextInt(25).toLong,
        rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "rt", "v0")
      .groupBy("k", "rt").agg(max(col("v0")).as("v"))
    val native = AsofJoin.asofForwardNative(l, r, Seq("k"), "t", "rt",
        Seq("v"))
      .select("k", "t", "payload", "v")
      .collect().map(_.toSeq).toSet
    val window = AsofJoin.asofForward(l, r, Seq("k"), "t", "rt",
        Seq("v"))
      .select("k", "t", "payload", "v")
      .collect().map(_.toSeq).toSet
    assert(native == window)
  }

  test("native ≡ window formulation on random data") {
    val rnd = new Random(3)
    val l = Seq.fill(400)((rnd.nextInt(20).toLong,
        rnd.nextInt(1000).toLong, rnd.nextInt(100000)))
      .toDF("k", "t", "payload")
    // right unique per (k, rt): aggregate duplicates away deterministically
    val r = Seq.fill(300)((rnd.nextInt(25).toLong,
        rnd.nextInt(1000).toLong, rnd.nextDouble()))
      .toDF("k", "rt", "v0")
      .groupBy("k", "rt").agg(max(col("v0")).as("v"))
    val native = AsofJoin.asofBackwardNative(l, r, Seq("k"), "t", "rt",
        Seq("v", "rt"))
      .select("k", "t", "payload", "v", "rt")
      .collect().map(_.toSeq).toSet
    val window = AsofJoin.asofBackward(l, r, Seq("k"), "t", "rt",
        Seq("v", "rt"))
      .select("k", "t", "payload", "v", "rt")
      .collect().map(_.toSeq).toSet
    assert(native == window)
  }
}
