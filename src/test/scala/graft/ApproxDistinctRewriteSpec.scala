package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ApproxDistinctRewriteSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val df = (1L to 10000L).map(i => (i % 1000, i % 7))
    .toDF("k", "v")

  private def withFlag[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.approx.distinct", on.toString)
    try f finally spark.conf.unset("spark.graft.approx.distinct")
  }

  test("flag off: exact countDistinct, plan has no HLL") {
    withFlag(false) {
      val q = df.agg(countDistinct($"k").as("n"))
      assert(q.queryExecution.optimizedPlan.toString
        .contains("count(distinct"))
      assert(q.as[Long].head() == 1000L)
    }
  }

  test("flag on: rewritten to HLL++, approximate result") {
    withFlag(true) {
      val q = df.agg(countDistinct($"k").as("n"))
      val plan = q.queryExecution.optimizedPlan.toString
      assert(plan.contains("approx_count_distinct"), plan)
      val n = q.as[Long].head()
      assert(math.abs(n - 1000L) < 100L, n) // within HLL++ 5% rsd
    }
  }

  test("multi-column distinct and filtered aggregates stay exact") {
    withFlag(true) {
      val multi = df.agg(countDistinct($"k", $"v").as("n"))
      assert(!multi.queryExecution.optimizedPlan.toString
        .contains("approx_count_distinct"))
      assert(multi.as[Long].head() == df.select("k", "v").distinct().count())
    }
  }
}
