package graft

import graft.sources.Bucketing
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def executedPlan(df: DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("same-bucket-spec tables join with no shuffle exchange") {
    val facts = (1L to 1000L).map(i => (i % 100, i, i * 2.0))
      .toDF("k", "id", "v")
    val dims = (0L until 100L).map(i => (i, s"name$i")).toDF("k", "name")
    Bucketing.writeBucketed(facts, "graft_facts_b", Seq("k"), 4)
    Bucketing.writeBucketed(dims, "graft_dims_b", Seq("k"), 4)
    // disable auto-broadcast so the bucketed sort-merge path is what's
    // tested (a broadcast join would not exercise bucket co-location)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "graft_facts_b",
        "graft_dims_b", Seq("k"))
      val plan = executedPlan(joined)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() == 1000)
      // per-key aggregation on the bucket key is also exchange-free
      val agg = spark.table("graft_facts_b").groupBy("k")
        .agg(sum("v").as("total"))
      val aggPlan = executedPlan(agg)
      assert(!aggPlan.contains("Exchange hashpartitioning"), aggPlan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_facts_b")
      spark.sql("DROP TABLE IF EXISTS graft_dims_b")
    }
  }
}
