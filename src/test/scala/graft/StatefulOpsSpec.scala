package graft

import graft.streaming.StatefulOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class StatefulOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("state carries across micro-batches; totals accumulate per user") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val q = StatefulOps.runningUserProfiles(mem.toDS())
      .writeStream.format("memory").queryName("profiles")
      .outputMode("update").start()
    try {
      mem.addData((1L, 10.0), (1L, 5.0), (2L, 1.0))
      q.processAllAvailable()
      mem.addData((1L, 20.0))
      q.processAllAvailable()
      // memory sink in update mode appends each batch's updates — the row
      // with the highest (monotone) event count per user is the current one
      val last = spark.table("profiles")
        .as[StatefulOps.UserProfile].collect()
        .groupBy(_.userId).map { case (k, rows) => k -> rows.maxBy(_.totalEvents) }
      assert(last(1L).totalEvents == 3L && last(1L).totalValue == 35.0 &&
        last(1L).maxValue == 20.0)
      assert(last(2L).totalEvents == 1L && last(2L).totalValue == 1.0)
    } finally q.stop()
  }

  test("same code path runs on a static dataset as one batch") {
    val out = StatefulOps.runningUserProfiles(
        Seq((7L, 2.0), (7L, 3.0)).toDS())
      .collect()
    assert(out.toSeq == Seq(StatefulOps.UserProfile(7L, 2L, 5.0, 3.0)))
  }
}
