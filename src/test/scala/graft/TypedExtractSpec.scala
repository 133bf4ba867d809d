package graft

import graft.extract.TypedExtract
import graft.extract.TypedExtract.Event
import org.scalatest.funsuite.AnyFunSuite

class TypedExtractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed aggregator matches hand-computed features") {
    val events = Seq(
      Event(1L, "purchase", 10.0), Event(1L, "click", 0.0),
      Event(1L, "purchase", 30.0), Event(2L, "click", 0.0)
    ).toDS()
    val out = TypedExtract.userFeatures(events).collect()
      .map(f => f.userId -> f).toMap
    assert(out(1L).totalEvents == 3L)
    assert(out(1L).totalPurchases == 2L)
    assert(out(1L).totalAmount == 40.0)
    assert(out(1L).avgAmount == 20.0)
    assert(out(1L).purchaseRate == 2.0 / 3)
    assert(out(2L).avgAmount == 0.0 && out(2L).purchaseRate == 0.0)
  }

  test("typed aggregator agrees with the untyped flagship on real data") {
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
    val typed = TypedExtract.userFeatures(
        ev.selectExpr("user_id AS userId", "event_type AS eventType",
          "value AS amount").as[Event])
      .collect().map(f => f.userId -> f).toMap
    val untyped = new graft.extract.UserEventExtractor().extract(ev)
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(typed.keySet == untyped.keySet)
    typed.foreach { case (u, f) =>
      assert(f.totalEvents == untyped(u).getAs[Long]("total_events"))
      assert(f.totalPurchases == untyped(u).getAs[Long]("total_purchases"))
      assert(math.abs(f.totalAmount -
        untyped(u).getAs[Double]("total_amount")) < 1e-6)
      assert(math.abs(f.avgAmount -
        untyped(u).getAs[Double]("avg_amount")) < 1e-6)
    }
  }
}
