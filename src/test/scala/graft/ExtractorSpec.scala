package graft

import graft.extract.UserEventExtractor
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

class ExtractorSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // Fixture per FIXTURES.md A1: user 1 has no positive amounts (avg_amount
  // null→0 path), user 2 has a single event (days_active = 1), user 3 spans
  // 26 h across a calendar-day boundary (duration-days trap: floor(26h/24h)
  // = 1 → days_active 2; a calendar datediff would also say 2 here, so user
  // 4 spans 2 h across midnight where the two definitions differ).
  private lazy val events = Seq(
    (1L, "click", 0.0, ts("2023-01-01 10:00:00")),
    (1L, "view", 0.0, ts("2023-01-01 11:00:00")),
    (2L, "purchase", 25.5, ts("2023-01-02 09:30:00")),
    (3L, "purchase", 10.0, ts("2023-01-01 00:00:00")),
    (3L, "click", 0.0, ts("2023-01-02 02:00:00")),
    (4L, "view", 0.0, ts("2023-01-01 23:00:00")),
    (4L, "purchase", 4.5, ts("2023-01-02 01:00:00")),
    (4L, "purchase", 5.5, ts("2023-01-02 01:30:00"))
  ).toDF("user_id", "event_type", "value", "ts")

  private lazy val byUser =
    new UserEventExtractor().extract(events).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap

  test("no-positive-amount user gets avg_amount repaired to 0") {
    val r = byUser(1L)
    assert(r.getAs[Double]("avg_amount") == 0.0)
    assert(r.getAs[Long]("total_purchases") == 0L)
    assert(r.getAs[Double]("purchase_rate") == 0.0)
  }

  test("single-event user has days_active 1") {
    val r = byUser(2L)
    assert(r.getAs[Long]("days_active") == 1L)
    assert(r.getAs[Long]("total_events") == 1L)
    assert(r.getAs[Double]("avg_amount") == 25.5)
  }

  test("days_active is truncated duration days + 1, not calendar diff") {
    assert(byUser(3L).getAs[Long]("days_active") == 2L) // 26 h → 1 + 1
    // 2 h across midnight: duration floor = 0 → 1; datediff would say 2.
    assert(byUser(4L).getAs[Long]("days_active") == 1L)
  }

  test("aggregates and derived columns") {
    val r = byUser(4L)
    assert(r.getAs[Long]("total_events") == 3L)
    assert(r.getAs[Long]("total_purchases") == 2L)
    assert(r.getAs[Double]("total_amount") == 10.0)
    assert(r.getAs[Double]("avg_amount") == 5.0)
    assert(r.getAs[Long]("unique_event_types") == 2L)
    assert(math.abs(r.getAs[Double]("purchase_rate") - 2.0 / 3) < 1e-12)
    assert(r.getAs[Double]("avg_events_per_day") == 3.0)
  }

  test("declared feature configs match output schema") {
    val ex = new UserEventExtractor()
    val out = ex.extract(events)
    assert(ex.featureConfigs.map(_.name).toSet.subsetOf(out.columns.toSet + "user_id"))
  }
}
