package graft

import graft.ops.Diff
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DiffSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cdcApply: last writer wins, winning tombstone removes the key") {
    val log = Seq(
      // key A: U v1, U v3, D v2 → survives with v3's payload
      ("A", 1L, "U", 10.0), ("A", 3L, "U", 30.0), ("A", 2L, "D", 0.0),
      // key B: U v1, D v5 → deleted
      ("B", 1L, "U", 11.0), ("B", 5L, "D", 0.0),
      // key C: only a delete → absent
      ("C", 9L, "D", 0.0),
      // key E: single insert survives
      ("E", 4L, "U", 44.0)
    ).toDF("k", "v", "op", "payload")
    val out = Diff.cdcApply(log, Seq("k"), Seq("v"), "op")
      .orderBy("k").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("A", "E"))
    assert(out(0).getAs[Double]("payload") == 30.0)
    assert(out(0).getAs[Long]("v") == 3L)
  }

  test("cdcApply: version tie broken by the last version column") {
    val log = Seq(
      ("A", 7L, 1L, "U", 1.0), ("A", 7L, 2L, "U", 2.0)
    ).toDF("k", "v", "tie", "op", "payload")
    val out = Diff.cdcApply(log, Seq("k"), Seq("v", "tie"), "op").collect()
    assert(out.length == 1 && out(0).getAs[Double]("payload") == 2.0)
  }

  test("mergeUpsert: updated / inserted / carried branches") {
    val base = Seq((1L, 10.0, "a"), (2L, 20.0, "b"), (3L, 30.0, "c"))
      .toDF("k", "x", "s")
    val upd = Seq((2L, 99.0, "B"), (4L, 40.0, "d")).toDF("k", "x", "s")
    val out = Diff.mergeUpsert(base, upd, Seq("k"), Seq("x", "s"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
      r.getString(3))).toSeq == Seq(
      (1L, 10.0, "a", "carried"),
      (2L, 99.0, "B", "updated"),
      (3L, 30.0, "c", "carried"),
      (4L, 40.0, "d", "inserted")))
  }

  test("refreshAggregate: state + delta partials equals full recompute, " +
      "new keys appear") {
    val history = Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v")
    val delta = Seq(("a", 3.0), ("c", 7.0)).toDF("k", "v")
    val partials = Seq(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,6)")).as("s"))
    val merges = Seq(sum(col("n")).as("n"), sum(col("s")).as("s"))
    val state = history.groupBy(col("k")).agg(partials.head, partials.tail: _*)
    val refreshed = Diff.refreshAggregate(state, delta, Seq("k"),
        partials, merges)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue())).toMap
    assert(refreshed == Map("a" -> ((3L, 6.0)), "b" -> ((1L, 5.0)),
      "c" -> ((1L, 7.0))))
  }

  test("mergeUpsert: update may set a column to NULL (overlay, not coalesce)") {
    val base = Seq((1L, Some(10.0))).toDF("k", "x")
    val upd = Seq((1L, Option.empty[Double])).toDF("k", "x")
    val out = Diff.mergeUpsert(base, upd, Seq("k"), Seq("x")).collect()
    assert(out.length == 1 && out(0).isNullAt(out(0).fieldIndex("x")))
    assert(out(0).getAs[String]("merge_status") == "updated")
  }
}
