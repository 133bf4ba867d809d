package graft

import graft.ops.PointInTime
import graft.ops.PointInTime.FeatureGroup
import org.scalatest.funsuite.AnyFunSuite

class PointInTimeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // labels: (user, ts); two feature groups maintained on their own clocks
  private lazy val labels = Seq(
    (1L, 100L, "a"), (1L, 200L, "b"), (2L, 150L, "c"), (3L, 50L, "d")
  ).toDF("uid", "ts", "tag")
  private lazy val fg1 = Seq(
    (1L, 90L, 9.0), (1L, 100L, 10.0), (1L, 150L, 15.0), (2L, 150L, 2.0)
  ).toDF("user", "fts", "spend")
  private lazy val fg2 = Seq(
    (1L, 10L, "x"), (2L, 160L, "y")
  ).toDF("uid", "gts", "segment")

  private def expected = Map(
    // fg1 inclusive as-of: label (1,100) sees the 100-stamped row
    (1L, 100L) -> ((Some(10.0), Some("x"))),
    (1L, 200L) -> ((Some(15.0), Some("x"))),
    (2L, 150L) -> ((Some(2.0), None)), // fg2's user-2 row is later → null
    (3L, 50L) -> ((None, None)) // user 3 in no feature group
  )

  private def check(native: Boolean): Unit = {
    val out = PointInTime.trainingMatrix(labels, "uid", "ts",
      Seq(FeatureGroup(fg1, "user", "fts", Seq("spend")),
        FeatureGroup(fg2, "uid", "gts", Seq("segment"))),
      native = native)
    assert(out.columns.toSet ==
      Set("uid", "ts", "tag", "spend", "segment"))
    val got = out.collect().map { r =>
      (r.getAs[Long]("uid"), r.getAs[Long]("ts")) ->
        ((Option(r.get(r.fieldIndex("spend")))
            .map(_.asInstanceOf[Double]),
          Option(r.getAs[String]("segment"))))
    }.toMap
    assert(got == expected, s"native=$native")
  }

  test("trainingMatrix attaches every group as-of, window rewrite") {
    check(native = false)
  }

  test("trainingMatrix through the native sorted-merge as-of operator") {
    check(native = true)
  }

  test("feature-column collisions with the spine are rejected") {
    val bad = FeatureGroup(fg1.withColumnRenamed("spend", "tag"),
      "user", "fts", Seq("tag"))
    intercept[IllegalArgumentException] {
      PointInTime.trainingMatrix(labels, "uid", "ts", Seq(bad))
    }
  }

  test("registered pit query: native and window paths agree on real data") {
    val dir = "/root/testdata/sf0.001"
    val a = graft.queries.FeatureQueries.pitTrainingMatrix(spark, dir)
      .collect().toSeq
    // the registered query runs native = true; rebuild the same matrix via
    // the window rewrite by swapping the flag through trainingMatrix
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val ev = graft.sources.Tables.events(spark, dir)
    val lbl = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("value").as("label_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("c_ts_us"))
      .agg(max_by(col("value"), col("event_id")).as("last_click_value"))
    val views = ev.filter(col("event_type") === "view")
      .withColumn("__vs", count(lit(1)).over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), unix_micros(col("ts")).as("v_ts_us"))
      .agg(max(col("__vs")).as("views_asof"))
    val b = PointInTime.trainingMatrix(lbl, "user_id", "ts_us",
        Seq(FeatureGroup(clicks, "user_id", "c_ts_us",
            Seq("last_click_value")),
          FeatureGroup(views, "user_id", "v_ts_us", Seq("views_asof"))),
        native = false)
      .withColumn("views_asof", coalesce(col("views_asof"), lit(0L)))
      .select("user_id", "event_id", "ts_us", "label_value",
        "last_click_value", "views_asof")
      .orderBy("user_id", "event_id")
      .collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
