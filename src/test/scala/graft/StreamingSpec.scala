package graft

import java.sql.Timestamp

import graft.streaming.StreamingFeatures
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  private val rows = Seq(
    (1L, ts(1), "click", 0.0),
    (1L, ts(5), "purchase", 10.0),
    (1L, ts(65), "click", 0.0),     // next hour window / next session
    (2L, ts(2), "purchase", 5.0),
    (2L, ts(2), "purchase", 5.0)    // duplicate (same user/ts/type/value)
  )

  private def batchDf = rows.toDF("user_id", "ts", "event_type", "value")

  test("windowed features: streaming over MemoryStream equals batch") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = StreamingFeatures.windowedUserFeatures(sdf)
      .writeStream.format("memory").queryName("wuf")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streaming = spark.table("wuf")
        .orderBy("user_id", "window_start").collect().toSeq
      val batch = StreamingFeatures.windowedUserFeatures(batchDf)
        .orderBy("user_id", "window_start").collect().toSeq
      assert(streaming == batch)
      val u1w0 = streaming.find(r => r.getAs[Long]("user_id") == 1L &&
        r.getAs[Timestamp]("window_start") == ts(0)).get
      assert(u1w0.getAs[Long]("total_events") == 2L)
      assert(u1w0.getAs[Long]("total_purchases") == 1L)
    } finally q.stop()
  }

  test("sessionize: gap splits sessions; value summed per session") {
    val out = StreamingFeatures.sessionize(batchDf).collect()
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.length == 2)                      // minute 1–5 vs minute 65
    assert(u1.map(_.getAs[Long]("n_events")).sorted.toSeq == Seq(1L, 2L))
  }

  test("stream-stream attribution join pairs purchases with preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp, String, Double)]
    val purchases = MemoryStream[(Long, Long, Timestamp, String, Double)]
    def named(m: MemoryStream[(Long, Long, Timestamp, String, Double)]) =
      m.toDF().toDF("event_id", "user_id", "ts", "event_type", "value")
    val q = StreamingFeatures.attributionJoin(named(clicks), named(purchases))
      .writeStream.format("memory").queryName("attr")
      .outputMode("append").start()
    try {
      clicks.addData((10L, 1L, ts(5), "click", 0.0),    // within 30 min
        (11L, 1L, ts(90), "click", 0.0),                 // later than purchase
        (12L, 2L, ts(1), "click", 0.0))                  // other user
      purchases.addData((20L, 1L, ts(20), "purchase", 9.0))
      q.processAllAvailable()
      val rows = spark.table("attr")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((20L, 10L)))
    } finally q.stop()
  }

  test("dedup stream dedups per KEY on static input (not per key+ts)") {
    val out = StreamingFeatures.dedupStream(batchDf,
      Seq("user_id", "event_type", "value"))
    // user 1's two clicks share the key (different ts) → one survives;
    // user 2's exact duplicate collapses
    assert(out.count() == 3)
  }

  test("dedup stream drops same-key duplicates arriving within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val sdf = mem.toDF().toDF("user_id", "ts", "event_type", "value")
    val q = StreamingFeatures.dedupStream(sdf, Seq("user_id", "event_type"))
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(1), "click", 0.0), (1L, ts(3), "click", 0.0),
        (2L, ts(2), "purchase", 5.0))
      q.processAllAvailable()
      val keys = spark.table("dedup").select("user_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(keys == Set((1L, "click"), (2L, "purchase")))
    } finally q.stop()
  }

  test("streaming near-dup dedup: foreachBatch against the incremental " +
      "signature index, union of per-batch survivors == batch dedup") {
    import graft.ops.Dedup
    implicit val sqlCtx = spark.sqlContext
    // batch 1: 1↔2 near-dups; batch 2: 4 near-dups batch-1's survivor 1,
    // 5 is novel, 6 near-dups 5 within its own batch
    val b1 = Seq((1L, "the quick brown fox jumps high"),
      (2L, "the quick brown fox jumps high"),
      (3L, "completely different words entirely here"))
    val b2 = Seq((4L, "the quick brown fox jumps high"),
      (5L, "unrelated novel content appears now everywhere"),
      (6L, "unrelated novel content appears now everywhere"))
    val mem = MemoryStream[(Long, String)]
    val sdf = mem.toDF().toDF("doc_id", "text")
    // the production shape: each micro-batch dedups against the persisted
    // index of everything seen before, never re-reading old raw text in
    // the batch path; the index then absorbs the new batch
    var state: Option[org.apache.spark.sql.DataFrame] = None
    var seen: Option[org.apache.spark.sql.DataFrame] = None
    val survivors = scala.collection.mutable.Set.empty[Long]
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val all = state match {
            case None => Dedup.nearDupDedup(b, "doc_id", "text", 0.9)
              .select("doc_id").as[Long].collect().toSet
            case Some(st) =>
              Dedup.incrementalDedup(b, "doc_id", "text", st, 0.9)
                .select("doc_id").as[Long].collect().toSet
          }
          survivors.clear(); survivors ++= all
          val allDocs = seen.map(_.unionByName(b)).getOrElse(b)
            .localCheckpoint(true)
          seen = Some(allDocs)
          state = Some(Dedup.incrementalState(allDocs, "doc_id", "text",
            0.9).localCheckpoint(true))
        }
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      assert(survivors == Set(1L, 3L), s"after batch 1: $survivors")
      mem.addData(b2: _*); q.processAllAvailable()
      val full = Dedup.nearDupDedup((b1 ++ b2).toDF("doc_id", "text"),
          "doc_id", "text", 0.9)
        .select("doc_id").as[Long].collect().toSet
      assert(survivors == full, s"streaming $survivors != batch $full")
      assert(survivors == Set(1L, 3L, 5L))
    } finally q.stop()
  }

  test("streaming PIT maintenance: foreachBatch incremental matrix " +
      "refresh for touched keys equals the full recompute after every " +
      "micro-batch") {
    import graft.ops.PointInTime
    import graft.ops.PointInTime.FeatureGroup
    implicit val sqlCtx = spark.sqlContext
    // fixed label spine: three users, labels at minutes 10 / 30 / 50
    val labels = Seq(
      (1L, ts(10), 0), (1L, ts(30), 1), (1L, ts(50), 0),
      (2L, ts(30), 1), (3L, ts(30), 0))
      .toDF("user_id", "label_ts", "y").localCheckpoint(true)
    // static group: account tier, known up front
    val tier = Seq((1L, ts(0), "basic"), (2L, ts(0), "pro"),
      (1L, ts(40), "pro"))
      .toDF("user_id", "t_ts", "tier").localCheckpoint(true)
    def groups(spend: org.apache.spark.sql.DataFrame) = Seq(
      FeatureGroup(spend, "user_id", "s_ts", Seq("spend")),
      FeatureGroup(tier, "user_id", "t_ts", Seq("tier")))
    // streamed group: spend snapshots arriving over three micro-batches;
    // batch 2 touches only user 1, batch 3 back-fills user 3 with a row
    // OLDER than its label (as-of correctness under late data)
    val b1 = Seq((1L, ts(5), 10.0), (2L, ts(20), 7.0))
    val b2 = Seq((1L, ts(25), 12.0), (1L, ts(45), 99.0))
    val b3 = Seq((3L, ts(15), 3.0))
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sdf = mem.toDF().toDF("user_id", "s_ts", "spend")
    var spendStore: Option[org.apache.spark.sql.DataFrame] = None
    var matrix: Option[org.apache.spark.sql.DataFrame] = None
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val batch = b.localCheckpoint(true)
          val store = spendStore.map(_.unionByName(batch)).getOrElse(batch)
            .localCheckpoint(true)
          spendStore = Some(store)
          matrix = Some((matrix match {
            case None =>
              PointInTime.trainingMatrix(labels, "user_id", "label_ts",
                groups(store))
            case Some(m) =>
              PointInTime.refreshMatrix(m, labels, "user_id", "label_ts",
                groups(store), batch.select("user_id"))
          }).localCheckpoint(true))
        }
      }.start()
    try {
      def snapshot = matrix.get
        .orderBy("user_id", "label_ts")
        .select("user_id", "label_ts", "y", "spend", "tier")
        .collect().toSeq
      def full = PointInTime.trainingMatrix(labels, "user_id", "label_ts",
          groups(spendStore.get))
        .orderBy("user_id", "label_ts")
        .select("user_id", "label_ts", "y", "spend", "tier")
        .collect().toSeq
      mem.addData(b1: _*); q.processAllAvailable()
      assert(snapshot == full, "after batch 1")
      mem.addData(b2: _*); q.processAllAvailable()
      assert(snapshot == full, "after batch 2")
      // user 1's minute-30 label now sees spend 12.0, minute-50 sees 99.0;
      // untouched users 2/3 kept their rows through the splice
      val m2 = snapshot.map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        Option(r.get(3))))
      assert(m2.contains((1L, 30L, Some(12.0))))
      assert(m2.contains((1L, 50L, Some(99.0))))
      assert(m2.contains((3L, 30L, None))) // no spend for user 3 yet
      mem.addData(b3: _*); q.processAllAvailable()
      assert(snapshot == full, "after batch 3 (late back-fill)")
      assert(snapshot.map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        Option(r.get(3)))).contains((3L, 30L, Some(3.0))))
    } finally q.stop()
  }

  test("streaming store ingest: foreachBatch register per micro-batch; " +
      "the latest version after the stream equals one batch register") {
    import graft.model.{FeatureConfig, FeatureMetadata}
    import graft.store.FeatureStore
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-store")
      .toString
    var tick = 0
    val store = new FeatureStore(spark, dir,
      clock = () => { tick += 1; f"2024-01-01T00:00:$tick%02dZ" })
    val meta = FeatureMetadata("", "streamed features", "",
      Seq(FeatureConfig("user_id", "int64"),
        FeatureConfig("total_amount", "float64")))
    val mem = MemoryStream[(Long, Double)]
    val sdf = mem.toDF().toDF("user_id", "total_amount")
    // the production shape: each micro-batch registers the CUMULATIVE
    // feature relation as a new version (content-fingerprinted, so a
    // no-data batch would re-register the same version idempotently)
    var seen: Option[org.apache.spark.sql.DataFrame] = None
    val versions = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val all = seen.map(_.unionByName(b)).getOrElse(b)
            .localCheckpoint(true)
          seen = Some(all)
          versions += store.registerFeatures(all, meta)
          ()
        }
      }.start()
    try {
      mem.addData((1L, 10.0), (2L, 20.0)); q.processAllAvailable()
      mem.addData((3L, 30.0)); q.processAllAvailable()
    } finally q.stop()
    assert(versions.size == 2 && versions.distinct.size == 2)
    // latest-version resolution picks the second (cumulative) register
    val latest = store.getFeatures(None, useCache = false)
    assert(latest.select("feature_version").head().getString(0) ==
      versions.last)
    assert(latest.count() == 3)
    // streaming-built content == one batch register: same fingerprint
    val batchDf3 = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0))
      .toDF("user_id", "total_amount")
    assert(FeatureStore.fingerprint(batchDf3) == versions.last)
    // serve path reads the streamed store end-to-end
    assert(store.serveFeatures(3L, None).get("total_amount") == 30.0)
    assert(store.serveFeatures(1L, Some(versions.head))
      .get("total_amount") == 10.0)
    assert(store.listFeatureVersions().map(_.featureVersion) ==
      versions.reverse.toSeq)
  }

  test("streaming count-min: per-batch sketches merge by addition into " +
      "the stream-lifetime sketch == one batch build over everything") {
    import graft.ops.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = Seq.fill(25)("x") ++ Seq.fill(5)("y")
    val b2 = Seq.fill(10)("x") ++ Seq.fill(40)("z")
    val mem = MemoryStream[String]
    val sdf = mem.toDF().toDF("u")
    // the sketch-per-ingest-batch shape: each micro-batch contributes a
    // depth×width cell relation; the running sketch is the cell-wise sum
    // — old events are never rescanned
    var sketch: Option[org.apache.spark.sql.DataFrame] = None
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val part = Sketches.countMinBuild(b, col("u"), 32, 3)
          sketch = Some(sketch.map(_.unionByName(part)
              .groupBy("seed", "bucket")
              .agg(sum("cnt").as("cnt")))
            .getOrElse(part).localCheckpoint(true))
        }
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = sketch.get.as[(Int, Long, Long)].collect().toSet
    val whole = Sketches.countMinBuild((b1 ++ b2).toDF("u"), col("u"),
      32, 3).as[(Int, Long, Long)].collect().toSet
    assert(streamed == whole)
    val est = Sketches.countMinEstimate(sketch.get,
        Seq("x", "y", "z").toDF("u"), col("u"), 32, 3)
      .as[(String, Long)].collect().toMap
    assert(est("x") >= 35 && est("y") >= 5 && est("z") >= 40)
  }

  test("streaming drift-on-ingest: each micro-batch is PSI-checked " +
      "against the knot history BEFORE its knots join it; shifted batch " +
      "alarms, in-distribution batch does not") {
    import graft.ops.{Drift, Sketches}
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = (1 to 200).map(_.toDouble % 50)
    val inDist = (1 to 100).map(_.toDouble % 50)
    val shifted = (1 to 100).map(i => (i.toDouble % 50) + 500.0)
    val mem = MemoryStream[Double]
    val sdf = mem.toDF().toDF("v")
    var sketch: Option[org.apache.spark.sql.DataFrame] = None
    var nextBatch = 0L
    var psis = Vector.empty[Double]
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          // gate first (zero-rescan: knots only), then admit the batch
          sketch.foreach { sk =>
            psis = psis :+ Drift.psiAgainstSketch(sk, b, "v", buckets = 10)
              .agg(org.apache.spark.sql.functions.sum("contribution"))
              .collect()(0).getDouble(0)
          }
          val part = Sketches.quantileSketchBuild(b,
            org.apache.spark.sql.functions.col("v"),
            org.apache.spark.sql.functions.lit(nextBatch), knots = 16)
          nextBatch += 1
          sketch = Some(sketch.map(_.unionByName(part))
            .getOrElse(part).localCheckpoint(true))
        }
      }.start()
    try {
      mem.addData(base: _*); q.processAllAvailable()
      mem.addData(inDist: _*); q.processAllAvailable()
      mem.addData(shifted: _*); q.processAllAvailable()
    } finally q.stop()
    assert(psis.length == 2)
    assert(math.abs(psis(0)) < 0.1) // same distribution: quiet
    assert(psis(1) > 1.0) // wholesale shift: alarms
  }

  test("streaming quantile sketch: per-micro-batch knots union into the " +
      "stream-lifetime sketch == one keyed build over everything") {
    import graft.ops.Sketches
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val b1 = (1 to 50).map(_.toDouble)
    val b2 = (1 to 50).map(i => (i + 200).toDouble)
    val mem = MemoryStream[Double]
    val sdf = mem.toDF().toDF("v")
    // quantile knots are the mergeable form whose merge IS relation
    // union, so streaming maintenance is just appending each batch's
    // ≤ knots rows — no cell-sum, no rescans, no state beyond the knots
    var sketch: Option[org.apache.spark.sql.DataFrame] = None
    var nextBatch = 0L
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val part = Sketches.quantileSketchBuild(b, col("v"),
            lit(nextBatch), knots = 8)
          nextBatch += 1
          sketch = Some(sketch.map(_.unionByName(part))
            .getOrElse(part).localCheckpoint(true))
        }
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val pcts = Seq(10, 50, 90)
    val streamed = Sketches.quantileSketchQuantiles(sketch.get, pcts)
      .orderBy("q").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n_total"),
        r.getAs[java.math.BigDecimal]("est_value"))).toSeq
    val whole = Sketches.quantileSketchQuantiles(
        Sketches.quantileSketchBuild(
          b1.map(v => (v, 0L)).++(b2.map(v => (v, 1L))).toDF("v", "__b"),
          col("v"), col("__b"), knots = 8),
        pcts)
      .orderBy("q").collect()
      .map(r => (r.getAs[Long]("q"), r.getAs[Long]("n_total"),
        r.getAs[java.math.BigDecimal]("est_value"))).toSeq
    assert(streamed == whole)
    assert(streamed.forall(_._2 == 100L))
  }

  test("streaming e2e composition: ONE foreachBatch runs ingest → " +
      "incremental dedup → sketch maintenance → PIT refresh; 3 " +
      "micro-batches equal the batch recompute on all three outputs") {
    import graft.ops.{Dedup, PointInTime, Sketches}
    import graft.ops.PointInTime.FeatureGroup
    implicit val sqlCtx = spark.sqlContext
    // (doc_id, user_id, s_ts, spend, text): docs 2/4 near-dup doc 1,
    // doc 6 near-dups doc 5 within its own batch, doc 7 is a late
    // back-fill for user 3 with a row OLDER than its label
    val b1: Seq[(Long, Long, Timestamp, Double, String)] = Seq(
      (1L, 1L, ts(5), 10.0, "the quick brown fox jumps high"),
      (2L, 2L, ts(6), 999.0, "the quick brown fox jumps high"),
      (3L, 2L, ts(20), 7.0, "completely different words entirely here"))
    val b2: Seq[(Long, Long, Timestamp, Double, String)] = Seq(
      (4L, 1L, ts(22), 888.0, "the quick brown fox jumps high"),
      (5L, 1L, ts(25), 12.0, "unrelated novel content appears now everywhere"),
      (6L, 3L, ts(7), 55.0, "unrelated novel content appears now everywhere"))
    val b3: Seq[(Long, Long, Timestamp, Double, String)] = Seq(
      (7L, 3L, ts(15), 3.0, "a genuinely new document arrives late"))
    val labels = Seq(
      (1L, ts(10), 0), (1L, ts(30), 1), (1L, ts(50), 0),
      (2L, ts(30), 1), (3L, ts(30), 0))
      .toDF("user_id", "label_ts", "y").localCheckpoint(true)
    def groups(spend: org.apache.spark.sql.DataFrame) =
      Seq(FeatureGroup(spend.select("user_id", "s_ts", "spend"),
        "user_id", "s_ts", Seq("spend")))
    val mem = MemoryStream[(Long, Long, Timestamp, Double, String)]
    val sdf = mem.toDF().toDF("doc_id", "user_id", "s_ts", "spend", "text")
    var dedupState: Option[org.apache.spark.sql.DataFrame] = None
    var seenDocs: Option[org.apache.spark.sql.DataFrame] = None
    var survivorRows: Option[org.apache.spark.sql.DataFrame] = None
    var knots: Option[org.apache.spark.sql.DataFrame] = None
    var matrix: Option[org.apache.spark.sql.DataFrame] = None
    var batchNo = -1L
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b0: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b0.isEmpty) {
          batchNo += 1
          val b = b0.localCheckpoint(true)
          // 1. incremental near-dup dedup against the persisted index —
          //    only THIS batch's survivors flow downstream
          val survIds = (dedupState match {
            case None => Dedup.nearDupDedup(b, "doc_id", "text", 0.9)
            case Some(st) => Dedup.incrementalDedup(b, "doc_id", "text",
              st, 0.9)
          }).select("doc_id")
          val bSurv = b.join(survIds, Seq("doc_id"), "left_semi")
            .localCheckpoint(true)
          val allDocs = seenDocs.map(_.unionByName(b)).getOrElse(b)
            .localCheckpoint(true)
          seenDocs = Some(allDocs)
          dedupState = Some(Dedup.incrementalState(allDocs, "doc_id",
            "text", 0.9).localCheckpoint(true))
          val store = survivorRows.map(_.unionByName(bSurv))
            .getOrElse(bSurv).localCheckpoint(true)
          survivorRows = Some(store)
          // 2. sketch maintenance: this batch's survivor spends append
          //    one knot batch — historical knots never rebuild
          val bKnots = Sketches.quantileSketchBuild(bSurv, col("spend"),
            lit(batchNo), knots = 8)
          knots = Some(knots.map(_.unionByName(bKnots)).getOrElse(bKnots)
            .localCheckpoint(true))
          // 3. PIT refresh for the batch's touched users only
          matrix = Some((matrix match {
            case None => PointInTime.trainingMatrix(labels, "user_id",
              "label_ts", groups(store))
            case Some(m) => PointInTime.refreshMatrix(m, labels,
              "user_id", "label_ts", groups(store),
              bSurv.select("user_id"))
          }).localCheckpoint(true))
        }
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()
    val all = (b1 ++ b2 ++ b3)
    // (a) dedup ≡ batch: survivors-at-ingest equal the global dedup
    val batchSurv = Dedup.nearDupDedup(
        all.toDF("doc_id", "user_id", "s_ts", "spend", "text"),
        "doc_id", "text", 0.9)
      .select("doc_id").as[Long].collect().toSet
    val streamSurv = survivorRows.get.select("doc_id").as[Long]
      .collect().toSet
    assert(streamSurv == batchSurv && streamSurv == Set(1L, 3L, 5L, 7L))
    // (b) sketch ≡ batch: the accumulated knots equal a one-shot build
    //     over the same survivor rows chunked by their original batch
    val chunks = Seq(b1, b2, b3).zipWithIndex.flatMap { case (c, i) =>
      c.filter(r => batchSurv(r._1)).map(r => (r._4, i.toLong)) }
    val batchKnots = Sketches.quantileSketchBuild(
        chunks.toDF("spend", "__b"), col("spend"), col("__b"), knots = 8)
      .collect().map(_.toString).sorted.toSeq
    val streamKnots = knots.get.collect().map(_.toString).sorted.toSeq
    assert(streamKnots == batchKnots)
    val pcts = Seq(25, 50, 75)
    val qs = Sketches.quantileSketchQuantiles(knots.get, pcts)
      .orderBy("q").collect().map(_.toString).toSeq
    val qb = Sketches.quantileSketchQuantiles(
        chunks.toDF("spend", "__b")
          .transform(d => Sketches.quantileSketchBuild(d, col("spend"),
            col("__b"), knots = 8)), pcts)
      .orderBy("q").collect().map(_.toString).toSeq
    assert(qs == qb)
    // (c) PIT ≡ batch: the incrementally-refreshed matrix equals the
    //     full recompute over the survivor store — including the late
    //     back-fill (user 3's minute-30 label sees the minute-15 spend)
    val fullM = PointInTime.trainingMatrix(labels, "user_id", "label_ts",
        groups(survivorRows.get))
      .orderBy("user_id", "label_ts")
      .select("user_id", "label_ts", "y", "spend")
      .collect().toSeq
    val gotM = matrix.get.orderBy("user_id", "label_ts")
      .select("user_id", "label_ts", "y", "spend").collect().toSeq
    assert(gotM == fullM)
    val byKey = gotM.map(r => (r.getLong(0),
      r.getTimestamp(1).getTime / 60000, Option(r.get(3)))).toSet
    assert(byKey.contains((1L, 30L, Some(12.0)))) // dup doc 4 never lands
    assert(byKey.contains((2L, 30L, Some(7.0))))  // dup doc 2 never lands
    assert(byKey.contains((3L, 30L, Some(3.0))))  // late back-fill seen
  }

  test("streaming online GD: foreachBatch mini-batch rounds reproduce " +
      "the sequential batch loop bit-for-bit") {
    import graft.ops.TokenModels
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq((1L, "good good", true), (2L, "bad bad", false),
      (3L, "good", true))
    val b2 = Seq((4L, "bad", false), (5L, "good good good", true),
      (6L, "bad bad bad", false))
    val mem = MemoryStream[(Long, String, Boolean)]
    val sdf = mem.toDF().toDF("doc_id", "text", "lab")
    var w = TokenModels.sgdInitWeights(spark, 4)
    // predict-then-train: each batch is SERVED under the weights that
    // existed before its own update — the honest online protocol (no
    // label leakage into the scores of the batch that carries them)
    val served = scala.collection.mutable.Map.empty[Long, Long]
    val q = sdf.writeStream.outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!b.isEmpty) {
          TokenModels.sgdScore(b, "doc_id", "text", w,
              buckets = 4, biasCount = 1)
            .collect().foreach(r =>
              served(r.getAs[Long]("doc_id")) = r.getAs[Long]("score_nano"))
          w = StreamingFeatures.sgdOnlineRound(b, w, "doc_id", "text",
            col("lab"), buckets = 4, etaShift = 2, biasCount = 1)
            .localCheckpoint(true)
        }
      }.start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    // batch 1 was served under ZERO weights (scores 0); batch 2 under
    // the post-batch-1 model — replay the same protocol directly
    assert(Seq(1L, 2L, 3L).forall(served(_) == 0L))
    val w1 = {
      val occ1 = TokenModels.sgdCounts(b1.toDF("doc_id", "text", "lab"),
        "doc_id", "text", col("lab"), 4, 1)
      TokenModels.sgdRound(occ1, TokenModels.sgdInitWeights(spark, 4), 2)
        .localCheckpoint(true)
    }
    val expect2 = TokenModels.sgdScore(b2.toDF("doc_id", "text", "lab"),
        "doc_id", "text", w1, buckets = 4, biasCount = 1)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_nano")).toMap
    assert(Seq(4L, 5L, 6L).forall(id => served(id) == expect2(id)))
    val streamed = w.orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDecimal(1).toBigInteger)).toSeq
    // the same two rounds driven directly over static batch frames
    var wb = TokenModels.sgdInitWeights(spark, 4)
    for (batch <- Seq(b1, b2)) {
      val occ = TokenModels.sgdCounts(batch.toDF("doc_id", "text", "lab"),
        "doc_id", "text", col("lab"), 4, 1)
      wb = TokenModels.sgdRound(occ, wb, 2).localCheckpoint(true)
    }
    val direct = wb.orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getDecimal(1).toBigInteger)).toSeq
    assert(streamed == direct)
    // the model actually moved off zero
    assert(streamed.exists(_._2.signum != 0))
  }
}
