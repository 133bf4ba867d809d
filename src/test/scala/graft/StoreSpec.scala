package graft

import graft.model.{FeatureConfig, FeatureMetadata}
import graft.store.{FeatureStore, TtlCache}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshStore() = {
    val dir = Files.createTempDirectory("graft-store").toString
    var i = 0
    new FeatureStore(spark, dir, clock = () => { i += 1; f"2024-01-01T00:00:$i%02dZ" })
  }

  private def feats(rows: (Long, Double)*) =
    rows.toSeq.toDF("user_id", "total_amount")

  private val meta = FeatureMetadata("", "test features", "",
    Seq(FeatureConfig("user_id", "int64"), FeatureConfig("total_amount", "float64")),
    lineage = Map("source" -> "unit-test"), tags = Seq("test"))

  test("register → get → serve round-trip") {
    val store = freshStore()
    val v = store.registerFeatures(feats(1L -> 10.0, 2L -> 20.0), meta)
    assert(v.nonEmpty)

    val got = store.getFeatures(Some(v), useCache = false)
    assert(got.count() == 2)
    assert(got.columns.contains("feature_version"))

    val served = store.serveFeatures(2L, Some(v))
    assert(served.isDefined)
    assert(served.get("total_amount") == 20.0)
    assert(!served.get.contains("feature_version"))
    assert(store.serveFeatures(99L, Some(v)).isEmpty)
  }

  test("fingerprint is content-based: same data → same version, independent of partitioning") {
    val store = freshStore()
    val df = feats(1L -> 1.0, 2L -> 2.0, 3L -> 3.0)
    val v1 = FeatureStore.fingerprint(df.repartition(1))
    val v2 = FeatureStore.fingerprint(df.repartition(7))
    val v3 = FeatureStore.fingerprint(feats(1L -> 1.0, 2L -> 2.0, 3L -> 99.0))
    assert(v1 == v2)
    assert(v1 != v3)
    assert(store.registerFeatures(df, meta) == v1)
  }

  test("latest-version resolution and list ordering") {
    val store = freshStore()
    val vOld = store.registerFeatures(feats(1L -> 1.0), meta)
    val vNew = store.registerFeatures(feats(1L -> 2.0), meta)
    assert(store.listFeatureVersions().map(_.featureVersion) == Seq(vNew, vOld))
    assert(store.getFeatures().select("feature_version").head().getString(0) == vNew)
  }

  test("metadata round-trips configs, metrics, lineage and tags") {
    val store = freshStore()
    val v = store.registerFeatures(feats(1L -> 1.0, 1L -> 1.0), meta)
    val m = store.getFeatureMetadata(v).get
    assert(m.description == "test features")
    assert(m.features.map(_.name) == Seq("user_id", "total_amount"))
    assert(m.lineage("source") == "unit-test")
    assert(m.tags == Seq("test"))
    assert(m.dataQualityMetrics.get.duplicatePercentage == 0.5)
    assert(store.getFeatureMetadata("nope").isEmpty)
  }

  test("cleanup keeps exactly the newest N versions") {
    val store = freshStore()
    val vs = (1 to 5).map(i => store.registerFeatures(feats(1L -> i.toDouble), meta))
    val deleted = store.cleanupOldVersions(keepN = 2)
    assert(deleted.toSet == vs.take(3).toSet)
    assert(store.listFeatureVersions().map(_.featureVersion) == vs.drop(3).reverse)
    // deleted partitions are gone from the feature table too
    assert(store.getFeatures(Some(vs.last)).count() == 1)
    assert(store.getFeatures(Some(vs.head)).count() == 0)
  }

  test("low-quality registration raises a monitor alert") {
    val store = freshStore()
    // all-duplicate rows → dup% = 2/3 → score ≈ 0.33 < 0.8
    store.registerFeatures(feats(1L -> 1.0, 1L -> 1.0, 1L -> 1.0), meta)
    val dash = store.monitoringDashboard
    assert(dash("total_creations") == 1L)
    assert(dash("alerts").asInstanceOf[List[String]].nonEmpty)
  }

  test("TTL cache: hit before expiry, miss after") {
    var now = 0L
    val c = new TtlCache[String, Int](ttlSeconds = 10, clock = () => now)
    c.put("k", 42)
    assert(c.get("k").contains(42))
    now = 9999L
    assert(c.get("k").contains(42))
    now = 10001L
    assert(c.get("k").isEmpty)
    assert(c.hits == 2 && c.misses == 1)
  }

  test("get_features caching is observable via dashboard counters") {
    val store = freshStore()
    val v = store.registerFeatures(feats(1L -> 1.0), meta)
    store.getFeatures(Some(v)) // cache was pre-filled at register
    val hits = store.monitoringDashboard("cache_hits").asInstanceOf[Long]
    assert(hits >= 1L)
  }

  test("store runs against a swapped-in CacheBackend (pluggable seam)") {
    import graft.store.CacheBackend
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    // plain-map backend: no TTL, counts traffic — stands in for an
    // external cache adapter (the reference's "Redis, Memcached, etc.")
    class MapBackend extends CacheBackend[String, (StructType, Array[Row])] {
      val m = scala.collection.mutable.Map[String, (StructType, Array[Row])]()
      var h = 0L; var ms = 0L; var cleared = 0
      def get(key: String) = m.get(key) match {
        case some @ Some(_) => h += 1; some
        case None => ms += 1; None
      }
      def put(key: String, value: (StructType, Array[Row])): Unit = m(key) = value
      def delete(key: String): Unit = m.remove(key)
      def clear(): Unit = { cleared += 1; m.clear() }
      def hits: Long = h
      def misses: Long = ms
    }
    val backend = new MapBackend
    val dir = Files.createTempDirectory("graft-store").toString
    val store = new FeatureStore(spark, dir, cacheBackend = Some(backend))
    val v = store.registerFeatures(feats(1L -> 1.0, 2L -> 2.0), meta)
    assert(backend.m.nonEmpty) // register pre-fills through the trait
    assert(store.getFeatures(Some(v)).count() == 2) // served via backend
    assert(backend.hits >= 1L)
    assert(store.monitoringDashboard("cache_hits") == backend.hits)
    store.cleanupOldVersions(keepN = 0)
    assert(backend.cleared == 1 && backend.m.isEmpty) // invalidation routed
  }

  test("size-gated cache: an over-cap version serves correctly with zero " +
      "driver collect; under-cap slices still collect through the backend") {
    import graft.store.CacheBackend
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    // collect-counting backend: every put IS a driver collect of a slice,
    // so puts == 0 proves the over-cap path never collected
    class CountingBackend extends CacheBackend[String, (StructType, Array[Row])] {
      val m = scala.collection.mutable.Map[String, (StructType, Array[Row])]()
      var h = 0L; var ms = 0L; var puts = 0
      def get(key: String) = m.get(key) match {
        case some @ Some(_) => h += 1; some
        case None => ms += 1; None
      }
      def put(key: String, value: (StructType, Array[Row])): Unit = {
        puts += 1; m(key) = value
      }
      def delete(key: String): Unit = m.remove(key)
      def clear(): Unit = m.clear()
      def hits: Long = h
      def misses: Long = ms
    }
    val backend = new CountingBackend
    val dir = Files.createTempDirectory("graft-store").toString
    val store = new FeatureStore(spark, dir, cacheBackend = Some(backend),
      cacheMaxRows = 4)
    val v = store.registerFeatures(
      feats((1 to 10).map(i => i.toLong -> i.toDouble): _*), meta)
    assert(backend.puts == 0) // 10 rows > cap 4: never collected
    val got = store.getFeatures(Some(v)) // serves from the persist cache
    assert(got.count() == 10)
    assert(got.storageLevel.useMemory || got.storageLevel.useDisk)
    assert(store.monitoringDashboard("persist_cache_hits")
      .asInstanceOf[Long] >= 1L)
    // an under-cap slice (single-user serve) still collects via the seam
    assert(store.serveFeatures(3L, Some(v)).get("total_amount") == 3.0)
    assert(backend.puts == 1)
    // invalidation unpersists the over-cap entry (onEvict routed)
    store.cleanupOldVersions(keepN = 0)
    assert(got.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
  }

  test("online/offline consistency: serveFeatures agrees with the " +
      "point-in-time training matrix over the store's AS-OF resolution, " +
      "for every sampled key — including a key absent from the served " +
      "version") {
    import graft.ops.PointInTime
    import org.apache.spark.sql.functions.{col, lit}
    val store = freshStore()
    val v1 = store.registerFeatures(
      feats(1L -> 10.0, 2L -> 20.0, 3L -> 30.0), meta)
    store.registerFeatures(feats(1L -> 11.0, 2L -> 21.0), meta)
    val created = store.listFeatureVersions()
      .map(m => m.featureVersion -> m.createdAt).toMap
    // the OFFLINE side: the as-of fold over the store's AS-OF-resolved
    // version (version-ATOMIC serving — row-level as-of over raw version
    // history would resurrect user 3's v1 row after v2 dropped the user)
    def matrixAt(ts: String): Map[Long, Option[Any]] = {
      val grp = store.getFeaturesAsOf(ts, useCache = false)
        .select(col("user_id"), col("created_at").as("f_ts"),
          col("total_amount").as("pit_amount"))
      val labels = Seq(1L, 2L, 3L).toDF("user_id")
        .withColumn("ts", lit(ts))
      PointInTime.trainingMatrix(labels, "user_id", "ts",
          Seq(PointInTime.FeatureGroup(grp, "user_id", "f_ts",
            Seq("pit_amount"))))
        .collect()
        .map(r => r.getAs[Long]("user_id") ->
          Option(r.getAs[Any]("pit_amount"))).toMap
    }
    // ONLINE at now (latest version): user 3 must be absent on BOTH sides
    val mNow = matrixAt("2024-01-01T00:00:59Z")
    Seq(1L, 2L, 3L).foreach { u =>
      val served = store.serveFeatures(u).map(_("total_amount"))
      assert(mNow(u) == served, s"user $u: matrix ${mNow(u)} vs $served")
    }
    assert(mNow(3L).isEmpty)
    // at v1's instant both sides read the v1 values (incl. user 3 = 30.0)
    val t1 = created(v1)
    val m1 = matrixAt(t1)
    Seq(1L, 2L, 3L).foreach { u =>
      val served = store.serveFeatures(u, store.versionAsOf(t1))
        .map(_("total_amount"))
      assert(m1(u) == served, s"user $u @v1: matrix ${m1(u)} vs $served")
    }
    assert(m1(3L).contains(30.0))
  }

  test("AS OF time travel: resolution picks the newest version at or " +
      "before the instant; reads serve that version's rows") {
    val store = freshStore() // clock stamps :01, :02, :03 …
    val v1 = store.registerFeatures(feats(1L -> 10.0), meta)
    val v2 = store.registerFeatures(feats(1L -> 20.0), meta)
    val created = store.listFeatureVersions()
      .map(m => m.featureVersion -> m.createdAt).toMap
    // before any version existed
    assert(store.versionAsOf("2023-12-31T23:59:59Z").isEmpty)
    intercept[NoSuchElementException] {
      store.getFeaturesAsOf("2023-12-31T23:59:59Z")
    }
    // exactly at v1's stamp → v1; between the stamps → still v1
    assert(store.versionAsOf(created(v1)).contains(v1))
    assert(store.versionAsOf(created(v1) + ".500").contains(v1))
    // at/after v2 → v2, far future → v2
    assert(store.versionAsOf(created(v2)).contains(v2))
    assert(store.versionAsOf("2030-01-01T00:00:00Z").contains(v2))
    val asOf = store.getFeaturesAsOf(created(v1), useCache = false)
      .select("user_id", "total_amount").collect()(0)
    assert(asOf.getAs[Double]("total_amount") == 10.0)
  }

  test("per-batch sketch persistence: merged knots answer the same " +
      "quantiles as a direct multi-batch build; rewrite is idempotent") {
    import graft.ops.Sketches
    import org.apache.spark.sql.functions.{col, lit}
    val store = freshStore()
    val b1 = feats((1L to 40L).map(i => i -> i.toDouble): _*)
    val b2 = feats((1L to 40L).map(i => i -> (i + 100).toDouble): _*)
    val v1 = store.registerFeatures(b1, meta)
    store.writeBatchSketches(b1, v1, Seq("total_amount"), knots = 8)
    val v2 = store.registerFeatures(b2, meta)
    store.writeBatchSketches(b2, v2, Seq("total_amount"), knots = 8)
    val pcts = Seq(25, 50, 75, 90)
    val fromStore = store.sketchQuantiles(pcts)
      .orderBy("column", "q").collect()
      .map(r => (r.getAs[String]("column"), r.getAs[Long]("q"),
        r.getAs[Long]("n_total"), r.getAs[java.math.BigDecimal]("est_value")))
    // direct build over the concatenation with the SAME batch keys —
    // merge really is relation union
    val all = b1.withColumn("__b", lit(0L))
      .unionByName(b2.withColumn("__b", lit(1L)))
    val direct = Sketches.quantileSketchQuantiles(
        Sketches.quantileSketchBuild(all, col("total_amount"), col("__b"), 8),
        pcts)
      .orderBy("q").collect()
      .map(r => ("total_amount", r.getAs[Long]("q"),
        r.getAs[Long]("n_total"), r.getAs[java.math.BigDecimal]("est_value")))
    assert(fromStore.toSeq == direct.toSeq)
    assert(fromStore.forall(_._3 == 80L))
    // rewriting one version's sketch only touches its partition and
    // reuses its batch id — the merged answers are unchanged
    store.writeBatchSketches(b2, v2, Seq("total_amount"), knots = 8)
    val again = store.sketchQuantiles(pcts)
      .orderBy("column", "q").collect()
      .map(r => (r.getAs[String]("column"), r.getAs[Long]("q"),
        r.getAs[Long]("n_total"), r.getAs[java.math.BigDecimal]("est_value")))
    assert(again.toSeq == fromStore.toSeq)
    // unsketched store fails loudly, not silently empty
    intercept[IllegalArgumentException] {
      freshStore().sketchQuantiles(Seq(50))
    }
    // drift-on-ingest: PSI of a shifted batch against history, baseline
    // side answered purely from the persisted knots — masses sum to the
    // full 80-row history, identical batch reads PSI ≈ 0
    val drift = store.sketchDrift(
      feats((1L to 40L).map(i => i -> (i + 300).toDouble): _*),
      "total_amount", buckets = 10).collect()
    assert(drift.map(_.getAs[Long]("n_base")).sum == 80L)
    assert(drift.map(_.getAs[Double]("contribution")).sum > 1.0) // shifted
    val same = store.sketchDrift(b1.unionByName(b2), "total_amount",
      buckets = 10).collect()
    assert(math.abs(same.map(_.getAs[Double]("contribution")).sum) < 0.05)
  }

  test("eraseUser: the user vanishes from every version, other rows and " +
      "version ids survive, a fully-erased version's partition is " +
      "removed, cached slices are dropped") {
    val store = freshStore()
    val v1 = store.registerFeatures(
      feats(1L -> 10.0, 2L -> 20.0, 3L -> 30.0), meta)
    val v2 = store.registerFeatures(feats(1L -> 11.0, 2L -> 21.0), meta)
    val vOnly = store.registerFeatures(feats(2L -> 99.0), meta)
    // user 2 is in a cached slice before erasure
    assert(store.serveFeatures(2L, Some(v1)).isDefined)
    val audit = store.eraseUser(2L)
    assert(audit.toMap == Map(v1 -> 1L, v2 -> 1L, vOnly -> 1L))
    // gone everywhere, including the cache-backed serve path
    Seq(v1, v2, vOnly).foreach { v =>
      assert(store.serveFeatures(2L, Some(v)).isEmpty, v)
    }
    // collateral rows intact, version identifiers unchanged
    assert(store.getFeatures(Some(v1), useCache = false)
      .select("user_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
    assert(store.getFeatures(Some(v2), useCache = false).count() == 1)
    // the version that held ONLY user 2 is now an empty read, not stale
    assert(store.getFeatures(Some(vOnly), useCache = false).count() == 0)
    // metadata/lineage untouched — still three registered versions
    assert(store.listFeatureVersions().size == 3)
    // erasing an absent user is a no-op with an empty audit
    assert(store.eraseUser(777L).isEmpty)
  }

  test("optimistic concurrency: racing writers on one store path never " +
      "lose a commit — every version lands in metadata AND on disk") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = Files.createTempDirectory("graft-store-cas").toString
    // two INDEPENDENT store instances on the same path (two writers),
    // eight registrations interleaved across them — each CAS loser must
    // re-read the winner's manifest and re-apply
    def mkStore(off: Int) = {
      var i = 0
      new FeatureStore(spark, dir,
        clock = () => { i += 1; f"2024-01-01T0$off:00:$i%02dZ" })
    }
    val stores = Seq(mkStore(0), mkStore(1))
    val futures = (0 until 8).map { k =>
      Future(stores(k % 2)
        .registerFeatures(feats(k.toLong -> (k * 10.0 + 1)), meta))
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    assert(versions.distinct.size == 8)
    val listed = stores.head.listFeatureVersions().map(_.featureVersion)
    assert(listed.toSet == versions.toSet,
      s"lost commits: ${versions.toSet -- listed.toSet}")
    // every partition readable with its rows intact
    versions.zipWithIndex.foreach { case (v, k) =>
      val got = stores(1).getFeatures(Some(v), useCache = false)
      assert(got.count() == 1, s"version $v")
    }
    // composes with cleanup: keep 3, the doomed 5 vanish from disk and
    // manifest, survivors stay readable
    val doomed = stores.head.cleanupOldVersions(keepN = 3)
    assert(doomed.size == 5)
    val after = stores(1).listFeatureVersions().map(_.featureVersion)
    assert(after.size == 3 && after.forall(versions.contains))
    after.foreach(v => assert(
      stores.head.getFeatures(Some(v), useCache = false).count() == 1))
    // composes with erasure: erase one surviving user, others untouched
    val sample = after.head
    val uid = stores.head.getFeatures(Some(sample), useCache = false)
      .select("user_id").head().getLong(0)
    val audit = stores.head.eraseUser(uid)
    assert(audit.map(_._1).contains(sample))
    assert(stores(1).listFeatureVersions().size == 3)
  }
}
