package graft

import graft.quality.DataQualityValidator
import graft.store.FeatureStore
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY.md §5.4): invariants that must hold for ANY
  * input, not just fixtures — quality score bounds, permutation invariance
  * of the duplicate ratio, partition invariance of the relation
  * fingerprint, and retention arithmetic. Generators are ScalaCheck `Gen`s
  * sampled over fixed seeds (the scalatest↔scalacheck bridge artifact is
  * not in the offline cache, so sampling is driven directly).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Double)]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(1L, 5L), Gen.choose(-100.0, 100.0))))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("quality score is always within [0, 1]") {
    samples(rowsGen, 20).foreach { rows =>
      val m = new DataQualityValidator().validate(rows.toDF("user_id", "value"))
      assert(m.overallScore >= 0.0 && m.overallScore <= 1.0, rows)
      assert(m.nullPercentage >= 0.0 && m.duplicatePercentage >= 0.0 &&
        m.outlierPercentage >= 0.0, rows)
    }
  }

  test("duplicate ratio is invariant under row permutation") {
    samples(rowsGen, 10).foreach { rows =>
      val a = new DataQualityValidator()
        .validate(rows.toDF("user_id", "value")).duplicatePercentage
      val shuffled = new scala.util.Random(1).shuffle(rows)
      val b = new DataQualityValidator()
        .validate(shuffled.toDF("user_id", "value")).duplicatePercentage
      assert(a == b, rows)
    }
  }

  test("relation fingerprint is invariant under partitioning and row order") {
    samples(rowsGen, 10).foreach { rows =>
      val df = rows.toDF("user_id", "value")
      val f1 = FeatureStore.fingerprint(df.repartition(1))
      val f7 = FeatureStore.fingerprint(
        df.repartition(7, col("user_id")).sortWithinPartitions("value"))
      assert(f1 == f7, rows)
    }
  }

  test("fingerprint distinguishes different relations") {
    val base = Seq((1L, 2.0), (2L, 3.0)).toDF("user_id", "value")
    val changed = Seq((1L, 2.0), (2L, 3.01)).toDF("user_id", "value")
    assert(FeatureStore.fingerprint(base) != FeatureStore.fingerprint(changed))
  }

  test("jaccardPairs equals brute force on random corpora (prefix filter is lossless)") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docsGen: Gen[List[(Long, String)]] =
      Gen.listOfN(25, Gen.choose(0, 8).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)))).map(_.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) })
    for (threshold <- Seq(0.5, 0.8); rows <- samples(docsGen, 5)) {
      val expected = (for {
        (ia, ta) <- rows; (ib, tb) <- rows if ia < ib
        sa = ta.split(" ").filter(_.nonEmpty).toSet
        sb = tb.split(" ").filter(_.nonEmpty).toSet
        union = (sa ++ sb).size if union > 0
        j = (sa & sb).size.toDouble / union if j >= threshold
      } yield (ia, ib) -> j).toMap
      val got = graft.ops.Dedup.jaccardPairs(rows.toDF("doc_id", "text"),
          "doc_id", "text", threshold)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("jaccard")).toMap
      assert(got.keySet == expected.keySet,
        s"t=$threshold missing=${expected.keySet -- got.keySet} " +
          s"extra=${got.keySet -- expected.keySet}")
      got.foreach { case (k, j) => assert(math.abs(j - expected(k)) < 1e-12) }
    }
  }

  test("verified LSH pairs are a subset of exact Jaccard pairs with equal values") {
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docsGen: Gen[List[(Long, String)]] =
      Gen.listOfN(25, Gen.choose(1, 6).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)))).map(_.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) })
    samples(docsGen, 4).foreach { rows =>
      val df = rows.toDF("doc_id", "text")
      val exact = graft.ops.Dedup.jaccardPairs(df, "doc_id", "text", 0.8)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("jaccard")).toMap
      val lsh = graft.ops.Dedup.minhashLshPairs(df, "doc_id", "text", 0.8)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Double]("jaccard")).toMap
      assert(lsh.keySet.subsetOf(exact.keySet),
        s"false positives: ${lsh.keySet -- exact.keySet}")
      lsh.foreach { case (k, j) => assert(j == exact(k)) }
      // J = 1.0 pairs collide on every band — never missed
      val ones = exact.filter(_._2 == 1.0).keySet
      assert(ones.subsetOf(lsh.keySet), s"missed exact dups: ${ones -- lsh.keySet}")
    }
  }

  test("simhashPairs equals brute-force hamming filter (block trick is lossless)") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h", "i", "j")
    val docsGen: Gen[List[(Long, String)]] =
      Gen.listOfN(30, Gen.choose(1, 10).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf(vocab)))).map(_.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) })
    samples(docsGen, 4).foreach { rows =>
      val df = rows.toDF("doc_id", "text")
      val hashes = graft.ops.Dedup.simhash(df, "doc_id", "text")
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("simhash"))
      val expected = (for {
        (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
      } yield (ia, ib) -> d.toLong).toMap
      val got = graft.ops.Dedup.simhashPairs(df, "doc_id", "text", 3)
        .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
          r.getAs[Long]("hamming")).toMap
      assert(got == expected,
        s"missing=${expected.keySet -- got.keySet} extra=${got.keySet -- expected.keySet}")
    }
  }

  test("as-of join equals a plain Scala reference on random data") {
    val rowsGen = Gen.zip(
      Gen.listOfN(60, Gen.zip(Gen.choose(1L, 6L), Gen.choose(0L, 50L))),
      Gen.listOfN(40, Gen.zip(Gen.choose(1L, 8L), Gen.choose(0L, 50L))))
    samples(rowsGen, 4).foreach { case (lRaw, rRaw) =>
      val l = lRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      // right unique per (k, t): keep max tag
      val r = rRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
        .groupBy(x => (x._1, x._2)).values.map(_.maxBy(_._3)).toList
      val expected = l.map { case (k, t, tag) =>
        val m = r.filter(x => x._1 == k && x._2 <= t)
        (k, t, tag) -> (if (m.isEmpty) null
          else Long.box(m.maxBy(x => (x._2, x._3))._3))
      }.toMap
      val got = graft.ops.AsofJoin.asofBackward(
          l.toDF("k", "t", "tag"), r.toDF("k", "rt", "rtag"),
          Seq("k"), "t", "rt", Seq("rtag"))
        .collect().map(row => (row.getAs[Long]("k"), row.getAs[Long]("t"),
          row.getAs[Long]("tag")) -> row.getAs[Any]("rtag")).toMap
      assert(got == expected)
    }
  }

  test("cleanup keeps exactly min(keepN, versions)") {
    for (keepN <- 0 to 3; nVersions <- 1 to 3) {
      val dir = java.nio.file.Files.createTempDirectory("graft-prop").toString
      var tick = 0
      val store = new FeatureStore(spark, dir,
        clock = () => { tick += 1; f"2026-01-01T00:00:$tick%02dZ" })
      (1 to nVersions).foreach { i =>
        store.registerFeatures(
          Seq((i.toLong, i * 1.0)).toDF("user_id", "value"),
          graft.model.FeatureMetadata("", s"v$i", "", Nil))
      }
      val deleted = store.cleanupOldVersions(keepN)
      assert(store.listFeatureVersions().size == math.min(keepN, nVersions),
        s"keepN=$keepN n=$nVersions")
      assert(deleted.size == math.max(0, nVersions - keepN))
    }
  }

  test("count-min estimates dominate exact counts on random streams; " +
      "bloom filters never produce a false negative") {
    import graft.ops.Sketches
    val streamGen: Gen[List[String]] = Gen.choose(20, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 25).map(i => s"v$i")))
    samples(streamGen, 8).foreach { vals =>
      val df = vals.toDF("u")
      val exact = vals.groupBy(identity).map { case (k, g) =>
        k -> g.size.toLong }
      val sk = Sketches.countMinBuild(df, col("u"), 16, 3)
      val est = Sketches.countMinEstimate(sk, df, col("u"), 16, 3)
        .as[(String, Long)].collect().toMap
      exact.foreach { case (v, n) =>
        assert(est(v) >= n, s"count-min underestimated $v: ${est(v)} < $n")
      }
      val bloom = Sketches.bloomBuild(df, col("u"), 128, 3)
      val present = Sketches.bloomContains(bloom, df, col("u"), 128, 3)
        .as[(String, Long, Boolean)].collect()
      assert(present.forall(_._3), "bloom false negative")
    }
  }
}
