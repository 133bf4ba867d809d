package graft

import graft.ops.Sketches
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Zipf-ish skewed term stream: term i appears ~n/(i+1) times, shuffled
    * deterministically across the partition layout.
    */
  private def zipfTerms(nTerms: Int, scale: Int): Seq[String] =
    (0 until nTerms).flatMap(i => Seq.fill(scale / (i + 1))(s"t$i"))
      .sortBy(_.hashCode) // interleave so no partition sees one term only

  test("MG candidates are a superset of true heavy hitters on skewed data") {
    for (k <- Seq(5, 10, 50); parts <- Seq(1, 7)) {
      val data = zipfTerms(200, 5000)
      val ds = spark.createDataset(data).repartition(parts)
      val n = data.size
      val truth = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.keySet.toSet
      val cands = Sketches.misraGriesCandidates(ds, k)
        .as[String].collect().toSet
      assert(truth.subsetOf(cands), s"k=$k parts=$parts missing=${truth -- cands}")
      assert(cands.size <= (k - 1) * parts,
        s"k=$k parts=$parts state ${cands.size} > bound ${(k - 1) * parts}")
    }
  }

  test("heavyHitters equals the brute-force exact result") {
    val data = zipfTerms(100, 2000)
    val ds = spark.createDataset(data).repartition(5)
    val n = data.size
    for (k <- Seq(8, 25)) {
      val truth = data.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      val got = Sketches.heavyHitters(ds, k)
        .as[(String, Long, Long)].collect()
      assert(got.map(_._3).distinct.toSeq == Seq(n.toLong))
      assert(got.map(t => t._1 -> t._2).toMap == truth, s"k=$k")
    }
  }

  test("HLL daily sketches: mergeable, order-independent, near-exact") {
    // 40 days, user i active on day d iff (i + d) % 3 == 0 — known truth
    val rows = for { d <- 0 until 40; u <- 0 until 300; if (u + d) % 3 == 0 }
      yield (u.toLong, d * 86400000000L + (u % 7) * 1000L)
    val df = rows.toDF("user_id", "ts_us")
    val daily = graft.ops.Sketches.hllDailySketches(df, "user_id", "ts_us")
    // sketches are persistable binary state
    assert(daily.schema("sketch").dataType ==
      org.apache.spark.sql.types.BinaryType)

    val approx = graft.ops.Sketches.hllRollingDistinct(daily, windowDays = 7)
      .as[(Long, Long)].collect().toMap
    val exact = graft.ops.EventOps
      .rollingActiveKeys(df, "user_id", "ts_us", windowDays = 7)
      .as[(Long, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (day, n) =>
      val est = approx(day)
      assert(math.abs(est - n) <= math.max(2L, (n * 0.1).toLong),
        s"day $day: est $est vs exact $n")
    }
    // partitioning cannot move the estimate: HLL registers are max-based
    val daily2 = graft.ops.Sketches
      .hllDailySketches(df.repartition(13), "user_id", "ts_us")
    val approx2 = graft.ops.Sketches.hllRollingDistinct(daily2, 7)
      .as[(Long, Long)].collect().toMap
    assert(approx2 == approx)
  }

  test("degenerate streams: empty input and single-term input") {
    val empty = spark.emptyDataset[String]
    assert(Sketches.heavyHitters(empty, 10).collect().isEmpty)
    val single = spark.createDataset(Seq.fill(100)("only")).repartition(3)
    val got = Sketches.heavyHitters(single, 10)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("only", 100L, 100L)))
  }

  test("countMin: estimates are one-sided (est ≥ exact), exact when the " +
      "sketch is wide, and invariant to partitioning") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    // 500 rows over 40 values, zipf-ish: value v appears 1 + (v % 13)·3
    val rows = (0 until 40).flatMap(v =>
      Seq.fill(1 + (v % 13) * 3)(s"u$v"))
    val df = rows.toDF("u")
    val exact = rows.groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    // narrow sketch: collisions certain → est ≥ exact everywhere
    val narrow = Sketches.countMinBuild(df, col("u"), 8, 3)
    val estN = Sketches.countMinEstimate(narrow, df, col("u"), 8, 3)
      .as[(String, Long)].collect().toMap
    assert(estN.keySet == exact.keySet)
    exact.foreach { case (v, n) => assert(estN(v) >= n, s"$v: ${estN(v)} < $n") }
    assert(exact.exists { case (v, n) => estN(v) > n }) // collisions real
    // wide sketch: 4096 buckets ≫ 40 values → almost surely exact; and
    // the (seed,bucket) aggregation makes the sketch partition-invariant
    val wide = Sketches.countMinBuild(df.repartition(17), col("u"), 4096, 3)
    val estW = Sketches.countMinEstimate(wide, df, col("u"), 4096, 3)
      .as[(String, Long)].collect().toMap
    assert(estW == exact)
  }

  test("countMin: sketches merge by cell-wise addition") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val a = Seq.fill(30)("x").concat(Seq.fill(10)("y")).toDF("u")
    val b = Seq.fill(5)("x").concat(Seq.fill(20)("z")).toDF("u")
    val merged = Sketches.countMinBuild(a, col("u"), 16, 2)
      .unionByName(Sketches.countMinBuild(b, col("u"), 16, 2))
      .groupBy("seed", "bucket").agg(sum("cnt").as("cnt"))
    val whole = Sketches.countMinBuild(a.unionByName(b), col("u"), 16, 2)
    val m = merged.as[(Int, Long, Long)].collect().toSet
    assert(m == whole.as[(Int, Long, Long)].collect().toSet)
    // probes against the merged sketch see the combined stream
    val est = Sketches.countMinEstimate(merged,
        Seq("x", "y", "z").toDF("u"), col("u"), 16, 2)
      .as[(String, Long)].collect().toMap
    assert(est("x") >= 35 && est("y") >= 10 && est("z") >= 20)
  }

  // deterministic skewed 2-dp values across `batches` batches: value
  // depends on a hash-ish mix so batches overlap but differ
  private def qsFixture(n: Int, batches: Int): Seq[(Long, BigDecimal)] =
    (0 until n).map { i =>
      val b = i % batches
      val raw = ((i * 2654435761L + b * 97) % 1000 + (i % 7) * 250) % 1500
      (b.toLong, BigDecimal(raw) / 100)
    }

  test("quantile sketch: per-batch undercount stays within the n/K bound " +
      "and quantile answers carry the eps=1/K guarantee") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val rows = qsFixture(4000, 5)
    val df = rows.toDF("batch", "value").repartition(7)
    val n = rows.size
    for (k <- Seq(8, 32)) {
      val sketch = Sketches.quantileSketchBuild(df, col("value"),
        col("batch"), k)
      // ≤ k knots per batch
      val perBatch = sketch.groupBy("batch").count()
        .as[(Long, Long)].collect()
      perBatch.foreach { case (b, c) =>
        assert(c <= k, s"batch $b has $c knots > K=$k") }
      // est_rank is an undercount within N/K of the true rank everywhere
      val trueRank = rows.map(_._2).sorted.zipWithIndex
        .groupBy(_._1).view.mapValues(_.map(_._2).max + 1L).toMap
      val est = Sketches.quantileSketchRanks(sketch)
        .as[(BigDecimal, Long)].collect()
      est.foreach { case (v, e) =>
        val t = trueRank(v)
        assert(e <= t, s"K=$k v=$v est $e overcounts true $t")
        assert((t - e) * k < n, s"K=$k v=$v err ${t - e} breaks N/K bound")
      }
      // quantile guarantee: rank(ans) >= target, rank_below < target + N/K
      val ans = Sketches.quantileSketchQuantiles(sketch, Seq(1, 10, 50, 90, 99))
        .as[(Long, Long, Long, BigDecimal)].collect()
      assert(ans.length == 5)
      ans.foreach { case (q, nt, target, v) =>
        assert(nt == n)
        assert(target == (q * n + 99) / 100)
        val rank = rows.count(_._2 <= v)
        val below = rows.count(_._2 < v)
        assert(rank >= target, s"K=$k q=$q rank $rank < target $target")
        assert((below - target) * k < n,
          s"K=$k q=$q below-rank $below breaks target+N/K")
      }
    }
  }

  test("quantile sketch: exact when K covers the per-batch grid; merge is " +
      "relation union; partitioning cannot move a knot") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val rows = qsFixture(1500, 3)
    val df = rows.toDF("batch", "value")
    // K >= per-batch row count → every c-step crosses a multiple of
    // n_b/K ≤ 1 → every grid row is a knot → ranks exact
    val maxRows = rows.groupBy(_._1).values.map(_.size).max
    val wide = Sketches.quantileSketchBuild(df, col("value"), col("batch"),
      maxRows)
    val trueRank = rows.map(_._2).sorted.zipWithIndex
      .groupBy(_._1).view.mapValues(_.map(_._2).max + 1L).toMap
    Sketches.quantileSketchRanks(wide).as[(BigDecimal, Long)].collect()
      .foreach { case (v, e) => assert(e == trueRank(v), s"v=$v") }
    // merge law: the sketch of the whole history IS the union of the
    // per-batch sketches — build per slice, union, compare row sets
    val k = 16
    val whole = Sketches.quantileSketchBuild(df, col("value"), col("batch"), k)
    val merged = (0L until 3L).map { b =>
      Sketches.quantileSketchBuild(df.filter(col("batch") === b),
        col("value"), col("batch"), k)
    }.reduce(_ unionByName _)
    assert(whole.as[(Long, BigDecimal, Long)].collect().toSet ==
      merged.as[(Long, BigDecimal, Long)].collect().toSet)
    // partition invariance: integer knot rule can't see the layout
    val re = Sketches.quantileSketchBuild(df.repartition(13), col("value"),
      col("batch"), k)
    assert(re.as[(Long, BigDecimal, Long)].collect().toSet ==
      whole.as[(Long, BigDecimal, Long)].collect().toSet)
  }

  test("bloom: no false negatives ever; false positives bounded; " +
      "filters merge by DISTINCT union (bitwise OR)") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions._
    val ins = (0 until 80).map(i => s"in$i").toDF("v")
    val absent = (0 until 200).map(i => s"out$i").toDF("v")
    val filt = Sketches.bloomBuild(ins, col("v"), 1024, 3)
    // every inserted value MUST read present
    val inRes = Sketches.bloomContains(filt, ins, col("v"), 1024, 3)
      .as[(String, Long, Boolean)].collect()
    assert(inRes.length == 80 && inRes.forall(_._3))
    // absent values: one-sided error, small at this fill (3*80/1024)
    val outRes = Sketches.bloomContains(filt, absent, col("v"), 1024, 3)
      .as[(String, Long, Boolean)].collect()
    val fp = outRes.count(_._3)
    assert(fp < 20, s"implausible FP count $fp/200 at ~21% fill")
    // merge = DISTINCT union of set-bit relations ≡ build on the union
    val ins2 = (80 until 160).map(i => s"in$i").toDF("v")
    val merged = filt.unionByName(
      Sketches.bloomBuild(ins2, col("v"), 1024, 3)).distinct()
    val whole = Sketches.bloomBuild(ins.unionByName(ins2), col("v"), 1024, 3)
    assert(merged.as[Long].collect().toSet ==
      whole.as[Long].collect().toSet)
  }
}
