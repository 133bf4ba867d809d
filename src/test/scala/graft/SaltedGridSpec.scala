package graft

import graft.ops.{Drift, Eval, Prep, SaltedGrid, Screening}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The salted-grid fallback ([[graft.ops.SaltedGrid]]): two-phase
  * bucket-offset cumulative sums must equal the single global window on a
  * CONTINUOUS-score fixture (row-scale grid — the exact case the global
  * window serializes on), and the rewritten KS-grid operators' plans must
  * carry no single-partition WindowExec over row-scale input.
  */
class SaltedGridSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** ~3000 distinct pseudo-continuous 2-dp values, deterministic, with a
    * dense cluster + heavy tail so percentile edges are non-trivial.
    */
  private def continuous(n: Int): Seq[BigDecimal] =
    (0 until n).map { i =>
      val mixed = (i * 2654435761L) % 100000
      val tail = if (i % 11 == 0) mixed * 37 else mixed
      BigDecimal(tail % 1000000) / 100
    }

  test("cumulative == global window on a continuous row-scale grid " +
      "(all bucket widths, with totals and next-value)") {
    val rows = continuous(3000)
    val grid = rows.map(v => (v, 1L + (v.toLong % 5), (v.toLong % 3)))
      .groupBy(_._1).map { case (v, g) =>
        (v, g.map(_._2).sum, g.map(_._3).sum) }.toSeq
      .toDF("v", "ca", "cb").repartition(7)
    val wCdf = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = grid
      .withColumn("ea", sum("ca").over(wCdf))
      .withColumn("eb", sum("cb").over(wCdf))
      .withColumn("en", coalesce(lead("v", 1).over(Window.orderBy("v")),
        lit(null)))
      .select("v", "ea", "eb", "en")
      .as[(BigDecimal, Long, Long, Option[BigDecimal])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val totA = grid.agg(sum("ca")).as[Long].head()
    val totB = grid.agg(sum("cb")).as[Long].head()
    for (buckets <- Seq(2, 8, 64)) {
      val got = SaltedGrid.cumulative(grid, "v", Seq("ca", "cb"),
          buckets = buckets, withNext = true)
        .select(col("v"), col("__cum_ca"), col("__cum_cb"),
          col("__tot_ca"), col("__tot_cb"), col("__next"))
        .as[(BigDecimal, Long, Long, Long, Long, Option[BigDecimal])]
        .collect()
      assert(got.length == expected.size, s"buckets=$buckets")
      got.foreach { case (v, ca, cb, ta, tb, nx) =>
        val (ea, eb, en) = expected(v)
        assert(ca == ea && cb == eb, s"buckets=$buckets v=$v cum mismatch")
        assert(ta == totA && tb == totB, s"buckets=$buckets v=$v totals")
        assert(nx == en, s"buckets=$buckets v=$v next mismatch")
      }
    }
  }

  test("degenerate grids: single row, fewer rows than buckets") {
    val one = Seq((BigDecimal(7.25), 3L)).toDF("v", "c")
    val g1 = SaltedGrid.cumulative(one, "v", Seq("c"), withNext = true)
      .select("__cum_c", "__tot_c", "__next")
      .as[(Long, Long, Option[BigDecimal])].collect()
    assert(g1.toSeq == Seq((3L, 3L, None)))
    val few = Seq((BigDecimal(1), 1L), (BigDecimal(2), 2L),
      (BigDecimal(3), 4L)).toDF("v", "c")
    val g3 = SaltedGrid.cumulative(few, "v", Seq("c"), buckets = 64)
      .select("v", "__cum_c", "__tot_c")
      .as[(BigDecimal, Long, Long)].collect().sortBy(_._1)
    assert(g3.map(_._2).toSeq == Seq(1L, 3L, 7L))
    assert(g3.map(_._3).distinct.toSeq == Seq(7L))
  }

  // ---- plan gates -----------------------------------------------------

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Every single-partition WindowExec in the executed plan must sit above
    * the bucket-grouped (≤`buckets`-row) offsets aggregate — i.e. no
    * row-scale relation ever serializes into one window task — and at
    * least one data-scale window partitioned by the bucket must exist.
    */
  private def assertNoRowScaleGlobalWindow(df: DataFrame,
      label: String, salt: String = "__gbkt"): Unit = {
    df.collect() // finalize AQE
    val all = flatten(df.queryExecution.executedPlan)
    val windows = all.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, s"$label: expected WindowExec nodes")
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    unpartitioned.foreach { w =>
      val bounded = flatten(w.child).exists {
        case agg: BaseAggregateExec =>
          agg.groupingExpressions.exists(_.toString.contains(salt))
        case _ => false
      }
      assert(bounded,
        s"$label: single-partition window over non-bucket-bounded input:\n$w")
    }
    assert(windows.exists(_.partitionSpec.exists(
        _.toString.contains(salt))),
      s"$label: no bucket-partitioned data-scale window found")
  }

  test("rewritten KS-grid operators: no single-partition window over " +
      "row-scale input (continuous-score fixture)") {
    val scored = continuous(2500).zipWithIndex
      .map { case (v, i) => (v, i % 3 == 0, if (i % 2 == 0) "a" else "b") }
      .toDF("score", "label", "grp")
    assertNoRowScaleGlobalWindow(
      Eval.aucRoc(scored, col("score"), col("label")), "aucRoc")
    assertNoRowScaleGlobalWindow(
      Prep.rankNormalize(scored, "score"), "rankNormalize")
    assertNoRowScaleGlobalWindow(
      Prep.quantileMatch(scored, "score", "grp", "a", "b"), "quantileMatch")
    assertNoRowScaleGlobalWindow(
      Drift.wasserstein1(scored, "score", "grp", "a", "b"), "wasserstein1")
    assertNoRowScaleGlobalWindow(
      Screening.ksTwoSample(scored, "score", "grp", "a", "b"), "ksTwoSample")
  }

  test("rewritten operators agree with the direct global-window formulas " +
      "on the continuous fixture") {
    val scored = continuous(2000).zipWithIndex
      .map { case (v, i) => (v, i % 3 == 0, if (i % 2 == 0) "a" else "b") }
      .toDF("score", "label", "grp")
    // KS: brute-force over collected rows
    val rows = scored.as[(BigDecimal, Boolean, String)].collect()
    val va = rows.filter(_._3 == "a").map(_._1).sorted
    val vb = rows.filter(_._3 == "b").map(_._1).sorted
    val pooled = (va ++ vb).distinct
    val dNum = pooled.map { v =>
      math.abs(va.count(_ <= v).toLong * vb.length -
        vb.count(_ <= v).toLong * va.length)
    }.max
    val ks = Screening.ksTwoSample(scored, "score", "grp", "a", "b")
      .select("n_a", "n_b", "d_num").as[(Long, Long, Long)].head()
    assert(ks == ((va.length.toLong, vb.length.toLong, dNum)))
    // AUC: brute-force tie-corrected Mann–Whitney
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val num = (for (p <- pos; n <- neg) yield
      if (p > n) 2L else if (p == n) 1L else 0L).sum
    val auc = Eval.aucRoc(scored, col("score"), col("label"))
      .select("n_pos", "n_neg", "auc_num").as[(Long, Long, Long)].head()
    assert(auc == ((pos.length.toLong, neg.length.toLong, num)))
    // rankNormalize: pct_rank = #{<= v}/n on every row
    val all = rows.map(_._1)
    val rn = Prep.rankNormalize(scored, "score")
      .select("score", "pct_rank").as[(BigDecimal, Double)].collect()
    assert(rn.length == rows.length)
    rn.foreach { case (v, p) =>
      val exp = BigDecimal(all.count(_ <= v).toDouble / all.length)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(p == exp, s"v=$v")
    }
  }

  // ---- valueRanked / ntileBand (the salted ntile family) ---------------

  /** Duplicated order values + unique tie key, row count NOT divisible by
    * typical band counts — the adversarial fixture for ntile boundary
    * arithmetic.
    */
  private def rowFixture(n: Int): DataFrame =
    (0 until n).map { i =>
      val v = BigDecimal((i * 2654435761L) % 97) / 4 // heavy duplication
      (v, f"k$i%05d", i % 3 == 0)
    }.toDF("score", "key", "label").repartition(7)

  test("valueRanked + ntileBand == global ntile window (duplicated " +
      "values, total % n != 0, all bucket widths)") {
    val df = rowFixture(2003)
    for (n <- Seq(3, 7, 10); buckets <- Seq(2, 16, 64)) {
      val expected = df.withColumn("b",
          ntile(n).over(Window.orderBy(col("score"), col("key")))
            .cast("long"))
        .select("key", "b").as[(String, Long)].collect().toMap
      val got = SaltedGrid.valueRanked(df, Nil, col("score"),
          Seq(col("key")), buckets = buckets)
        .withColumn("b", SaltedGrid.ntileBand(col("__rank"), col("__n"), n))
        .select("key", "b").as[(String, Long)].collect()
      assert(got.length == expected.size, s"n=$n buckets=$buckets")
      got.foreach { case (k, b) =>
        assert(b == expected(k), s"n=$n buckets=$buckets key=$k") }
    }
  }

  test("ntileBand: fewer rows than bands == ntile (bands 1..total)") {
    val df = rowFixture(7)
    val got = SaltedGrid.valueRanked(df, Nil, col("score"), Seq(col("key")))
      .withColumn("b", SaltedGrid.ntileBand(col("__rank"), col("__n"), 10))
      .select("key", "b").as[(String, Long)].collect().toMap
    val expected = df.withColumn("b",
        ntile(10).over(Window.orderBy(col("score"), col("key")))
          .cast("long"))
      .select("key", "b").as[(String, Long)].collect().toMap
    assert(got == expected)
  }

  test("valueRanked per-group == partitioned ntile, dominant-slice " +
      "fixture (one group holds 90% of rows)") {
    val df = (0 until 3000).map { i =>
      val g = if (i % 10 == 0) "rare" else "dominant"
      (g, BigDecimal((i * 48271L) % 53) / 2, f"k$i%05d")
    }.toDF("grp", "score", "key").repartition(7)
    val expected = df.withColumn("b",
        ntile(3).over(Window.partitionBy("grp")
          .orderBy(col("score"), col("key"))).cast("long"))
      .select("key", "b").as[(String, Long)].collect().toMap
    val got = SaltedGrid.valueRanked(df, Seq("grp"), col("score"),
        Seq(col("key")))
      .withColumn("b", SaltedGrid.ntileBand(col("__rank"), col("__n"), 3))
      .select("key", "b").as[(String, Long)].collect()
    assert(got.length == expected.size)
    got.foreach { case (k, b) => assert(b == expected(k), s"key=$k") }
  }

  test("valueRanked hot-tie fan-out: ONE value holding 50% of rows still " +
      "matches the window AND spreads over many salt buckets") {
    // 50% of rows share score 42.0 — without the tie-sub-salt the whole
    // modal mass lands in ONE bucket's window task
    val n = 4000
    val df = (0 until n).map { i =>
      val v = if (i % 2 == 0) BigDecimal(42)
              else BigDecimal((i * 2654435761L) % 971) / 7
      (v, f"k$i%05d")
    }.toDF("score", "key").repartition(7)
    val expected = df.withColumn("b",
        ntile(10).over(Window.orderBy(col("score"), col("key")))
          .cast("long"))
      .select("key", "b").as[(String, Long)].collect().toMap
    val salted = SaltedGrid.valueRankedWithSalt(df, Nil, col("score"),
      Seq(col("key")), buckets = 16)
    val got = salted
      .withColumn("b", SaltedGrid.ntileBand(col("__rank"), col("__n"), 10))
      .select("key", "b").as[(String, Long)].collect()
    assert(got.length == expected.size)
    got.foreach { case (k, b) => assert(b == expected(k), s"key=$k") }
    // load witness: the modal value's rows occupy >= 8 distinct salt
    // buckets, and no single bucket carries more than ~2/16 of the rows
    val hotSalts = salted.filter(col("score") === lit(BigDecimal(42)))
      .groupBy("__salt").count().as[(Int, Long)].collect()
    assert(hotSalts.length >= 8,
      s"modal value fanned over only ${hotSalts.length} salt buckets")
    val biggest = salted.groupBy("__salt").count()
      .agg(max("count")).as[Long].head()
    assert(biggest <= n / 16 * 3,
      s"one salt bucket still carries $biggest of $n rows")
  }

  test("valueRanked NULL semantics: NULL group is its own partition, " +
      "NULL ord sorts first — exactly Window.partitionBy/orderBy") {
    val df = (0 until 600).map { i =>
      val g = i % 3 match {
        case 0 => null; case 1 => "g1"; case 2 => "g2" }
      val v = if (i % 7 == 0) null
              else java.math.BigDecimal.valueOf((i * 48271L) % 230, 1)
      (g, v, f"k$i%04d")
    }.toDF("grp", "score", "key").repartition(7)
    val expected = df.withColumn("b",
        ntile(4).over(Window.partitionBy("grp")
          .orderBy(col("score"), col("key"))).cast("long"))
      .select("key", "b").as[(String, Long)].collect().toMap
    val got = SaltedGrid.valueRanked(df, Seq("grp"), col("score"),
        Seq(col("key")), buckets = 8)
      .withColumn("b", SaltedGrid.ntileBand(col("__rank"), col("__n"), 4))
      .select("key", "b").as[(String, Long)].collect()
    assert(got.length == expected.size,
      s"${got.length} != ${expected.size}: NULL group/ord rows dropped?")
    got.foreach { case (k, b) => assert(b == expected(k), s"key=$k") }
  }

  test("salted ntile family: no single-partition window over row-scale " +
      "input (valueRanked global + per-group, gainsTable past cutoff)") {
    val df = rowFixture(2500)
    assertNoRowScaleGlobalWindow(
      SaltedGrid.valueRanked(df, Nil, col("score"), Seq(col("key"))),
      "valueRanked(global)", salt = "__salt")
    val grouped = df.withColumn("grp",
      when(col("key") < "k02400", "dominant").otherwise("rare"))
    assertNoRowScaleGlobalWindow(
      SaltedGrid.valueRanked(grouped, Seq("grp"), col("score"),
        Seq(col("key"))),
      "valueRanked(per-group)", salt = "__salt")
    // cutoff 0 = every input counts as row-scale: the dispatch must take
    // the salted path and its plan must carry no global window
    spark.conf.set("graft.salted.ntile.cutoff", "0")
    try assertNoRowScaleGlobalWindow(
      Eval.gainsTable(df, col("score"), col("label"), Seq(col("key"))),
      "gainsTable", salt = "__salt")
    finally spark.conf.unset("graft.salted.ntile.cutoff")
  }

  test("ntile size dispatch: window path (default cutoff) and salted " +
      "path (cutoff 0) return identical relations — rfm, gainsTable, " +
      "ccnet tertiles") {
    import graft.ops.{EventOps, TextAnalysis}
    val events = (0 until 2000).map { i =>
      ((i % 97).toString, // modal frequencies per key
        java.sql.Timestamp.valueOf(f"2025-01-${1 + i % 28}%02d 08:00:00"),
        BigDecimal((i * 31) % 500) / 4)
    }.toDF("uid", "ts", "value").repartition(5)
    val docs = (0 until 900).map { i =>
      (i.toLong, if (i % 10 == 0) "rare words here" else
        s"common words repeat ${i % 7} again and again across documents",
        if (i % 10 == 0) "fr" else "en")
    }.toDF("doc_id", "text", "lang")
    def collectSorted(d: org.apache.spark.sql.DataFrame): Seq[String] =
      d.collect().map(_.toString).sorted.toSeq
    def both(f: => org.apache.spark.sql.DataFrame)
        : (Seq[String], Seq[String]) = {
      val small = collectSorted(f)
      spark.conf.set("graft.salted.ntile.cutoff", "0")
      val salted = try collectSorted(f)
      finally spark.conf.unset("graft.salted.ntile.cutoff")
      (small, salted)
    }
    val (r1, r2) = both(EventOps.rfm(events, "uid", "ts", "value"))
    assert(r1 == r2, "rfm paths diverge")
    val scored = rowFixture(1500)
    val (g1, g2) = both(
      Eval.gainsTable(scored, col("score"), col("label"), Seq(col("key"))))
    assert(g1 == g2, "gainsTable paths diverge")
    val (c1, c2) = both(
      TextAnalysis.ccnetBuckets(docs, "doc_id", "text", "lang"))
    assert(c1 == c2, "ccnet tertile paths diverge")
  }
}
