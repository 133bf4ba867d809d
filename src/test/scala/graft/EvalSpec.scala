package graft

import graft.ops.Eval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EvalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("aucRoc: perfect separation gives 1.0, reversed gives 0.0") {
    val df = Seq((1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("s", "y")
    val r = Eval.aucRoc(df, col("s"), col("y") === 1).collect()(0)
    assert(r.getAs[Long]("n_pos") == 2 && r.getAs[Long]("n_neg") == 2)
    assert(r.getAs[Double]("auc") == 1.0)
    val rev = Eval.aucRoc(df, col("s"), col("y") === 0).collect()(0)
    assert(rev.getAs[Double]("auc") == 0.0)
  }

  test("aucRoc: midrank tie correction") {
    // scores (1,1,2), labels (0,1,1): ranks of value 1 average to 1.5,
    // value 2 ranks 3 → R+ = 1.5 + 3 = 4.5, AUC = (4.5 − 3)/(2·1) = 0.75
    val df = Seq((1.0, 0), (1.0, 1), (2.0, 1)).toDF("s", "y")
    val r = Eval.aucRoc(df, col("s"), col("y") === 1).collect()(0)
    assert(r.getAs[Double]("auc") == 0.75)
    // random scores on a constant column → AUC 0.5 exactly (all tied)
    val const = Seq((7.0, 0), (7.0, 1), (7.0, 0), (7.0, 1)).toDF("s", "y")
    assert(Eval.aucRoc(const, col("s"), col("y") === 1)
      .collect()(0).getAs[Double]("auc") == 0.5)
  }

  test("confusionStats: per-class tp/fp/fn and F1, absent-class rows kept") {
    // y:  a a a b b c ;  yh: a a b b a d
    val df = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "a"),
      ("c", "d")).toDF("y", "yh")
    val m = Eval.confusionStats(df, "y", "yh").collect()
      .map(r => r.getAs[String]("class") -> r).toMap
    val a = m("a")
    assert(a.getAs[Long]("tp") == 2 && a.getAs[Long]("fp") == 1 &&
      a.getAs[Long]("fn") == 1)
    assert(math.abs(a.getAs[Double]("prec") - 2.0 / 3) < 1e-9)
    assert(math.abs(a.getAs[Double]("f1") - 2.0 * 2 / (3 + 3)) < 1e-9)
    // class c: never predicted → prec NULL, rec 0; class d: never actual
    assert(m("c").isNullAt(m("c").fieldIndex("prec")))
    assert(m("c").getAs[Double]("rec") == 0.0)
    assert(m("d").getAs[Long]("n_actual") == 0 &&
      m("d").getAs[Long]("n_pred") == 1)
    assert(m("d").isNullAt(m("d").fieldIndex("rec")))
  }

  test("retrievalEval: hand-checked ranking on a 1-hot corpus") {
    // 4 corpus rows in 2-d; query = (1,0) with label L. Cosines to the
    // query: id1 (1,0)→1.0 [L], id2 (1,1)→0.707 [L], id3 (0,1)→0.0 [M],
    // id4 (-1,0)→-1.0 [M]. k=2 → top-2 = id1, id2, both relevant.
    val emb = Seq(
      (0L, Array(1.0, 0.0), "L"), (1L, Array(1.0, 0.0), "L"),
      (2L, Array(1.0, 1.0), "L"), (3L, Array(0.0, 1.0), "M"),
      (4L, Array(-1.0, 0.0), "M")).toDF("id", "vec", "label")
    val r = Eval.retrievalEval(emb, emb.filter(col("id") === 0),
      "id", "vec", "label", 2).collect()(0)
    assert(r.getAs[Long]("n_rel") == 2) // ids 1,2 share label L
    assert(r.getAs[Long]("hits") == 2)
    assert(r.getAs[Double]("p_at_k") == 1.0)
    assert(r.getAs[Double]("mrr") == 1.0)
    // dcg = w(1)+w(2) = idcg at m=2 → ndcg exactly 1.0
    assert(r.getAs[Double]("ndcg") == 1.0)
    val expectedDcg = Eval.dcgWeight(1).add(Eval.dcgWeight(2)).doubleValue()
    assert(math.abs(r.getAs[Double]("dcg") - expectedDcg) < 1e-12)
  }

  test("retrievalEval: no relevant corpus rows → zeros, not nulls") {
    val emb = Seq(
      (0L, Array(1.0, 0.0), "solo"), (1L, Array(1.0, 0.1), "M"),
      (2L, Array(0.9, 0.1), "M")).toDF("id", "vec", "label")
    val r = Eval.retrievalEval(emb, emb.filter(col("id") === 0),
      "id", "vec", "label", 2).collect()(0)
    assert(r.getAs[Long]("n_rel") == 0 && r.getAs[Long]("hits") == 0)
    assert(r.getAs[Double]("mrr") == 0.0 && r.getAs[Double]("ndcg") == 0.0)
  }

  test("calibrationBins: integer binning, exact means, ECE") {
    // num/den ∈ {0/4..4/4}, 2 bins over [0,1]: bin0 = {0,1}/4 (p<0.5),
    // bin1 = {2,3,4}/4. Positives: only num=4.
    val df = Seq((0L, 0), (1L, 0), (2L, 0), (3L, 0), (4L, 1))
      .toDF("num", "y")
    val rows = Eval.calibrationBins(df.withColumn("den", lit(4L)),
        col("num"), col("den"), col("y") === 1, 2)
      .orderBy("bin").collect()
    assert(rows.length == 2)
    val b0 = rows(0); val b1 = rows(1)
    assert(b0.getAs[Long]("n") == 2 && b0.getAs[Long]("n_pos") == 0)
    assert(b0.getAs[Double]("avg_prob") == 0.125) // (0+1)/(2·4)
    assert(b1.getAs[Long]("n") == 3 && b1.getAs[Long]("n_pos") == 1)
    assert(b1.getAs[Double]("avg_prob") == 0.75) // (2+3+4)/(3·4)
    val gap0 = 0.125; val gap1 = math.abs(0.75 - 1.0 / 3)
    val ece = (2 * BigDecimal(gap0).setScale(9, BigDecimal.RoundingMode.HALF_UP) +
      3 * BigDecimal(gap1).setScale(9, BigDecimal.RoundingMode.HALF_UP)) / 5
    assert(math.abs(b0.getAs[Double]("ece") -
      ece.setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    assert(b0.getAs[Double]("ece") == b1.getAs[Double]("ece"))
  }

  test("isotonicCalibration: minimax ≡ PAV — violators pool to their " +
      "weighted mean, monotone output, calibrated input is a fixpoint") {
    // rates 0.2, 0.5, 0.3, 0.8 with n=10 each: bins 1,2 violate →
    // pooled (5+3)/20 = 0.4 → iso = 0.2, 0.4, 0.4, 0.8
    val df = Seq((0L, 10L, 2L), (1L, 10L, 5L), (2L, 10L, 3L),
      (3L, 10L, 8L)).toDF("bin", "n", "n_pos")
    val got = Eval.isotonicCalibration(df, "bin", "n", "n_pos")
      .orderBy("bin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Double]("iso_rate")))
    assert(got.toSeq == Seq((0L, 0.2), (1L, 0.4), (2L, 0.4), (3L, 0.8)))
    // weighted pooling: n=30 @0.5 vs n=10 @0.1 → (15+1)/40 = 0.4
    val w = Seq((0L, 30L, 15L), (1L, 10L, 1L)).toDF("bin", "n", "n_pos")
    val gotW = Eval.isotonicCalibration(w, "bin", "n", "n_pos")
      .orderBy("bin").collect().map(_.getAs[Double]("iso_rate"))
    assert(gotW.toSeq == Seq(0.4, 0.4))
    // already-monotone input passes through unchanged
    val mono = Seq((0L, 10L, 1L), (1L, 10L, 5L), (2L, 10L, 9L))
      .toDF("bin", "n", "n_pos")
    val gotM = Eval.isotonicCalibration(mono, "bin", "n", "n_pos")
      .orderBy("bin").collect().map(_.getAs[Double]("iso_rate"))
    assert(gotM.toSeq == Seq(0.1, 0.5, 0.9))
  }

  test("aucRocBy: per-slice AUC, pooled from the same grid, degenerate " +
      "slice yields NULL") {
    // slice A: (1,neg),(2,pos) → AUC 1; slice B: (1,neg),(2,pos),(3,neg)
    // → one concordant of two pairs → AUC 0.5. Pooled over all five rows:
    // 2R+ = 7+7 = 14 → (14−6)/(2·2·3) = 2/3.
    val df = Seq(("A", 1.0, 0), ("A", 2.0, 1), ("B", 1.0, 0), ("B", 2.0, 1),
      ("B", 3.0, 0)).toDF("g", "s", "y")
    val got = Eval.aucRocBy(df, col("g"), col("s"), col("y") === 1)
      .orderBy("slice").collect()
    assert(got.map(_.getAs[String]("slice")).toSeq == Seq("A", "B"))
    assert(got(0).getAs[Double]("auc") == 1.0)
    assert(got(1).getAs[Double]("auc") == 0.5)
    assert(got.forall(_.getAs[Double]("pooled_auc") == 0.666666667))
    assert(got(0).getAs[Double]("gap") == 0.333333333)
    // all-positive slice: no negatives → NULL auc and gap, counts kept
    val deg = Seq(("C", 1.0, 1), ("C", 2.0, 1)).toDF("g", "s", "y")
    val d = Eval.aucRocBy(deg, col("g"), col("s"), col("y") === 1)
      .collect()(0)
    assert(d.getAs[Long]("n_pos") == 2 && d.getAs[Long]("n_neg") == 0)
    assert(d.isNullAt(d.fieldIndex("auc")) && d.isNullAt(d.fieldIndex("gap")))
  }

  test("conformalInterval: splits partition the data, constant target " +
      "gives q_hat 0 with full coverage, partitioning-invariant") {
    val spark2 = spark
    import spark2.implicits._
    val n = 400
    val const = (1 to n).map(i => (i.toLong, 100.0)).toDF("id", "y")
    val r = Eval.conformalInterval(const, col("id"), col("y"), 50, 25, 1, 10)
      .collect()(0)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_cal") +
      r.getAs[Long]("n_test") == n)
    assert(r.getAs[Double]("y_hat") == 100.0)
    assert(r.getAs[Double]("q_hat") == 0.0)
    assert(r.getAs[Double]("coverage") == 1.0)
    // md5 split + discrete rank are partitioning-independent
    val vary = (1 to n).map(i => (i.toLong, i * 1.25)).toDF("id", "y")
    val a = Eval.conformalInterval(vary.repartition(1), col("id"), col("y"),
      50, 25, 1, 10).collect()(0)
    val b = Eval.conformalInterval(vary.repartition(7), col("id"), col("y"),
      50, 25, 1, 10).collect()(0)
    assert(a == b)
    // the conformal guarantee direction on exchangeable data: q_hat is the
    // ⌈0.9·(n_cal+1)⌉-th smallest residual, so cal-side coverage at q_hat
    // is ≥ 0.9 by construction; spot-check test coverage is near it
    assert(a.getAs[Double]("coverage") >= 0.8)
  }

  test("bestThreshold: integer utility argmax, ties to highest threshold") {
    val spark2 = spark
    import spark2.implicits._
    // scores 3,2,1; labels 1,1,0. thresholds: t=3 → TP1 FP0 FN1 TN1;
    // t=2 → TP2 FP0 FN0 TN1; t=1 → TP2 FP1 FN0 TN0.
    // utility (tp=2, fp=-1, fn=-1, tn=0): t3 → 1; t2 → 4; t1 → 3
    val df = Seq((3, 1), (2, 1), (1, 0)).toDF("s", "y")
    val r = Eval.bestThreshold(df, col("s"), col("y") === 1, 2, -1, -1, 0)
      .collect()(0)
    assert(r.getAs[Int]("threshold") == 2)
    assert(r.getAs[Long]("tp") == 2 && r.getAs[Long]("fp") == 0)
    assert(r.getAs[Long]("utility") == 4)
    // symmetric utilities tie across thresholds → highest threshold wins
    val tie = Seq((2, 1), (1, 1)).toDF("s", "y")
    val t = Eval.bestThreshold(tie, col("s"), col("y") === 1, 1, 0, 0, 0)
    // t=2: TP1 util 1... t=1: TP2 util 2 → argmax unique here; use equal
    // utilities instead: weights all zero → every threshold utility 0
    val z = Eval.bestThreshold(tie, col("s"), col("y") === 1, 0, 0, 0, 0)
      .collect()(0)
    assert(z.getAs[Int]("threshold") == 2)
    assert(t.collect()(0).getAs[Int]("threshold") == 1)
  }

  test("brierDecomposition: perfect calibration has zero reliability; " +
      "Murphy identity holds") {
    val spark2 = spark
    import spark2.implicits._
    // two bins, each perfectly calibrated: pb == ob
    val cal = Seq((0L, 100L, 20L, 0.2), (1L, 100L, 80L, 0.8))
      .toDF("bin", "n", "n_pos", "avg_prob")
    val r = Eval.brierDecomposition(cal, "n", "n_pos", "avg_prob")
      .collect()(0)
    assert(r.getAs[Double]("reliability") == 0.0)
    assert(r.getAs[Double]("base_rate") == 0.5)
    assert(r.getAs[Double]("uncertainty") == 0.25)
    // resolution = (0.5-0.2)^2/2 + (0.5-0.8)^2/2 = 0.09
    assert(r.getAs[Double]("resolution") == 0.09)
    assert(r.getAs[Double]("brier") == 0.16)
    // a miscalibrated bin moves reliability, not resolution
    val bad = Seq((0L, 100L, 20L, 0.9), (1L, 100L, 80L, 0.8))
      .toDF("bin", "n", "n_pos", "avg_prob")
    val b = Eval.brierDecomposition(bad, "n", "n_pos", "avg_prob")
      .collect()(0)
    assert(b.getAs[Double]("reliability") == 0.245) // (0.9-0.2)^2/2
    assert(b.getAs[Double]("resolution") == 0.09)
  }

  test("gainsTable: hand-checked bands, capture and lift") {
    val spark2 = spark
    import spark2.implicits._
    // 4 rows, 2 bands: scores 4,3 (band 1: 2 pos), 2,1 (band 2: 0 pos)
    val df = Seq((1L, 4.0, 1), (2L, 3.0, 1), (3L, 2.0, 0), (4L, 1.0, 0))
      .toDF("id", "s", "y")
    val out = Eval.gainsTable(df, col("s"), col("y") === 1,
      Seq(col("id")), deciles = 2).orderBy("decile").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Double]("response_rate") == 1.0)
    assert(out(0).getAs[Double]("cum_capture") == 1.0)
    assert(out(0).getAs[Double]("lift") == 2.0) // 100% vs 50% base rate
    assert(out(1).getAs[Double]("response_rate") == 0.0)
    assert(out(1).getAs[Double]("cum_capture") == 1.0)
    assert(out(1).getAs[Double]("lift") == 0.0)
  }

  test("averagePrecision: hand-checked step integral, ties move together") {
    val spark2 = spark
    import spark2.implicits._
    // scores 3,2,1 with labels 1,0,1: thresholds desc →
    // t=3: P=1/1, ΔR=1/2; t=2: cp=0; t=1: P=2/3, ΔR=1/2
    // AP = 0.5·1 + 0.5·(2/3) = 0.833333333…
    val df = Seq((3, 1), (2, 0), (1, 1)).toDF("s", "y")
    val r = Eval.averagePrecision(df, col("s"), col("y") === 1).collect()(0)
    assert(r.getAs[Long]("n_scored") == 3 && r.getAs[Long]("n_pos") == 2)
    assert(math.abs(r.getAs[Double]("avg_precision") - 5.0 / 6.0) < 1e-8)
    // a tied block: scores 1,1 labels 1,0 → single threshold P=1/2, ΔR=1
    val tied = Seq((1, 1), (1, 0)).toDF("s", "y")
    val t = Eval.averagePrecision(tied, col("s"), col("y") === 1).collect()(0)
    assert(t.getAs[Double]("avg_precision") == 0.5)
    // no positives → NULL, not a division error
    val neg = Seq((1, 0), (2, 0)).toDF("s", "y")
    val n = Eval.averagePrecision(neg, col("s"), col("y") === 1).collect()(0)
    assert(n.isNullAt(n.fieldIndex("avg_precision")))
  }

  test("conformalInterval: degenerate calibration set means the infinite " +
      "interval — NULL q_hat, coverage 1, never 0") {
    val spark2 = spark
    import spark2.implicits._
    // 12 rows: a handful land in the cal bucket, far fewer than the 9
    // needed for a finite rank at alpha=0.1 → q_hat must be NULL and the
    // convention is conservative (everything covered), not coverage 0
    val tiny = (1 to 12).map(i => (i.toLong, i * 3.5)).toDF("id", "y")
    val r = Eval.conformalInterval(tiny, col("id"), col("y"), 50, 25, 1, 10)
      .collect()(0)
    assert(r.getAs[Long]("n_cal") < 9)
    assert(r.isNullAt(r.fieldIndex("q_hat")))
    assert(r.getAs[Long]("n_covered") == r.getAs[Long]("n_test"))
    assert(r.getAs[Double]("coverage") == 1.0)
  }

  test("rankBiasedOverlap: identical lists hit the truncated-RBO maximum " +
      "1−p^k; disjoint lists read 0; reversal lands strictly between") {
    val spark2 = spark
    import spark2.implicits._
    val a = (1 to 10).map(i => (i.toLong, i)).toDF("id", "rank")
    val same = Eval.rankBiasedOverlap(a, a, "id", "rank", 10).collect()(0)
    // Σ_{d≤10} 0.1·0.9^(d−1) = 1 − 0.9^10, with the d=10 weight rounded
    // at 9 dp → 0.65132156 → 0.651322 at the 6 dp boundary
    assert(same.getAs[Double]("rbo") == 0.651322)
    assert(same.getAs[Long]("n_common") == 10L)
    val b = (11 to 20).map(i => (i.toLong, i - 10)).toDF("id", "rank")
    val disj = Eval.rankBiasedOverlap(a, b, "id", "rank", 10).collect()(0)
    assert(disj.getAs[Double]("rbo") == 0.0 &&
      disj.getAs[Long]("n_common") == 0L)
    val rev = (1 to 10).map(i => (i.toLong, 11 - i)).toDF("id", "rank")
    val r = Eval.rankBiasedOverlap(a, rev, "id", "rank", 10).collect()(0)
    assert(r.getAs[Long]("n_common") == 10L)
    val v = r.getAs[Double]("rbo")
    assert(v > 0.0 && v < 0.651322, s"rbo=$v") // top-weighting penalty
  }

  test("rougeN: hand-computed bigram overlap, clipping, and NULL edges") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq(
      // ref "a b c d" grams {ab,bc,cd}; cand "a b c" grams {ab,bc}:
      // match 2, P = 1, R = 2/3, F1 = 2·1·(2/3)/(5/3) = 0.8
      (1L, "a b c d", "a b c"),
      // clipping: ref "a a a" has gram aa×2, cand "a a" has aa×1 →
      // match min(2,1)=1, P = 1, R = 0.5, F1 = 2/3
      (2L, "a a a", "a a"),
      // no overlap: P = 0, R = 0, F1 = 0 (not NULL, not NaN)
      (3L, "a b", "c d"),
      // cand below gram length → precision NULL, recall NULL-safe 0
      (4L, "a b c", "x"),
      // NULL cand (the spanRemoval fully-duplicated case) ≡ empty
      (5L, "a b c", null),
      // ref below gram length → recall NULL
      (6L, "a", "a b")).toDF("id", "ref", "cand")
    val r = Eval.rougeN(pairs, "id", "ref", "cand", 2)
      .collect().map(x => x.getAs[Long]("pair_id") -> x).toMap
    def d(id: Long, c: String): Double = r(id).getAs[Double](c)
    assert(d(1, "precision") == 1.0 && d(1, "recall") == 0.666666667 &&
      d(1, "f1") == 0.8)
    assert(r(1).getAs[Long]("n_match") == 2)
    assert(r(2).getAs[Long]("n_match") == 1 && d(2, "recall") == 0.5 &&
      d(2, "f1") == 0.666666667)
    assert(d(3, "precision") == 0.0 && d(3, "f1") == 0.0)
    assert(r(4).isNullAt(r(4).fieldIndex("precision")) &&
      r(4).isNullAt(r(4).fieldIndex("f1")) && d(4, "recall") == 0.0)
    assert(r(5).getAs[Long]("n_cand_grams") == 0 &&
      r(5).isNullAt(r(5).fieldIndex("precision")))
    assert(r(6).getAs[Long]("n_ref_grams") == 0 &&
      r(6).isNullAt(r(6).fieldIndex("recall")) &&
      r(6).isNullAt(r(6).fieldIndex("f1")))
  }

  test("rougeN: identical texts score 1.0 everywhere; ROUGE-1 word mode") {
    val spark2 = spark
    import spark2.implicits._
    val pairs = Seq((1L, "x y z x", "x y z x")).toDF("id", "ref", "cand")
    val r2 = Eval.rougeN(pairs, "id", "ref", "cand", 2).collect()(0)
    assert(r2.getAs[Double]("f1") == 1.0 &&
      r2.getAs[Long]("n_match") == 3)
    // ROUGE-1: unigram clipping — cand "x x y" vs ref "x y z x":
    // x min(2,2)=2, y min(1,1)=1 → match 3 of cand 3 / ref 4
    val p1 = Seq((1L, "x y z x", "x x y")).toDF("id", "ref", "cand")
    val r1 = Eval.rougeN(p1, "id", "ref", "cand", 1).collect()(0)
    assert(r1.getAs[Long]("n_match") == 3 &&
      r1.getAs[Double]("precision") == 1.0 &&
      r1.getAs[Double]("recall") == 0.75)
  }

  private def dp9(x: Double) = BigDecimal(x)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP)

  test("survivalCurve: hand-traced KM/NA table — censored rows shrink the " +
      "risk set without a factor, censored-only times absent") {
    // durations/events: events at t=2 (1/6), t=3 (1/5), t=5 (2/3);
    // censored at t=3 and t=7
    val df = Seq((2L, 1L), (3L, 1L), (3L, 0L), (5L, 1L), (5L, 1L),
      (7L, 0L)).toDF("duration_us", "event")
    val out = Eval.survivalCurve(df, "duration_us", "event")
      .orderBy("duration_us")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((2L, 6L, 1L), (3L, 5L, 1L), (5L, 3L, 2L)), out.mkString(", "))
    // NA cumhaz: exact nano-unit sums of round(d/n, 9)
    def h(d: Long, n: Long) = dp9(d.toDouble / n)
    assert(out(0)._4 == h(1, 6).toDouble)
    assert(out(1)._4 == (h(1, 6) + h(1, 5)).toDouble)
    assert(out(2)._4 == (h(1, 6) + h(1, 5) + h(2, 3)).toDouble)
    // KM: exp of the cumulative 9-dp-rounded ln factors
    def lnf(d: Long, n: Long) = dp9(math.log((n - d).toDouble / n))
    def km(ls: BigDecimal) = dp9(math.exp(ls.toDouble)).toDouble
    assert(out(0)._5 == km(lnf(1, 6)))
    assert(out(1)._5 == km(lnf(1, 6) + lnf(1, 5)))
    assert(out(2)._5 == km(lnf(1, 6) + lnf(1, 5) + lnf(2, 3)))
    // survival is non-increasing, hazard non-decreasing
    assert(out.map(_._5).sliding(2).forall(p => p(0) >= p(1)))
    assert(out.map(_._4).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("survivalCurve: a grid point where the whole risk set dies pins " +
      "KM to exactly 0 instead of ln(0)") {
    val df = Seq((1L, 1L), (2L, 1L), (2L, 1L)).toDF("duration_us", "event")
    val out = Eval.survivalCurve(df, "duration_us", "event")
      .orderBy("duration_us")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(out.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq((1L, 3L, 1L), (2L, 2L, 2L)), out.mkString(", "))
    assert(out(1)._5 == 0.0)
    assert(out(1)._4 == (dp9(1.0 / 3) + dp9(1.0)).toDouble)
  }

  test("mapAtK: hand-computed APs with the lcm clearing and truncating " +
      "nano mean; unrecommended users score 0 but are counted") {
    import graft.ops.Eval
    val recs = (Seq("A", "B", "C", "D", "E").zipWithIndex.map {
        case (it, i) => ("u", it, (i + 1).toLong) } ++
      Seq(("v", "X", 1L), ("v", "Y", 2L)))
      .toDF("user", "item", "rank")
    val relevant = Seq(("u", "B"), ("u", "D"), ("u", "Z"), ("v", "X"),
      ("w", "Q")).toDF("user", "item")
    val got = Eval.mapAtK(recs.repartition(3), relevant, 5)
      .as[(Long, Long, Option[Double], Option[Double])].head()
    // u: hits at 2 (ch 1) and 4 (ch 2): AP = (1/2 + 2/4)/3 = 1/3
    // v: hit at 1: AP = 1 ; w: no recs: AP = 0
    val expected = (333333333L + 1000000000L + 0L).toDouble / (3 * 1.0e9)
    assert(got._1 == 3 && got._2 == 5)
    assert(got._3.contains(expected))
    assert(got._4.contains(2.0 / 3.0))
    // a perfect list is exactly 1
    val perfect = Eval.mapAtK(Seq(("p", "A", 1L), ("p", "B", 2L))
        .toDF("user", "item", "rank"),
      Seq(("p", "A"), ("p", "B")).toDF("user", "item"), 5)
      .as[(Long, Long, Option[Double], Option[Double])].head()
    assert(perfect._3.contains(1.0) && perfect._4.contains(1.0))
  }

  test("woeIv: hand-computed WOE/IV with the Laplace-half clearing; a " +
      "non-informative feature scores IV ~ 0 and flipping the label " +
      "negates WOE") {
    import graft.ops.Eval
    import org.apache.spark.sql.functions.col
    // score 1: 30 pos / 10 neg ; score 0: 10 pos / 30 neg
    val rows = Seq.fill(30)((1L, true)) ++ Seq.fill(10)((1L, false)) ++
      Seq.fill(10)((0L, true)) ++ Seq.fill(30)((0L, false))
    val df = rows.toDF("s", "y")
    val got = Eval.woeIv(df.repartition(3), col("s"), col("y"))
      .orderBy("score")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    def woe(p: Long, q: Long, tp: Long, tn: Long): Double =
      BigDecimal(math.log((2.0 * p + 1) * tn / ((2.0 * q + 1) * tp)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def contrib(p: Long, q: Long, tp: Long, tn: Long): BigDecimal =
      BigDecimal(((p + 0.5) / tp - (q + 0.5) / tn) *
        math.log((2.0 * p + 1) * tn / ((2.0 * q + 1) * tp)))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(got(0)._5 == woe(10, 30, 40, 40))
    assert(got(1)._5 == woe(30, 10, 40, 40))
    val iv = (contrib(10, 30, 40, 40) + contrib(30, 10, 40, 40)).toDouble
    assert(got.forall(_._6 == iv) && iv > 0.3) // a strong feature
    // flat feature: shares equal in every bin -> IV ~ 0
    val flat = (1 to 200).map(i => ((i % 3).toLong, i % 2 == 0))
      .toDF("s", "y")
    val gf = Eval.woeIv(flat, col("s"), col("y"))
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(math.abs(gf._6) < 0.01)
  }

  test("fleissKappa: perfect agreement is exactly 1; a single category " +
      "everywhere is NULL (chance agreement total); a ragged panel " +
      "raises loudly") {
    // 3 raters, every rater agrees, two categories present
    val perfect = (1 to 4).flatMap(s =>
      (1 to 3).map(_ => (s.toLong, (s % 2).toLong))).toDF("s", "c")
    val p = Eval.fleissKappa(perfect, "s", "c").collect()(0)
    assert(p.getAs[Long]("n_subjects") == 4 &&
      p.getAs[Long]("n_raters") == 3)
    assert(p.getAs[Double]("p_bar") == 1.0)
    assert(p.getAs[Double]("kappa") == 1.0)
    // one category everywhere: P̄e = 1 → κ undefined (NULL)
    val mono = (1 to 4).flatMap(s =>
      (1 to 3).map(_ => (s.toLong, 7L))).toDF("s", "c")
    val m = Eval.fleissKappa(mono, "s", "c").collect()(0)
    assert(m.isNullAt(m.fieldIndex("kappa")))
    // ragged: subject 1 has 3 ratings, subject 2 has 2
    val ragged = (Seq((1L, 0L), (1L, 0L), (1L, 1L), (2L, 0L), (2L, 1L)))
      .toDF("s", "c")
    val ex = intercept[Exception] {
      Eval.fleissKappa(ragged, "s", "c").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("fleissKappa")))
  }

  test("fleissKappa: bit-identical to the exact BigInt replay of the " +
      "Fleiss 1971 formulas on a mixed fixture") {
    val ratings = Seq(
      (1L, 0L), (1L, 0L), (1L, 1L),
      (2L, 1L), (2L, 1L), (2L, 1L),
      (3L, 0L), (3L, 1L), (3L, 2L),
      (4L, 2L), (4L, 2L), (4L, 0L))
    val r = Eval.fleissKappa(ratings.toDF("s", "c"), "s", "c").collect()(0)
    val cells = ratings.groupBy(identity).map(_._2.size)
    val bigN = BigInt(4); val n = BigInt(3)
    val s2 = ratings.groupBy(identity).values.map(v => BigInt(v.size))
      .map(x => x * x).sum
    val cj = ratings.groupBy(_._2).values.map(v => BigInt(v.size))
    val a = s2 - bigN * n
    val b = bigN * n * (n - 1)
    val c = cj.map(x => x * x).sum
    val d = bigN * n * bigN * n
    assert(cells.sum == 12)
    assert(r.getAs[Double]("p_bar") == a.toDouble / b.toDouble)
    assert(r.getAs[Double]("p_e") == c.toDouble / d.toDouble)
    assert(r.getAs[Double]("kappa") ==
      (a * d - c * b).toDouble / (b * (d - c)).toDouble)
  }

  test("passAtK: hand-computed hypergeometric values; c = 0 scores 0; " +
      "n − c < k scores exactly 1; pass@1 is the mean solve rate; a " +
      "task with fewer than k samples raises") {
    // task A: n=5, c=2 → pass@2 = 1 − (3·2)/(5·4) = 0.7
    // task B: n=5, c=0 → 0; task C: n=5, c=4 → n−c=1 < 2 → exactly 1
    val df = (Seq.fill(2)(("A", true)) ++ Seq.fill(3)(("A", false)) ++
      Seq.fill(5)(("B", false)) ++
      Seq.fill(4)(("C", true)) :+ (("C", false)))
      .toDF("task", "ok")
    val r = Eval.passAtK(df, "task", col("ok"), Seq(1, 2))
      .orderBy("k").collect()
    assert(r(0).getAs[Int]("k") == 1 &&
      r(0).getAs[Double]("pass_at_k") ==
        BigDecimal((0.4 + 0.0 + 0.8) / 3)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1).getAs[Int]("k") == 2 &&
      r(1).getAs[Double]("pass_at_k") ==
        BigDecimal((0.7 + 0.0 + 1.0) / 3)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1).getAs[Long]("n_tasks") == 3 &&
      r(1).getAs[Long]("n_samples") == 15 &&
      r(1).getAs[Long]("n_correct") == 6)
    val ex = intercept[Exception] {
      Eval.passAtK(df, "task", col("ok"), Seq(6)).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("passAtK")))
  }

  test("krippendorffAlpha: hand-traced ragged fixture; singleton units " +
      "drop without effect; perfect agreement is 1; single category is " +
      "NULL; an 11-rating unit exceeds the lcm bound and raises") {
    // u1 (a,a), u2 (a,b), u3 (b,b,b): n=7, n_a=3, n_b=4,
    // Do_scaled = 2·2520 (only u2's two ordered disagreeing pairs, m=2),
    // α = 1 − 6·5040/(2520·(49−25)) = 0.5 exactly
    val base = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"),
      (3L, "b"), (3L, "b"), (3L, "b"))
    val r = Eval.krippendorffAlpha(base.toDF("u", "c"), "u", "c")
      .collect()(0)
    assert(r.getAs[Long]("n_units") == 3 &&
      r.getAs[Long]("n_pairable") == 7)
    assert(r.getAs[Double]("alpha") == 0.5)
    assert(r.getAs[Double]("d_observed") == 5040.0 / (2520.0 * 7))
    // a singleton unit contributes nothing
    val withSingleton = (base :+ (9L, "a")).toDF("u", "c")
    val r2 = Eval.krippendorffAlpha(withSingleton, "u", "c").collect()(0)
    assert(r2.getAs[Double]("alpha") == 0.5 &&
      r2.getAs[Long]("n_units") == 3)
    // perfect agreement across two categories
    val perfect = Seq((1L, "a"), (1L, "a"), (2L, "b"), (2L, "b"))
      .toDF("u", "c")
    assert(Eval.krippendorffAlpha(perfect, "u", "c").collect()(0)
      .getAs[Double]("alpha") == 1.0)
    // one category everywhere → De = 0 → NULL
    val mono = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "a"))
      .toDF("u", "c")
    val m = Eval.krippendorffAlpha(mono, "u", "c").collect()(0)
    assert(m.isNullAt(m.fieldIndex("alpha")))
    // 11 ratings on one unit exceeds the lcm(1..9) clearing bound
    val big = (1 to 11).map(i => (1L, if (i % 2 == 0) "a" else "b"))
      .toDF("u", "c")
    val ex = intercept[Exception] {
      Eval.krippendorffAlpha(big, "u", "c").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("krippendorffAlpha")))
  }

  test("cohenKappa: equal-marginal fixture reduces to fleissKappa " +
      "(Scott's π = Cohen's κ there), matches Screening.cohenKappa to " +
      "its 9-dp rounding, and guards a ragged panel") {
    // raters 0/1 with IDENTICAL marginals {0:2, 1:2}; agree on 2 of 4
    val panel = Seq(
      (1L, 0L, 0L), (1L, 1L, 0L),
      (2L, 0L, 0L), (2L, 1L, 1L),
      (3L, 0L, 1L), (3L, 1L, 0L),
      (4L, 0L, 1L), (4L, 1L, 1L)).toDF("s", "r", "c")
    val co = Eval.cohenKappa(panel, "s", "r", "c").collect()(0)
    assert(co.getAs[Long]("n_subjects") == 4 &&
      co.getAs[Long]("n_agree") == 2)
    assert(co.getAs[Double]("p_o") == 0.5 &&
      co.getAs[Double]("p_e") == 0.5)
    assert(co.getAs[Double]("kappa") == 0.0)
    val fl = Eval.fleissKappa(panel.select("s", "c"), "s", "c")
      .collect()(0)
    assert(fl.getAs[Double]("kappa") == co.getAs[Double]("kappa"))
    // the wide-input sibling agrees to its 9-dp round
    val wide = panel.filter(col("r") === 0).select(col("s"),
        col("c").as("c0"))
      .join(panel.filter(col("r") === 1).select(col("s"),
        col("c").as("c1")), Seq("s"))
    val sk = graft.ops.Screening.cohenKappa(wide, "c0", "c1").collect()(0)
    assert(sk.getAs[Double]("kappa") ==
      BigDecimal(co.getAs[Double]("kappa"))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // rater 1 missing a subject → raise
    val ragged = panel.filter(!(col("s") === 4L && col("r") === 1L))
    val ex = intercept[Exception] {
      Eval.cohenKappa(ragged, "s", "r", "c").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("cohenKappa")))
  }

  test("cohenKappa: OFFSETTING malformed input (rater 0 rates A twice " +
      "and never B while rater 1 rates each once) raises instead of " +
      "silently double-counting A and dropping B") {
    // per-rater row counts are equal (2 each) so the old equal-count
    // guard passed; the per-(subject, rater) duplicate check must fire
    val bad = Seq(
      (1L, 0L, 0L), (1L, 0L, 1L), // rater 0 rates subject 1 TWICE
      (1L, 1L, 0L), (2L, 1L, 1L)) // rater 1 rates subjects 1 and 2
      .toDF("s", "r", "c")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Eval.cohenKappa(bad, "s", "r", "c").collect()
    }
    assert(msgs(ex).exists(m => m.contains("cohenKappa") &&
      m.contains("more than once")))
  }

  test("fleissKappa and cohenKappa: EMPTY input raises with a readable " +
      "message (the min/max guard columns are NULL there)") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val empty = Seq.empty[(Long, Long)].toDF("s", "c")
    val exF = intercept[Exception] {
      Eval.fleissKappa(empty, "s", "c").collect()
    }
    assert(msgs(exF).exists(m => m.contains("fleissKappa") &&
      m.contains("none")))
    val empty3 = Seq.empty[(Long, Long, Long)].toDF("s", "r", "c")
    val exC = intercept[Exception] {
      Eval.cohenKappa(empty3, "s", "r", "c").collect()
    }
    assert(msgs(exC).exists(m => m.contains("cohenKappa") &&
      m.contains("none")))
  }

  test("cohenKappaDrift: a PLANTED mid-campaign rater flip reads " +
      "kappa 1 then -1 with drift exactly -2; slices agree with " +
      "independent cohenKappa runs; a ragged window raises naming it") {
    // window 1: raters agree perfectly on a 2-category panel → κ = 1
    // window 2: rater 1 flips every binary label → p_o = 0, equal
    // marginals → p_e = 1/2 → κ = −1
    val w1 = Seq((1L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (2L, 1L, 1L),
      (3L, 0L, 0L), (3L, 1L, 0L), (4L, 0L, 1L), (4L, 1L, 1L))
      .map { case (s, r, c) => (s, r, c, 1L) }
    val w2 = Seq((5L, 0L, 0L), (5L, 1L, 1L), (6L, 0L, 1L), (6L, 1L, 0L),
      (7L, 0L, 0L), (7L, 1L, 1L), (8L, 0L, 1L), (8L, 1L, 0L))
      .map { case (s, r, c) => (s, r, c, 2L) }
    val panel = (w1 ++ w2).toDF("s", "r", "c", "w")
    val rows = Eval.cohenKappaDrift(panel, "s", "r", "c", "w")
      .collect()
    assert(rows.length == 2)
    val byWin = rows.map(r => r.getAs[Long]("window") -> r).toMap
    assert(byWin(1L).getAs[Double]("kappa") == 1.0 &&
      byWin(1L).getAs[Long]("n_subjects") == 4)
    assert(byWin(2L).getAs[Double]("kappa") == -1.0 &&
      byWin(2L).getAs[Double]("p_o") == 0.0)
    assert(rows.forall(_.getAs[Double]("kappa_drift") == -2.0))
    // each window slice is bit-identical to an independent ungrouped run
    Seq(1L, 2L).foreach { w =>
      val solo = Eval.cohenKappa(panel.filter(col("w") === w),
        "s", "r", "c").collect()(0)
      val slice = byWin(w)
      assert(solo.getAs[Double]("p_o") == slice.getAs[Double]("p_o") &&
        solo.getAs[Double]("p_e") == slice.getAs[Double]("p_e") &&
        solo.getAs[Double]("kappa") == slice.getAs[Double]("kappa"))
    }
    // window 2 loses one rating → the raise names window 2
    val ragged = panel.filter(!(col("s") === 8L && col("r") === 1L))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Eval.cohenKappaDrift(ragged, "s", "r", "c", "w").collect()
    }
    assert(msgs(ex).exists(m => m.contains("cohenKappaDrift") &&
      m.contains("window 2")))
  }

  test("passAtK: a task whose sample count exceeds the 10^(38/k) " +
      "falling-factorial bound raises the explicit domain error, not an " +
      "opaque decimal overflow") {
    // k=20 → bound = ⌊10^1.9⌋ = 79; a 100-sample task must raise loudly
    val big = (1 to 100).map(i => ("T", i % 3 == 0)).toDF("task", "ok")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Eval.passAtK(big, "task", col("ok"), Seq(20)).collect()
    }
    assert(msgs(ex).exists(m => m.contains("passAtK") &&
      m.contains("exceeds the exact-decimal bound")))
    // and the same data is fine at a k whose bound clears 100
    val ok = Eval.passAtK(big, "task", col("ok"), Seq(5)).collect()(0)
    assert(ok.getAs[Long]("n_samples") == 100)
  }
}
