package graft

import graft.ops.Screening
import org.apache.spark.sql.functions.{col, lit}
import org.scalatest.funsuite.AnyFunSuite

class ScreeningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("contingency chi2/MI match an independent reference model") {
    // deterministic dependent data: b follows a 70/30 given a
    val rows = (0 until 1000).map { i =>
      val a = if (i % 2 == 0) "x" else "y"
      val b = if ((i * 2654435761L % 10) < (if (a == "x") 7 else 3)) 0L else 1L
      (a, b)
    }
    val got = Screening.contingencyStats(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double)].head()

    // reference: plain scala contingency
    val cont = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = rows.size.toDouble
    val as = rows.map(_._1).distinct.sorted
    val bs = rows.map(_._2).distinct.sorted
    val ra = as.map(a => a -> rows.count(_._1 == a).toLong).toMap
    val cb = bs.map(b => b -> rows.count(_._2 == b).toLong).toMap
    var chi2 = BigDecimal(0); var mi = BigDecimal(0)
    for (a <- as; b <- bs) {
      val o = cont.getOrElse((a, b), 0L)
      if (o > 0) {
        val e = (ra(a) * cb(b)).toDouble / n
        chi2 += BigDecimal((o - e) * (o - e) / e)
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        mi += BigDecimal(o / n * math.log(o * n / (ra(a) * cb(b)).toDouble))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }
    }
    assert(got._1 == 1000L)
    assert(got._2 == (as.size - 1).toLong * (bs.size - 1))
    assert(math.abs(got._3 - chi2.toDouble) < 1e-8, s"chi2 ${got._3} vs $chi2")
    assert(math.abs(got._4 - mi.toDouble) < 1e-8, s"mi ${got._4} vs $mi")
    assert(got._3 > 100.0) // dependence is strong by construction
    assert(got._4 > 0.0)
  }

  test("chi2/MI vanish on an exactly independent table") {
    // perfect independence: every (a, b) cell has identical count
    val rows = for { a <- 0 until 4; b <- 0 until 3; _ <- 0 until 10 }
      yield (s"a$a", b.toLong)
    val got = Screening.contingencyStats(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Double, Double)].head()
    assert(got._3 == 0.0 && got._4 == 0.0)
  }

  test("otsuThreshold: argmax matches the brute-force between-class " +
      "variance sweep over the same integer histogram") {
    // bimodal: a low cluster around 1.00-3.00 and a high one 80.00-95.00
    val vals = (0 until 60).map(i => 1.0 + (i % 21) * 0.1) ++
      (0 until 40).map(i => 80.0 + (i % 16))
    val df = vals.map(v => Tuple1(v)).toSeq.toDF("v")
    val got = Screening.otsuThreshold(df, "v", bins = 16)
      .collect().head
    // reference: same cents binning, exact prefix sums, double objective
    val cents = vals.map(v => BigDecimal(v).setScale(2,
      BigDecimal.RoundingMode.HALF_UP).*(100).toLong)
    val (mn, mx, n, s) = (cents.min, cents.max, cents.size.toLong, cents.sum)
    def bin(c: Long): Long = math.min(15L, (c - mn) * 16 / (mx - mn + 1))
    val byBin = cents.groupBy(bin)
    val cand = (0L until 15L).flatMap { t =>
      val left = byBin.filter(_._1 <= t).values.flatten.toSeq
      if (left.isEmpty || left.size == cents.size) None
      else {
        val w0 = left.size.toLong; val s0 = left.sum
        val num = (s0 * n - s * w0).toDouble
        Some((num * num / (w0 * (n - w0)).toDouble, -t, left.max, w0))
      }
    }
    val best = cand.max
    assert(got.getInt(0) == -best._2.toInt, "threshold_bin")
    assert(got.getDouble(1) == best._3.toDouble / 100.0, "threshold_value")
    assert(got.getLong(2) == best._4, "n_below")
    assert(got.getLong(3) == n - best._4, "n_above")
    // the cut must land between the two planted clusters
    assert(got.getDouble(1) >= 3.0 && got.getDouble(1) < 80.0)
  }

  test("otsuThreshold: a clean 50/50 two-point column cuts exactly " +
      "between the points") {
    val df = (Seq.fill(50)(10.0) ++ Seq.fill(50)(20.0))
      .map(Tuple1(_)).toDF("v")
    val got = Screening.otsuThreshold(df, "v", bins = 4).collect().head
    assert(got.getLong(2) == 50L && got.getLong(3) == 50L)
    assert(got.getDouble(1) == 10.0) // inclusive upper edge of the cut
  }

  test("two-sample KS matches the brute-force CDF sweep") {
    val va = (0 until 500).map(i => (i * 7 % 100) / 2.0) // uniform-ish
    val vb = (0 until 400).map(i => (i * 13 % 100) / 2.0 + 10.0) // shifted
    val df = (va.map(("a", _)) ++ vb.map(("b", _))).toDF("g", "v")
    val got = Screening.ksTwoSample(df, "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()

    val pooled = (va ++ vb).distinct.sorted
    val dRef = pooled.map { x =>
      math.abs(va.count(_ <= x).toLong * vb.size -
        vb.count(_ <= x).toLong * va.size)
    }.max
    assert(got._1 == 500L && got._2 == 400L)
    assert(got._3 == dRef)
    assert(math.abs(got._4 - dRef.toDouble / (500L * 400L)) < 1e-9)
  }

  test("KS is zero for identical samples, one for disjoint supports") {
    val same = ((0 until 100).map(("a", _)) ++ (0 until 100).map(("b", _)))
      .map { case (g, i) => (g, i.toDouble) }.toDF("g", "v")
    val d0 = Screening.ksTwoSample(same, "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(d0._4 == 0.0)
    val disjoint = ((0 until 50).map(i => ("a", i.toDouble)) ++
      (0 until 50).map(i => ("b", i + 1000.0))).toDF("g", "v")
    val d1 = Screening.ksTwoSample(disjoint, "v", "g", "a", "b")
      .as[(Long, Long, Long, Double)].head()
    assert(d1._4 == 1.0)
  }

  test("Cohen's kappa: perfect agreement 1, independence ~0, reference match") {
    val perfect = (0 until 100).map(i => (s"c${i % 3}", s"c${i % 3}"))
      .toDF("a", "b")
    assert(Screening.cohenKappa(perfect, "a", "b")
      .as[(Long, Long, Long, Double)].head()._4 == 1.0)

    // structured disagreement with known confusion matrix
    val rows = (0 until 600).map { i =>
      val a = s"c${i % 3}"
      val b = if (i % 10 < 7) a else s"c${(i + 1) % 3}"
      (a, b)
    }
    val got = Screening.cohenKappa(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long, Double)].head()
    val n = rows.size.toLong
    val agree = rows.count { case (a, b) => a == b }.toLong
    val peNum = (0 until 3).map { c =>
      rows.count(_._1 == s"c$c").toLong * rows.count(_._2 == s"c$c").toLong
    }.sum
    assert(got._1 == n && got._2 == agree && got._3 == peNum)
    val ref = BigDecimal((agree * n - peNum).toDouble / (n * n - peNum))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._4 == ref)
  }

  test("pearsonMatrix: exact ±1 on linear columns, NULL on zero variance") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0), (2.0, 4.0, -2.0, 5.0),
      (3.0, 6.0, -3.0, 5.0), (4.0, 8.0, -4.0, 5.0))
      .toDF("x", "y2x", "neg", "const")
    val m = Screening.pearsonMatrix(df, Seq("x", "y2x", "neg", "const"))
      .collect()
      .map(r => (r.getAs[String]("col_a"), r.getAs[String]("col_b")) -> r)
      .toMap
    assert(m.size == 6)
    assert(m(("x", "y2x")).getAs[Double]("corr") == 1.0)
    assert(m(("x", "neg")).getAs[Double]("corr") == -1.0)
    val c = m(("x", "const"))
    assert(c.isNullAt(c.fieldIndex("corr"))) // zero variance → NULL, no ÷0
    assert(c.getAs[Long]("n") == 4)
    // null in any profiled column drops the row for EVERY pair
    val withNull = Seq((Some(1.0), Some(1.0)), (None, Some(2.0)),
      (Some(3.0), Some(3.0))).toDF("a", "b")
    assert(Screening.pearsonMatrix(withNull, Seq("a", "b"))
      .collect()(0).getAs[Long]("n") == 2)
  }

  test("bootstrapCi: constant column collapses CI to the mean; bounds " +
      "ordered; deterministic across runs") {
    val const = (1 to 50).map(i => (i.toLong, 5.0)).toDF("id", "v")
    val r = Screening.bootstrapCi(const, "id", "v",
      resamples = 50, keepPct = 80, loPermille = 25, hiPermille = 975)
      .collect()(0)
    assert(r.getAs[Long]("n") == 50 && r.getAs[Double]("mean") == 5.0)
    assert(r.getAs[Long]("n_resamples") == 50)
    assert(r.getAs[Double]("ci_lo") == 5.0 && r.getAs[Double]("ci_hi") == 5.0)
    val varied = (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def run() = Screening.bootstrapCi(varied, "id", "v",
      resamples = 50, keepPct = 80, loPermille = 25, hiPermille = 975)
      .collect()(0)
    val a = run(); val b = run()
    assert(a.getAs[Double]("ci_lo") <= a.getAs[Double]("ci_hi"))
    assert(a.getAs[Double]("ci_lo") == b.getAs[Double]("ci_lo") &&
      a.getAs[Double]("ci_hi") == b.getAs[Double]("ci_hi"))
  }

  test("fkAudit: orphan rows vs orphan keys, NULL child keys are rows " +
      "not keys") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Option.empty[Long]).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Screening.fkAudit(child, "k", parent, "pk", "c->p").collect()(0)
    assert(r.getAs[String]("edge") == "c->p")
    assert(r.getAs[Long]("n_rows") == 6)
    assert(r.getAs[Long]("n_orphan_rows") == 3) // 9, 9, NULL
    assert(r.getAs[Long]("n_orphan_keys") == 1) // just 9
    assert(r.getAs[Double]("orphan_rate") == 0.5)
  }

  test("weightedMedian: lower median by cumulative weight, per group") {
    // group a: values 1(w1), 2(w1), 3(w10) → total 12, half 6 → median 3
    // group b: values 5(w2), 7(w2) → total 4, cum at 5 is 2, 2*2>=4 → 5
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 1L), ("a", 3.0, 10L),
      ("b", 5.0, 2L), ("b", 7.0, 2L)).toDF("g", "v", "w")
    val m = Screening.weightedMedian(df, "v", "w", Seq("g"))
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("total_weight"), r.getAs[Double]("w_median"))).toMap
    assert(m("a") == ((12L, 3.0)))
    assert(m("b") == ((4L, 5.0)))
  }

  test("mcnemar: discordant cells and continuity-corrected statistic") {
    // 10 rows: A right on 7 (rows 1-7), B right on 5 (rows 4-8).
    // both_right rows 4-7 (4), b = A only rows 1-3 (3), c = B only row 8
    // (1), both_wrong rows 9-10 (2). chi2 = (|3-1|-1)^2/4 = 0.25
    val df = (1 to 10).map { i =>
      (i, if (i <= 7) 1 else 0, if (i >= 4 && i <= 8) 1 else 0)
    }.toDF("id", "a_ok", "b_ok")
    val r = Screening.mcnemar(df, lit(1), col("a_ok"), col("b_ok"))
      .collect()(0)
    assert(r.getAs[Long]("both_right") == 4 &&
      r.getAs[Long]("both_wrong") == 2)
    assert(r.getAs[Long]("b_only_a") == 3 && r.getAs[Long]("c_only_b") == 1)
    assert(r.getAs[Double]("mcnemar_chi2") == 0.25)
    // perfect agreement → NULL statistic, not a division error
    val same = Seq((1, 1), (0, 0)).toDF("a_ok", "y")
    val s = Screening.mcnemar(same, col("y"), col("a_ok"), col("a_ok"))
      .collect()(0)
    assert(s.isNullAt(s.fieldIndex("mcnemar_chi2")))
  }

  test("abExperiment: hash split is deterministic and near-even; a " +
      "conversion that IS the arm maxes the 2x2 statistic") {
    val spark2 = spark
    import spark2.implicits._
    import graft.ops.Prep
    val ev = (0 until 2000).map(i => (s"u${i % 1000}", i)).toDF("u", "x")
    def run(df: org.apache.spark.sql.DataFrame,
        conv: org.apache.spark.sql.Column) =
      Screening.abExperiment(df, col("u"), conv).collect()(0)
    // arm-independent conversion signal: all false → effect undefined
    val r0 = run(ev, lit(false))
    assert(r0.getAs[Long]("n_units") == 1000)
    assert(r0.getAs[Long]("n_arm0") + r0.getAs[Long]("n_arm1") == 1000)
    // an even md5 split: |n0 − n1| small → SRM must NOT flag
    assert(r0.getAs[Double]("srm_chi2") < 3.841458821)
    assert(!r0.getAs[Boolean]("srm_flag_5pct"))
    assert(r0.isNullAt(r0.fieldIndex("effect_chi2")))
    // conversion == arm membership → perfect separation: χ² = n, flags on
    val r1 = run(ev, Prep.hashBucket(col("u"), 2) === 0)
    assert(r1.getAs[Double]("cr0") == 1.0 && r1.getAs[Double]("cr1") == 0.0)
    assert(r1.getAs[Double]("effect_chi2") == 1000.0)
    assert(r1.getAs[Boolean]("effect_flag_5pct") &&
      r1.getAs[Boolean]("effect_flag_1pct"))
    // repartitioning cannot move anything
    val r2 = run(ev.repartition(13), Prep.hashBucket(col("u"), 2) === 0)
    assert(r2.getAs[Double]("effect_chi2") == 1000.0 &&
      r2.getAs[Long]("n_arm0") == r1.getAs[Long]("n_arm0"))
  }

  test("kAnonymity: class sizes and l-diversity per quasi combo; small " +
      "class flags k, uniform-sensitive class flags l") {
    val spark2 = spark
    import spark2.implicits._
    val rows =
      // class (US, gold): 3 members, all sensitive = 'a' → violates l
      Seq(("US", "gold", "a"), ("US", "gold", "a"), ("US", "gold", "a")) ++
      // class (US, base): 4 members, 2 sensitive values → passes both
      Seq(("US", "base", "a"), ("US", "base", "b"), ("US", "base", "a"),
        ("US", "base", "b")) ++
      // class (DE, gold): 1 member → violates k (and l)
      Seq(("DE", "gold", "c"))
    val out = Screening.kAnonymity(rows.toDF("nation", "tier", "s"),
        Seq("nation", "tier"), "s", k = 2, l = 2)
      .orderBy("nation", "tier").collect()
      .map(r => (r.getAs[String]("nation"), r.getAs[String]("tier"),
        r.getAs[Long]("class_size"), r.getAs[Long]("l_diversity"),
        r.getAs[Boolean]("violates_k"), r.getAs[Boolean]("violates_l")))
    assert(out.toSeq == Seq(
      ("DE", "gold", 1L, 1L, true, true),
      ("US", "base", 4L, 2L, false, false),
      ("US", "gold", 3L, 1L, false, true)))
  }

  test("dpNoisyCounts: noise replays the seeded inverse-CDF exactly, " +
      "flips with the seed, and noisy = true + noise") {
    val spark2 = spark
    import spark2.implicits._
    val df = (1 to 40).map(i => (s"g${i % 5}", i)).toDF("grp", "x")
    val out = Screening.dpNoisyCounts(df, Seq("grp"), 0.5, "seedA")
      .orderBy("grp")
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == 5 && out.forall(_._2 == 8L))
    // replicate the mechanism for one group in plain JVM arithmetic
    def expectedNoise(seed: String, g: String): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$seed|$g".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val v = java.lang.Long.parseLong(hex.substring(0, 13), 16)
      val u = (v.toDouble + 0.5) / 4503599627370496.0
      val q = u - 0.5
      BigDecimal(-math.signum(q) * math.log(1.0 - 2.0 * math.abs(q)) / 0.5)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    out.foreach { case (g, t, noise, noisy) =>
      assert(noise == expectedNoise("seedA", g), g)
      assert(noisy == BigDecimal(t.toDouble + noise)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble, g)
    }
    // a different seed draws different noise (on at least one group)
    val outB = Screening.dpNoisyCounts(df, Seq("grp"), 0.5, "seedB")
      .orderBy("grp").as[(String, Long, Double, Double)].collect()
    assert(out.map(_._3).toSeq != outB.map(_._3).toSeq)
    // and the run is repartition-invariant
    val rep = Screening.dpNoisyCounts(df.repartition(7), Seq("grp"), 0.5,
        "seedA").orderBy("grp")
      .as[(String, Long, Double, Double)].collect()
    assert(rep.toSeq == out.toSeq)
  }

  /** Scalar Mann–Whitney reference: average-rank U + tie-corrected z. */
  private def mwuRef(a: Seq[Double], b: Seq[Double])
      : (Double, Double, Double, Option[Double]) = {
    val pooled = (a.map((_, 0)) ++ b.map((_, 1))).sortBy(_._1)
    val ranks = scala.collection.mutable.Map.empty[Double, Double]
    var i = 0
    while (i < pooled.length) {
      var j = i
      while (j < pooled.length && pooled(j)._1 == pooled(i)._1) j += 1
      ranks(pooled(i)._1) = (i + 1 + j) / 2.0 // avg of ranks i+1..j
      i = j
    }
    val ra = a.map(ranks).sum
    val na = a.size.toDouble; val nb = b.size.toDouble; val n = na + nb
    val ua = ra - na * (na + 1) / 2
    val ties = pooled.groupBy(_._1).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val sig2 = na * nb * ((n + 1) * n * (n - 1) - ties) / (12 * n * (n - 1))
    val z = if (sig2 > 0)
      Some(BigDecimal((ua - na * nb / 2) / math.sqrt(sig2))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    else None
    (ua, na * nb - ua, ties, z)
  }

  test("mannWhitneyU: hand fixture with ties matches the scalar " +
      "reference; swapping groups mirrors U and negates z") {
    val a = Seq(1.0, 2.0, 3.0, 5.5, 5.5, 9.0)
    val b = Seq(2.0, 3.0, 4.0, 5.5, 7.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = Screening.mannWhitneyU(df, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .head()
    val (ua, ub, ties, z) = mwuRef(a, b)
    assert(got._1 == a.size && got._2 == b.size)
    assert(got._3 == ua && got._4 == ub && got._5 == ties)
    assert(got._6 == z)
    assert(got._7.contains(math.abs(z.get) > 1.959963985))
    val sw = Screening.mannWhitneyU(df, "v", "g", "b", "a")
      .as[(Long, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(sw._3 == ub && sw._4 == ua && sw._6.get == -z.get)
  }

  test("mannWhitneyU: clear separation flags significant; all-tied " +
      "values yield null z; repartition-invariant") {
    val a = (1 to 40).map(_.toDouble)
    val b = (101 to 140).map(_.toDouble)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = Screening.mannWhitneyU(df.repartition(13), "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(got._3 == 0.0 && got._4 == 1600.0) // every b beats every a
    val (_, _, _, z) = mwuRef(a, b)
    assert(got._6 == z && got._7.contains(true) && z.get < -1.959963985)
    val tied = Seq(("a", 5.0), ("a", 5.0), ("b", 5.0)).toDF("g", "v")
    val gt = Screening.mannWhitneyU(tied, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Double, Option[Double], Option[Boolean])]
      .head()
    assert(gt._6.isEmpty && gt._7.isEmpty)
  }

  test("associationStrength: perfect diagonal hits V = U = 1 exactly; " +
      "independence hits 0; U is directional where V is symmetric") {
    // 3×3 diagonal with k = 3 per cell → e = 1 on every cell: all
    // contributions are exact short decimals, so V and U land on 1.0
    val diag = Seq("x", "y", "z").flatMap(v => Seq.fill(3)((v, v)))
      .toDF("a", "b")
    val gd = Screening.associationStrength(diag, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].head()
    assert(gd._1 == 9 && gd._2 == 3 && gd._3 == 3)
    assert(gd._4 == 18.0) // chi2 = n·(min−1)
    assert(gd._7.contains(1.0) && gd._8.contains(1.0))
    // independent 2×2 with equal cells → exactly 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq(0L, 1L);
      _ <- 1 to 25 } yield (a, b)).toDF("a", "b")
    val gi = Screening.associationStrength(ind, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].head()
    assert(gi._4 == 0.0 && gi._7.contains(0.0) && gi._8.contains(0.0))
    // a = b mod 2: B determines A (U(A|B)=1) but A doesn't determine B
    val det = (0 until 40).map(i => (i % 4 % 2, i % 4)).toDF("a", "b")
    val gab = Screening.associationStrength(det, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].head()
    val gba = Screening.associationStrength(det, "b", "a")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].head()
    assert(gab._8.contains(1.0) && gba._8.get < 1.0 && gba._8.get > 0.0)
    // V symmetric across the swap; single-category side → null V/U
    assert(gab._7 == gba._7)
    val mono = Seq(("x", 1L), ("x", 2L)).toDF("a", "b")
    val gm = Screening.associationStrength(mono, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double],
        Option[Double])].head()
    assert(gm._7.isEmpty && gm._8.isEmpty)
  }

  /** Scalar Welch reference in cent integers, mirroring the op's exact
    * IEEE sequence.
    */
  private def welchRef(a: Seq[Double], b: Seq[Double])
      : (Double, Double, Double, Double) = {
    def moments(xs: Seq[Double]): (Long, BigInt, BigInt) = {
      val cents: Seq[BigInt] =
        xs.map(x => (BigDecimal(x) * 100).toBigIntExact.get)
      (xs.size.toLong, cents.sum, cents.map(c => c * c).sum)
    }
    val (na, sa, sa2) = moments(a); val (nb, sb, sb2) = moments(b)
    def q(n: Long, s: BigInt, s2: BigInt): Double =
      (BigInt(n) * s2 - s * s).toDouble /
        (BigInt(n) * BigInt(n) * BigInt(n - 1)).toDouble
    val qa = q(na, sa, sa2); val qb = q(nb, sb, sb2)
    val t = BigDecimal((sa.toDouble / na - sb.toDouble / nb) /
        math.sqrt(qa + qb))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val dof = (qa + qb) * (qa + qb) /
      (qa * qa / (na - 1).toDouble + qb * qb / (nb - 1).toDouble)
    (sa.toDouble / (na * 100.0), sb.toDouble / (nb * 100.0), t, dof)
  }

  test("welchTTest: hand fixture matches the cent-exact scalar " +
      "reference; swap negates t; equal-variance case hits classic dof") {
    val a = Seq(1.25, 2.5, 3.75, 2.0, 4.5)
    val b = Seq(5.0, 6.25, 4.75, 8.0)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("g", "v")
    val got = Screening.welchTTest(df.repartition(5), "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Boolean])].head()
    val (ma, mb, t, dof) = welchRef(a, b)
    assert(got._1 == a.size && got._2 == b.size)
    assert(got._3 == ma && got._4 == mb)
    assert(got._5.contains(t) && got._6.contains(dof))
    assert(got._7.contains(math.abs(t) > 1.959963985))
    val sw = Screening.welchTTest(df, "v", "g", "b", "a")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Boolean])].head()
    assert(sw._5.contains(-t) && sw._6.contains(dof))
    // identical group sizes and variances → dof = na+nb−2 (the classic
    // pooled dof), a known Welch–Satterthwaite fixed point
    val sym = (Seq(1.0, 2.0, 3.0).map(("a", _)) ++
      Seq(11.0, 12.0, 13.0).map(("b", _))).toDF("g", "v")
    val gs = Screening.welchTTest(sym, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Boolean])].head()
    assert(gs._6.contains(4.0) && gs._7.contains(true))
  }

  test("welchTTest: degenerate groups give null t/dof, not a crash") {
    // both groups constant → zero pooled variance
    val const = (Seq.fill(3)(("a", 2.0)) ++ Seq.fill(4)(("b", 5.0)))
      .toDF("g", "v")
    val gc = Screening.welchTTest(const, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Boolean])].head()
    assert(gc._5.isEmpty && gc._6.isEmpty && gc._7.isEmpty)
    // a 1-row group has no variance estimate
    val tiny = Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("g", "v")
    val gt = Screening.welchTTest(tiny, "v", "g", "a", "b")
      .as[(Long, Long, Double, Double, Option[Double], Option[Double],
        Option[Boolean])].head()
    assert(gt._1 == 1 && gt._5.isEmpty && gt._6.isEmpty)
  }

  test("permutationTestBh: a planted mean shift is rejected while a " +
      "null slice is not; p-values share the B+1 denominator; the " +
      "rejected set is a prefix of the p-ranking") {
    val rnd = new scala.util.Random(3)
    // slice "shift": group b pays +50; slice "null": same distribution
    val rows =
      (1 to 150).map(i => ("shift", s"s$i", 10.0 + (i % 7), "a")) ++
      (1 to 150).map(i => ("shift", s"t$i", 60.0 + (i % 7), "b")) ++
      (1 to 150).map(i => ("null", s"u$i", 10.0 + (i % 7), "a")) ++
      (1 to 150).map(i => ("null", s"v$i", 10.0 + ((i + 3) % 7), "b"))
    val df = rows.toDF("cat", "id", "v", "g")
    val got = Screening.permutationTestBh(df.repartition(5), "id", "v",
        "cat", "g", "a", "b", resamples = 99, seed = "sp")
      .as[(String, Long, Long, Option[Double], Long, Double, Long,
        Boolean)].collect().map(r => r._1 -> r).toMap
    val sh = got("shift"); val nl = got("null")
    assert(sh._2 == 150 && sh._3 == 150)
    // no random reassignment beats a 50-point planted shift
    assert(sh._5 == 0L && sh._6 == 1.0 / 100 && sh._8)
    assert(nl._6 > 0.2 && !nl._8)
    assert(sh._4.get > 49.0 && sh._4.get < 51.0)
    assert(nl._4.get < 1.0)
    // deterministic replay: same seed, any partitioning
    val again = Screening.permutationTestBh(df, "id", "v", "cat", "g",
        "a", "b", 99, "sp")
      .as[(String, Long, Long, Option[Double], Long, Double, Long,
        Boolean)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
    // rejected categories form a prefix of the bh_rank order
    val byRank = got.values.toSeq.sortBy(_._7)
    assert(byRank.map(_._8).dropWhile(identity).forall(!_))
  }

  test("permutationTestBh: the graft_perm_sums kernel path is " +
      "bit-identical to the composable ×B explode fallback, including " +
      "null ids (concat_ws null-skip) and degenerate resamples") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val rows = (1 to 80).map(i =>
        ("c" + (i % 3), s"id$i", (i % 11) + 0.25 * (i % 4), if (i % 2 == 0) "a" else "b")) :+
      (("c0", null.asInstanceOf[String], 7.5, "a")) // null id row
    val df = rows.toDF("cat", "id", "v", "g")
    def run() = Screening.permutationTestBh(df, "id", "v", "cat", "g",
        "a", "b", resamples = 73, seed = "eq")
      .collect().map(_.toString).sorted.toSeq
    assert(graft.functions.Kernels.registered("graft_perm_sums"))
    val kernel = run() // active session registers the kernel
    val fallbackSession = spark.newSession()
    fallbackSession.sessionState.functionRegistry
      .dropFunction(new FunctionIdentifier("graft_perm_sums"))
    SparkSession.setActiveSession(fallbackSession)
    val fallback =
      try {
        assert(!graft.functions.Kernels.registered("graft_perm_sums"))
        run() // same df; plan built on the explode spelling
      } finally SparkSession.setActiveSession(spark)
    assert(kernel == fallback)
  }

  test("diffInDiff: a hand 2x2 with a planted treatment effect " +
      "recovers it exactly; parallel trends with no effect give 0; an " +
      "empty cell nulls the estimator") {
    import org.apache.spark.sql.functions.col
    // replicate Prep.hashBucket in plain JVM md5 to pre-sort the units
    def arm(u: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16) % 2
    }
    val arms = (1 to 40).map(i => s"u$i").map(u => u -> arm(u))
    val ctrl = arms.collect { case (u, 0L) => u }
    val treat = arms.collect { case (u, 1L) => u }
    assert(ctrl.nonEmpty && treat.nonEmpty)
    // ctrl: pre 10, post 12 (+2 trend); treat: pre 20, post 25 (+2
    // trend +3 effect)
    val rows =
      ctrl.flatMap(u => Seq((u, false, 10.0), (u, true, 12.0))) ++
      treat.flatMap(u => Seq((u, false, 20.0), (u, true, 25.0)))
    val df = rows.toDF("u", "post", "v")
    val got = graft.ops.Screening.diffInDiff(df.repartition(3),
        col("u"), col("post"), "v")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].head()
    assert(got._5.contains(10.0) && got._6.contains(12.0))
    assert(got._7.contains(20.0) && got._8.contains(25.0))
    assert(got._9.contains(3.0))
    // no effect: treat post = 22 -> DiD exactly 0
    val nul = rows.map { case (u, p, v) =>
      (u, p, if (v == 25.0) 22.0 else v) }.toDF("u", "post", "v")
    val g0 = graft.ops.Screening.diffInDiff(nul, col("u"), col("post"),
        "v")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].head()
    assert(g0._9.contains(0.0))
    // drop every treated-post row -> did null
    val miss = rows.filter { case (u, p, _) =>
      !(p && treat.contains(u)) }.toDF("u", "post", "v")
    val gm = graft.ops.Screening.diffInDiff(miss, col("u"), col("post"),
        "v")
      .as[(Long, Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double])].head()
    assert(gm._4 == 0 && gm._9.isEmpty)
  }

  test("cuped: a perfectly predictive covariate collapses the adjusted " +
      "variance (var_reduction = 1) and preserves the arm contrast in " +
      "expectation; zero-variance covariate nulls the adjustment") {
    import org.apache.spark.sql.functions.col
    // y = 2x exactly: corr^2 = 1, theta = 2
    val rows = (1 to 60).map(i => (s"u$i", i.toDouble, 2.0 * i))
    val df = rows.toDF("u", "x", "y")
    val got = graft.ops.Screening.cuped(df.repartition(4), col("u"),
        col("x"), col("y"))
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(got._1 == 60 && got._2 + got._3 == 60)
    assert(got._4.contains(2.0))
    assert(math.abs(got._11.get - 1.0) < 1e-12)
    // with y = 2x, adjusted means equal 2*xbar for BOTH arms -> the
    // adjusted contrast vanishes even when the raw one doesn't
    assert(math.abs(got._10.get) < 1e-9)
    // constant covariate: var(X) = 0 -> theta/adjusted null, raw kept
    val const = (1 to 20).map(i => (s"u$i", 5.0, i.toDouble))
      .toDF("u", "x", "y")
    val gc = graft.ops.Screening.cuped(const, col("u"), col("x"),
        col("y"))
      .as[(Long, Long, Long, Option[Double], Option[Double],
        Option[Double], Option[Double], Option[Double], Option[Double],
        Option[Double], Option[Double])].head()
    assert(gc._4.isEmpty && gc._7.isEmpty && gc._10.isEmpty)
    assert(gc._9.isDefined)
  }

  test("ebShrinkage: small samples shrink toward the prior mean, big " +
      "ones barely move; zero between-key variance keeps raw rates") {
    import org.apache.spark.sql.functions.col
    // keys with very different evidence around rates 0.2 and 0.8
    val rows =
      (1 to 1000).map(i => ("big_lo", i <= 200)) ++
      (1 to 1000).map(i => ("big_hi", i <= 800)) ++
      Seq(("tiny_hi", true)) ++                  // 1/1 successes
      (1 to 5).map(_ => ("small_lo", false))     // 0/5
    val got = graft.ops.Screening.ebShrinkage(rows.toDF("k", "s")
        .repartition(4), Seq("k"), col("s"))
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Double]("raw_rate"), r.getAs[Double]("smoothed_rate")))
      .toMap
    val prior = got.values.map(_._1).sum / 4 // rough center
    // tiny 1/1 shrinks far below 1.0; 0/5 pulls up off the floor
    // 4 dispersed keys make a WEAK prior (large v, small kappa), so the
    // shrink is real but modest
    assert(got("tiny_hi")._1 == 1.0 && got("tiny_hi")._2 < 0.9)
    assert(got("small_lo")._1 == 0.0 && got("small_lo")._2 > 0.01)
    // heavy keys stay close to their raw rates
    assert(math.abs(got("big_lo")._2 - 0.2) < 0.05)
    assert(math.abs(got("big_hi")._2 - 0.8) < 0.05)
    // shrinkage is toward the middle
    assert(got("tiny_hi")._2 > prior - 0.5)
    // all keys identical => v = 0 => prior null, smoothed null
    val const = (1 to 30).map(i => (s"k${i % 3}", i % 2 == 0))
      .toDF("k", "s")
    val gc = graft.ops.Screening.ebShrinkage(const, Seq("k"), col("s"))
      .collect()
    assert(gc.forall(_.isNullAt(4)))
  }

  test("covariateBalance: a balanced covariate scores near-zero SMD, a " +
      "planted arm shift scores |SMD| ~ its standardized size; " +
      "degenerate arms yield null") {
    import org.apache.spark.sql.functions.col
    def arm(u: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(u.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16) % 2
    }
    val units = (1 to 4000).map(i => s"u$i")
    // balanced: x depends only on the unit index; shifted: arm-1 units
    // get +10 on a sd~[0..9] base
    val rows = units.flatMap { u =>
      val base = (u.drop(1).toInt % 10).toLong
      Seq((u, "bal", base),
        (u, "shift", base + (if (arm(u) == 1) 10L else 0L)))
    }
    val got = Screening.covariateBalance(rows.toDF("u", "c", "x")
        .repartition(4), col("u"), col("c"), col("x"))
      .collect().map(r => r.getAs[String]("covariate") ->
        (Option(r.getAs[java.lang.Double]("smd")).map(_.toDouble),
          Option(r.getAs[java.lang.Boolean]("balanced_0p1"))
            .map(_.booleanValue))).toMap
    val (balSmd, balOk) = got("bal")
    val (shSmd, shOk) = got("shift")
    // SMD sampling s.e. ~ 2/sqrt(n): with 4000 units the balanced
    // covariate sits comfortably inside the 0.1 health fence
    assert(math.abs(balSmd.get) < 0.1 && balOk.contains(true))
    assert(shSmd.get > 2.0 && shOk.contains(false)) // 10 / sd(~2.9)
    // single-arm data: no arm-0 rows => null smd
    val solo = Seq(("uX", "c1", 5L), ("uX", "c1", 6L)).toDF("u", "c", "x")
    val gs = Screening.covariateBalance(solo, col("u"), col("c"),
        col("x")).collect()(0)
    assert(gs.isNullAt(gs.fieldIndex("smd")))
  }
}
