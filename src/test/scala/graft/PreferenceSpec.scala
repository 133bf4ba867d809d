package graft

import graft.ops.Preference
import org.scalatest.funsuite.AnyFunSuite

class PreferenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("btStrength: a planted BT-exact tournament recovers the planted " +
      "total order, with strengths near the planted ratios") {
    // items 1..4 with strengths s_i = i; for each pair (i, j) play
    // 3·(s_i+s_j) games where i wins exactly 3·s_i — the EXACT BT
    // proportions, so the MLE (up to scale) IS the planted vector
    val pairs = (for {
      i <- 1 to 4; j <- 1 to 4 if i != j
      _ <- 1 to 3 * i
    } yield (i.toLong, j.toLong)).toDF("winner", "loser")
    val rows = Preference.btStrength(pairs, "winner", "loser", iters = 8)
      .orderBy("item").collect()
    assert(rows.length == 4)
    val str = rows.map(r => r.getAs[Long]("item") ->
      r.getAs[Long]("strength_nano")).toMap
    // fitted order ≡ planted order
    assert(str(1L) < str(2L) && str(2L) < str(3L) && str(3L) < str(4L))
    assert(rows.map(r => r.getAs[Long]("item") ->
      r.getAs[Int]("rank")).toMap == Map(1L -> 4, 2L -> 3, 3L -> 2,
      4L -> 1))
    // strength ratios near the planted 1:2:3:4 (MM converges fast on
    // exact proportions; 8 rounds lands well within 5%)
    val r21 = str(2L).toDouble / str(1L)
    val r41 = str(4L).toDouble / str(1L)
    assert(math.abs(r21 - 2.0) < 0.1, s"p2/p1 = $r21")
    assert(math.abs(r41 - 4.0) < 0.2, s"p4/p1 = $r41")
    // wins/games bookkeeping: item 4 plays 3·(s₄+s_j) games per
    // opponent (both orientations of a game land on ONE g row) and wins
    // 3·s₄ of each pairing
    val g = rows.map(r => r.getAs[Long]("item") ->
      (r.getAs[Long]("n_games"), r.getAs[Long]("n_wins"))).toMap
    assert(g(4L) == ((3L * (5 + 6 + 7), 3L * 4 * 3)))
  }

  test("btStrength: a symmetric head-to-head ties exactly — equal " +
      "strength_nano, rank broken to the smaller item id") {
    val pairs = ((1 to 5).map(_ => (10L, 20L)) ++
      (1 to 5).map(_ => (20L, 10L))).toDF("winner", "loser")
    val rows = Preference.btStrength(pairs, "winner", "loser", iters = 8)
      .orderBy("item").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("strength_nano") ==
      rows(1).getAs[Long]("strength_nano"))
    assert(rows(0).getAs[Long]("item") == 10L &&
      rows(0).getAs[Int]("rank") == 1)
    assert(rows(1).getAs[Int]("rank") == 2)
    // the normalization invariant: Σ p = |items|·10⁹ up to flooring
    val tot = rows.map(_.getAs[Long]("strength_nano")).sum
    assert(tot <= 2L * 1000000000L && tot > 2L * 1000000000L - 4)
  }

  test("btPairStats: on the BT-exact tournament every pair's fitted " +
      "rate sits within a few percent of the observed rate, and the " +
      "canonical bookkeeping is exact") {
    val pairs = (for {
      i <- 1 to 4; j <- 1 to 4 if i != j
      _ <- 1 to 3 * i
    } yield (i.toLong, j.toLong)).toDF("winner", "loser")
    val rows = graft.ops.Preference.btPairStats(pairs, "winner", "loser",
      iters = 8).orderBy("item_a", "item_b").collect()
    assert(rows.length == 6) // C(4,2) canonical pairs
    val p12 = rows.find(r => r.getAs[Long]("item_a") == 1L &&
      r.getAs[Long]("item_b") == 2L).get
    // pair (1,2): 1 beats 2 three times, 2 beats 1 six times
    assert(p12.getAs[Long]("n_games") == 9L &&
      p12.getAs[Long]("n_wins_a") == 3L)
    assert(p12.getAs[Double]("win_rate_a") == 3.0 / 9.0)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("residual")) < 0.05,
        s"residual too large: $r")
    }
  }

  test("majorityCycles: rock-paper-scissors counts exactly one cyclic " +
      "triad; a transitive tournament counts zero; a tied pair drops " +
      "its edge") {
    // 1 beats 2, 2 beats 3, 3 beats 1 — twice each (strict majorities)
    val rps = Seq((1L, 2L), (1L, 2L), (2L, 3L), (2L, 3L), (3L, 1L),
      (3L, 1L)).toDF("winner", "loser")
    val r = graft.ops.Preference.majorityCycles(rps, "winner", "loser")
      .collect()(0)
    assert(r.getAs[Long]("n_items") == 3 && r.getAs[Long]("n_edges") == 3)
    assert(r.getAs[Long]("n_ties") == 0)
    assert(r.getAs[Long]("n_cyclic_triads") == 1)
    // transitive: 1>2, 1>3, 2>3 — no cycle
    val tr = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("winner", "loser")
    val t = graft.ops.Preference.majorityCycles(tr, "winner", "loser")
      .collect()(0)
    assert(t.getAs[Long]("n_cyclic_triads") == 0 &&
      t.getAs[Long]("n_edges") == 3)
    // tie on (1,2) drops that edge and with it the cycle
    val tie = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L))
      .toDF("winner", "loser")
    val s = graft.ops.Preference.majorityCycles(tie, "winner", "loser")
      .collect()(0)
    assert(s.getAs[Long]("n_ties") == 1 && s.getAs[Long]("n_edges") == 2)
    assert(s.getAs[Long]("n_cyclic_triads") == 0)
  }

  test("btStrength: an item that never wins converges to strength 0 " +
      "(the MLE boundary), and the winner takes the whole mass") {
    val pairs = (1 to 4).map(_ => (1L, 2L)).toDF("winner", "loser")
    val rows = Preference.btStrength(pairs, "winner", "loser", iters = 8)
      .orderBy("item").collect()
    val m = rows.map(r => r.getAs[Long]("item") ->
      r.getAs[Long]("strength_nano")).toMap
    assert(m(2L) == 0L)
    assert(m(1L) == 2L * 1000000000L)
  }

  test("positionBias: a PLANTED side-biased log (first wins 300 of 400) " +
      "reads z = 10 exactly; a perfectly balanced log reads z = 0; a " +
      "winner matching neither side raises loudly") {
    // 400 comparisons between items (1,2); first-shown side wins 300
    val biased = ((1 to 300).map(i =>
        (i.toLong % 2 + 1, 2L - i.toLong % 2, i.toLong % 2 + 1)) ++
      (1 to 100).map(i =>
        (i.toLong % 2 + 1, 2L - i.toLong % 2, 2L - i.toLong % 2)))
      .toDF("first", "second", "winner")
    val r = Preference.positionBias(biased, "first", "second", "winner")
      .collect()(0)
    assert(r.getAs[Long]("n_pairs") == 400 &&
      r.getAs[Long]("n_first_wins") == 300 &&
      r.getAs[Long]("n_second_wins") == 100)
    assert(r.getAs[Double]("first_win_rate") == 0.75)
    // z = (2·300 − 400)/√400 = 200/20 = 10 exactly
    assert(r.getAs[Double]("z_position") == 10.0)
    val fair = ((1 to 200).map(i => (1L, 2L, 1L)) ++
      (1 to 200).map(i => (1L, 2L, 2L))).toDF("first", "second", "winner")
    assert(Preference.positionBias(fair, "first", "second", "winner")
      .collect()(0).getAs[Double]("z_position") == 0.0)
    val malformed = Seq((1L, 2L, 3L)).toDF("first", "second", "winner")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val ex = intercept[Exception] {
      Preference.positionBias(malformed, "first", "second", "winner")
        .collect()
    }
    assert(msgs(ex).exists(_.contains("positionBias")))
  }

  test("lengthBias: a PLANTED longer-always-wins log shows win rate 0 " +
      "in the negative-delta bins and 1 in the positive ones, with " +
      "ntile's equal-count banding and exact delta ranges") {
    // 16 pairs, deltas −8,−7,…,−1,1,…,8 (longer side always wins ⇒
    // first wins iff delta > 0); 4 buckets of 4
    val log = ((-8 to -1) ++ (1 to 8)).map { d =>
      (100L + d, 100L, d > 0, d.toLong)
    }.toDF("len_first", "len_second", "first_wins", "k")
    val rows = Preference.lengthBias(log, "len_first", "len_second",
        "first_wins", "k", buckets = 4)
      .collect().map(r => (r.getAs[Long]("delta_bin"),
        r.getAs[Long]("n_pairs"), r.getAs[Double]("first_win_rate"),
        r.getAs[Long]("min_delta"), r.getAs[Long]("max_delta")))
    assert(rows.toSeq == Seq(
      (1L, 4L, 0.0, -8L, -5L), (2L, 4L, 0.0, -4L, -1L),
      (3L, 4L, 1.0, 1L, 4L), (4L, 4L, 1.0, 5L, 8L)))
  }

  test("lengthBias: the salted row-scale banding path is hash-identical " +
      "to the one-task ntile window on the same log") {
    val log = (1 to 500).map { i =>
      (100L + (i * 37) % 101, 100L + (i * 53) % 97, i % 3 == 0, i.toLong)
    }.toDF("len_first", "len_second", "first_wins", "k")
    val viaWindow = Preference.lengthBias(log, "len_first", "len_second",
      "first_wins", "k", buckets = 8).collect().toSeq
    spark.conf.set("graft.salted.ntile.cutoff", "10")
    try {
      val viaSalt = Preference.lengthBias(log, "len_first", "len_second",
        "first_wins", "k", buckets = 8).collect().toSeq
      assert(viaSalt == viaWindow)
    } finally spark.conf.unset("graft.salted.ntile.cutoff")
  }
}
