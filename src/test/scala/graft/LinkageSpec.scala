package graft

import graft.ops.Linkage
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def r9(x: Double): BigDecimal =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
  private def lg2(x: Double): BigDecimal = r9(math.log(x) / math.log(2.0))

  test("fellegiSunter: weights match the hand-rolled m/u model and true " +
      "pairs outrank in-block non-matches") {
    // one block so the reference enumerates every pair; two fields:
    // name (ids 2, 4 corrupted) and city (id 3 corrupted)
    val a = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
      (3L, "eve", "bern"), (4L, "kim", "kiev"), (5L, "tom", "lima"))
      .map { case (i, n, c) => (i, "blk", n, c) }
      .toDF("rec_id", "block", "name", "city")
    val bRows = Seq((1L, "ann", "rome"), (2L, "BOB", "oslo"),
      (3L, "eve", "BERN"), (4L, "KIM", "kiev"), (5L, "tom", "lima"))
    val b = bRows.map { case (i, n, c) => (i, "blk", n, c) }
      .toDF("rec_id", "block", "name", "city")

    // reference m/u from exact pair enumeration
    val aRows = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
      (3L, "eve", "bern"), (4L, "kim", "kiev"), (5L, "tom", "lima"))
    val pairs = for (x <- aRows; y <- bRows) yield (x, y)
    val tru = pairs.filter { case (x, y) => x._1 == y._1 }
    val non = pairs.filter { case (x, y) => x._1 != y._1 }
    def w(agreeTrue: Int, nTrue: Int, agreeNon: Int, nNon: Int) = {
      val m = (agreeTrue + 1.0) / (nTrue + 2)
      val u = (agreeNon + 1.0) / (nNon + 2)
      (lg2(m / u), lg2((1 - m) / (1 - u)))
    }
    val (waN, wdN) = w(tru.count(p => p._1._2 == p._2._2), tru.size,
      non.count(p => p._1._2 == p._2._2), non.size)
    val (waC, wdC) = w(tru.count(p => p._1._3 == p._2._3), tru.size,
      non.count(p => p._1._3 == p._2._3), non.size)
    val expect = pairs.map { case (x, y) =>
      val s = (if (x._2 == y._2) waN else wdN) +
        (if (x._3 == y._3) waC else wdC)
      (x._1, y._1, s.toDouble)
    }

    val got = Linkage.fellegiSunter(a, b, "rec_id", "block",
        Seq("name", "city"), threshold = Double.NegativeInfinity)
      .orderBy("a_id", "b_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getBoolean(4)))
    assert(got.length == 25) // every in-block pair at -inf threshold
    got.foreach { case (ai, bi, nAgree, weight, isMatch) =>
      val ref = expect.find(e => e._1 == ai && e._2 == bi).get._3
      assert(weight == ref, s"($ai,$bi): $weight vs $ref")
      assert(isMatch == (ai == bi))
    }
    // every true pair outranks every non-match in this fixture
    val worstTrue = got.filter(_._5).map(_._4).min
    val bestNon = got.filterNot(_._5).map(_._4).max
    assert(worstTrue > bestNon)
    // n_agree counts the agreeing fields exactly
    assert(got.find(g => g._1 == 1L && g._2 == 1L).get._3 == 2)
    assert(got.find(g => g._1 == 2L && g._2 == 2L).get._3 == 1)
  }

  test("linkageEm: bit-identical to the BigInt nano-EM replay, and the " +
      "posterior separates all-agree from all-disagree patterns") {
    // one block, 2 fields; 3 true pairs agree on everything, the rest of
    // the 5x5 grid mostly disagrees — EM must find the mixture unaided
    val a = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
      (3L, "eve", "bern"), (4L, "kim", "kiev"), (5L, "tom", "lima"))
      .map { case (i, n, c) => (i, "blk", n, c) }
      .toDF("rec_id", "block", "name", "city")
    val bRows = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
      (3L, "eve", "bern"), (4L, "KIM", "kiev"), (5L, "tom", "LIMA"))
    val b = bRows.map { case (i, n, c) => (i, "blk", n, c) }
      .toDF("rec_id", "block", "name", "city")
    val iters = 10
    val got = Linkage.linkageEm(a, b, "rec_id", "block",
        Seq("name", "city"), iters)
      .orderBy("agree_name", "agree_city").collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq

    // reference: exact integer EM over the pattern counts
    val aRows = Seq((1L, "ann", "rome"), (2L, "bob", "oslo"),
      (3L, "eve", "bern"), (4L, "kim", "kiev"), (5L, "tom", "lima"))
    val pats = (for (x <- aRows; y <- bRows) yield
        ((x._2 == y._2, x._3 == y._3), x._1 == y._1))
      .groupBy(_._1).map { case (k, v) =>
        (k, v.size.toLong, v.count(_._2).toLong) }.toSeq
    val N = BigInt(1000000000L)
    var (p, mn, mc, un, uc) = (BigInt(100000000L), BigInt(900000000L),
      BigInt(900000000L), BigInt(100000000L), BigInt(100000000L))
    def gOf(gn: Boolean, gc: Boolean): BigInt = {
      val aU = (p * (if (gn) mn else N - mn) * (if (gc) mc else N - mc)) / N
      val bU = ((N - p) * (if (gn) un else N - un) *
        (if (gc) uc else N - uc)) / N
      (aU * N) / (aU + bU).max(BigInt(1))
    }
    (1 to iters).foreach { _ =>
      val rows = pats.map { case ((gn, gc), n, _) =>
        (gn, gc, BigInt(n), gOf(gn, gc)) }
      val den = rows.map(r => r._3 * r._4).sum
      val denU = rows.map(r => r._3 * (N - r._4)).sum
      val all = rows.map(_._3).sum
      def m(sel: ((Boolean, Boolean, BigInt, BigInt)) => Boolean) =
        (rows.filter(sel).map(r => r._3 * r._4).sum * N) /
          den.max(BigInt(1))
      def u(sel: ((Boolean, Boolean, BigInt, BigInt)) => Boolean) =
        (rows.filter(sel).map(r => r._3 * (N - r._4)).sum * N) /
          denU.max(BigInt(1))
      val (p1, mn1, mc1, un1, uc1) =
        (den / all, m(_._1), m(_._2), u(_._1), u(_._2))
      p = p1; mn = mn1; mc = mc1; un = un1; uc = uc1
    }
    val expect = pats.map { case ((gn, gc), n, nt) =>
      (gn, gc, n, nt, gOf(gn, gc).toDouble / 1e9) }
      .sortBy(e => (e._1, e._2))
    assert(got == expect)
    val post = got.map(g => (g._1, g._2) -> g._5).toMap
    assert(post((true, true)) > 0.9, "all-agree links")
    assert(post((false, false)) < 0.1, "all-disagree stays apart")
  }

  test("fellegiSunter: blocking excludes cross-block pairs even when " +
      "every field agrees, and the default threshold keeps links only") {
    val a = Seq((1L, "b1", "sam"), (2L, "b2", "sam"))
      .toDF("rec_id", "block", "name")
    val b = Seq((1L, "b1", "sam"), (2L, "b2", "sam"))
      .toDF("rec_id", "block", "name")
    val got = Linkage.fellegiSunter(a, b, "rec_id", "block", Seq("name"),
        threshold = Double.NegativeInfinity)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // (1,2)/(2,1) agree on name but live in different blocks
    assert(got == Set((1L, 1L), (2L, 2L)))
  }

  test("blockingRecall: per-pass reach, OR-union recall and " +
      "inclusion-exclusion candidate volumes match the hand count") {
    // 4 true pairs; k1 broken for ids 3,4 (band crossed), k2 broken for
    // id 4 only → single-pass recalls 2/4 and 3/4, union 3/4
    val a = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "y", "r"),
      (4L, "z", "s")).toDF("rec_id", "k1", "k2")
    val b = Seq((1L, "x", "p"), (2L, "x", "q"), (3L, "Y", "r"),
      (4L, "Z", "S")).toDF("rec_id", "k1", "k2")
    val got = Linkage.blockingRecall(a, b, "rec_id", Seq("k1", "k2"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSeq
    // volumes: k1 'x' has 2×2=4 candidates; k2 matches p,q,r → 3;
    // both-keys join: (x,p),(x,q) → 2; union = 4+3-2 = 5 (of 16 naive)
    assert(got == Seq(
      ("k1", 4L, 2L, 0.5, 4L),
      ("k2", 4L, 3L, 0.75, 3L),
      ("multi_pass", 4L, 3L, 0.75, 5L)))
  }

  test("fellegiSunterMulti: the union of passes reaches a true pair " +
      "either single pass misses, and shared candidates dedup") {
    // true pair id=1: k1 corrupted (differs), k2 agrees; id=2: k2
    // corrupted, k1 agrees; id=3: both agree (in BOTH passes — must
    // appear once). Fields: name agrees on all true pairs.
    val a = Seq((1L, "x1", "y1", "ann"), (2L, "x2", "y2", "bob"),
      (3L, "x3", "y3", "eve")).toDF("rec_id", "k1", "k2", "name")
    val b = Seq((1L, "XX", "y1", "ann"), (2L, "x2", "YY", "bob"),
      (3L, "x3", "y3", "eve")).toDF("rec_id", "k1", "k2", "name")
    val multi = Linkage.fellegiSunterMulti(a, b, "rec_id",
        Seq("k1", "k2"), Seq("name"), Double.NegativeInfinity)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // every true pair reachable exactly once; no cross-id candidates
    // (names all differ across ids, but blocks differ too)
    assert(multi.sorted == Seq((1L, 1L), (2L, 2L), (3L, 3L)),
      multi.toString)
    // single-pass k1 misses pair 1; single-pass k2 misses pair 2
    val p1 = Linkage.fellegiSunter(a, b, "rec_id", "k1", Seq("name"),
      Double.NegativeInfinity).collect().map(_.getLong(0)).toSet
    val p2 = Linkage.fellegiSunter(a, b, "rec_id", "k2", Seq("name"),
      Double.NegativeInfinity).collect().map(_.getLong(0)).toSet
    assert(!p1.contains(1L) && p1.contains(2L))
    assert(p2.contains(1L) && !p2.contains(2L))
  }

  test("fellegiSunterMultiU: pairs score under their OWN pass's u — " +
      "min-pass assignment, an all-match pass rides the Laplace floor " +
      "instead of inheriting the other pass's non-match population") {
    val a = Seq((1L, "A", "p", "sam"), (2L, "A", "q", "ann"),
        (3L, "B", "r", "joe"))
      .toDF("rec_id", "b1", "b2", "name")
    val b = Seq((1L, "A", "p", "sam"), (2L, "A", "q", "ann"),
        (3L, "C", "r", "joe")) // pass b1 misses (3,3); b2 reaches it
      .toDF("rec_id", "b1", "b2", "name")
    val got = Linkage.fellegiSunterMultiU(a, b, "rec_id", Seq("b1", "b2"),
        Seq("name"), threshold = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(4))).sortBy(x => (x._1, x._2))
    // m = (3+1)/(3+2) = 0.8; pass b1 non-matches (1,2)/(2,1) disagree →
    // u = (0+1)/(2+2) = 0.25; pass b2 has NO non-match candidates →
    // u = Laplace (0+1)/(0+2) = 0.5
    def lg2(x: Double) = BigDecimal(math.log(x) / math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w1 = lg2(0.8 / 0.25); val w2 = lg2(0.8 / 0.5)
    assert(got.toSeq == Seq((1L, 1L, "b1", w1), (2L, 2L, "b1", w1),
      (3L, 3L, "b2", w2)), got.mkString(", "))
    // (1,1) is reachable through BOTH passes and lands on the FIRST
    assert(got.head._3 == "b1")
  }

  test("fellegiSunter: an empty labeled seed fails loudly instead of " +
      "silently fitting the Laplace-0.5 m model") {
    // disjoint id sets: the id-join true-pair sample is EMPTY, so
    // m-estimation has nothing to learn from — (0+1)/(0+2) = 0.5 per
    // field would score every pair with a meaningless model
    val a = Seq((1L, "b1", "sam"), (2L, "b1", "ann"))
      .toDF("rec_id", "block", "name")
    val b = Seq((11L, "b1", "sam"), (12L, "b1", "ann"))
      .toDF("rec_id", "block", "name")
    val ex = intercept[Exception] {
      Linkage.fellegiSunter(a, b, "rec_id", "block", Seq("name"),
        threshold = Double.NegativeInfinity).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("minSeed")), msgs(ex).mkString(" | "))
    // a seed meeting minSeed still fits (the happy path is unchanged)
    val okA = Seq((1L, "b1", "sam"), (2L, "b1", "ann"))
      .toDF("rec_id", "block", "name")
    val okB = Seq((1L, "b1", "sam"), (2L, "b1", "ann"))
      .toDF("rec_id", "block", "name")
    assert(Linkage.fellegiSunter(okA, okB, "rec_id", "block", Seq("name"),
      threshold = Double.NegativeInfinity).count() == 4L)
  }
}
