package graft

import graft.ops.Drift
import org.scalatest.funsuite.AnyFunSuite

class DriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("identical distributions score ~zero PSI") {
    val a = (1 to 1000).map(_.toDouble).toDF("v")
    val psi = Drift.psi(a, a, "v", buckets = 10)
      .select("psi").as[Double].head()
    assert(math.abs(psi) < 1e-9, psi)
  }

  test("shifted distribution scores large PSI; buckets decompose it") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val shifted = (1 to 1000).map(i => i.toDouble + 900).toDF("v")
    val psi = Drift.psi(base, shifted, "v").select("psi").as[Double].head()
    assert(psi > 0.25, psi) // major-shift threshold
    val bk = Drift.psiBuckets(base, shifted, "v").collect()
    assert(bk.map(_.getAs[Double]("contribution")).sum > 0.25)
    // shifted mass concentrates in the top bucket
    val top = bk.maxBy(_.getAs[Long]("bucket"))
    assert(top.getAs[Long]("n_cur") > top.getAs[Long]("n_base"))
  }

  test("moderate shift lands between thresholds") {
    val base = (1 to 1000).map(_.toDouble).toDF("v")
    val mild = (1 to 1000).map(i => i.toDouble * 1.15).toDF("v")
    val psi = Drift.psi(base, mild, "v").select("psi").as[Double].head()
    assert(psi > 0.0 && psi < 0.25, psi)
  }

  test("tvDistance: hand case, tv repeated on every row, disjoint " +
      "supports give tv = 1") {
    // a: {x,x,y}, b: {x,y,y} → |Δp| = 1/3 each, tv = 1/3
    val df = Seq(("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "y"), ("b", "y")).toDF("g", "cat")
    val rows = Drift.tvDistance(df, "cat", "g", "a", "b")
      .orderBy("category").collect()
    assert(rows.map(_.getAs[String]("category")).toSeq == Seq("x", "y"))
    assert(rows.forall(_.getAs[Double]("tv") == 0.333333333))
    assert(rows(0).getAs[Double]("p_a") == 0.666666667)
    assert(rows(0).getAs[Double]("p_b") == 0.333333333)
    assert(rows(0).getAs[Double]("abs_diff") == 0.333333333)
    // disjoint categories → maximal drift
    val dis = Seq(("a", "x"), ("b", "y")).toDF("g", "cat")
    assert(Drift.tvDistance(dis, "cat", "g", "a", "b")
      .collect().forall(_.getAs[Double]("tv") == 1.0))
  }

  test("wasserstein1: pure shift = the shift size; identical samples = 0; " +
      "units follow the value column") {
    // a = {1,2,3}, b = {2,3,4}: W1 of a unit shift is exactly 1.0
    val rows = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 2.0), ("b", 3.0), ("b", 4.0))
    val df = rows.toDF("g", "v")
    val r = Drift.wasserstein1(df, "v", "g", "a", "b").collect()(0)
    assert(r.getAs[Long]("n_a") == 3 && r.getAs[Long]("n_b") == 3)
    assert(r.getAs[Double]("w1") == 1.0)
    val same = Seq(("a", 5.0), ("a", 7.5), ("b", 5.0), ("b", 7.5))
      .toDF("g", "v")
    assert(Drift.wasserstein1(same, "v", "g", "a", "b")
      .collect()(0).getAs[Double]("w1") == 0.0)
    // unequal sizes: a = {0,0}, b = {1} → |F_a − F_b| = 1 on [0,1) → W1 = 1
    val uneq = Seq(("a", 0.0), ("a", 0.0), ("b", 1.0)).toDF("g", "v")
    assert(Drift.wasserstein1(uneq, "v", "g", "a", "b")
      .collect()(0).getAs[Double]("w1") == 1.0)
  }

  test("hellingerDistance: disjoint supports hit BC=0/H=1 exactly; " +
      "identical distributions land within truncation of BC=1; hand " +
      "fixture matches the floor-quantized scalar") {
    val disj = (Seq.fill(5)(("a", "x")) ++ Seq.fill(7)(("b", "y")))
      .toDF("g", "cat")
    val gd = Drift.hellingerDistance(disj, "cat", "g", "a", "b")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(gd == ((5L, 7L, 2L, 0.0, 1.0)))

    val same = (1 to 40).flatMap(i =>
      Seq(("a", s"c${i % 4}"), ("b", s"c${i % 4}"))).toDF("g", "cat")
    val gs = Drift.hellingerDistance(same, "cat", "g", "a", "b")
      .as[(Long, Long, Long, Double, Double)].head()
    assert(gs._4 > 1.0 - 4e-9 && gs._4 <= 1.0)
    assert(gs._5 < 1e-4)

    // 2 categories: a = (3,1)/4, b = (1,3)/4
    val mix = (Seq.fill(3)(("a", "x")) ++ Seq(("a", "y")) ++
      Seq(("b", "x")) ++ Seq.fill(3)(("b", "y"))).toDF("g", "cat")
    val gm = Drift.hellingerDistance(mix, "cat", "g", "a", "b")
      .as[(Long, Long, Long, Double, Double)].head()
    def cn(ca: Long, cb: Long): Long =
      math.floor(math.sqrt((ca * cb).toDouble / 16.0) * 1.0e9).toLong
    val bcn = cn(3, 1) + cn(1, 3)
    assert(gm._4 == bcn.toDouble / 1.0e9)
    assert(gm._5 == math.sqrt(math.max(1.0 - bcn.toDouble / 1.0e9, 0.0)))
  }
}
