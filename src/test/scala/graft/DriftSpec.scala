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
}
