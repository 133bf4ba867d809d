package graft

import graft.ops.Pq
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val DimT = 8
  private val MT = 2
  private val KT = 4

  /** 40 deterministic vectors in 4 loose clusters around ±0.5 corners. */
  private def fixture = (0 until 40).map { i =>
    val c = i % 4
    val base = Array.tabulate(DimT) { d =>
      (if (((c >> (d % 2)) & 1) == 1) 0.5 else -0.5) +
        ((i * 31 + d * 17) % 100 - 50) / 1000.0
    }
    (i.toLong, base)
  }.toDF("vec_id", "embedding")

  private def quantize(x: Double): Long =
    (BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP) *
      1000000000L).toLongExact + 8000000000L

  test("codebook shape, code range, and encode optimality vs brute force") {
    val emb = fixture
    val cb = Pq.pqFit(emb, "vec_id", "embedding", DimT, MT, KT, rounds = 2)
      .as[(Long, Long, Long, Long)].collect() // (sub, cid, dim, cn)
    assert(cb.length == MT * KT * (DimT / MT))
    assert(cb.map(_._1).distinct.sorted.toSeq == (0L until MT).toSeq)
    assert(cb.map(_._2).distinct.sorted.toSeq == (0L until KT).toSeq)
    val cents = cb.groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4)).toMap
    val cbDf = Pq.pqFit(emb, "vec_id", "embedding", DimT, MT, KT, 2)
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", DimT, MT, cbDf)
      .as[(Long, Long, Long)].collect()
    assert(codes.length == 40 * MT)
    assert(codes.forall(c => c._3 >= 0 && c._3 < KT))
    // every assignment is the true argmin (distance, cid) over the
    // codebook, in the same shifted nano-unit integer space
    val vecs = fixture.as[(Long, Array[Double])].collect().toMap
    codes.foreach { case (id, sub, code) =>
      val subVec = vecs(id).slice((sub * (DimT / MT)).toInt,
        ((sub + 1) * (DimT / MT)).toInt).map(quantize)
      val best = (0 until KT).map { cid =>
        val c = cents((sub, cid.toLong))
        val d = subVec.zip(c).map { case (a, b) =>
          BigInt(a - b) * BigInt(a - b) }.sum
        (d, cid.toLong)
      }.min
      assert(best._2 == code, s"id=$id sub=$sub")
    }
  }

  test("ADC score identity: summed table lookups == per-sub distances to " +
      "assigned centroids; fit is partition-invariant") {
    val emb = fixture
    val scores = Pq.pqAdcScores(emb, "vec_id", "embedding", 3L, DimT, MT,
      KT, 2).as[(Long, Double)].collect().toMap
    assert(scores.size == 40)
    val cb = Pq.pqFit(emb, "vec_id", "embedding", DimT, MT, KT, 2)
    val cents = cb.as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4)).toMap
    val codes = Pq.pqEncode(emb, "vec_id", "embedding", DimT, MT, cb)
      .as[(Long, Long, Long)].collect()
    val vecs = fixture.as[(Long, Array[Double])].collect().toMap
    val qSubs = (0 until MT).map(s =>
      vecs(3L).slice(s * (DimT / MT), (s + 1) * (DimT / MT)).map(quantize))
    codes.groupBy(_._1).foreach { case (id, cs) =>
      val attos = cs.map { case (_, sub, code) =>
        qSubs(sub.toInt).zip(cents((sub, code))).map { case (a, b) =>
          BigInt(a - b) * BigInt(a - b) }.sum
      }.sum
      val expected = attos.toDouble / 1e18
      assert(scores(id) == expected, s"id=$id")
    }
    // partition invariance: integer arithmetic can't see the layout
    val re = Pq.pqFit(emb.repartition(13), "vec_id", "embedding", DimT, MT,
      KT, 2).as[(Long, Long, Long, Long)].collect().toSet
    assert(re == cb.as[(Long, Long, Long, Long)].collect().toSet)
  }

  test("IVFADC: returned rows sit in the query's probed cells only, and " +
      "each adc_dist is the exact summed per-cell ADC lookup of that " +
      "row's codes") {
    val emb = fixture
    val anchors = Array(Array.fill(DimT)(0.5), Array.fill(DimT)(-0.5))
    val nProbe = 1
    val out = Pq.ivfAdcTopK(emb, "vec_id", "embedding", anchors, 7L,
      DimT, MT, KT, rounds = 2, nProbe, topK = 10)
      .as[(Long, Int, Double)].collect()
    assert(out.nonEmpty && out.length <= 10)
    // driver-side truth: cells, probed set, residual fit replay
    val vecs = fixture.as[(Long, Array[Double])].collect().toMap
    def cellOf(v: Array[Double]): Int =
      anchors.indices.minBy { c =>
        val a = anchors(c)
        a.map(x => x * x).sum -
          2.0 * v.zip(a).map { case (x, y) => x * y }.sum
      }
    val qCell = cellOf(vecs(7L))
    assert(out.forall(_._2 == qCell), "rows outside the probed cell")
    // residual relation replay through the library's own fit/encode
    val residDf = fixture.as[(Long, Array[Double])]
      .map { case (id, v) =>
        val a = anchors(cellOf(v))
        (id, v.zip(a).map { case (x, y) => x - y })
      }.toDF("vec_id", "rvec")
    val cb = Pq.pqFit(residDf, "vec_id", "rvec", DimT, MT, KT, 2)
    val cents = cb.as[(Long, Long, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.sortBy(_._3).map(_._4)).toMap
    val codes = Pq.pqEncode(residDf, "vec_id", "rvec", DimT, MT, cb)
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    val qResid = vecs(7L).zip(anchors(qCell)).map { case (x, y) => x - y }
    val qSubs = (0 until MT).map(s =>
      qResid.slice(s * (DimT / MT), (s + 1) * (DimT / MT)).map(quantize))
    out.foreach { case (id, _, adcDist) =>
      val attos = codes(id).map { case (_, sub, code) =>
        qSubs(sub.toInt).zip(cents((sub, code))).map { case (a, b) =>
          BigInt(a - b) * BigInt(a - b) }.sum
      }.sum
      assert(adcDist == attos.toDouble / 1e18, s"id=$id")
    }
  }

  test("rerank funnel: with candidates == corpus the funnel equals the " +
      "exact top-k; recall audit shape holds") {
    val emb = fixture
    val scores = Pq.pqAdcScores(emb, "vec_id", "embedding", 0L, DimT, MT,
      KT, 2).localCheckpoint()
    val full = Pq.pqRerankTopK(scores, emb, "vec_id", "embedding", 0L,
      DimT, candidates = 40, topK = 5).as[(Long, Double)].collect()
    val exact = Pq.exactL2TopK(emb, "vec_id", "embedding", 0L, DimT, 5)
      .as[(Long, Double)].collect()
    assert(full.toSeq == exact.toSeq)
    assert(exact.head._1 == 0L && exact.head._2 == 0.0) // self-match first
  }
}
