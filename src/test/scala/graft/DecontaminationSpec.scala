package graft

import graft.ops.Decontamination
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DecontaminationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // eval doc shares its full text with train doc 1; doc 2 half-overlaps;
  // doc 3 is disjoint; doc 4 is too short for a 3-gram
  private lazy val train = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown cat sleeps all day long"),
    (3L, "completely different words here"),
    (4L, "too short")
  ).toDF("doc_id", "text")
  private lazy val eval_ = Seq((100L, "the quick brown fox jumps"))
    .toDF("doc_id", "text")

  test("overlapStats: exact copy scores 1.0, disjoint 0.0, short exempt") {
    val out = Decontamination.overlapStats(train, eval_, "doc_id", "text", 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L)) // doc 4 has no 3-grams
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == 1.0)
    // doc 2 grams: 6 total, shares "the quick brown" only → 1/6
    assert(byId(2L)._2 == 6L && byId(2L)._3 == 1L)
    assert(byId(3L)._3 == 0L && byId(3L)._4 == 0.0)
  }

  test("decontaminate: flagged ∪ survivors = docs, threshold strict-below") {
    val surv = Decontamination.decontaminate(train, eval_, "doc_id", "text",
      3, 0.5)
    val ids = surv.select("doc_id").as[Long].collect().toSet
    // doc 1 (1.0 ≥ 0.5) dropped; doc 2 (1/6), doc 3 (0), doc 4 (exempt) kept
    assert(ids == Set(2L, 3L, 4L))
    assert(surv.columns.toSeq == train.columns.toSeq)
  }

  test("decontaminate: empty eval set keeps everything") {
    val surv = Decontamination.decontaminate(train,
      eval_.filter(lit(false)), "doc_id", "text", 3, 0.1)
    assert(surv.count() == train.count())
  }

  test("semanticContamination: hand-computed cosines, argmax picks the " +
      "smallest eval id on ties, sub-threshold training items absent") {
    val spark2 = spark
    import spark2.implicits._
    val tr = Seq(
      (1L, Array(1.0, 0.0)),  // cos 1.0 vs e10, 0.0 vs e20
      (2L, Array(0.6, 0.8)),  // cos 0.6 vs e10, 0.8 vs e20
      (3L, Array(1.0, 1.0)),  // cos 1/√2 ≈ 0.707107 vs BOTH (tie)
      (4L, Array(-1.0, 0.0))) // below threshold everywhere
      .toDF("vec_id", "embedding")
    val ev = Seq((10L, Array(1.0, 0.0)), (20L, Array(0.0, 1.0)))
      .toDF("vec_id", "embedding")
    val out = Decontamination
      .semanticContamination(tr, ev, "vec_id", "embedding", 0.7)
      .orderBy("train_id")
      .as[(Long, Long, Double, Long)].collect()
    val tie = BigDecimal(1.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.toSeq == Seq(
      (1L, 10L, 1.0, 1L),
      (2L, 20L, 0.8, 1L),
      (3L, 10L, tie, 2L)), out.mkString(", "))
  }
}
