package graft

import graft.ops.Prep
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("tfidf: term in every document gets idf weight exactly 1") {
    val docs = Seq((0L, "a b"), (1L, "a c"), (2L, "a a d")).toDF("id", "text")
    val out = Prep.tfidf(docs, "id", "text")
      .select("term", "tf", "df", "tfidf")
      .as[(String, Long, Long, Double)].collect()
    // 'a' is in all 3 docs: ln((1+3)/(1+3)) + 1 = 1 → tfidf == tf
    assert(out.filter(_._1 == "a").forall(r => r._4 == r._2.toDouble))
    // tf counts occurrences, df counts documents
    assert(out.find(r => r._1 == "a" && r._2 == 2L).exists(_._3 == 3L))
  }

  test("standardize: z-scores sum to ~0 per group, minmax spans [0,1]") {
    val out = Prep.standardize(Tables.customer(spark, dir), "c_acctbal",
        Seq("c_mktsegment"))
      .groupBy("c_mktsegment")
      .agg(sum("z").as("zsum"), min("minmax").as("lo"), max("minmax").as("hi"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Double, Long)].collect()
    assert(out.nonEmpty)
    out.foreach { case (seg, zsum, lo, hi, n) =>
      assert(math.abs(zsum) < 1e-3, s"$seg z-sum $zsum (n=$n)")
      assert(lo == 0.0 && hi == 1.0, s"$seg minmax range [$lo,$hi]")
    }
  }

  test("featureHash: buckets bounded, repeated runs identical") {
    val ev = Tables.events(spark, dir)
    val feat = concat(col("event_type"), lit("="),
      coalesce(col("props"), lit("")))
    val a = Prep.featureHash(ev, Seq("user_id"), feat, 8)
      .orderBy("user_id", "bucket").collect()
    val b = Prep.featureHash(ev.repartition(7), Seq("user_id"), feat, 8)
      .orderBy("user_id", "bucket").collect()
    assert(a.nonEmpty && a.sameElements(b))
    assert(a.forall { r =>
      val bk = r.getLong(r.fieldIndex("bucket")); bk >= 0 && bk < 8 })
  }

  test("groupSplit: every key lands in exactly one split, fractions sane") {
    val out = Prep.groupSplit(Tables.events(spark, dir), "user_id", 80, 10)
    val perUser = out.groupBy("user_id")
      .agg(countDistinct(col("split")).as("nsplits"))
      .agg(max("nsplits")).as[Long].head()
    assert(perUser == 1L)
    val counts = out.select("user_id", "split").distinct()
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = counts.values.sum.toDouble
    // loose: hash is uniform-ish, 80/10/10 within wide tolerance
    assert(counts("train") / total > 0.6)
    assert(counts.getOrElse("val", 0L) / total < 0.25)
  }

  test("packSequences: docs start inside their pack's budget window, " +
    "packs partition all tokens") {
    val budget = 100
    val out = Prep.packSequences(Tables.documents(spark, dir), "doc_id",
      "text", "source", budget)
    val bad = out.filter(col("start_offset") < col("pack") * budget ||
      col("start_offset") >= (col("pack") + 1) * budget).count()
    assert(bad == 0L)
    val totalToks = out.agg(sum("n_tokens")).as[Long].head()
    val viaPacks = out.groupBy("source", "pack").agg(sum("n_tokens").as("t"))
      .agg(sum("t")).as[Long].head()
    assert(totalToks == viaPacks && totalToks > 0L)
  }

  test("mixtureSample: kept is a deterministic subset honoring weights") {
    val docs = Tables.documents(spark, dir)
    val w = Map("src0" -> 1.0)
    val kept = Prep.mixtureSample(docs, "doc_id", "source", w, 0.0)
    // weight 1.0 keeps all of src0; weight 0.0 drops everything else
    assert(kept.filter(col("source") =!= "src0").count() == 0L)
    assert(kept.count() == docs.filter(col("source") === "src0").count())
    val again = Prep.mixtureSample(docs.repartition(5), "doc_id", "source",
      w, 0.0)
    assert(again.count() == kept.count())
  }
}
