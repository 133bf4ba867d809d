package graft

import graft.ops.{Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure-SQL surface: a user who only speaks `spark.sql` over
  * registered temp views — no Scala DataFrame API — gets the same library:
  * the injected Catalyst functions resolve by name, and SQL text
  * reproduces the Column-API operators bit-for-bit.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("injected functions resolve from SQL text and match the Column API") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(4.0f, 5.0f, 6.0f))
    ).toDF("vec_id", "embedding")
    emb.createOrReplaceTempView("sql_emb")
    val viaSql = spark.sql(
      """SELECT a.vec_id AS ia, b.vec_id AS ib,
        |  graft_dot(CAST(a.embedding AS ARRAY<DOUBLE>),
        |            CAST(b.embedding AS ARRAY<DOUBLE>)) AS d
        |FROM sql_emb a JOIN sql_emb b ON a.vec_id < b.vec_id""".stripMargin)
      .collect()(0).getAs[Double]("d")
    val viaApi = emb.filter(col("vec_id") === 0L).crossJoin(
        emb.filter(col("vec_id") === 1L).select(col("embedding").as("e2")))
      .select(Similarity.dot(col("embedding"), col("e2")).as("d"))
      .collect()(0).getAs[Double]("d")
    assert(viaSql == viaApi && viaSql == 32.0) // 4 + 10 + 18

    val docs = Seq((1L, "a b c d"), (2L, "b c d e")).toDF("doc_id", "text")
    docs.createOrReplaceTempView("sql_docs")
    val sh = spark.sql(
      "SELECT doc_id, graft_simhash(text) AS sh FROM sql_docs ORDER BY doc_id")
      .collect().map(_.getAs[Long]("sh"))
    val shApi = Dedup.simhash(docs, "doc_id", "text")
      .orderBy("id").collect().map(_.getAs[Long]("simhash"))
    assert(sh.toSeq == shApi.toSeq)

    val inter = spark.sql(
      """SELECT graft_sorted_intersect(
        |  array_sort(transform(graft_ngram_hashes(a.text, 1), x -> x.ha)),
        |  array_sort(transform(graft_ngram_hashes(b.text, 1), x -> x.ha)))
        |  AS c
        |FROM sql_docs a JOIN sql_docs b ON a.doc_id < b.doc_id""".stripMargin)
      .collect()(0).getAs[Long]("c")
    assert(inter == 3L) // shared unigrams: b, c, d

    // graft_bpe_word: (a,b) rank 0 then (ab,a) rank 1 — "abab" needs
    // round 1 (ab ab) only; "ababa" reaches (ab)(ab)a then (ab,a)
    // cannot fire on the LEFT ab (its right neighbor is ab, not a)
    val bpe = spark.sql(
      """SELECT graft_bpe_word('ababa',
        |  concat('a', char(1), 'b', char(2), 'ab', char(1), 'a'),
        |  3) AS s""".stripMargin)
      .collect()(0).getAs[scala.collection.Seq[String]]("s")
    assert(bpe.toSeq == Seq("ab", "aba"))

    // the learner's kernels: adjacent pairs + one single-pair merge pass
    val pairsAndApply = spark.sql(
      """SELECT graft_bpe_pairs(array('a','b','a')) AS p,
        |  graft_bpe_apply(array('a','a','a'), 'a', 'a') AS m""".stripMargin)
      .collect()(0)
    assert(pairsAndApply.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("p")
      .map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("b", "a")))
    assert(pairsAndApply.getAs[scala.collection.Seq[String]]("m").toSeq ==
      Seq("aa", "a"))

    // graft_unigram_segment: 'ab' (1.0 bits) beats 'a'+'b' (1+1.5 bits)
    val seg = spark.sql(
      """SELECT graft_unigram_segment('abb',
        |  concat('a', char(1), '1000000000', char(2),
        |         'b', char(1), '1500000000', char(2),
        |         'ab', char(1), '1000000000'),
        |  2) AS s""".stripMargin)
      .collect()(0).getAs[scala.collection.Seq[String]]("s")
    assert(seg.toSeq == Seq("ab", "b"))

    // graft_pq_assign: 2 subspaces × 2 centroids over 4 dims; vector
    // halves sit exactly on centroid 1 of sub 0 and centroid 0 of sub 1
    // (codebook layout [sub][cid][dim] in shifted nano units, 0.0 ↦
    // 8e9, 1.0 ↦ 9e9)
    val e9 = 8000000000L
    val n1 = 9000000000L
    val cbLit = Seq(e9, e9, n1, n1, e9, n1, n1, e9)
      .mkString("'", ",", "'")
    val codes = spark.sql(
      s"""SELECT graft_pq_assign(CAST(array(1.0D, 1.0D, 0.0D, 1.0D)
         |  AS ARRAY<DOUBLE>), $cbLit, 2, 2) AS c""".stripMargin)
      .collect()(0).getAs[scala.collection.Seq[Int]]("c")
    assert(codes.toSeq == Seq(1, 0))

    // graft_wordpiece_word: the canonical BERT split from SQL text
    val wp = spark.sql(
      """SELECT graft_wordpiece_word('unaffable',
        |  concat('un', char(2), '##aff', char(2), '##able'),
        |  5, '[UNK]') AS p""".stripMargin)
      .collect()(0).getAs[scala.collection.Seq[String]]("p")
    assert(wp.toSeq == Seq("un", "##aff", "##able"))

    // graft_deflate_len: repetitive text compresses below its length,
    // and the length is a stable function of the input
    val dl = spark.sql(
      """SELECT graft_deflate_len(repeat('spam ', 200), 6) AS a,
        |  graft_deflate_len(repeat('spam ', 200), 6) AS b""".stripMargin)
      .collect()(0)
    assert(dl.getAs[Long]("a") == dl.getAs[Long]("b"))
    assert(dl.getAs[Long]("a") < 100L) // 1000 bytes of boilerplate

    // graft_dtw: identical series at distance 0; the band is a literal
    val dt = spark.sql(
      """SELECT graft_dtw(array(1L, 5L, 2L), array(1L, 5L, 2L), -1) AS z,
        |  graft_dtw(array(0L, 9L, 0L), array(9L, 0L, 0L), 1) AS w"""
        .stripMargin).collect()(0)
    assert(dt.getAs[Long]("z") == 0L)
    assert(dt.getAs[Long]("w") == 9L) // warp aligns the shifted pulse
  }

  test("a full operator expressed as SQL over views matches the API version") {
    val ev = (1 to 100).map { i =>
      (i.toLong % 10, i.toLong, if (i % 3 == 0) "click" else "view")
    }.toDF("user_id", "event_id", "event_type")
    ev.createOrReplaceTempView("sql_events")
    val viaSql = spark.sql(
      """SELECT user_id, count(*) AS n,
        |  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
        |FROM sql_events GROUP BY user_id ORDER BY user_id""".stripMargin)
    val viaApi = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L))
          .as("clicks"))
      .orderBy("user_id")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
  }
}
