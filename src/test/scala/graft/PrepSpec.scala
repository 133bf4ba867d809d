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

  test("tfidf: broadcastDf knob drops the df hint, results identical") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val docs = Tables.documents(spark, dir)
    def nHints(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.analyzed.collect { case h: ResolvedHint => h }.size
    val fast = Prep.tfidf(docs, "doc_id", "text", broadcastDf = true)
    val scale = Prep.tfidf(docs, "doc_id", "text", broadcastDf = false)
    // fast path: df broadcast + the 1-row N broadcast; scale path keeps only
    // the 1-row N — the vocabulary-sized relation carries NO structural hint,
    // so an unbounded vocabulary can never hit the broadcast cap
    assert(nHints(fast) == 2, s"fast-path hints: ${nHints(fast)}")
    assert(nHints(scale) == 1, s"scale-path hints: ${nHints(scale)}")
    val a = fast.orderBy("doc_id", "term").collect()
    val b = scale.orderBy("doc_id", "term").collect()
    assert(a.nonEmpty && a.sameElements(b))
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

  test("stratifiedSample: exactly ceil(f*n) rows per stratum, " +
    "partitioning-independent") {
    val orders = Tables.orders(spark, dir)
    val expected = orders.groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    val kept = Prep.stratifiedSample(orders, Seq("o_orderstatus"),
        "o_orderkey", 0.3)
      .groupBy("o_orderstatus").count()
      .as[(String, Long)].collect().toMap
    assert(kept.keySet == expected.keySet)
    kept.foreach { case (st, n) =>
      assert(n == math.ceil(expected(st) * 0.3).toLong, s"stratum $st")
    }
    val again = Prep.stratifiedSample(orders.repartition(7),
        Seq("o_orderstatus"), "o_orderkey", 0.3)
      .orderBy("o_orderkey").select("o_orderkey").as[Long].collect()
    val first = Prep.stratifiedSample(orders, Seq("o_orderstatus"),
        "o_orderkey", 0.3)
      .orderBy("o_orderkey").select("o_orderkey").as[Long].collect()
    assert(first.nonEmpty && first.sameElements(again))
  }

  test("stratifiedSample: one giant hot stratum stays exact and salted") {
    // every row in ONE stratum — the case the two-phase salt exists for
    val orders = Tables.orders(spark, dir).withColumn("st", lit("hot"))
    val n = orders.count()
    val kept = Prep.stratifiedSample(orders, Seq("st"), "o_orderkey", 0.3)
    assert(kept.count() == math.ceil(n * 0.3).toLong)
    // sample_rank is exactly the dense prefix 1..⌈0.3n⌉ — the salted merge
    // reconstructs the global per-stratum rank with no gaps or dups
    val ranks = kept.select("sample_rank").as[Long].collect().sorted
    assert(ranks.head == 1L && ranks.last == ranks.length.toLong &&
      ranks.distinct.length == ranks.length)
    // and the kept KEYS equal the single-window reference (smallest md5s)
    val ref = orders.orderBy(md5(col("o_orderkey").cast("string")),
        col("o_orderkey"))
      .limit(math.ceil(n * 0.3).toInt)
      .select("o_orderkey").as[Long].collect().toSet
    val got = kept.select("o_orderkey").as[Long].collect().toSet
    assert(got == ref)
    // the data-sized window must partition by (stratum, salt), never by the
    // stratum alone
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("histogram: bins bounded, counts and totals partition the input") {
    val li = Tables.lineitem(spark, dir)
    val h = Prep.histogram(li, "l_extendedprice", 10)
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(h.forall { case (b, lo, hi, _, _) => b >= 0 && b < 10 && lo < hi })
    assert(h.map(_._4).sum == li.count())
    val exact = li.agg(sum(col("l_extendedprice").cast("decimal(18,2)")))
      .head().getDecimal(0).doubleValue()
    assert(math.abs(h.map(_._5).sum - exact) < 1e-4)
  }

  test("histogram: degenerate single-value column lands all rows in bin 0") {
    val one = Seq(5.0, 5.0, 5.0).toDF("x")
    val h = Prep.histogram(one, "x", 10)
      .as[(Long, Double, Double, Long, Double)].collect()
    assert(h.length == 1 && h.head._1 == 0L && h.head._4 == 3L)
  }

  test("chunkText: chunks tile tokens with stride overlap, tail shorter") {
    val docs = Seq((1L, "a b c d e f g"), (2L, ""), (3L, "x")).toDF("id", "t")
    val out = Prep.chunkText(docs, "id", "t", 4, 3)
      .as[(Long, Long, Long, Long, String)].collect().sortBy(r => (r._1, r._2))
    // doc 1 (7 toks): starts 0,3,6 → chunks of 4,4,1; doc 2: none; doc 3: one
    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 0L, 4L), (1L, 3L, 4L), (2L, 6L, 1L)))
    assert(d1.map(_._5).toSeq == Seq("a b c d", "d e f g", "g"))
    assert(!out.exists(_._1 == 2L))
    assert(out.filter(_._1 == 3L).map(_._5).toSeq == Seq("x"))
  }

  test("redactPii: replaces email/phone/ip, counts on original text") {
    val d = Seq(
      (1L, "mail a@b.com and c.d-e@f.org, call 555-123-4567 from 10.0.0.1"),
      (2L, "no pii here"),
      (3L, "two ips 192.168.0.1 1.2.3.4")).toDF("id", "text")
    val m = Prep.redactPii(d, "text").collect()
      .map(r => r.getAs[Long]("id") -> ((r.getAs[String]("redacted"),
        r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
        r.getAs[Long]("n_ips")))).toMap
    assert(m(1L) == (("mail [EMAIL] and [EMAIL], call [PHONE] from [IP]",
      2L, 1L, 1L)))
    assert(m(2L) == (("no pii here", 0L, 0L, 0L)))
    assert(m(3L) == (("two ips [IP] [IP]", 0L, 0L, 2L)))
  }

  test("sessionize: gap splits sessions, deterministic under ts ties") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val d = Seq(
      (1L, 10L, ts(0)), (1L, 11L, ts(100)),   // session 1
      (1L, 12L, ts(100)),                      // tie → same session, by id
      (1L, 13L, ts(4000)),                     // gap 3900 > 3600 → session 2
      (2L, 20L, ts(0))                         // other user: own session 1
    ).toDF("uid", "eid", "t")
    val m = Prep.sessionize(d, "uid", "t", "eid", 3600L).collect()
      .map(r => (r.getAs[Long]("uid"), r.getAs[Long]("eid")) ->
        r.getAs[Long]("session_idx")).toMap
    assert(m((1L, 10L)) == 1L && m((1L, 11L)) == 1L && m((1L, 12L)) == 1L)
    assert(m((1L, 13L)) == 2L)
    assert(m((2L, 20L)) == 1L)
    // boundary: gap exactly == gapSeconds stays in-session
    val b = Seq((1L, 1L, ts(0)), (1L, 2L, ts(3600))).toDF("uid", "eid", "t")
    val bi = Prep.sessionize(b, "uid", "t", "eid", 3600L)
      .select("session_idx").as[Long].collect()
    assert(bi.toSet == Set(1L))
  }

  test("prioritySample: exact top-k by weight/u, stable under repartition") {
    val d = Seq((1L, 10.0), (2L, 0.001), (3L, 500.0), (4L, 42.0), (5L, 7.0))
      .toDF("key", "w")
    // driver-side reference: same md5-derived u, same single division
    def priority(key: Long, w: Double): Double = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(key.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble /
        281474976710656.0
      w / u
    }
    val expect = Seq((1L, 10.0), (2L, 0.001), (3L, 500.0), (4L, 42.0),
        (5L, 7.0))
      .map { case (k, w) => (k, w, priority(k, w)) }
      .sortBy { case (k, _, p) => (-p, k) }.take(3)
      .map { case (k, w, p) =>
        (k, w, BigDecimal(p).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
      }.sortBy(_._1)
    val got = Prep.prioritySample(d, "key", "w", 3)
      .orderBy("key").as[(Long, Double, Double)].collect().toSeq
    assert(got == expect)
    val again = Prep.prioritySample(d.repartition(7), "key", "w", 3)
      .orderBy("key").as[(Long, Double, Double)].collect().toSeq
    assert(again == got)
  }

  test("rollingTimeFeatures: trailing time frame, nulls count but don't sum") {
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(t0.getTime + s * 1000)
    val d = Seq(
      (1L, ts(0), Some(1.0)), (1L, ts(50), None), (1L, ts(100), Some(2.5)),
      (1L, ts(200), Some(4.0)), // 100s window at t=200 sees t=100,200 only
      (2L, ts(0), Some(9.0))
    ).toDF("uid", "t", "v")
    val got = Prep.rollingTimeFeatures(d, "uid", "t", "v", 100L * 1000000L)
      .select("uid", "t", "roll_value", "roll_events").collect()
      .map(r => (r.getAs[Long]("uid"), r.getAs[java.sql.Timestamp]("t")) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Double])), r.getAs[Long](3)))
      .toMap
    assert(got((1L, ts(0))) == ((Some(1.0), 1L)))
    assert(got((1L, ts(50))) == ((Some(1.0), 2L))) // null counted, not summed
    assert(got((1L, ts(100))) == ((Some(3.5), 3L))) // inclusive lower bound
    assert(got((1L, ts(200))) == ((Some(6.5), 2L)))
    assert(got((2L, ts(0))) == ((Some(9.0), 1L)))
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

  test("targetEncode: shrinkage pulls toward the global mean; LOO of a " +
      "singleton group IS the global mean") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("b", 100.0))
      .toDF("k", "y")
    val out = Prep.targetEncode(df, Seq("k"), "y", smoothing = 2.0)
      .select("k", "y", "te", "te_loo")
      .as[(String, Double, Double, Double)].collect()
    val gMean = (10.0 + 20.0 + 100.0) / 3 // ≈ 43.333333
    // group a: (30 + 2·gMean)/(2+2); group b: (100 + 2·gMean)/(1+2)
    val teA = (30.0 + 2.0 * gMean) / 4.0
    val teB = (100.0 + 2.0 * gMean) / 3.0
    out.foreach { case (k, y, te, loo) =>
      if (k == "a") {
        assert(math.abs(te - teA) < 1e-6)
        // LOO excludes the row's own y: ((30-y) + 2·gMean)/(1+2)
        assert(math.abs(loo - ((30.0 - y) + 2.0 * gMean) / 3.0) < 1e-6)
      } else {
        assert(math.abs(te - teB) < 1e-6)
        // singleton group: nothing left after removing the row → pure prior
        assert(math.abs(loo - gMean) < 1e-6)
      }
      // shrinkage: te strictly between the group mean and the global mean
      val grpMean = if (k == "a") 15.0 else 100.0
      assert((te - grpMean) * (te - gMean) < 0,
        s"te=$te not between group=$grpMean and global=$gMean")
    }
  }

  test("quantileBucket: bins are ordered, non-overlapping, and cover all rows") {
    val li = Tables.lineitem(spark, dir)
    val out = Prep.quantileBucket(li, "l_extendedprice", 4)
      .orderBy("bucket")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(out.map(_._2).sum == li.count())
    // value ranges are disjoint and increasing across buckets
    out.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._4 <= hi._3, s"overlap: ${lo._4} > ${hi._3}")
    }
    // equal-frequency: each bin holds 25% ± the duplicate-ties slack
    val n = li.count().toDouble
    out.foreach { case (b, cnt, _, _) =>
      assert(math.abs(cnt / n - 0.25) < 0.05, s"bucket $b holds ${cnt / n}")
    }
  }

  test("crossHash: separator keeps (ab,c) and (a,bc) distinct; " +
      "repartitioning never changes buckets") {
    val df = Seq(("ab", "c"), ("a", "bc")).toDF("x", "y")
    val out = Prep.crossHash(df, Seq("x", "y"), 1 << 20)
      .select("cross_bucket").as[Long].collect()
    assert(out.distinct.length == 2, "separator failed: crosses collided")
    val cust = Tables.customer(spark, dir)
    val a = Prep.crossHash(cust, Seq("c_mktsegment", "c_nationkey"), 64)
      .select("c_custkey", "cross_bucket").orderBy("c_custkey").collect()
    val b = Prep.crossHash(cust.repartition(7),
        Seq("c_mktsegment", "c_nationkey"), 64)
      .select("c_custkey", "cross_bucket").orderBy("c_custkey").collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 64))
  }

  test("capPerKey: cells never exceed the cap, full cells keep exactly it, " +
      "kept set is partition-independent") {
    val docs = Tables.documents(spark, dir)
    val capped = Prep.capPerKey(docs, Seq("source", "lang"), "doc_id", 5)
    val full = docs.groupBy("source", "lang").count()
      .withColumnRenamed("count", "n_full")
    val per = capped.groupBy("source", "lang").count()
      .join(full, Seq("source", "lang"))
      .select("count", "n_full").as[(Long, Long)].collect()
    assert(per.forall { case (kept, n) => kept == math.min(5L, n) })
    val a = capped.select("doc_id").as[Long].collect().sorted.toSeq
    val b = Prep.capPerKey(docs.repartition(7), Seq("source", "lang"),
        "doc_id", 5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("balanceClasses: every class keeps exactly the minority count") {
    val orders = Tables.orders(spark, dir)
    val minN = orders.groupBy("o_orderstatus").count()
      .agg(min(col("count"))).as[Long].head()
    val kept = Prep.balanceClasses(orders, Seq("o_orderstatus"), "o_orderkey")
      .groupBy("o_orderstatus").count().select("count").as[Long].collect()
    assert(kept.nonEmpty && kept.forall(_ == minN))
  }

  test("kfold: every key in exactly one fold, folds cover [0, k)") {
    val ev = Tables.events(spark, dir)
    val out = Prep.kfold(ev, "user_id", 5)
    val folds = out.select("fold").distinct().as[Long].collect().sorted
    assert(folds.forall(f => f >= 0 && f < 5))
    val multi = out.groupBy("user_id")
      .agg(countDistinct(col("fold")).as("nf"))
      .filter(col("nf") =!= 1).count()
    assert(multi == 0)
  }

  test("negativeSample: negatives never intersect interactions, exactly " +
      "k per user, identical on any partitioning") {
    val inter = Tables.orders(spark, dir).filter(col("o_custkey") < 10)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    def run(i: org.apache.spark.sql.DataFrame) =
      Prep.negativeSample(i, "o_custkey", "l_partkey",
          Tables.part(spark, dir), "p_partkey", 5, 4)
        .select("o_custkey", "neg_rank", "l_partkey")
        .orderBy("o_custkey", "neg_rank")
        .as[(Long, Long, Long)].collect().toSeq
    val negs = run(inter)
    val interSet = inter.distinct().as[(Long, Long)].collect().toSet
    assert(negs.forall { case (u, _, it) => !interSet((u, it)) },
      "a sampled negative was actually interacted with")
    negs.groupBy(_._1).foreach { case (u, rows) =>
      assert(rows.map(_._2).sorted == Seq(1L, 2L, 3L, 4L, 5L), s"user $u")
    }
    assert(run(inter.repartition(7)) == negs)
  }

  test("forwardFill: nulls inherit the last observation, leading nulls " +
      "stay null, non-nulls pass through") {
    val df = Seq(
      (1L, 1L, Option.empty[Double]), // leading null — no observation yet
      (1L, 2L, Some(5.0)),
      (1L, 3L, None),                 // ← fills to 5.0
      (1L, 4L, Some(7.0)),
      (2L, 1L, None))                 // other key — stays null
      .toDF("k", "ord", "v")
    val out = Prep.forwardFill(df, "k", Seq("ord"), "v")
      .orderBy("k", "ord")
      .select("v_ffill").as[Option[Double]].collect().toSeq
    assert(out == Seq(None, Some(5.0), Some(5.0), Some(7.0), None))
  }

  test("woeEncode: smoothed shares, woe sign tracks lift, " +
      "single-class categories stay finite") {
    // cat p: 3 pos / 1 neg; cat q: 1 pos / 3 neg; cat r: 2 pos / 0 neg
    val rows = Seq(("p", true), ("p", true), ("p", true), ("p", false),
      ("q", true), ("q", false), ("q", false), ("q", false),
      ("r", true), ("r", true))
    val df = rows.toDF("cat", "lbl")
    val got = Prep.woeEncode(df, "cat", "lbl", alpha = 0.5)
      .collect()
      .map(r => r.getAs[String]("category") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"),
          r.getAs[Double]("woe"), r.getAs[Double]("iv"))).toMap
    // totals: pos=6, neg=4; shares with α=0.5 over (6.5, 4.5)
    val (pP, pN) = ((3 + 0.5) / 6.5, (1 + 0.5) / 4.5)
    assert(got("p")._1 == 4 && got("p")._2 == 3 && got("p")._3 == 1)
    assert(got("p")._4 ==
      BigDecimal(math.log(pP / pN)).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("p")._4 > 0)      // pos-enriched → positive woe
    assert(got("q")._4 < 0)      // neg-enriched → negative
    assert(got("r")._4.isFinite) // zero-neg category smoothed, not ±∞
    assert(got("r")._4 > 0 && got("r")._5.isFinite)
  }

  test("winsorize: clipped rows land on the edges, unclipped rows pass " +
      "through, clip fractions are ~5%") {
    import org.apache.spark.sql.types.DecimalType
    val li = Tables.lineitem(spark, dir)
    val out = Prep.winsorize(li, "l_extendedprice", 0.05, 0.95)
    val untouchedBroken = out
      .filter(!col("clipped_lo") && !col("clipped_hi") &&
        col("winsorized") =!=
          col("l_extendedprice").cast(DecimalType(18, 6)))
      .count()
    assert(untouchedBroken == 0)
    val (lo, hi) = out.agg(min(col("winsorized")).cast("double"),
      max(col("winsorized")).cast("double")).as[(Double, Double)].head()
    assert(out.filter(col("winsorized").cast("double") < lo ||
      col("winsorized").cast("double") > hi).count() == 0)
    val n = li.count().toDouble
    val nLo = out.filter(col("clipped_lo")).count() / n
    val nHi = out.filter(col("clipped_hi")).count() / n
    assert(math.abs(nLo - 0.05) < 0.02, s"lo clip frac $nLo")
    assert(math.abs(nHi - 0.05) < 0.02, s"hi clip frac $nHi")
  }

  test("quantileMatch: min/median/max map to the target's quantiles; " +
      "identity when matching a group to itself") {
    // A: 1,2,3,4 (uniform); B: 10,20,30,40
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(10.0, 20.0, 30.0, 40.0).map(("b", _))).toDF("g", "v")
    val m = Prep.quantileMatch(df, "v", "g", "a", "b")
      .collect().map(r => r.getAs[Double]("value") ->
        r.getAs[Double]("matched_value")).toMap
    assert(m == Map(1.0 -> 10.0, 2.0 -> 20.0, 3.0 -> 30.0, 4.0 -> 40.0))
    val self = Prep.quantileMatch(df, "v", "g", "a", "a")
      .collect().map(r => (r.getAs[Double]("value"),
        r.getAs[Double]("matched_value")))
    assert(self.forall { case (v, mv) => v == mv })
  }

  test("quantileMatch: unknown/empty target group fails loudly, not NULL") {
    val df = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    val e = intercept[Exception] {
      Prep.quantileMatch(df, "v", "g", "a", "nope").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("has no non-null values")))
  }

  test("normalizeText: case-fold, punctuation strip, whitespace collapse") {
    val docs = Seq((1L, "Hello,  WORLD!!"), (2L, "already clean"))
      .toDF("id", "text")
    val out = Prep.normalizeText(docs, "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[String]("normalized"), r.getAs[Boolean]("changed"))).toMap
    assert(out(1L) == (("hello world", true)))
    assert(out(2L) == (("already clean", false)))
  }

  test("tokenBudgetPlan: integer targets, epochs, deficit and missing " +
      "source") {
    val docs = Seq(
      (1L, "a b c d", "web"), (2L, "e f", "web"), // web: 6 tokens
      (3L, "x y z", "code") // code: 3 tokens
    ).toDF("doc_id", "text", "source")
    val plan = Prep.tokenBudgetPlan(docs, "text", "source",
        Seq("web" -> 50, "code" -> 30, "books" -> 20), totalBudget = 30L)
      .orderBy("source").collect()
    val m = plan.map(r => r.getAs[String]("source") -> r).toMap
    // web: target 15 of 6 available → epochs 2.5, deficit
    assert(m("web").getAs[Long]("target_tokens") == 15L)
    assert(m("web").getAs[Double]("epochs") == 2.5)
    assert(m("web").getAs[Boolean]("deficit"))
    // code: target 9 of 3 → epochs 3.0
    assert(m("code").getAs[Long]("target_tokens") == 9L)
    assert(m("code").getAs[Double]("epochs") == 3.0)
    // books absent from the corpus: NULL inventory, NULL epochs
    assert(m("books").isNullAt(m("books").fieldIndex("available_tokens")))
    assert(m("books").isNullAt(m("books").fieldIndex("epochs")))
    // weights must sum to 100
    intercept[IllegalArgumentException] {
      Prep.tokenBudgetPlan(docs, "text", "source", Seq("web" -> 60), 10L)
    }
  }

  test("mixtureSchedule: stride interleave matches target proportions in " +
      "every prefix and is partition-invariant") {
    val spark2 = spark
    import spark2.implicits._
    // 90/10 split → q = (0.75, 0.25): every big-source item advances
    // virtual time by 4/3, every small one by 4 — prefixes of the sorted
    // schedule hold ≈3:1 big:small
    val df = ((0 until 90).map(i => (s"b$i", "big")) ++
      (0 until 10).map(i => (s"s$i", "small"))).toDF("id", "src")
    def run(d: org.apache.spark.sql.DataFrame) =
      graft.ops.Prep.mixtureSchedule(d, col("src"), col("id"))
        .orderBy("virtual_time", "source", "id")
        .collect().map(_.getAs[String]("source")).toSeq
    val order = run(df)
    assert(order.size == 100)
    // every prefix of length 4m contains exactly 3m big + m small: the
    // stride property (big at times 2/3·(k−½)·2=…, small at 4k−2)
    (1 to 10).foreach { m =>
      val p = order.take(4 * m)
      assert(p.count(_ == "small") == m, s"prefix ${4 * m}: $p")
    }
    assert(run(df.repartition(7)) == order)
  }

  test("spanCorruption: sentinel-splice of input and target reconstructs " +
      "every original document exactly; counts are consistent") {
    val spark2 = spark
    import spark2.implicits._
    val docs = (0L until 40L).map(i =>
      (i, (0 until 80).map(j => s"w${(i * 7 + j * 3) % 23}").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Prep.spanCorruption(docs, "doc_id", "text",
      startPct = 8, maxSpan = 4).collect()
    assert(out.length == 40)
    val orig = docs.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    var sawSpans = false
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val inp = r.getAs[String]("input_text").split(" ").toSeq
      val sentinels = inp.count(_.startsWith("<extra_id_"))
      assert(r.getAs[Long]("n_tokens") ==
        inp.size - sentinels + r.getAs[Long]("n_masked"))
      if (r.isNullAt(r.fieldIndex("target_text"))) {
        assert(r.getAs[Long]("n_masked") == 0L)
        assert(r.getAs[String]("input_text") == orig(id))
      } else {
        sawSpans = true
        assert(sentinels.toLong == r.getAs[Long]("n_spans"))
        // parse "<extra_id_k> t t <extra_id_k+1> ..." into k -> tokens
        val spans = scala.collection.mutable.Map.empty[String,
          scala.collection.mutable.ArrayBuffer[String]]
        var cur: String = null
        r.getAs[String]("target_text").split(" ").foreach { p =>
          if (p.startsWith("<extra_id_")) {
            cur = p
            spans(cur) = scala.collection.mutable.ArrayBuffer.empty
          }
          else spans(cur) += p
        }
        val rebuilt = inp.flatMap(p =>
          if (p.startsWith("<extra_id_")) spans(p).toSeq else Seq(p))
        assert(rebuilt.mkString(" ") == orig(id), s"doc $id")
        assert(spans.values.map(_.size).sum.toLong ==
          r.getAs[Long]("n_masked"))
      }
    }
    assert(sawSpans, "corpus produced no spans — hash params broken")
  }

  test("temperatureMixture: T=2 flattens a 90/10 split to exactly 75/25") {
    val spark2 = spark
    import spark2.implicits._
    // p = (0.9, 0.1): q ∝ (√0.9, √0.1) = (3√0.1, √0.1) → (0.75, 0.25);
    // boost: minority 0.25/0.1 = 2.5×, majority 0.75/0.9 = 0.8333…
    val df = (Seq.fill(90)("big") ++ Seq.fill(10)("small")).toDF("src")
    val m = Prep.temperatureMixture(df, col("src")).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    assert(m("big").getAs[Long]("n_rows") == 90L)
    assert(m("big").getAs[Double]("p_raw") == 0.9 &&
      m("small").getAs[Double]("p_raw") == 0.1)
    assert(m("big").getAs[Double]("q_temp") == 0.75 &&
      m("small").getAs[Double]("q_temp") == 0.25)
    assert(m("small").getAs[Double]("boost") == 2.5)
    assert(m("big").getAs[Double]("boost") == 0.833333333)
    // a uniform distribution is a fixed point of temperature scaling
    val u = (0 until 60).map(i => s"s${i % 3}").toDF("src")
    Prep.temperatureMixture(u, col("src")).collect().foreach { r =>
      assert(r.getAs[Double]("boost") == 1.0 &&
        r.getAs[Double]("q_temp") == r.getAs[Double]("p_raw"))
    }
  }

  test("winsorizeFromSketch: with K >= n the fences are the exact " +
      "empirical percentiles (data values), clip flags consistent") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val df = (1 to 100).map(i => (i.toLong, i.toDouble))
      .toDF("id", "v")
    val out = Prep.winsorizeFromSketch(df, "v", lit(0L), knots = 100,
      pLoPct = 5, pHiPct = 95).collect()
    assert(out.length == 100)
    // target rank ceil(5*100/100)=5 → lo = 5.00; hi = 95.00 — members
    // of the value grid, not interpolations
    val lows = out.filter(_.getAs[Boolean]("clipped_lo"))
    val highs = out.filter(_.getAs[Boolean]("clipped_hi"))
    assert(lows.length == 4 && highs.length == 5)
    assert(out.forall { r =>
      val w = r.getAs[java.math.BigDecimal]("winsorized").doubleValue()
      w >= 5.0 && w <= 95.0
    })
  }

  test("quantileBucketFromSketch: exact-K deciles of 1..100 give ten " +
      "10-row buckets with the right ranges") {
    val spark2 = spark
    import spark2.implicits._
    import org.apache.spark.sql.functions.lit
    val df = (1 to 100).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val out = Prep.quantileBucketFromSketch(df, "v", lit(0L), knots = 100,
        buckets = 10)
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("n"),
        r.getAs[Double]("lo"), r.getAs[Double]("hi")))
    assert(out.toSeq == (1 to 10).map(b =>
      (b.toLong, 10L, (10 * (b - 1) + 1).toDouble, (10 * b).toDouble)))
  }

  test("lossReweight: one EG step — harder domains strictly up-weight, " +
      "weights match the rounded-softmax hand replay, mixture smooths " +
      "toward uniform") {
    import spark.implicits._
    val hardness = Seq(("easy", 1.0), ("mid", 2.0), ("hard", 3.0))
      .toDF("source", "bits_per_token")
    val got = Prep.lossReweight(hardness, "source", "bits_per_token",
        eta = 1.0, cNum = 1, cDen = 5)
      .orderBy("source").collect()
      .map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r9(x: Double): BigDecimal =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val es = Seq(1.0, 2.0, 3.0).map(b => r9(math.exp(1.0 * (b - 1.0))))
    val z = es.sum
    def sw(i: Int): Double = r9(es(i).toDouble / z.toDouble).toDouble
    def mix(i: Int): Double =
      r9(0.8 * sw(i) + 1.0 / (5.0 * 3)).toDouble
    assert(got("easy") == ((1.0, sw(0), mix(0))))
    assert(got("mid") == ((2.0, sw(1), mix(1))))
    assert(got("hard") == ((3.0, sw(2), mix(2))))
    // monotone in hardness; smoothing pulls toward uniform 1/3
    assert(sw(0) < sw(1) && sw(1) < sw(2))
    assert(mix(0) > sw(0) && mix(2) < sw(2))
  }

  test("lossReweight: a hardness spread past the DECIMAL(28,9) exp range " +
      "fails loudly instead of silently nulling every weight") {
    import spark.implicits._
    val wild = Seq(("tame", 1.0), ("wild", 60.0))
      .toDF("source", "bits_per_token")
    val ex = intercept[Exception] {
      Prep.lossReweight(wild, "source", "bits_per_token").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("lossReweight")),
      msgs(ex).mkString(" | "))
    // a spread inside the bound still fits (the happy path is unchanged)
    assert(Prep.lossReweight(Seq(("a", 1.0), ("b", 40.0))
      .toDF("source", "bits_per_token"), "source", "bits_per_token")
      .count() == 2L)
  }

  test("mixtureScheduleWeighted: the temperature-weight handoff " +
      "reproduces mixtureSchedule's stride (the DoReMi handoff pin — " +
      "same (source, id, k), virtual times within one nano)") {
    val docs = Tables.documents(spark, dir)
    val viaWeights = Prep.mixtureScheduleWeighted(docs, col("lang"),
        col("doc_id"), Prep.temperatureMixture(docs, col("lang")),
        "source", "q_temp")
      .orderBy("source", "id").collect()
      .map(r => (r.getString(1), r.get(2).toString, r.getInt(3),
        r.getDouble(0)))
    val direct = Prep.mixtureSchedule(docs, col("lang"), col("doc_id"))
      .orderBy("source", "id").collect()
      .map(r => (r.getString(1), r.get(2).toString, r.getInt(3),
        r.getDouble(0)))
    assert(viaWeights.nonEmpty && viaWeights.length == direct.length)
    viaWeights.zip(direct).foreach { case (w, d) =>
      assert((w._1, w._2, w._3) == ((d._1, d._2, d._3)), s"$w vs $d")
      // weighted = truncating nano division, schedule = round(…, 9):
      // they agree to one nano on the same weight
      assert(math.abs(w._4 - d._4) <= 1e-9 + 1e-12, s"$w vs $d")
    }
  }

  test("curriculumSchedule: a CONSTANT quality column reduces exactly " +
      "to mixtureScheduleWeighted (same source/id/k/virtual_time), and " +
      "a real quality key orders each source by quality descending") {
    val docs = Tables.documents(spark, dir)
    val w = Prep.temperatureMixture(docs, col("lang"))
    val const = Prep.curriculumSchedule(docs, col("lang"), col("doc_id"),
        lit(5L), w, "source", "q_temp")
      .select("virtual_time", "source", "id", "k")
      .orderBy("source", "id").collect().toSeq
    val base = Prep.mixtureScheduleWeighted(docs, col("lang"),
        col("doc_id"), w, "source", "q_temp")
      .orderBy("source", "id").collect().toSeq
    assert(const.nonEmpty && const == base)
    // a genuine key: n_chars — within each source, k must follow
    // quality descending (ties resolved by md5 then id, so quality is
    // non-increasing in k)
    val real = Prep.curriculumSchedule(docs, col("lang"), col("doc_id"),
        col("n_chars"), w, "source", "q_temp")
      .select("source", "quality", "k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    real.groupBy(_._1).values.foreach { rows =>
      val byK = rows.sortBy(_._3).map(_._2)
      assert(byK.zip(byK.tail).forall { case (a, b) => a >= b },
        s"quality not descending in k: ${byK.take(10).toSeq}")
    }
  }

  test("tokenBudgetPlanWeighted: equal nano weights reproduce the " +
      "integer-percent plan; floor shares never overshoot the budget") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val langs = docs.select("lang").distinct().as[String].collect().sorted
    val pct = 100 / langs.length
    // only an even split is expressible in BOTH units — skip otherwise
    assume(pct * langs.length == 100)
    val viaPct = Prep.tokenBudgetPlan(docs, "text", "lang",
        langs.map(_ -> pct), 1000000L)
      .select("source", "n_docs", "available_tokens", "target_tokens")
      .orderBy("source").collect()
    val w = langs.map(_ -> pct / 100.0).toSeq.toDF("source", "w")
    val viaW = Prep.tokenBudgetPlanWeighted(docs, "text", "lang", w,
        "source", "w", 1000000L)
      .select("source", "n_docs", "available_tokens", "target_tokens")
      .orderBy("source").collect()
    assert(viaPct.nonEmpty && viaPct.sameElements(viaW))
    // floor shares: Σ targets ∈ (budget − |sources|, budget]
    val tot = viaW.map(_.getLong(3)).sum
    assert(tot <= 1000000L && tot > 1000000L - langs.length, tot.toString)
  }

  test("mixtureTargetSample: max-rate source kept whole, survivors track " +
      "the target proportions, absent sources drop, partitioning-" +
      "independent") {
    import spark.implicits._
    // sizes 600/270/30 with UNIFORM target weights: 'small' has the max
    // rate-per-row (w/30) and is kept whole; the others thin toward 30
    val df = (1 to 900).map(i => (s"d$i",
        if (i <= 600) "big" else if (i <= 870) "mid" else "small"))
      .toDF("doc_id", "source")
    val third = BigDecimal(1.0 / 3)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val w = Seq(("big", third), ("mid", third), ("small", third))
      .toDF("source", "mixture_weight")
    val kept = Prep.mixtureTargetSample(df, "doc_id", "source", w,
        "source", "mixture_weight")
      .groupBy("source").count()
      .as[(String, Long)].collect().toMap
    assert(kept("small") == 30L, s"max-rate source thinned: $kept")
    // expected 30 each; md5-hash variance is deterministic but nonzero
    assert(math.abs(kept("big") - 30L) <= 15 &&
      math.abs(kept("mid") - 30L) <= 15, kept.toString)
    // a source the measured policy never saw is dropped, not defaulted
    val w2 = Seq(("big", 0.5), ("small", 0.5))
      .toDF("source", "mixture_weight")
    assert(Prep.mixtureTargetSample(df, "doc_id", "source", w2,
      "source", "mixture_weight")
      .filter(col("source") === "mid").count() == 0L)
    // the keep decision is per-row integer arithmetic — identical on
    // any partitioning
    val again = Prep.mixtureTargetSample(df.repartition(7), "doc_id",
        "source", w, "source", "mixture_weight")
      .select("doc_id").as[String].collect().sorted.toSeq
    val first = Prep.mixtureTargetSample(df, "doc_id", "source", w,
        "source", "mixture_weight")
      .select("doc_id").as[String].collect().sorted.toSeq
    assert(first == again)
  }
}
