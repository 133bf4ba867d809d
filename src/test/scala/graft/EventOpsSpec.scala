package graft

import graft.ops.EventOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("funnel: strictly-after ordering; missing steps are null") {
    // user 1 completes view(10) → click(20) → purchase(30);
    // user 2 clicks BEFORE viewing (click 5, view 10) and the later click
    // at 15 counts instead; never purchases;
    // user 3 never views → absent from the funnel entirely
    val ev = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "click"), (2L, 10L, "view"), (2L, 15L, "click"),
      (3L, 10L, "click"), (3L, 20L, "purchase")
    ).toDF("user_id", "ts_us", "event_type")
    val out = EventOps.funnel(ev, "user_id", "ts_us",
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
      .orderBy("user_id")
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq(
      (1L, Some(10L), Some(20L), Some(30L)),
      (2L, Some(10L), Some(15L), None)))
  }

  test("funnel: same-timestamp step does NOT complete (strict >)") {
    val ev = Seq((1L, 10L, "view"), (1L, 10L, "click"))
      .toDF("user_id", "ts_us", "event_type")
    val out = EventOps.funnel(ev, "user_id", "ts_us",
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click")))
      .as[(Long, Option[Long], Option[Long])].collect()
    assert(out.toSeq == Seq((1L, Some(10L), None)))
  }

  test("scd2: runs collapse, intervals tile the key's timeline") {
    val ev = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "b"), (1L, 50L, 5L, "a"))
      .toDF("user_id", "ts_us", "event_id", "v")
    val out = EventOps.scd2(ev, "user_id", "ts_us", "event_id", "v")
      .select("v", "valid_from", "valid_to", "is_current")
      .orderBy("valid_from")
      .as[(String, Long, Option[Long], Boolean)].collect()
    assert(out.toSeq == Seq(
      ("a", 10L, Some(30L), false),
      ("b", 30L, Some(50L), false),
      ("a", 50L, None, true)))
  }

  test("scd2: null values form one interval (null-safe change detection)") {
    val ev = Seq(
      (1L, 10L, 1L, Option.empty[String]), (1L, 20L, 2L, None),
      (1L, 30L, 3L, Some("x")))
      .toDF("user_id", "ts_us", "event_id", "v")
    val out = EventOps.scd2(ev, "user_id", "ts_us", "event_id", "v")
    assert(out.count() == 2)
  }

  test("timeSplitEmbargo: boundary rows land on the embargo side, counts add up") {
    val horizon = 100L
    val embargo = 50L
    // mx = 1000 → test: ts > 900; embargo: 850 < ts <= 900; train: ts <= 850
    val ev = Seq(1000L, 901L, 900L, 851L, 850L, 1L).toDF("ts_us")
    val out = EventOps.timeSplitEmbargo(ev, "ts_us", horizon, embargo)
      .groupBy("split").agg(collect_list(col("ts_us")).as("ts"))
      .as[(String, Seq[Long])].collect().map { case (s, t) => s -> t.sorted }
      .toMap
    assert(out("test") == Seq(901L, 1000L))
    assert(out("embargo") == Seq(851L, 900L))
    assert(out("train") == Seq(1L, 850L))
  }

  test("assembleSequence: (ts, tie) order, cap keeps the FIRST tokens, " +
      "n_events counts everything") {
    val ev = Seq(
      (1L, 30L, 3L, "c"), (1L, 10L, 1L, "a"), (1L, 20L, 2L, "b"),
      (2L, 10L, 1L, "x"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    val out = EventOps.assembleSequence(ev, "user_id", "ts_us", "event_id",
        "event_type", 2)
      .orderBy("user_id").as[(Long, Long, String)].collect()
    assert(out.toSeq == Seq((1L, 3L, "a b"), (2L, 1L, "x")))
  }

  test("assembleSequence: duplicate timestamps resolve by the tie column " +
      "on any partitioning") {
    val ev = Seq((1L, 10L, 2L, "b"), (1L, 10L, 1L, "a"), (1L, 5L, 9L, "z"))
      .toDF("user_id", "ts_us", "event_id", "event_type")
    Seq(ev, ev.repartition(7)).foreach { d =>
      val seq = EventOps.assembleSequence(d, "user_id", "ts_us", "event_id",
          "event_type", 10)
        .select("sequence").as[String].head()
      assert(seq == "z a b")
    }
  }

  test("rollingActiveKeys: trailing-window distinct counts, observed days " +
      "only") {
    val us = 86400000000L
    // user 1 active days 0 and 2; user 2 active day 2; window = 3 days
    val ev = Seq((1L, 0L * us), (1L, 2L * us), (2L, 2L * us),
      (1L, 2L * us + 5L)) // same day twice — distinct-day dedup
      .toDF("user_id", "ts_us")
    val out = EventOps.rollingActiveKeys(ev, "user_id", "ts_us", 3)
      .orderBy("day").as[(Long, Long)].collect().toSeq
    // day 0: {1}; day 2: window [0,2] → {1, 2}; day 1 unobserved → absent
    assert(out == Seq((0L, 1L), (2L, 2L)))
  }

  test("snapshotDiff: all four statuses; null-safe value compare") {
    import graft.ops.Diff
    val old = Seq((1L, Some(10L)), (2L, Some(20L)), (3L, Some(30L)),
      (5L, None)).toDF("k", "v")
    val neu = Seq((2L, Some(20L)), (3L, Some(31L)), (4L, Some(40L)),
      (5L, None)).toDF("k", "v")
    val out = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added", 5L -> "unchanged"))
    // null → value is a change, not an add
    val out2 = Diff.snapshotDiff(
        Seq((1L, Option.empty[Long])).toDF("k", "v"),
        Seq((1L, Some(7L))).toDF("k", "v"), Seq("k"), Seq("v"))
      .select("status").as[String].head()
    assert(out2 == "changed")
  }

  test("transitionMatrix: adjacent pairs per key in (ts, tie) order; " +
      "probabilities normalize per source state; first events emit none") {
    // user 1: A→B→A ; user 2: A→B — pairs: A→B ×2, B→A ×1
    val ev = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "B"), (1L, 3L, 30L, "A"),
      (2L, 4L, 10L, "A"), (2L, 5L, 20L, "B"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val m = graft.ops.EventOps
      .transitionMatrix(ev, "user_id", "ts_us", "event_id", "event_type")
      .collect().map(r => (r.getAs[String]("state"),
        r.getAs[String]("next_state")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("p"))).toMap
    assert(m(("A", "B")) == ((2L, 1.0)))
    assert(m(("B", "A")) == ((1L, 1.0)))
    assert(m.size == 2) // no cross-user A(user1,ts30)→A(user2,ts10) pair
    // duplicate timestamps: the tie column decides adjacency
    val tie = Seq((1L, 2L, 10L, "X"), (1L, 1L, 10L, "Y"))
      .toDF("user_id", "event_id", "ts_us", "event_type")
    val mt = graft.ops.EventOps
      .transitionMatrix(tie, "user_id", "ts_us", "event_id", "event_type")
      .collect().map(r => (r.getAs[String]("state"),
        r.getAs[String]("next_state"))).toSeq
    assert(mt == Seq(("Y", "X"))) // event_id 1 precedes 2 at equal ts
  }

  test("cooccurrencePmi: presence counts, pair orientation, PMI reference") {
    // sessions: (A,B,C), (A,B), (A), (C) -> S=4
    val rows = Seq(
      (1L, 1L, "A"), (1L, 1L, "B"), (1L, 1L, "C"), (1L, 1L, "B"), // dup B
      (1L, 2L, "A"), (1L, 2L, "B"),
      (2L, 1L, "A"),
      (3L, 1L, "C"))
      .toDF("user_id", "session_idx", "item")
    val got = graft.ops.EventOps
      .cooccurrencePmi(rows, Seq("user_id", "session_idx"), "item")
      .collect().map(r => (r.getAs[String]("item_a"),
        r.getAs[String]("item_b")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Long]("n_sessions"), r.getAs[Double]("pmi"))).toMap
    // presence-based: duplicate B in session (1,1) counts once
    assert(got(("A", "B"))._1 == 2L)
    assert(got(("A", "B"))._2 == 3L) // A in 3 sessions
    assert(got(("A", "B"))._3 == 2L) // B in 2 sessions
    assert(got(("A", "C"))._1 == 1L)
    assert(got(("B", "C"))._1 == 1L)
    assert(got.keySet == Set(("A", "B"), ("A", "C"), ("B", "C")))
    val pmiAb = BigDecimal(math.log(2.0 * 4 / (3L * 2L)))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("A", "B"))._5 == pmiAb)
    assert(got.values.forall(_._4 == 4L))
  }

  test("wilsonLowerBound: sample-size discipline and closed-form reference") {
    val df = (Seq.fill(100)(("big", true)).take(90) ++
      Seq.fill(10)(("big", false)) ++ Seq(("tiny", true)))
      .toDF("k", "ok")
    val got = graft.ops.Screening
      .wilsonLowerBound(df, Seq("k"), col("ok"), 1.96)
      .collect().map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"),
          r.getAs[Double]("wilson_lb"))).toMap
    assert(got("big")._1 == 100L && got("big")._2 == 90L)
    assert(got("tiny")._1 == 1L && got("tiny")._2 == 1L)
    // the whole point: 90/100 outranks 1/1
    assert(got("big")._3 > got("tiny")._3)
    def ref(s: Long, n: Long, z: Double): Double = {
      val zz = z * z; val p = s.toDouble / n
      val lb = (p + zz / (n * 2) -
        z * math.sqrt((p * (1.0 - p) + zz / (n * 4)) / n)) / (1.0 + zz / n)
      BigDecimal(lb).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(got("big")._3 == ref(90, 100, 1.96))
    assert(got("tiny")._3 == ref(1, 1, 1.96))
  }

  test("rollingOriginSplit: expanding trains, disjoint test windows") {
    import org.apache.spark.sql.functions.{col, expr}
    val us = 86400000000L
    // days 0..29, one event per day; 3 folds, horizon 5 → cuts at 14,19,24
    val df = (0L until 30L).map(d => (d, d * us))
      .toDF("event_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val out = EventOps.rollingOriginSplit(df, "ts", folds = 3,
        horizonDays = 5)
      .select("event_id", "fold", "role")
      .as[(Long, Long, String)].collect()
    val byFold = out.groupBy(_._2)
    // fold 1: train ≤ 14, test 15..19; fold 3: train ≤ 24, test 25..29
    assert(byFold(1L).filter(_._3 == "train").map(_._1).max == 14L)
    assert(byFold(1L).filter(_._3 == "test").map(_._1).toSet ==
      (15L to 19L).toSet)
    assert(byFold(3L).filter(_._3 == "train").map(_._1).max == 24L)
    assert(byFold(3L).filter(_._3 == "test").map(_._1).toSet ==
      (25L to 29L).toSet)
    // trains expand monotonically; test windows are disjoint across folds
    assert(byFold(2L).count(_._3 == "train") >
      byFold(1L).count(_._3 == "train"))
    val tests = out.filter(_._3 == "test").groupBy(_._2)
      .map { case (f, rs) => f -> rs.map(_._1).toSet }
    assert(tests(1L).intersect(tests(2L)).isEmpty)
    assert(tests(2L).intersect(tests(3L)).isEmpty)
  }

  test("latenessProfile: running-max lag in arrival order") {
    import org.apache.spark.sql.functions.expr
    // arrival 0,1,2,3 with event times 100, 50, 200, 190 (µs):
    // lateness = 0, 50, 0, 10
    val df = Seq((0L, 100L), (1L, 50L), (2L, 200L), (3L, 190L))
      .toDF("event_id", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
      .withColumn("k", expr("'u'"))
    val r = EventOps.latenessProfile(df, "k", "ts", "event_id",
      lateThresholdUs = 20L).collect()(0)
    assert(r.getAs[Long]("n_events") == 4)
    assert(r.getAs[Long]("n_late") == 1) // only the 50-µs lag exceeds 20
    assert(r.getAs[Long]("max_lateness_us") == 50L)
    assert(r.getAs[Double]("mean_lateness_us") == 15.0)
  }

  test("cohortRetention: cohort = first-activity period, cells count " +
      "distinct keys, retention relative to offset-0 size") {
    import org.apache.spark.sql.functions.expr
    val us = 86400000000L
    // weekly buckets: a,b join week 0; c joins week 1
    // a active weeks {0,1}, b weeks {0,2}, c weeks {1,2}
    val rows = Seq(("a", 0L), ("a", 8L), ("b", 0L), ("b", 0L), ("b", 14L),
      ("c", 7L), ("c", 14L))
    val df = rows.toDF("k", "d")
      .withColumn("ts", expr("timestamp_micros(d * 86400000000)"))
    val got = EventOps.cohortRetention(df, "k", "ts", bucketDays = 7)
      .collect()
      .map(r => (r.getAs[Long]("cohort_period"),
        r.getAs[Long]("period_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Double]("retention"))).toMap
    assert(got((0L, 0L)) == ((2L, 2L, 1.0)))   // a,b in week 0
    assert(got((0L, 1L)) == ((1L, 2L, 0.5)))   // a in week 1
    assert(got((0L, 2L)) == ((1L, 2L, 0.5)))   // b in week 2
    assert(got((1L, 0L)) == ((1L, 1L, 1.0)))   // c's own cohort
    assert(got((1L, 1L)) == ((1L, 1L, 1.0)))   // c in week 2 = offset 1
    assert(got.size == 5)
  }

  test("churnLabels: window absence labels churn; keys first seen inside " +
      "the window are excluded") {
    import org.apache.spark.sql.functions.expr
    // anchor = 100 µs, horizon 50 → cut = 50
    // a: observed at 10,30, active at 80 → not churned; b: observed at
    // 20,40 only → churned; c: first seen at 60 (inside window) → excluded
    val rows = Seq(("a", 10L), ("a", 30L), ("a", 80L), ("b", 20L),
      ("b", 40L), ("c", 60L), ("a", 100L))
    val df = rows.toDF("k", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = EventOps.churnLabels(df, "k", "ts", horizonUs = 50L)
      .collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_events_obs"), r.getAs[Long]("last_seen_us"),
          r.getAs[Boolean]("churned"))).toMap
    assert(got("a") == ((2L, 30L, false)))
    assert(got("b") == ((2L, 40L, true)))
    assert(!got.contains("c"))
  }

  test("linearAttribution: equal split per conversion, exact credit sums, " +
      "first/last flags tie-break on (t, id)") {
    // conversions: p1 covers t∈[0,10] (clicks x@2, y@5 → ½ each);
    // p2 covers t∈[4,14] (clicks y@5, z@12 → ½ each, y first, z last).
    // y assists both → credit 1.0.
    val touches = Seq(("u", "x", 2L), ("u", "y", 5L), ("u", "z", 12L))
      .toDF("k", "tid", "t")
    val convs = Seq(("u", "p1", 0L, 10L), ("u", "p2", 4L, 14L))
      .toDF("k", "cid", "lo", "hi")
    val got = EventOps.linearAttribution(touches, convs, Seq("k"),
        "t", "tid", "lo", "hi", "cid", bucketWidth = 10L)
      .collect()
      .map(r => r.getAs[String]("tid") ->
        (r.getAs[Long]("n_assists"), r.getAs[Double]("linear_credit"),
          r.getAs[Long]("n_first_touch"), r.getAs[Long]("n_last_touch")))
      .toMap
    assert(got("x") == ((1L, 0.5, 1L, 0L)))
    assert(got("y") == ((2L, 1.0, 1L, 1L))) // first in p2, last in p1
    assert(got("z") == ((1L, 0.5, 0L, 1L)))
  }

  test("associationRules: presence counts, both directions, " +
      "support/confidence/lift closed-form") {
    // sessions: {a,b}, {a,b}, {a}, {b,c} → n=4; n_a=3 n_b=3 n_c=1
    // ab: n_ab=2; bc: n_bc=1
    val rows = Seq((1, "a"), (1, "b"), (1, "a"), (2, "a"), (2, "b"),
      (3, "a"), (4, "b"), (4, "c"))
    val df = rows.toDF("sid", "item")
    val got = EventOps.associationRules(df, Seq("sid"), "item")
      .collect()
      .map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        (r.getAs[Long]("n_ab"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"), r.getAs[Double]("lift"))).toMap
    // a→b: sup 2/4, conf 2/3, lift 2·4/(3·3)
    assert(got(("a", "b")) == ((2L, 0.5, 0.666666667, 0.888888889)))
    assert(got(("b", "a")) == ((2L, 0.5, 0.666666667, 0.888888889)))
    // b→c: sup 1/4, conf 1/3, lift 1·4/(3·1)
    assert(got(("b", "c")) == ((1L, 0.25, 0.333333333, 1.333333333)))
    // c→b: conf 1/1
    assert(got(("c", "b")) == ((1L, 0.25, 1.0, 1.333333333)))
    assert(got.size == 4) // a,c never co-occur
  }

  test("sequencePatterns: first-occurrence precedence, (ts, tie) " +
      "determinism, order direction matters") {
    import org.apache.spark.sql.functions.expr
    // s1: a@1, b@3, a@5  → a before b (repeat a ignored: first wins)
    // s2: b@1, a@2       → b before a
    // s3: a@4, b@4 (tie) → event_id breaks: a(id 1) before b(id 2)
    val rows = Seq((1, "a", 1L, 1L), (1, "b", 3L, 2L), (1, "a", 5L, 3L),
      (2, "b", 1L, 1L), (2, "a", 2L, 2L),
      (3, "a", 4L, 1L), (3, "b", 4L, 2L))
    val df = rows.toDF("sid", "item", "ts_us", "eid")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = EventOps.sequencePatterns(df, Seq("sid"), "item", "ts", "eid")
      .collect()
      .map(r => (r.getAs[String]("antecedent"),
        r.getAs[String]("consequent")) ->
        (r.getAs[Long]("n_seq"), r.getAs[Double]("support"),
          r.getAs[Double]("confidence"))).toMap
    // a→b in s1 and s3 (2 of 3 sessions); n_ant(a) = 3
    assert(got(("a", "b")) == ((2L, 0.666666667, 0.666666667)))
    // b→a only in s2; n_ant(b) = 3
    assert(got(("b", "a")) == ((1L, 0.333333333, 0.333333333)))
    assert(got.size == 2)
  }

  test("activityGaps: span/missing/max-gap from distinct active days") {
    import org.apache.spark.sql.functions.{col, expr}
    val us = 86400000000L
    // u: days 0,1,4,5,9 (two events day 0) → n=5 span=10 missing=5 gap=3
    // v: single day → span 1, missing 0, gap 0
    val rows = Seq(("u", 0L), ("u", 0L), ("u", 1L), ("u", 4L), ("u", 5L),
      ("u", 9L), ("v", 3L)).map { case (k, d) => (k, d * us + 42L) }
    val df = rows.toDF("k", "ts_us")
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
    val got = EventOps.activityGaps(df, "k", "ts").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("span_days"),
          r.getAs[Long]("missing_days"), r.getAs[Long]("max_gap_days"))).toMap
    assert(got("u") == ((5L, 10L, 5L, 3L)))
    assert(got("v") == ((1L, 1L, 0L, 0L)))
  }

  test("itemCfNeighbors: cosine over distinct baskets, popularity " +
      "normalization, deterministic tie order") {
    // b1={1,2} (item 2 twice — incidence is binary), b2={1,2}, b3={1,3}
    val df = Seq((10L, 1L), (10L, 2L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L)).toDF("b", "i")
    val got = EventOps.itemCfNeighbors(df, "b", "i", 5)
      .orderBy("item", "rank").collect()
      .map(r => (r.getAs[Long]("item"), r.getAs[Long]("neighbor"),
        r.getAs[Long]("n_ab"), r.getAs[Double]("sim")))
    // n_1=3, n_2=2, n_3=1; sim(1,2)=2/(√3√2), sim(1,3)=1/√3
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 0.816496581), (1L, 3L, 1L, 0.577350269),
      (2L, 1L, 2L, 0.816496581), (3L, 1L, 1L, 0.577350269)))
    // equal sims tie-break to the smaller neighbor id
    val tie = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L)).toDF("b", "i")
    val n1 = EventOps.itemCfNeighbors(tie, "b", "i", 5)
      .filter(col("item") === 1).orderBy("rank").collect()
      .map(_.getAs[Long]("neighbor"))
    assert(n1.toSeq == Seq(2L, 3L))
  }

  test("itemCfNeighbors hot-basket cap: a planted mega-basket trims to " +
      "maxBasket items (bounded pair volume), counts stay consistent, " +
      "and an unbinding cap changes nothing") {
    // one 500-item bot basket + two small organic baskets
    val hot = (0 until 500).map(i => (99L, i.toLong))
    val organic = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 3L))
    val df = (hot ++ organic).toDF("b", "i").repartition(7)
    val capped = EventOps.itemCfNeighbors(df, "b", "i",
      topK = 1000, maxBasket = 20)
    // pair volume from the mega-basket bounded by C(20,2), both
    // orientations; organic pairs add a handful more
    val nPairs = capped.select("item", "neighbor").distinct().count()
    assert(nPairs <= 2 * (20 * 19 / 2 + 8), s"pair volume $nPairs")
    // internal consistency after the cap: n_ab <= min(n_i, n_j), sim <= 1
    capped.collect().foreach { r =>
      val (ab, ni, nj) = (r.getAs[Long]("n_ab"), r.getAs[Long]("n_i"),
        r.getAs[Long]("n_j"))
      assert(ab <= math.min(ni, nj) && r.getAs[Double]("sim") <= 1.0)
    }
    // cap above every basket size == no cap == the adaptive default on
    // organic data (p99 x margin under the floor -> floor 1024 >
    // every basket -> zero trimming)
    val small = organic.toDF("b", "i")
    val a = EventOps.itemCfNeighbors(small, "b", "i", 5)
      .collect().map(_.toString).sorted.toSeq
    val b = EventOps.itemCfNeighbors(small, "b", "i", 5,
        maxBasket = Int.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("itemCfNeighbors adaptive cap: a planted bot basket far past the " +
      "size distribution trims to the corpus' own scale; organic-only " +
      "data is untouched") {
    // 300 organic 3-item baskets (p99 = 3 -> cap = floor 1024) + one
    // 2000-item bot basket: the adaptive default must cut the bot to
    // 1024 while an organic-only corpus matches the uncapped plan
    val organic = (0 until 300).flatMap(b =>
      (0 until 3).map(j => (b.toLong, (b * 3 + j).toLong % 500)))
    val bot = (0 until 2000).map(i => (-1L, i.toLong + 10000L))
    val df = (organic ++ bot).toDF("b", "i").repartition(9)
    val adaptive = EventOps.itemCfNeighbors(df, "b", "i", topK = 2000)
    // the bot basket's items appear, but its contribution is bounded by
    // the floor cap: no item pairs with more than 1023 bot neighbors
    val botPairs = adaptive.filter(col("item") >= 10000L)
      .groupBy("item").count().agg(max("count")).head().getLong(0)
    assert(botPairs <= 1023L, s"bot fan-out $botPairs")
    // n_i of a capped-bot item is its capped presence count (1), so the
    // cosine stays internally consistent
    adaptive.filter(col("item") >= 10000L).collect().foreach { r =>
      assert(r.getAs[Long]("n_ab") <=
        math.min(r.getAs[Long]("n_i"), r.getAs[Long]("n_j")))
    }
    // organic-only: adaptive default == uncapped, bit-identical
    val clean = organic.toDF("b", "i")
    val viaDefault = EventOps.itemCfNeighbors(clean, "b", "i", 10)
      .collect().map(_.toString).sorted.toSeq
    val uncapped = EventOps.itemCfNeighbors(clean, "b", "i", 10,
        maxBasket = Int.MaxValue)
      .collect().map(_.toString).sorted.toSeq
    assert(viaDefault == uncapped)
  }

  test("seasonalityProfile: integer hour/dow, peak tie to earliest hour, " +
      "weekend = engine-neutral (epoch_day+4) mod 7 in {0,6}") {
    def ts(day: Long, hour: Long) =
      (day * 86400L + hour * 3600L) * 1000000L
    // day 3 = 1970-01-04, a Sunday ((3+4)%7 = 0); day 6 ((6+4)%7 = 3) = Wed
    val rows = Seq(("u1", ts(3, 5)), ("u1", ts(3, 5)), ("u1", ts(3, 7)),
      ("u1", ts(6, 5)), ("u2", ts(6, 2)), ("u2", ts(6, 1)))
    val df = rows.toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    val got = EventOps.seasonalityProfile(df, "k", "ts").collect()
      .map(r => r.getAs[String]("k") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_hours"),
          r.getAs[Long]("peak_hour"), r.getAs[Long]("peak_n"),
          r.getAs[Double]("peak_share"), r.getAs[Double]("weekend_share")))
      .toMap
    assert(got("u1") == ((4L, 2L, 5L, 3L, 0.75, 0.75)))
    // u2: hours 1 and 2 each once → peak ties to hour 1; Wednesday only
    assert(got("u2") == ((2L, 2L, 1L, 1L, 0.5, 0.0)))
  }

  test("rfm: recency anchored at stream max, quintiles 5 = best") {
    // 5 users: user i has i+1 events, value 10·(i+1) each, last event
    // (4-i) days before the anchor (user 4 owns the anchor event)
    val rows = (0 to 4).flatMap { i =>
      (0 to i).map { j =>
        (i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
          ((4L - i) * -1L + 10L) * 86400L + j * 60L)), 10.0 * (i + 1))
      }
    }
    val df = rows.toDF("user_id", "ts", "value")
    val out = EventOps.rfm(df, "user_id", "ts", "value")
      .orderBy("user_id").collect()
    // user 4: most recent, most frequent, highest total → 555
    val m = out.map(r => r.getAs[Long]("user_id") ->
      (r.getAs[Long]("recency_days"), r.getAs[Long]("frequency"),
        r.getAs[Long]("rfm_code"))).toMap
    assert(m(4L)._3 == 555L)
    assert(m(0L) == ((4L, 1L, 111L)))
    assert(out.map(_.getAs[Long]("r_score")).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("survivalLabels: event time vs censoring, late joiners excluded") {
    def ts(sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val h = 100L * 1000000L // 100-second horizon
    // max ts = 200s → anchor = 100s.
    // u1: active at 50s, converts at 130s → duration 30s, event 1
    // u2: active at 60s, no conversion → censored at horizon
    // u3: first seen at 150s (after anchor) → excluded
    // u4: active at 70s, conversion at 250s (outside horizon... max ts is
    //     250 then! keep all qualifying inside 200) → use purchase at 199s
    val ev = Seq(
      (1L, ts(50), "view"), (1L, ts(130), "purchase"),
      (2L, ts(60), "view"), (2L, ts(140), "view"),
      (3L, ts(150), "purchase"),
      (4L, ts(70), "view"), (4L, ts(199), "purchase"),
      (9L, ts(200), "view") // sets max ts
    ).toDF("user_id", "ts", "event_type")
    val out = EventOps.survivalLabels(ev, "user_id", "ts",
        col("event_type") === "purchase", h)
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("duration_us"), r.getAs[Long]("event"))).toMap
    assert(!out.contains(3L) && !out.contains(9L))
    assert(out(1L) == ((30L * 1000000L, 1L)))
    assert(out(2L) == ((h, 0L)))
    assert(out(4L) == ((99L * 1000000L, 1L)))
  }

  test("rollingAnomaly: cold start NULL, spike flagged against own history") {
    def ts(sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // user 1: five quiet events 10.0 then a 100.0 spike, all within 1 day
    val rows = (0 until 5).map(i => (1L, ts(i * 60L), 10.0)) :+
      ((1L, ts(300L), 100.0))
    val df = rows.toDF("user_id", "ts", "value")
    val out = EventOps.rollingAnomaly(df, "user_id", "ts", "value",
        windowMicros = 86400L * 1000000L, minEvents = 5)
      .orderBy("ts").collect()
    // first five rows: fewer than 5 priors (or zero variance) -> NULL z
    assert(out.take(5).forall(r => r.isNullAt(r.fieldIndex("z"))))
    val spike = out.last
    assert(spike.getAs[Long]("n_window") == 5)
    // history is constant 10.0 -> variance 0 -> NULL z even at the spike
    assert(spike.isNullAt(spike.fieldIndex("z")))
    // vary the history so variance is positive: values 8,9,10,11,12
    val rows2 = Seq(8.0, 9.0, 10.0, 11.0, 12.0).zipWithIndex
      .map { case (v, i) => (1L, ts(i * 60L), v) } :+ ((1L, ts(300L), 100.0))
    val out2 = EventOps.rollingAnomaly(rows2.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", 86400L * 1000000L, 5)
      .orderBy("ts").collect()
    val sp = out2.last
    // mean 10, var 2 -> z = 90/sqrt(2) = 63.64 -> anomaly
    assert(sp.getAs[Double]("var_window") == 2.0)
    assert(math.abs(sp.getAs[Double]("z") - 90.0 / math.sqrt(2.0)) < 1e-4)
    assert(sp.getAs[Boolean]("is_anomaly"))
  }

  test("rollingAnomaly: values beyond the Long*Long square range (|v| > " +
      "~3035) stay exact — no silent wrap in the Σv² accumulator") {
    def ts(sec: Long) =
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // values around 1e6: (1e6·1e6_micro)² ≫ Long.Max if squared as Long;
    // history mean 1e6, var 2 (values 1e6±{0,1,2}) — same algebra as the
    // small-value case, so the z formula must come out identical
    val base = 1000000.0
    val rows = Seq(base - 2, base - 1, base, base + 1, base + 2).zipWithIndex
      .map { case (v, i) => (1L, ts(i * 60L), v) } :+
      ((1L, ts(300L), base + 90.0))
    val out = EventOps.rollingAnomaly(rows.toDF("user_id", "ts", "value"),
        "user_id", "ts", "value", 86400L * 1000000L, 5)
      .orderBy("ts").collect()
    val sp = out.last
    assert(sp.getAs[Double]("var_window") == 2.0)
    assert(math.abs(sp.getAs[Double]("z") - 90.0 / math.sqrt(2.0)) < 1e-4)
  }

  test("behaviorEntropy: uniform two types = ln 2; single type = +0.0") {
    val ev = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "a"))
      .toDF("user_id", "event_type")
    val m = EventOps.behaviorEntropy(ev, "user_id", "event_type")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_types"), r.getAs[Double]("entropy_nats"))).toMap
    assert(m(1L)._1 == 2)
    assert(math.abs(m(1L)._2 - math.log(2.0)) < 1e-8)
    assert(m(2L) == ((1L, 0.0)))
    assert(1.0 / m(2L)._2 > 0) // +0.0, not -0.0
  }

  test("seasonalNaive: d-7 lag forecast, NULL on the first week") {
    def ts(d: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(d * 86400L + 60L))
    // day 0: 2 events; day 7: 5 events; day 14: 1 event
    val ev = (Seq.fill(2)(0L) ++ Seq.fill(5)(7L) ++ Seq(14L))
      .map(d => Tuple1(ts(d))).toDF("ts")
    val m = EventOps.seasonalNaive(ev, "ts").collect()
      .map(r => r.getAs[Long]("day") ->
        (r.getAs[Long]("actual"), Option(r.get(r.fieldIndex("forecast"))),
          Option(r.get(r.fieldIndex("abs_err"))))).toMap
    assert(m(0L) == ((2L, None, None)))
    assert(m(7L) == ((5L, Some(2L), Some(3L))))
    assert(m(14L) == ((1L, Some(5L), Some(4L))))
  }

  test("holtWinters: bit-identical to the plain-Scala nano-integer " +
      "replay; zero-filled grid days and floor-division signs covered") {
    def ts(d: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(d * 86400L + 60L))
    val (season, gridDays) = (3, 10)
    // counts per day over the 10-day grid (day 5 has none: zero-filled;
    // a falling tail forces negative trend/seasonal intermediates)
    val counts = Map(0L -> 4, 1L -> 9, 2L -> 2, 3L -> 7, 4L -> 1,
      6L -> 3, 7L -> 8, 8L -> 1, 9L -> 2)
    val ev = counts.toSeq.flatMap { case (d, n) => Seq.fill(n)(d) }
      .map(d => Tuple1(ts(d))).toDF("ts")
    val got = graft.ops.EventOps.holtWinters(ev, "ts", season, gridDays,
        alphaNum = 3, alphaDen = 10, betaNum = 1, betaDen = 10,
        gammaNum = 2, gammaDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    // reference: the same recursion in BigInt with true floor division
    val N = BigInt(1000000000L)
    def fd(x: BigInt, d: Int): BigInt = {
      val q = x /% d match { case (q0, r0) => if (r0 < 0) q0 - 1 else q0 }
      q
    }
    val y = (0L until gridDays).map(d => BigInt(counts.getOrElse(d, 0)))
    var l = fd(y.take(season).map(_ * N).sum, season)
    var b = BigInt(0)
    var s = y.take(season).map(_ * N - l).toVector
    val expect = (season until gridDays.toInt).map { t =>
      val yN = y(t) * N
      val sh = s.head
      val fc = l + b + sh
      val l1 = fd(3 * (yN - sh) + 7 * (l + b), 10)
      val b1 = fd(1 * (l1 - l) + 9 * b, 10)
      val s1 = fd(2 * (yN - l1) + 8 * sh, 10)
      l = l1; b = b1; s = s.tail :+ s1
      (t.toLong, y(t).toLong, fc.toLong, l1.toLong, b1.toLong, s1.toLong)
    }
    assert(got == expect, s"\n$got\nvs\n$expect")
    // the zero-filled day is present with actual = 0
    assert(got.exists(r => r._1 == 5L && r._2 == 0L))
  }

  test("holtWinters: a daily count past the BIGINT nano-state bound " +
      "fails loudly instead of wrapping mid-recursion") {
    val spark2 = spark
    import spark2.implicits._
    // the spec seam: counts no real stream could produce, injected as a
    // pre-aggregated daily relation
    val huge = (0L until 10L).map(d =>
      (d, if (d == 6L) 2000000000L else 5L)).toDF("__day", "__y")
    val ex = intercept[Exception] {
      graft.ops.EventOps.holtWintersDaily(huge, 3, 10, 3, 10, 1, 10,
        2, 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("holtWinters")),
      msgs(ex).mkString(" | "))
    // the same series inside the bound fits (happy path unchanged)
    val sane = (0L until 10L).map(d => (d, d + 5L)).toDF("__day", "__y")
    assert(graft.ops.EventOps.holtWintersDaily(sane, 3, 10, 3, 10, 1, 10,
      2, 10).count() == 7L)
  }

  test("holtWinters / holtWintersMult: EMPTY input is a no-op, not a " +
      "raise (the NULL max(__y) gate predicate must not fall into the " +
      "overflow branch)") {
    val spark2 = spark
    import spark2.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("__day", "__y")
    assert(graft.ops.EventOps.holtWintersDaily(empty, 3, 10, 3, 10, 1,
      10, 2, 10).count() == 0L)
    assert(graft.ops.EventOps.holtWintersMultDaily(empty, 3, 10, 3, 10,
      1, 10, 2, 10).count() == 0L)
  }

  test("holtWintersMult: a daily count past the BIGINT query-edge bound " +
      "fails loudly instead of silently NULLing the cast state") {
    val spark2 = spark
    import spark2.implicits._
    val huge = (0L until 10L).map(d =>
      (d, if (d == 6L) 3000000000L else 5L)).toDF("__day", "__y")
    val ex = intercept[Exception] {
      graft.ops.EventOps.holtWintersMultDaily(huge, 3, 10, 3, 10, 1, 10,
        2, 10).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("holtWintersMult")),
      msgs(ex).mkString(" | "))
    // inside the bound the same series fits with non-NULL state
    val sane = (0L until 10L).map(d => (d, d + 5L)).toDF("__day", "__y")
    val rows = graft.ops.EventOps.holtWintersMultDaily(sane, 3, 10, 3,
      10, 1, 10, 2, 10).collect()
    assert(rows.length == 7 && rows.forall(r => !r.isNullAt(3)))
  }

  test("holtWintersMult: bit-identical to the plain-BigInt ratio replay " +
      "on the +1-shifted anchored series; a genuinely multiplicative " +
      "series yields seasonal ratios near the true factors") {
    def ts(d: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(d * 86400L + 60L))
    val (season, gridDays) = (3, 12)
    // level ~ doubles across the window; seasonal factors ~ (0.5, 1, 2):
    // the case multiplicative HW exists for. Day 7 empty (interior zero)
    val counts = Map(0L -> 4, 1L -> 8, 2L -> 16, 3L -> 5, 4L -> 10,
      5L -> 20, 6L -> 6, 8L -> 24, 9L -> 8, 10L -> 16, 11L -> 32)
    val ev = counts.toSeq.flatMap { case (d, n) => Seq.fill(n)(d) }
      .map(d => Tuple1(ts(d))).toDF("ts")
    val got = graft.ops.EventOps.holtWintersMult(ev, "ts", season,
        gridDays, 3, 10, 1, 10, 2, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    val N = BigInt(1000000000L)
    def fd(x: BigInt, d: BigInt): BigInt =
      x /% d match { case (q0, r0) => if (r0 < 0) q0 - 1 else q0 }
    val y = (0L until gridDays).map(d => BigInt(counts.getOrElse(d, 0)))
    def ypp(t: Int): BigInt = y(t) + 1
    var l = fd((0 until season).map(t => ypp(t) * N).sum, season)
    var b = BigInt(0)
    var s = (0 until season)
      .map(t => fd(ypp(t) * N * N, l.max(1))).toVector
    val expect = (season until gridDays.toInt).map { t =>
      val yE = ypp(t) * N * N
      val sh = s.head
      val fc = fd((l + b) * sh, N)
      val l1 = fd(3 * fd(yE, sh.max(1)) + 7 * (l + b), 10)
      val b1 = fd(1 * (l1 - l) + 9 * b, 10)
      val s1 = fd(2 * fd(yE, l1.max(1)) + 8 * sh, 10)
      l = l1; b = b1; s = s.tail :+ s1
      (t.toLong, y(t).toLong, (fc - N).toLong, l1.toLong, b1.toLong,
        s1.toLong)
    }
    assert(got == expect, s"\n$got\nvs\n$expect")
    // seasonal ratios track the true (0.5, 1, 2)-ish factors: the slot
    // that carries the 2x factor reads near 2e9 nano, the 0.5x slot
    // well under 1e9 — multiplicative state is RATIOS, not residuals
    val lastSeason = got.takeRight(season).map(_._6)
    assert(lastSeason.max > 1400000000L && lastSeason.min < 800000000L,
      lastSeason.toString)
  }

  test("fanoBurstiness: metronome reads 0, bursty reads > 1, " +
      "hand-computed values exact") {
    val spark2 = spark
    import spark2.implicits._
    val us = 86400000000L
    // metronome: 5 events/day for 4 days → var 0 → F = 0
    // bursty: counts (1, 9) over 2 days: mean 5, pop-var 16 → F = 3.2
    val rows =
      (0 until 4).flatMap(d => Seq.fill(5)(("m", d.toLong * us))) ++
      Seq.fill(1)(("b", 0L)) ++ Seq.fill(9)(("b", us))
    val out = EventOps.fanoBurstiness(rows.toDF("u", "ts_us"), "u", "ts_us")
      .collect().map(r => r.getAs[String]("key") -> r).toMap
    assert(out("m").getAs[Double]("fano") == 0.0)
    assert(out("m").getAs[Double]("mean_per_day") == 5.0)
    assert(out("b").getAs[Double]("fano") == 3.2)
    assert(out("b").getAs[Long]("n_days") == 2 &&
      out("b").getAs[Long]("n_events") == 10)
  }

  test("cusumChangepoints: a persistent level shift accumulates to an " +
      "alarm on the exact hand-traced days") {
    val spark2 = spark
    import spark2.implicits._
    val us = 86400000000L
    // days 0–9 at 10 events, days 10–19 at 13: μ=11.5 σ=1.5 k=0.75 h=6.
    // retrospective CUSUM vs the global mean: the low first half drives
    // s⁻ = 0.75·(d+1) → alarms d=8,9 (6.75, 7.5); after the shift
    // s⁺ = 0.75·(d−9) → alarms d=18,19
    val df = (0 until 20).flatMap(d =>
      Seq.fill(if (d < 10) 10 else 13)(d.toLong * us)).toDF("ts_us")
    val out = EventOps.cusumChangepoints(df, "ts_us")
      .collect().map(r => r.getAs[Long]("day") ->
        (r.getAs[Double]("cusum_pos"), r.getAs[Double]("cusum_neg"),
          r.getAs[Boolean]("alarm"))).toMap
    assert(out.filter(_._2._3).keySet == Set(8L, 9L, 18L, 19L), out.toString)
    assert(out(8L)._2 == 6.75 && out(19L)._1 == 7.5)
    assert(out(0L)._1 == 0.0) // flat start: positive side pinned at 0
    // a constant stream never alarms (σ = 0 → h = 0 but both sums stay 0)
    val flat = (0 until 10).flatMap(d => Seq.fill(5)(d.toLong * us))
      .toDF("ts_us")
    assert(EventOps.cusumChangepoints(flat, "ts_us")
      .collect().forall(!_.getAs[Boolean]("alarm")))
  }

  test("markovPerplexity: hand-computed held-out bits with smoothing on " +
      "an unseen transition; the split never leaks a user's own history") {
    val spark2 = spark
    import spark2.implicits._
    // md5 folds (k=4): users 1,2,3,5 train (folds 1,0,0,2), user 4 tests
    val ev = Seq(
      (2L, 1L, 0L, "A"), (2L, 2L, 1L, "B"), (2L, 3L, 2L, "A"),
      (3L, 4L, 0L, "A"), (3L, 5L, 1L, "B"),
      (4L, 6L, 0L, "A"), (4L, 7L, 1L, "B"), (4L, 8L, 2L, "B")
    ).toDF("user_id", "event_id", "ts_us", "event_type")
    val out = EventOps.markovPerplexity(ev, "user_id", "ts_us",
        "event_id", "event_type", folds = 4)
      .collect().head
    // train: A->B x2, B->A x1; V=2; test: A->B ((2+1)/(2+2), 0.415037499
    // bits) and the UNSEEN B->B ((0+1)/(1+2), 1.584962501 bits) -> the
    // 9-dp bits sum to exactly 2, mean 1.0
    assert((out.getLong(0), out.getLong(1), out.getLong(2),
      out.getDouble(3)) == (3L, 2L, 2L, 1.0), out.toString)
  }

  test("binsegChangepoints: planted two-shift series splits on the exact " +
      "boundary days; flat segments tie to the earliest day at gain 0") {
    val spark2 = spark
    import spark2.implicits._
    val us = 86400000000L
    // daily values 10.00 ×10, 30.00 ×10, 20.00 ×10 (cents 1000/3000/2000)
    // root: split at day 9 (gain (3e5)²/200 = 4.5e8); day 19 is a ZERO-
    // gain split (both sides mean the global 2000) — the argmax must see
    // through it. level 2: right segment splits at 19 (gain 1e8), the
    // flat left segment ties every split at 0 and picks day 0.
    val df = (0 until 30).map { d =>
      (new java.sql.Timestamp(d * us / 1000L),
        if (d < 10) 10.0 else if (d < 20) 30.0 else 20.0)
    }.toDF("ts", "value")
    val out = EventOps.binsegChangepoints(df, "ts", "value", levels = 2)
      .orderBy("level", "lo_day").collect()
      .map(r => (r.getAs[Int]("level"), r.getAs[Long]("lo_day"),
        r.getAs[Long]("hi_day"), r.getAs[Long]("split_day"),
        r.getAs[Long]("n_left"), r.getAs[Long]("n_right"),
        r.getAs[Long]("sum_left_cents"), r.getAs[Long]("sum_right_cents"),
        r.getAs[Double]("gain"))).toSeq
    assert(out == Seq(
      (1, 0L, 29L, 9L, 10L, 20L, 10000L, 50000L, 4.5e8),
      (2, 0L, 9L, 0L, 1L, 9L, 1000L, 9000L, 0.0),
      (2, 10L, 29L, 19L, 10L, 10L, 30000L, 20000L, 1.0e8)), out.toString)
  }

  test("theilSenTrend: recovers a clean slope exactly and shrugs off an " +
      "outlier day that would wreck least squares") {
    val spark2 = spark
    import spark2.implicits._
    val us = 86400000000L
    // days 0..4 with counts 10,12,14,16,18 → every pairwise slope = 2
    def mk(counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, d) => Seq.fill(c)(d.toLong * us) }.toDF("ts_us")
    val clean = EventOps.theilSenTrend(mk(Seq(10, 12, 14, 16, 18)), "ts_us")
      .collect()(0)
    assert(clean.getAs[Double]("slope") == 2.0)
    assert(clean.getAs[Long]("n_days") == 5 &&
      clean.getAs[Long]("n_pairs") == 10)
    assert(clean.getAs[Double]("intercept") == 10.0)
    // day 2 explodes to 1000: the median pairwise slope stays robust
    val dirty = EventOps.theilSenTrend(mk(Seq(10, 12, 1000, 16, 18)),
      "ts_us").collect()(0)
    val s = dirty.getAs[Double]("slope")
    assert(s >= 1.5 && s <= 3.0, s"slope $s dragged by the outlier")
  }

  test("acfPacf: matches a scalar Durbin-Levinson reference on a " +
      "zero-filled fixture; constant series yields nulls") {
    // days 0..9 with a gap at day 4 (zero-filled by the op)
    val series = Seq(0L -> 1.0, 1L -> 3.0, 2L -> 2.0, 3L -> 5.0,
      5L -> 4.0, 6L -> 6.0, 7L -> 2.0, 8L -> 7.0, 9L -> 3.0)
    val df = series.toDF("du", "v")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("v").as("value"))
    val maxLag = 7
    val got = EventOps.acfPacf(df.repartition(4), "ts", "value", maxLag)
      .as[(Long, Option[Double], Option[Double])].collect().toSeq

    // scalar reference over the zero-filled CENT series
    val cents: Seq[BigInt] = (0L to 9L).map(d =>
      BigInt((series.toMap.getOrElse(d, 0.0) * 100).round))
    val n = cents.size
    val sum = cents.sum
    val e = cents.map(x => BigInt(n) * x - sum)
    val den = e.map(v => v * v).sum
    val r: Seq[Double] = (1 to maxLag).map { k =>
      val num = (0 until n - k).map(i => e(i) * e(i + k)).sum
      num.toDouble / den.toDouble
    }
    val phi = Array.ofDim[Double](maxLag + 1, maxLag + 1)
    phi(1)(1) = r(0)
    for (k <- 2 to maxLag) {
      val num = r(k - 1) -
        (1 until k).map(j => phi(k - 1)(j) * r(k - j - 1)).sum
      val dn = 1.0 - (1 until k).map(j => phi(k - 1)(j) * r(j - 1)).sum
      phi(k)(k) = num / dn
      for (j <- 1 until k)
        phi(k)(j) = phi(k - 1)(j) - phi(k)(k) * phi(k - 1)(k - j)
    }
    val expected = (1 to maxLag).map(k =>
      (k.toLong, Some(r(k - 1)), Some(phi(k)(k))))
    assert(got == expected)
    assert(got.head._2 == got.head._3) // pacf(1) = acf(1)

    // constant series: zero variance => every acf/pacf null
    val const = Seq(0L, 1L, 2L, 3L).map(_ -> 2.0).toDF("du", "v")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("v").as("value"))
    val gc = EventOps.acfPacf(const, "ts", "value", 3)
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(gc.forall(x => x._2.isEmpty && x._3.isEmpty))
  }

  test("spendConcentration: hand-computed gini and top-decile share; " +
      "equality floor 0 and single-whale (n-1)/n ceiling") {
    def mk(spends: Seq[Double]) =
      spends.zipWithIndex.map { case (v, i) => (s"u$i", v) }
        .toDF("user_id", "value")
    // spends [1,1,1,1,6]: gini = 2000/5000, top decile = rank-5 whale
    val g1 = EventOps.spendConcentration(mk(Seq(1, 1, 1, 1, 6))
        .repartition(3), "user_id", "value")
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(g1 == ((5L, 10.0, Some(0.4), Some(0.6))))
    // perfect equality => gini exactly 0
    val g2 = EventOps.spendConcentration(mk(Seq.fill(10)(2.5)),
        "user_id", "value")
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(g2._3.contains(0.0))
    // top decile of 10 equal users = exactly 1 user = 10% of spend
    assert(g2._4.contains(0.1))
    // one whale owns everything => gini = (n-1)/n
    val g3 = EventOps.spendConcentration(mk(Seq(0, 0, 0, 0, 10)),
        "user_id", "value")
      .as[(Long, Double, Option[Double], Option[Double])].head()
    assert(g3._3.contains(0.8) && g3._4.contains(1.0))
  }

  test("ewmaForecast: matches the nano-quantized closed form exactly " +
      "and tracks the real half-life recursion; zero-fills gaps") {
    // days 0,1,2,4,5 (gap at 3)
    val series = Seq(0L -> 4.0, 1L -> 8.0, 2L -> 2.0, 4L -> 6.0,
      5L -> 10.0)
    val df = series.toDF("du", "v")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("v").as("value"))
    val got = EventOps.ewmaForecast(df.repartition(3), "ts", "value")
      .as[(Long, Long, Double, Double)].collect().toSeq

    val cents: Seq[Long] = (0L to 5L).map(d =>
      (series.toMap.getOrElse(d, 0.0) * 100).round)
    def nanoForecast(t: Int): BigInt = {
      val tail = (1 until t).map(a =>
        BigInt(cents(a)) * 1000000000L / (BigInt(1) << (t - a)))
      val head = BigInt(cents(0)) * 1000000000L / (BigInt(1) << (t - 1))
      tail.sum + head
    }
    val expected = (1 to 5).map { t =>
      val n = nanoForecast(t)
      (t.toLong, cents(t), n.toDouble / 1e9,
        (BigInt(cents(t)) * 1000000000L - n).abs.toDouble / 1e9)
    }
    assert(got == expected)
    // the quantized forecast sits within a whisker of the real
    // s_t = (x_t + s_{t-1})/2 recursion
    var level = cents(0).toDouble
    val recur = (1 to 5).map { t =>
      val f = level; level = (cents(t) + level) / 2.0; f
    }
    got.zip(recur).foreach { case ((_, _, f, _), r) =>
      assert(math.abs(f - r) < 1e-6, s"$f vs $r")
    }
  }

  test("seriesDtwPairs / graft_dtw: kernel matches a scalar DP " +
      "reference, banded and unbounded; a pure phase shift is cheap " +
      "for DTW where L1 pays a full day") {
    def ref(a: Seq[Long], b: Seq[Long], band: Int): Long = {
      val n = a.size; val m = b.size
      val w = if (band < 0) Int.MaxValue else math.max(band, math.abs(n - m))
      val inf = Long.MaxValue / 4
      val d = Array.fill(n + 1, m + 1)(inf); d(0)(0) = 0L
      for (i <- 1 to n; j <- 1 to m if math.abs(i - j) <= w)
        d(i)(j) = math.abs(a(i - 1) - b(j - 1)) +
          math.min(d(i - 1)(j), math.min(d(i)(j - 1), d(i - 1)(j - 1)))
      d(n)(m)
    }
    val rnd = new scala.util.Random(11)
    for (band <- Seq(-1, 2, 5)) {
      val a = Seq.fill(13)(rnd.nextInt(40).toLong)
      val b = Seq.fill(11)(rnd.nextInt(40).toLong)
      val got = Seq((a.toArray, b.toArray)).toDF("sa", "sb")
        .selectExpr(s"graft_dtw(sa, sb, $band) AS d")
        .as[Long].head()
      assert(got == ref(a, b, band), s"band=$band")
    }
    // phase shift: identical pulse trains offset by one step
    val pulse = Seq(0L, 9L, 0L, 0L, 9L, 0L, 0L, 9L, 0L)
    val shifted = pulse.tail :+ 0L
    val dtw = Seq((pulse.toArray, shifted.toArray)).toDF("sa", "sb")
      .selectExpr("graft_dtw(sa, sb, -1) AS d").as[Long].head()
    val l1 = pulse.zip(shifted).map { case (x, y) => math.abs(x - y) }.sum
    assert(dtw < l1 && dtw <= 9L, s"dtw=$dtw l1=$l1")
    // empty sentinels
    val es = Seq((Array.empty[Long], Array(1L, 2L)),
      (Array.empty[Long], Array.empty[Long])).toDF("sa", "sb")
      .selectExpr("graft_dtw(sa, sb, -1) AS d").as[Long].collect()
    assert(es.toSeq == Seq(-1L, 0L))

    // the pairs op on a hand stream: two types, known daily series
    val ev = (Seq.fill(3)((0L, "a")) ++ Seq.fill(1)((1L, "a")) ++
      Seq.fill(1)((0L, "b")) ++ Seq.fill(3)((2L, "b"))).toDF("du", "et")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("et"))
    val got = EventOps.seriesDtwPairs(ev, "ts", "et", band = 7)
      .as[(String, String, Long, Long)].head()
    // a: (3,1,0)  b: (1,0,3) over the 3-day span
    assert(got._1 == "a" && got._2 == "b" && got._3 == 3)
    assert(got._4 == ref(Seq(3L, 1L, 0L), Seq(1L, 0L, 3L), 7))
  }

  test("forecastAccuracy: MASE matches the scalar nano computation on " +
      "a 10-day fixture; a perfectly weekly series gives naive MAE 0 " +
      "and null MASE") {
    val series = (0L to 9L).map(d => d -> (d * 3 + 1).toDouble)
    val df = series.toDF("du", "v")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("v").as("value"))
    val got = EventOps.forecastAccuracy(df, "ts", "value")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    val cents = series.map { case (_, v) => (v * 100).round }
    def nanoForecast(t: Int): BigInt = {
      val tail = (1 until t).map(a =>
        BigInt(cents(a)) * 1000000000L / (BigInt(1) << (t - a)))
      tail.sum + BigInt(cents(0)) * 1000000000L / (BigInt(1) << (t - 1))
    }
    val days = 7 to 9
    val se = days.map(t =>
      (BigInt(cents(t)) * 1000000000L - nanoForecast(t)).abs).sum
    val sn = days.map(t =>
      BigInt((cents(t) - cents(t - 7)).abs) * 1000000000L).sum
    assert(got._1 == days.size)
    assert(got._2.contains(sn.toDouble / (3 * 1.0e9)))
    assert(got._3.contains(se.toDouble / (3 * 1.0e9)))
    assert(got._4.contains(se.toDouble / sn.toDouble))
    // exact weekly repetition: lag-7 is perfect, MASE undefined
    val weekly = (0L to 13L).map(d => d -> (10.0 + (d % 7)))
      .toDF("du", "v")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("v").as("value"))
    val gw = EventOps.forecastAccuracy(weekly, "ts", "value")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(gw._2.contains(0.0) && gw._4.isEmpty)
  }

  test("olsTrend: hand-computed slope/intercept/r2; degenerate keys null") {
    val df = Seq(
      // a: exact line y = 2x + 1
      ("a", 0L, 1L), ("a", 1L, 3L), ("a", 2L, 5L),
      // b: sxx=6 cxy=3 cyy=6 -> slope .5, intercept .5, r2 .25
      ("b", 0L, 0L), ("b", 1L, 2L), ("b", 2L, 1L),
      // c: single point; d: constant x
      ("c", 5L, 7L), ("d", 2L, 1L), ("d", 2L, 3L)
    ).toDF("k", "x", "y")
    val out = EventOps.olsTrend(df, "k", col("x"), col("y"))
      .orderBy("k").collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("n_points"),
        Option(r.getAs[java.lang.Double]("slope")),
        Option(r.getAs[java.lang.Double]("intercept")),
        Option(r.getAs[java.lang.Double]("r2")))).toSeq
    assert(out == Seq(
      ("a", 3L, Some(2.0), Some(1.0), Some(1.0)),
      ("b", 3L, Some(0.5), Some(0.5), Some(0.25)),
      ("c", 1L, None, None, None),
      ("d", 2L, None, None, None)))
  }

  test("conformalForecast: hand-computed order-statistic width and " +
      "held-out coverage; too-few calibration days => empty (infinite " +
      "interval)") {
    // one event per day 0..20, value (d*d mod 13)+1 dollars; lag-7
    // errors exist for days 7..20; md5(d)%2 calibration days are
    // {7,8,10,11,13..19} (n_cal=11, k=ceil(12*0.8)=10 -> q=1000 cents);
    // test days 9,12,20 with errors 100,1100,1000 -> 2/3 covered
    val df = (0L to 20L).map(d =>
        (d, ((d * d) % 13 + 1).toDouble)).toDF("du", "value")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("value"))
    val out = EventOps.conformalForecast(df, "ts", "value").collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_cal") == 11L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("q_cents") == 1000L)
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(math.abs(r.getAs[Double]("coverage") - 2.0 / 3.0) < 1e-15)
    // <= 3 calibration days: k = ceil((n_cal+1)*0.8) > n_cal -> no
    // finite rank -> q NULL = the INFINITE interval, every test day
    // covered (the Eval.conformalInterval convention)
    val tiny = (0L to 9L).map(d => (d, 1.0 + d)).toDF("du", "value")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("value"))
    val t = EventOps.conformalForecast(tiny, "ts", "value").collect()
    assert(t.length == 1)
    assert(t.head.isNullAt(t.head.fieldIndex("q_cents")))
    assert(t.head.getAs[Double]("coverage") == 1.0)
    // fewer than seasonDays+1 days: no lag forecast exists for any day,
    // the test half is EMPTY, and there is nothing to measure coverage
    // on -> ZERO rows (not a null-filled row; the documented second
    // degeneracy, matched by the oracle construction)
    val tooShort = (0L to 6L).map(d => (d, 1.0 + d)).toDF("du", "value")
      .select(timestamp_micros(col("du") * 86400000000L).as("ts"),
        col("value"))
    assert(EventOps.conformalForecast(tooShort, "ts", "value")
      .collect().isEmpty)
  }
}
