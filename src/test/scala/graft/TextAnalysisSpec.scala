package graft

import graft.ops.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox"),
    (2L, "aa aa aa"),
    (3L, ""),
    (4L, "el que de la y!!")
  ).toDF("doc_id", "text")

  test("token stats: counts, distinct, avg length; empty doc guarded") {
    val m = TextAnalysis.tokenStats(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct_tokens"),
          r.getAs[Double]("avg_token_len"))).toMap
    assert(m(1L) == ((4L, 4L, 16.0 / 4)))
    assert(m(2L) == ((3L, 1L, 2.0)))
    assert(m(3L) == ((0L, 0L, 0.0)))
  }

  test("quality score: repetitive doc scores below diverse doc; empty is 0") {
    val m = TextAnalysis.qualityScore(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality_score"))
      .toMap
    assert(m(1L) > m(2L))
    assert(m(3L) == 0.0)
    assert(m.values.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("langId: argmax profile wins; empty doc deterministic") {
    val out = TextAnalysis.langId(docs, "doc_id", "text", TextQueriesProfiles())
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")  // 'the' hits en profile
    assert(out(4L) == "es")  // el/que/de/la/y all hit es
    // no hits anywhere: every score 0 → lexicographically last profile code
    assert(out(3L) == TextQueriesProfiles().map(_._1).max)
  }

  test("repetition stats: repeated bigrams dominate; unique text scores 0") {
    val m = TextAnalysis.repetitionStats(docs, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_ngrams"), r.getAs[Double]("top_ngram_frac"),
          r.getAs[Double]("dup_ngram_frac"))).toMap
    // "the quick brown fox": 3 bigrams, all distinct
    assert(m(1L) == ((3L, round6(1.0 / 3), 0.0)))
    // "aa aa aa": bigrams ["aa aa", "aa aa"] — fully repeated
    assert(m(2L) == ((2L, 1.0, 0.5)))
    // empty doc: zero bigrams, fractions 0 by guard
    assert(m(3L) == ((0L, 0.0, 0.0)))
  }

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("regex tokenization splits letter runs, digits, punctuation") {
    val d = Seq((1L, "Hello, world-42!")).toDF("doc_id", "text")
    val r = TextAnalysis.regexTokenStats(d, "doc_id", "text").head()
    // tokens: hello , world - 42 !
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_number_tokens") == 1L)
    assert(r.getAs[Long]("n_punct_tokens") == 3L)
  }

  test("char-ngram langId picks the profile sharing trigrams") {
    val profiles = Seq(
      "en" -> Seq("the quick brown fox and the hound"),
      "de" -> Seq("der schnelle braune fuchs und der hund"))
    val d = Seq((1L, "the hound"), (2L, "der hund")).toDF("doc_id", "text")
    val out = TextAnalysis.langIdCharNgrams(d, "doc_id", "text", profiles)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en" && out(2L) == "de")
  }

  test("bm25: hand-computed scores, absent-term docs excluded, ranked") {
    val d = Seq(
      (1L, "join join hash"),
      (2L, "join scan scan scan"),
      (3L, "scan merge")).toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(d, "doc_id", "text", Seq("join"), 10)
      .as[(Long, Double)].collect()
    // N=3, avgdl=3, df(join)=2 → idf=ln(1.6); doc1 tf=2 dl=3, doc2 tf=1 dl=4
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(math.abs(out(0)._2 - 0.646255) < 1e-9)
    assert(math.abs(out(1)._2 - 0.413603) < 1e-9)
  }

  test("rolling fingerprint is order-sensitive, set hashes are not") {
    val d = Seq((1L, "a b c"), (2L, "c b a")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("doc_fingerprint"))
      .toMap
    assert(fp(1L) != fp(2L))
    val fpMd5 = TextAnalysis.fingerprintMd5(d, "doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_fingerprint")).distinct
    assert(fpMd5.length == 2)
  }

  private def TextQueriesProfiles() = graft.queries.TextQueries.Profiles

  test("noveltyScore: all-common-token boilerplate scores below a " +
      "rare-token document; ubiquitous tokens carry zero bits") {
    val docs = Seq(
      (1L, "common words here"), (2L, "common words here"),
      (3L, "common words here"), (4L, "common words xylophone"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("novelty_bits")).toMap
    // docs 1-3 share every token (df 4,4,3 of N=4); doc 4's "xylophone"
    // has df 1 → 2 bits, pulling its mean above the boilerplate docs
    assert(out(4L) > out(1L), out.toString)
    assert(out(1L) == out(2L) && out(2L) == out(3L))
    // a token in every document carries exactly 0 bits: single-doc corpus
    val solo = TextAnalysis.noveltyScore(
        Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text")
      .select("novelty_bits").as[Double].head()
    assert(solo == 0.0)
  }

  test("dupNgramCoverage: positions covered by cross-doc-shared trigrams; " +
      "within-doc-only repetition does not count; short docs absent") {
    val d = Seq(
      (1L, "a b c d e"),        // trigrams: abc bcd cde
      (2L, "a b c x y"),        // shares "a b c" with doc 1
      (3L, "q q q q"),          // "q q q" ×2 — repeated WITHIN one doc only
      (4L, "zz"))               // < 3 tokens → no positions, no row
      .toDF("doc_id", "text")
    val m = TextAnalysis.dupNgramCoverage(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_positions"), r.getAs[Long]("n_dup_positions"),
          r.getAs[Double]("dup_coverage"))).toMap
    assert(m(1L) == ((3L, 1L, round6(1.0 / 3))))
    assert(m(2L) == ((3L, 1L, round6(1.0 / 3))))
    // df counts DOCUMENTS, not occurrences: doc 3's gram df = 1 → no dup
    assert(m(3L) == ((2L, 0L, 0.0)))
    assert(!m.contains(4L))
  }

  test("bigramLmBits: hand-computed add-one bigram cross-entropy; " +
      "boilerplate scores below a novel continuation") {
    // corpus: "a b" ×3 and "a c" ×1 → C(a·)=4, V=3, C(ab)=3, C(ac)=1
    val d = Seq((1L, "a b"), (2L, "a b"), (3L, "a b"), (4L, "a c"))
      .toDF("doc_id", "text")
    val m = TextAnalysis.bigramLmBits(d, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("bits_per_token"))).toMap
    def bits(bc: Long, uc: Long, v: Long): Double =
      BigDecimal(-math.log((bc + 1.0) / (uc + v)) / math.log(2.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(m(1L) == ((1L, round6(bits(3, 4, 3)))))
    assert(m(4L) == ((1L, round6(bits(1, 4, 3)))))
    // the frequent continuation is more predictable → fewer bits
    assert(m(1L)._2 < m(4L)._2)
  }

  test("gopherRules: each rule sets its own drop-mask bit") {
    val docs = Seq(
      // 0: passes every rule (21 short words incl. stopword "the")
      (0L, ("the " + Seq.tabulate(20)(i => s"word$i").mkString(" "))),
      (1L, "the quick fox"), // too few words → bit 0
      // 2: 25 words, huge mean word length → bit 1
      (2L, Seq.fill(24)("x" * 20).mkString("the ", " ", "")),
      // 3: symbols-only words → bits 1(short),3(no alpha),4(no stopword)
      (3L, Seq.fill(25)("##").mkString(" ")),
      // 4: enough words but no stopword → bit 4
      (4L, Seq.tabulate(25)(i => s"word$i").mkString(" ")))
      .toDF("doc_id", "text")
    val m = TextAnalysis.gopherRules(docs, "doc_id", "text",
        stopwords = Seq("the"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(m(0L).getAs[Boolean]("keep") && m(0L).getAs[Long]("drop_mask") == 0)
    assert(m(1L).getAs[Long]("drop_mask") == 1L)
    assert((m(2L).getAs[Long]("drop_mask") & 2L) == 2L)
    val d3 = m(3L)
    assert(!d3.getAs[Boolean]("keep"))
    assert((d3.getAs[Long]("drop_mask") & 8L) == 8L) // no alphabetic words
    assert((d3.getAs[Long]("drop_mask") & 16L) == 16L) // no stopwords
    assert(d3.getAs[Double]("symbol_ratio") > 0.1)
    assert(m(4L).getAs[Long]("drop_mask") == 16L)
  }

  test("charClassCounts/scriptProfile: class tallies, whitespace is not " +
      "control, replacement char flags mojibake") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq(
      (0L, "en", "abc 12!"),            // 3 letters, 1 space, 2 digits, 1 punct
      (1L, "en", "line1\nline2\u0001"), // \n = space; U+0001 = control
      (2L, "fr", "café �"))   // é non-ascii; U+FFFD replacement
      .toDF("doc_id", "lang", "text")
    val c = TextAnalysis.charClassCounts(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(c(0L).getAs[Long]("n_letters") == 3 &&
      c(0L).getAs[Long]("n_digits") == 2 &&
      c(0L).getAs[Long]("n_spaces") == 1 &&
      c(0L).getAs[Long]("n_punct") == 1 &&
      c(0L).getAs[Long]("n_control") == 0)
    assert(c(1L).getAs[Long]("n_spaces") == 1 &&
      c(1L).getAs[Long]("n_control") == 1)
    assert(c(2L).getAs[Long]("n_nonascii") == 2 && // é and U+FFFD
      c(2L).getAs[Long]("n_replacement") == 1)
    val p = TextAnalysis.scriptProfile(docs, "lang", "text").collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    // en: doc 1 flagged (control), doc 0 clean; fr: flagged (replacement)
    assert(p("en").getAs[Long]("n_docs") == 2 &&
      p("en").getAs[Long]("n_flagged") == 1)
    assert(p("fr").getAs[Long]("n_flagged") == 1)
    assert(p("en").getAs[Double]("nonascii_ratio") == 0.0)
    assert(p("fr").getAs[Double]("nonascii_ratio") ==
      BigDecimal(2.0 / 6).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
  }

  test("postingLists: df counts distinct docs, tf counts tokens, postings " +
      "sorted and capped") {
    val docs = Seq(
      (3L, "b a a"), (1L, "a b"), (2L, "a")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.postingLists(docs, "doc_id", "text", 2)
      .collect().map(r => r.getAs[String]("term") ->
        (r.getAs[Long]("doc_freq"), r.getAs[Long]("total_tf"),
          r.getAs[Seq[Long]]("postings"))).toMap
    assert(m("a") == ((3L, 4L, Seq(1L, 2L)))) // capped at 2, sorted
    assert(m("b") == ((2L, 2L, Seq(1L, 3L))))
  }

  test("vocabularyOverlap: hand-checked Jaccard over distinct vocab") {
    val docs = Seq(
      ("en", "a b c"), ("en", "a d"), // en vocab {a,b,c,d}
      ("fr", "a b"), ("fr", "e") // fr vocab {a,b,e}
    ).toDF("lang", "text")
    val r = TextAnalysis.vocabularyOverlap(docs, "lang", "text").collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[String]("group_a") == "en" &&
      row.getAs[String]("group_b") == "fr")
    assert(row.getAs[Long]("n_a") == 4 && row.getAs[Long]("n_b") == 3)
    assert(row.getAs[Long]("n_common") == 2) // {a, b}
    assert(row.getAs[Double]("jaccard") == 0.4) // 2 / (4+3-2)
  }

  test("knBigramBits: hand-computed Kneser-Ney probabilities at d = 3/4") {
    val spark2 = spark
    import spark2.implicits._
    // "a b a b c": bigrams ab×2 ba×1 bc×1 → B = 3 types;
    // uc(a)=2 n1p(a)=1; uc(b)=2 n1p(b)=2; nc(a)=nc(b)=nc(c)=1.
    // p(ab) = ((8−3)·3 + 3·1·1)/(8·3) = 18/24 = 0.75  → 0.415037499 bits
    // p(ba) = ((4−3)·3 + 3·2·1)/(8·3) =  9/24 = 0.375 → 1.415037499 bits
    // p(bc) = 0.375. mean = (2·0.415037499 + 2·1.415037499)/4
    //       = 0.915037499 → rounds at 6 dp to 0.915037
    val doc = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val r = TextAnalysis.knBigramBits(doc, "doc_id", "text").collect()(0)
    assert(r.getAs[Long]("n_bigrams") == 4L)
    assert(r.getAs[Double]("bits_per_token") == 0.915037)
    // KN mass check on context b: observed 0.375+0.375 = 0.75 plus the
    // held-out λ(b)·Pcont = (0.75·2/2)·(1/3)·... = the remaining 0.25 —
    // the discount really reserves mass for unseen continuations
  }

  test("compressionRatio: deterministic; repetitive < prose < " +
      "random-ish; empty text guarded") {
    val spark2 = spark
    import spark2.implicits._
    val rep = "spam ham " * 200
    val prose = (1 to 40).map(i =>
      s"sentence $i talks about topic ${i * 7 % 13} with detail").mkString(". ")
    // digits of a quadratic residue sequence — no long repeats
    val rand = (1 to 400).map(i => (i * i * 2654435761L % 97).toString)
      .mkString("")
    val df = Seq((1L, rep), (2L, prose), (3L, rand), (4L, ""))
      .toDF("doc_id", "text")
    def run() = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bytes"), r.getAs[Long]("deflate_bytes"),
          r.getAs[Double]("compression_ratio"))).toMap
    val a = run()
    assert(a == run()) // deterministic
    assert(a(1L)._3 < a(2L)._3 && a(2L)._3 < a(3L)._3)
    assert(a(1L)._3 < 0.1) // boilerplate collapses
    assert(a(4L)._1 == 0L && a(4L)._3 == 0.0) // empty: ratio guarded to 0
  }

  test("ccnetBuckets: per-slice models are independent (slice A's bits " +
      "match the single-model run), tertiles cut by ascending bits") {
    val spark2 = spark
    import spark2.implicits._
    // slice A = the knBigramBits fixture (its bits must be unchanged by
    // slice B's presence — the model keys really are per-slice); B has
    // 3 scoreable docs whose repetitiveness orders their perplexity
    val df = Seq(
      (1L, "a b a b c", "A"),
      (10L, "x x x x x x", "B"),
      (11L, "x y x y z q", "B"),
      (12L, "z q y x q z", "B")).toDF("doc_id", "text", "lang")
    val r = TextAnalysis.ccnetBuckets(df, "doc_id", "text", "lang")
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("slice"), x.getAs[Double]("bits_per_token"),
          x.getAs[String]("bucket"))).toMap
    assert(r(1L)._1 == "A" && r(1L)._2 == 0.915037) // == single-model run
    assert(r(1L)._3 == "head") // a 1-doc slice is all head
    val bBits = Seq(10L, 11L, 12L).map(id => r(id)._2)
    // one doc per tertile in slice B, labels follow ascending bits
    val sorted = Seq(10L, 11L, 12L).sortBy(id => (r(id)._2, id))
    assert(sorted.map(id => r(id)._3) == Seq("head", "middle", "tail"))
    // the metronome doc is the most predictable text in its slice
    assert(r(10L)._2 == bBits.min)
  }

  test("langMixing: a half-en half-de document flags as mixed with a " +
      "50/50 split; monolingual docs do not") {
    val spark2 = spark
    import spark2.implicits._
    val profiles = graft.queries.TextQueries.Profiles
    // chunk 1 = pure en stopwords, chunk 2 = pure de stopwords
    val mixedText = (Seq.fill(5)(Seq("the", "of")).flatten ++
      Seq.fill(5)(Seq("der", "die")).flatten).mkString(" ")
    val docs = Seq(
      (1L, mixedText),
      (2L, Seq.fill(20)("the").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.langMixing(docs, "doc_id", "text", profiles, 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val m = out(1L)
    assert(m.getAs[Boolean]("mixed") && m.getAs[Long]("n_langs") == 2)
    assert(m.getAs[Long]("n_chunks") == 2)
    assert(m.getAs[Double]("majority_ratio") == 0.5)
    // tie at 1 chunk each → later language code wins (the argmax rule)
    assert(m.getAs[String]("majority_lang") == "en")
    val mono = out(2L)
    assert(!mono.getAs[Boolean]("mixed") &&
      mono.getAs[String]("majority_lang") == "en" &&
      mono.getAs[Double]("majority_ratio") == 1.0)
  }

  test("subwordBuckets: boundary-marked char 3-grams with deterministic " +
      "hash buckets; shared morphology shares subwords") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "her where")).toDF("doc_id", "text")
    val out = TextAnalysis.subwordBuckets(docs, "text", 3, 64)
      .orderBy("term", "pos").collect()
      .map(r => (r.getAs[String]("term"), r.getAs[Int]("pos"),
        r.getAs[String]("ngram"), r.getAs[Long]("bucket")))
    val her = out.filter(_._1 == "her").map(_._3).toSeq
    val where = out.filter(_._1 == "where").map(_._3).toSeq
    assert(her == Seq("<he", "her", "er>"))
    assert(where == Seq("<wh", "whe", "her", "ere", "re>"))
    // the shared stem "her" hashes to the SAME bucket in both words
    val b1 = out.find(x => x._1 == "her" && x._3 == "her").get._4
    val b2 = out.find(x => x._1 == "where" && x._3 == "her").get._4
    assert(b1 == b2)
    // single-char word: "<a>" is its one 3-gram
    val one = TextAnalysis.subwordBuckets(
      Seq((1L, "a")).toDF("doc_id", "text"), "text", 3, 64).collect()
    assert(one.length == 1 && one(0).getAs[String]("ngram") == "<a>")
  }

  test("jsDivergence: identical slices read exactly 0; disjoint slices " +
      "approach 1 bit; values stay in [0, 1]") {
    val spark2 = spark
    import spark2.implicits._
    val same = Seq((1L, "a", "x y z x"), (2L, "b", "x y z x"))
      .toDF("doc_id", "lang", "text")
    val r0 = TextAnalysis.jsDivergence(same, "lang", "text", 16)
      .collect()(0)
    assert(r0.getAs[String]("slice_a") == "a" &&
      r0.getAs[String]("slice_b") == "b")
    assert(r0.getAs[Double]("js_bits") == 0.0)
    assert(r0.getAs[Long]("n_tokens_a") == 4L)
    // heavy disjoint vocabularies: JS → 1 bit (add-one smoothing keeps
    // it strictly below)
    val disj = Seq((1L, "a", Seq.fill(500)("aa").mkString(" ")),
      (2L, "b", Seq.fill(500)("zz").mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val r1 = TextAnalysis.jsDivergence(disj, "lang", "text", 16)
      .collect()(0).getAs[Double]("js_bits")
    assert(r1 > 0.8 && r1 <= 1.0, s"js=$r1")
    // three slices → 3 ordered pairs, all bounded
    val tri = Seq((1L, "a", "p q r"), (2L, "b", "p q s"),
      (3L, "c", "t u v")).toDF("doc_id", "lang", "text")
    val rows = TextAnalysis.jsDivergence(tri, "lang", "text", 16).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val v = r.getAs[Double]("js_bits")
      assert(v >= 0.0 && v <= 1.0, s"$r")
      assert(r.getAs[String]("slice_a") < r.getAs[String]("slice_b"))
    }
  }

  test("knBigramBits: frequent-in-context bigrams cost fewer bits than " +
      "rare ones; short docs yield no rows") {
    val spark2 = spark
    import spark2.implicits._
    val docs = Seq((1L, "x y x y x y x z"), (2L, "q")).toDF("doc_id", "text")
    val out = TextAnalysis.knBigramBits(docs, "doc_id", "text").collect()
    assert(out.length == 1 && out(0).getAs[Long]("doc_id") == 1L)
  }

  test("readabilityScores: character-class counts and affine scores " +
      "on hand fixtures; vowel-less words get the 1-syllable floor") {
    val docs = Seq(
      (1L, "the cat. sat!!"),   // 3 words, 3 terminators, 3 vowel groups
      (2L, "grr hmm"),          // no vowels: 2 syllable floors, 1 sentence
      (3L, "beautiful day"))    // beau-ti-ful: eau|i|u + a = 4 groups
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.readabilityScores(docs, "doc_id",
        "text")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    def scores(w: Long, s: Long, y: Long): (Double, Double) = {
      val wps = w.toDouble / s; val spw = y.toDouble / w
      (206.835 - 1.015 * wps - 84.6 * spw,
        0.39 * wps + 11.8 * spw - 15.59)
    }
    val (f1, g1) = scores(3, 3, 3)
    assert(got(0) == ((1L, 3L, 3L, 3L, f1, g1)))
    val (f2, g2) = scores(2, 1, 2)
    assert(got(1) == ((2L, 2L, 1L, 2L, f2, g2)))
    val (f3, g3) = scores(2, 1, 4)
    assert(got(2) == ((3L, 2L, 1L, 4L, f3, g3)))
  }

  test("zipfFit: exact two-point fit (slope -1, r2 ~ 1) and a scalar " +
      "moment reference on a 3-term corpus") {
    // counts a:2 (rank 1), b:1 (rank 2) => y = -x exactly in nano units
    val two = Seq((1L, "a a b")).toDF("doc_id", "text")
    val g2 = graft.ops.TextAnalysis.zipfFit(two, "text")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(g2._1 == 2 && g2._2.contains(-1.0))
    assert(g2._3.contains(0.693147181)) // 9-dp round of ln 2
    assert(math.abs(g2._4.get - 1.0) < 1e-12)

    // 3-term corpus vs an independent BigInt moment computation
    val three = Seq((1L, "a a a a b b c")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.zipfFit(three, "text")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    def nano(v: Double): BigInt =
      (BigDecimal(math.log(v)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000000)).toBigIntExact.get
    val xs = Seq(1.0, 2.0, 3.0).map(nano)   // ranks
    val ys = Seq(4.0, 2.0, 1.0).map(nano)   // counts, freq-desc
    val n = BigInt(3)
    val (sx, sy) = (xs.sum, ys.sum)
    val a = n * xs.zip(ys).map { case (x, y) => x * y }.sum - sx * sy
    val b = n * xs.map(x => x * x).sum - sx * sx
    val c = n * ys.map(y => y * y).sum - sy * sy
    val slope = a.toDouble / b.toDouble
    assert(got._1 == 3 && got._2.contains(slope))
    assert(got._3.contains(
      (sy.toDouble - slope * sx.toDouble) / (3.0 * 1.0e9)))
    assert(got._4.contains(
      a.toDouble * a.toDouble / (b.toDouble * c.toDouble)))
  }

  test("blocklistFilter: hit counts, distinct hits, ratio, and the " +
      "zero-hit keep rule; zero-hit docs keep their row") {
    val docs = Seq(
      (1L, "good clean words here"),
      (2L, "slow merge slow join"),
      (3L, "dup"),
      (4L, "")).toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.blocklistFilter(docs.repartition(3),
        "doc_id", "text", Seq("slow", "dup", "leak"))
      .orderBy("id")
      .as[(Long, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 0L, 0L, 0.0, true),
      (2L, 4L, 2L, 1L, 0.5, false),
      (3L, 1L, 1L, 1L, 1.0, false),
      (4L, 0L, 0L, 0L, 0.0, true)))
  }

  test("vocabGrowth + heapsFit: exact order-statistic checkpoints, " +
      "first-doc vocabulary counts, and a two-point exact fit") {
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "c d e"), (4L, "a"))
      .toDF("doc_id", "text")
    val growth = graft.ops.TextAnalysis.vocabGrowth(docs.repartition(3),
        "doc_id", "text", checkpoints = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(growth == Seq((1L, 2L, 2L, 4L, 3L), (2L, 4L, 4L, 8L, 5L)))
    val fit = graft.ops.TextAnalysis.heapsFit(
        graft.ops.TextAnalysis.vocabGrowth(docs, "doc_id", "text", 2))
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    def nano(v: Double): BigInt =
      (BigDecimal(math.log(v)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
        * BigDecimal(1000000000)).toBigIntExact.get
    val (x1, y1, x2, y2) = (nano(4), nano(3), nano(8), nano(5))
    val beta = (BigInt(2) * (x1 * y1 + x2 * y2) - (x1 + x2) * (y1 + y2))
      .toDouble /
      (BigInt(2) * (x1 * x1 + x2 * x2) - (x1 + x2) * (x1 + x2)).toDouble
    assert(fit._1 == 2 && fit._2.contains(beta))
    assert(math.abs(fit._4.get - 1.0) < 1e-12) // two points fit exactly
  }

  test("textrankKeywords: the co-occurrence hub ranks first; k caps " +
      "the output; ranks form a probability mass") {
    // window 1 over an alternating doc: a pure star around "hub"
    val docs = Seq((1L, "hub x hub y hub z hub x hub y"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.textrankKeywords(docs.repartition(2),
        "doc_id", "text", window = 1, iterations = 3, k = 3)
      .as[(String, Double)].collect().toSeq
    assert(got.size == 3)
    assert(got.head._1 == "hub")
    assert(got.head._2 > got(1)._2)
    // mass: sum over ALL words ~ 1 (9-dp rounding slack per node)
    val all = graft.ops.TextAnalysis.textrankKeywords(docs, "doc_id",
        "text", window = 1, iterations = 3, k = 100)
      .as[(String, Double)].collect()
    assert(all.length == 4)
    assert(math.abs(all.map(_._2).sum - 1.0) < 1e-6)
  }

  test("boolRetrieval: kernel intersection equals the naive containment " +
      "join; unknown terms yield zero rows not errors") {
    val docs = Seq((1L, "a b c"), (2L, "a c"), (3L, "b c"), (4L, "a"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.boolRetrieval(docs.repartition(3),
        "doc_id", "text",
        Seq(("a", "b"), ("a", "c"), ("zz", "a")), maxPostings = 100)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", "b", 3L, 2L, 1L),   // only doc 1 has both
      ("a", "c", 3L, 3L, 2L),   // docs 1 and 2
      ("zz", "a", 0L, 3L, 0L))) // unknown term
  }

  test("domainHardness: train-fold model, held-out scoring, unseen " +
      "bigrams/contexts on the smoothing floor, per-domain pooling") {
    import spark.implicits._
    // md5 folds (n=4, Prep.hashBucket on the id string): ids 2,3,6 -> 0;
    // 1,9,12 -> 1; 5,7,11 -> 2; 4,25,26 -> 3 (held out)
    val docs = Seq(
      (2L, "a a a", "X"), (3L, "a a a", "X"), (6L, "a a a", "X"),
      (1L, "a a a", "X"), (9L, "a a a", "X"), (12L, "d d", "Y"),
      (5L, "d d", "Y"), (7L, "d d", "Y"), (11L, "d d", "Y"),
      // test fold: seen bigram / unseen bigram / unseen context
      (4L, "a a", "X"), (25L, "a d", "Y"), (26L, "c a", "Y")
    ).toDF("doc_id", "text", "source")
    val got = TextAnalysis.domainHardness(docs, "doc_id", "text",
        "source", folds = 4)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    // train model: C(a,a)=10 (5 docs x 2), C(d,d)=4, C(a.)=10, C(d.)=4,
    // V = |{a, d}| = 2
    def bits9(p: Double): BigDecimal =
      BigDecimal(-math.log(p) / math.log(2.0))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal): Double =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val bX = r6(bits9(11.0 / 12.0))        // (a,a): (10+1)/(10+2)
    val bY = r6((bits9(1.0 / 12.0) +       // (a,d): (0+1)/(10+2)
      bits9(1.0 / 2.0)) / 2)               // (c,a): (0+1)/(0+2), uc=0
    assert(got == Seq(("X", 1L, 1L, bX), ("Y", 2L, 2L, bY)), got.toString)
    // seen < unseen: the floor is ABOVE the fitted bigram's bits
    assert(bX < bY)
  }

  test("domainHardnessCv: the fold=folds-1 slice is bit-identical to " +
      "domainHardness (same train folds by count subtraction), and every " +
      "fold scores held-out mass") {
    import org.apache.spark.sql.functions.col
    val docs = graft.sources.Tables.documents(spark,
      "/root/testdata/sf0.001")
    val folds = 4
    val cv = TextAnalysis.domainHardnessCv(docs, "doc_id", "text",
      "source", folds)
    val lastSlice = cv.filter(col("fold") === folds - 1)
      .select("source", "n_docs", "n_bigrams", "bits_per_token")
      .orderBy("source").collect()
    val oneFold = TextAnalysis.domainHardness(docs, "doc_id", "text",
        "source", folds)
      .orderBy("source").collect()
    assert(lastSlice.nonEmpty && lastSlice.sameElements(oneFold))
    // rotation covers every fold for every domain present in all folds,
    // and the total held-out doc mass is the whole bigram-bearing corpus
    val cvRows = cv.collect()
    val nDocsCv = cvRows.map(_.getAs[Long]("n_docs")).sum
    val nDocsAll = TextAnalysis.bigramLmBits(docs, "doc_id", "text")
      .count()
    assert(nDocsCv == nDocsAll,
      s"CV held-out docs $nDocsCv != bigram-bearing docs $nDocsAll")
    // the POOLED variant aggregates the same scored relation: per
    // domain, its masses are the fold sums and its bits sit inside the
    // fold range (it is the c-weighted mean of the unrounded fold bits)
    val pooled = TextAnalysis.domainHardnessCvPooled(docs, "doc_id",
        "text", "source", folds)
      .collect().map(r => r.getString(0) -> r).toMap
    val byDom = cvRows.groupBy(_.getString(0))
    byDom.foreach { case (dom, rows) =>
      val p = pooled(dom)
      assert(p.getAs[Long]("n_docs") == rows.map(_.getAs[Long]("n_docs")).sum)
      assert(p.getAs[Long]("n_bigrams") ==
        rows.map(_.getAs[Long]("n_bigrams")).sum)
      val bits = rows.map(_.getAs[Double]("bits_per_token"))
      val pb = p.getAs[Double]("bits_per_token")
      assert(pb >= bits.min - 1e-6 && pb <= bits.max + 1e-6,
        s"$dom pooled $pb outside fold range ${bits.min}..${bits.max}")
    }
  }

  test("ngramLoop: a repetition loop flags at the exact integer " +
      "threshold (ties to the larger gram); clean prose stays unflagged; " +
      "sub-n docs are absent") {
    val df = Seq(
      (1L, "a b a b a b"),  // grams: aba, bab, aba, bab → max 2/4
      (2L, "a b c d e"),    // three distinct grams → 1/3
      (3L, "x y")           // < 3 tokens → absent
    ).toDF("doc_id", "text")
    val m = graft.ops.TextAnalysis.ngramLoop(df, "doc_id", "text", 3, 50)
      .collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(!m.contains(3L) && m.size == 2)
    val loop = m(1L)
    assert(loop.getAs[Long]("n_grams") == 4 &&
      loop.getAs[Long]("max_count") == 2)
    assert(loop.getAs[String]("top_gram") == "b a b") // count tie → max
    assert(loop.getAs[Double]("loop_ratio") == 0.5)
    assert(loop.getAs[Boolean]("is_loop")) // 2·100 >= 4·50, boundary IN
    val clean = m(2L)
    assert(clean.getAs[Long]("n_grams") == 3 &&
      clean.getAs[Long]("max_count") == 1)
    assert(!clean.getAs[Boolean]("is_loop"))
  }

  test("sgdCalibrated: degenerate all-equal margins raise loudly on the " +
      "Spark side (matching the DuckDB twin's division-by-zero) instead " +
      "of NULL-propagating empty bins") {
    // the seam: a synthetic scored relation where every margin is equal
    val flat = Seq((1L, true, 5L, true), (2L, false, 5L, true),
        (3L, true, 5L, true))
      .toDF("doc_id", "is_target", "score_nano", "predicted")
    val ex = intercept[Exception] {
      graft.queries.TextQueries.sgdCalibratedFrom(flat).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("degenerate margins")),
      msgs(ex).mkString(" | "))
    // a non-degenerate synthetic relation still calibrates: two stages
    val spread = Seq((1L, false, 0L, false), (2L, false, 200L, false),
        (3L, true, 800L, true), (4L, true, 1000L, true))
      .toDF("doc_id", "is_target", "score_nano", "predicted")
    val out = graft.queries.TextQueries.sgdCalibratedFrom(spread)
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("isotonic", "raw"))
  }
}
