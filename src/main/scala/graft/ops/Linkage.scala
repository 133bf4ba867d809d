package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Fellegi–Sunter probabilistic record linkage (Fellegi & Sunter 1969,
  * "A Theory for Record Linkage", JASA) — the cross-source sibling of
  * the dedup family: two views of the same entities with NOISY fields
  * and no shared key are matched by the log-likelihood ratio of their
  * field-agreement pattern. The reference's store upserts by exact
  * entity id (`ML Feature Store Pipeline.py:101-111`); linking a second
  * source that lacks that id is the step before any such upsert at
  * corpus scale.
  *
  * Model: for each comparison field k, `m_k = P(agree | match)` and
  * `u_k = P(agree | non-match)`. A candidate pair scores
  * `Σ_k log₂(m_k/u_k)` over agreeing fields plus
  * `Σ_k log₂((1−m_k)/(1−u_k))` over disagreeing ones; pairs above the
  * review threshold link. Estimation here is SUPERVISED — `m` from a
  * labeled true-pair sample (the classic clerical-review seed), `u`
  * from in-block non-match pairs (random pairs rarely match, the
  * standard u-estimator); the unsupervised EM variant fits the same
  * counts iteratively and plugs into the same weights.
  *
  * Determinism: agreement counts are exact integers; Laplace smoothing
  * `(c+1)/(n+2)` keeps every probability strictly inside (0,1); the
  * per-field weights round to 9 dp (the [[TokenModels]] bits9
  * discipline) and pair scores are exact DECIMAL sums of them.
  *
  * Shape at scale: candidate volume is Σ_b |A_b|·|B_b| over the blocking
  * key — never |A|·|B| — and both fitted weight relations are ONE row,
  * broadcast onto the candidates. The candidate relation materializes
  * once (localCheckpoint) so the u-estimation pass and the scoring pass
  * share it.
  */
object Linkage {

  private val W = DecimalType(18, 9)

  /** Link `a` to `b`: both carry `idCol` (ground-truth entity key, used
    * for m-estimation, for EXCLUDING true pairs from the u-estimation
    * sample, and for the `is_match` audit bit — the u-estimator is
    * therefore also supervised, not just m), `blockCol`, and the
    * comparison `fields`. Returns pairs scoring ≥ `threshold`:
    * (a_id, b_id, n_agree, weight, is_match), one row per candidate pair
    * above threshold.
    *
    * Field-agreement is NULL-SAFE (`<=>`): two NULLs agree, NULL vs
    * non-NULL disagrees — mirror any SQL twin with
    * `IS NOT DISTINCT FROM`, never plain `=` (which yields NULL and
    * silently drops the pair from both m and u counts).
    *
    * `minSeed` guards the degenerate fit: with an EMPTY labeled overlap
    * the Laplace-smoothed m collapses to (0+1)/(0+2) = 0.5 for every
    * field — a silently meaningless model. The check rides the weights
    * plan as a runtime `raise_error` (no extra pass); callers without a
    * labeled seed belong on [[linkageEm]].
    */
  def fellegiSunter(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, fields: Seq[String],
      threshold: Double = 0.0, minSeed: Long = 2L): DataFrame = {
    require(fields.nonEmpty, "linkage needs >= 1 comparison field")
    val aS = a.select(col(idCol).as("__aid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__a_$f")): _*)
    val bS = b.select(col(idCol).as("__bid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__b_$f")): _*)
    // candidates once; u-estimation and scoring share the checkpoint
    val cand = aS.join(bS, Seq("__blk")).localCheckpoint()
    scorePairs(aS.drop("__blk"), bS.drop("__blk"), cand, fields,
      threshold, minSeed)
  }

  /** The FS estimation + scoring core shared by [[fellegiSunter]] and
    * [[fellegiSunterMulti]]: m from the labeled true pairs (id join,
    * NOT the blocks — `aF`/`bF` carry id + fields only), u from the
    * candidates' non-match majority, Laplace-smoothed 9-dp log₂ field
    * weights (1-row relation, broadcast), exact DECIMAL pair scores.
    */
  private def scorePairs(aF: DataFrame, bF: DataFrame, cand: DataFrame,
      fields: Seq[String], threshold: Double, minSeed: Long): DataFrame = {
    require(minSeed >= 1, "minSeed must be >= 1")
    val truePairs = aF.join(bF, col("__aid") === col("__bid"))
    val mAggs = count(lit(1)).as("__n") +: fields.map(f =>
      sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")).as(s"__m_$f"))
    val mRow = truePairs.agg(mAggs.head, mAggs.tail: _*)
    // coalesce: a degenerate block layout with ZERO non-match candidates
    // must yield u = smoothing-floor, not a NULL that swallows every score
    val uAggs = count(lit(1)).as("__nu") +: fields.map(f =>
      coalesce(sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")),
        lit(0L)).as(s"__u_$f"))
    val uRow = cand.filter(col("__aid") =!= col("__bid"))
      .agg(uAggs.head, uAggs.tail: _*)
    // per-field 9-dp log₂ weights from Laplace-smoothed exact counts.
    // __n routes through the minSeed gate so a too-small labeled overlap
    // fails LOUDLY at execution instead of fitting m = 0.5 everywhere;
    // the gate is an expression on the 1-row weights relation — no extra
    // pass, and m depends on it so Catalyst cannot prune it away.
    def lg2(x: Column): Column = round(log(x) / math.log(2.0), 9).cast(W)
    val nGated = when(col("__n") >= minSeed, col("__n")).otherwise(
      raise_error(concat(lit(s"fellegiSunter: labeled true-pair seed has "),
        col("__n"), lit(s" rows < minSeed=$minSeed — m-estimation would " +
          "collapse to Laplace 0.5; use linkageEm for unlabeled data"))))
    val weights = mRow.crossJoin(uRow).select(fields.flatMap { f =>
      val m = (col(s"__m_$f") + 1).cast(DoubleType) / (nGated + 2)
      val u = (col(s"__u_$f") + 1).cast(DoubleType) / (col("__nu") + 2)
      Seq(lg2(m / u).as(s"__wa_$f"), lg2((lit(1.0) - m) / (lit(1.0) - u))
        .as(s"__wd_$f"))
    }: _*)
    val agree = (f: String) => col(s"__a_$f") <=> col(s"__b_$f")
    val score = fields.map(f =>
      when(agree(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f")))
      .reduce(_ + _).cast(DecimalType(28, 9))
    val nAgree = fields.map(f => agree(f).cast("int")).reduce(_ + _)
    cand.crossJoin(broadcast(weights))
      .select(col("__aid").as("a_id"), col("__bid").as("b_id"),
        nAgree.as("n_agree"), round(score.cast(DoubleType), 9).as("weight"),
        (col("__aid") === col("__bid")).as("is_match"))
      .filter(col("weight") >= threshold)
  }

  /** MULTI-PASS [[fellegiSunter]] — the production fix for the recall
    * hole [[blockingRecall]] measures: candidates are the UNION of the
    * per-key equi-joins over `blockCols` (deduplicated on the id pair —
    * each pass carries identical field payloads, so the drop is
    * deterministic), and m/u estimation + scoring run unchanged on that
    * union. A true pair is reachable if ANY key survives its field's
    * corruption; candidate volume is Σ_k Σ_b |A_b|·|B_b| minus overlap —
    * still ≪ |A|·|B| for honest keys (measured 0.40% of naive at sf0.1
    * with the balance-band + name-fold passes).
    */
  def fellegiSunterMulti(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[String],
      threshold: Double = 0.0, minSeed: Long = 2L): DataFrame = {
    require(blockCols.nonEmpty, "need >= 1 blocking key")
    require(fields.nonEmpty, "linkage needs >= 1 comparison field")
    val aS = a.select(col(idCol).as("__aid") +:
      (blockCols.map(c => col(c).as(s"__ka_$c")) ++
        fields.map(f => col(f).as(s"__a_$f"))): _*)
    val bS = b.select(col(idCol).as("__bid") +:
      (blockCols.map(c => col(c).as(s"__kb_$c")) ++
        fields.map(f => col(f).as(s"__b_$f"))): _*)
    val payload = Seq(col("__aid"), col("__bid")) ++
      fields.flatMap(f => Seq(col(s"__a_$f"), col(s"__b_$f")))
    val cand = blockCols.map { c =>
        aS.join(bS, col(s"__ka_$c") === col(s"__kb_$c"))
          .select(payload: _*)
      }.reduce(_ unionByName _)
      .dropDuplicates("__aid", "__bid")
      .localCheckpoint()
    scorePairs(aS.select(col("__aid") +:
        fields.map(f => col(s"__a_$f")): _*),
      bS.select(col("__bid") +: fields.map(f => col(s"__b_$f")): _*),
      cand, fields, threshold, minSeed)
  }

  /** [[fellegiSunterMulti]] with PER-PASS u stratification (Winkler's
    * refinement: u is a property of the COMPARISON POPULATION, and each
    * blocking pass samples a different non-match population —
    * balance-band blocks are value-adjacent so their non-matches agree
    * on `bal` far more often than the name-fold pass's do; a pooled u
    * smears the two). Each candidate pair is assigned to the FIRST
    * blocking pass that reached it (min pass index — deterministic via
    * a min-struct aggregate, never dropDuplicates' arbitrary survivor),
    * u_k estimates per pass from that pass's non-match candidates, and
    * the pair scores under its own pass's weights. m stays pooled — it
    * is a property of the MATCH population, which blocking does not
    * stratify.
    *
    * Shape at scale: identical to [[fellegiSunterMulti]] plus one
    * ≤|passes|-row u relation (a pass with no non-match candidates
    * rides the Laplace floor via the pass-grid left join, never drops
    * its pairs); the weights broadcast is |passes| rows instead of 1.
    * Returns (a_id, b_id, pass, n_agree, weight, is_match) for pairs
    * scoring ≥ `threshold`, pass = the assigning block column's name.
    */
  def fellegiSunterMultiU(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String], fields: Seq[String],
      threshold: Double = 0.0, minSeed: Long = 2L): DataFrame = {
    require(blockCols.nonEmpty, "need >= 1 blocking key")
    require(fields.nonEmpty, "linkage needs >= 1 comparison field")
    require(minSeed >= 1, "minSeed must be >= 1")
    val aS = a.select(col(idCol).as("__aid") +:
      (blockCols.map(c => col(c).as(s"__ka_$c")) ++
        fields.map(f => col(f).as(s"__a_$f"))): _*)
    val bS = b.select(col(idCol).as("__bid") +:
      (blockCols.map(c => col(c).as(s"__kb_$c")) ++
        fields.map(f => col(f).as(s"__b_$f"))): _*)
    val fieldCols = fields.flatMap(f =>
      Seq(col(s"__a_$f"), col(s"__b_$f")))
    val cand = blockCols.zipWithIndex.map { case (c, i) =>
        aS.join(bS, col(s"__ka_$c") === col(s"__kb_$c"))
          .select((Seq(col("__aid"), col("__bid"),
            lit(i).as("__pass")) ++ fieldCols): _*)
      }.reduce(_ unionByName _)
      // min-struct: the payload fields are identical across arms for
      // the same pair, so the struct order is driven by the pass index
      .groupBy(col("__aid"), col("__bid"))
      .agg(min(struct(col("__pass") +: fieldCols: _*)).as("__s"))
      .select(Seq(col("__aid"), col("__bid"),
        col("__s.__pass").as("__pass")) ++
        fields.flatMap(f => Seq(col(s"__s.__a_$f").as(s"__a_$f"),
          col(s"__s.__b_$f").as(s"__b_$f"))): _*)
      .localCheckpoint()
    // m pooled from the labeled true pairs, minSeed-gated (scorePairs'
    // discipline)
    val truePairs = aS.select(col("__aid") +:
        fields.map(f => col(s"__a_$f")): _*)
      .join(bS.select(col("__bid") +: fields.map(f => col(s"__b_$f")): _*),
        col("__aid") === col("__bid"))
    val mAggs = count(lit(1)).as("__n") +: fields.map(f =>
      sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")).as(s"__m_$f"))
    val mRow = truePairs.agg(mAggs.head, mAggs.tail: _*)
    // u per pass over that pass's non-match candidates; the pass grid
    // left-join keeps an all-match pass on the Laplace floor
    val uAggs = count(lit(1)).as("__nu") +: fields.map(f =>
      sum((col(s"__a_$f") <=> col(s"__b_$f")).cast("long")).as(s"__u0_$f"))
    val u0 = cand.filter(col("__aid") =!= col("__bid"))
      .groupBy(col("__pass")).agg(uAggs.head, uAggs.tail: _*)
    val uRel = cand.select(col("__pass")).distinct()
      .join(u0, Seq("__pass"), "left")
      .select(col("__pass") +: (coalesce(col("__nu"), lit(0L)).as("__nu") +:
        fields.map(f =>
          coalesce(col(s"__u0_$f"), lit(0L)).as(s"__u_$f"))): _*)
    def lg2(x: Column): Column = round(log(x) / math.log(2.0), 9).cast(W)
    val nGated = when(col("__n") >= minSeed, col("__n")).otherwise(
      raise_error(concat(lit(s"fellegiSunterMultiU: labeled true-pair " +
        s"seed has "), col("__n"), lit(s" rows < minSeed=$minSeed — " +
        "m-estimation would collapse to Laplace 0.5"))))
    val weights = mRow.crossJoin(uRel).select(col("__pass") +:
      fields.flatMap { f =>
        val m = (col(s"__m_$f") + 1).cast(DoubleType) / (nGated + 2)
        val u = (col(s"__u_$f") + 1).cast(DoubleType) / (col("__nu") + 2)
        Seq(lg2(m / u).as(s"__wa_$f"),
          lg2((lit(1.0) - m) / (lit(1.0) - u)).as(s"__wd_$f"))
      }: _*)
    val agree = (f: String) => col(s"__a_$f") <=> col(s"__b_$f")
    val score = fields.map(f =>
      when(agree(f), col(s"__wa_$f")).otherwise(col(s"__wd_$f")))
      .reduce(_ + _).cast(DecimalType(28, 9))
    val nAgree = fields.map(f => agree(f).cast("int")).reduce(_ + _)
    val passName = blockCols.zipWithIndex.foldLeft(lit(null)
        .cast("string")) { case (acc, (c, i)) =>
      when(col("__pass") === i, lit(c)).otherwise(acc)
    }
    cand.join(broadcast(weights), Seq("__pass"))
      .select(col("__aid").as("a_id"), col("__bid").as("b_id"),
        passName.as("pass"), nAgree.as("n_agree"),
        round(score.cast(DoubleType), 9).as("weight"),
        (col("__aid") === col("__bid")).as("is_match"))
      .filter(col("weight") >= threshold)
  }

  /** Blocking-recall audit — the number [[fellegiSunter]] silently
    * depends on: a true pair whose corrupted blocking field crosses a
    * block boundary is UNREACHABLE (no candidate is ever generated), and
    * single-pass blocking cannot see its own misses. The standard
    * production answer is MULTI-PASS (OR) blocking — independent keys
    * computed from different fields, candidates unioned — because one
    * field's corruption rarely breaks every key (Fellegi & Sunter 1969
    * §5's blocking discussion). This measures both: per blocking key and
    * for their union, P(true pair shares ≥ 1 block) against the
    * ground-truth id, plus the candidate volume the key admits.
    *
    * Shape at scale: reachability is ONE id equi-join over the two views
    * (row-scale, shuffled on the id); every candidate volume is
    * Σ_b |A_b|·|B_b| computed from the per-key block-count aggregates —
    * the union volume by inclusion–exclusion over the ≤ 2^k − 1 key
    * subsets (k ≤ 3), never by materializing pairs. Recall is one IEEE
    * division of exact longs, 9-dp.
    *
    * Returns one row per blocking key plus `multi_pass` (the OR of all
    * keys): (pass, n_true, n_reachable, recall, n_candidates).
    */
  def blockingRecall(a: DataFrame, b: DataFrame, idCol: String,
      blockCols: Seq[String]): DataFrame = {
    require(blockCols.nonEmpty && blockCols.size <= 3,
      "blocking recall: 1-3 blocking keys (union volume is 2^k joins)")
    val aS = a.select(col(idCol).as("__aid") +:
      blockCols.map(c => col(c).as(s"__a_$c")): _*)
    val bS = b.select(col(idCol).as("__bid") +:
      blockCols.map(c => col(c).as(s"__b_$c")): _*)
    val truth = aS.join(bS, col("__aid") === col("__bid"))
    val reachAggs = count(lit(1)).as("__nt") +:
      blockCols.map(c => sum((col(s"__a_$c") <=> col(s"__b_$c"))
        .cast("long")).as(s"__r_$c")) :+
      sum(blockCols.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
        .reduce(_ || _).cast("long")).as("__r_any")
    val reach = truth.agg(reachAggs.head, reachAggs.tail: _*)
    // candidate volume of a key subset: block-count aggregates joined on
    // the subset's keys — bounded relations, never pair-scale
    val subsets = (1 to blockCols.size)
      .flatMap(n => blockCols.combinations(n).toSeq)
    def candVolume(s: Seq[String], name: String): DataFrame = {
      val ga = aS.groupBy(s.map(c => col(s"__a_$c")): _*)
        .agg(count(lit(1)).as("__na"))
      val gb = bS.groupBy(s.map(c => col(s"__b_$c")): _*)
        .agg(count(lit(1)).as("__nb"))
      val cond = s.map(c => col(s"__a_$c") <=> col(s"__b_$c"))
        .reduce(_ && _)
      ga.join(gb, cond)
        .agg(coalesce(sum(col("__na") * col("__nb")), lit(0L)).as(name))
    }
    val vols = subsets.zipWithIndex.map { case (s, i) =>
      candVolume(s, s"__c_$i") }
    val all = vols.foldLeft(reach)((acc, v) => acc.crossJoin(v))
    def recall9(r: Column): Column =
      round(r.cast(DoubleType) / col("__nt"), 9)
    val passRows = blockCols.map { c =>
      val i = subsets.indexWhere(_ == Seq(c))
      all.select(lit(c).as("pass"), col("__nt").as("n_true"),
        col(s"__r_$c").as("n_reachable"),
        recall9(col(s"__r_$c")).as("recall"),
        col(s"__c_$i").as("n_candidates"))
    }
    // |∪ passes| by inclusion–exclusion: + odd-size subsets, − even
    val unionVol = subsets.zipWithIndex.map { case (s, i) =>
      if (s.size % 2 == 1) col(s"__c_$i") else -col(s"__c_$i") }
      .reduce(_ + _)
    val multiRow = all.select(lit("multi_pass").as("pass"),
      col("__nt").as("n_true"), col("__r_any").as("n_reachable"),
      recall9(col("__r_any")).as("recall"),
      unionVol.as("n_candidates"))
    passRows.reduce(_ unionByName _).unionByName(multiRow)
      .orderBy("pass")
  }

  private val D38 = DecimalType(38, 0)
  private val Nano = 1000000000L

  /** Exact division of a nonnegative DECIMAL(38,0) by a divisor it is
    * NOT necessarily a multiple of — floor semantics: `(x − pmod(x, d))
    * / d`. The numerator becomes exactly divisible, so the decimal
    * division's rounding is vacuous; the result is the exact floor
    * quotient (DuckDB's positive-operand `//`).
    */
  private def floorDivD(x: Column, d: Column): Column =
    ((x - pmod(x, d)) / d).cast(D38)

  /** UNSUPERVISED Fellegi–Sunter parameter estimation by EM (Winkler
    * 1988, "Using the EM Algorithm for Weight Computation in the
    * Fellegi–Sunter Model of Record Linkage") — [[fellegiSunter]]
    * without the labeled seed: candidate pairs collapse to their
    * agreement PATTERN (≤ 2^k rows — the classic FS sufficient
    * statistic), and EM alternates pattern posteriors (E) with m/u/p
    * re-estimates (M) entirely on that bounded relation. The row-scale
    * work is ONE pattern-count shuffle; every iteration after it costs
    * ≤ 2^k × (2k+1) arithmetic.
    *
    * NANO-INTEGER EM (the [[TokenModels.sgdLinear]] weight discipline):
    * parameters live as integers in units of 1e-9 and every E/M update
    * is exact DECIMAL(38,0) arithmetic with explicit floor divisions —
    * `A = p·Πₖ(γₖ ? mₖ : 1e9−mₖ)` (≤ 10³⁶, inside precision 38 for
    * k ≤ 3), `g = (⌊A/1e9⌋·1e9) div (⌊A/1e9⌋+⌊B/1e9⌋)` — so the fitted
    * model is bit-identical on any engine/partitioning with NO rounding
    * surface anywhere (DuckDB twin: HUGEINT and positive `//`).
    * Degenerate all-match / all-nonmatch posteriors divide by a floored
    * 1 instead of 0 and freeze, documented. `idCol` is used ONLY for
    * the `n_true` audit column (the posterior should track
    * n_true/n_pairs on honestly-blocked data) — the estimation never
    * sees it.
    *
    * Returns one row per agreement pattern: (agree_<field>..., n_pairs,
    * n_true, posterior) with the posterior from the FINAL parameters.
    */
  def linkageEm(a: DataFrame, b: DataFrame, idCol: String,
      blockCol: String, fields: Seq[String], iters: Int = 5,
      initP: Long = 100000000L, initM: Long = 900000000L,
      initU: Long = 100000000L): DataFrame = {
    require(fields.nonEmpty && fields.length <= 3,
      "nano-integer EM keeps p*prod(m) inside DECIMAL(38,0): <= 3 fields")
    val spark = a.sparkSession
    val aS = a.select(col(idCol).as("__aid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__a_$f")): _*)
    val bS = b.select(col(idCol).as("__bid") +: col(blockCol).as("__blk") +:
      fields.map(f => col(f).as(s"__b_$f")): _*)
    val pat = aS.join(bS, Seq("__blk"))
      .groupBy(fields.map(f =>
        (col(s"__a_$f") <=> col(s"__b_$f")).as(s"__g_$f")): _*)
      .agg(count(lit(1)).as("__n"),
        sum((col("__aid") === col("__bid")).cast("long")).as("__nt"))
      .localCheckpoint()
    def dl(v: Long) = lit(v).cast(D38)
    var params = spark.range(1).select(dl(initP).as("__p") +:
      fields.flatMap(f => Seq(dl(initM).as(s"__m_$f"),
        dl(initU).as(s"__u_$f"))): _*)
    // posterior in nano units for the given params — exact integers
    def gNano = {
      val aU = fields.map(f => when(col(s"__g_$f"), col(s"__m_$f"))
          .otherwise(dl(Nano) - col(s"__m_$f")))
        .foldLeft(col("__p").cast(D38))((acc, c) => (acc * c).cast(D38))
      val bU = fields.map(f => when(col(s"__g_$f"), col(s"__u_$f"))
          .otherwise(dl(Nano) - col(s"__u_$f")))
        .foldLeft((dl(Nano) - col("__p")).cast(D38))((acc, c) =>
          (acc * c).cast(D38))
      val a1 = floorDivD(aU, dl(Nano))
      val b1 = floorDivD(bU, dl(Nano))
      floorDivD(a1 * dl(Nano), greatest(a1 + b1, dl(1L)))
    }
    (1 to iters).foreach { _ =>
      val e = pat.crossJoin(broadcast(params))
        .select(Seq(col("__n").cast(D38).as("__n"), gNano.as("__g")) ++
          fields.map(f => col(s"__g_$f")): _*)
      val mAggs =
        Seq(sum(col("__n") * col("__g")).as("__den"),
          sum(col("__n") * (dl(Nano) - col("__g"))).as("__denU"),
          sum(col("__n")).as("__all")) ++
        fields.flatMap(f => Seq(
          sum(when(col(s"__g_$f"), col("__n") * col("__g"))
            .otherwise(dl(0L))).as(s"__nm_$f"),
          sum(when(col(s"__g_$f"), col("__n") * (dl(Nano) - col("__g")))
            .otherwise(dl(0L))).as(s"__nu_$f")))
      val agg = e.agg(mAggs.head, mAggs.tail: _*)
      params = agg.select(
        floorDivD(col("__den"), col("__all")).as("__p") +:
        fields.flatMap(f => Seq(
          floorDivD(col(s"__nm_$f") * dl(Nano),
            greatest(col("__den"), dl(1L))).cast(D38).as(s"__m_$f"),
          floorDivD(col(s"__nu_$f") * dl(Nano),
            greatest(col("__denU"), dl(1L))).cast(D38).as(s"__u_$f"))): _*)
        .localCheckpoint()
    }
    pat.crossJoin(broadcast(params))
      .select(fields.map(f => col(s"__g_$f").as(s"agree_$f")) ++
        Seq(col("__n").as("n_pairs"), col("__nt").as("n_true"),
          (gNano.cast(DoubleType) / Nano).as("posterior")): _*)
  }
}
