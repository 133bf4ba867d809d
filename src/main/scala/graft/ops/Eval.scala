package graft.ops

import java.math.{BigDecimal => JBigDecimal, MathContext, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Model/retrieval evaluation metrics — the measurement half of a feature
  * pipeline (the reference stops at feature materialization; any consumer
  * of its training matrices immediately needs these): ROC AUC, per-class
  * precision/recall/F1, ranked-retrieval P@k / MRR / NDCG@k, and
  * calibration bins with expected calibration error.
  *
  * Scale shape: every metric collapses the data to ONE tiny relation in a
  * single shuffle — a per-distinct-score table for AUC (the KS-grid
  * pattern), a confusion matrix, per-query top-k rows, probability bins —
  * and finishes with window/aggregate arithmetic over THAT relation.
  *
  * Determinism discipline ([[graft.functions.Exact]] argument): counts and
  * rank sums stay integers (DECIMAL(38,0) where n² would overflow a long);
  * every IEEE step is a fixed op sequence rounded to 9 dp mirrored verbatim
  * in the oracle; DCG weights 1/log2(r+1) are NOT computed at runtime —
  * they are library-level DECIMAL literals inlined into both the plan and
  * the oracle SQL, so no libm call can flip a bit between engines.
  */
object Eval {

  private val Exact9 = DecimalType(28, 9)
  private val BigInt0 = DecimalType(38, 0)

  /** ROC AUC via the tie-corrected Mann–Whitney statistic.
    *
    * One group-by collapses rows to per-distinct-score (count, positives);
    * a cumulative window over that bounded grid assigns midrank sums:
    * 2·R⁺ = Σ_s pos_s · (2·cum_before_s + count_s + 1) stays integral, and
    * AUC = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻) needs ONE IEEE division. Rank
    * sums accumulate in DECIMAL(38,0) (≈2·n² exceeds a long past ~2·10⁹
    * rows). Returns one row: (n_pos, n_neg, auc_num, auc).
    */
  def aucRoc(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val perScore = df
      .select(score.as("s"), when(positive, 1L).otherwise(0L).as("p"))
      .filter(col("s").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("c"), sum("p").as("cp"))
    // cumulative over the DISTINCT-SCORE grid via the two-phase salted
    // walk ([[graft.ops.SaltedGrid]]): a continuous score column makes
    // the grid row-scale, so it must never serialize into one window task
    SaltedGrid.cumulative(perScore, "s", Seq("c"))
      .withColumn("cb", col("__cum_c") - col("c"))
      .agg(
        sum("cp").as("n_pos"),
        sum(col("c") - col("cp")).as("n_neg"),
        sum((col("cp") * (col("cb") * 2 + col("c") + 1)).cast(BigInt0))
          .as("rs2"))
      .select(col("n_pos"), col("n_neg"),
        (col("rs2") - (col("n_pos") * (col("n_pos") + 1)).cast(BigInt0))
          .cast("long").as("auc_num"),
        round(
          (col("rs2") - (col("n_pos") * (col("n_pos") + 1)).cast(BigInt0))
            .cast(DoubleType) /
            (col("n_pos").cast(DoubleType) * col("n_neg") * 2), 9)
          .as("auc"))
  }

  /** Per-slice (sliced / grouped) ROC AUC — the fairness-and-robustness
    * read a pooled AUC hides: a model can hold 0.75 overall while one
    * segment sits at chance. Same tie-corrected Mann–Whitney machinery as
    * [[aucRoc]], with every window/aggregate additionally keyed by `slice`,
    * plus the POOLED AUC recomputed from the same per-(slice, score) grid
    * (collapse by score — never a second pass over the data) and the
    * per-slice gap against it.
    *
    * Degenerate slices (no positives or no negatives) keep their counts but
    * yield NULL auc/gap rather than a division by zero. Returns one row per
    * slice: (slice, n_pos, n_neg, auc, pooled_auc, gap).
    */
  def aucRocBy(df: DataFrame, slice: Column, score: Column,
      positive: Column): DataFrame = {
    val perScore = df
      .select(slice.as("slice"), score.as("s"),
        when(positive, 1L).otherwise(0L).as("p"))
      .filter(col("s").isNotNull)
      .groupBy("slice", "s").agg(count(lit(1)).as("c"), sum("p").as("cp"))
    def aucCols(grid: DataFrame, keys: Seq[String]): DataFrame = {
      val withCb =
        if (keys.isEmpty)
          // pooled grid: two-phase salted walk (continuous scores make it
          // row-scale — the [[SaltedGrid]] fallback)
          SaltedGrid.cumulative(grid, "s", Seq("c"))
            .withColumn("cb", col("__cum_c") - col("c"))
        else {
          val before = Window.partitionBy(keys.map(col): _*).orderBy("s")
            .rowsBetween(Window.unboundedPreceding, -1)
          grid.withColumn("cb", coalesce(sum("c").over(before), lit(0L)))
        }
      withCb
        .groupBy(keys.map(col): _*)
        .agg(
          sum("cp").as("n_pos"),
          sum(col("c") - col("cp")).as("n_neg"),
          sum((col("cp") * (col("cb") * 2 + col("c") + 1)).cast(BigInt0))
            .as("rs2"))
        .withColumn("auc",
          when(col("n_pos") > 0 && col("n_neg") > 0,
            round(
              (col("rs2") - (col("n_pos") * (col("n_pos") + 1)).cast(BigInt0))
                .cast(DoubleType) /
                (col("n_pos").cast(DoubleType) * col("n_neg") * 2), 9)))
        .drop("rs2")
    }
    val bySlice = aucCols(perScore, Seq("slice"))
    // pooled grid = the slice grid collapsed by score — grid-scale work
    val pooled = aucCols(
      perScore.groupBy("s").agg(sum("c").as("c"), sum("cp").as("cp")),
      Seq.empty)
      .select(col("auc").as("pooled_auc"))
    bySlice.crossJoin(broadcast(pooled))
      .withColumn("gap", round(col("auc") - col("pooled_auc"), 9))
  }

  /** Average precision (the area under the precision–recall curve as a
    * step integral): AP = Σ_t ΔR(t)·P(t) over DISTINCT score thresholds,
    * descending — the tie-robust convention (every tied block moves
    * together, so no arbitrary within-tie order leaks into the metric),
    * and the right PR summary for the rare-positive regimes where ROC AUC
    * flatters (near-dup detection, PII hits, conversion).
    *
    * Same scale shape as [[aucRoc]]: one group-by collapses rows to the
    * distinct-score grid, and every window/aggregate after that touches
    * only grid rows. Per-threshold terms are `cp·CP` (exact integers) over
    * one IEEE division by `CN`, rounded 9 dp into exact DECIMAL sums; the
    * final `/ n_pos` is the only other division. Returns one row:
    * (n_scored, n_pos, avg_precision) — NULL AP when there are no
    * positives.
    */
  def averagePrecision(df: DataFrame, score: Column, positive: Column)
      : DataFrame = {
    val perScore = df
      .select(score.as("s"), when(positive, 1L).otherwise(0L).as("p"))
      .filter(col("s").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("c"), sum("p").as("cp"))
    val atOrAbove = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perScore
      .withColumn("cum_p", sum("cp").over(atOrAbove))
      .withColumn("cum_n", sum("c").over(atOrAbove))
      .withColumn("term",
        round((col("cp") * col("cum_p")).cast(DoubleType) / col("cum_n"), 9)
          .cast(org.apache.spark.sql.types.DecimalType(28, 9)))
      .agg(sum("c").as("n_scored"), sum("cp").as("n_pos"),
        sum("term").as("__t"))
      .select(col("n_scored"), col("n_pos"),
        when(col("n_pos") > 0,
          round(col("__t").cast(DoubleType) / col("n_pos"), 9))
          .as("avg_precision"))
  }

  /** Cost-sensitive decision-threshold selection: sweep every distinct
    * score as the "predict positive iff score ≥ t" cutoff, score each
    * cutoff with an integer utility matrix, return the argmax row — the
    * step that turns a scored model into a DECISION (fraud review queues,
    * send/don't-send, block/allow), where symmetric accuracy is the wrong
    * objective.
    *
    * The whole sweep lives on the distinct-score grid ([[aucRoc]]
    * discipline): TP/FP at each threshold are cumulative window sums,
    * FN/TN their complements against the 1-row totals, and with INTEGER
    * utility weights the objective is exact — no IEEE anywhere until the
    * reported utility is already decided. Ties break to the HIGHEST
    * threshold (the most conservative cutoff achieving the max). Returns
    * one row: (threshold, tp, fp, fn, tn, utility).
    */
  def bestThreshold(df: DataFrame, score: Column, positive: Column,
      wTp: Long, wFp: Long, wFn: Long, wTn: Long): DataFrame = {
    val perScore = df
      .select(score.as("s"), when(positive, 1L).otherwise(0L).as("p"))
      .filter(col("s").isNotNull)
      .groupBy("s").agg(count(lit(1)).as("c"), sum("p").as("cp"))
    val atOrAbove = Window.orderBy(col("s").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    perScore
      .withColumn("tp", sum("cp").over(atOrAbove))
      .withColumn("__cn", sum("c").over(atOrAbove))
      .withColumn("fp", col("__cn") - col("tp"))
      .withColumn("__P", sum("cp").over(all))
      .withColumn("__T", sum("c").over(all))
      .withColumn("fn", col("__P") - col("tp"))
      .withColumn("tn", col("__T") - col("__P") - col("fp"))
      .withColumn("utility",
        col("tp") * wTp + col("fp") * wFp + col("fn") * wFn
          + col("tn") * wTn)
      .withColumn("__rn", row_number().over(
        Window.orderBy(col("utility").desc, col("s").desc)))
      .filter(col("__rn") === 1)
      .select(col("s").as("threshold"), col("tp"), col("fp"), col("fn"),
        col("tn"), col("utility"))
  }

  /** Gains / lift table — the campaign-targeting read of a ranked model:
    * rows bucket into `deciles` equal-frequency score bands (best scores
    * = band 1), and each band reports its response rate, the cumulative
    * share of all positives captured so far (the gains curve), and its
    * lift over the base rate. The "top 2 deciles capture 60% of
    * converters" sentence comes straight off this relation.
    *
    * Banding runs over (score desc, tieCols) so it is engine-stable
    * under ties. The scored relation is localCheckpoint'd and
    * SIZE-DISPATCHED ([[SaltedGrid.ntileCutoff]]): bounded input takes
    * the single-task window, row-scale input the SALTED global rank
    * ([[SaltedGrid.valueRanked]] on the negated score) pushed through
    * the [[SaltedGrid.ntileBand]] integer split. The scored grain here
    * ((user, day)) is smaller than the raw stream but still grows
    * linearly with users×days, so at 100× the single-task sort is
    * exactly the §6.1 hot-stratum failure mode; past the cutoff the
    * salted form fans it over `buckets` tasks and both paths stay
    * hash-identical to an
    * `NTILE(deciles) OVER (ORDER BY score DESC, ties)` oracle. Every
    * statistic is an integer ratio spending one fixed IEEE sequence
    * (≤2 multiplies, 1 division), 9 dp. Returns one row per band.
    */
  def gainsTable(df: DataFrame, score: Column, positive: Column,
      tieCols: Seq[Column], deciles: Int = 10): DataFrame = {
    require(deciles >= 2, s"need at least 2 bands: $deciles")
    // materialize the scored relation first: valueRanked scans its input
    // for percentile edges, offsets and the ranking pass, and a
    // nondeterministic upstream (sample/rand) replayed per scan would let
    // __n/__offset disagree with the ranked rows
    val scored = df.withColumn("__s", score)
      .withColumn("__y", when(positive, 1L).otherwise(0L))
      .localCheckpoint()
    // size dispatch (SaltedGrid.ntileCutoff): bounded input → one-task
    // window; row-scale input → salted rank. Spec-pinned hash-identical.
    val banded =
      if (scored.count() <= SaltedGrid.ntileCutoff(df.sparkSession))
        scored.withColumn("decile", ntile(deciles)
          .over(Window.orderBy((negate(col("__s")) +: tieCols): _*))
          .cast("long"))
      else
        SaltedGrid.valueRankedDeterministic(
          scored, Nil, negate(col("__s")), tieCols)
        .withColumn("decile",
          SaltedGrid.ntileBand(col("__rank"), col("__n"), deciles))
    val perBand = banded
      .groupBy("decile")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    perBand
      .withColumn("cum_pos", sum("n_pos").over(cum))
      .withColumn("__tn", sum("n").over(all))
      .withColumn("__tp", sum("n_pos").over(all))
      .select(col("decile"), col("n"), col("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n"), 9)
          .as("response_rate"),
        col("cum_pos"),
        when(col("__tp") > 0,
          round(col("cum_pos").cast(DoubleType) / col("__tp"), 9))
          .as("cum_capture"),
        when(col("__tp") > 0,
          round(col("n_pos").cast(DoubleType) * col("__tn") /
            (col("n").cast(DoubleType) * col("__tp")), 9))
          .as("lift"))
  }

  /** Split-conformal prediction interval (Vovk 2005; Lei et al. 2018) for
    * a constant-mean regressor — the distribution-free "how wrong is this
    * prediction allowed to be" band every served point estimate needs.
    *
    * The three-way split is the [[graft.ops.Prep.hashBucket]] md5 draw on
    * the row key (deterministic on any engine/partitioning): bucket <
    * `pctTrain` trains the predictor (here: the mean), < `pctTrain+pctCal`
    * calibrates, the rest measures empirical coverage. q̂ is the
    * ⌈(1−α)(n_cal+1)⌉-th smallest absolute residual — the DISCRETE
    * conformal rank over the per-distinct-residual grid (the funnel-timing
    * quantile discipline: `cum·αden ≥ (n+1)·(αden−αnum)` stays in integer
    * cross-multiplies, no interpolation, no last-ulp engine skew).
    *
    * Determinism: the train mean sums exact DECIMAL(18,2) cents and spends
    * ONE rounded IEEE division (2 dp); residuals are the same fixed
    * `round(abs(y − ŷ), 9)` sequence on both engines; coverage is an
    * integer ratio. A degenerate calibration set — ⌈(1−α)(n_cal+1)⌉ >
    * n_cal, e.g. n_cal < 9 at α = 0.1 — has no finite conformal rank:
    * q̂ is NULL, which by the split-conformal convention is the INFINITE
    * interval, so every test residual counts as covered (coverage 1, the
    * conservative direction — never a silent 0). Returns one row:
    * (n_train, n_cal, n_test, y_hat, q_hat, n_covered, coverage).
    */
  def conformalInterval(df: DataFrame, key: Column, y: Column,
      pctTrain: Int, pctCal: Int, alphaNum: Int, alphaDen: Int): DataFrame = {
    val Cents = DecimalType(18, 2)
    val base = df.select(Prep.hashBucket(key, 100).as("__b"),
      y.cast(DoubleType).as("__y"))
    val train = base.filter(col("__b") < pctTrain)
      .agg(count(lit(1)).as("n_train"),
        round(sum(col("__y").cast(Cents)).cast(DoubleType) /
          count(lit(1)), 2).as("y_hat"))
    val resid = base.filter(col("__b") >= pctTrain)
      .crossJoin(broadcast(train))
      .select(col("__b"), col("n_train"), col("y_hat"),
        round(abs(col("__y") - col("y_hat")), 9).as("__r"))
    // discrete conformal quantile over the per-distinct-residual grid
    val calGrid = resid.filter(col("__b") < pctTrain + pctCal)
      .groupBy("__r").agg(count(lit(1)).as("c"))
    val cum = Window.orderBy("__r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    val qhat = calGrid
      .withColumn("cum", sum(col("c")).over(cum))
      .withColumn("n_cal", sum(col("c")).over(all))
      .agg(max(col("n_cal")).as("n_cal"),
        min(when(col("cum") * alphaDen >=
            (col("n_cal") + 1) * (alphaDen - alphaNum), col("__r")))
          .as("q_hat"))
    resid.filter(col("__b") >= pctTrain + pctCal)
      .crossJoin(broadcast(qhat))
      .groupBy("n_train", "y_hat", "n_cal", "q_hat")
      .agg(count(lit(1)).as("n_test"),
        // NULL q_hat = infinite interval: everything is covered
        sum(when(col("q_hat").isNull || col("__r") <= col("q_hat"), 1L)
          .otherwise(0L)).as("n_covered"))
      .select(col("n_train"), col("n_cal"), col("n_test"), col("y_hat"),
        col("q_hat"), col("n_covered"),
        round(col("n_covered").cast(DoubleType) / col("n_test"), 9)
          .as("coverage"))
  }

  /** Per-class confusion statistics for a multi-class prediction:
    * (class, n_actual, n_pred, tp, fp, fn, prec, rec, f1), one row per
    * class present in either column. One (label, pred) group-by builds the
    * confusion matrix; everything else reduces over that classes² relation.
    * F1 = 2·tp/(n_actual + n_pred) — algebraically 2PR/(P+R) but ONE
    * division. Undefined ratios (empty denominator) stay NULL.
    */
  def confusionStats(df: DataFrame, labelCol: String, predCol: String)
      : DataFrame = {
    val cont = df.groupBy(col(labelCol).as("y"), col(predCol).as("yh"))
      .agg(count(lit(1)).as("c"))
    val tp = cont.filter(col("y") === col("yh"))
      .select(col("y").as("class"), col("c").as("tp"))
    val act = cont.groupBy(col("y").as("class")).agg(sum("c").as("n_actual"))
    val prd = cont.groupBy(col("yh").as("class")).agg(sum("c").as("n_pred"))
    act.join(prd, Seq("class"), "full_outer")
      .join(tp, Seq("class"), "left_outer")
      .select(col("class"),
        coalesce(col("n_actual"), lit(0L)).as("n_actual"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .select(col("class"), col("n_actual"), col("n_pred"), col("tp"),
        (col("n_pred") - col("tp")).as("fp"),
        (col("n_actual") - col("tp")).as("fn"),
        when(col("n_pred") > 0,
          round(col("tp").cast(DoubleType) / col("n_pred"), 9)).as("prec"),
        when(col("n_actual") > 0,
          round(col("tp").cast(DoubleType) / col("n_actual"), 9)).as("rec"),
        when(col("n_actual") + col("n_pred") > 0,
          round(lit(2.0) * col("tp") / (col("n_actual") + col("n_pred")), 9))
          .as("f1"))
  }

  /** DCG weight w(r) = 1/log2(r+1) as a 9-dp DECIMAL literal, fixed at
    * library level so plan and oracle share the exact value. */
  def dcgWeight(rank: Int): JBigDecimal =
    new JBigDecimal(1.0 / (math.log(rank + 1.0) / math.log(2.0)),
      MathContext.DECIMAL64).setScale(9, RoundingMode.HALF_UP)

  /** Ideal DCG for m relevant results in a depth-k list: Σ_{i≤min(m,k)} w(i). */
  def idealDcg(m: Int, k: Int): JBigDecimal =
    (1 to math.min(m, k)).foldLeft(JBigDecimal.ZERO.setScale(9))(
      (acc, r) => acc.add(dcgWeight(r)))

  /** RBO depth weight (1−p)·p^(d−1) at p = 0.9, EXACT (0.9 powers are
    * terminating decimals) — a library-level literal shared by plan and
    * oracle, the [[dcgWeight]] rule. */
  def rboWeight(d: Int): JBigDecimal =
    new JBigDecimal("0.1").multiply(new JBigDecimal("0.9").pow(d - 1))

  /** Rank-biased overlap of two top-k rankings (Webber et al. 2010),
    * truncated at depth k (RBO_min): Σ_{d≤k} (1−p)·p^(d−1)·|A₁..d ∩
    * B₁..d|/d with p = 0.9 — the ranking-similarity read that, unlike
    * Kendall/Spearman, is top-weighted and handles non-conjoint lists:
    * "did the retrieval ranking drift" across index rebuilds, scorer
    * swaps (BM25 vs embedding), or corpus versions.
    *
    * Shape at scale: both inputs are k-bounded relations; the only data
    * work is one inner join on the id (depth of co-entry = max of the two
    * ranks) and a k-row depth-grid aggregation. Per-depth contributions
    * spend one fixed IEEE sequence (exact-literal weight × count ÷ depth)
    * rounded 9 dp and sum in exact DECIMAL. Returns ONE row:
    * (k, n_common, rbo).
    */
  def rankBiasedOverlap(a: DataFrame, b: DataFrame, idCol: String,
      rankCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val aa = a.select(col(idCol).as("id"), col(rankCol).as("__ra"))
      .filter(col("__ra") <= k)
    val bb = b.select(col(idCol).as("id"), col(rankCol).as("__rb"))
      .filter(col("__rb") <= k)
    val entry = aa.join(bb, Seq("id"))
      .select(greatest(col("__ra"), col("__rb")).as("__m"))
    val grid = a.sparkSession.range(1, k + 1)
      .select(col("id").cast("int").as("d"))
    val wCase = coalesce((1 to k).map(d =>
      when(col("d") === d, lit(rboWeight(d)).cast(DoubleType))): _*)
    val perDepth = grid.join(entry, col("__m") <= col("d"), "left")
      .groupBy("d").agg(count(col("__m")).as("__x"))
      .select(col("d"), col("__x"),
        round(wCase * col("__x") / col("d"), 9)
          .cast(DecimalType(18, 9)).as("__c"))
    perDepth.agg(lit(k).as("k"),
      max(when(col("d") === k, col("__x"))).as("n_common"),
      round(sum(col("__c")).cast(DoubleType), 6).as("rbo"))
  }

  /** Ranked-retrieval evaluation against label ground truth: for each
    * query vector, rank the corpus by cosine (ties → id, the
    * [[Similarity.knnJoin]] order) and score the top `k` with
    * relevant = same label. Returns per-query
    * (q_id, n_rel, hits, p_at_k, mrr, dcg, ndcg).
    *
    * The query batch broadcasts (bounded, serve-tail discipline); the
    * corpus is scanned once and never shuffles beyond the per-query top-k
    * window. `n_rel` comes from per-label corpus counts (queries are drawn
    * from the corpus, so self is excluded). DCG/IDCG are sums of the
    * [[dcgWeight]] literals in exact DECIMAL — rank is the only runtime
    * input, so scores are bit-identical on any engine.
    */
  def retrievalEval(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("__qvec"),
      col(labelCol).as("__qlabel"))
    val ranked = emb.crossJoin(broadcast(q))
      .filter(col(idCol) =!= col("q_id"))
      .withColumn("cos", round(Similarity.cosine(col(vecCol), col("__qvec")), 6))
      .withColumn("rank", row_number()
        .over(Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col(idCol))).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("rel",
        when(col(labelCol) === col("__qlabel"), 1L).otherwise(0L))
    val wExpr = (1 to k).foldLeft(lit(null).cast(Exact9)) { (acc, r) =>
      when(col("rank") === r, lit(dcgWeight(r)).cast(Exact9)).otherwise(acc)
    }
    val perQuery = ranked.groupBy("q_id")
      .agg(
        sum("rel").as("hits"),
        min(when(col("rel") === 1, col("rank"))).as("__first_rel"),
        sum(when(col("rel") === 1, wExpr).otherwise(lit(0).cast(Exact9)))
          .as("__dcg"))
    val labelCounts = emb.groupBy(col(labelCol).as("__qlabel"))
      .agg(count(lit(1)).as("__lc"))
    val nRel = q.join(broadcast(labelCounts), Seq("__qlabel"), "left_outer")
      .select(col("q_id"), (coalesce(col("__lc"), lit(1L)) - 1).as("n_rel"))
    // IDCG over m = min(n_rel, k): the same literal table, prefix-summed
    val idcgExpr = {
      val m = least(col("n_rel"), lit(k.toLong))
      (1 to k).foldLeft(lit(null).cast(Exact9)) { (acc, i) =>
        when(m === i, lit(idealDcg(i, k)).cast(Exact9)).otherwise(acc)
      }
    }
    perQuery.join(broadcast(nRel), Seq("q_id"))
      .withColumn("__idcg", idcgExpr)
      .select(col("q_id"), col("n_rel"), col("hits"),
        round(col("hits").cast(DoubleType) / k, 9).as("p_at_k"),
        coalesce(round(lit(1.0) / col("__first_rel"), 9), lit(0.0)).as("mrr"),
        col("__dcg").cast(DoubleType).as("dcg"),
        when(col("n_rel") === 0, lit(0.0)).otherwise(
          round(col("__dcg").cast(DoubleType) / col("__idcg").cast(DoubleType),
            9)).as("ndcg"))
  }

  /** Probability-calibration bins + expected calibration error: bin a
    * RATIONAL [0,1] probability `probNum/probDen` (e.g. a min-max
    * normalized count, an n-model vote share) into `bins` equi-width
    * buckets and compare the mean predicted probability with the empirical
    * positive rate. Returns per occupied bin
    * (bin, n, n_pos, avg_prob, pos_rate, abs_gap, ece) — the `ece` column
    * repeats the Σ (n_b/N)·|gap_b| total.
    *
    * Taking the probability as an integer ratio keeps the whole pipeline
    * out of floating point until the display columns: the bin id is an
    * integer floor-division ⌊num·bins/den⌋ (a double `floor(p·bins)` can
    * land a boundary value in the wrong bin on one engine), numerator sums
    * are exact longs, and avg_prob = Σnum/(n·den) is ONE correctly-rounded
    * IEEE division — so bins and means are bit-identical on any engine.
    * ECE weight products round to 9 dp and sum in DECIMAL over the
    * ≤`bins`-row relation.
    */
  def calibrationBins(df: DataFrame, probNum: Column, probDen: Column,
      positive: Column, bins: Int): DataFrame = {
    val scaled = df
      .select(probNum.cast("long").as("__num"),
        probDen.cast("long").as("__den"),
        when(positive, 1L).otherwise(0L).as("y"))
    val binned = scaled
      .select(
        least(expr(s"(__num * $bins) DIV __den"), lit(bins - 1L)).as("bin"),
        col("__num"), col("__den"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("__num").as("__sum_num"), max("__den").as("__den"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("__sum_num").cast(DoubleType) / (col("n") * col("__den")), 9)
          .as("avg_prob"),
        round(col("n_pos").cast(DoubleType) / col("n"), 9).as("pos_rate"))
      .withColumn("abs_gap", round(abs(col("avg_prob") - col("pos_rate")), 9))
    val all = Window.partitionBy()
    binned.withColumn("ece",
      round(
        sum(round(col("abs_gap") * col("n"), 9).cast(Exact9)).over(all)
          .cast(DoubleType) / sum(col("n")).over(all), 9))
  }

  /** Murphy decomposition of the (binned) Brier score — reliability −
    * resolution + uncertainty (Murphy 1973): how much of a probabilistic
    * predictor's error is miscalibration (reliability: bins where the
    * stated probability and the observed rate disagree — fixable by
    * recalibration, e.g. [[isotonicCalibration]]) versus lack of
    * discrimination (resolution: how far bin outcome rates spread from
    * the base rate — NOT fixable downstream). ECE flags the first;
    * this separates the two.
    *
    * Input is a binned relation ([[calibrationBins]] output). All
    * statistics run over the ≤bins-row relation: per-bin terms multiply
    * already-9-dp-quantized rates, round 9 dp, and sum in exact DECIMAL;
    * base rate and the two normalizations are one IEEE division each.
    * Returns one row: (n, n_pos, base_rate, reliability, resolution,
    * uncertainty, brier).
    */
  def brierDecomposition(binned: DataFrame, nCol: String, posCol: String,
      avgProbCol: String): DataFrame = {
    val all = Window.partitionBy()
    val b = binned
      .select(col(nCol).cast("long").as("__n"),
        col(posCol).cast("long").as("__np"),
        col(avgProbCol).as("__pb"))
      .withColumn("__ob",
        round(col("__np").cast(DoubleType) / col("__n"), 9))
      .withColumn("__tot", sum("__n").over(all))
      .withColumn("__totp", sum("__np").over(all))
      .withColumn("__obar",
        round(col("__totp").cast(DoubleType) / col("__tot"), 9))
    val relT = (col("__pb") - col("__ob")) * (col("__pb") - col("__ob")) *
      col("__n")
    val resT = (col("__ob") - col("__obar")) * (col("__ob") - col("__obar")) *
      col("__n")
    b.groupBy(col("__tot").as("n"), col("__totp").as("n_pos"),
        col("__obar").as("base_rate"))
      .agg(sum(round(relT, 9).cast(Exact9)).as("__rel"),
        sum(round(resT, 9).cast(Exact9)).as("__res"))
      .select(col("n"), col("n_pos"), col("base_rate"),
        round(col("__rel").cast(DoubleType) / col("n"), 9)
          .as("reliability"),
        round(col("__res").cast(DoubleType) / col("n"), 9)
          .as("resolution"),
        round(col("base_rate") * (lit(1.0) - col("base_rate")), 9)
          .as("uncertainty"))
      .withColumn("brier",
        round(col("reliability") - col("resolution") + col("uncertainty"),
          9))
  }

  /** Exact isotonic (monotone non-decreasing) calibration of binned
    * predictions — the non-parametric recalibrator (Zadrozny & Elkan
    * 2002) — via the MINIMAX closed form of pool-adjacent-violators:
    * `iso_k = max_{i≤k} min_{j≥k} mean(i..j)` (Barlow et al. 1972). PAV's
    * sequential pooling loop is what everyone implements; the closed form
    * is what lets the whole fit stay RELATIONAL — prefix sums + a bins²
    * range relation + two bounded group-bys, identical on any engine, no
    * driver-side loop at any corpus size (the data was already collapsed
    * to ≤bins rows upstream).
    *
    * Determinism: range means are integer-sum ratios rounded 9 dp; min/max
    * over 9-dp-quantized values can never tie-break differently across
    * engines. Input must be one row per bin (e.g. [[calibrationBins]]
    * output). Returns (bin, n, n_pos, pos_rate, iso_rate) with iso_rate
    * non-decreasing in bin.
    */
  def isotonicCalibration(binned: DataFrame, binCol: String, nCol: String,
      posCol: String): DataFrame = {
    val b = binned.select(col(binCol).cast("long").as("bin"),
      col(nCol).cast("long").as("n"), col(posCol).cast("long").as("n_pos"))
    // prefix sums over the ≤bins-row relation (single-partition window is
    // the POINT here — the relation is bins-bounded by construction)
    val w = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = b
      .withColumn("cn", sum(col("n")).over(w))
      .withColumn("cp", sum(col("n_pos")).over(w))
    val lo = pre.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("n_pos")).as("cp0"))
    val hi = pre.select(col("bin").as("j"), col("cn").as("cnj"),
      col("cp").as("cpj"))
    val ranges = lo.join(hi, col("j") >= col("i"))
      .select(col("i"), col("j"),
        round((col("cpj") - col("cp0")).cast(DoubleType) /
          (col("cnj") - col("cn0")), 9).as("m"))
    val iso = ranges
      .join(b.select(col("bin").as("k")),
        col("i") <= col("k") && col("j") >= col("k"))
      .groupBy("k", "i").agg(min(col("m")).as("mn"))
      .groupBy("k").agg(max(col("mn")).as("iso_rate"))
    b.join(iso, col("bin") === col("k"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast(DoubleType) / col("n"), 9).as("pos_rate"),
        col("iso_rate"))
  }

  /** ROUGE-N over paired (reference, candidate) texts (Lin 2004) — the
    * clipped n-gram overlap metric: n_match = Σ_g min(count_ref(g),
    * count_cand(g)), precision = n_match / |cand grams|, recall =
    * n_match / |ref grams|, F1 the harmonic mean of the two ROUNDED
    * values (one fixed IEEE sequence, mirrored in the oracle). Beyond
    * summarization eval, this is the per-document *damage audit* for any
    * destructive text transform — candidate = the transform's output,
    * reference = the original (the registered query pairs each document
    * with its [[Dedup.spanRemoval]] survivor text).
    *
    * Shape at scale: grams carry 64-bit xxhash64 identities (never window
    * strings — the [[Dedup.spanRemoval]] collision argument); per-side
    * counts collapse map-side on (pair, gram) in ONE shuffle; the clip is
    * an inner join of the two bounded count relations (a gram absent on
    * either side clips to 0 and cannot contribute). Per-row arrays never
    * exceed token count, and nothing is quadratic in document length —
    * the zero-shuffle alternative (per-row nested array intersection) is
    * O(len²) per document and loses to this shape on any long document.
    *
    * NULL conventions (mirrored in SQL): precision NULL when the
    * candidate has no grams, recall NULL when the reference has none, F1
    * NULL when either input rate is NULL and 0 when both rates are 0.
    * Returns (pair_id, n_ref_grams, n_cand_grams, n_match, precision,
    * recall, f1).
    */
  def rougeN(pairs: DataFrame, idCol: String, refCol: String,
      candCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1: $n")
    def toks(c: Column): Column =
      filter(split(coalesce(c, lit("")), " "), s => s =!= "")
    // token arrays bound and checkpointed ONCE (base feeds both side
    // counts and the size projection); positioned grams come from
    // TextAnalysis.ngramZip (slice+arrays_zip, codegen'd) with the
    // 64-bit gram hash computed post-explode — the old transform
    // lambda evaluated interpreted per gram element
    val base = pairs.select(col(idCol).as("pair_id"),
        toks(col(refCol)).as("__rt"), toks(col(candCol)).as("__ct"))
      .localCheckpoint()
    // gram count of a length-L token array is max(L−n+1, 0) — the size
    // the materialized gram array used to report
    def gramCount(side: String): Column =
      greatest(size(col(side)) - (n - 1), lit(0)).cast("long")
    def sideCounts(side: String, cname: String): DataFrame = base
      .select(col("pair_id"),
        explode(TextAnalysis.ngramZip(col(side), n)).as("g"))
      .select(col("pair_id"),
        xxhash64((1 to n).map(j => col(s"g.w$j")): _*).as("g"))
      .groupBy("pair_id", "g").agg(count(lit(1)).as(cname))
    val clip = sideCounts("__rt", "__cr")
      .join(sideCounts("__ct", "__cc"), Seq("pair_id", "g"))
      .groupBy("pair_id")
      .agg(sum(least(col("__cr"), col("__cc"))).as("__m"))
    val p = round(col("n_match").cast(DoubleType) / col("n_cand_grams"), 9)
    val r = round(col("n_match").cast(DoubleType) / col("n_ref_grams"), 9)
    base
      .select(col("pair_id"),
        gramCount("__rt").as("n_ref_grams"),
        gramCount("__ct").as("n_cand_grams"))
      .join(clip, Seq("pair_id"), "left_outer")
      .withColumn("n_match", coalesce(col("__m"), lit(0L)))
      .withColumn("precision", when(col("n_cand_grams") > 0, p))
      .withColumn("recall", when(col("n_ref_grams") > 0, r))
      .withColumn("f1",
        when(col("precision").isNull || col("recall").isNull,
          lit(null).cast(DoubleType))
          .when(col("precision") + col("recall") === 0.0, lit(0.0))
          .otherwise(round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 9)))
      .select("pair_id", "n_ref_grams", "n_cand_grams", "n_match",
        "precision", "recall", "f1")
  }

  /** Kaplan–Meier product-limit survival curve + Nelson–Aalen cumulative
    * hazard over right-censored (duration, event) labels — the standard
    * readout of [[EventOps.survivalLabels]]-shaped data (churn curves,
    * time-to-conversion): at each event time t with d events out of n
    * at-risk, S(t) = Π (1 − d/n) and H(t) = Σ d/n; censored rows leave
    * the risk set without contributing a factor.
    *
    * Determinism discipline: both cumulative walks run over the
    * distinct-duration grid through [[SaltedGrid.cumulative]] (a
    * microsecond-granular duration column is row-scale — never a global
    * window), and the accumulated quantities are NANO-UNIT BIGINTs (the
    * CUSUM lesson: windowed DECIMAL sums take a DOUBLE fast path in some
    * engines): the per-step hazard d/n and log-factor ln(1 − d/n) each
    * spend their fixed IEEE sequence, round to 9 dp, widen to
    * DECIMAL(18,9) BEFORE the ×10⁹ (a double multiply could land one ulp
    * under the integer), and sum exactly as longs. KM = exp(Σln)/NA = Σh
    * divide back by 10⁹ at the end; ln/exp arguments are irrational —
    * engine-safe to round. A grid point where the whole risk set dies
    * (d = n) has ln(0) = −∞: it is flagged instead, and KM from that
    * point on is exactly 0 (it is necessarily the last grid point).
    *
    * Returns one row per duration with ≥1 event:
    * (durationCol, n_risk, d_events, na_cumhaz, km_survival).
    */
  def survivalCurve(df: DataFrame, durationCol: String, eventCol: String)
      : DataFrame = {
    val d9 = DecimalType(18, 9)
    val grid = df.groupBy(col(durationCol).cast("long").as("t"))
      .agg(sum(col(eventCol).cast("long")).as("d"),
        count(lit(1)).as("__all"))
    val atRisk = SaltedGrid.cumulative(grid, "t", Seq("__all"))
      .withColumn("n_risk",
        col("__tot___all") - col("__cum___all") + col("__all"))
    def nano(x: Column) = (round(x, 9).cast(d9) * lit(1000000000L))
      .cast("long")
    val stepped = atRisk
      .withColumn("__h9",
        nano(col("d").cast(DoubleType) / col("n_risk").cast(DoubleType)))
      .withColumn("__ln9",
        when(col("d") === col("n_risk"), lit(0L))
          .otherwise(nano(log((col("n_risk") - col("d"))
            .cast(DoubleType) / col("n_risk").cast(DoubleType)))))
      .withColumn("__z",
        when(col("d") === col("n_risk"), lit(1L)).otherwise(lit(0L)))
      .select("t", "d", "n_risk", "__h9", "__ln9", "__z")
    SaltedGrid.cumulative(stepped, "t", Seq("__h9", "__ln9", "__z"))
      .filter(col("d") > 0)
      .select(col("t").as(durationCol), col("n_risk"),
        col("d").as("d_events"),
        (col("__cum___h9").cast(DoubleType) / lit(1e9)).as("na_cumhaz"),
        when(col("__cum___z") > 0, lit(0.0))
          .otherwise(round(exp(
            col("__cum___ln9").cast(DoubleType) / lit(1e9)), 9))
          .as("km_survival"))
  }

  /** Weight of Evidence + Information Value per score value (the
    * credit-scoring feature screen, Siddiqi 2006): WOE_b =
    * ln(P(b|pos)/P(b|neg)) read per bin, IV = Σ (share gap)·WOE read
    * per feature — the standard "is this feature worth binning into
    * the scorecard" number (IV < 0.02 useless, > 0.3 strong).
    *
    * Bins are the DISTINCT SCORE VALUES (the integer-count features
    * this screens are few-valued; a continuous score should be
    * quantile-bucketed first). Empty-side guard is the ½ Laplace
    * adjustment, and ×2 clears the halves so each WOE is ONE ln of an
    * EXACT integer ratio — ln((2·pos_b+1)·NEG / ((2·neg_b+1)·POS)) —
    * irrational, so the 9-dp rounds are engine-safe; each IV
    * contribution (share gap)·ln(·) rides the same ln and sums in
    * exact DECIMAL. One score group-by; totals broadcast back from a
    * 1-row aggregate. Returns one row per score value:
    * (score, n, n_pos, n_neg, woe, iv) with the global IV repeated
    * (the tvDistance convention).
    */
  def woeIv(df: DataFrame, score: Column, positive: Column): DataFrame = {
    val perBin = df.select(score.cast("long").as("score"),
        when(positive, 1L).otherwise(0L).as("__y"))
      .groupBy("score")
      .agg(count(lit(1)).as("n"), sum("__y").as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val totals = perBin.agg(sum("n_pos").as("__pos"),
      sum("n_neg").as("__neg"))
    val lnArg = ((lit(2L) * col("n_pos") + 1L) * col("__neg"))
      .cast(DoubleType) /
      ((lit(2L) * col("n_neg") + 1L) * col("__pos")).cast(DoubleType)
    val shareGap = (col("n_pos").cast(DoubleType) + lit(0.5)) /
      col("__pos").cast(DoubleType) -
      (col("n_neg").cast(DoubleType) + lit(0.5)) /
        col("__neg").cast(DoubleType)
    val contrib = round(shareGap * log(lnArg), 9).cast(DecimalType(28, 9))
    val all = Window.partitionBy()
    perBin.crossJoin(broadcast(totals))
      .withColumn("woe", round(log(lnArg), 9))
      .withColumn("iv",
        sum(contrib).over(all).cast(DoubleType))
      .select("score", "n", "n_pos", "n_neg", "woe", "iv")
  }

  /** Mean Average Precision at k (the TREC retrieval standard) over a
    * per-user recommendation list vs a relevant-item ground truth —
    * the order-sensitive companion to hit-rate: AP@k credits each hit
    * by the precision AT its rank, so burying a relevant item at rank
    * k scores less than surfacing it at rank 1 (what MRR sees only for
    * the first hit and nDCG sees with a different discount).
    *
    * EXACT INTEGER end to end: per user
    * AP@k = Σ_{hits at rank r} (hits≤r / r) / min(R, k) — every 1/r is
    * cleared by the shared lcm(1..k) scale (r divides it, so the
    * integer division is exact, not truncation), the per-user scaled
    * AP sums as a long, and each AP quantizes by truncating nano
    * division (DECIMAL(38,0) — the only lossy step, one nano-ulp)
    * before the cross-user mean's single division. Users counted =
    * users with ≥1 relevant item; a user with no recommendations
    * scores 0 (honest, not dropped).
    *
    * Inputs: `recs` (user, item, rank 1..) and `relevant`
    * (user, item). Scale shape: one distinct + per-user counts on the
    * truth, one (user, item) join on the k-bounded rec list, one
    * per-user cumulative window over ≤k rows, a 1-row final aggregate.
    * Returns one row: (n_users, k, map_at_k, hit_rate).
    */
  def mapAtK(recs: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 20, s"lcm scaling sized for k <= 20: $k")
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    val lcmK = (1 to k).foldLeft(1L)((acc, i) => acc / gcd(acc, i) * i)
    val big = DecimalType(38, 0)
    val rel = relevant.select(col("user"), col("item")).distinct()
      .localCheckpoint()
    val rCount = rel.groupBy("user").agg(count(lit(1)).as("__r"))
    val w = Window.partitionBy("user").orderBy("rank")
    val apScaled = recs.filter(col("rank") <= k)
      .join(rel.withColumn("__rel", lit(1L)), Seq("user", "item"), "left")
      .select(col("user"), col("rank"),
        coalesce(col("__rel"), lit(0L)).as("h"))
      .withColumn("__ch", sum("h").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("h") === 1)
      .groupBy("user")
      .agg(sum(expr(s"(__ch * $lcmK) div rank")).as("__ap_scaled"))
    val perUser = rCount.join(apScaled, Seq("user"), "left")
      .select(col("user"),
        coalesce(col("__ap_scaled"), lit(0L)).as("s"),
        least(col("__r"), lit(k.toLong)).as("__m"))
      .select(col("user"), (col("s") > 0).as("__hit"),
        expr(s"(cast(s as decimal(38,0)) * 1000000000)" +
          s" div (${lcmK}L * __m)").as("__ap_nano"))
    perUser.agg(count(lit(1)).as("n_users"),
        sum(col("__ap_nano").cast(big)).as("__sum_nano"),
        sum(when(col("__hit"), 1L).otherwise(0L)).as("__n_hit"))
      .select(col("n_users"), lit(k.toLong).as("k"),
        when(col("n_users") > 0,
          col("__sum_nano").cast(DoubleType) /
            (col("n_users").cast(DoubleType) * lit(1.0e9)))
          .as("map_at_k"),
        when(col("n_users") > 0,
          col("__n_hit").cast(DoubleType) /
            col("n_users").cast(DoubleType)).as("hit_rate"))
  }

  /** Fleiss' κ (Fleiss, Psych. Bulletin 1971) — inter-annotator
    * agreement for a FIXED number of raters per subject, the standard
    * gate before trusting human labels in a curation pipeline
    * (complements the label-noise and McNemar reads: κ says whether the
    * raters agree at all, corrected for chance).
    *
    * Input is one row per (subject, rating) — raters are anonymous,
    * which is exactly Fleiss' setting. The whole statistic is count
    * arithmetic: with n_ij = raters assigning category j to subject i,
    * N subjects, n raters each,
    * P̄ = (Σ n_ij² − N·n) / (N·n·(n−1)) and P̄e = Σ_j c_j² / (N·n)²
    * with c_j the category column sums — both exact integer rationals.
    * κ = (P̄ − P̄e)/(1 − P̄e) is emitted as ONE IEEE division of the two
    * cross-multiplied exact DECIMAL(38,0) integers
    * (A·D − C·B) / (B·(D − C)), never a round() of a rational —
    * engine-bit-identical by construction. κ is NULL when P̄e = 1 (a
    * single category everywhere — chance agreement is total and κ is
    * undefined).
    *
    * A ragged panel (subjects with differing rater counts) raises
    * loudly: Fleiss' formula silently mis-weights otherwise. Shape at
    * scale: one (subject, category) count shuffle, one per-subject and
    * one per-category re-aggregate, then 1-row arithmetic. Returns one
    * row (n_subjects, n_raters, p_bar, p_e, kappa).
    */
  def fleissKappa(df: DataFrame, subjectCol: String, categoryCol: String)
      : DataFrame = {
    val D38 = DecimalType(38, 0)
    val cell = df.groupBy(col(subjectCol).as("__s"),
        col(categoryCol).as("__c"))
      .agg(count(lit(1)).as("__nr"))
      .localCheckpoint(false) // feeds the subject AND category rollups
    val bySubj = cell.groupBy("__s")
      .agg(sum("__nr").as("__ns"),
        sum((col("__nr") * col("__nr")).cast(D38)).cast(D38).as("__sq"))
    val tot = bySubj.agg(count(lit(1)).as("__N"),
      min("__ns").as("__mn"), max("__ns").as("__mx"),
      sum(col("__sq")).cast(D38).as("__s2"))
    val byCat = cell.groupBy("__c")
      .agg(sum("__nr").cast(D38).as("__cj"))
      .agg(sum((col("__cj") * col("__cj")).cast(D38)).cast(D38).as("__csq"))
    tot.crossJoin(byCat)
      .select(col("__N"), col("__s2"), col("__csq"),
        // EMPTY input leaves __mn/__mx NULL; coalesce them in the message
        // so the raise stays loud and readable instead of raise_error(NULL)
        when(col("__mn") === col("__mx") && col("__mn") > 1, col("__mn"))
          .otherwise(raise_error(concat(
            lit("fleissKappa: every subject needs the same rater count "),
            lit("> 1 (saw "),
            coalesce(col("__mn").cast("string"), lit("none")), lit(".."),
            coalesce(col("__mx").cast("string"), lit("none")),
            lit(")")))).as("__nr"))
      .select(col("__N").as("n_subjects"), col("__nr").as("n_raters"),
        // cast BEFORE multiplying: N·n products must never ride LONG
        // (ANSI overflow at corpus scale), only DECIMAL(38,0)
        (col("__s2") - (col("__N").cast(D38) * col("__nr").cast(D38))
          .cast(D38)).as("__A"),
        (col("__N").cast(D38) * col("__nr").cast(D38) *
          (col("__nr") - 1).cast(D38)).cast(D38).as("__B"),
        col("__csq").as("__C"),
        ((col("__N").cast(D38) * col("__nr").cast(D38)).cast(D38) *
          (col("__N").cast(D38) * col("__nr").cast(D38)).cast(D38))
          .cast(D38).as("__D"))
      .select(col("n_subjects"), col("n_raters"),
        (col("__A").cast(DoubleType) / col("__B").cast(DoubleType))
          .as("p_bar"),
        (col("__C").cast(DoubleType) / col("__D").cast(DoubleType))
          .as("p_e"),
        when(col("__D") > col("__C"),
          ((col("__A") * col("__D") - col("__C") * col("__B")).cast(D38)
            .cast(DoubleType)) /
            ((col("__B") * (col("__D") - col("__C"))).cast(D38)
              .cast(DoubleType))).as("kappa"))
  }

  /** Unbiased pass@k (Chen et al. 2021, the Codex estimator) — THE
    * eval-harness aggregate for sampled generation: per task with n
    * samples and c correct, pass@k = 1 − C(n−c,k)/C(n,k), the exact
    * probability that a size-k subsample contains a correct one
    * (the naive "any of the first k" is biased high; this is the
    * hypergeometric correction).
    *
    * Each `k` is a PLAN-BUILD constant, so the binomial ratio unrolls
    * into the falling-factorial product Π_{i<k}(n−c−i)/Π_{i<k}(n−i) —
    * fixed codegen'd DECIMAL(38,0) expressions, no interpreted HOF in
    * the per-task path, exact for any n up to ~10³⁸^(1/k). Per-task
    * pass@k spends ONE IEEE division, rounds 9 dp and sums in exact
    * DECIMAL (the PMI term discipline); the mean spends one more. A
    * task with fewer than k samples raises loudly (the estimator is
    * undefined there — silently dropping it would bias the mean).
    *
    * Shape at scale: one (task) count shuffle, then arithmetic on the
    * per-task relation and one 1-row rollup per k. Returns one row per
    * k: (k, n_tasks, n_samples, n_correct, pass_at_k).
    */
  def passAtK(df: DataFrame, taskCol: String, correctCol: Column,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(k => k >= 1 && k <= 32),
      s"passAtK: need 1 <= k <= 32, got $ks")
    val D38 = DecimalType(38, 0)
    val perTask = df.groupBy(col(taskCol).as("__t"))
      .agg(count(lit(1)).as("__n"),
        sum(when(correctCol, 1L).otherwise(0L)).as("__c"))
      .localCheckpoint(false) // shared by every k's rollup
    val outs = ks.map { k =>
      def ffact(base: Column): Column =
        (0 until k).map(i => greatest(base - i, lit(0L)).cast(D38))
          .reduce((a, b) => (a * b).cast(D38))
      // the falling factorial Π_{i<k}(n−i) ≤ n^k must fit DECIMAL(38,0),
      // so n is gated at ⌊10^(38/k)⌋ (k=1..2 clamp to Long.Max — n is a
      // count, so those are vacuous) — the holtWinters yBound pattern:
      // an explicit domain raise instead of an opaque ANSI decimal
      // overflow (or silent NULL-dropped tasks if ANSI were off)
      val nBound: Long = math.pow(10.0, 38.0 / k).toLong
      val gated = perTask.select(
        when(col("__n") < k, raise_error(concat(
            lit(s"passAtK: task with fewer than k=$k samples ("),
            col("__n"), lit(")"))))
          .when(col("__n") > nBound, raise_error(concat(
            lit(s"passAtK: task with "), col("__n"),
            lit(s" samples exceeds the exact-decimal bound of $nBound "),
            lit(s"for k=$k"))))
          .otherwise(col("__n")).as("__n"), col("__c"))
      gated
        .select(col("__n"), col("__c"),
          round(lit(1.0) -
            ffact(col("__n") - col("__c")).cast(DoubleType) /
              ffact(col("__n")).cast(DoubleType), 9).cast(Exact9)
            .as("__p"))
        .agg(count(lit(1)).as("n_tasks"), sum("__n").as("n_samples"),
          sum("__c").as("n_correct"), sum("__p").as("__ps"))
        .select(lit(k).as("k"), col("n_tasks"), col("n_samples"),
          col("n_correct"),
          round(col("__ps").cast(DoubleType) / col("n_tasks"), 9)
            .as("pass_at_k"))
    }
    outs.reduce(_ unionByName _)
  }

  /** Krippendorff's α (nominal metric; Krippendorff 1970/2004) — the
    * agreement coefficient for the panels [[fleissKappa]] refuses:
    * RAGGED data, where units carry different rating counts (raters
    * skip items, panels grow mid-campaign). Units with fewer than 2
    * ratings drop (no within-unit pair to observe); everything else is
    * exact count arithmetic on the coincidence-matrix identities:
    *
    *   α = 1 − (n−1)·Σ_u pairable_disagreements(u)/(m_u−1)
    *           / (n² − Σ_c n_c²)
    *
    * with n_c the raw category totals over surviving units and
    * disagreeing ordered pairs within u = m_u² − Σ_c n_uc². The
    * per-unit 1/(m_u−1) weights are cleared by the fixed scale
    * L = lcm(1..9) = 2520 (supports up to 10 ratings per unit — more
    * raises loudly), so the whole statistic is ONE IEEE division of two
    * exact DECIMAL(38,0) integers; NULL when a single category covers
    * everything (no expected disagreement).
    *
    * Shape at scale: one (unit, category) count shuffle, one per-unit
    * and one per-category rollup, then 1-row arithmetic — the
    * [[fleissKappa]] plan with one extra bounded aggregate. Returns one
    * row (n_units, n_pairable, d_observed, d_expected, alpha) where
    * d_observed/d_expected are the usual per-pair disagreement rates.
    */
  def krippendorffAlpha(df: DataFrame, unitCol: String,
      categoryCol: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val L = 2520L // lcm(1..9): clears 1/(m_u−1) for m_u ≤ 10
    val cell = df.groupBy(col(unitCol).as("__u"),
        col(categoryCol).as("__c"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(false) // feeds the unit AND category rollups
    val byUnit = cell.groupBy("__u")
      .agg(sum("__n").as("__m"),
        sum((col("__n").cast(D38) * col("__n").cast(D38)).cast(D38))
          .cast(D38).as("__sq"))
      .filter(col("__m") >= 2)
      .localCheckpoint(false) // feeds the Do sum AND the survivor join
    val doScaled = byUnit
      .select(
        when(col("__m") <= 10L, col("__m"))
          .otherwise(raise_error(concat(
            lit("krippendorffAlpha: unit with "), col("__m"),
            lit(" ratings exceeds the lcm-clearing bound of 10"))))
          .as("__m"), col("__sq"))
      .agg(count(lit(1)).as("n_units"),
        // L DIV (m−1) is exact (every m−1 ≤ 9 divides lcm(1..9)) and
        // stays in integer space — a decimal division here would ride
        // Spark's min-scale-6 rescale
        sum(((col("__m").cast(D38) * col("__m").cast(D38) - col("__sq"))
          * expr(s"$L DIV (__m - 1)").cast(D38))
          .cast(D38)).cast(D38).as("__dos"),
        sum(col("__m")).as("n_pairable"))
    val byCat = cell.join(byUnit.select("__u"), Seq("__u"))
      .groupBy("__c").agg(sum("__n").cast(D38).as("__nc"))
      .agg(sum(col("__nc")).cast(D38).as("__n"),
        sum((col("__nc") * col("__nc")).cast(D38)).cast(D38).as("__ncsq"))
    doScaled.crossJoin(byCat)
      .select(col("n_units"), col("n_pairable"),
        col("__dos"), col("__n"), col("__ncsq"),
        ((col("__n") * col("__n")).cast(D38) - col("__ncsq")).cast(D38)
          .as("__de"))
      .select(col("n_units"), col("n_pairable"),
        // observed / expected per-pair disagreement rates (display)
        (col("__dos").cast(DoubleType) /
          (lit(L).cast(D38) * col("__n")).cast(D38).cast(DoubleType))
          .as("d_observed"),
        (col("__de").cast(DoubleType) /
          ((col("__n") * (col("__n") - 1)).cast(D38)).cast(DoubleType))
          .as("d_expected"),
        when(col("__de") > 0,
          lit(1.0) -
            (((col("__n") - 1).cast(D38) * col("__dos")).cast(D38)
              .cast(DoubleType) /
              (lit(L).cast(D38) * col("__de")).cast(D38)
                .cast(DoubleType))).as("alpha"))
  }

  /** Cohen's κ (Cohen 1960) — the TWO-rater agreement coefficient with
    * per-rater marginals (unlike [[fleissKappa]]'s pooled marginals; the
    * two coincide exactly when both raters' category distributions are
    * identical — EvalSpec pins that reduction). Input is one row per
    * (subject, rater, category) with rater values exactly {0, 1}; a
    * subject missing either rating raises loudly. The PANEL-shaped
    * sibling of [[graft.ops.Screening.cohenKappa]] (which takes the
    * already-pivoted two-column form and 9-dp-rounds its κ): on the
    * same data the two agree to that rounding — EvalSpec pins the
    * cross-implementation identity. This form adds the ragged-panel
    * guard, the unrounded single-division κ, and the p_o/p_e split.
    *
    * All-integer construction: p_o = agree/N, p_e = Σ_c a_c·b_c/N²,
    * κ = (agree·N − Σ a_c·b_c) / (N² − Σ a_c·b_c) — one IEEE division of
    * exact DECIMAL(38,0) integers, NULL when p_e = 1. One subject-keyed
    * self-join + two bounded category rollups. Returns one row
    * (n_subjects, n_agree, p_o, p_e, kappa).
    */
  /** Rater drift over time — per-WINDOW Cohen's κ plus the first-vs-
    * last-window agreement delta, the labeling-campaign decay detector:
    * annotation quality routinely degrades mid-campaign (rater fatigue,
    * guideline drift, a silently swapped annotator), and a single
    * whole-campaign κ averages the decay away. Composes [[cohenKappa]]'s
    * exact count arithmetic with a window key riding every aggregate
    * (the house grouped-fit idiom): input is one row per (subject,
    * rater ∈ {0,1}, category, window), where the window — a time bucket
    * or batch id — must be a function of the subject (each subject is
    * rated within one window).
    *
    * Per window the full cohenKappa contract holds (both raters rate
    * every subject of that window exactly once, no duplicates — ragged
    * or duplicated panels raise loudly, naming the window); κ is the
    * same single IEEE division of exact DECIMAL(38,0) integers, NULL
    * when chance agreement is total. `kappa_drift` = κ(last window) −
    * κ(first window) (window order), repeated on every row.
    *
    * Shape at scale: one subject-keyed self-join and two bounded
    * (window, category) rollups — the cohenKappa plan with the window
    * key added to every groupBy, so N windows cost what one did; the
    * final drift pass is a window function over ≤ #windows rows.
    * Returns one row per window: (window, n_subjects, n_agree, p_o,
    * p_e, kappa, kappa_drift).
    */
  def cohenKappaDrift(df: DataFrame, subjectCol: String,
      raterCol: String, categoryCol: String, windowCol: String)
      : DataFrame = {
    val D38 = DecimalType(38, 0)
    val base = df.select(col(windowCol).as("__win"),
      col(subjectCol).as("__s"), col(raterCol).cast("long").as("__r"),
      col(categoryCol).as("__c"))
    def side(r: Int) = base.filter(col("__r") === r)
      .select(col("__win"), col("__s"), col("__c").as(s"__c$r"))
    val paired = side(0).join(side(1), Seq("__win", "__s"))
      .localCheckpoint(false) // feeds N/agree AND both marginal rollups
    val nAgree = paired.groupBy("__win")
      .agg(count(lit(1)).as("__N"),
        sum(when(col("__c0") === col("__c1"), 1L).otherwise(0L))
          .as("__agree"))
    val ab = paired.groupBy("__win", "__c0")
      .agg(count(lit(1)).as("__a"))
      .join(paired.groupBy(col("__win"), col("__c1").as("__c0"))
        .agg(count(lit(1)).as("__b")), Seq("__win", "__c0"),
        "full_outer")
      .groupBy("__win")
      .agg(sum((coalesce(col("__a"), lit(0L)).cast(D38) *
        coalesce(col("__b"), lit(0L)).cast(D38)).cast(D38)).cast(D38)
        .as("__ab"))
    // the per-window cohenKappa guard: equal per-rater counts, no
    // per-(subject, rater) duplicates, and the paired count matches
    val counts = base.groupBy("__win", "__r")
      .agg(count(lit(1)).as("__cnt"),
        countDistinct(col("__s")).as("__cds"))
      .groupBy("__win")
      .agg(min("__cnt").as("__cmn"), max("__cnt").as("__cmx"),
        max(when(col("__cnt") =!= col("__cds"), 1L).otherwise(0L))
          .as("__dup"))
    val perWin = counts.join(nAgree, Seq("__win"), "left")
      .join(ab, Seq("__win"), "left")
      .select(col("__win").as("window"),
        when(col("__dup") === 0 && col("__cmn") === col("__cmx") &&
            col("__cmn") === col("__N"),
          col("__N")).otherwise(raise_error(concat(
            lit("cohenKappaDrift: window "), col("__win").cast("string"),
            lit(" violates the paired-panel contract (paired "),
            coalesce(col("__N").cast("string"), lit("none")),
            lit(" of "),
            coalesce(col("__cmn").cast("string"), lit("none")),
            lit(".."),
            coalesce(col("__cmx").cast("string"), lit("none")),
            lit(")")))).as("n_subjects"),
        col("__agree").as("n_agree"),
        (col("__agree").cast(DoubleType) / col("__N").cast(DoubleType))
          .as("p_o"),
        (col("__ab").cast(DoubleType) /
          (col("__N").cast(D38) * col("__N").cast(D38)).cast(D38)
            .cast(DoubleType)).as("p_e"),
        when((col("__N").cast(D38) * col("__N").cast(D38)).cast(D38) >
            col("__ab"),
          ((col("__agree").cast(D38) * col("__N").cast(D38)).cast(D38) -
            col("__ab")).cast(DoubleType) /
            ((col("__N").cast(D38) * col("__N").cast(D38)).cast(D38) -
              col("__ab")).cast(DoubleType)).as("kappa"))
    val full = org.apache.spark.sql.expressions.Window
      .orderBy("window")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perWin
      .withColumn("kappa_drift",
        last("kappa").over(full) - first("kappa").over(full))
      .orderBy("window")
  }

  def cohenKappa(df: DataFrame, subjectCol: String, raterCol: String,
      categoryCol: String): DataFrame = {
    val D38 = DecimalType(38, 0)
    val base = df.select(col(subjectCol).as("__s"),
      col(raterCol).cast("long").as("__r"), col(categoryCol).as("__c"))
    def side(r: Int) = base.filter(col("__r") === r)
      .select(col("__s"), col("__c").as(s"__c$r"))
    val paired = side(0).join(side(1), Seq("__s"))
      .localCheckpoint(false) // feeds N/agree AND both marginal rollups
    val nAgree = paired.agg(count(lit(1)).as("__N"),
      sum(when(col("__c0") === col("__c1"), 1L).otherwise(0L))
        .as("__agree"))
    val ab = paired.groupBy("__c0").agg(count(lit(1)).as("__a"))
      .join(paired.groupBy(col("__c1").as("__c0"))
        .agg(count(lit(1)).as("__b")), Seq("__c0"), "full_outer")
      .agg(sum((coalesce(col("__a"), lit(0L)).cast(D38) *
        coalesce(col("__b"), lit(0L)).cast(D38)).cast(D38)).cast(D38)
        .as("__ab"))
    // ragged-panel guard: the join drops subjects missing a rating, so
    // compare the paired count against the per-rater input counts — AND
    // guard per-(subject, rater) duplicates: offsetting malformed input
    // (rater 0 rates A twice and never rates B while rater 1 rates each
    // once) keeps the raw counts equal yet double-counts A and drops B,
    // so each rater's row count must also equal its DISTINCT subjects
    val counts = base.groupBy("__r")
      .agg(count(lit(1)).as("__cnt"),
        countDistinct(col("__s")).as("__cds"))
      .agg(min("__cnt").as("__cmn"), max("__cnt").as("__cmx"),
        max(when(col("__cnt") =!= col("__cds"), 1L).otherwise(0L))
          .as("__dup"))
    nAgree.crossJoin(ab).crossJoin(counts)
      .select(
        // EMPTY input leaves __cmn/__cmx/__dup NULL → the condition is
        // NULL → the raise fires; coalesce keeps its message readable
        when(col("__dup") === 0 && col("__cmn") === col("__cmx") &&
            col("__cmn") === col("__N"),
          col("__N")).otherwise(raise_error(concat(
            lit("cohenKappa: raters 0 and 1 must each rate every "),
            lit("subject exactly once (paired "), col("__N"),
            lit(" of "),
            coalesce(col("__cmn").cast("string"), lit("none")),
            lit(".."),
            coalesce(col("__cmx").cast("string"), lit("none")),
            when(col("__dup") === 1,
              lit(", with a rater rating some subject more than once"))
              .otherwise(lit("")),
            lit(")")))).as("n_subjects"),
        col("__agree").as("n_agree"),
        (col("__agree").cast(DoubleType) / col("__N").cast(DoubleType))
          .as("p_o"),
        (col("__ab").cast(DoubleType) /
          (col("__N").cast(D38) * col("__N").cast(D38)).cast(D38)
            .cast(DoubleType)).as("p_e"),
        when((col("__N").cast(D38) * col("__N").cast(D38)).cast(D38) >
            col("__ab"),
          ((col("__agree").cast(D38) * col("__N").cast(D38)).cast(D38) -
            col("__ab")).cast(DoubleType) /
            ((col("__N").cast(D38) * col("__N").cast(D38)).cast(D38) -
              col("__ab")).cast(DoubleType)).as("kappa"))
  }
}
