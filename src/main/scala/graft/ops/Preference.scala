package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Preference-data curation for reward-model training: Bradley–Terry
  * strength estimation over pairwise preference records — the fit that
  * turns raw (winner, loser) judgments into per-item strengths, win
  * probabilities, and an item ranking.
  *
  * The reference has no preference surface (its feature store stops at
  * tabular aggregates, `ML Feature Store Pipeline.py:164-183`); this is
  * north-star territory: the data-prep step of RLHF pipelines, where
  * pairwise human judgments become a per-response quality ordering.
  */
object Preference {

  private val D38 = DecimalType(38, 0)
  private val E18 = lit(1000000000000000000L).cast(D38)
  private val E9 = lit(1000000000L).cast(D38)

  /** Exact floor division in DECIMAL(38,0) via the pmod identity —
    * every operand here is non-negative, so it agrees bit-for-bit with
    * DuckDB's truncating `//`.
    */
  private def fdiv(x: Column, d: Column): Column =
    ((x - pmod(x, d)) / d).cast(D38)

  /** Bradley–Terry strength fit by bounded-iteration MM updates
    * (Hunter, Annals of Statistics 2004, eq. 1.6): given games between
    * items a and b with `n_ab` total and `W_a` wins, iterate
    * `p_a ← W_a / Σ_b n_ab/(p_a + p_b)` and renormalize to
    * Σ p = |items|·10⁹. The model is P(a beats b) = p_a/(p_a+p_b);
    * the MM fixed point is the MLE.
    *
    * NANO-INTEGER STATE (the house sgd/holtWinters discipline): p in
    * nano units, each update two exact DECIMAL(38,0) pmod-floor
    * divisions — `term = ⌊n_ab·10¹⁸/(p_a+p_b)⌋` summed per item, then
    * `raw = ⌊W·10¹⁸/denom⌋` and `p' = ⌊raw·k·10⁹/Σraw⌋` — so any
    * engine replays the recursion bit-identically. Magnitudes: with
    * per-pair game counts ≤ 10¹² every product stays ≤ ~10³⁰, far
    * inside precision 38. Items that never win converge to strength 0
    * (the MLE boundary); `greatest(·, 1)` backstops the divisions.
    *
    * Shape at scale: ONE shuffle aggregates the corpus-sized preference
    * log to the (≤ items²)-row directed game relation plus the ≤ items
    * win relation, both localCheckpoint'd; each of the `iters` rounds
    * is broadcast-join arithmetic on those bounded relations — the
    * corpus is never re-read. The final rank is a window over ≤ items
    * rows. Returns (item, n_games, n_wins, strength_nano, rank) with
    * rank 1 = strongest (ties to the smaller item id).
    */
  def btStrength(pairs: DataFrame, winnerCol: String, loserCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64,
      s"btStrength: need 1 <= iters <= 64, got $iters")
    val (items, p) = fit(pairs, winnerCol, loserCol, iters)
    items.join(p, Seq("a"))
      .select(col("a").as("item"), col("n_games"), col("n_wins"),
        col("p").cast("long").as("strength_nano"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("strength_nano").desc, col("item"))))
  }

  /** Per-pair goodness-of-fit of the [[btStrength]] model: for each
    * canonical (item_a < item_b) pairing, the observed win rate of the
    * smaller-id side against the BT-fitted rate p_a/(p_a+p_b), plus the
    * residual — the read that says WHERE the single-strength-per-item
    * model misfits (a systematic residual marks intransitive
    * preferences, rater factions, or prompt-dependent quality that one
    * scalar can't carry).
    *
    * Both rates are ONE IEEE division of exact integers each (no
    * round() of a rational); the residual is their fixed-order
    * difference — engine-bit-identical. Same scale shape as the fit:
    * everything after the corpus collapse runs on ≤ items² rows.
    * Returns (item_a, item_b, n_games, n_wins_a, win_rate_a,
    * fitted_rate_a, residual).
    */
  def btPairStats(pairs: DataFrame, winnerCol: String, loserCol: String,
      iters: Int): DataFrame = {
    require(iters >= 1 && iters <= 64,
      s"btPairStats: need 1 <= iters <= 64, got $iters")
    val (_, p) = fit(pairs, winnerCol, loserCol, iters)
    val w = pairs.select(col(winnerCol).cast("long").as("__w"),
      col(loserCol).cast("long").as("__l"))
    val canon = w.select(least(col("__w"), col("__l")).as("item_a"),
        greatest(col("__w"), col("__l")).as("item_b"),
        when(col("__w") < col("__l"), 1L).otherwise(0L).as("__wa"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_games"), sum("__wa").as("n_wins_a"))
    canon
      .join(broadcast(p.select(col("a").as("item_a"),
        col("p").cast("long").as("__pa"))), Seq("item_a"))
      .join(broadcast(p.select(col("a").as("item_b"),
        col("p").cast("long").as("__pb"))), Seq("item_b"))
      .select(col("item_a"), col("item_b"), col("n_games"),
        col("n_wins_a"),
        (col("n_wins_a").cast("double") / col("n_games"))
          .as("win_rate_a"),
        when(col("__pa") + col("__pb") > 0,
          col("__pa").cast("double") /
            (col("__pa") + col("__pb")).cast("double"))
          .as("fitted_rate_a"))
      .withColumn("residual", col("win_rate_a") - col("fitted_rate_a"))
  }

  /** Majority-preference cycle census — the Condorcet-consistency audit
    * of a preference log: per canonical pair, the strict majority
    * winner defines a tournament edge (exact ties define none), and
    * every CYCLIC triad (i→j→k→i) is direct evidence that no total
    * order — and hence no Bradley–Terry scalar — can explain the data
    * at that triple. A high cyclic count says "don't ship one reward
    * scalar"; [[btPairStats]] residuals say where.
    *
    * Shape at scale: the same one-shuffle corpus collapse to ≤ items²
    * canonical pairs; the triad join is three self-joins of the ≤
    * items² edge relation anchored at the minimum node (each cycle
    * counted exactly once) — bounded by items³, never corpus-scale.
    * Returns one row (n_items, n_edges, n_ties, n_cyclic_triads).
    */
  def majorityCycles(pairs: DataFrame, winnerCol: String,
      loserCol: String): DataFrame = {
    val w = pairs.select(col(winnerCol).cast("long").as("__w"),
      col(loserCol).cast("long").as("__l"))
    val canon = w.select(least(col("__w"), col("__l")).as("__a"),
        greatest(col("__w"), col("__l")).as("__b"),
        when(col("__w") < col("__l"), 1L).otherwise(0L).as("__wa"))
      .groupBy("__a", "__b")
      .agg(count(lit(1)).as("__n"), sum("__wa").as("__na"))
      .localCheckpoint(false)
    val e = canon.filter(col("__na") * 2 =!= col("__n"))
      .select(
        when(col("__na") * 2 > col("__n"), col("__a")).otherwise(col("__b"))
          .as("u"),
        when(col("__na") * 2 > col("__n"), col("__b")).otherwise(col("__a"))
          .as("v"))
      .localCheckpoint(false)
    val nItems = canon.select(col("__a").as("i"))
      .unionByName(canon.select(col("__b").as("i")))
      .agg(countDistinct(col("i")).as("n_items"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    val nTies = canon.agg(
      sum(when(col("__na") * 2 === col("__n"), 1L).otherwise(0L))
        .as("n_ties"))
    // anchor each cycle at its minimum node so it counts exactly once
    val cyc = e.select(col("u").as("u1"), col("v").as("v1"))
      .join(e.select(col("u").as("u2"), col("v").as("v2")),
        col("v1") === col("u2") && col("u1") < col("u2"))
      .join(e.select(col("u").as("u3"), col("v").as("v3")),
        col("v2") === col("u3") && col("v3") === col("u1") &&
          col("u1") < col("u3"))
      .agg(count(lit(1)).as("n_cyclic_triads"))
    nItems.crossJoin(broadcast(nEdges)).crossJoin(broadcast(nTies))
      .crossJoin(broadcast(cyc))
  }

  /** Position-bias audit of a presentation-ordered preference log — the
    * reward-hacking screen for "the judge prefers whichever answer is
    * shown first" (the documented LLM-judge failure mode; Zheng et al.
    * 2023 measure it on GPT-4 MT-Bench judgments). Input is one row per
    * comparison with the FIRST-shown item, the SECOND-shown item and
    * the winner; a winner matching neither presentation raises loudly
    * (a malformed log would otherwise silently bias the rate).
    *
    * The statistic: with W first-side wins of N paired presentations,
    * the pooled two-proportion z between the first-side rate W/N and
    * the second-side rate (N−W)/N algebraically reduces to
    * z = (2W − N)/√N (the pooled p̂ is exactly 1/2 because the two
    * proportions are complements) — computed as ONE IEEE division of
    * the exact integer 2W − N by √N, engine-bit-identical. |z| > 3 ≈
    * a position effect at the 0.1% level on a log this size.
    *
    * Shape at scale: ONE count shuffle collapses the corpus to four
    * integers; everything after is 1-row arithmetic. Returns one row
    * (n_pairs, n_first_wins, n_second_wins, first_win_rate,
    * z_position).
    */
  def positionBias(log: DataFrame, firstCol: String, secondCol: String,
      winnerCol: String): DataFrame = {
    val agg = log.agg(count(lit(1)).as("n_pairs"),
      sum(when(col(winnerCol) === col(firstCol), 1L).otherwise(0L))
        .as("n_first_wins"),
      max(when(col(winnerCol) =!= col(firstCol) &&
        col(winnerCol) =!= col(secondCol), 1L).otherwise(0L))
        .as("__bad"))
    agg.select(
        when(coalesce(col("__bad"), lit(0L)) === 0, col("n_pairs"))
          .otherwise(raise_error(concat(
            lit("positionBias: a winner matches neither presented "),
            lit("side — malformed preference log")))).as("n_pairs"),
        col("n_first_wins"))
      .select(col("n_pairs"), col("n_first_wins"),
        (col("n_pairs") - col("n_first_wins")).as("n_second_wins"),
        (col("n_first_wins").cast("double") /
          col("n_pairs").cast("double")).as("first_win_rate"),
        ((col("n_first_wins") * 2 - col("n_pairs")).cast("double") /
          sqrt(col("n_pairs").cast("double"))).as("z_position"))
  }

  /** Length-bias audit — the second reward-hacking screen: LLM judges
    * (and the reward models distilled from them) systematically prefer
    * LONGER answers (Dubois et al. 2024 built length-controlled
    * AlpacaEval around exactly this). Input is one row per comparison
    * with the first/second-shown items' lengths and the first-wins
    * outcome; pairs are binned into `buckets` equal-count quantiles of
    * the SIGNED length delta (first − second) via ntile ordered by
    * (delta, tieCol) — deterministic on both engines — and each bin
    * reports its first-side win rate. A length-biased judge shows the
    * rate climbing monotonically across delta bins; an honest one is
    * flat at the log's base rate.
    *
    * Shape at scale: the quantile banding is SIZE-DISPATCHED on
    * [[SaltedGrid.ntileCutoff]] exactly as the gains-table is — bounded
    * logs take the one-task ntile window, row-scale logs the salted
    * global rank ([[SaltedGrid.valueRankedDeterministic]]) pushed
    * through the [[SaltedGrid.ntileBand]] integer split, hash-identical
    * by the shared banding rule; after banding it's one ≤ buckets-row
    * rollup with one IEEE division per bin. Returns one row per bin:
    * (delta_bin, n_pairs, n_first_wins, first_win_rate, min_delta,
    * max_delta).
    */
  def lengthBias(log: DataFrame, firstLenCol: String,
      secondLenCol: String, firstWinsCol: String, tieCol: String,
      buckets: Int): DataFrame = {
    require(buckets >= 2 && buckets <= 1000,
      s"lengthBias: need 2 <= buckets <= 1000, got $buckets")
    val delta = (col(firstLenCol) - col(secondLenCol)).cast("long")
    val scored = log.select(delta.as("__d"),
        col(firstWinsCol).as("__fw"), col(tieCol).as("__t"))
      .localCheckpoint(false)
    val banded =
      if (scored.count() <= SaltedGrid.ntileCutoff(log.sparkSession))
        scored.withColumn("delta_bin", ntile(buckets).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("__d"), col("__t"))).cast("long"))
      else
        SaltedGrid.valueRankedDeterministic(scored, Nil, col("__d"),
          Seq(col("__t")))
          .withColumn("delta_bin",
            SaltedGrid.ntileBand(col("__rank"), col("__n"), buckets))
    banded.groupBy("delta_bin")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("__fw"), 1L).otherwise(0L)).as("n_first_wins"),
        min("__d").as("min_delta"), max("__d").as("max_delta"))
      .select(col("delta_bin"), col("n_pairs"), col("n_first_wins"),
        (col("n_first_wins").cast("double") /
          col("n_pairs").cast("double")).as("first_win_rate"),
        col("min_delta"), col("max_delta"))
      .orderBy("delta_bin")
  }

  /** The shared MM fit: (items relation (a, n_games, n_wins),
    * strengths relation (a, p) in nano DECIMAL(38,0)).
    */
  private def fit(pairs: DataFrame, winnerCol: String, loserCol: String,
      iters: Int): (DataFrame, DataFrame) = {
    val w = pairs.select(col(winnerCol).cast("long").as("__w"),
      col(loserCol).cast("long").as("__l"))
    // directed game counts: one corpus shuffle, then every iteration
    // runs on this bounded relation
    val g = w.select(col("__w").as("a"), col("__l").as("b"))
      .unionByName(w.select(col("__l").as("a"), col("__w").as("b")))
      .groupBy("a", "b").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val wins = w.groupBy(col("__w").as("a"))
      .agg(count(lit(1)).as("n_wins"))
      .localCheckpoint(false)
    val items = g.groupBy("a").agg(sum("n").as("n_games"))
      .join(wins, Seq("a"), "left")
      .select(col("a"), col("n_games"),
        coalesce(col("n_wins"), lit(0L)).as("n_wins"))
      .localCheckpoint(false)
    var p = items.select(col("a"), E9.as("p"))
    for (_ <- 1 to iters) {
      val denom = g
        .join(broadcast(p.select(col("a"), col("p").as("__pa"))), Seq("a"))
        .join(broadcast(p.select(col("a").as("b"), col("p").as("__pb"))),
          Seq("b"))
        .groupBy("a")
        .agg(sum(fdiv(col("n").cast(D38) * E18,
          greatest(col("__pa") + col("__pb"), lit(1).cast(D38))))
          .cast(D38).as("__d"))
      val raw = denom.join(broadcast(items.select("a", "n_wins")), Seq("a"))
        .select(col("a"),
          fdiv(col("n_wins").cast(D38) * E18,
            greatest(col("__d"), lit(1).cast(D38))).as("__raw"))
      val z = raw.agg(sum(col("__raw")).cast(D38).as("__z"),
        count(lit(1)).cast(D38).as("__k"))
      p = raw.crossJoin(broadcast(z))
        .select(col("a"),
          fdiv(col("__raw") * col("__k") * E9,
            greatest(col("__z"), lit(1).cast(D38))).as("p"))
        .localCheckpoint(false)
    }
    (items, p)
  }
}
