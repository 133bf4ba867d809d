package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed suffix-rank construction by prefix doubling (Manber &
  * Myers 1993, "Suffix arrays: a new method for on-line string
  * searches") over the corpus token stream, and the COLLISION-FREE
  * exact-substring span removal built on it — the suffix-array
  * formulation of the Lee et al. 2022 ExactSubstr transform that
  * [[Dedup.spanRemoval]] approximates with xxhash64 gram identities.
  *
  * Suffixes never cross document boundaries (each document is its own
  * string; the corpus is their disjoint union), so a suffix is the pair
  * (doc, pos) and the doubling step reads the rank at (doc, pos + 2^k)
  * — no global concatenation offset exists anywhere, which is what
  * keeps the construction embarrassingly relational:
  *
  *  - round 0: distinct tokens ranked once (any total order works — the
  *    downstream consumer only uses rank EQUALITY, so tokens order by
  *    (xxhash64, token) and the rank comes from the salted two-phase
  *    rank, never a single-task sort over the vocabulary);
  *  - round k→k+1 (Manber–Myers): new rank = SQL `rank()` of the pair
  *    (rank_k(pos), rank_k(pos + 2^k)), with 0 (below every real rank)
  *    for positions whose lookahead falls off the document — a shorter
  *    suffix differs from every longer one sharing its tokens. The pair
  *    ranking is the same two-phase salted discipline: collapse to the
  *    DISTINCT-pair grid with counts (bounded by min(N, V·V) rows, in
  *    practice ≪ N once ranks spread), percentile-edge bucket on the
  *    leading rank, per-bucket exclusive offsets from a ≤`buckets`-row
  *    aggregate, rank = offset + within-bucket running count + 1, joined
  *    back on the pair. `rank()` (not dense_rank) keeps values injective
  *    on distinct prefixes WITHOUT a global dense renumbering pass.
  *  - log₂(width) rounds total; each round's rank relation is
  *    `localCheckpoint`ed — the iterative-lineage discipline every
  *    looping operator here follows ([[Graph.pageRank]],
  *    [[Dedup.connectedComponents]]).
  *
  * Rank identity after round k: rank_k(doc, pos) == rank_k(doc', pos')
  * ⟺ the two suffixes agree on their first 2^k tokens AND on
  * min(2^k, remaining) — exact string equality classes, no hash
  * anywhere. An m-gram identity for ANY m ≤ 2·width then needs no
  * further rounds: with j = width ≥ m − j, the key
  * (rank_j(pos), rank_j(pos + m − j)) equates exactly the positions
  * whose next m tokens match (the classic overlapping-window trick —
  * both windows are full-width because the caller filters
  * pos + m ≤ docLen).
  *
  * Scale shape: every step is a shuffle join or a partial-aggregable
  * group-by on (doc, pos) or rank pairs; the only windows run per salt
  * bucket (data-scale) or over the ≤`buckets`-row offsets relation
  * (bounded). A hot leading rank (the stopword bucket in round 1) is
  * bounded by the DISTINCT follower count (≤ vocabulary), not by its
  * occurrence mass — the grid collapses occurrences before any window
  * sees them.
  */
object SuffixArray {

  /** `rank()` over (`__r`, `__r2`) pairs — equal pairs share the rank
    * value, values injective on distinct pairs. Input columns
    * (doc_id, pos, __r, __r2); output (doc_id, pos, __r) with the new
    * rank. `small` = the caller attests the pair grid is bounded
    * ([[SaltedGrid.ntileCutoff]] dispatch), so a single-task window over
    * the DISTINCT-pair grid beats the salted machinery's fixed costs;
    * otherwise the two-phase percentile-bucket form runs. Both produce
    * identical ranks.
    */
  private def rankPairs(pairs: DataFrame, buckets: Int,
      small: Boolean): DataFrame = {
    val grid = pairs.groupBy("__r", "__r2").agg(count(lit(1)).as("__c"))
    val ranked =
      if (small)
        grid.withColumn("__nr", coalesce(sum(col("__c")).over(
          Window.orderBy("__r", "__r2")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
          .select(col("__r"), col("__r2"), col("__nr"))
      else {
        val qs = (1 until buckets).map(_.toDouble / buckets)
        val edges = grid.agg(percentile_approx(col("__r"),
          array(qs.map(lit): _*), lit(10000)).as("__edges"))
        val binned = grid.crossJoin(broadcast(edges))
          .withColumn("__b",
            SaltedGrid.binChain(col("__r"), col("__edges"), buckets)
              .cast("int"))
          .drop("__edges")
        // bounded relation: per-bucket offsets over <= buckets rows
        val offs = binned.groupBy("__b").agg(sum(col("__c")).as("__bc"))
          .withColumn("__off", coalesce(sum(col("__bc")).over(
            Window.orderBy("__b")
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select("__b", "__off")
        // the only data-scale window: per-bucket running pair counts;
        // equal __r lands in ONE bucket so bucket-major = global order
        val w = Window.partitionBy("__b").orderBy("__r", "__r2")
        binned.join(broadcast(offs), Seq("__b"))
          .withColumn("__nr", col("__off") + coalesce(sum(col("__c")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)) + 1L)
          .select(col("__r"), col("__r2"), col("__nr"))
      }
    // small path: the caller attests the pair grid is bounded (it just
    // ran a single-task window over it), so the rank relation broadcasts
    // — the position-scale `pairs` relation then never re-shuffles by
    // rank pair, and each doubling round keeps its doc_id clustering
    // end to end (guide §2.4). The large path keeps the shuffled join.
    val joined = pairs.join(if (small) broadcast(ranked) else ranked,
        Seq("__r", "__r2"))
      .select(col("doc_id"), col("pos"), col("__nr").as("__r"))
    // the broadcast path inherits `pairs`' doc_id clustering; the
    // shuffled path lands rank-pair-partitioned and pays one explicit
    // re-cluster here so the NEXT round's self-join (two sides) stays
    // exchange-free — net one exchange saved per round
    if (small) joined else joined.repartition(col("doc_id"))
  }

  /** Suffix ranks of width `width` (a power of two): (doc_id, pos, __r)
    * for every token position, rank equality ⟺ the suffixes agree on
    * their first min(width, remaining) tokens and on that minimum.
    * `tokens` must be (doc_id, pos, tok) with 0-based contiguous pos.
    */
  private[graft] def prefixRanks(tokens: DataFrame, width: Int,
      buckets: Int = 64, small: Boolean = false): DataFrame = {
    require(width >= 1 && Integer.bitCount(width) == 1,
      s"width must be a power of two: $width")
    // round 0: vocabulary ranks — ties of the 64-bit hash broken by the
    // token itself, so distinct tokens always get distinct ranks
    val vocab = tokens.select("tok").distinct()
    val vocabRanked =
      if (small)
        vocab.withColumn("__r", row_number().over(
          Window.orderBy(xxhash64(col("tok")), col("tok"))).cast("long"))
      else
        SaltedGrid.valueRankedDeterministic(vocab, Nil,
            xxhash64(col("tok")), Seq(col("tok")), buckets)
          .select(col("tok"), col("__rank").as("__r"))
    // clustered by doc_id ONCE (checkpoint preserves the partitioning):
    // every doubling round's rank ⋈ shifted-rank self-join and the
    // caller's overlapping-window join then run exchange-free on both
    // sides — without this each round re-shuffled the full position
    // relation twice
    var ranks = tokens.join(vocabRanked, Seq("tok"))
      .select(col("doc_id"), col("pos"), col("__r"))
      .repartition(col("doc_id"))
      .localCheckpoint()
    var w = 1
    while (w < width) {
      val shifted = ranks.select(col("doc_id"),
        (col("pos") - w).as("pos"), col("__r").as("__r2"))
      val paired = ranks.join(shifted, Seq("doc_id", "pos"), "left")
        .withColumn("__r2", coalesce(col("__r2"), lit(0L)))
      ranks = rankPairs(paired, buckets, small).localCheckpoint()
      w *= 2
    }
    ranks
  }

  /** Exact-substring span removal via suffix ranks — the same relation
    * as [[Dedup.spanRemoval]] (every token covered by a `minTokens`-gram
    * occurring ≥ 2 times anywhere is removed; documents reassemble from
    * survivors, NULL clean_text when nothing survives), but the gram
    * identity is the EXACT string equality class from ⌈log₂ minTokens⌉
    * doubling rounds, not a 64-bit hash: no collision can ever remove a
    * clean token, at any corpus size. Returns
    * (doc_id, n_tokens, n_removed, clean_text).
    */
  def suffixSpanRemoval(docs: DataFrame, idCol: String, textCol: String,
      minTokens: Int, buckets: Int = 64): DataFrame = {
    require(minTokens >= 2, s"minTokens must be >= 2: $minTokens")
    val t = col("__t")
    val withToks = docs.select(col(idCol).as("doc_id"),
      filter(split(col(textCol), " "), s => s =!= "").as("__t"))
    val tokens = withToks.select(col("doc_id"),
      posexplode(t).as(Seq("pos", "tok")))
    // size dispatch (SaltedGrid.ntileCutoff): one map-only token count —
    // ~1% of the log-rounds' shuffle work — decides whether each round's
    // pair ranking runs as a bounded single-task window or the salted
    // two-phase form; ranks are identical either way
    val small =
      tokens.count() <= SaltedGrid.ntileCutoff(docs.sparkSession)
    val j = Integer.highestOneBit(minTokens)
    val ranks = prefixRanks(tokens, j, buckets, small)
    val lens = withToks.select(col("doc_id"), size(t).as("__len"))
    // m-gram key = (rank_j(pos), rank_j(pos + m - j)); both windows are
    // full-width under the pos + m <= len filter, so key equality is
    // exact m-token equality
    val keyed0 =
      if (minTokens == j)
        ranks.select(col("doc_id"), col("pos"),
          col("__r").as("__ka"), col("__r").as("__kb"))
      else {
        val shifted = ranks.select(col("doc_id"),
          (col("pos") - (minTokens - j)).as("pos"), col("__r").as("__kb"))
        ranks.join(shifted, Seq("doc_id", "pos"))
          .select(col("doc_id"), col("pos"),
            col("__r").as("__ka"), col("__kb"))
      }
    val keyed = keyed0.join(lens, Seq("doc_id"))
      .filter(col("pos") + minTokens <= col("__len"))
      .drop("__len")
    val dup = keyed.groupBy("__ka", "__kb").agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= 2).select("__ka", "__kb")
    val covered = keyed.join(dup, Seq("__ka", "__kb"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + minTokens - 1))
          .as("pos"))
      .distinct()
    // survivor reassembly — the [[Dedup.spanRemoval]] tail verbatim so
    // the two transforms stay relation-identical
    val surv = tokens.join(covered, Seq("doc_id", "pos"), "left_anti")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("__joined"))
    withToks.filter(size(t) >= 1)
      .select(col("doc_id"), size(t).cast("long").as("n_tokens"))
      .join(surv, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"),
        when(coalesce(col("__n_kept"), lit(0L)) > 0, col("__joined"))
          .otherwise(lit(null).cast("string")).as("clean_text"))
  }
}
