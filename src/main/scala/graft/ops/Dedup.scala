package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication operators for large-scale training-data pipelines:
  * exact (hash group-by), n-gram/token Jaccard (inverted-index self-join),
  * MinHash + LSH banding (the 100 TB path), and SimHash.
  *
  * Scale design:
  *  - Everything is expression-only DataFrame code — whole-stage codegen,
  *    no UDFs, no driver materialization.
  *  - Exact dedup shuffles once on the content hash (not the full text —
  *    md5 first, group on the 16-byte digest).
  *  - The token inverted-index join is quadratic in per-token document
  *    frequency; `maxDf` caps hot tokens (standard trick: a token appearing
  *    in >maxDf docs contributes candidates without discriminating, so it
  *    is dropped from *candidate generation* while exact Jaccard is still
  *    verified on the surviving pairs).
  *  - MinHash/LSH replaces the quadratic join at scale: b bands of r rows
  *    ⇒ candidate pairs only for docs agreeing on a full band; cost is
  *    O(docs · bands) + per-bucket joins.
  *  - Hashes are md5-derived (not xxhash64) so every step is expressible
  *    in ANSI SQL for the DuckDB oracle; swap `hashExpr` for xxhash64 if
  *    profiling ever shows md5 on the critical path.
  */
object Dedup {

  /** Exact duplicate groups by content: one row per duplicated key with the
    * canonical (minimum) id and the group size. Single shuffle on md5(key).
    */
  def exactGroups(df: DataFrame, idCol: String, keyCol: String): DataFrame =
    df.select(md5(col(keyCol)).as("content_md5"), col(idCol))
      .groupBy("content_md5")
      .agg(min(col(idCol)).as("canonical_id"), count(lit(1)).as("group_size"))

  /** Exact dedup keep-first: drop all but the minimum-id row per key. */
  def exactDedup(df: DataFrame, idCol: String, keyCol: String): DataFrame = {
    val canon = exactGroups(df, idCol, keyCol)
      .select(col("canonical_id").as(idCol))
    df.join(canon, Seq(idCol), "left_semi")
  }

  /** Distinct (id, token) pairs from whitespace tokenization; empty tokens
    * dropped. The base relation for all set-similarity operators.
    */
  def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(col(textCol), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()

  /** Distinct (id, gram) pairs of word n-grams (shingles). n=1 degenerates
    * to [[tokens]].
    */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    if (n <= 1) tokens(df, idCol, textCol)
    else {
      val toks = split(col(textCol), " ")
      val clean = filter(toks, t => t =!= "")
      // sliding window via transform over start indices; sequence(a, b)
      // would count DOWN for a > b, so guard short docs explicitly
      val starts = when(size(clean) >= n, sequence(lit(0), size(clean) - n))
        .otherwise(array().cast("array<int>"))
      val grams = transform(starts, i => concat_ws(" ", slice(clean, i + 1, lit(n))))
      df.select(col(idCol).as("id"), explode(grams).as("token"))
        .filter(col("token") =!= "")
        .distinct()
    }
  }

  /** Near-duplicate pairs by exact token-set Jaccard ≥ threshold, via an
    * inverted-index self-join. `maxDf` (0 = unlimited) drops tokens hotter
    * than the cap from candidate generation (recall knob for scale; exact
    * Jaccard is still computed on true token sets).
    */
  def jaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 1,
      maxDf: Long = 0L): DataFrame = {
    val tok = shingles(df, idCol, textCol, n)
    if (maxDf <= 0) {
      // full inverted-index join: intersection counted directly
      val a = tok.select(col("id").as("id_a"), col("token"))
      val b = tok.select(col("id").as("id_b"), col("token"))
      val inter = a.join(b, Seq("token"))
        .filter(col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(count(lit(1)).as("n_common"))
      scoreAndFilter(inter, tokenSizes(tok), threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    } else {
      // capped index yields CANDIDATES only; the true intersection must be
      // recounted on full token sets, else hot tokens vanish from n_common
      val hot = tok.groupBy("token").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf).select("token")
      val joinTok = tok.join(broadcast(hot), Seq("token"), "left_anti")
      val cand = joinTok.select(col("id").as("id_a"), col("token"))
        .join(joinTok.select(col("id").as("id_b"), col("token")), Seq("token"))
        .filter(col("id_a") < col("id_b"))
        .select("id_a", "id_b")
        .distinct()
      verifyCandidates(cand, tok, threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    }
  }

  private def tokenSizes(tok: DataFrame): DataFrame =
    tok.groupBy("id").agg(count(lit(1)).as("n_tokens"))

  /** Attach true set sizes + jaccard to an intersection-count relation and
    * apply the threshold.
    */
  private def scoreAndFilter(inter: DataFrame, sizes: DataFrame,
      threshold: Double): DataFrame =
    inter
      .join(sizes.select(col("id").as("id_a"), col("n_tokens").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("n_tokens").as("n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") / (col("n_a") + col("n_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)

  /** Exact-Jaccard verification of candidate pairs against full token sets. */
  private def verifyCandidates(cand: DataFrame, tok: DataFrame,
      threshold: Double): DataFrame = {
    val inter = cand
      .join(tok.select(col("id").as("id_a"), col("token")), Seq("id_a"))
      .join(tok.select(col("id").as("id_b"), col("token").as("token_b")), Seq("id_b"))
      .filter(col("token") === col("token_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"))
    scoreAndFilter(inter, tokenSizes(tok), threshold)
  }

  /** md5-derived per-token hash for MinHash permutation `i` (hex string;
    * lexicographic min is the MinHash).
    */
  private def tokenHash(i: Int): Column =
    md5(concat(lit(s"$i:"), col("token")))

  /** MinHash signatures: one row per id with `numHashes` hex-string min
    * hashes `s0..s{n-1}`. One shuffle (group-by id).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int): DataFrame = {
    val aggs = (0 until numHashes).map(i => min(tokenHash(i)).as(s"s$i"))
    tokens(df, idCol, textCol).groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over MinHash signatures: (id, band, band_hash), one row
    * per band. Docs equal on any full band become candidate pairs.
    */
  def lshBands(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val sig = minhashSignatures(df, idCol, textCol, numHashes)
    val bandStructs = (0 until bands).map { bidx =>
      val slice = (0 until rows).map(r => col(s"s${bidx * rows + r}"))
      struct(lit(bidx).as("band"), md5(concat_ws("|", slice: _*)).as("band_hash"))
    }
    sig.select(col("id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.band_hash").as("band_hash"))
  }

  /** MinHash-LSH near-dup pairs: candidates from band collisions, then
    * exact Jaccard verification ≥ threshold. The scale path: candidate
    * generation is linear in corpus size (plus per-bucket joins) instead of
    * the inverted index's df² blowup. May miss pairs (LSH false negatives);
    * tune (numHashes, bands) for the target threshold.
    */
  def minhashLshPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 12,
      bands: Int = 3): DataFrame = {
    val band = lshBands(df, idCol, textCol, numHashes, bands)
    val cand = band.select(col("band"), col("band_hash"), col("id").as("id_a"))
      .join(band.select(col("band"), col("band_hash"), col("id").as("id_b")),
        Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    verifyCandidates(cand, tokens(df, idCol, textCol), threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** 32-bit SimHash over distinct tokens: bit i of a token's contribution
    * is the parity of hex digit i of its md5 (ascii(c) % 2 — expressible in
    * both engines); the document bit is the sign of the summed ±1 votes.
    * Returns (id, simhash: Long). One shuffle.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val votes = (0 until 32).map { i =>
      sum(when(ascii(substring(md5(col("token")), i + 1, 1)) % 2 === 1, 1)
        .otherwise(-1)).as(s"v$i")
    }
    val bits = (0 until 32).map { i =>
      when(col(s"v$i") >= 0, lit(1L) * (1L << i)).otherwise(0L)
    }
    tokens(df, idCol, textCol)
      .groupBy("id")
      .agg(votes.head, votes.tail: _*)
      .select(col("id"), bits.reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, using the
    * block trick for candidate generation: split 32 bits into
    * `maxHamming + 1` blocks — any pair within the distance budget must
    * agree exactly on at least one block (pigeonhole), so candidates come
    * from equality joins on block values, never an all-pairs compare.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash(df, idCol, textCol)
    val nBlocks = maxHamming + 1
    val width = 32 / nBlocks
    val blocks = (0 until nBlocks).map { b =>
      struct(lit(b).as("blk"),
        shiftright(col("simhash"), b * width).bitwiseAND(lit((1L << width) - 1))
          .as("blk_val"))
    }
    val blk = sh.select(col("id"), col("simhash"), explode(array(blocks: _*)).as("b"))
      .select(col("id"), col("simhash"), col("b.blk").as("blk"), col("b.blk_val").as("blk_val"))
    val cand = blk.select(col("blk"), col("blk_val"), col("id").as("id_a"), col("simhash").as("sh_a"))
      .join(blk.select(col("blk"), col("blk_val"), col("id").as("id_b"), col("simhash").as("sh_b")),
        Seq("blk", "blk_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b")
      .distinct()
    cand
      .withColumn("hamming", bit_count(expr("sh_a ^ sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
