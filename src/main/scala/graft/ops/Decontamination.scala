package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark / eval-set decontamination — the training-corpus hygiene step
  * every serious LLM data pipeline runs before pretraining: a training
  * document whose n-grams overlap an evaluation set beyond a threshold is
  * flagged (and usually dropped) so downstream benchmark numbers measure
  * generalization, not leakage. (The reference pipeline stops at feature
  * quality checks, `ML Feature Store Pipeline.py:164-199`; this is the
  * corpus-level counterpart.)
  *
  * Scale design — the eval side is SMALL (benchmark suites: 10³–10⁵ docs)
  * and the training side is the 100 TB corpus, so the plan must never
  * shuffle the corpus:
  *  - eval n-grams collapse to ONE sorted distinct `array<long>` of 48-bit
  *    gram hashes (a few MB even for large suites), broadcast as a one-row
  *    relation;
  *  - each training document computes its own sorted distinct gram array
  *    via the fused `graft_ngram_hashes` kernel and counts the overlap with
  *    the codegen'd `graft_sorted_intersect` merge — per-row work only,
  *    ZERO corpus shuffles, no explode of the training side at all;
  *  - documents with fewer than n tokens have no n-grams and are exempt
  *    (no gram evidence either way), matching the SQL formulation where
  *    they produce no gram rows.
  *
  * Gram identity is the 48-bit md5-derived hash (`ha` of
  * [[graft.functions.NgramHashes]]) on BOTH sides, mirrored in the DuckDB
  * oracle — overlap counts are therefore distinct-hash counts, identical
  * across engines modulo 48-bit collisions inside a single document.
  */
object Decontamination {

  /** Sorted distinct 48-bit gram-hash array per input row's text. */
  private def gramArray(textCol: String, n: Int) =
    array_sort(array_distinct(transform(
      call_function("graft_ngram_hashes", col(textCol), lit(n)),
      g => g.getField("ha"))))

  /** Per-document overlap statistics against the eval set:
    * (doc_id, n_grams, n_overlap, overlap_frac), one row per training
    * document that has at least one n-gram.
    */
  def overlapStats(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(gramArray(textCol, n)).as("th"))
      .agg(sort_array(collect_set(col("th"))).as("eval_grams"))
    docs.select(col(idCol).as("doc_id"), gramArray(textCol, n).as("grams"))
      .filter(size(col("grams")) > 0)
      .crossJoin(broadcast(evalGrams))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("n_grams"),
        call_function("graft_sorted_intersect", col("grams"), col("eval_grams"))
          .as("n_overlap"))
      .withColumn("overlap_frac",
        round(col("n_overlap").cast("double") / col("n_grams"), 6))
  }

  /** Rows of `docs` that SURVIVE decontamination: overlap fraction with the
    * eval set strictly below `maxFrac`. Gram-less documents survive (no
    * evidence). One left-anti broadcast-able join against the (small)
    * flagged-id set.
    */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame, idCol: String,
      textCol: String, n: Int, maxFrac: Double): DataFrame = {
    val flagged = overlapStats(docs, evalDocs, idCol, textCol, n)
      .filter(col("overlap_frac") >= maxFrac)
      .select(col("doc_id").as(idCol))
    docs.join(flagged, Seq(idCol), "left_anti")
  }

  /** SEMANTIC contamination audit — the embedding-space complement of
    * [[overlapStats]]: paraphrased or translated benchmark leakage carries
    * no shared n-grams, so modern decontamination (e.g. the practice
    * popularized alongside SemDeDup-style embedding dedup) additionally
    * flags training items whose embedding cosine against ANY eval item
    * reaches `threshold`.
    *
    * Returns one row per CONTAMINATED training item:
    * (train_id, eval_id, max_cos, n_matches) — the argmax eval match
    * (smallest eval id on 6-dp cosine ties, the library argmin
    * convention), the tied max cosine, and how many eval items cleared
    * the threshold.
    *
    * Scale shape (the [[overlapStats]] rule — never shuffle the corpus):
    * the eval side is benchmark-sized and broadcasts; each training row
    * scores against it map-side via the codegen'd dot kernel; the
    * threshold filter runs BEFORE the per-train-id argmax collapse, so
    * the only shuffle is over flagged pairs (contamination-sized, not
    * corpus-sized) and is partial-aggregable (min-struct, not a window).
    * Cosines round to 6 dp — sqrt-derived, engine-safe.
    */
  def semanticContamination(train: DataFrame, evalSet: DataFrame,
      idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val t = train.select(col(idCol).as("train_id"),
      col(vecCol).cast("array<double>").as("__tv"))
    val e = evalSet.select(col(idCol).as("eval_id"),
      col(vecCol).cast("array<double>").as("__ev"))
    t.crossJoin(broadcast(e))
      .select(col("train_id"), col("eval_id"),
        round(Similarity.cosine(col("__tv"), col("__ev")), 6).as("__cos"))
      .filter(col("__cos") >= threshold)
      .groupBy("train_id")
      .agg(min(struct((-col("__cos")).as("__nc"),
          col("eval_id").as("__e"))).as("__best"),
        count(lit(1)).as("n_matches"))
      .select(col("train_id"), col("__best.__e").as("eval_id"),
        (-col("__best.__nc")).as("max_cos"), col("n_matches"))
  }
}
