package graft

import graft.functions.{BpeAdjacentPairs, BucketCounts, Md5Hash48, BpeApplyPair, BpeEncodeWord, BpeKernel, DeflateLength, DotProduct, DtwDistance, NgramHashes, PermSums, PqAssignCodes, PqKernel, SimHash32, SortedIntersectCount, UnigramKernel, UnigramSegmentWord, WordpieceKernel, WordpieceWord}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Library extension point — the idiomatic way a Spark-native library ships
  * custom Catalyst expressions: users add
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and the functions resolve in
  * both the SQL parser and `call_function`.
  *
  * Registered functions:
  *  - `graft_dot(array<double>, array<double>) -> double` — codegen'd
  *    sequential dot product ([[graft.functions.DotProduct]]).
  *  - `graft_sorted_intersect(array<long>, array<long>) -> long` —
  *    codegen'd merge intersection count over sorted duplicate-free arrays
  *    ([[graft.functions.SortedIntersectCount]]).
  *  - `graft_ngram_hashes(text, n) -> array<struct<ha,hb>>` — fused
  *    tokenize → n-gram → per-doc distinct → md5 48-bit halves
  *    ([[graft.functions.NgramHashes]]).
  *  - `graft_simhash(text) -> long` — whole-document 32-bit SimHash in one
  *    expression ([[graft.functions.SimHash32]]).
  *  - `graft_bpe_word(word, merges, rounds) -> array<string>` — whole-word
  *    bounded BPE merge loop ([[graft.functions.BpeEncodeWord]]; merges =
  *    pairs `a␁b` joined by U+0002, both literals).
  *  - `graft_bpe_pairs(array<string>) -> array<struct<a,b>>` — adjacent
  *    symbol pairs ([[graft.functions.BpeAdjacentPairs]]).
  *  - `graft_bpe_apply(syms, a, b) -> array<string>` — one greedy merge
  *    pass of a single pair ([[graft.functions.BpeApplyPair]]).
  *  - `graft_unigram_segment(word, costs, maxPieceLen) -> array<string>`
  *    — whole-word unigram-LM Viterbi segmentation
  *    ([[graft.functions.UnigramSegmentWord]]; costs = entries
  *    `piece␁nanobits` joined by U+0002, both literals).
  *  - `graft_pq_assign(vec, codebook, m, k) -> array<int>` — whole-vector
  *    product-quantization argmin codes
  *    ([[graft.functions.PqAssignCodes]]; codebook = comma-joined
  *    shifted-nano longs, all but `vec` literals).
  *  - `graft_deflate_len(text, level) -> long` — DEFLATE-compressed byte
  *    length ([[graft.functions.DeflateLength]]; level a literal).
  *  - `graft_perm_sums(id, v, seed, resamples) ->
  *    array<struct<r,nar,sar,nbr,sbr>>` — AGGREGATE: fused seeded
  *    randomization-test resample sums ([[graft.functions.PermSums]];
  *    seed/resamples literals).
  *  - `graft_dtw(array<long>, array<long>, band) -> long` — banded
  *    dynamic-time-warping distance, the whole O(n·m) DP in one call
  *  - `graft_wordpiece_word(word, vocab, maxPieceLen, unk) ->
  *    array<string>` — whole-word greedy longest-match WordPiece
  *    ([[graft.functions.WordpieceWord]]; vocab = U+0002-joined pieces,
  *    all but `word` literals).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Builder-time arity check: a wrong-arg-count SQL call gets a clear
    * message instead of an IndexOutOfBoundsException from `children(i)`
    * deep in the builder.
    */
  private def arity(name: String, children: Seq[Expression],
      n: Int): Seq[Expression] = {
    if (children.length != n)
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${children.length}")
    children
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    // opt-in approximation mode: count(DISTINCT x) → HLL++ when
    // spark.graft.approx.distinct=true (see graft.plans.ApproxDistinctRewrite)
    ext.injectOptimizerRule(_ => graft.plans.ApproxDistinctRewrite())
    // native sorted-merge as-of join (graft.plans.AsofJoinNode/Exec)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        val c = arity("graft_dot", children, 2)
        DotProduct(c.head, c(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect"),
      (children: Seq[Expression]) => {
        val c = arity("graft_sorted_intersect", children, 2)
        SortedIntersectCount(c.head, c(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes"),
      (children: Seq[Expression]) => {
        arity("graft_ngram_hashes", children, 2)
        val n = children(1) match {
          case lit if lit.foldable =>
            lit.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_ngram_hashes n must be a literal, got $other")
        }
        NgramHashes(children.head, n)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bucket_counts"),
      new ExpressionInfo(classOf[BucketCounts].getName,
        "graft_bucket_counts"),
      (children: Seq[Expression]) => {
        arity("graft_bucket_counts", children, 2)
        val b = children(1) match {
          case lit if lit.foldable =>
            lit.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_bucket_counts buckets must be a literal, got $other")
        }
        BucketCounts(children.head, b)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_48"),
      new ExpressionInfo(classOf[Md5Hash48].getName, "graft_md5_48"),
      (children: Seq[Expression]) =>
        Md5Hash48(arity("graft_md5_48", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_perm_sums"),
      new ExpressionInfo(classOf[PermSums].getName, "graft_perm_sums"),
      (children: Seq[Expression]) => {
        arity("graft_perm_sums", children, 4)
        def foldableArg(e: Expression, what: String): Any = e match {
          case l if l.foldable => l.eval()
          case other => throw new IllegalArgumentException(
            s"graft_perm_sums $what must be a literal, got $other")
        }
        val seed = foldableArg(children(2), "seed").toString
        val b = foldableArg(children(3), "resamples")
          .asInstanceOf[Number].intValue()
        PermSums(children.head, children(1), seed, b)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimHash32].getName, "graft_simhash"),
      (children: Seq[Expression]) =>
        SimHash32(arity("graft_simhash", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_word"),
      new ExpressionInfo(classOf[BpeEncodeWord].getName, "graft_bpe_word"),
      (children: Seq[Expression]) => {
        arity("graft_bpe_word", children, 3)
        def foldableArg(e: Expression, what: String): Any = e match {
          case l if l.foldable => l.eval()
          case other => throw new IllegalArgumentException(
            s"graft_bpe_word $what must be a literal, got $other")
        }
        val enc = foldableArg(children(1), "merges").toString
        val rounds = foldableArg(children(2), "rounds")
          .asInstanceOf[Number].intValue()
        BpeEncodeWord(children.head, BpeKernel.parseMerges(enc), rounds)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_unigram_segment"),
      new ExpressionInfo(classOf[UnigramSegmentWord].getName,
        "graft_unigram_segment"),
      (children: Seq[Expression]) => {
        arity("graft_unigram_segment", children, 3)
        def foldableArg(e: Expression, what: String): Any = e match {
          case l if l.foldable => l.eval()
          case other => throw new IllegalArgumentException(
            s"graft_unigram_segment $what must be a literal, got $other")
        }
        val enc = foldableArg(children(1), "piece costs").toString
        val mpl = foldableArg(children(2), "maxPieceLen")
          .asInstanceOf[Number].intValue()
        UnigramSegmentWord(children.head, UnigramKernel.parseCosts(enc), mpl)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_pq_assign"),
      new ExpressionInfo(classOf[PqAssignCodes].getName, "graft_pq_assign"),
      (children: Seq[Expression]) => {
        arity("graft_pq_assign", children, 4)
        def foldableArg(e: Expression, what: String): Any = e match {
          case l if l.foldable => l.eval()
          case other => throw new IllegalArgumentException(
            s"graft_pq_assign $what must be a literal, got $other")
        }
        val cb = PqKernel.parseCodebook(
          foldableArg(children(1), "codebook").toString)
        val m = foldableArg(children(2), "m").asInstanceOf[Number].intValue()
        val k = foldableArg(children(3), "k").asInstanceOf[Number].intValue()
        PqAssignCodes(children.head, cb, m, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_wordpiece_word"),
      new ExpressionInfo(classOf[WordpieceWord].getName,
        "graft_wordpiece_word"),
      (children: Seq[Expression]) => {
        arity("graft_wordpiece_word", children, 4)
        def foldableArg(e: Expression, what: String): Any = e match {
          case l if l.foldable => l.eval()
          case other => throw new IllegalArgumentException(
            s"graft_wordpiece_word $what must be a literal, got $other")
        }
        val vocab = WordpieceKernel.parseVocab(
          foldableArg(children(1), "vocab").toString)
        val mpl = foldableArg(children(2), "maxPieceLen")
          .asInstanceOf[Number].intValue()
        val unk = foldableArg(children(3), "unk").toString
        WordpieceWord(children.head, vocab, mpl, unk)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_deflate_len"),
      new ExpressionInfo(classOf[DeflateLength].getName, "graft_deflate_len"),
      (children: Seq[Expression]) => {
        arity("graft_deflate_len", children, 2)
        val level = children(1) match {
          case l if l.foldable => l.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_deflate_len level must be a literal, got $other")
        }
        DeflateLength(children.head, level)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_pairs"),
      new ExpressionInfo(classOf[BpeAdjacentPairs].getName,
        "graft_bpe_pairs"),
      (children: Seq[Expression]) =>
        BpeAdjacentPairs(arity("graft_bpe_pairs", children, 1).head)))
    ext.injectFunction((
      new FunctionIdentifier("graft_bpe_apply"),
      new ExpressionInfo(classOf[BpeApplyPair].getName, "graft_bpe_apply"),
      (children: Seq[Expression]) => {
        val c = arity("graft_bpe_apply", children, 3)
        BpeApplyPair(c.head, c(1), c(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_dtw"),
      new ExpressionInfo(classOf[DtwDistance].getName, "graft_dtw"),
      (children: Seq[Expression]) => {
        arity("graft_dtw", children, 3)
        val band = children(2) match {
          case lit if lit.foldable =>
            lit.eval().asInstanceOf[Number].intValue()
          case other => throw new IllegalArgumentException(
            s"graft_dtw band must be a literal, got $other")
        }
        DtwDistance(children.head, children(1), band)
      }))
  }
}
