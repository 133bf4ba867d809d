package graft

import graft.ops.{Dedup, SuffixArray}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Suffix-rank construction ([[graft.ops.SuffixArray]]): prefix-doubling
  * ranks must be injective on distinct prefixes (brute-force check), the
  * suffix-rank span removal must be relation-identical to the gram-hash
  * [[graft.ops.Dedup.spanRemoval]] wherever hashes are collision-free
  * (always, on these fixtures), and no data-scale relation may serialize
  * into a single window task.
  */
class SuffixArraySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Deterministic corpus over a tiny vocabulary (heavy gram repetition —
    * the adversarial case for rank identity), with planted duplicated
    * spans: doc 3k+1 repeats the middle of doc 3k, and short/empty docs.
    */
  private def corpus(n: Int): DataFrame =
    (0 until n).map { i =>
      val base = (0 until 12 + i % 9)
        .map(j => s"w${(i * 7 + j * j) % 13}").mkString(" ")
      val text = i % 3 match {
        case 0 => base
        case 1 =>
          val prev = (0 until 12 + (i - 1) % 9)
            .map(j => s"w${((i - 1) * 7 + j * j) % 13}")
          s"x$i " + prev.slice(2, 11).mkString(" ") + s" y$i"
        case 2 => if (i % 9 == 2) "" else s"z$i w1 w2"
      }
      (i.toLong, text)
    }.toDF("doc_id", "text").repartition(7)

  test("prefixRanks: rank equality == prefix equality (brute force, " +
      "widths 1/2/4/8, short suffixes distinguished by length)") {
    val docs = corpus(60)
    val toks = docs.collect().map(r => r.getLong(0) ->
      r.getString(1).split(" ").filter(_.nonEmpty).toSeq).toMap
    val tokens = docs.select(col("doc_id"),
      posexplode(filter(split(col("text"), " "), s => s =!= ""))
        .as(Seq("pos", "tok")))
    for (w <- Seq(1, 2, 4, 8); small <- Seq(true, false)) {
      val ranks = SuffixArray
        .prefixRanks(tokens, w, buckets = 8, small = small)
        .as[(Long, Int, Long)].collect()
      // key: first min(w, rem) tokens plus the count taken (end marker)
      def key(doc: Long, pos: Int): (Seq[String], Int) = {
        val s = toks(doc).drop(pos).take(w)
        (s, s.length)
      }
      val byRank = ranks.groupBy(_._3).values
      byRank.foreach { grp =>
        val keys = grp.map { case (d, p, _) => key(d, p) }.distinct
        assert(keys.size == 1,
          s"w=$w small=$small rank ${grp.head._3} spans distinct " +
            s"prefixes: $keys")
      }
      val byKey = ranks.groupBy { case (d, p, _) => key(d, p) }.values
      byKey.foreach { grp =>
        assert(grp.map(_._3).distinct.length == 1,
          s"w=$w small=$small equal prefixes got distinct ranks: " +
            s"${grp.toSeq.take(4)}")
      }
    }
  }

  test("suffixSpanRemoval == Dedup.spanRemoval (hash grams collision-" +
      "free here) at minTokens 3, 6 and 8 — including NULL clean_text " +
      "and empty docs") {
    val docs = corpus(90)
    for (m <- Seq(3, 6, 8)) {
      val viaHash = Dedup.spanRemoval(docs, "doc_id", "text", m)
        .collect().map(_.toString).sorted.toSeq
      val viaSuffix = SuffixArray
        .suffixSpanRemoval(docs, "doc_id", "text", m, buckets = 8)
        .collect().map(_.toString).sorted.toSeq
      assert(viaSuffix == viaHash, s"minTokens=$m (small path)")
      // cutoff 0 → every round takes the salted two-phase ranking
      spark.conf.set("graft.salted.ntile.cutoff", "0")
      val viaSalted = try SuffixArray
        .suffixSpanRemoval(docs, "doc_id", "text", m, buckets = 8)
        .collect().map(_.toString).sorted.toSeq
      finally spark.conf.unset("graft.salted.ntile.cutoff")
      assert(viaSalted == viaHash, s"minTokens=$m (salted path)")
    }
  }

  test("a fully-duplicated corpus removes everything; a dup-free corpus " +
      "removes nothing") {
    val twin = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"))
      .toDF("doc_id", "text")
    val gone = SuffixArray.suffixSpanRemoval(twin, "doc_id", "text", 4,
        buckets = 8)
      .select("n_removed", "clean_text").as[(Long, Option[String])]
      .collect()
    assert(gone.forall { case (r, t) => r == 8L && t.isEmpty })
    val uniq = Seq((1L, "p q r s t"), (2L, "u v w x y"))
      .toDF("doc_id", "text")
    val kept = SuffixArray.suffixSpanRemoval(uniq, "doc_id", "text", 4,
        buckets = 8)
      .select("n_removed").as[Long].collect()
    assert(kept.forall(_ == 0L))
  }

  // ---- plan gate --------------------------------------------------------

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
        Seq(r.child)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("plan gate: every single-partition window sits above the bounded " +
      "bucket-offsets aggregate — no row-scale global sort anywhere in " +
      "the doubling rounds") {
    spark.conf.set("graft.salted.ntile.cutoff", "0")
    val df = try SuffixArray.suffixSpanRemoval(corpus(80), "doc_id",
      "text", 6, buckets = 8)
    finally spark.conf.unset("graft.salted.ntile.cutoff")
    df.collect()
    val all = flatten(df.queryExecution.executedPlan)
    val unpartitioned = all.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w }
    unpartitioned.foreach { w =>
      val bounded = flatten(w.child).exists {
        case agg: BaseAggregateExec =>
          agg.groupingExpressions.exists(e =>
            e.toString.contains("__b") || e.toString.contains("__salt"))
        case _ => false
      }
      assert(bounded,
        s"single-partition window over non-bucket-bounded input:\n$w")
    }
  }
}
