package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 measurement harness (SURVEY §6.1 rows):
  *
  *  - BT FIT SCALING: [[graft.ops.Preference.btStrength]] claims the
  *    corpus is read ONCE (one shuffle to the bounded game/win
  *    relations) and every MM round is arithmetic on those — measured
  *    by timing the fit at 0.5M vs 5M synthetic pairs over 64 items
  *    (10× data should cost ~the collapse delta, nowhere near 10×).
  *
  *  - AGREEMENT SCALING: [[graft.ops.Eval.fleissKappa]] /
  *    [[graft.ops.Eval.krippendorffAlpha]] are one count shuffle +
  *    bounded rollups — timed at 0.6M vs 6M ratings.
  *
  *  - PASS@K SCALING: [[graft.ops.Eval.passAtK]] at 1M vs 10M samples
  *    (100k vs 1M tasks), three ks per run — the per-task relation is
  *    the only row-scale surface.
  *
  *  - NGRAM-LOOP SCALING: [[graft.ops.TextAnalysis.ngramLoop]] on the
  *    documents corpus at 1× vs 10× (id-shifted copies) — the per-doc
  *    window partitions stay bounded, so the cost should track the
  *    (doc, gram) groupBy volume linearly.
  *
  * Measurement-only code; registered queries untouched. Numbers land
  * in SURVEY §6.1. Usage: `runMain graft.ProbeRound15 [sfDir]`.
  */
object ProbeRound15 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[r15] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.codegen.hugeMethodLimit", 8000)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.Kernels.md5hash48

    // ---- BT fit: 0.5M vs 5M synthetic pairs, 64 items ----
    def btPairs(n: Long) = {
      val items = 64L
      val a = pmod(md5hash48(concat(col("id").cast("string"), lit("|a"))),
        lit(items))
      val bR = pmod(md5hash48(concat(col("id").cast("string"), lit("|b"))),
        lit(items - 1))
      spark.range(n).select(a.as("__a"),
          when(bR >= a, bR + 1L).otherwise(bR).as("__b"))
        .select(col("__a").as("winner"), col("__b").as("loser"))
    }
    Seq(500000L, 5000000L).foreach { n =>
      // two passes: the second is the steady-state number
      (1 to 2).foreach { p =>
        time(s"btStrength pairs=$n pass$p")(
          graft.ops.Preference.btStrength(btPairs(n), "winner", "loser",
            8).write.format("noop").mode("overwrite").save())
      }
    }

    // ---- agreement: 0.6M vs 6M ratings (3 raters, ragged for α) ----
    def panel(units: Long) = {
      val t = pmod(md5hash48(concat(col("u").cast("string"), lit("|t"))),
        lit(4L))
      spark.range(units).select(col("id").as("u"))
        .select(col("u"), t.as("__t"),
          explode(array(lit(0), lit(1), lit(2))).as("r"))
        .select(col("u"), col("r"),
          when(pmod(md5hash48(concat(col("u").cast("string"), lit("|"),
            col("r").cast("string"))), lit(100L)) < 80, col("__t"))
            .otherwise(pmod(col("__t") + 1, lit(4L))).as("c"))
    }
    Seq(200000L, 2000000L).foreach { units =>
      (1 to 2).foreach { p =>
        time(s"fleissKappa units=$units pass$p")(
          graft.ops.Eval.fleissKappa(panel(units), "u", "c")
            .write.format("noop").mode("overwrite").save())
        time(s"krippendorffAlpha units=$units (ragged) pass$p")(
          graft.ops.Eval.krippendorffAlpha(
            panel(units).filter(pmod(md5hash48(concat(
              col("u").cast("string"), lit("|"), col("r").cast("string"),
              lit("|on"))), lit(3L)) < 2), "u", "c")
            .write.format("noop").mode("overwrite").save())
      }
    }

    // ---- pass@k: 1M vs 10M samples (10 per task) ----
    def samples(tasks: Long) =
      spark.range(tasks).select(col("id").as("t"),
          explode(array((0 until 10).map(i => lit(i)): _*)).as("s"))
        .select(col("t"),
          (pmod(md5hash48(concat(col("t").cast("string"), lit("|"),
            col("s").cast("string"))), lit(100L)) < 40).as("ok"))
    Seq(100000L, 1000000L).foreach { tasks =>
      (1 to 2).foreach { p =>
        time(s"passAtK tasks=$tasks pass$p")(
          graft.ops.Eval.passAtK(samples(tasks), "t", col("ok"),
            Seq(1, 5, 10)).write.format("noop").mode("overwrite").save())
      }
    }

    // ---- ngram loop: documents at 1x vs 10x ----
    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text").localCheckpoint()
    val docs10 = docs.crossJoin(
        spark.range(10).select(col("id").as("__k")))
      .select((col("doc_id") * 10 + col("__k")).as("doc_id"), col("text"))
      .localCheckpoint()
    Seq("1x" -> docs, "10x" -> docs10).foreach { case (label, d) =>
      (1 to 2).foreach { p =>
        time(s"ngramLoop docs=$label pass$p")(
          graft.ops.TextAnalysis.ngramLoop(d, "doc_id", "text", 3, 50)
            .write.format("noop").mode("overwrite").save())
      }
    }
    spark.stop()
  }
}
