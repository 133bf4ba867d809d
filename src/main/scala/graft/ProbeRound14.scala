package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 measurement harness (SURVEY §6.1 rows):
  *
  *  - CV-HARDNESS SCALING: [[graft.ops.TextAnalysis.domainHardnessCv]]
  *    claims all folds train simultaneously from ONE count pass (never
  *    a per-fold corpus re-read) — measured by timing the rotation vs
  *    the single-fold [[graft.ops.TextAnalysis.domainHardness]] at 1×
  *    and 4× the corpus (4 id-shifted copies). If the subtraction
  *    shape holds, the 4× ratio of CV to one-fold stays ~flat instead
  *    of growing with fold count.
  *
  *  - PER-PASS-U COST PARITY: [[graft.ops.Linkage.fellegiSunterMultiU]]
  *    vs [[graft.ops.Linkage.fellegiSunterMulti]] on the registered
  *    linkage views — the stratification claims to be free (one
  *    ≤passes-row extra relation on the shared candidate checkpoint).
  *
  *  - HOLT–WINTERS GRID CAP: the bounded-unroll contract says the
  *    recursion is control-plane cost — measured at gridDays 70 vs the
  *    1000-day cap for both the additive BIGINT and multiplicative
  *    DECIMAL(38,0) variants.
  *
  * Measurement-only code; registered queries untouched. Numbers land
  * in SURVEY §6.1. Usage: `runMain graft.ProbeRound14 [sfDir]`.
  */
object ProbeRound14 {
  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[r14] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.sources.Tables.documents(spark, dir)
      .select("doc_id", "text", "source").localCheckpoint()
    val docs4 = (0 until 4).map(i => docs.select(
        concat(col("doc_id").cast("string"), lit(s"#$i")).as("doc_id"),
        col("text"), col("source")))
      .reduce(_ unionByName _).localCheckpoint()
    println(s"[r14] corpus 1x=${docs.count()} 4x=${docs4.count()}")

    def sink(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (pass <- 1 to 2) { // pass 1 warms codegen; read pass 2
      time(s"domainHardness 1x (pass $pass)") {
        sink(graft.ops.TextAnalysis.domainHardness(docs, "doc_id",
          "text", "source", 4))
      }
      time(s"domainHardnessCv 1x (pass $pass)") {
        sink(graft.ops.TextAnalysis.domainHardnessCv(docs, "doc_id",
          "text", "source", 4))
      }
      time(s"domainHardness 4x (pass $pass)") {
        sink(graft.ops.TextAnalysis.domainHardness(docs4, "doc_id",
          "text", "source", 4))
      }
      time(s"domainHardnessCv 4x (pass $pass)") {
        sink(graft.ops.TextAnalysis.domainHardnessCv(docs4, "doc_id",
          "text", "source", 4))
      }
    }

    val (a, b) = graft.queries.DedupQueries.linkViews(spark, dir)
    for (pass <- 1 to 2) {
      time(s"fellegiSunterMulti pooled-u (pass $pass)") {
        sink(graft.ops.Linkage.fellegiSunterMulti(a, b, "rec_id",
          Seq("block", "block2"), Seq("name", "seg", "bal"), 0.0))
      }
      time(s"fellegiSunterMultiU per-pass-u (pass $pass)") {
        sink(graft.ops.Linkage.fellegiSunterMultiU(a, b, "rec_id",
          Seq("block", "block2"), Seq("name", "seg", "bal"), 0.0))
      }
    }

    val ev = graft.sources.Tables.events(spark, dir).localCheckpoint()
    for (pass <- 1 to 2) {
      time(s"holtWinters grid=70 (pass $pass)") {
        sink(graft.ops.EventOps.holtWinters(ev, "ts", 7, 70))
      }
      time(s"holtWinters grid=1000 (pass $pass)") {
        sink(graft.ops.EventOps.holtWinters(ev, "ts", 7, 1000))
      }
      time(s"holtWintersMult grid=70 (pass $pass)") {
        sink(graft.ops.EventOps.holtWintersMult(ev, "ts", 7, 70))
      }
      time(s"holtWintersMult grid=1000 (pass $pass)") {
        sink(graft.ops.EventOps.holtWintersMult(ev, "ts", 7, 1000))
      }
    }
    spark.stop()
  }
}
