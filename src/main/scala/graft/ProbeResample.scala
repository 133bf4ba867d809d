package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's bootstrap/CDF rows: the ×B
  * resample explode ([[graft.ops.Screening.permutationTestBh]]), the
  * salted survival walk ([[graft.ops.Eval.survivalCurve]] over
  * µs-granular near-distinct durations — the row-scale grid case), and
  * the bins²-bounded isotonic closed form
  * ([[graft.ops.Eval.isotonicCalibration]]) at 100× the default bin
  * count. Pins the scaling shape so bench-noise swings on these queries
  * stop needing adjudication. Usage: `runMain graft.ProbeResample
  * [rows...]` (default 400000 1000000 = 4× / 10× the sf0.1 events).
  */
object ProbeResample {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(400000, 1000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // fallback arm: a session without graft_perm_sums, so the same call
    // takes the composable ×B explode spelling (plan branch is on the
    // ACTIVE session's registry)
    val noKernel = spark.newSession()
    noKernel.sessionState.functionRegistry.dropFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "graft_perm_sums"))
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[resample] $tag: $r rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    for (n <- sizes) {
      val ev = spark.range(n.toLong).select(
          col("id"),
          concat(lit("t"), pmod(xxhash64(col("id")), lit(8)))
            .as("cat"),
          when(pmod(xxhash64(col("id") + 1), lit(100)) < 55, "train")
            .otherwise("test").as("split"),
          (pmod(xxhash64(col("id") + 2), lit(100000)).cast("double") / 100)
            .as("value"),
          // µs-granular near-distinct durations: the row-scale CDF grid
          pmod(xxhash64(col("id") + 3), lit(172800000000L)).as("dur_us"),
          (pmod(xxhash64(col("id") + 4), lit(10)) < 7).cast("int")
            .as("event"))
        .localCheckpoint()
      t(s"$n rows: permutationTestBh B=200 (graft_perm_sums aggregate)") {
        graft.ops.Screening.permutationTestBh(ev, "id", "value", "cat",
          "split", "train", "test", 200, "probeA").count()
      }
      t(s"$n rows: permutationTestBh B=200 (x200 explode fallback)") {
        SparkSession.setActiveSession(noKernel)
        try graft.ops.Screening.permutationTestBh(ev, "id", "value",
          "cat", "split", "train", "test", 200, "probeA").count()
        finally SparkSession.setActiveSession(spark)
      }
      t(s"$n rows: survivalCurve (salted walk, ~${n} distinct durations)") {
        graft.ops.Eval.survivalCurve(ev, "dur_us", "event").count()
      }
    }
    // isotonic is BINS-bounded, not row-scale: the ranges join is bins²;
    // 1000 bins = 100x the registered query's grain
    val bins = spark.range(1000).select(col("id").as("bin"),
        (pmod(xxhash64(col("id")), lit(5000)) + 100).as("n"),
        pmod(xxhash64(col("id") + 1), lit(100)).as("n_pos"))
      .localCheckpoint()
    t("isotonicCalibration at 1000 bins (1e6-range closed form)") {
      graft.ops.Eval.isotonicCalibration(bins, "bin", "n", "n_pos").count()
    }
    spark.stop()
  }
}
