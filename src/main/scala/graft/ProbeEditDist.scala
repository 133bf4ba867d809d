package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the edit-distance similarity join — a synthetic
  * 10k/30k-name vocabulary (brand-noun-number shapes with planted typo
  * neighbors), far past the oracle's 64-name table, timing the q-gram
  * blocking against what a naive vocabulary² levenshtein would cost.
  * Writes nothing outside /tmp.
  */
object ProbeEditDist {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ed] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // name = adjective + noun + 2-digit code; ~8% planted near-dups via
    // one-char distortions of an earlier name
    val base = spark.range(n.toLong).select(
      concat_ws("",
        element_at(typedlit(Seq("red", "blue", "dark", "pale", "hot",
          "cold", "big", "tiny", "grand", "odd")),
          (pmod(xxhash64(col("id"), lit(1)), lit(10)) + 1).cast("int")),
        element_at(typedlit(Seq("widget", "gadget", "sprocket", "flange",
          "gizmo", "bolt", "ring", "gear", "cog", "valve")),
          (pmod(xxhash64(col("id"), lit(2)), lit(10)) + 1).cast("int")),
        pmod(xxhash64(col("id"), lit(3)), lit(100)).cast("string"))
        .as("s"))
    val typos = base.filter(pmod(xxhash64(col("s")), lit(12)) === 0)
      .select(concat(substring(col("s"), 1, 3), lit("x"),
        substring(col("s"), 5, 100)).as("s"))
    val vocab = base.unionByName(typos).distinct().localCheckpoint()
    val m = vocab.count()
    println(s"vocab $m")
    val pairs = t(s"editDistanceJoin d=2 over $m names")(
      graft.ops.Dedup.editDistanceJoin(vocab, "s", maxDist = 2)
        .localCheckpoint())
    println(s"pairs ${pairs.count()}")

    // dispersed regime: random 10-char strings — neighborhoods are
    // sparse, so the blocking should prune almost everything
    val rand = spark.range(n.toLong).select(
      concat((1 to 10).map(j =>
        element_at(typedlit(('a' to 'z').map(_.toString)),
          (pmod(xxhash64(col("id"), lit(j)), lit(26)) + 1).cast("int")))
        : _*).as("s"))
      .unionByName(spark.range(n.toLong / 12).select(
        concat(lit("q"), substring(
          concat((1 to 10).map(j =>
            element_at(typedlit(('a' to 'z').map(_.toString)),
              (pmod(xxhash64(col("id"), lit(j)), lit(26)) + 1).cast("int")))
            : _*), 2, 9)).as("s")))
      .distinct().localCheckpoint()
    val m2 = rand.count()
    val p2 = t(s"editDistanceJoin d=2 over $m2 dispersed names")(
      graft.ops.Dedup.editDistanceJoin(rand, "s", maxDist = 2)
        .localCheckpoint())
    println(s"dispersed pairs ${p2.count()}")
    spark.stop()
  }
}
