package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness behind SURVEY §6.1's item-CF hot-basket row:
  * [[graft.ops.EventOps.itemCfNeighbors]] with ONE planted mega-basket
  * (a bot/aggregator artifact) against an organic corpus — the
  * quadratic pair term the `maxBasket` cap exists for. Usage:
  * `runMain graft.ProbeItemCf [nBaskets] [hotItems]`.
  */
object ProbeItemCf {
  def main(args: Array[String]): Unit = {
    val nBaskets = args.headOption.map(_.toInt).getOrElse(200000)
    val hotItems = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[itemcf] $tag: $r rows, ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // organic: ~12 items per basket over a 50k-item catalog
    val organic = spark.range(nBaskets.toLong)
      .select(col("id").as("b"), explode(sequence(lit(1),
        (pmod(xxhash64(col("id")), lit(9)) + 8).cast("int"))).as("j"))
      .select(col("b"),
        pmod(xxhash64(col("b"), col("j")), lit(50000)).as("i"))
    // ONE planted mega-basket touching `hotItems` distinct items
    val hot = spark.range(hotItems.toLong)
      .select(lit(-1L).as("b"), col("id").as("i"))
    val df = organic.unionByName(hot).localCheckpoint()
    println(s"[itemcf] corpus: $nBaskets organic baskets + one " +
      s"$hotItems-item basket, ${df.count()} incidence rows")
    t("ADAPTIVE default cap (p99 x 8, floor 1024): the bot basket is " +
        "cut to the corpus' own scale") {
      graft.ops.EventOps.itemCfNeighbors(df, "b", "i", topK = 10).count()
    }
    t(s"explicit maxBasket=10000 (the old static default): still admits " +
        "~5e7 pairs from the hot basket") {
      graft.ops.EventOps.itemCfNeighbors(df, "b", "i", topK = 10,
        maxBasket = 10000).count()
    }
    t("explicit maxBasket=1000: hot basket contributes <= 1e6 pairs") {
      graft.ops.EventOps.itemCfNeighbors(df, "b", "i", topK = 10,
        maxBasket = 1000).count()
    }
    t("UNCAPPED on a 10k-item hot basket (1e8-pair term, the shape " +
        "that is 1e10 at 1e5 items)") {
      val df10k = organic.unionByName(hot.filter(col("i") < 10000))
        .localCheckpoint()
      graft.ops.EventOps.itemCfNeighbors(df10k, "b", "i", topK = 10,
        maxBasket = Int.MaxValue).count()
    }
    spark.stop()
  }
}
