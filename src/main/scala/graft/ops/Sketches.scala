package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Bounded-memory frequency sketches: the heavy-hitter machinery a 100 TB
  * corpus needs when the term universe (URLs, n-grams, user agents) is too
  * large to group-by exactly.
  *
  * [[misraGriesCandidates]] runs the classic Misra–Gries (1982) k-counter
  * summary once per partition: any term whose GLOBAL count exceeds n/k must
  * exceed n_p/k in at least one partition (averaging argument), and a
  * partition's MG summary provably retains every term above its local n_p/k
  * — so the union of per-partition candidate keys is a SUPERSET of the true
  * global heavy hitters, at most (k−1)·partitions keys total, with no term
  * shuffle at all.
  *
  * [[heavyHitters]] then makes the result EXACT with a second pass: the
  * bounded candidate set broadcasts back as a filter, only candidate
  * occurrences shuffle for the exact recount, and the n/k threshold is an
  * integer cross-multiply (count·k > n — never a double division). Exact
  * output, bounded memory, and the shuffle carries ≤ candidates instead of
  * the whole vocabulary. (The one mapPartitions is the justified seam:
  * MG's decrement-all is inherently imperative per-partition state.)
  */
object Sketches {

  /** Per-partition Misra–Gries candidate keys for terms with global
    * frequency > n/k. Output: one row per distinct surviving (partition,
    * term), deduplicated globally — ≤ (k−1)·partitions rows.
    */
  def misraGriesCandidates(terms: Dataset[String], k: Int): DataFrame = {
    require(k > 1, s"bad heavy-hitter k=$k")
    import terms.sparkSession.implicits._
    terms.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters.update(t, c + 1)
          case None if counters.size < k - 1 => counters.update(t, 1L)
          case None =>
            // decrement-all; drop zeroed counters (amortized O(1)/item:
            // each decrement pays for one prior increment)
            val dead = mutable.ArrayBuffer.empty[String]
            counters.keysIterator.foreach { key =>
              val c = counters(key) - 1
              if (c == 0) dead += key else counters.update(key, c)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("term").distinct()
  }

  /** Exact heavy hitters (count·k > n) via MG candidates + exact recount.
    * Returns (term, freq, n_total) for every term strictly above the n/k
    * threshold.
    */
  def heavyHitters(terms: Dataset[String], k: Int): DataFrame = {
    val spark = terms.sparkSession
    val candidates = misraGriesCandidates(terms, k)
    val total = terms.toDF("term").agg(count(lit(1)).as("n_total"))
    terms.toDF("term")
      .join(broadcast(candidates), Seq("term"), "left_semi")
      .groupBy("term")
      .agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("n_total"))
      .select("term", "freq", "n_total")
  }

  /** Per-day HLL sketches of a key column — the MERGEABLE distinct-count
    * state a 100 TB pipeline persists instead of raw keys: each day's
    * sketch is a few KB of binary (Apache DataSketches HllSketch via
    * Spark's `hll_sketch_agg`), and any day range's distinct count is a
    * register-max union of the stored sketches — no re-scan of history.
    * Returns (day, sketch BINARY, n_rows); order-independent by
    * construction (HLL registers are max-based).
    */
  def hllDailySketches(df: DataFrame, keyCol: String, tsUsCol: String)
      : DataFrame =
    df.groupBy(floor(col(tsUsCol) / lit(86400000000L)).cast("long").as("day"))
      .agg(hll_sketch_agg(col(keyCol)).as("sketch"),
        count(lit(1)).as("n_rows"))

  /** Rolling distinct actives from persisted daily sketches: day d's
    * trailing-`windowDays` estimate = union of sketches d−w+1..d — the
    * approximate, history-free twin of
    * [[graft.ops.EventOps.rollingActiveKeys]] (same contribution-explode
    * shape: each daily sketch feeds its `windowDays` window ends, so
    * rolling-union = plain group-by-day union). Returns
    * (day, approx_active).
    */
  def hllRollingDistinct(daily: DataFrame, windowDays: Int): DataFrame = {
    require(windowDays > 0, s"windowDays must be positive, got $windowDays")
    val observed = daily.select(col("day")).distinct()
    daily
      .select(col("sketch"),
        explode(sequence(col("day"), col("day") + (windowDays - 1)))
          .as("day"))
      .join(broadcast(observed), Seq("day"))
      .groupBy("day")
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch")))
        .as("approx_active"))
  }

  private def cmCells(value: org.apache.spark.sql.Column, width: Int,
      depth: Int): org.apache.spark.sql.Column =
    explode(array((0 until depth).map(s =>
      struct(lit(s).as("seed"),
        Prep.hashBucket(
          concat_ws("|", lit(s).cast("string"), value.cast("string")),
          width).as("bucket"))): _*))

  /** Count-min sketch build (Cormode & Muthukrishnan 2005) — the
    * mergeable frequency summary for term universes too large to count
    * exactly (the point-query sibling of the HLL distinct sketch above,
    * and the sketch-per-ingest-batch shape: depth×width cells persist per
    * batch and MERGE BY ADDITION, so historical frequencies answer
    * without rescanning events). Each row increments one bucket per seed
    * row: bucket = md5(seed|value) mod width — the library's engine-
    * stable hash idiom ([[graft.ops.Prep.hashBucket]]), so any SQL engine
    * reproduces the sketch cell-for-cell.
    *
    * Shape at scale: ONE pass (per-row explode of `depth` cells), one
    * partial-aggregable shuffle bounded by depth×width cells — never by
    * the value universe. Returns (seed, bucket, cnt).
    */
  def countMinBuild(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      width: Int, depth: Int): DataFrame = {
    require(width > 1, s"width must be > 1: $width")
    require(depth >= 1, s"depth must be >= 1: $depth")
    df.select(cmCells(valueCol, width, depth).as("__c"))
      .select(col("__c.seed").as("seed"), col("__c.bucket").as("bucket"))
      .groupBy("seed", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** Count-min point estimates for a probe relation: est(v) = min over
    * seeds of the sketch cell count — ≥ the true frequency always
    * (one-sided error, spec-pinned), within εn with probability 1−δ for
    * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉. The sketch is depth×width rows and
    * broadcasts; probes never touch the original data.
    */
  def countMinEstimate(sketch: DataFrame,
      probes: DataFrame, probeCol: org.apache.spark.sql.Column,
      width: Int, depth: Int): DataFrame =
    probes.select(probeCol.cast("string").as("value")).distinct()
      .select(col("value"), cmCells(col("value"), width, depth).as("__c"))
      .select(col("value"), col("__c.seed").as("seed"),
        col("__c.bucket").as("bucket"))
      .join(broadcast(sketch), Seq("seed", "bucket"), "left_outer")
      .groupBy("value")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  private def bloomBits(value: org.apache.spark.sql.Column, bits: Int,
      hashes: Int): org.apache.spark.sql.Column =
    explode(array((0 until hashes).map(s =>
      Prep.hashBucket(
        concat_ws("|", lit(s).cast("string"), value.cast("string")),
        bits)): _*))

  /** Bloom filter build (Bloom 1970) — the membership sketch for "have we
    * seen this value" at universe sizes where a distinct set can't
    * broadcast: decontamination probes, seen-URL suppression, incremental
    * -dedup pre-filters. The filter is the RELATION of set bit positions
    * (≤ `bits` rows, one per set bit — the natural mergeable form: union
    * by DISTINCT is exactly bitwise OR, spec-pinned), built in one pass +
    * one bounded distinct; bit positions come from the md5 hashBucket
    * idiom, so any engine rebuilds the filter bit-for-bit.
    *
    * Returns (bit) — the set positions.
    */
  def bloomBuild(df: DataFrame, valueCol: org.apache.spark.sql.Column,
      bits: Int, hashes: Int): DataFrame = {
    require(bits > 1, s"bits must be > 1: $bits")
    require(hashes >= 1, s"hashes must be >= 1: $hashes")
    df.select(bloomBits(valueCol, bits, hashes).as("bit")).distinct()
  }

  /** Bloom membership probe: a value reads present iff ALL `hashes` of
    * its bit positions are set — no false negatives ever (spec-pinned);
    * false-positive rate ≈ (1 − e^(−hn/m))^h. The filter broadcasts
    * (≤ bits rows); probes never touch the original data. Returns
    * (value, n_bits_set, maybe_present).
    */
  def bloomContains(bloom: DataFrame, probes: DataFrame,
      probeCol: org.apache.spark.sql.Column, bits: Int, hashes: Int)
      : DataFrame =
    probes.select(probeCol.cast("string").as("value")).distinct()
      .select(col("value"), bloomBits(col("value"), bits, hashes).as("bit"))
      .join(broadcast(bloom.withColumn("__set", lit(1L))), Seq("bit"),
        "left_outer")
      .groupBy("value")
      .agg(sum(coalesce(col("__set"), lit(0L))).as("n_bits_set"))
      .withColumn("maybe_present", col("n_bits_set") === hashes)

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.expressions.Window
  import org.apache.spark.sql.types.DecimalType

  /** Per-batch DETERMINISTIC mergeable quantile sketch (the CDF-knot form
    * of a GK/KLL summary: Greenwald & Khanna 2001 give the ε-approximate
    * rank guarantee; this construction trades their adaptive compression
    * for engine-replayable determinism): each ingest batch keeps only the
    * grid rows where the within-batch cumulative count CROSSES a multiple
    * of n_b/`knots` — ≤ `knots` (value, cum) knots per batch, a few KB
    * persisted alongside the N101 HLL / N173 count-min sketches. The knot
    * rule is pure integer arithmetic (`cum·K div n_b` strictly increases
    * at a kept row), so any SQL engine rebuilds the sketch row-for-row and
    * re-partitioning cannot move a knot.
    *
    * Error contract (spec-pinned): for any probe value x, the per-batch
    * undercount `true_cum_b(x) − est_cum_b(x)` is < n_b/K — every skipped
    * grid row between two kept knots sits strictly inside one length-
    * n_b/K rank interval — so the MERGED rank estimate over B batches is
    * within Σ_b n_b/K = N/K of truth: err·K < N, uniformly.
    *
    * Merging IS relation union: the sketch of batches {1..B} is by
    * construction the union of each batch's sketch, so historical
    * quantiles answer from persisted knots without rescanning events —
    * the missing member of the sketch suite next to HLL (distinct),
    * count-min (frequency) and Bloom (membership). This is the 100 TB
    * swap-in for every exact-`percentile` consumer:
    * [[graft.ops.Drift.psiBuckets]] bucket edges,
    * [[graft.ops.Prep.quantileBucket]] bin edges and
    * [[graft.ops.Prep.winsorize]] fences all read off
    * [[quantileSketchQuantiles]] of the merged knots instead of a
    * full-history percentile pass.
    *
    * Scale shape: one (batch, v) group-by; the cumulative window
    * partitions BY BATCH (parallel across the ingest axis; within a batch
    * the grid is distinct-value bounded — the KS-grid discipline). Values
    * follow the 2-dp money discipline (DECIMAL(18,2)). Returns
    * (batch, v, cum) — the knot relation.
    */
  def quantileSketchBuild(df: DataFrame, valueCol: Column, batchCol: Column,
      knots: Int): DataFrame = {
    require(knots >= 1, s"knots must be >= 1: $knots")
    val grid = df
      .select(batchCol.cast("long").as("batch"),
        valueCol.cast(DecimalType(18, 2)).as("v"))
      .filter(col("v").isNotNull)
      .groupBy("batch", "v").agg(count(lit(1)).as("__c"))
    val wb = Window.partitionBy("batch").orderBy("v")
    grid
      .withColumn("cum", sum("__c").over(
        wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum("__c").over(Window.partitionBy("batch")))
      .filter(expr(s"(cum * $knots) div __n > ((cum - __c) * $knots) div __n"))
      .select("batch", "v", "cum")
  }

  /** Merged rank estimates from a [[quantileSketchBuild]] knot relation:
    * est_rank(v) = Σ_b (cum of batch b's largest knot ≤ v) — an
    * UNDERCOUNT of the true rank by < N/K (see the build contract).
    * Computed via per-batch knot deltas (lag window, batch-parallel) and
    * one cumulative RANGE window over the SKETCH-SIZED relation
    * (batches × knots rows — the bounded-support argument holds by
    * construction here: the window input IS the sketch). Returns one row
    * per distinct knot value: (v, est_rank).
    */
  def quantileSketchRanks(sketch: DataFrame): DataFrame = {
    val wb = Window.partitionBy("batch").orderBy("v")
    val wAll = Window.orderBy("v")
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    sketch
      .withColumn("__d",
        col("cum") - coalesce(lag("cum", 1).over(wb), lit(0L)))
      // RANGE frame: peers (same v, other batches) are included, so the
      // running sum at v counts every knot with v' ≤ v
      .withColumn("est_rank", sum("__d").over(wAll))
      .groupBy("v").agg(max("est_rank").as("est_rank"))
  }

  /** Quantile answers from merged knots: for each integer percent q the
    * smallest knot value whose merged rank estimate reaches the target
    * rank ⌈q·N/100⌉ (exact integer ceiling — no IEEE op anywhere in the
    * answer path). The returned value v carries the classic ε = 1/K
    * guarantee (spec-pinned): true_rank(v) ≥ target and
    * true_rank_strictly_below(v) < target + N/K. Returns
    * (q, n_total, target_rank, est_value) per requested percent.
    */
  def quantileSketchQuantiles(sketch: DataFrame, percents: Seq[Int])
      : DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100: $percents")
    val ranks = quantileSketchRanks(sketch)
    val total = sketch.groupBy("batch").agg(max("cum").as("__nb"))
      .agg(sum("__nb").as("n_total"))
    val targets = total
      .select(explode(array(percents.map(lit): _*)).as("q"), col("n_total"))
      .select(col("q").cast("long").as("q"), col("n_total"),
        expr("(q * n_total + 99) div 100").as("target_rank"))
    ranks.crossJoin(broadcast(targets))
      .filter(col("est_rank") >= col("target_rank"))
      .groupBy("q", "n_total", "target_rank")
      .agg(min("v").as("est_value"))
  }
}
