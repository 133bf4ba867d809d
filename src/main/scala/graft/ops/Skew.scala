package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB: salted two-phase
  * aggregation and salted broadcast-replicated joins.
  *
  * AQE's runtime skew-join splitting (on by default in Spark 4) handles
  * *sort-merge join* skew; these cover the cases AQE does not: a single
  * group-by key hot enough to overwhelm one reducer, and hash-join
  * replication when the build side must stay small. Salting trades one
  * extra (cheap, pre-reduced) shuffle for bounded per-task state.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 groups on (key, salt) — the hot
    * key's rows spread over `saltBuckets` reducers and are pre-reduced —
    * phase 2 merges the per-salt partials. Correct for any algebraic
    * aggregate supplied as (partial, merge) pairs sharing a column name.
    *
    * @param partials phase-1 aggregates over raw rows, e.g.
    *                 `count(lit(1)).as("n")`
    * @param merges   phase-2 aggregates over phase-1 outputs, e.g.
    *                 `sum("n").as("n")`
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      partials: Seq[Column],
      merges: Seq[Column]): DataFrame =
    df.withColumn("__salt",
        (pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
          .cast("int"))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head, merges.tail: _*)

  /** Salted join for a skewed probe side against a small build side: the
    * probe side gets a random salt in [0, saltBuckets); the build side is
    * replicated `saltBuckets` times (explode) so every (key, salt) pair
    * finds its match. Build-side blowup is saltBuckets× — keep it
    * broadcast-small.
    *
    * Result equals the plain equi-join ONLY for probe-preserving join
    * types: with `right`/`full` outer each unmatched build row would be
    * emitted once per salt replica, so those types are rejected.
    */
  def saltedJoin(
      probe: DataFrame,
      build: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      joinType: String = "inner"): DataFrame = {
    val allowed = Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross")
    require(allowed.contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports probe-preserving join types only (got '$joinType'): " +
        "right/full outer would duplicate unmatched build rows per salt replica")
    val salted = probe.withColumn("__salt",
      (pmod(xxhash64(monotonically_increasing_id()), lit(saltBuckets.toLong)))
        .cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    salted.join(broadcast(replicated), keyCols :+ "__salt", joinType)
      .drop("__salt")
  }
}
