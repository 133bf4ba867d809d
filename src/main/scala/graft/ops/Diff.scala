package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff between two versions of a keyed relation — the data-ops
  * twin of the store's version axis (`ML Feature Store Pipeline.py:60-68`
  * keeps every feature version precisely so "what changed between v1 and
  * v2?" is answerable; this operator answers it as a relation). The same
  * shape audits a backfill (old pipeline output vs new) before promotion.
  */
object Diff {

  /** Per-key change status between `oldDf` and `newDf`:
    *
    *  - `added`     — key only in the new snapshot;
    *  - `removed`   — key only in the old snapshot;
    *  - `changed`   — key in both, any compare column differs (null-safe:
    *    null → value and value → null both count as a change, null → null
    *    does not);
    *  - `unchanged` — key in both, all compare columns `<=>`-equal.
    *
    * Returns (keyCols*, old_<c>/new_<c> for each compare column, status).
    *
    * Shape at scale: ONE full-outer sort-merge join on the key — both
    * snapshots shuffle once on the same key and nothing else moves. No
    * driver-side state; the diff of two 100 TB snapshots is exactly as
    * partitionable as a join between them. (Against the same feature-store
    * table, bucketed snapshots co-locate and the exchange disappears —
    * [[graft.sources.Bucketing]].)
    */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    require(compareCols.nonEmpty, "snapshotDiff needs compare columns")
    val o = oldDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"old_$c")) :+
      lit(true).as("__in_old"): _*)
    val n = newDf.select(keyCols.map(col) ++
      compareCols.map(c => col(c).as(s"new_$c")) :+
      lit(true).as("__in_new"): _*)
    val anyChanged = compareCols
      .map(c => !(col(s"old_$c") <=> col(s"new_$c")))
      .reduce(_ || _)
    o.join(n, keyCols, "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(anyChanged, "changed")
          .otherwise("unchanged"))
      .drop("__in_old", "__in_new")
  }
}
