package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Collapse a CDC changelog (insert/update/delete events, each stamped
    * with a version) to the final table state: per key, the
    * highest-versioned op wins (last-writer-wins), and a winning delete
    * removes the key. The apply step every log-structured ingest (Debezium
    * → lakehouse table, upsert topic → feature table) runs.
    *
    * `versionCols` is the total per-key order (e.g. ts + a unique
    * tie-breaker); ties MUST be broken by the caller's last column or the
    * winner is nondeterministic.
    *
    * Shape at scale: ONE hash shuffle on the key, then a per-key
    * `row_number` over the ≤few-versions partition — the changelog never
    * joins anything, so applying a 100 TB log is exactly as partitionable
    * as a group-by. (The window reads one partition per key, not a global
    * sort.)
    */
  def cdcApply(log: DataFrame, keyCols: Seq[String],
      versionCols: Seq[String], opCol: String,
      deleteOp: String = "D"): DataFrame = {
    require(keyCols.nonEmpty && versionCols.nonEmpty,
      "cdcApply needs key and version columns")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(versionCols.map(col(_).desc): _*)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) =!= deleteOp)
      .drop("__rn")
  }

  /** Incremental aggregate maintenance (the view-maintenance kernel): fold
    * a NEW batch of raw rows into a persisted per-key aggregate state
    * without touching the history — `state ⊎ partial(delta)` for any
    * commutative-monoid aggregate supplied as (partials, merges) pairs
    * sharing column names (the [[graft.ops.Skew.saltedAgg]] contract:
    * partials run over raw delta rows, merges re-combine state rows).
    *
    * THE reason a 100 TB feature table stays fresh: recomputing per-key
    * counts/sums over the full history is a full-table scan per refresh;
    * this is one group-by over the (typically tiny) delta plus one merge
    * shuffle over state ∪ partials. Correctness statement — refreshed
    * state ≡ full recompute over history ∪ delta — is exactly what the
    * oracle checks.
    */
  def refreshAggregate(state: DataFrame, delta: DataFrame,
      keyCols: Seq[String], partials: Seq[Column],
      merges: Seq[Column]): DataFrame = {
    val deltaState = delta.groupBy(keyCols.map(col): _*)
      .agg(partials.head, partials.tail: _*)
    state.unionByName(deltaState)
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** MERGE INTO semantics as a relation: overlay an `updates` batch on a
    * keyed `base` snapshot — WHEN MATCHED the update's `setCols` replace
    * the base's, WHEN NOT MATCHED the update row is inserted, and base
    * rows without an update pass through. Returns
    * (keyCols*, setCols* coalesced, merge_status ∈ {updated, inserted,
    * carried}).
    *
    * `updates` must be key-unique (one winner per key — run [[cdcApply]]
    * first if it is a raw changelog).
    *
    * Shape at scale: ONE full-outer join on the key — identical exchange
    * discipline to [[snapshotDiff]]; with a bucketed base table the
    * base-side exchange disappears and only the (typically much smaller)
    * update batch shuffles.
    */
  def mergeUpsert(base: DataFrame, updates: DataFrame, keyCols: Seq[String],
      setCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty && setCols.nonEmpty,
      "mergeUpsert needs key and set columns")
    val b = base.select(keyCols.map(col) ++
      setCols.map(c => col(c).as(s"__b_$c")) :+
      lit(true).as("__in_base"): _*)
    val u = updates.select(keyCols.map(col) ++
      setCols.map(c => col(c).as(s"__u_$c")) :+
      lit(true).as("__in_upd"): _*)
    b.join(u, keyCols, "full_outer")
      .select(keyCols.map(col) ++
        setCols.map(c =>
          when(col("__in_upd").isNotNull, col(s"__u_$c"))
            .otherwise(col(s"__b_$c")).as(c)) :+
        when(col("__in_base").isNull, "inserted")
          .when(col("__in_upd").isNull, "carried")
          .otherwise("updated").as("merge_status"): _*)
  }
}
