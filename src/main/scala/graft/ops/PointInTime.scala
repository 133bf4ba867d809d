package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-time-correct training-matrix assembly — THE canonical
  * feature-store serving operation (the reference's store keys features by
  * version/timestamp for exactly this retrieval shape, `ML Feature Store
  * Pipeline.py:286-309`): given a label relation (entity key, label
  * timestamp) and N independently-maintained feature groups, attach to each
  * label row the latest value of every feature as of the label timestamp —
  * never a later one, so no training-serving leakage.
  *
  * Built by folding [[graft.ops.AsofJoin.asofBackward]] over the groups:
  * each group costs one union + one (key)-partitioned time-ordered window
  * pass (or, via `native = true`, the sorted-merge
  * [[graft.plans.AsofJoinExec]] operator — one shuffle + sort per side and
  * a streaming O(L+R) merge per partition). Feature groups never join each
  * other — each attaches to the (growing) label spine independently, so at
  * 100 TB the plan is N sequential shuffles on the SAME entity key: AQE
  * reuses the spine's partitioning and the group relations are each read
  * exactly once, already filtered/pruned at their scans.
  *
  * As-of is INCLUSIVE (a feature row stamped exactly at the label time is
  * visible), matching DuckDB's `ASOF JOIN ... ON l.ts >= f.ts`.
  */
object PointInTime {

  /** One feature group: a relation with an entity-key column, an
    * event-time column, and the feature value columns to attach. Value
    * column names must be unique across groups and disjoint from the label
    * relation's columns (alias them at group construction).
    */
  final case class FeatureGroup(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String])

  /** Fold every feature group onto the label spine as-of `labelTs`.
    *
    * @param labels  label relation (the spine); all its columns survive
    * @param keyCol  entity-key column name on the label side
    * @param tsCol   label event-time column name
    * @param groups  feature groups to attach, in order
    * @param native  route each as-of through the native Catalyst
    *                sorted-merge operator instead of the window rewrite
    */
  def trainingMatrix(
      labels: DataFrame,
      keyCol: String,
      tsCol: String,
      groups: Seq[FeatureGroup],
      native: Boolean = false): DataFrame =
    groups.foldLeft(labels) { (spine, g) =>
      require(g.valueCols.forall(v => !spine.columns.contains(v)),
        s"feature columns ${g.valueCols} collide with spine ${spine.columns.toSeq}")
      // present the group under the spine's key name; keep only what the
      // as-of needs so the group scan prunes to key + time + values
      val right = g.df
        .withColumnRenamed(g.keyCol, keyCol)
        .select((Seq(keyCol, g.tsCol) ++ g.valueCols).map(col): _*)
      if (native)
        AsofJoin.asofBackwardNative(spine, right, Seq(keyCol), tsCol,
          g.tsCol, g.valueCols)
      else
        AsofJoin.asofBackward(spine, right, Seq(keyCol), tsCol,
          g.tsCol, g.valueCols)
    }

  /** Incremental training-matrix maintenance — the streaming-ingest twin
    * of [[trainingMatrix]]: when a micro-batch of feature rows arrives,
    * only the entity keys it TOUCHES can change any matrix row, so the
    * refresh recomputes the as-of fold for those keys' label rows alone
    * and splices them over the standing matrix (anti-join out, union in —
    * the [[Diff]] CDC/MERGE discipline applied to the serving matrix).
    *
    * Shape at scale: `touchedKeys` is micro-batch-bounded and broadcasts;
    * the standing matrix is scanned once with a broadcast anti semi-filter
    * (no shuffle — at rest it is key-partitioned, so the splice is also
    * partition-local); the recompute reads only the touched keys' label
    * spine and their group history, both key-pruned at the scan. Per-batch
    * cost tracks the batch's key footprint, never matrix size — the
    * foreachBatch loop in StreamingSpec pins micro-batched ≡ full
    * recompute.
    */
  def refreshMatrix(
      matrix: DataFrame,
      labels: DataFrame,
      keyCol: String,
      tsCol: String,
      groups: Seq[FeatureGroup],
      touchedKeys: DataFrame): DataFrame = {
    val keys = touchedKeys.select(col(keyCol)).distinct()
    val refreshed = trainingMatrix(
      labels.join(broadcast(keys), Seq(keyCol), "left_semi"),
      keyCol, tsCol, groups)
    matrix.join(broadcast(keys), Seq(keyCol), "left_anti")
      .unionByName(refreshed)
  }
}
