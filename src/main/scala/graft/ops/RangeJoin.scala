package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed interval (range) join — "which points land inside which
  * intervals" without the per-key cross join a naive `BETWEEN` predicate
  * plans. The attribution/window-count primitive (clicks inside a
  * conversion window, readings inside a maintenance window, events inside
  * an SCD2 validity range).
  *
  * Technique: quantize time into `bucketWidth` buckets. Each interval
  * replicates to the ⌈span/width⌉+1 buckets it overlaps (an explode over a
  * bounded `sequence`); each point probes exactly ONE bucket. The join is
  * then a plain (key, bucket) equi-join — shuffle-partitionable, AQE/skew
  * aware, broadcast-able — with the exact `lo ≤ t ≤ hi` predicate applied
  * as a post-filter. Choose `bucketWidth` ≈ the typical interval span:
  * replication stays O(1) per interval and every candidate pair shares a
  * bucket, so candidate volume is Σ points-per-bucket · intervals-per-
  * bucket instead of |points| · |intervals| per key.
  *
  * At 100 TB this is the shape Spark's own optimizer cannot derive from a
  * `BETWEEN` join (it plans a broadcast-nested-loop or a per-key cartesian)
  * — the bucketing IS the join strategy.
  */
object RangeJoin {

  /** Join `points` (carrying `tCol`) to `intervals` (carrying
    * [`loCol`, `hiCol`], both inclusive) on equal `keyCols` and
    * containment. Returns point ⋈ interval rows (bucket column dropped);
    * a point inside k overlapping intervals yields k rows.
    */
  def bucketed(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
      tCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__b",
      floor(col(tCol) / lit(bucketWidth)).cast("long"))
    val ib = intervals.withColumn("__b",
      explode(sequence(floor(col(loCol) / lit(bucketWidth)).cast("long"),
        floor(col(hiCol) / lit(bucketWidth)).cast("long"))))
    pb.join(ib, keyCols :+ "__b")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__b")
  }
}
