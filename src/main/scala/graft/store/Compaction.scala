package graft.store

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for parquet table directories — the maintenance
  * op every long-lived store needs at scale: streaming ingest and
  * per-batch appends leave thousands of KB-sized files, and at 100 TB the
  * scan's task-scheduling and footer-read overhead (one task + one footer
  * per file) dominates actual IO long before the data does.
  *
  * Bin-packs the table into ⌈bytes/targetFileBytes⌉ files. With `sortCols`
  * the rewrite uses `repartitionByRange` + in-partition sort, so the
  * compaction doubles as a data-skipping layout pass (each output file
  * covers a narrow min/max range of the sort key — compose with
  * [[graft.sources.Layout.zorderBy]]'s Morton column for multi-dim
  * skipping); without it a plain round-robin repartition just merges.
  *
  * The rewrite goes to `<path>__compact_tmp` and swaps in with
  * delete+rename (the [[FeatureStore]] metadata-swap idiom — same
  * non-atomic-window caveat, callers coordinate writers). Content equality
  * is checkable via [[FeatureStore.fingerprint]]; CompactionSpec pins it.
  */
object Compaction {

  final case class CompactionReport(
      filesBefore: Int, bytesBefore: Long, filesAfter: Int, bytesAfter: Long)

  /** (data file count, total bytes) of a parquet dir, recursively. */
  def tableFiles(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { n += 1; bytes += f.getLen }
    }
    (n, bytes)
  }

  /** Compact `path` toward `targetFileBytes`-sized files. Returns the
    * before/after report. One full shuffle of the table — the price of
    * merging; skipped entirely (no write) if the table already has
    * ≤ the target file count.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long,
      sortCols: Seq[String] = Nil): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val (filesBefore, bytesBefore) = tableFiles(spark, path)
    val targetFiles =
      math.max(1L, (bytesBefore + targetFileBytes - 1) / targetFileBytes).toInt
    if (filesBefore <= targetFiles)
      return CompactionReport(filesBefore, bytesBefore, filesBefore,
        bytesBefore)
    val df = spark.read.parquet(path)
    val out =
      if (sortCols.nonEmpty)
        df.repartitionByRange(targetFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(targetFiles)
    val tmp = new Path(path + "__compact_tmp")
    out.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(path)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"compaction swap failed: $tmp -> $dst")
    val (filesAfter, bytesAfter) = tableFiles(spark, path)
    CompactionReport(filesBefore, bytesBefore, filesAfter, bytesAfter)
  }
}
