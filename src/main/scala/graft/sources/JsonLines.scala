package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON-Lines ingest/egress — the lingua franca of LLM corpus interchange
  * (every public pretraining dump ships as {jsonl,jsonl.gz,jsonl.zst}
  * shards). Schema-STRICT with a quarantine lane: production ingest must
  * never silently drop a malformed shard line, and must never let one
  * poison a 100 TB job either.
  *
  * Read shape: `spark.read.text` (splittable, parallel over shards) + ONE
  * codegen'd `from_json` per line against the caller's explicit schema —
  * never schema inference, which at 100 TB means a full extra pass and a
  * schema that drifts with the sample. A line that fails to parse yields a
  * NULL struct; [[readWithQuarantine]] routes it, raw bytes intact, to the
  * quarantine side for audit/replay. Both lanes come from one scan
  * (the filter is a per-row predicate, no shuffle anywhere).
  */
object JsonLines {

  /** (good, quarantined): `good` has the schema's columns; `quarantined`
    * keeps the raw unparseable line + its source file for replay.
    * Malformed-line detection goes through `from_json`'s corrupt-record
    * channel (PERMISSIVE mode yields an all-null struct for bad lines, so
    * a null-struct test alone cannot tell "malformed" from "all fields
    * missing"). */
  def readWithQuarantine(spark: SparkSession, path: String,
      schema: StructType): (DataFrame, DataFrame) = {
    val corrupt = "_corrupt_record"
    require(!schema.fieldNames.contains(corrupt),
      s"schema must not already contain $corrupt")
    val withCorrupt = schema.add(corrupt, org.apache.spark.sql.types.StringType)
    val parsed = spark.read.text(path)
      .select(col("value").as("__raw"),
        input_file_name().as("__src"),
        from_json(col("value"), withCorrupt,
          Map("columnNameOfCorruptRecord" -> corrupt)).as("__p"))
    val good = parsed.filter(col(s"__p.$corrupt").isNull)
      .select(schema.fieldNames.map(f => col(s"__p.$f")).toIndexedSeq: _*)
    val quarantined = parsed.filter(col(s"__p.$corrupt").isNotNull)
      .select(col("__raw").as("raw_line"), col("__src").as("source_file"))
    (good, quarantined)
  }

  /** Write as JSON Lines, one object per row. `shards` bounds output file
    * count (small-file discipline — see [[graft.store.Compaction]]). */
  def write(df: DataFrame, path: String, shards: Int): Unit =
    df.repartition(shards).write.mode("overwrite").json(path)
}
