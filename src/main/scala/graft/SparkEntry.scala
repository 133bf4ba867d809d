package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator names to oracle-shaped DataFrame builders;
  * `oracleSql` carries the equivalent DuckDB SQL. Families live under
  * `graft.queries.*`; the library operators they exercise live under
  * `graft.{extract,quality,store,ops,functions,sources,streaming}`.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ParityQueries.userEventFeatures(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ QualityQueries.queries ++
      RelationalQueries.queries ++ DedupQueries.queries ++
      SimilarityQueries.queries ++ TextQueries.queries ++
      MultimodalQueries.queries ++ ScaleQueries.queries ++
      PrepQueries.queries ++ FeatureQueries.queries ++
      EvalQueries.queries ++ ModelQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ QualityQueries.oracle ++
      RelationalQueries.oracle ++ DedupQueries.oracle ++
      SimilarityQueries.oracle ++ TextQueries.oracle ++
      MultimodalQueries.oracle ++ ScaleQueries.oracle ++
      PrepQueries.oracle ++ FeatureQueries.oracle ++
      EvalQueries.oracle ++ ModelQueries.oracle
}
