package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{CorpusQueries, CurationQueries, LakeGateQueries, MultimodalQueries, RelationalQueries, TranscriptQueries, VectorQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-family query packs; every query has a DuckDB oracle
  * unless its semantics aren't SQL-expressible (then rows-only check). */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.queries("q01_groupby_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 plus the
    * training-data pipeline packs (dedup / similarity / text / multimodal). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ CorpusQueries.queries ++
      VectorQueries.queries ++ MultimodalQueries.queries ++
      CurationQueries.queries ++ TranscriptQueries.queries ++
      LakeGateQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops (q30: LSH
    * ANN is approximate by design -> rows-only check). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ CorpusQueries.oracles ++
      VectorQueries.oracles ++ MultimodalQueries.oracles ++
      CurationQueries.oracles ++ TranscriptQueries.oracles ++
      LakeGateQueries.oracles
}
