package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.multimodal.Multimodal
import graft.ops.{Behavior, Curation, Dedup, Integrity, Layout, Maintenance, Pipeline, Planner, Relational, Retrieval, Similarity, SqlSurface, SuffixIndex, TextAnalysis, Versioning}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator from SURVEY.md §2 is registered here as a named query over
  * the driver fixtures, with an equivalent DuckDB oracle in [[oracleSql]]
  * where the semantics are ANSI-SQL-expressible. Queries are deterministic:
  * total-order ORDER BY, exact decimal aggregation surfaced as double,
  * timestamps surfaced as epoch-millis longs or formatted strings.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The EP2 signing pipeline: hash → dedup → keyring join → signature. */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.q22SignPipeline(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Pipeline.queries ++ TextAnalysis.queries ++
      Dedup.queries ++ Similarity.queries ++ Multimodal.queries ++
      Curation.queries ++ Behavior.queries ++ SqlSurface.queries ++
      Retrieval.queries ++ Versioning.queries ++ Layout.queries ++
      Maintenance.queries ++ SuffixIndex.queries ++ Integrity.queries ++
      Planner.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Pipeline.oracles ++ TextAnalysis.oracles ++
      Dedup.oracles ++ Similarity.oracles ++ Multimodal.oracles ++
      Curation.oracles ++ Behavior.oracles ++ SqlSurface.oracles ++
      Retrieval.oracles ++ Versioning.oracles ++ Layout.oracles ++
      Maintenance.oracles ++ SuffixIndex.oracles ++ Integrity.oracles ++
      Planner.oracles
}
