package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-domain inventories; every entry with a
  * matching [[oracleSql]] key is hash-checked against DuckDB by the
  * driver (sf0.01). Column names are aligned between the Spark pipelines
  * and the oracle SQL (the compare sorts columns by name).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2, plus the
    * training-data pipeline operators (text analysis, dedup, similarity
    * search, multimodal plumbing).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.EngineQueries.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Pipelines.queries ++
      operators.Sketches.queries

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.EngineQueries.oracle ++
      operators.TextAnalysis.oracle ++
      operators.Dedup.oracle ++
      operators.Similarity.oracle ++
      operators.Multimodal.oracle ++
      operators.Pipelines.oracle ++
      operators.Sketches.oracle
}
