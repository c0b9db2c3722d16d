package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` has one entry per implemented operator from SURVEY.md §2 (plus
  * the extension operators); `oracleSql` carries the equivalent DuckDB SQL
  * for the driver's correctness gate. COVERAGE.md maps §2 rows → query keys.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: the full fact build
    * (stg_prices → left join part/supplier dims) rolled up to the
    * category-distribution mart. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.Marts.a2CategoryRollup(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Staging.queries ++ ops.Marts.queries ++ ops.Analytics.queries ++
      ops.Ingest.queries ++ ops.Quality.queries ++ ops.KrogerTpch.queries ++
      ext.Dedup.queries ++ ext.Similarity.queries ++
      ext.TextAnalysis.queries ++ ext.Sessionize.queries ++
      ext.Multimodal.queries ++ ext.Approx.queries ++
      ext.EventAnalytics.queries ++ ext.CorpusPrep.queries ++
      ext.Selection.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    ops.Staging.oracle ++ ops.Marts.oracle ++ ops.Analytics.oracle ++
      ops.Ingest.oracle ++ ops.Quality.oracle ++ ops.KrogerTpch.oracle ++
      ext.Dedup.oracle ++ ext.Similarity.oracle ++
      ext.TextAnalysis.oracle ++ ext.Sessionize.oracle ++
      ext.Multimodal.oracle ++ ext.Approx.oracle ++
      ext.EventAnalytics.oracle ++ ext.CorpusPrep.oracle ++
      ext.Selection.oracle
}
