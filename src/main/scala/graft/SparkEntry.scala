package graft

import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-area query/oracle catalogs. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the broadcast interval join (SURVEY §2 J1/F1). */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    graft.ranges.Ranges.overlap(Tables.ivA(spark, d), Tables.ivB(spark, d))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RangesQueries.queries ++ PileupVepQueries.queries ++ MlQueries.queries ++
      AnalyticsQueries.queries ++ VepSpliceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RangesQueries.oracleSql ++ PileupVepQueries.oracleSql ++ MlQueries.oracleSql ++
      AnalyticsQueries.oracleSql ++ VepSpliceQueries.oracleSql
}
