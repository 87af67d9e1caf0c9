package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are assembled from the analytics/operator modules; every
  * entry with a DuckDB-expressible equivalent also appears in
  * [[oracleSql]] with identical column names (the driver sorts columns
  * by name before hashing).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame],
                            Map[String, String])] = Seq(
    (analytics.Relational.queries, analytics.Relational.oracle),
    (analytics.Windowed.queries, analytics.Windowed.oracle),
    (analytics.Scalars.queries, analytics.Scalars.oracle),
    (analytics.LlmOps.queries, analytics.LlmOps.oracle),
    (analytics.Pipeline.queries, analytics.Pipeline.oracle),
    (analytics.Advanced.queries, analytics.Advanced.oracle),
    (analytics.Curation.queries, analytics.Curation.oracle),
    (analytics.Lakehouse.queries, analytics.Lakehouse.oracle),
    (analytics.Frontier.queries, analytics.Frontier.oracle),
    (analytics.Governance.queries, analytics.Governance.oracle),
    (analytics.Platform.queries, analytics.Platform.oracle),
    (analytics.Robust.queries, analytics.Robust.oracle),
    (analytics.Evaluation.queries, analytics.Evaluation.oracle),
    (analytics.Metrics.queries, analytics.Metrics.oracle),
    (analytics.Ops.queries, analytics.Ops.oracle),
    (analytics.DecisionSupport.queries, analytics.DecisionSupport.oracle),
    (analytics.Safety.queries, analytics.Safety.oracle),
    (analytics.Features.queries, analytics.Features.oracle),
    (analytics.Audit.queries, analytics.Audit.oracle),
    (analytics.Integrity.queries, analytics.Integrity.oracle),
    (analytics.Shift.queries, analytics.Shift.oracle),
    (analytics.Mining.queries, analytics.Mining.oracle),
    (analytics.Learn.queries, analytics.Learn.oracle),
    (analytics.Refine.queries, analytics.Refine.oracle))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
