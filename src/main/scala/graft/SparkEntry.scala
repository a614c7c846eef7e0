package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.engine._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * One entry per implemented operator from SURVEY.md §2; each module under
  * graft.engine contributes its query builders and the matching DuckDB
  * oracle SQL.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_group")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Aggregates.queries ++ Relational.queries ++ Windows.queries ++
      Events.queries ++ Scalar.queries ++ Text.queries ++ Vectors.queries ++
      Ingest.queries ++ Multimodal.queries ++ Analytics.queries ++
      Subqueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Aggregates.oracle ++ Relational.oracle ++ Windows.oracle ++
      Events.oracle ++ Scalar.oracle ++ Text.oracle ++ Vectors.oracle ++
      Ingest.oracle ++ Multimodal.oracle ++ Analytics.oracle ++
      Subqueries.oracle
}
