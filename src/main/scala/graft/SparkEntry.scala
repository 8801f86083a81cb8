package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are registered per operator family in `graft.operators.*`; this
  * object only aggregates them into the driver's `queries`/`oracleSql` maps.
  */
object SparkEntry {

  /** All registered queries, in registration order. */
  def registry: Seq[Q] =
    operators.Relational.all ++ operators.Joins.all ++
      operators.Aggregates.all ++ operators.Windows.all ++
      operators.SortsSets.all ++ operators.ScalarTours.all ++
      operators.Events.all ++ operators.Text.all ++ operators.Dedup.all ++
      operators.Vectors.all ++ operators.Typed.all ++ operators.Multimodal.all ++
      operators.Scale.all ++ operators.FunctionTours2.all ++
      operators.Reshape.all ++ operators.FunctionTours3.all ++
      operators.Curation.all ++ operators.Retrieval.all ++
      operators.Analytics.all ++ operators.Stats.all ++
      operators.Subqueries.all ++ operators.CustomSource.all ++
      operators.SqlSurface.all ++ operators.LakeOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
