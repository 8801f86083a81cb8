package graft.operators

import org.apache.spark.sql.functions._

import graft.Q

/** Registered query over the custom DataSourceV2
  * ([[graft.sources.DetRangeSource]]) — proves the V2 read path
  * end-to-end under the driver's oracle: Spark reads the table through
  * `TableProvider`/`ScanBuilder` with column pruning + filter pushdown,
  * DuckDB regenerates the identical rows from `range()` (every column
  * is pure integer arithmetic on the row id).
  *
  * The id-range predicate is absorbed by the source and prunes its
  * input partitions (SourcesSpec pins this); only `bucket`/`kscore`/
  * `id` are materialized — the string column is never generated. The
  * aggregate is an exact integer sum, so the oracle is value-exact. */
object CustomSource {

  val qDsv2Pushdown: Q = Q(
    "q207_dsv2_pushdown",
    """SELECT CAST(id % 16 AS INT) AS bucket, count(*) AS n,
      |       min(id) AS min_id, max(id) AS max_id,
      |       CAST(sum((id * 31) % 997) AS BIGINT) AS sum_kscore
      |FROM range(20000, 30000) t(id)
      |GROUP BY 1 ORDER BY bucket""".stripMargin
  ) { (s, _) =>
    s.read.format("graft.sources.DetRangeSource")
      .option("rows", 100000).option("slices", 8).load()
      .filter(col("id") >= 20000 && col("id") < 30000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"),
        sum(col("kscore").cast("long")).as("sum_kscore"))
      .orderBy(col("bucket"))
  }

  /** Complete AGGREGATE pushdown (round 12 follow-on): global
    * count/min/max over the id range are answered by the source in
    * closed form — the plan's scan is a one-row `DetRangeAggScan`
    * (SourcesSpec pins it), no row is ever generated or scanned. The
    * V2 analog of answering aggregates from parquet footer stats. */
  val qDsv2AggPushdown: Q = Q(
    "q210_dsv2_agg_pushdown",
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |       min(id) AS min_id, max(id) AS max_id
      |FROM range(20000, 30000) t(id)""".stripMargin
  ) { (s, _) =>
    s.read.format("graft.sources.DetRangeSource")
      .option("rows", 100000).option("slices", 8).load()
      .filter(col("id") >= 20000 && col("id") < 30000)
      .agg(count(lit(1)).as("n"),
        min(col("id")).as("min_id"), max(col("id")).as("max_id"))
  }

  val all: Seq[Q] = Seq(qDsv2Pushdown, qDsv2AggPushdown)
}
