package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver fixture set (TESTDATA.md).
  *
  * All tables are single parquet files per scale-factor directory. Catalyst
  * handles column pruning + predicate pushdown on these scans automatically,
  * so loaders stay bare `spark.read.parquet` — at 100 TB the same call reads
  * a partitioned directory tree and gets partition pruning for free.
  *
  * Replaces the reference's data access: user scripts received a cluster handle and loaded data themselves (bin/dask-ssh-docker:77-99); here the fixture tables are the corpus (repo TESTDATA.md).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    functions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader rejects
    * by default. Read nanos as raw Long (legacy flag) and truncate to µs —
    * the same truncation DuckDB applies when casting TIMESTAMP_NS, so both
    * engines see identical µs values (FIXTURES.md parity note). Integer
    * `div` (not `/`) because ns-epoch ≈ 1.7e18 exceeds double precision. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = t(s, d, "events")
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}

/** One named query: Spark implementation + optional DuckDB oracle SQL.
  *
  * `oracle == None` marks ops the driver contract calls non-SQL-expressible
  * (streaming, probabilistic sketches with engine-specific hashing) — those
  * get a rows-only check from the driver and full checks in ScalaTest.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, oracle: String)(
      fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(oracle))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
