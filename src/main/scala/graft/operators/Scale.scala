package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Skew-handling operators (SURVEY.md §7.3 "100 TB posture"): salting
  * turns a skewed single-key aggregation/join into a two-phase shape
  * where no reducer sees a whole hot key. AQE's skew-join split covers
  * the join case automatically; explicit salt is the portable form and
  * the one that also works for aggregations with giant groups.
  *
  * Scale posture per SURVEY §7.3; the reference's only parallelism knob is the --nprocs passthrough (dask_ssh_docker/__init__.py:218-219, README.md:60).
  */
object Scale {

  val SaltBuckets = 16

  /** Two-phase salted aggregation: stage 1 aggregates (key, salt) —
    * spreading each hot key over SaltBuckets reducers — stage 2 merges
    * the partials. Result is identical to the direct groupBy (the
    * partial/final split is associative), which is exactly what the
    * oracle checks. events has only 5 event_type values over 100k rows —
    * a genuinely skewed key. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(monotonically_increasing_id()),
      lit(SaltBuckets.toLong)))
    salted
      .groupBy(key.as("k"), col("_salt"))
      .agg(count(lit(1)).as("pn"), sum(value).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), round(sum(col("ps")), 2).as("total"))
  }

  /** Salted skewed aggregation == direct aggregation (oracle = direct). */
  val qSaltedAgg: Q = Q(
    "q75_salted_skew_agg",
    """SELECT event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  ) { (s, d) =>
    saltedCountSum(Tables.events(s, d), col("event_type"), col("value"))
      .select(col("k").as("event_type"), col("n"), col("total"))
      .orderBy(col("event_type"))
  }

  val all: Seq[Q] = Seq(qSaltedAgg)
}
