package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Minimal access shim for `Dataset.ofRows` (private[sql]) — the standard
  * way Spark-extension libraries materialize a DataFrame from a custom
  * LogicalPlan node. Nothing else from the private surface is touched. */
object Shim {
  def ofRows(spark: org.apache.spark.sql.SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
