package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: wall-clock per SparkEntry query at the given
  * scale factor, one shared session, one JSON line to stdout. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM once (classloading, parquet reader, codegen infra)
    // so the first measured query isn't charged ~15s of one-time cost.
    spark.range(1000).selectExpr("sum(id)").collect()
    try Tables.lineitem(spark, sfDir).limit(1).count()
    catch { case _: Throwable => () } // bad sfDir → queries report -1 below
    // Deterministic execution order (sorted by name) for stable runs.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // failures are visible per-query as -1 but don't pollute the total
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
