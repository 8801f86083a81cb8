package graft

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.Ev

/** Streaming twins (SURVEY.md §5 strategy): MemoryStream-driven streaming
  * runs must produce the same answers as the batch forms the DuckDB
  * oracle checks. */
class StreamingSpec extends AnyFunSuite {
  import TestSession.{spark, sf}

  private def eventRows(): Seq[Ev] = {
    Tables.events(spark, sf)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .collect()
      .map(r => Ev(r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getString(3), r.getDouble(4)))
      .toSeq
  }

  private def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("streaming tumbling window == batch twin (q43)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[Ev]
    val stream = MemoryStream[Ev]
    stream.addData(eventRows())
    val got = runToMemory(StreamingOps.tumblingByType(stream.toDF()),
      "tumbling_out", OutputMode.Complete())
    val want = StreamingOps.tumblingByType(Tables.events(spark, sf))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("streaming sliding window == batch twin (q44)") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[Ev]
    val stream = MemoryStream[Ev]
    stream.addData(eventRows())
    val got = runToMemory(StreamingOps.slidingWindows(stream.toDF()),
      "sliding_out", OutputMode.Complete())
    val want = StreamingOps.slidingWindows(Tables.events(spark, sf))
    assert(sortedRows(got) == sortedRows(want))
  }

  test("streaming dedup drops duplicate event_ids across batches") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[Ev]
    val rows = eventRows()
    val stream = MemoryStream[Ev]
    stream.addData(rows)
    stream.addData(rows.take(200)) // re-deliver a prefix: at-least-once input
    val got = runToMemory(StreamingOps.dedupById(stream.toDF()),
      "dedup_out", OutputMode.Append())
    assert(got.count() == rows.size)
    assert(got.select("event_id").distinct().count() == rows.size)
  }

  test("flatMapGroupsWithState running counts converge to batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[Ev]
    val rows = eventRows()
    val (first, second) = rows.splitAt(rows.size / 2)
    val stream = MemoryStream[Ev]
    val q = StreamingOps.userRunningCounts(stream.toDS())
      .toDF()
      .writeStream.outputMode(OutputMode.Update())
      .format("memory").queryName("counts_out").start()
    stream.addData(first)
    q.processAllAvailable()
    stream.addData(second)
    q.processAllAvailable()
    q.stop()
    // last update per user must equal the batch aggregate
    val want = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // memory sink in Update mode appends each update; take the max count
    // per user (counts are monotone)
    val got = spark.table("counts_out").groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("session_window streaming agg: sessions match the batch lag-islands count") {
    implicit val sqlCtx = spark.sqlContext
    implicit val enc = Encoders.product[Ev]
    val stream = MemoryStream[Ev]
    stream.addData(eventRows())
    val got = runToMemory(StreamingOps.sessionWindows(stream.toDF()),
      "sessions_out", OutputMode.Complete())
    val batchSessions = operators.Events.qSessionize.fn(spark, sf)
    // same number of sessions per user as the lag-islands batch form
    val gotPerUser = got.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantPerUser = batchSessions.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotPerUser == wantPerUser)
  }
}
