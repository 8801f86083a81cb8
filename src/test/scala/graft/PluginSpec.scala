package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.plans.GraftPlugin]] — the reference `worker_module` analog
  * (per-process startup hook; reference `__init__.py:383`). The plugin
  * is loaded by TestSession's `spark.plugins` conf at context creation;
  * these tests assert the three paths a production plugin relies on:
  * executor init (with driver-supplied extraConf), the executor→driver
  * RPC channel, and the custom metric registered in the executor's
  * metric registry. */
class PluginSpec extends AnyFunSuite {
  import graft.plans.GraftPlugin

  test("executor plugin initialized at startup with the driver's extraConf") {
    TestSession.spark.range(10).count() // force context + a job
    assert(GraftPlugin.executorInits.get() >= 1L,
      "executor plugin never initialized — spark.plugins not applied?")
    // the worker_module-argument analog: driver-chosen value received
    // by every executor plugin through DriverPlugin.init's extraConf
    assert(GraftPlugin.receivedWarmModule == "graft.multimodal.codecs")
  }

  test("executor check-in reaches the driver over plugin RPC") {
    TestSession.spark.range(10).count()
    assert(!GraftPlugin.checkIns.isEmpty,
      "no executor checked in via PluginContext.send")
  }

  test("custom metric flows: onTaskStart increments the registry counter") {
    // force the context FIRST: registeredCounter is assigned in the
    // executor plugin's init (at SparkContext creation) — a targeted
    // run of this one test would otherwise read it as null
    TestSession.spark.range(1).count()
    val before = GraftPlugin.tasksStarted.get()
    val cBefore = GraftPlugin.registeredCounter.getCount
    // a multi-partition job → multiple tasks
    assert(TestSession.spark.range(0, 1000, 1, 4)
      .agg(sum(col("id"))).head.getLong(0) == 499500L)
    assert(GraftPlugin.tasksStarted.get() >= before + 4,
      s"expected >=4 task starts, got ${GraftPlugin.tasksStarted.get() - before}")
    assert(GraftPlugin.registeredCounter.getCount >= cBefore + 4,
      "registry counter (the object the metrics system polls) did not advance")
  }
}
