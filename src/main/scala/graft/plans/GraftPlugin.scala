package graft.plans

import java.util.{Map => JMap}

import org.apache.spark.SparkContext
import org.apache.spark.api.plugin.{DriverPlugin, ExecutorPlugin, PluginContext, SparkPlugin}

/** Per-process startup hook — the Spark analog of the reference's
  * `worker_module` extension point (`dask_ssh_docker/__init__.py:383`:
  * `worker_module='dask_cuda.dask_cuda_worker'` swaps the module every
  * deployed worker boots with; the surrounding tool exists to ship such
  * per-worker code via Docker). Spark's `SparkPlugin` is the same seat:
  * `--conf spark.plugins=graft.plans.GraftPlugin` loads one component
  * inside the driver and one inside EVERY executor at JVM startup,
  * before any task runs.
  *
  * What the demo wires, end to end:
  *  - the DRIVER plugin serves a config value to executors via
  *    [[DriverPlugin.init]]'s extraConf map (the `worker_module`
  *    argument analog: driver-chosen, worker-received);
  *  - each EXECUTOR plugin init — the seat where a production build
  *    warms per-executor resources (the multimodal decode seam's codec
  *    JNI libs, `operators/Multimodal.scala` m72) — checks in to the
  *    driver over the plugin RPC channel ([[PluginContext.send]]) and
  *    registers a codahale counter in [[PluginContext.metricRegistry]],
  *    surfaced by Spark's metrics system under
  *    `plugins.graft.plans.GraftPlugin.<metric>`;
  *  - [[ExecutorPlugin.onTaskStart]] bumps the counter per task — the
  *    custom metric "flows" from task execution to the registry
  *    (PluginSpec asserts all three paths).
  *
  * The object-level counters are LOCAL-MODE test observability, same
  * contract as `DetRangeSource.generatedRows`: in `local[*]` the
  * executor plugin shares the driver JVM, so statics are readable from
  * the test; on a real cluster only the RPC check-ins and the metrics
  * system cross process boundaries — which is why the demo exercises
  * both, not just the statics. */
class GraftPlugin extends SparkPlugin {
  override def driverPlugin(): DriverPlugin = new GraftDriverPlugin
  override def executorPlugin(): ExecutorPlugin = new GraftExecutorPlugin
}

object GraftPlugin {
  /** Conf key the driver plugin hands every executor plugin. */
  val WarmKey = "graft.plugin.warm.module"
  /** Driver side: executor ids that checked in over plugin RPC. */
  val checkIns = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  /** Executor side (local-mode observable): inits seen + the extraConf
    * value each received. */
  val executorInits = new java.util.concurrent.atomic.AtomicLong(0L)
  @volatile var receivedWarmModule: String = ""
  /** Tasks observed by onTaskStart across executor plugins. */
  val tasksStarted = new java.util.concurrent.atomic.AtomicLong(0L)
  /** The registry-registered counter (local-mode observable): the test
    * asserts increments land on the SAME object the metrics system
    * polls, i.e. the metric actually flows. */
  @volatile var registeredCounter: com.codahale.metrics.Counter = _
}

class GraftDriverPlugin extends DriverPlugin {
  override def init(sc: SparkContext,
      ctx: PluginContext): JMap[String, String] = {
    // driver-chosen, executor-received — the worker_module argument
    // analog; a production plugin would pass model paths, codec flags…
    java.util.Collections.singletonMap(GraftPlugin.WarmKey,
      "graft.multimodal.codecs")
  }
  override def receive(message: AnyRef): AnyRef = message match {
    case s: String if s.startsWith("checkin:") =>
      GraftPlugin.checkIns.add(s.stripPrefix("checkin:"))
      "ack"
    case other => throw new IllegalArgumentException(
      s"GraftDriverPlugin: unexpected plugin RPC $other")
  }
}

class GraftExecutorPlugin extends ExecutorPlugin {
  @transient private var taskCounter: com.codahale.metrics.Counter = _
  override def init(ctx: PluginContext,
      extraConf: JMap[String, String]): Unit = {
    GraftPlugin.executorInits.incrementAndGet()
    GraftPlugin.receivedWarmModule =
      extraConf.getOrDefault(GraftPlugin.WarmKey, "")
    // per-executor warm-up would happen HERE (load codec JNI, mmap
    // model weights) — once per executor JVM, never per task
    taskCounter = ctx.metricRegistry().counter("graftTasksStarted")
    GraftPlugin.registeredCounter = taskCounter
    ctx.send(s"checkin:${ctx.executorID()}")
  }
  override def onTaskStart(): Unit = {
    GraftPlugin.tasksStarted.incrementAndGet()
    if (taskCounter != null) taskCounter.inc()
  }
}
