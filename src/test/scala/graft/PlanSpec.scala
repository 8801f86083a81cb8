package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests (builder spec: ".explain the plan and
  * iterate until it's the plan you'd want"): lock in pushdown, pruning,
  * broadcast choice, and codegen participation so a refactor can't
  * silently regress the 100 TB posture. */
class PlanSpec extends AnyFunSuite {
  import TestSession.{spark, sf}

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)") ||
      p.contains("PushedFilters: [LessThanOrEqual(l_shipdate"), p.take(800))
  }

  test("q1: scan is column-pruned (no l_orderkey read)") {
    val p = plan("q1_pricing_summary")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(!scanLine.contains("l_orderkey"), scanLine)
  }

  test("q1: aggregation is two-phase (map-side partial)") {
    assert(plan("q1_pricing_summary").contains("partial_"))
  }

  test("q4: dimension joins are broadcast, fact table not shuffled by join") {
    val p = plan("q4_broadcast_dim_join")
    assert("BroadcastHashJoin".r.findAllIn(p).size == 2, p.take(400))
  }

  test("q27: top-k plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q27_topk_orders").contains("TakeOrderedAndProject"))
  }

  test("v61: cosine scoring uses the codegen graft_dot expression") {
    assert(plan("v61_cosine_topk").contains("graft_dot"))
  }

  test("q22: global ranks avoid the single-partition WindowExec") {
    val qe = SparkEntry.queries("q22_window_ranks")(spark, sf).queryExecution
    val unpartitioned = qe.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      s"found ${unpartitioned.size} global (move-everything-to-one-task) windows")
  }

  test("q89: tail plans as TakeOrderedAndProject (no global sort)") {
    assert(plan("q89_tail").contains("TakeOrderedAndProject"))
  }

  test("q39: compound predicate reaches the scan as data filters") {
    val p = plan("q39_filter_predicates")
    val scanLine = p.linesIterator.find(_.contains("FileScan parquet")).get
    assert(scanLine.contains("PushedFilters: [") && !scanLine.contains("PushedFilters: []"),
      scanLine.take(400))
  }
}
