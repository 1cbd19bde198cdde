package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan pins for the second TPC-DS slice — the shapes where a
  * naive plan would collapse at scale: the date-band self join must keep
  * its equi key (not fall back to nested-loop over the cross product),
  * aggregate slivers must broadcast into their semi joins, and scalar
  * gates must be 1x1 broadcast joins, not row-by-row subquery execution. */
class DsPlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q173 follow-up join extracts the custkey equi key; date band is residual") {
    val p = plan("q173_ds_follow_up")
    assert(p.contains("HashJoin [o_custkey") || p.contains("SortMergeJoin [o_custkey"), p)
    // the non-equi date conditions ride along as the join condition —
    // never a nested loop over the cross product of two fact tables
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q170 broadcasts the frequent-part sliver into its semi join") {
    val p = plan("q170_ds_double_semi")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("BroadcastHashJoin [l_partkey"), p)
  }

  test("q171 iceberg keeps the INTERSECT as semi joins and the scalar gate 1x1") {
    val p = plan("q171_ds_iceberg")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("Expand"), p) // the rollup pass
  }

  test("q157 weekly self-join runs on the aggregate sliver, not orders rows") {
    val p = plan("q157_ds_week_ratio")
    // both sides aggregate before the join: exactly two HashAggregate
    // pairs feeding a join keyed on the derived week column
    assert(p.contains("wk"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
