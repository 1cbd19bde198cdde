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

  test("q219 return ranks: one fact scan replaces the reference's 3-channel union") {
    val p = plan("q219_ds_return_ranks")
    // the oracle spells query49's UNION of three windowed subqueries;
    // the Spark plan must read lineitem ONCE and partition the windows
    // by channel instead of re-scanning per channel
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 2, p) // lineitem + orders, once each
    assert(!p.contains("Union"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("q220 YoY decline: part dim broadcasts; fact aggregated once across both years") {
    val p = plan("q220_ds_net_yoy_decline")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // both years come out of ONE conditional aggregation, not a self-join
    // of per-year aggregates
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 3, p) // lineitem+orders+part
    assert(p.contains("partial_sum"), p)
  }

  test("q221 time buckets: one events scan replaces the reference's 8 scalar subqueries") {
    val p = plan("q221_ds_time_buckets")
    // query88 spells eight 1x1 scalar subqueries cross-joined; the Spark
    // plan must be ONE scan with eight conditional-count lanes — no
    // join of any kind, no repeated FileScan
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"), p)
    assert(p.contains("partial_count"), p)
  }

  test("q223 cumulative channels: windows run over the weekly sliver, not lineitem rows") {
    val p = plan("q223_ds_cume_channels")
    // query51 spells a full outer join of two per-channel series; the
    // Spark plan folds both channels into one conditional agg of one
    // fact pass — the only join is lineitem-orders
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 2, p) // lineitem + orders
    assert(!p.contains("FullOuter"), p)
    assert(p.contains("Window"), p)
    assert(p.contains("partial_sum"), p)
  }

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

  test("q202 YoY growth is one scan + one shuffle + zero joins") {
    val p = plan("q202_ds_yoy_growth")
    // the 4-alias CTE self-join of the reference collapses to one
    // conditional aggregation: exactly one FileScan of orders, no joins
    assert(!p.contains("Join"), p)
    assert(p.sliding("FileScan".length).count(_ == "FileScan") == 1, p)
    // partial agg below the exchange (map-side combine on the fact)
    assert(p.contains("partial_sum"), p)
  }

  test("q203 overlap reduces both channels to distinct keys BEFORE the full outer join") {
    val p = plan("q203_ds_channel_overlap")
    assert(p.contains("FullOuter"), p)
    // distinct (HashAggregate on the key) must sit below the join on
    // both sides: joining raw orders rows would explode the pair count
    val joinAt = p.indexOf("FullOuter")
    val below = p.substring(joinAt)
    assert(below.contains("HashAggregate"), p)
  }

  test("q204 outliers: nation stats join back as a broadcast; no re-scan of lineitem") {
    val df = SparkEntry.queries("q204_ds_return_outliers")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // per-nation sliver (25 rows) must broadcast into the per-customer
    // sliver, and nation itself broadcasts — three shuffles total would
    // mean the plan re-aggregated the fact
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }
}
