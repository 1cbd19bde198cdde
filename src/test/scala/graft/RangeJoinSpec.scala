package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.RangeJoin

/** Pins the bucketed range join: row parity with the naive theta join,
  * hash-join (never nested-loop) plan shape, multi-bucket intervals,
  * and exact [start, end) boundary semantics. */
class RangeJoinSpec extends AnyFunSuite {
  import TestSession._

  private val H = 3600L * 1000000L // 1h bucket in micros

  private def ts(s: String) = Timestamp.valueOf(s)

  test("bucketed == naive theta join on the corpus gate inputs") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val daily = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
    // threshold derived from the corpus (sf-independent): busiest half
    val thr = daily.agg(expr("percentile(n, 0.5)")).head().getDouble(0)
    val hot = daily.filter(col("n") >= thr)
      .select(col("w_start"), (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    assert(hot.count() > 0, "gate inputs vacuous: no hot day at this SF")
    val bucketed = RangeJoin.bucketed(ev, col("ts"), hot,
        col("w_start"), col("w_end"), H)
      .select("event_id", "w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = ev.join(hot, col("ts") >= col("w_start") && col("ts") < col("w_end"))
      .select("event_id", "w_start").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(bucketed == naive,
      s"bucketed=${bucketed.size} naive=${naive.size} diff=${(bucketed diff naive).take(5)}")
  }

  test("plan is a hash join, not a nested loop") {
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val hot = Tables.events(spark, sf)
      .groupBy(date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
      .select(col("w_start"), (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    val plan = RangeJoin.bucketed(ev, col("ts"), hot,
      col("w_start"), col("w_end"), H).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
  }

  test("an interval spanning many buckets catches points in each bucket") {
    import spark.implicits._
    val pts = Seq((1L, ts("2024-01-01 00:30:00")), (2L, ts("2024-01-01 01:30:00")),
                  (3L, ts("2024-01-01 02:30:00")), (4L, ts("2024-01-01 03:30:00")))
      .toDF("id", "ts")
    val ivl = Seq((10L, ts("2024-01-01 00:45:00"), ts("2024-01-01 03:00:00")))
      .toDF("ivl_id", "w_start", "w_end")
    val got = RangeJoin.bucketed(pts, col("ts"), ivl, col("w_start"), col("w_end"), H)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L), got.toString) // 1 before start, 4 after end
  }

  test("[start, end) boundaries: start inclusive, end exclusive") {
    import spark.implicits._
    val pts = Seq((1L, ts("2024-01-01 01:00:00")), (2L, ts("2024-01-01 02:00:00")))
      .toDF("id", "ts")
    val ivl = Seq((10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("ivl_id", "w_start", "w_end")
    val got = RangeJoin.bucketed(pts, col("ts"), ivl, col("w_start"), col("w_end"), H)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), got.toString)
  }

  test("overlaps == naive theta join, one row per overlapping pair") {
    import spark.implicits._
    // intervals deliberately span several shared buckets: without the
    // first-shared-bucket rule each pair below would surface 2-3 times
    val lft = Seq(
      (1L, ts("2024-01-01 00:10:00"), ts("2024-01-01 03:10:00")),
      (2L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:30:00")),
      (3L, ts("2024-01-02 00:00:00"), ts("2024-01-02 01:00:00")))
      .toDF("lid", "ls", "le")
    val rgt = Seq(
      (10L, ts("2024-01-01 01:00:00"), ts("2024-01-01 06:00:00")),
      (11L, ts("2024-01-01 05:30:00"), ts("2024-01-01 07:00:00")),
      (12L, ts("2024-01-03 00:00:00"), ts("2024-01-03 02:00:00")))
      .toDF("rid", "rs", "re")
    val got = RangeJoin.overlaps(lft, col("ls"), col("le"),
        rgt, col("rs"), col("re"), H)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = lft.join(rgt, col("ls") < col("re") && col("rs") < col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    // multiset equality: the bucketed join must emit each pair ONCE
    assert(got.sorted.toSeq == naive.sorted.toSeq,
      s"got=${got.toSeq.sorted} naive=${naive.toSeq.sorted}")
    // interval 2 ends exactly where 11 starts: end-exclusive, no match
    assert(!got.contains((2L, 11L)))
  }

  test("band join == naive |a-b| <= delta join, bit-identical, hash plan") {
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_totalprice"))
    val l = o.select(col("o_orderkey").as("ida"), col("o_totalprice").as("pa"))
    val r = o.select(col("o_orderkey").as("idb"), col("o_totalprice").as("pb"))
    val banded = RangeJoin.band(l, col("pa"), r, col("pb"), delta = 5.0)
      .filter(col("ida") < col("idb"))
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
    val got = banded.select("ida", "idb").collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val naive = l.join(r, abs(col("pa") - col("pb")) <= 5.0 && col("ida") < col("idb"))
      .select("ida", "idb").collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(got.nonEmpty, "band gate vacuous at this SF/delta")
    // multiset equality: exactly once per pair, no bucket double-count
    assert(got.sorted.toSeq == naive.sorted.toSeq,
      s"banded=${got.length} naive=${naive.length}")
  }

  test("extraKeys tighten the join: cross-tenant points never match") {
    import spark.implicits._
    val pts = Seq(("a", 1L, ts("2024-01-01 01:30:00")), ("b", 2L, ts("2024-01-01 01:30:00")))
      .toDF("tenant", "id", "ts")
    val ivl = Seq(("a", ts("2024-01-01 01:00:00"), ts("2024-01-01 02:00:00")))
      .toDF("tenant", "w_start", "w_end")
    val got = RangeJoin.bucketed(pts, col("ts"), ivl, col("w_start"), col("w_end"), H,
        extraKeys = Seq("tenant"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L), got.toString)
  }
}
