package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaterializedViews

/** Materialized views with automatic rewrite (plans/MaterializedViews).
  * Pins: the rewrite actually routes a matching query to the stored
  * parquet (plan shape), answers stay identical, non-matching shapes are
  * untouched, REFRESH picks up base drift, and DROP restores the
  * recompute path. */
class MvSpec extends AnyFunSuite {
  import TestSession._

  private val base = "target/storage/mvspec"

  private def defn = Tables.orders(spark, sf)
    .groupBy(col("o_orderpriority"))
    .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("sum_price"))

  test("matching query is rewritten to scan the materialization") {
    MaterializedViews.clear()
    val expect = defn.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    MaterializedViews.create(spark, "mv_priority", defn, s"$base/mv_priority")
    val q = defn // same shape, fresh plan
    val opt = q.queryExecution.optimizedPlan.toString
    assert(!opt.contains("Aggregate"),
      "query matching the view definition must become a view scan:\n" + opt)
    // the physical scan must read the materialization, not the base table
    val phys = q.queryExecution.executedPlan.toString
    assert(phys.contains("mv_priority") && !phys.contains("orders.parquet"), phys)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect, "rewritten answer differs from recompute")
    MaterializedViews.clear()
  }

  test("query ABOVE the view keeps only its outer operators") {
    MaterializedViews.clear()
    MaterializedViews.create(spark, "mv_priority", defn, s"$base/mv_priority")
    val outer = defn.filter(col("n_orders") > 1).agg(sum(col("n_orders")).as("total"))
    val phys = outer.queryExecution.executedPlan.toString
    assert(phys.contains("mv_priority") && !phys.contains("orders.parquet"),
      "inner subtree must route to the view:\n" + phys)
    val direct = Tables.orders(spark, sf).count()
    assert(outer.collect()(0).getLong(0) == direct,
      "sum of per-priority counts must equal the row count")
    MaterializedViews.clear()
  }

  test("non-matching shapes are untouched; DROP restores recompute") {
    MaterializedViews.clear()
    MaterializedViews.create(spark, "mv_priority", defn, s"$base/mv_priority")
    val different = Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus")) // different grouping
      .agg(count(lit(1)).as("n_orders"))
    assert(!different.queryExecution.optimizedPlan.toString.contains("mv_priority"))
    MaterializedViews.drop("mv_priority")
    assert(!defn.queryExecution.optimizedPlan.toString.contains("mv_priority"))
    MaterializedViews.clear()
  }

  test("MV DDL: CREATE ... AS SELECT registers and routes; REBUILD and DROP work") {
    MaterializedViews.clear()
    Tables.registerAll(spark, sf)
    graft.hplsql.Hplsql.run(spark,
      """CREATE MATERIALIZED VIEW mv_ddl AS
        |  SELECT o_orderstatus, count(1) AS n FROM orders GROUP BY o_orderstatus;
        |""".stripMargin)
    assert(MaterializedViews.registered.contains("mv_ddl"))
    def q = spark.sql("SELECT o_orderstatus, count(1) AS n FROM orders GROUP BY o_orderstatus")
    assert(q.queryExecution.executedPlan.toString.contains("mv_ddl"),
      "SQL-created view must route the matching SQL query")
    graft.hplsql.Hplsql.run(spark, "ALTER MATERIALIZED VIEW mv_ddl REBUILD;")
    assert(q.collect().map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    graft.hplsql.Hplsql.run(spark, "DROP MATERIALIZED VIEW mv_ddl;")
    assert(!MaterializedViews.registered.contains("mv_ddl"))
    MaterializedViews.clear()
  }

  test("REFRESH re-materializes from the definition") {
    MaterializedViews.clear()
    val path = s"$base/mv_refresh"
    MaterializedViews.create(spark, "mv_refresh", defn, path)
    // clobber the materialization to simulate staleness, then refresh
    Tables.orders(spark, sf).limit(0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("sum_price"))
      .write.mode("overwrite").parquet(path)
    MaterializedViews.refresh(spark, "mv_refresh")
    val got = defn.collect().map(_.getString(0)).toSet
    assert(got.nonEmpty, "refresh must restore the full materialization")
    MaterializedViews.clear()
  }
}
