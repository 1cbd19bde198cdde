package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all specs (one JVM per sbt test fork). */
object TestSession {
  lazy val spark: SparkSession = Session.local(cores = "8")
  val sf: String = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSession._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs at sf0.001 and matches its oracle's column names") {
    try {
      SparkEntry.queries.foreach { case (name, q) =>
        val df = q(spark, sf)
        assert(df.columns.nonEmpty, s"$name has no columns")
        df.count() // executes the plan
      }
    } finally {
      // the constraint / materialized-view gate rows register session-
      // global optimizer state; clear it so later plan-shape pins in this
      // shared JVM see virgin sessions (the rewrites are answer-invariant
      // but deliberately change plan shapes)
      plans.ConstraintCatalog.clear()
      plans.MaterializedViews.clear()
      plans.IndexCatalog.clear()
      plans.MaskPolicies.clear()
      sources.SkewCatalog.clear()
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q1 aggregates are exact") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length > 0)
    val n = rows.map(_.getAs[Long]("count_order")).sum
    val li = Tables.lineitem(spark, sf)
    import org.apache.spark.sql.functions._
    val expected = li.filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp")).count()
    assert(n == expected)
  }

  test("semi/anti partition the orders universe") {
    import org.apache.spark.sql.functions._
    val c = Tables.customer(spark, sf)
    val o = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
    val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti").count()
    val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi").count()
    assert(anti + semi == c.count())
  }
}
