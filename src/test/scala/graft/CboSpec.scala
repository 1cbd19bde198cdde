package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization fed by column statistics — the reference's
  * StatsTask/ColumnStatsTask -> Calcite CBO pipeline
  * (ql/src/java/org/apache/hadoop/hive/ql/optimizer/calcite/, 51 cbo_*
  * golden tests): ANALYZE ... FOR ALL COLUMNS must produce statistics
  * that Catalyst's CBO actually CONSUMES — cardinality estimates on
  * filters and a stats-driven join reordering — not just DDL that
  * prints in DESCRIBE. */
class CboSpec extends AnyFunSuite {
  import TestSession._

  private val db = "graft_cbo"

  private def mkTable(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$name")
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.catalog.getDatabase(db).locationUri), name)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.saveAsTable(s"$db.$name")
    spark.sql(s"ANALYZE TABLE $db.$name COMPUTE STATISTICS FOR ALL COLUMNS")
  }

  private def withCbo[A](on: Boolean)(f: => A): A = {
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
                   "spark.sql.cbo.planStats.enabled")
    val saved = keys.map(k => k -> conf.get(k))
    try { keys.foreach(conf.set(_, on.toString)); f }
    finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("ANALYZE column stats drive CBO cardinality estimates") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    mkTable("orders_c", Tables.orders(spark, sf))
    withCbo(true) {
      val full = spark.table(s"$db.orders_c")
      val fullRows = full.queryExecution.optimizedPlan.stats.rowCount
      assert(fullRows.isDefined, "ANALYZE must surface a rowCount to the optimizer")
      assert(fullRows.get.toLong == full.count(), "rowCount stat must be exact")
      // a selective filter's ESTIMATE must come from column stats:
      // strictly fewer rows than the table, more than zero
      val est = full.filter(col("o_orderstatus") === "F")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.isDefined, "filter selectivity must be estimated under CBO")
      assert(est.get > 0 && est.get < fullRows.get,
        s"estimate ${est.get} should be a strict sliver of ${fullRows.get}")
    }
  }

  test("stats-driven join reorder fires on a deliberately bad join order") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    mkTable("lineitem_c", Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice"))
    mkTable("orders_c2", Tables.orders(spark, sf).select("o_orderkey", "o_custkey"))
    mkTable("customer_c", Tables.customer(spark, sf)
      .select("c_custkey", "c_nationkey"))
    // written worst-first: the two fact tables joined before the
    // filter-carrying dimension
    val sql =
      s"""SELECT count(1) AS n
         |FROM $db.lineitem_c l
         |JOIN $db.orders_c2 o ON l.l_orderkey = o.o_orderkey
         |JOIN $db.customer_c c ON o.o_custkey = c.c_custkey
         |WHERE c.c_nationkey = 3""".stripMargin
    val planOff = withCbo(false)(spark.sql(sql).queryExecution.optimizedPlan.toString)
    val planOn = withCbo(true)(spark.sql(sql).queryExecution.optimizedPlan.toString)
    val n = withCbo(true)(spark.sql(sql).collect()(0).getLong(0))
    val nOff = withCbo(false)(spark.sql(sql).collect()(0).getLong(0))
    assert(n == nOff, "CBO must not change results")
    // the reorder is observable as a different join tree; if Spark ever
    // picks the same tree for both, this pin should be revisited rather
    // than silently passing — hence the strict inequality
    assert(planOn != planOff,
      s"stats-driven join reorder did not change the plan:\n$planOn")
  }
}
