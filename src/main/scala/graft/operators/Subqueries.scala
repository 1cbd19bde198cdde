package graft.operators

import graft.{Q, Tables}

/** Subquery / CTE surface (SURVEY.md §2.9): IN / NOT IN / EXISTS /
  * correlated / scalar subqueries and WITH clauses. The reference rewrites
  * these to semi/anti joins at analysis time (parse/QBSubQuery.java,
  * SubQueryUtils.java, SemanticAnalyzer.java:3088-3108); Spark's
  * RewritePredicateSubquery does the same rewrite natively — these run
  * through spark.sql to exercise the full SQL analysis path.
  *
  * Averages use exact decimal sums so the correlated comparisons are
  * bit-stable (a float avg threshold could flip a row's membership).
  */
object Subqueries {

  private def run(sql: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(sql)
  }

  private val avgBrandPrice =
    """CAST(SUM(CAST(p2.p_retailprice AS DECIMAL(25,2))) AS DOUBLE) / COUNT(1)"""

  /** Correlated scalar subquery: parts priced above their brand average.
    * Thresholds here and in q54 are tuned so sf0.01 yields rows on both
    * engines — a 0-row gate row proves schema only (round-4 verdict). */
  val q50_correlated_scalar: Q = run(
    s"""SELECT p_partkey, p_brand, p_retailprice
       |FROM part p1
       |WHERE p_retailprice > 1.05 * (
       |  SELECT $avgBrandPrice
       |  FROM part p2 WHERE p2.p_brand = p1.p_brand)
       |ORDER BY p_partkey""".stripMargin)

  /** Uncorrelated IN subquery. */
  val q51_in_subquery: Q = run(
    """SELECT s_suppkey, s_name, s_nationkey
      |FROM supplier
      |WHERE s_nationkey IN (
      |  SELECT c_nationkey FROM customer
      |  GROUP BY c_nationkey HAVING COUNT(1) > 70)
      |ORDER BY s_suppkey""".stripMargin)

  /** NOT IN (null-safe anti-join semantics on a non-null key). */
  val q52_not_in: Q = run(
    """SELECT n_nationkey, n_name
      |FROM nation
      |WHERE n_nationkey NOT IN (
      |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
      |ORDER BY n_nationkey""".stripMargin)

  /** Correlated EXISTS with an extra predicate + CTE. */
  val q53_cte_exists: Q = run(
    """WITH big_orders AS (
      |  SELECT * FROM orders WHERE o_totalprice > 400000)
      |SELECT c_custkey, c_name
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM big_orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_orderstatus = 'F')
      |ORDER BY c_custkey""".stripMargin)

  /** Uncorrelated scalar subquery in SELECT + WHERE. */
  val q54_scalar_subquery: Q = run(
    """SELECT o_orderkey, o_totalprice,
      |  o_totalprice - (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
      |                         / COUNT(1) FROM orders o2) AS delta_vs_avg
      |FROM orders
      |WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o3.o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
      |                                 / COUNT(1) FROM orders o3)
      |ORDER BY o_orderkey""".stripMargin)

  val queries: Map[String, Q] = Map(
    "q50_correlated_scalar" -> q50_correlated_scalar,
    "q51_in_subquery" -> q51_in_subquery,
    "q52_not_in" -> q52_not_in,
    "q53_cte_exists" -> q53_cte_exists,
    "q54_scalar_subquery" -> q54_scalar_subquery,
  )

  /** The same SQL runs in DuckDB (ANSI subset) — oracles are the query
    * text itself. */
  val oracles: Map[String, String] = Map(
    "q50_correlated_scalar" ->
      s"""SELECT p_partkey, p_brand, p_retailprice
         |FROM part p1
         |WHERE p_retailprice > 1.05 * (
         |  SELECT $avgBrandPrice
         |  FROM part p2 WHERE p2.p_brand = p1.p_brand)
         |ORDER BY p_partkey""".stripMargin,
    "q51_in_subquery" ->
      """SELECT s_suppkey, s_name, s_nationkey
        |FROM supplier
        |WHERE s_nationkey IN (
        |  SELECT c_nationkey FROM customer
        |  GROUP BY c_nationkey HAVING COUNT(1) > 70)
        |ORDER BY s_suppkey""".stripMargin,
    "q52_not_in" ->
      """SELECT n_nationkey, n_name
        |FROM nation
        |WHERE n_nationkey NOT IN (
        |  SELECT s_nationkey FROM supplier WHERE s_acctbal > 9000)
        |ORDER BY n_nationkey""".stripMargin,
    "q53_cte_exists" ->
      """WITH big_orders AS (
        |  SELECT * FROM orders WHERE o_totalprice > 400000)
        |SELECT c_custkey, c_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM big_orders o
        |              WHERE o.o_custkey = c.c_custkey
        |                AND o.o_orderstatus = 'F')
        |ORDER BY c_custkey""".stripMargin,
    "q54_scalar_subquery" ->
      """SELECT o_orderkey, o_totalprice,
        |  o_totalprice - (SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
        |                         / COUNT(1) FROM orders o2) AS delta_vs_avg
        |FROM orders
        |WHERE o_totalprice > 1.8 * (SELECT CAST(SUM(CAST(o3.o_totalprice AS DECIMAL(25,2))) AS DOUBLE)
        |                                 / COUNT(1) FROM orders o3)
        |ORDER BY o_orderkey""".stripMargin,
  )
}
