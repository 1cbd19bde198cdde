package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Deeper TPC-H-shaped relational coverage (the reference ships 60
  * TPC-DS plan tests + 22-query TPC-H kin in its perf corpus —
  * ql/src/test/queries/clientpositive/perf/): min-per-group joins,
  * nation-pair volume, conditional ratios, HAVING+IN pipelines,
  * anti-join + scalar-subquery combos, INTERSECT/EXCEPT, and explicit
  * NULLS FIRST/LAST ordering (Hive defaults NULLS FIRST on ASC —
  * parse/HiveParser.g nullOrdering).
  */
object TpchMore {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 6) =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  private def run(sql: String): Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(sql)
  }

  /** Q2-shaped: cheapest line per part (correlated min), lineitem as the
    * part-supplier bridge. */
  val q90_min_per_group: Q = run(q90sql)

  /** Q7-shaped: shipping volume between two nations by year. */
  val q91_nation_volume: Q = run(q91sql)

  /** Q12-shaped: order-priority buckets per quantity band (CASE inside
    * aggregate). */
  val q92_case_agg: Q = run(q92sql)

  /** Q14-shaped: promo revenue ratio (conditional numerator over the
    * same aggregate denominator, decimal-exact). */
  val q93_promo_ratio: Q = run(q93sql)

  /** Q18-shaped: large-order customers (HAVING-filtered keys joined
    * back). */
  val q94_large_orders: Q = run(q94sql)

  /** Q22-shaped: well-funded customers with no 'F' orders
    * (scalar subquery threshold + anti join). */
  val q95_idle_customers: Q = run(q95sql)

  /** INTERSECT / EXCEPT (absent from Hive 2.1 — HiveParser.g:2294 only
    * has UNION — provided as the engine's extension; Spark + DuckDB
    * share ANSI semantics). */
  val q96_setops: Q = run(q96sql)

  /** INTERSECT ALL / EXCEPT ALL (multiset semantics — ANSI, shared by
    * Spark and DuckDB). */
  val q96b_setops_all: Q = run(q96bsql)

  /** Explicit null ordering (Hive ASC default = NULLS FIRST). */
  val q97_null_ordering: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 300)
      .select(col("o_orderkey"),
        nullif(col("o_orderstatus"), lit("P")).as("status_nullable"))
      .orderBy(col("status_nullable").asc_nulls_first, col("o_orderkey").desc)
      .limit(50)
  }

  /** Q15-shaped: top-revenue supplier via CTE reused twice (view + scalar
    * max over it — exchange reuse keeps it one computation). */
  val q114_top_supplier: Q = run(q114sql)

  /** Q16-shaped: supplier NDV per brand/size with a NOT-IN exclusion. */
  val q115_supplier_cnt: Q = run(q115sql)

  /** Q17-shaped: small-quantity revenue under a correlated per-part
    * average threshold. */
  val q116_small_qty: Q = run(q116sql)

  /** Q19-shaped: disjunctive multi-branch join predicate (brand x size x
    * quantity bands OR-ed together — the pushdown-through-OR case). */
  val q117_disjunctive: Q = run(q117sql)

  /** Q21-shaped: suppliers who were the last to ship on multi-supplier
    * finished orders (EXISTS + NOT EXISTS self-joins on lineitem). */
  val q118_waiting_supplier: Q = run(q118sql)

  /** Q11-shaped: nation stock value above a fraction-of-total scalar
    * subquery (decimal-exact global threshold). */
  val q119_nation_value: Q = run(q119sql)

  /** Q8-shaped: one nation's market share of a region's volume by year
    * (conditional-numerator ratio over an 8-table star join). */
  val q127_market_share: Q = run(q127sql)

  /** Q9-shaped: per-nation yearly profit (retail-price cost proxy —
    * the corpus has no partsupp table; see TESTDATA.md). */
  val q128_product_profit: Q = run(q128sql)

  /** Q10-shaped: top returned-item customers by lost revenue. */
  val q129_returned_items: Q = run(q129sql)

  /** Q13-shaped: customer order-count distribution (LEFT OUTER with an
    * ON-clause filter, then a second aggregation over group counts). */
  val q130_cust_distribution: Q = run(q130sql)

  /** Q20-shaped: suppliers of promo parts above a shipped-quantity
    * threshold (nested IN chain: part filter -> grouped lineitem HAVING
    * -> supplier semi-join). */
  val q131_part_suppliers: Q = run(q131sql)

  val queries: Map[String, Q] = Map(
    "q127_market_share" -> q127_market_share,
    "q128_product_profit" -> q128_product_profit,
    "q129_returned_items" -> q129_returned_items,
    "q130_cust_distribution" -> q130_cust_distribution,
    "q131_part_suppliers" -> q131_part_suppliers,
    "q114_top_supplier" -> q114_top_supplier,
    "q115_supplier_cnt" -> q115_supplier_cnt,
    "q116_small_qty" -> q116_small_qty,
    "q117_disjunctive" -> q117_disjunctive,
    "q118_waiting_supplier" -> q118_waiting_supplier,
    "q119_nation_value" -> q119_nation_value,
    "q90_min_per_group" -> q90_min_per_group,
    "q91_nation_volume" -> q91_nation_volume,
    "q92_case_agg" -> q92_case_agg,
    "q93_promo_ratio" -> q93_promo_ratio,
    "q94_large_orders" -> q94_large_orders,
    "q95_idle_customers" -> q95_idle_customers,
    "q96_setops" -> q96_setops,
    "q96b_setops_all" -> q96b_setops_all,
    "q97_null_ordering" -> q97_null_ordering,
  )

  /** DuckDB shares the dialect for all of these; year() exists in both. */
  val oracles: Map[String, String] = Map(
    "q127_market_share" -> q127sql, "q128_product_profit" -> q128sql,
    "q129_returned_items" -> q129sql, "q130_cust_distribution" -> q130sql,
    "q131_part_suppliers" -> q131sql,
    "q114_top_supplier" -> q114sql, "q115_supplier_cnt" -> q115sql,
    "q116_small_qty" -> q116sql, "q117_disjunctive" -> q117sql,
    "q118_waiting_supplier" -> q118sql, "q119_nation_value" -> q119sql,
    "q90_min_per_group" -> q90sql, "q91_nation_volume" -> q91sql,
    "q92_case_agg" -> q92sql, "q93_promo_ratio" -> q93sql,
    "q94_large_orders" -> q94sql, "q95_idle_customers" -> q95sql,
    "q96_setops" -> q96sql,
    "q96b_setops_all" -> q96bsql,
    "q97_null_ordering" ->
      """SELECT o_orderkey, nullif(o_orderstatus, 'P') AS status_nullable
        |FROM orders WHERE o_orderkey < 300
        |ORDER BY status_nullable ASC NULLS FIRST, o_orderkey DESC
        |LIMIT 50""".stripMargin,
  )

  private lazy val q127sql =
    """WITH allnations AS (
      |  SELECT year(o.o_orderdate) AS o_year,
      |    CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,6)) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM lineitem l
      |  JOIN part p ON p.p_partkey = l.l_partkey
      |  JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = n1.n_regionkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      |  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
      |    AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |    AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |SELECT o_year,
      |  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
      |    / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
      |FROM allnations GROUP BY o_year ORDER BY o_year""".stripMargin
  private lazy val q128sql =
    """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
      |    - 0.1 * p.p_retailprice * l.l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_profit
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE p.p_name LIKE '%red%'
      |GROUP BY n.n_name, year(o.o_orderdate)
      |ORDER BY nation, o_year DESC""".stripMargin
  private lazy val q129sql =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  c.c_acctbal, n.n_name
      |FROM customer c
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN nation n ON n.n_nationkey = c.c_nationkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      |  AND l.l_returnflag = 'R'
      |GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin
  private lazy val q130sql =
    """SELECT c_count, COUNT(1) AS custdist FROM (
      |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      |  FROM customer c LEFT OUTER JOIN orders o
      |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) co
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin
  private lazy val q131sql =
    """SELECT s.s_name, s.s_acctbal
      |FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE n.n_regionkey = 1
      |  AND s.s_suppkey IN (
      |    SELECT l.l_suppkey FROM lineitem l
      |    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      |      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |    GROUP BY l.l_suppkey
      |    HAVING SUM(l.l_quantity) > 50)
      |ORDER BY s_name""".stripMargin
  private lazy val q114sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.total_revenue
      |FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
      |WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
      |ORDER BY s.s_suppkey""".stripMargin
  private lazy val q115sql =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE p_type <> 'PROMO'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 50)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin
  private lazy val q116sql =
    """SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly,
      |  COUNT(1) AS n_lines
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_brand = 'Brand#1'
      |  AND l.l_quantity < (
      |    SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin
  private lazy val q117sql =
    """SELECT CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
      |  COUNT(1) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity >= 1 AND l_quantity <= 20)
      |   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30
      |       AND l_quantity >= 10 AND l_quantity <= 30)
      |   OR (p_size BETWEEN 40 AND 50 AND l_quantity >= 45)""".stripMargin
  private lazy val q118sql =
    """SELECT s.s_name, COUNT(1) AS numwait
      |FROM supplier s
      |JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
      |WHERE EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s.s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 20""".stripMargin
  private lazy val q119sql =
    """WITH stock AS (
      |  SELECT s_nationkey,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS value
      |  FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      |  GROUP BY s_nationkey)
      |SELECT s_nationkey, value FROM stock
      |WHERE value > (
      |  SELECT CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) * 0.05 FROM stock)
      |ORDER BY value DESC, s_nationkey""".stripMargin
  private lazy val q90sql =
    """SELECT l.l_partkey, p.p_name, l.l_suppkey, l.l_extendedprice
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_partkey < 100
      |  AND l.l_extendedprice = (
      |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
      |    WHERE l2.l_partkey = l.l_partkey)
      |ORDER BY l.l_partkey, l.l_suppkey""".stripMargin
  private lazy val q91sql =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |  year(l.l_shipdate) AS l_year,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS volume
      |FROM lineitem l
      |JOIN orders o ON o.o_orderkey = l.l_orderkey
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      |JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      |WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin
  private lazy val q92sql =
    """SELECT
      |  CASE WHEN l_quantity < 10 THEN 'small'
      |       WHEN l_quantity < 30 THEN 'mid' ELSE 'large' END AS band,
      |  CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS urgent,
      |  CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS normal
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1 ORDER BY band""".stripMargin
  private lazy val q93sql =
    """SELECT
      |  CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
      |        THEN CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))
      |        ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
      |    AS DOUBLE) AS promo_pct,
      |  COUNT(1) AS n
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin
  private lazy val q94sql =
    """SELECT c_custkey, c_name, o_orderkey,
      |  SUM(l_quantity) AS total_qty
      |FROM customer
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 140)
      |GROUP BY c_custkey, c_name, o_orderkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin
  private lazy val q95sql =
    """SELECT c_mktsegment, COUNT(1) AS n_cust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS total_bal
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(25,2))) AS DOUBLE)
      |                          / COUNT(1) FROM customer c2 WHERE c2.c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderstatus = 'F')
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin
  private lazy val q96bsql =
    """SELECT nk, COUNT(1) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey FROM supplier) t
      |GROUP BY nk
      |UNION ALL
      |SELECT -1 AS nk, COUNT(1) AS n FROM (
      |  SELECT c_nationkey AS nk FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey FROM supplier) u
      |ORDER BY nk""".stripMargin
  private lazy val q96sql =
    """SELECT 'both' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer
      |  INTERSECT
      |  SELECT s_nationkey FROM supplier) t
      |UNION ALL
      |SELECT 'cust_only' AS side, n_nationkey FROM (
      |  SELECT c_nationkey AS n_nationkey FROM customer
      |  EXCEPT
      |  SELECT s_nationkey FROM supplier) u
      |ORDER BY side, n_nationkey""".stripMargin
}
