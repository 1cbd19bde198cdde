package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Core relational operator surface: scan/filter/project/aggregate/join/
  * union/limit — the row-pipeline operators of the reference
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/{TableScan,Select,Filter,
  * GroupBy,Join,MapJoin,Union,Limit}Operator.java, SURVEY.md §2.1),
  * re-expressed as declarative DataFrame plans so Catalyst plans the
  * physical strategy (broadcast vs sort-merge, partial aggregation, AQE).
  *
  * Float determinism: money aggregates go through exact DECIMAL sums and
  * are cast back to double at the end, so results hash-match the DuckDB
  * oracle bit-for-bit regardless of accumulation order — the same trick
  * makes them reproducible across cluster sizes at 100 TB.
  */
object Relational {

  /** sum(expr) via exact decimal arithmetic, emitted as double. */
  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 4) =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  /** TPC-H Q1: scan -> filter -> partial+final agg -> sort.
    * GroupByOperator modes PARTIAL1/FINAL (GroupByDesc.java:54) are implicit
    * in Spark's hash aggregate. */
  val q1_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")), 6).as("sum_charge"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice"), 2) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6: highly selective filter -> global agg (no groupBy: single
    * reduce; FilterOperator short-circuit + map-side partials). */
  val q6_filter_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount"), 6).as("revenue"),
           count(lit(1)).as("n"))
  }

  /** TPC-H Q3-style: 3-way join, dim side broadcast-able, topN
    * (TopNHash/LimitPushdownOptimizer -> TakeOrderedAndProject). */
  val q3_join_topn: Q = (s, d) => {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q4-style: EXISTS -> left-semi join
    * (JoinType.LEFTSEMI, parse/QBSubQuery.java rewrite). */
  val q4_semijoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01").cast("timestamp")
        && col("o_orderdate") < lit("1996-10-01").cast("timestamp"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q5-style: 5-way star join (small dims broadcast, fact shuffled
    * once on orderkey), revenue per nation. */
  val q5_multijoin: Q = (s, d) => {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 6).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** LEFT OUTER join with null-producing side aggregated
    * (CommonJoinOperator LEFTOUTER, JoinType.java). */
  val q7_outerjoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d).filter(col("l_quantity") > 45)
    o.join(l, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("l_orderkey")).as("n_matched"),
           sum(when(col("l_orderkey").isNull, 1).otherwise(0)).as("n_unmatched"))
      .orderBy(col("o_orderpriority"))
  }

  /** NOT EXISTS -> left-anti join: customers with no urgent orders. */
  val q8_antijoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           dsum(col("c_acctbal"), 2).as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Cartesian + theta join (CrossProductCheck warns in the reference;
    * Spark requires explicit crossJoin): region x nation pairs with a
    * non-equi residual predicate. */
  val q9_theta_join: Q = (s, d) => {
    val r = Tables.region(s, d)
    val n = Tables.nation(s, d)
    r.crossJoin(n)
      .filter(col("n_regionkey") =!= col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_foreign"))
      .orderBy(col("r_name"))
  }

  /** FULL OUTER join on an intentionally partial overlap. */
  val q10_fullouter: Q = (s, d) => {
    val big = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      .select(col("c_nationkey").as("k"), col("c_acctbal").as("v"))
    val sup = Tables.supplier(s, d).filter(col("s_acctbal") > 9000)
      .select(col("s_nationkey").as("k"), col("s_acctbal").as("v2"))
    big.groupBy(col("k")).agg(count(lit(1)).as("nc"))
      .join(sup.groupBy(col("k")).agg(count(lit(1)).as("ns")), Seq("k"), "full_outer")
      .select(col("k"), coalesce(col("nc"), lit(0)).as("n_cust"),
              coalesce(col("ns"), lit(0)).as("n_supp"))
      .orderBy(col("k"))
  }

  /** UNION ALL + UNION DISTINCT (UnionOperator; UNION DISTINCT =
    * union().distinct(), HiveParser.g:2294). */
  val q11_union: Q = (s, d) => {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
    val all = cn.union(sn).groupBy(col("nk")).agg(count(lit(1)).as("n_all"))
    val dist = cn.union(sn).distinct().select(col("nk"), lit(1).as("one"))
    all.join(dist.select(col("nk")), Seq("nk"))
      .orderBy(col("nk"))
  }

  /** ORDER BY + LIMIT + OFFSET (LimitOperator offset support). */
  val q12_limit_offset: Q = (s, d) => {
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .offset(5).limit(10)
  }

  /** DISTINCT aggregation (count distinct + multiple distincts;
    * HiveExpandDistinctAggregatesRule / RewriteDistinctAggregates). */
  val q13_distinct_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** HAVING (filter over aggregate output). */
  val q14_having: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n"))
      .filter(col("total_qty") > 150)
      .orderBy(col("l_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q1_agg" -> q1_agg,
    "q6_filter_agg" -> q6_filter_agg,
    "q3_join_topn" -> q3_join_topn,
    "q4_semijoin" -> q4_semijoin,
    "q5_multijoin" -> q5_multijoin,
    "q7_outerjoin" -> q7_outerjoin,
    "q8_antijoin" -> q8_antijoin,
    "q9_theta_join" -> q9_theta_join,
    "q10_fullouter" -> q10_fullouter,
    "q11_union" -> q11_union,
    "q12_limit_offset" -> q12_limit_offset,
    "q13_distinct_agg" -> q13_distinct_agg,
    "q14_having" -> q14_having,
  )

  val oracles: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(25,6))) AS DOUBLE) AS sum_charge,
        |  SUM(l_quantity) / COUNT(1) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / COUNT(1) AS avg_price,
        |  COUNT(1) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q6_filter_agg" ->
      """SELECT
        |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(25,6))) AS DOUBLE) AS revenue,
        |  COUNT(1) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q3_join_topn" ->
      """SELECT l_orderkey, o_orderdate, o_orderpriority,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q4_semijoin" ->
      """SELECT o_orderpriority, COUNT(1) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q7_outerjoin" ->
      """SELECT o_orderpriority,
        |  COUNT(1) AS n_rows,
        |  COUNT(l_orderkey) AS n_matched,
        |  CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
        |FROM orders
        |LEFT OUTER JOIN (SELECT * FROM lineitem WHERE l_quantity > 45) l
        |  ON o_orderkey = l_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q8_antijoin" ->
      """SELECT c_mktsegment, COUNT(1) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q9_theta_join" ->
      """SELECT r_name, COUNT(1) AS n_foreign
        |FROM region CROSS JOIN nation
        |WHERE n_regionkey <> r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q10_fullouter" ->
      """WITH c AS (SELECT c_nationkey AS k, COUNT(1) AS nc FROM customer
        |           WHERE c_acctbal > 9000 GROUP BY c_nationkey),
        |     s AS (SELECT s_nationkey AS k, COUNT(1) AS ns FROM supplier
        |           WHERE s_acctbal > 9000 GROUP BY s_nationkey)
        |SELECT COALESCE(c.k, s.k) AS k,
        |  COALESCE(nc, 0) AS n_cust, COALESCE(ns, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON c.k = s.k
        |ORDER BY k""".stripMargin,
    "q11_union" ->
      """WITH u AS (SELECT c_nationkey AS nk FROM customer
        |           UNION ALL SELECT s_nationkey FROM supplier)
        |SELECT nk, COUNT(1) AS n_all FROM u
        |WHERE nk IN (SELECT c_nationkey FROM customer
        |             UNION SELECT s_nationkey FROM supplier)
        |GROUP BY nk ORDER BY nk""".stripMargin,
    "q12_limit_offset" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10 OFFSET 5""".stripMargin,
    "q13_distinct_agg" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS nd_part,
        |  COUNT(DISTINCT l_suppkey) AS nd_supp,
        |  COUNT(1) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q14_having" ->
      """SELECT l_partkey, SUM(l_quantity) AS total_qty, COUNT(1) AS n
        |FROM lineitem GROUP BY l_partkey
        |HAVING SUM(l_quantity) > 150
        |ORDER BY l_partkey""".stripMargin,
  )
}
