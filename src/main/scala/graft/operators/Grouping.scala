package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Grouping-sets / ROLLUP / CUBE + the UDAF statistics surface.
  *
  * The reference expands grouping sets by bitset row-replication inside
  * GroupByOperator (GroupByOperator.java:126-130,218-228; grammar
  * HiveLexer.g:266-280) and exposes GROUPING__ID; Spark's Expand operator
  * + grouping_id() have identical semantics. Statistics UDAFs
  * (GenericUDAFStd/Variance/Covariance/Correlation, udf/generic/) map to
  * Spark's declarative aggregates; outputs are rounded because Welford
  * merges are order-sensitive in the last bits (both engines are exact to
  * ~1e-12 relative, rounding removes the drift).
  */
object Grouping {

  private def dsum(c: org.apache.spark.sql.Column, scale: Int = 2) =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  /** ROLLUP with grouping_id — hierarchy totals in one pass. */
  val q25_rollup: Q = (s, d) => {
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** CUBE — all 2^k grouping combinations. */
  val q26_cube: Q = (s, d) => {
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum(col("o_totalprice")).as("sum_price"),
           count(lit(1)).as("n"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("o_orderstatus"), col("o_orderpriority"))
  }

  /** Explicit GROUPING SETS (subset of the cube lattice). */
  val q27_grouping_sets: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
           count(lit(1)).as("n"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("l_returnflag"), col("l_linestatus"))
  }

  /** Statistics UDAF family: stddev/variance/covariance/correlation.
    * Rounded — see object doc. */
  val q28_stats_agg: Q = (s, d) => {
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        round(stddev_samp(col("l_quantity")), 6).as("sd_qty"),
        round(stddev_pop(col("l_quantity")), 6).as("sdp_qty"),
        round(avg(col("l_discount")), 8).as("avg_disc"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 8).as("corr_qp"),
        round(covar_samp(col("l_quantity"), col("l_discount")), 8).as("cov_qd"),
        round(covar_pop(col("l_quantity"), col("l_discount")), 8).as("covp_qd"),
        round(var_samp(col("l_quantity")), 6).as("var_q"),
        min(col("l_quantity")).as("min_q"),
        max(col("l_quantity")).as("max_q"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact percentiles (UDAFPercentile / GenericUDAFPercentileApprox in the
    * reference; Spark `percentile` = linear interpolation = DuckDB
    * quantile_cont). */
  val q29_percentile: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"))
      .orderBy(col("o_orderpriority"))
  }

  /** collect_list/collect_set made deterministic by sorting + joining to a
    * string (GenericUDAFCollectList/CollectSet). */
  val q30_collect: Q = (s, d) => {
    Tables.nation(s, d)
      .join(Tables.supplier(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        concat_ws(",", sort_array(collect_list(col("s_suppkey")))).as("suppliers"),
        concat_ws(",", sort_array(collect_set(col("s_nationkey")))).as("nkeys"))
      .orderBy(col("n_name"))
  }

  /** min_by / max_by (arg-extrema; Hive 2.1 users emulate via struct-max —
    * we expose the modern form). */
  val q31_argminmax: Q = (s, d) => {
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(
        max_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_max"),
        min_by(col("o_orderkey"), struct(col("o_totalprice"), col("o_orderkey"))).as("key_of_min"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, Q] = Map(
    "q25_rollup" -> q25_rollup,
    "q26_cube" -> q26_cube,
    "q27_grouping_sets" -> q27_grouping_sets,
    "q28_stats_agg" -> q28_stats_agg,
    "q29_percentile" -> q29_percentile,
    "q30_collect" -> q30_collect,
    "q31_argminmax" -> q31_argminmax,
  )

  val oracles: Map[String, String] = Map(
    "q25_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty, COUNT(1) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q26_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  COUNT(1) AS n,
        |  GROUPING(o_orderstatus, o_orderpriority) AS gid
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q27_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  SUM(l_quantity) AS sum_qty, COUNT(1) AS n,
        |  GROUPING(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q28_stats_agg" ->
      """SELECT l_returnflag,
        |  ROUND(STDDEV_SAMP(l_quantity), 6) AS sd_qty,
        |  ROUND(STDDEV_POP(l_quantity), 6) AS sdp_qty,
        |  ROUND(AVG(l_discount), 8) AS avg_disc,
        |  ROUND(CORR(l_quantity, l_extendedprice), 8) AS corr_qp,
        |  ROUND(COVAR_SAMP(l_quantity, l_discount), 8) AS cov_qd,
        |  ROUND(COVAR_POP(l_quantity, l_discount), 8) AS covp_qd,
        |  ROUND(VAR_SAMP(l_quantity), 6) AS var_q,
        |  MIN(l_quantity) AS min_q,
        |  MAX(l_quantity) AS max_q
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q29_percentile" ->
      """SELECT o_orderpriority,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.5), 4) AS p50,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.9), 4) AS p90,
        |  ROUND(QUANTILE_CONT(o_totalprice, 0.99), 4) AS p99
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q30_collect" ->
      """SELECT n_name,
        |  STRING_AGG(s_suppkey, ',' ORDER BY s_suppkey) AS suppliers,
        |  STRING_AGG(DISTINCT s_nationkey, ',') AS nkeys
        |FROM nation JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q31_argminmax" ->
      """WITH t AS (
        |  SELECT o_orderstatus, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice DESC, o_orderkey DESC) AS rmax,
        |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice ASC, o_orderkey ASC) AS rmin
        |  FROM orders)
        |SELECT o_orderstatus,
        |  MAX(CASE WHEN rmax = 1 THEN o_orderkey END) AS key_of_max,
        |  MAX(CASE WHEN rmin = 1 THEN o_orderkey END) AS key_of_min,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
