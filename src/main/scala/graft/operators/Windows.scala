package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Window / PTF surface — the reference's PTFOperator + WindowingTableFunction
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/PTFOperator.java:46,
  * udf/ptf/WindowingTableFunction.java; frame spec parse/WindowingSpec.java):
  * ranking family, lead/lag, first/last_value, running aggregates over
  * ROWS and RANGE frames. Spark's WindowExec is the 1:1 physical analog —
  * one shuffle on the partition key, sort within partitions; at 100 TB the
  * partition key (custkey/user_id) must be high-cardinality, which these are.
  *
  * Running sums go through decimal casts: frame evaluation order is fixed,
  * but DuckDB may use a segment tree while Spark streams — exact decimal
  * addition makes both produce identical bits.
  */
object Windows {

  /** Ranking family over a per-segment ordering (row_number, rank,
    * dense_rank, percent_rank, cume_dist, ntile). */
  val q20_window_rank: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .withColumn("rk", rank().over(w))
      .withColumn("drk", dense_rank().over(w))
      .withColumn("prk", percent_rank().over(w))
      .withColumn("cd", cume_dist().over(w))
      .withColumn("nt", ntile(4).over(w))
      .filter(col("rn") <= 5)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
              col("rn"), col("rk"), col("drk"), col("prk"), col("cd"), col("nt"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  /** Running aggregate over ROWS UNBOUNDED PRECEDING..CURRENT ROW +
    * lead/lag/first/last_value (streaming-frame path in the reference,
    * WindowingTableFunction streaming mode). */
  val q21_window_running: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d)
      .filter(col("o_custkey") <= 200)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(25, 2))).over(wRows).cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .withColumn("next_status", lead(col("o_orderstatus"), 1).over(w))
      .withColumn("first_price", first(col("o_totalprice")).over(wAll))
      .withColumn("last_price", last(col("o_totalprice")).over(wAll))
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
              col("running_spend"), col("prev_price"), col("next_status"),
              col("first_price"), col("last_price"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** RANGE frame over a numeric ordering: per order, quantity-window sum of
    * neighboring line numbers (RANGE n PRECEDING..CURRENT ROW). */
  val q22_window_range: Q = (s, d) => {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"))
      .rangeBetween(-2, Window.currentRow)
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 2000)
      .withColumn("qty_window",
        sum(col("l_quantity").cast(DecimalType(25, 2))).over(w).cast("double"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("qty_window"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Windowed dedup idiom: keep the first row per key by ordering —
    * the reference expresses this as row_number()=1 over a PTF partition. */
  val q23_window_dedup: Q = (s, d) => {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey").as("first_orderkey"),
              col("o_orderdate").as("first_date"))
      .orderBy(col("o_custkey"))
  }

  /** nth_value + IGNORE NULLS picks (WindowingTableFunction value
    * functions; Hive's first_value(expr, true) skip-nulls form). */
  val q120_window_nth: Q = (s, d) => {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 3000)
      .withColumn("third_price", nth_value(col("o_totalprice"), 3).over(w))
      .withColumn("first_nonopen",
        first(nullif(col("o_orderstatus"), lit("O")), ignoreNulls = true).over(w))
      .select(col("o_orderkey"), col("o_orderpriority"),
              col("third_price"), col("first_nonopen"))
      .orderBy(col("o_orderkey"))
  }

  /** QUALIFY — the Teradata window-predicate clause (reference corpus:
    * hplsql offline select_teradata.sql), supported through the
    * injected delegating parser (plans/QualifyRewrite): the statement
    * below is NOT valid Spark SQL without the extension. Keep-best
    * order per customer plus a windowed share, filtered by two window
    * predicates at once; the oracle recomputes via the explicit
    * subquery QUALIFY desugars to. */
  val q299_qualify: Q = (s, d) => {
    Tables.orders(s, d).createOrReplaceTempView("q299_orders")
    s.sql(
      """SELECT o_custkey, o_orderkey,
        |       CAST(o_totalprice AS DOUBLE) AS price,
        |       RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS status_rank
        |FROM q299_orders
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey) = 1
        |        AND o_totalprice > 1000
        |ORDER BY o_custkey""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q299_qualify" -> q299_qualify,
    "q120_window_nth" -> q120_window_nth,
    "q20_window_rank" -> q20_window_rank,
    "q21_window_running" -> q21_window_running,
    "q22_window_range" -> q22_window_range,
    "q23_window_dedup" -> q23_window_dedup,
  )

  val oracles: Map[String, String] = Map(
    "q299_qualify" ->
      """SELECT o_custkey, o_orderkey, price, status_rank
        |FROM (
        |  SELECT o_custkey, o_orderkey,
        |         CAST(o_totalprice AS DOUBLE) AS price,
        |         RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC) AS status_rank,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
        |         o_totalprice
        |  FROM orders) t
        |WHERE rn = 1 AND o_totalprice > 1000
        |ORDER BY o_custkey""".stripMargin,
    "q120_window_nth" ->
      """SELECT o_orderkey, o_orderpriority,
        |  nth_value(o_totalprice, 3) OVER w AS third_price,
        |  first_value(nullif(o_orderstatus, 'O') IGNORE NULLS) OVER w AS first_nonopen
        |FROM orders WHERE o_orderkey < 3000
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,
    "q20_window_rank" ->
      """SELECT * FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER w AS rn,
        |    RANK() OVER w AS rk,
        |    DENSE_RANK() OVER w AS drk,
        |    PERCENT_RANK() OVER w AS prk,
        |    CUME_DIST() OVER w AS cd,
        |    NTILE(4) OVER w AS nt
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |               ORDER BY o_totalprice DESC, o_orderkey)
        |) t WHERE rn <= 5
        |ORDER BY o_orderpriority, rn""".stripMargin,
    "q21_window_running" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2)))
        |       OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS running_spend,
        |  LAG(o_totalprice, 1) OVER w AS prev_price,
        |  LEAD(o_orderstatus, 1) OVER w AS next_status,
        |  FIRST_VALUE(o_totalprice)
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
        |  LAST_VALUE(o_totalprice)
        |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
        |FROM orders
        |WHERE o_custkey <= 200
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "q22_window_range" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2)))
        |       OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
        |             RANGE BETWEEN 2 PRECEDING AND CURRENT ROW)
        |       AS DOUBLE) AS qty_window
        |FROM lineitem
        |WHERE l_orderkey <= 2000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q23_window_dedup" ->
      """SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_date
        |FROM (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn = 1
        |ORDER BY o_custkey""".stripMargin,
  )
}
