package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Join-strategy surfaces promoted to oracle-checked rows: the
  * sort-merge join the reference runs as CommonMergeJoinOperator, and
  * explicit salt-spread skew joins (SkewJoinHandler's compile-time
  * analog). Results are strategy-invariant — the oracle recomputes each
  * answer from a plain join — so these rows pin that changing the
  * PHYSICAL join keeps the ANSWER bit-identical, which is precisely the
  * contract a 100 TB re-plan (broadcast -> SMJ, unsalted -> salted)
  * relies on.
  */
object JoinStrategies {

  /** Sort-merge join forced via the merge hint (reference
    * CommonMergeJoinOperator.java): the strategy used when both sides
    * are too big to broadcast — sort both shuffles, stream the merge.
    * PlanSpec pins the SortMergeJoin node; the oracle pins the rows. */
  val q194_sortmerge_join: Q = (s, d) => {
    Tables.lineitem(s, d).hint("merge")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_extendedprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Salted skew join (reference optimizer/SkewJoinOptimizer.java,
    * exec/SkewJoinHandler.java): lineitem's per-supplier row counts are
    * exactly the hot-key shape salting spreads. The salted join must be
    * row-identical to the plain equi-join — the oracle IS the plain
    * join, so any salt-routing error (lost bucket, dropped replica)
    * breaks the hash. */
  val q195_salted_skew_join: Q = (s, d) => {
    val left = Tables.lineitem(s, d)
      .select(col("l_suppkey").as("suppkey"), col("l_quantity"))
    val right = Tables.supplier(s, d)
      .select(col("s_suppkey").as("suppkey"), col("s_nationkey"))
    SkewTools.saltedJoin(left, right, "suppkey", salts = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast(DecimalType(25, 2))).cast("double").as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  val queries: Map[String, Q] = Map(
    "q194_sortmerge_join" -> q194_sortmerge_join,
    "q195_salted_skew_join" -> q195_salted_skew_join,
  )

  val oracles: Map[String, String] = Map(
    "q194_sortmerge_join" ->
      """SELECT o_orderpriority, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q195_salted_skew_join" ->
      """SELECT s_nationkey, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
  )
}
