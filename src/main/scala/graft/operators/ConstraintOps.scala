package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.plans.ConstraintDdl

/** Gate rows for the informational-constraint surface (HIVE-13290 parity:
  * ql/src/java/org/apache/hadoop/hive/ql/parse/HiveParser.g:2070-2082) and
  * the rewrites it licenses (graft.plans.ConstraintRewrites).
  *
  * Every row registers its constraints through the Hive DDL string form —
  * the user-facing surface — and computes an answer whose ORACLE still
  * contains the join / the distinct. The rewrite is only sound if it is
  * invisible in the output, so each row is simultaneously a feature gate
  * (DDL accepted, rule fires — ConstraintsSpec pins the plan shape) and a
  * soundness gate (rows hash-identical to the unoptimized computation).
  *
  * Scale: the eliminated inner join is lineitem⋈orders — at 100 TB that
  * is the single largest shuffle in the TPC-H-shaped workload; the
  * eliminated DISTINCT is a full exchange + two hash aggregates over the
  * orders table. Both become a scan-side no-op.
  */
object ConstraintOps {

  private def registerTpchConstraints(s: org.apache.spark.sql.SparkSession, d: String): Unit = {
    // scan identity is VERIFIED against the session catalog (see
    // ConstraintRewrites.scanTable), so the names must resolve to the
    // same locations the queries below scan
    Tables.registerAll(s, d)
    ConstraintDdl.run(
      "ALTER TABLE orders ADD CONSTRAINT pk_orders PRIMARY KEY (o_orderkey) DISABLE NOVALIDATE RELY")
    ConstraintDdl.run(
      "ALTER TABLE customer ADD CONSTRAINT pk_customer PRIMARY KEY (c_custkey) DISABLE NOVALIDATE RELY")
    ConstraintDdl.run(
      "ALTER TABLE lineitem ADD CONSTRAINT fk_line_order FOREIGN KEY (l_orderkey) " +
        "REFERENCES orders (o_orderkey) DISABLE NOVALIDATE RELY")
  }

  /** Inner fact⋈dim join whose dim columns are never referenced: with the
    * RELY FK(l_orderkey)→PK(o_orderkey) registered, ConstraintRewrites
    * replaces the join with `l_orderkey IS NOT NULL` on the fact side.
    * The oracle keeps the join, so the row proves the elimination is
    * answer-invariant (TPC-H referential integrity holds in the data, as
    * RELY asserts). Decimal-sum then one final cast, the repo's standard
    * summation-order-proof aggregation spelling. */
  val q272_pkfk_join_elim: Q = (s, d) => {
    registerTpchConstraints(s, d)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast(DecimalType(25, 2))).cast("double").as("sum_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** DISTINCT over a projection that carries the table's RELY primary
    * key dedupes nothing; the rule deletes the aggregate (and with it the
    * exchange). Oracle keeps the DISTINCT. */
  val q273_distinct_pk_elim: Q = (s, d) => {
    registerTpchConstraints(s, d)
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .distinct()
      .orderBy(col("o_orderkey"))
      .limit(500)
  }

  /** LEFT OUTER join onto a RELY primary key with no dim columns
    * referenced needs only uniqueness (≤1 match per row, unmatched rows
    * survive null-extended): eliminated without any FK declared — the
    * shape BI tools emit for every "optional dimension" lookup. */
  val q274_leftouter_pk_elim: Q = (s, d) => {
    registerTpchConstraints(s, d)
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"), "left_outer")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** COUNT(DISTINCT pk) collapses to plain COUNT under the RELY PK —
    * no Expand, no double aggregation. Mixed with an ordinary
    * count-distinct (o_custkey, NOT a key) that must keep its DISTINCT,
    * so the row also proves the rewrite is surgical. */
  val q277_count_distinct_pk: Q = (s, d) => {
    registerTpchConstraints(s, d)
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .agg(count_distinct(col("o_orderkey")).as("n_orders"),
           count_distinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, Q] = Map(
    "q277_count_distinct_pk" -> q277_count_distinct_pk,
    "q272_pkfk_join_elim" -> q272_pkfk_join_elim,
    "q273_distinct_pk_elim" -> q273_distinct_pk_elim,
    "q274_leftouter_pk_elim" -> q274_leftouter_pk_elim,
  )

  val oracles: Map[String, String] = Map(
    "q277_count_distinct_pk" ->
      """SELECT o_orderstatus, count(DISTINCT o_orderkey) AS n_orders,
         count(DISTINCT o_custkey) AS n_custs
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q272_pkfk_join_elim" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q273_distinct_pk_elim" ->
      """SELECT DISTINCT o_orderkey, o_custkey, o_orderstatus
         FROM orders ORDER BY o_orderkey LIMIT 500""",
    "q274_leftouter_pk_elim" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
         FROM orders LEFT OUTER JOIN customer ON o_custkey = c_custkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
  )
}
