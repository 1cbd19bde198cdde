package graft.operators

import org.apache.spark.sql.functions._

import graft.etl.DataQuality._
import graft.{Q, Tables}

/** Driver-contract query for the declarative data-quality layer
  * ([[graft.etl.DataQuality]]): the post-load constraint audit every
  * warehouse crew runs by hand on Hive 2.1 (which declares no enforced
  * constraints), as one report. */
object AuditOps {

  /** Seven rules over two tables: the five orders rules ride ONE
    * conditional-agg scan plus a PK group-by and an FK anti-join; the
    * two lineitem rules one more scan + group-by. Mixed by design:
    * lineitem's (orderkey, linenumber) "PK" genuinely collides in this
    * corpus (~14k excess rows) and ~6k priorities fail the format rule,
    * while the zero rows are negative controls — the report must prove
    * both directions. */
  val q254_dq_report: Q = (s, d) => {
    val orders = Tables.orders(s, d)
    audit(orders, "orders", Seq(
        NotNull("o_custkey"),
        InRange("o_totalprice", 1000.0, 400000.0),
        Matches("o_orderpriority", "^[1-3]-"),
        Unique(Seq("o_orderkey")),
        ForeignKey("o_custkey", Tables.customer(s, d), "c_custkey")))
      .unionByName(audit(Tables.lineitem(s, d), "lineitem", Seq(
        InRange("l_quantity", 1.0, 50.0),
        Unique(Seq("l_orderkey", "l_linenumber")))))
      .orderBy(col("rule"))
  }

  val queries: Map[String, Q] = Map(
    "q254_dq_report" -> q254_dq_report,
  )

  val oracles: Map[String, String] = Map(
    "q254_dq_report" ->
      """SELECT 'orders.not_null(o_custkey)' AS rule,
        |       count(CASE WHEN o_custkey IS NULL THEN 1 END) AS violations
        |FROM orders
        |UNION ALL SELECT 'orders.in_range(o_totalprice)',
        |  count(CASE WHEN o_totalprice < 1000 OR o_totalprice > 400000 THEN 1 END)
        |FROM orders
        |UNION ALL SELECT 'orders.matches(o_orderpriority)',
        |  count(CASE WHEN NOT regexp_matches(o_orderpriority, '^[1-3]-') THEN 1 END)
        |FROM orders
        |UNION ALL SELECT 'orders.unique(o_orderkey)',
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS c FROM orders GROUP BY o_orderkey)
        |UNION ALL SELECT 'orders.foreign_key(o_custkey)', count(*)
        |FROM orders o WHERE o_custkey IS NOT NULL
        |  AND NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o.o_custkey)
        |UNION ALL SELECT 'lineitem.in_range(l_quantity)',
        |  count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
        |FROM lineitem
        |UNION ALL SELECT 'lineitem.unique(l_orderkey,l_linenumber)',
        |  CAST(coalesce(sum(c - 1), 0) AS BIGINT)
        |FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)
        |ORDER BY rule""".stripMargin,
  )
}
