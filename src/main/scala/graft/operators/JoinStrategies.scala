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

  /** Key-skew diagnostic — the report an operator reads BEFORE choosing
    * salting/broadcast/AQE settings for a 100 TB join (the decision the
    * reference bakes into hive.skewjoin.key / SkewJoinOptimizer.java
    * thresholds). One group-by per audited key builds the per-key count
    * sliver; the top-share numbers come off a 10-row sorted head of that
    * sliver, never the fact table. Shares are integer parts-per-million
    * (floor), so the row is bit-stable across engines. */
  val q252_skew_report: Q = (s, d) => {
    def profile(df: org.apache.spark.sql.DataFrame, key: String, name: String) = {
      val cnts = df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      val top = cnts.orderBy(col("cnt").desc, col(key)).limit(10)
        .agg(max(col("cnt")).as("top1"), sum(col("cnt")).as("top10"))
      cnts.agg(sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"))
        .crossJoin(broadcast(top))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
                // `div`, not `/`: the ppm must stay an exact integer
                expr("top1 * 1000000 div n_rows").as("top1_ppm"),
                expr("top10 * 1000000 div n_rows").as("top10_ppm"))
    }
    profile(Tables.lineitem(s, d), "l_partkey", "lineitem.l_partkey")
      .unionByName(profile(Tables.orders(s, d), "o_custkey", "orders.o_custkey"))
      .unionByName(profile(Tables.events(s, d), "user_id", "events.user_id"))
      .orderBy(col("key_name"))
  }

  val queries: Map[String, Q] = Map(
    "q194_sortmerge_join" -> q194_sortmerge_join,
    "q195_salted_skew_join" -> q195_salted_skew_join,
    "q252_skew_report" -> q252_skew_report,
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
    "q252_skew_report" -> {
      def lane(table: String, key: String) =
        s"""(WITH c AS (SELECT $key AS k, count(*) AS cnt FROM $table GROUP BY 1),
           |  t AS (SELECT max(cnt) AS top1, CAST(sum(cnt) AS BIGINT) AS top10 FROM
           |          (SELECT cnt FROM c ORDER BY cnt DESC, k LIMIT 10)),
           |  a AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_rows, count(*) AS n_keys FROM c)
           |SELECT '$table.$key' AS key_name, a.n_rows, a.n_keys,
           |  CAST(t.top1 * 1000000 // a.n_rows AS BIGINT) AS top1_ppm,
           |  CAST(t.top10 * 1000000 // a.n_rows AS BIGINT) AS top10_ppm
           |FROM a CROSS JOIN t)""".stripMargin
      Seq(lane("lineitem", "l_partkey"), lane("orders", "o_custkey"),
          lane("events", "user_id")).mkString("\nUNION ALL\n") +
        "\nORDER BY key_name"
    },
  )
}
