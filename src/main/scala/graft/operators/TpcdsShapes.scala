package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** TPC-DS-shaped reporting queries, modeled on the reference's perf corpus
  * (ql/src/test/queries/clientpositive/perf/query*.q) and re-expressed on
  * the TPC-H-ish fixture tables. TPC-H's 22 shapes never exercise these
  * plan patterns; DS does, and so do real reporting workloads:
  *
  *  - q138: multi-channel UNION ALL fact scan          (perf/query76.q, query71.q)
  *  - q139: ROLLUP over a snowflake join               (perf/query27.q, query67.q)
  *  - q140: period-over-period self-join of an agg CTE (perf/query31.q)
  *  - q141: case-banded single-scan multi-aggregate    (perf/query28.q)
  *  - q142: windowed revenue ratio over an aggregate   (perf/query12.q, query20.q)
  *  - q143: INTERSECT of per-channel customer sets     (perf/query38.q)
  *  - q144: monthly pivot columns over a join          (perf/query66.q)
  *  - q145: above-nation-average filter on an agg CTE  (perf/query1.q)
  *  - q153: cumulative channel comparison over a gap-filled
  *          full-outer join of two windowed series          (perf/query51.q)
  *  - q154: count-band HAVING with dimension join-back   (perf/query34.q, query46.q)
  *
  * Scale shapes: every fact scan joins dims that broadcast (nation/region/
  * part slices), aggregates are two-phase (map-side partials), the UNION
  * branches scan independently (no shuffle until the final agg), and the
  * self-joins/windows operate on already-aggregated slivers (group counts,
  * not fact rows). All money math is decimal-exact until the final cast —
  * the oracle-parity contract used repo-wide.
  */
object TpcdsShapes {

  private def dsum(c: Column, scale: Int = 2) =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  private def revenue(c: Column = col("l_extendedprice"), d: Column = col("l_discount")) =
    (c * (lit(1.0) - d)).cast(DecimalType(25, 6))

  /** DS query76-shape: each channel is an independently scanned+filtered
    * fact branch with its own literal tag; UNION ALL feeds one final agg.
    * At 100 TB the branches are separate scans with map-side partial aggs —
    * no shuffle crosses channels until the (tiny) final group-by. */
  val q138_ds_channel_union: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    def branch(cond: Column, label: String): DataFrame =
      li.filter(cond)
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .select(lit(label).as("channel"),
                year(col("o_orderdate")).as("sales_year"),
                col("l_extendedprice"))
    branch(col("l_returnflag") === "R", "returns")
      .unionAll(branch(col("l_returnflag") =!= "R", "sales"))
      .groupBy(col("channel"), col("sales_year"))
      .agg(count(lit(1)).as("n_items"),
           dsum(col("l_extendedprice")).as("ext_price"))
      .orderBy(col("channel"), col("sales_year"))
  }

  /** DS query27-shape: rollup over a snowflake join (fact -> orders ->
    * customer -> nation -> region), hierarchy totals + grouping_id in one
    * Expand pass. Dims broadcast; the rollup replicates only grouping
    * columns, not the fact payload. */
  val q139_ds_rollup_report: Q = (s, d) => {
    // spread: one-row-group fixture — the broadcast-join probes +
    // Expand + partial agg otherwise run on ONE task (no-op at scale)
    Tables.spread(Tables.lineitem(s, d), col("l_orderkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(revenue(), 6).as("rev"),
           count(lit(1)).as("n_items"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  /** DS query31-shape: per-(nation, year) growth ratios. DS spells this
    * as a self-join of the aggregated CTE; that plan scans and joins the
    * FACT tables once per branch (Catalyst reuses exchanges only when AQE
    * later proves the subtrees identical). The Spark-first spelling is
    * lag() over the aggregated sliver — one fact scan, and the window
    * partitions hold only |years| rows per nation. Semantically identical
    * to the self-join (a year-1 row exists iff it is the immediately
    * preceding existing year), which the oracle proves by keeping the
    * self-join formulation. */
  val q140_ds_yoy: Q = (s, d) => {
    val byYear = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(revenue()).as("rev"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("o_year"))
    byYear
      .withColumn("p_year", lag(col("o_year"), 1).over(w))
      .withColumn("p_rev", lag(col("rev"), 1).over(w))
      .filter(col("p_year") === col("o_year") - 1)
      .select(col("n_name"), col("o_year"),
              col("rev").cast("double").as("rev"),
              (col("rev").cast("double") / col("p_rev").cast("double")).as("yoy_ratio"))
      .orderBy(col("n_name"), col("o_year"))
  }

  /** DS query28-shape: one fact scan, parallel aggregates over disjoint
    * value bands via conditional aggregation (the declarative form of
    * DS's six cross-joined single-band subqueries — same semantics, one
    * scan instead of six). */
  val q141_ds_case_bands: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def band(lo: Double, hi: Double, tag: String) = Seq(
      count(when(col("l_quantity") >= lo && col("l_quantity") < hi, 1))
        .as(s"${tag}_cnt"),
      sum(when(col("l_quantity") >= lo && col("l_quantity") < hi,
               col("l_extendedprice")).cast(DecimalType(25, 2)))
        .cast("double").as(s"${tag}_price"),
      countDistinct(when(col("l_quantity") >= lo && col("l_quantity") < hi,
                         col("l_partkey"))).as(s"${tag}_parts"))
    val aggs = band(0, 10, "b1") ++ band(10, 20, "b2") ++
               band(20, 35, "b3") ++ band(35, 51, "b4")
    li.agg(aggs.head, aggs.tail: _*)
  }

  /** DS query12-shape: revenue per item within a category slice, plus its
    * share of the brand's total via a window over the aggregate. The
    * window partitions the post-agg sliver by brand — bounded partitions
    * (items per brand), not fact rows. */
  val q142_ds_revenue_ratio: Q = (s, d) => {
    val agg = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(col("p_type").isin("ECONOMY", "STANDARD", "PROMO"))
      .groupBy(col("p_brand"), col("p_type"), col("p_partkey"))
      .agg(sum(revenue()).as("itemrev"))
    agg.select(col("p_brand"), col("p_type"), col("p_partkey"),
        col("itemrev").cast("double").as("itemrevenue"),
        (col("itemrev").cast("double") * 100.0 /
          sum(col("itemrev")).over(Window.partitionBy(col("p_brand"))).cast("double"))
          .as("revenueratio"))
      .orderBy(col("p_brand"), col("p_type"), col("p_partkey"))
  }

  /** DS query38-shape: customers active in every channel — INTERSECT of
    * per-channel key sets, counted. Each branch reduces to distinct keys
    * before the intersect, so set ops run on key slivers. */
  val q143_ds_cross_channel: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val y96 = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey"))
    val y97 = o.filter(year(col("o_orderdate")) === 1997).select(col("o_custkey"))
    val returned = li.filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"))
    y96.intersect(y97).intersect(returned)
      .agg(count(lit(1)).as("n_loyal"))
  }

  /** DS query66-shape: month columns pivoted out of one pass over the
    * fact join (conditional sums), per nation for one year. */
  val q144_ds_monthly_pivot: Q = (s, d) => {
    def m(mm: Int, tag: String) =
      sum(when(month(col("o_orderdate")) === mm, revenue()))
        .cast("double").as(s"${tag}_rev")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("n_name"))
      .agg(m(1, "jan"), m(2, "feb"), m(3, "mar"),
           m(4, "apr"), m(5, "may"), m(6, "jun"),
           dsum(revenue(), 6).as("total_rev"))
      .orderBy(col("n_name"))
  }

  /** DS query1-shape: per-customer return totals, kept when above 1.2x
    * their nation's average. The window average runs over the aggregated
    * per-customer sliver; the comparison multiplies through by the group
    * count so both sides stay exact-decimal-derived doubles (decimal AVG
    * scale rules differ across engines; SUM does not). */
  val q145_ds_returns_above_avg: Q = (s, d) => {
    val totals = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_nationkey"))
      .agg(sum(revenue()).as("ret"))
    val w = Window.partitionBy(col("c_nationkey"))
    totals
      .withColumn("nation_sum", sum(col("ret")).over(w))
      .withColumn("nation_n", count(lit(1)).over(w))
      .filter(col("ret").cast("double") * col("nation_n") >
              lit(1.2) * col("nation_sum").cast("double"))
      .select(col("c_custkey"), col("c_name"),
              col("ret").cast("double").as("return_total"))
      .orderBy(col("return_total").desc, col("c_custkey"))
      .limit(100)
  }

  /** DS query51-shape: two channels' cumulative series, full-outer-joined
    * on (key, date), gap-filled with a running max (cumulative sums are
    * nondecreasing), then compared. Every window partitions on the
    * high-cardinality customer key — bounded partitions at any scale.
    * Output is the distribution of ahead-day counts, so the result stays
    * tiny while the full comparison runs distributed. */
  val q153_ds_cumulative_channels: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def channel(cond: Column, cumName: String): DataFrame = o.filter(cond)
      .groupBy(col("o_custkey").as("ck"), col("o_orderdate").as("dt"))
      .agg(sum(col("o_totalprice").cast(DecimalType(25, 2))).as("day_amt"))
      .select(col("ck"), col("dt"),
        sum(col("day_amt")).over(Window.partitionBy(col("ck")).orderBy(col("dt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).as(cumName))
    val hi = channel(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "cum_hi")
    val lo = channel(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "cum_lo")
    val joined = hi.as("h").join(lo.as("l"),
        col("h.ck") === col("l.ck") && col("h.dt") === col("l.dt"), "full_outer")
      .select(coalesce(col("h.ck"), col("l.ck")).as("ck"),
              coalesce(col("h.dt"), col("l.dt")).as("dt"),
              col("cum_hi"), col("cum_lo"))
    val fillW = Window.partitionBy(col("ck")).orderBy(col("dt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    joined
      .withColumn("hi_f", max(col("cum_hi")).over(fillW))
      .withColumn("lo_f", max(col("cum_lo")).over(fillW))
      .filter(col("hi_f") > col("lo_f"))
      .groupBy(col("ck")).agg(count(lit(1)).as("n_ahead"))
      .groupBy(col("n_ahead")).agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_ahead"))
  }

  /** DS query34-shape: customers whose order count in a year falls in a
    * band, joined back to the dimension for attributes. The HAVING band
    * runs on the aggregated sliver; the join-back is broadcast-sized. */
  val q154_ds_count_band: Q = (s, d) => {
    val counts = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders").between(2, 4))
    counts.join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"), col("n_orders"))
      .orderBy(col("n_orders").desc, col("c_custkey"))
      .limit(50)
  }

  /** DS query47-shape: monthly revenue vs the group's period average,
    * ranked by deviation. The comparison multiplies through by the month
    * count (sum x n instead of avg — decimal AVG scale rules differ
    * across engines, SUM does not), and the deviation rank carries a
    * deterministic tiebreak. Windows run over the (nation x month)
    * aggregate sliver. */
  val q155_ds_monthly_deviation: Q = (s, d) => {
    val monthly = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .filter(year(col("o_orderdate")) === 1997)
      .groupBy(col("n_name"), month(col("o_orderdate")).as("mo"))
      .agg(sum(revenue()).as("rev"))
    val w = Window.partitionBy(col("n_name"))
    monthly
      .withColumn("year_sum", sum(col("rev")).over(w))
      .withColumn("n_months", count(lit(1)).over(w))
      .withColumn("dev_ratio",
        col("rev").cast("double") * col("n_months") / col("year_sum").cast("double"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("n_name"))
          .orderBy(abs(col("dev_ratio") - 1.0).desc, col("mo"))))
      .filter(col("rk") <= 3)
      .select(col("n_name"), col("mo"), col("rev").cast("double").as("rev"),
              col("dev_ratio"), col("rk"))
      .orderBy(col("n_name"), col("rk"))
  }

  /** DS query88/query90-shape: independent scalar aggregates ("lanes")
    * cross-joined into one row, plus a lane ratio. Each lane is its own
    * filtered scan+agg reduced to a single row, so the cross joins are
    * 1x1 — the one place a cross join is the RIGHT plan. DS spells q28/
    * q88 this way; the conditional-aggregate spelling (q141) is the
    * one-scan alternative, and having both oracle-checked pins that the
    * two formulations agree. */
  val q156_ds_scalar_lanes: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def lane(lo: Int, hi: Int, name: String): DataFrame =
      li.filter(col("l_quantity") >= lo && col("l_quantity") < hi)
        .agg(count(lit(1)).as(name))
    lane(0, 10, "lane1").crossJoin(lane(10, 20, "lane2"))
      .crossJoin(lane(20, 35, "lane3")).crossJoin(lane(35, 51, "lane4"))
      .withColumn("small_large_ratio",
        col("lane1").cast("double") / col("lane4").cast("double"))
  }

  val queries: Map[String, Q] = Map(
    "q138_ds_channel_union" -> q138_ds_channel_union,
    "q139_ds_rollup_report" -> q139_ds_rollup_report,
    "q140_ds_yoy" -> q140_ds_yoy,
    "q141_ds_case_bands" -> q141_ds_case_bands,
    "q142_ds_revenue_ratio" -> q142_ds_revenue_ratio,
    "q143_ds_cross_channel" -> q143_ds_cross_channel,
    "q144_ds_monthly_pivot" -> q144_ds_monthly_pivot,
    "q145_ds_returns_above_avg" -> q145_ds_returns_above_avg,
    "q153_ds_cumulative_channels" -> q153_ds_cumulative_channels,
    "q154_ds_count_band" -> q154_ds_count_band,
    "q155_ds_monthly_deviation" -> q155_ds_monthly_deviation,
    "q156_ds_scalar_lanes" -> q156_ds_scalar_lanes,
  )

  val oracles: Map[String, String] = Map(
    "q138_ds_channel_union" ->
      """SELECT channel, sales_year, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS ext_price
        |FROM (
        |  SELECT 'returns' AS channel, CAST(year(o_orderdate) AS INT) AS sales_year,
        |         l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  UNION ALL
        |  SELECT 'sales', CAST(year(o_orderdate) AS INT), l_extendedprice
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag <> 'R')
        |GROUP BY channel, sales_year ORDER BY channel, sales_year""".stripMargin,
    "q139_ds_rollup_report" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS rev,
        |  COUNT(1) AS n_items,
        |  GROUPING(r_name, n_name) AS gid
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q140_ds_yoy" ->
      """WITH by_year AS (
        |  SELECT n_name, CAST(year(o_orderdate) AS INT) AS o_year,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev
        |  FROM lineitem
        |    JOIN orders   ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation   ON c_nationkey = n_nationkey
        |  GROUP BY n_name, year(o_orderdate))
        |SELECT cur.n_name, cur.o_year,
        |  CAST(cur.rev AS DOUBLE) AS rev,
        |  CAST(cur.rev AS DOUBLE) / CAST(prev.rev AS DOUBLE) AS yoy_ratio
        |FROM by_year cur JOIN by_year prev
        |  ON cur.n_name = prev.n_name AND cur.o_year = prev.o_year + 1
        |ORDER BY cur.n_name, cur.o_year""".stripMargin,
    "q141_ds_case_bands" ->
      """SELECT
        |  COUNT(CASE WHEN l_quantity >= 0 AND l_quantity < 10 THEN 1 END) AS b1_cnt,
        |  CAST(SUM(CAST(CASE WHEN l_quantity >= 0 AND l_quantity < 10 THEN l_extendedprice END AS DECIMAL(25,2))) AS DOUBLE) AS b1_price,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 0 AND l_quantity < 10 THEN l_partkey END) AS b1_parts,
        |  COUNT(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1 END) AS b2_cnt,
        |  CAST(SUM(CAST(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN l_extendedprice END AS DECIMAL(25,2))) AS DOUBLE) AS b2_price,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN l_partkey END) AS b2_parts,
        |  COUNT(CASE WHEN l_quantity >= 20 AND l_quantity < 35 THEN 1 END) AS b3_cnt,
        |  CAST(SUM(CAST(CASE WHEN l_quantity >= 20 AND l_quantity < 35 THEN l_extendedprice END AS DECIMAL(25,2))) AS DOUBLE) AS b3_price,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 20 AND l_quantity < 35 THEN l_partkey END) AS b3_parts,
        |  COUNT(CASE WHEN l_quantity >= 35 AND l_quantity < 51 THEN 1 END) AS b4_cnt,
        |  CAST(SUM(CAST(CASE WHEN l_quantity >= 35 AND l_quantity < 51 THEN l_extendedprice END AS DECIMAL(25,2))) AS DOUBLE) AS b4_price,
        |  COUNT(DISTINCT CASE WHEN l_quantity >= 35 AND l_quantity < 51 THEN l_partkey END) AS b4_parts
        |FROM lineitem""".stripMargin,
    "q142_ds_revenue_ratio" ->
      """WITH agg AS (
        |  SELECT p_brand, p_type, p_partkey,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS itemrev
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    AND p_type IN ('ECONOMY', 'STANDARD', 'PROMO')
        |  GROUP BY p_brand, p_type, p_partkey)
        |SELECT p_brand, p_type, p_partkey,
        |  CAST(itemrev AS DOUBLE) AS itemrevenue,
        |  CAST(itemrev AS DOUBLE) * 100 /
        |    CAST(SUM(itemrev) OVER (PARTITION BY p_brand) AS DOUBLE) AS revenueratio
        |FROM agg ORDER BY p_brand, p_type, p_partkey""".stripMargin,
    "q143_ds_cross_channel" ->
      """SELECT COUNT(1) AS n_loyal FROM (
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997
        |  INTERSECT
        |  SELECT o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R')""".stripMargin,
    "q144_ds_monthly_pivot" ->
      """SELECT n_name,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 1 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS jan_rev,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 2 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS feb_rev,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 3 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS mar_rev,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 4 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS apr_rev,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 5 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS may_rev,
        |  CAST(SUM(CASE WHEN month(o_orderdate) = 6 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END) AS DOUBLE) AS jun_rev,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_rev
        |FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey
        |WHERE year(o_orderdate) = 1997
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q145_ds_returns_above_avg" ->
      """WITH totals AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS ret
        |  FROM lineitem
        |    JOIN orders   ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY c_custkey, c_name, c_nationkey),
        |win AS (
        |  SELECT c_custkey, c_name, ret,
        |         SUM(ret)  OVER (PARTITION BY c_nationkey) AS nation_sum,
        |         COUNT(1)  OVER (PARTITION BY c_nationkey) AS nation_n
        |  FROM totals)
        |SELECT c_custkey, c_name, CAST(ret AS DOUBLE) AS return_total
        |FROM win
        |WHERE CAST(ret AS DOUBLE) * nation_n > 1.2 * CAST(nation_sum AS DOUBLE)
        |ORDER BY return_total DESC, c_custkey LIMIT 100""".stripMargin,
    "q153_ds_cumulative_channels" ->
      """WITH hi AS (
        |  SELECT o_custkey AS ck, o_orderdate AS dt,
        |    SUM(SUM(CAST(o_totalprice AS DECIMAL(25,2))))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |            ROWS UNBOUNDED PRECEDING) AS cum_hi
        |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |  GROUP BY o_custkey, o_orderdate),
        |lo AS (
        |  SELECT o_custkey AS ck, o_orderdate AS dt,
        |    SUM(SUM(CAST(o_totalprice AS DECIMAL(25,2))))
        |      OVER (PARTITION BY o_custkey ORDER BY o_orderdate
        |            ROWS UNBOUNDED PRECEDING) AS cum_lo
        |  FROM orders WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |  GROUP BY o_custkey, o_orderdate),
        |j AS (
        |  SELECT COALESCE(hi.ck, lo.ck) AS ck, COALESCE(hi.dt, lo.dt) AS dt,
        |         cum_hi, cum_lo
        |  FROM hi FULL OUTER JOIN lo ON hi.ck = lo.ck AND hi.dt = lo.dt),
        |f AS (
        |  SELECT ck,
        |    MAX(cum_hi) OVER (PARTITION BY ck ORDER BY dt ROWS UNBOUNDED PRECEDING) AS hi_f,
        |    MAX(cum_lo) OVER (PARTITION BY ck ORDER BY dt ROWS UNBOUNDED PRECEDING) AS lo_f
        |  FROM j),
        |per_cust AS (
        |  SELECT ck, COUNT(1) AS n_ahead FROM f WHERE hi_f > lo_f GROUP BY ck)
        |SELECT n_ahead, COUNT(1) AS n_customers
        |FROM per_cust GROUP BY n_ahead ORDER BY n_ahead""".stripMargin,
    "q154_ds_count_band" ->
      """SELECT c_custkey, c_name, c_mktsegment, n_orders FROM (
        |  SELECT o_custkey, COUNT(1) AS n_orders
        |  FROM orders WHERE year(o_orderdate) = 1997
        |  GROUP BY o_custkey
        |  HAVING COUNT(1) BETWEEN 2 AND 4) t
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY n_orders DESC, c_custkey LIMIT 50""".stripMargin,
    "q155_ds_monthly_deviation" ->
      """WITH monthly AS (
        |  SELECT n_name, CAST(month(o_orderdate) AS INT) AS mo,
        |         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS rev
        |  FROM lineitem
        |    JOIN orders   ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation   ON c_nationkey = n_nationkey
        |  WHERE year(o_orderdate) = 1997
        |  GROUP BY n_name, month(o_orderdate)),
        |win AS (
        |  SELECT n_name, mo, CAST(rev AS DOUBLE) AS rev,
        |    CAST(rev AS DOUBLE) * COUNT(1) OVER (PARTITION BY n_name) /
        |      CAST(SUM(rev) OVER (PARTITION BY n_name) AS DOUBLE) AS dev_ratio
        |  FROM monthly),
        |ranked AS (
        |  SELECT n_name, mo, rev, dev_ratio,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name
        |      ORDER BY abs(dev_ratio - 1.0) DESC, mo) AS INT) AS rk
        |  FROM win)
        |SELECT n_name, mo, rev, dev_ratio, rk FROM ranked WHERE rk <= 3
        |ORDER BY n_name, rk""".stripMargin,
    "q156_ds_scalar_lanes" ->
      """SELECT l1.lane1, l2.lane2, l3.lane3, l4.lane4,
        |  CAST(l1.lane1 AS DOUBLE) / CAST(l4.lane4 AS DOUBLE) AS small_large_ratio
        |FROM
        |  (SELECT COUNT(1) AS lane1 FROM lineitem WHERE l_quantity >= 0  AND l_quantity < 10) l1,
        |  (SELECT COUNT(1) AS lane2 FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20) l2,
        |  (SELECT COUNT(1) AS lane3 FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 35) l3,
        |  (SELECT COUNT(1) AS lane4 FROM lineitem WHERE l_quantity >= 35 AND l_quantity < 51) l4""".stripMargin,
  )
}
