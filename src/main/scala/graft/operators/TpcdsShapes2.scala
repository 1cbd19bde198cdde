package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Second slice of TPC-DS-shaped plan patterns (reference perf corpus,
  * ql/src/test/queries/clientpositive/perf/query*.q), re-expressed on the
  * TPC-H-ish fixture tables. Complements [[TpcdsShapes]] with the patterns
  * that slice did not exercise:
  *
  *  - q157: aligned-week self-join ratio pivot            (perf/query2.q, query59.q)
  *  - q158: per-key average sliver joined back to the fact (perf/query32.q, query92.q)
  *  - q159: coefficient-of-variation month-over-month join (perf/query39.q)
  *  - q160: best/worst rank-to-rank join                   (perf/query44.q)
  *  - q161: equal-share band filter across lanes           (perf/query58.q, query83.q)
  *  - q162: rank within rollup hierarchy levels            (perf/query36.q, query70.q)
  *  - q163: fact left-joined to a filtered fact aggregate  (perf/query93.q, query80.q)
  *  - q164: chained fact-to-fact repeat-purchase join      (perf/query17.q, query25.q, query29.q)
  *  - q165: derived-measure band pivot (ship latency)      (perf/query62.q, query99.q, query50.q)
  *  - q166: before/after pivot-date ratio band             (perf/query21.q, query40.q)
  *  - q170: double semi-join + scalar spend threshold      (perf/query23.q)
  *  - q171: iceberg — INTERSECT gate + scalar avg + rollup (perf/query14.q)
  *  - q172: channel sales/returns full-outer + rollup      (perf/query77.q, query5.q)
  *  - q173: date-offset non-equi self join                 (perf/query72.q)
  *  - q174: aggregate-of-aggregate spend histogram         (perf/query54.q)
  *  - q175: per-row EXISTS + NOT EXISTS activity profile   (perf/query35.q, query69.q)
  *  - q202: year-over-year growth ratio across channels    (perf/query4.q, query11.q, query74.q)
  *  - q203: channel-overlap full-outer distinct-key counts (perf/query97.q)
  *  - q204: per-group outlier vs 1.2x group average        (perf/query30.q, query81.q)
  *  - q210: chained EXCEPT over distinct-key channel sets  (perf/query87.q, query38.q)
  *  - q219: top-N by return-rate rank on two measures      (perf/query49.q)
  *  - q220: year-over-year net-sales decline per channel   (perf/query75.q)
  *  - q221: time-bucket census in one row                  (perf/query88.q)
  *  - q222: order-frequency band customer census           (perf/query34.q, query73.q)
  *  - q223: cross-channel cumulative dominance             (perf/query51.q)
  *  - q228: cross-channel QoQ growth comparison            (perf/query31.q)
  *  - q250: member revenue below half the group average    (perf/query65.q)
  *
  * Scale notes: every sliver the patterns join back to the fact is keyed on
  * a dimension-cardinality column (part, supplier, brand, week), so the
  * second join is broadcast- or at worst dim-shuffle-sized; the fact is
  * scanned once per branch with map-side partial aggregation; windows run
  * over aggregate slivers, never raw fact rows. Money math follows the
  * repo-wide oracle-parity contract (exact decimal until one final cast to
  * double; comparisons multiply through instead of dividing).
  */
object TpcdsShapes2 {

  private def dsum(c: Column, scale: Int = 2) =
    sum(c.cast(DecimalType(25, scale))).cast("double")

  private def revenue(c: Column = col("l_extendedprice"), d: Column = col("l_discount")) =
    (c * (lit(1.0) - d)).cast(DecimalType(25, 6))

  /** DS query2/query59-shape: revenue pivoted by day-of-week per week
    * sequence, the series self-joined 52 weeks apart, per-weekday ratios.
    * The week sequence is days-since-epoch div 7 (DS's d_week_seq); the
    * self-join runs on the weekly sliver (|weeks| rows), not orders. */
  val q157_ds_week_ratio: Q = (s, d) => {
    val days = datediff(to_date(col("o_orderdate")), lit("1996-01-01").cast("date"))
    val weekly = Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .withColumn("wk", floor(days / 7).cast("long"))
      .withColumn("dow", days % 7)
      .groupBy(col("wk"))
      .agg(
        sum(when(col("dow") === 0, col("o_totalprice")).cast(DecimalType(25, 2)))
          .cast("double").as("d0"),
        (1 to 6).map(i =>
          sum(when(col("dow") === i, col("o_totalprice")).cast(DecimalType(25, 2)))
            .cast("double").as(s"d$i")): _*)
    val cur = weekly.as("c")
    val nxt = weekly.as("n")
    cur.join(nxt, col("n.wk") === col("c.wk") + 52)
      .select(col("c.wk").as("wk") +:
        (0 to 6).map(i => (col(s"n.d$i") / col(s"c.d$i")).as(s"r$i")): _*)
      .orderBy(col("wk"))
  }

  /** DS query32/query92-shape ("excess discount"): rows whose discount
    * exceeds 1.3x their part's average, summed per brand. The per-part
    * average is an aggregate sliver (|parts| rows) joined back to the
    * fact on its own key; the comparison multiplies through by the group
    * count so both sides stay exact-decimal-derived. */
  val q158_ds_excess_discount: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(count(lit(1)).as("n_part"),
           sum(col("l_discount").cast(DecimalType(25, 6))).as("disc_sum"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_discount") * col("n_part") >
              lit(1.3) * col("disc_sum").cast("double"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
           dsum(col("l_extendedprice")).as("excess_price"))
      .orderBy(col("p_brand"))
  }

  /** DS query39-shape: per (brand, month) coefficient of variation of
    * quantity, consecutive months joined where both are volatile. Stats
    * drift in the last float bits across engines, so cov is rounded to 6
    * before the filter and the output (the repo-wide stddev contract). */
  val q159_ds_quantity_cov: Q = (s, d) => {
    val m = Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(year(col("l_shipdate")) === 1996)
      .groupBy(col("p_brand"), month(col("l_shipdate")).as("mo"))
      .agg(stddev(col("l_quantity")).as("sd"), avg(col("l_quantity")).as("mean"),
           count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("p_brand"), col("mo"), round(col("sd") / col("mean"), 6).as("cov"))
    val cur = m.as("c")
    val nxt = m.as("n")
    cur.join(nxt, col("c.p_brand") === col("n.p_brand") && col("n.mo") === col("c.mo") + 1)
      .filter(col("c.cov") > 0.5 && col("n.cov") > 0.5)
      .select(col("c.p_brand").as("p_brand"), col("c.mo").as("mo"),
              col("c.cov").as("cov1"), col("n.cov").as("cov2"))
      .orderBy(col("p_brand"), col("mo"))
  }

  /** DS query44-shape: top-10 best and worst parts by average item
    * revenue, paired rank-to-rank. Both rankings are global windows over
    * the per-part aggregate sliver (|parts| rows — dimension-sized at any
    * fact scale, so the single-partition sort is safe by construction). */
  val q160_ds_best_worst: Q = (s, d) => {
    val stats = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg((dsum(revenue(), 6) / count(lit(1))).as("avgrev"))
    val best = stats
      .withColumn("rk", row_number().over(
        Window.orderBy(col("avgrev").desc, col("l_partkey"))))
      .filter(col("rk") <= 10)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("rk"), col("p_name").as("best_part"))
    val worst = stats
      .withColumn("rk", row_number().over(
        Window.orderBy(col("avgrev").asc, col("l_partkey"))))
      .filter(col("rk") <= 10)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("rk").as("wrk"), col("p_name").as("worst_part"))
    best.join(worst, col("rk") === col("wrk"))
      .select(col("rk"), col("best_part"), col("worst_part"))
      .orderBy(col("rk"))
  }

  /** DS query58/query83-shape: parts whose revenue is evenly spread
    * across the three return-flag lanes (each within 10% of the lane
    * average). DS spells this as a three-way join of per-lane subqueries;
    * the Spark-first spelling is one scan with conditional lane sums —
    * the oracle keeps DS's join form, proving the two agree. Band checks
    * multiply through by 3 instead of dividing by the average. */
  val q161_ds_equal_share: Q = (s, d) => {
    def lane(flag: String) =
      coalesce(sum(when(col("l_returnflag") === flag, revenue())), lit(0))
        .cast("double")
    val lanes = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(lane("A").as("a"), lane("N").as("n"), lane("R").as("r"))
      .withColumn("tot", col("a") + col("n") + col("r"))
    def inBand(c: Column) =
      c * 3 >= lit(0.9) * col("tot") && c * 3 <= lit(1.1) * col("tot")
    lanes
      .filter(inBand(col("a")) && inBand(col("n")) && inBand(col("r")))
      .select(col("l_partkey"), col("a"), col("n"), col("r"), col("tot"))
      .orderBy(col("l_partkey"))
  }

  /** DS query36/query70-shape: margin ratio over a region/nation ROLLUP,
    * ranked WITHIN each hierarchy level (rank partitions on the grouping
    * id plus the parent key, exactly DS's lochierarchy trick). The window
    * runs over the rollup output sliver. */
  val q162_ds_hierarchy_rank: Q = (s, d) => {
    val rolled = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(s, d), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(revenue(), 6).as("rev"), dsum(col("l_extendedprice")).as("base"),
           grouping_id().as("gid"))
      .withColumn("margin", col("rev") / col("base"))
    rolled
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("gid"), when(col("gid") === 0, col("r_name")))
          .orderBy(col("margin").desc, col("r_name"), col("n_name"))))
      .filter(col("rk") <= 3)
      .select(col("gid"), col("r_name"), col("n_name"), col("margin"), col("rk"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  /** DS query93/query80-shape: the fact left-joined to a filtered fact
    * aggregate (returns per order), net amount summed per customer. The
    * returns side reduces to |orders with returns| rows before the join;
    * decimal subtraction stays exact until the final cast. */
  val q163_ds_net_sales: Q = (s, d) => {
    val rets = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .groupBy(col("l_orderkey").as("ret_key"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(25, 2))).as("ret_amt"))
    Tables.orders(s, d)
      .join(rets, col("o_orderkey") === col("ret_key"), "left")
      .withColumn("net", col("o_totalprice").cast(DecimalType(25, 2)) -
                         coalesce(col("ret_amt"), lit(0).cast(DecimalType(25, 2))))
      .groupBy(col("o_custkey"))
      .agg(sum(col("net")).cast("double").as("net_sales"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("net_sales"))
      .orderBy(col("net_sales").desc, col("c_custkey"))
      .limit(100)
  }

  /** DS query17/query25/query29-shape: chained fact-to-fact join — a 1996
    * purchase joined to the same customer re-buying the same part in 1997.
    * The join key (custkey, partkey) is a compound derived on both sides
    * of the fact; output aggregates per brand. */
  val q164_ds_repeat_chain: Q = (s, d) => {
    def sales(yr: Int, qn: String) = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey").as(s"ck_$yr"), col("l_partkey").as(s"pk_$yr"),
              col("l_quantity").as(qn))
    val pairs = sales(1996, "q1").join(sales(1997, "q2"),
      col("ck_1996") === col("ck_1997") && col("pk_1996") === col("pk_1997"))
    pairs
      .join(Tables.part(s, d), col("pk_1996") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_pairs"),
           dsum(col("q1")).as("qty_first"), dsum(col("q2")).as("qty_repeat"))
      .orderBy(col("p_brand"))
  }

  /** DS query62/query99/query50-shape: a measure derived in the join
    * (ship latency in days) banded into pivot columns per order priority —
    * one scan, conditional counts. */
  val q165_ds_latency_pivot: Q = (s, d) => {
    val lat = datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
    def band(cond: Column, name: String) = count(when(cond, 1)).as(name)
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat", lat)
      .groupBy(col("o_orderpriority"))
      .agg(band(col("lat") <= 30, "d30"),
           band(col("lat") > 30 && col("lat") <= 60, "d60"),
           band(col("lat") > 60 && col("lat") <= 90, "d90"),
           band(col("lat") > 90 && col("lat") <= 120, "d120"),
           band(col("lat") > 120, "dmore"))
      .orderBy(col("o_orderpriority"))
  }

  /** DS query21/query40-shape: per-supplier quantity shipped in the 60
    * days before vs after a pivot date, kept when the ratio sits in
    * [2/3, 3/2]. Conditional sums in one scan; the band check multiplies
    * through (2*after <= 3*before etc.) to avoid division. */
  val q166_ds_before_after: Q = (s, d) => {
    val pivotLo = lit("1997-04-02").cast("timestamp")
    val pivotMid = lit("1997-06-01").cast("timestamp")
    val pivotHi = lit("1997-07-31").cast("timestamp")
    def win(lo: Column, hi: Column) =
      sum(when(col("l_shipdate") >= lo && col("l_shipdate") < hi,
               col("l_quantity")).cast(DecimalType(25, 2))).cast("double")
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(win(pivotLo, pivotMid).as("qty_before"),
           win(pivotMid, pivotHi).as("qty_after"))
      .filter(col("qty_before").isNotNull && col("qty_after").isNotNull &&
              col("qty_after") * 2 <= col("qty_before") * 3 &&
              col("qty_before") * 2 <= col("qty_after") * 3)
      .orderBy(col("s_suppkey"))
  }

  /** DS query23-shape: revenue restricted by TWO aggregate-derived
    * filters — frequent parts (semi-join on a HAVING sliver) and
    * best customers (semi-join gated by a scalar threshold off max
    * spend). Both slivers are dimension-cardinality; the scalar is a
    * 1x1 cross join. */
  val q170_ds_double_semi: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val lo = li.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
    val freq = li.groupBy(col("l_partkey").as("fpk"))
      .agg(countDistinct(col("l_orderkey")).as("nord"))
      .filter(col("nord") > 20).select(col("fpk"))
    val spend = lo.groupBy(col("o_custkey").as("sck"))
      .agg(dsum(revenue(), 6).as("sp"))
    val thr = spend.agg((max(col("sp")) * 0.5).as("thr"))
    val best = spend.crossJoin(thr).filter(col("sp") > col("thr")).select(col("sck"))
    lo.join(freq, col("l_partkey") === col("fpk"), "left_semi")
      .join(best, col("o_custkey") === col("sck"), "left_semi")
      .agg(count(lit(1)).as("n_items"), dsum(revenue(), 6).as("total_rev"))
  }

  /** DS query14-shape (iceberg): parts present in ALL three lanes
    * (INTERSECT of distinct key sets), lineitems above a scalar average
    * price, rolled up by brand/type — set op + scalar gate + rollup in
    * one plan. */
  val q171_ds_iceberg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def laneParts(flag: String) =
      li.filter(col("l_returnflag") === flag).select(col("l_partkey")).distinct()
    val common = laneParts("A").intersect(laneParts("N")).intersect(laneParts("R"))
    val avgThr = li.agg((dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"))
    li.join(common, Seq("l_partkey"), "left_semi")
      .crossJoin(avgThr)
      .filter(col("l_extendedprice") > col("avg_price"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .rollup(col("p_brand"), col("p_type"))
      .agg(dsum(revenue(), 6).as("rev"), count(lit(1)).as("n_items"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("p_brand"), col("p_type"))
  }

  /** DS query77-shape: per-channel sales and returns slivers full-outer
    * joined on the channel key, then a ROLLUP grand total over the joined
    * sliver (channels here are order priorities). */
  val q172_ds_channel_profit: Q = (s, d) => {
    val sales = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("sp"))
      .agg(sum(col("o_totalprice").cast(DecimalType(25, 2))).as("sales"))
    val rets = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("rp"))
      .agg(sum(col("l_extendedprice").cast(DecimalType(25, 2))).as("returns"))
    sales.join(rets, col("sp") === col("rp"), "full_outer")
      .select(coalesce(col("sp"), col("rp")).as("channel"),
              col("sales"), col("returns"))
      .rollup(col("channel"))
      .agg(sum(col("sales")).cast("double").as("sales_total"),
           sum(col("returns")).cast("double").as("returns_total"),
           (sum(col("sales")) - sum(col("returns"))).cast("double").as("profit"),
           grouping_id().as("gid"))
      .orderBy(col("gid"), col("channel"))
  }

  /** DS query72-shape: date-offset non-equi self join — follow-up orders
    * by the same customer within 30 days. Equi key (custkey) drives the
    * shuffle; the date band filters inside each (small) customer group. */
  val q173_ds_follow_up: Q = (s, d) => {
    val o1 = Tables.orders(s, d).as("o1")
    val o2 = Tables.orders(s, d).as("o2")
    o1.join(o2,
        col("o1.o_custkey") === col("o2.o_custkey") &&
        col("o2.o_orderdate") > col("o1.o_orderdate") &&
        col("o2.o_orderdate") <= col("o1.o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(year(col("o1.o_orderdate")).as("yr"), month(col("o1.o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_followups"),
           countDistinct(col("o1.o_custkey")).as("n_customers"))
      .orderBy(col("yr"), col("mo"))
  }

  /** DS query54-shape: aggregate-of-aggregate histogram — per-customer
    * revenue bucketed, then customers counted per bucket. Both group-bys
    * run on shrinking slivers (fact -> |customers| -> |buckets|). */
  val q174_ds_spend_histogram: Q = (s, d) => {
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(revenue(), 6).as("spend"))
      .select(floor(col("spend") / 50000).cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("bucket"))
  }

  /** DS query35/query69-shape: per-row EXISTS and NOT EXISTS against two
    * different activity sets (ordered in 1996, no returns in 1997),
    * profiled by segment. Semi + anti joins on the customer key — both
    * activity sets reduce to distinct keys before joining. */
  val q175_ds_profile: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val active96 = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey").as("ak"))
    val returned97 = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")) === 1997)
      .select(col("o_custkey").as("rk"))
    Tables.customer(s, d)
      .join(active96, col("c_custkey") === col("ak"), "left_semi")
      .join(returned97, col("c_custkey") === col("rk"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           dsum(col("c_acctbal")).as("acctbal_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** DS query4/query11/query74-shape: year-over-year growth ratio
    * compared across two channels (channels = order-priority classes).
    * The reference formulates this as a CTE joined to itself four times
    * (one alias per year x channel); re-expressed Spark-first as ONE
    * conditional aggregation — one fact scan, one shuffle, zero joins —
    * because the four "aliases" are just four filtered sums of the same
    * group. (The naive 4-alias join plan was measured: Catalyst pushes
    * each slice filter through the aggregate and re-scans the fact four
    * times.) The oracle keeps the reference's 4-way self-join spelling,
    * so the rewrite is proven equivalent, and the compare multiplies
    * through (u2*s1 > s2*u1) so no division touches the filter. */
  val q202_ds_yoy_growth: Q = (s, d) => {
    def slice(yr: Int, ch: String) =
      sum(when(year(col("o_orderdate")) === yr &&
               (if (ch == "pri") col("o_orderpriority") < "3"
                else col("o_orderpriority") >= "3"),
               col("o_totalprice")).cast(DecimalType(25, 2))).cast("double")
    Tables.orders(s, d)
      .filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy(col("o_custkey").as("custkey"))
      .agg(slice(1996, "std").as("s1"), slice(1997, "std").as("s2"),
           slice(1996, "pri").as("u1"), slice(1997, "pri").as("u2"))
      .filter(col("s1").isNotNull && col("s2").isNotNull &&
              col("u1").isNotNull && col("u2").isNotNull &&
              col("s1") > 0 && col("u1") > 0 &&
              col("u2") * col("s1") > col("s2") * col("u1"))
      .select(col("custkey"),
              round(col("s2") / col("s1"), 6).as("ratio_std"),
              round(col("u2") / col("u1"), 6).as("ratio_pri"))
      .orderBy(col("custkey"))
  }

  /** DS query97-shape: channel-overlap counts — distinct customer sets
    * of two channels FULL OUTER joined on the key, one row of
    * both/left-only/right-only counts. Each side reduces to distinct
    * keys BEFORE the join (customer-cardinality), and the conditional
    * counts are one pass over the joined sliver. */
  val q203_ds_channel_overlap: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val pri = o.filter(col("o_orderpriority") < "3")
      .select(col("o_custkey").as("pk")).distinct()
    val std = o.filter(col("o_orderpriority") >= "3")
      .select(col("o_custkey").as("sk")).distinct()
    pri.join(std, col("pk") === col("sk"), "full_outer")
      .agg(count(when(col("pk").isNotNull && col("sk").isNotNull, 1)).as("both_channels"),
           count(when(col("pk").isNotNull && col("sk").isNull, 1)).as("pri_only"),
           count(when(col("pk").isNull && col("sk").isNotNull, 1)).as("std_only"))
  }

  /** DS query30/query81-shape: per-customer return revenue exceeding
    * 1.2x the average over the customer's nation. The per-customer agg
    * is one fact shuffle; the per-nation stats are a second agg over
    * that sliver joined back on the nation key (25 rows — broadcast);
    * the compare multiplies through the nation count so both sides stay
    * products of exact-decimal-derived doubles. */
  val q204_ds_return_outliers: Q = (s, d) => {
    val perCust = Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(dsum(col("l_extendedprice")).as("ret_rev"))
    val perNation = perCust.groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"),
           sum(col("ret_rev").cast(DecimalType(25, 2))).as("nation_sum"))
    perCust.join(perNation, col("c_nationkey") === col("nk"))
      .filter(col("ret_rev") * col("n_cust") >
              lit(1.2) * col("nation_sum").cast("double"))
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey").as("custkey"), col("n_name"), col("ret_rev"))
      .orderBy(col("custkey"))
  }

  /** DS query87/query38-shape: chained EXCEPT over three distinct-key
    * channel sets, counted. Each operand reduces to distinct customer
    * keys BEFORE the set ops, so the EXCEPT chain (left-anti joins in
    * the plan) runs on customer-cardinality slivers, never fact rows. */
  val q210_ds_except_chain: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val li = Tables.lineitem(s, d)
    val active96 = o.filter(year(col("o_orderdate")) === 1996)
      .select(col("o_custkey")).distinct()
    val returners = li.filter(col("l_returnflag") === "R")
      .join(o.filter(year(col("o_orderdate")) === 1996),
            col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey")).distinct()
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT" &&
                          year(col("o_orderdate")) === 1996)
      .select(col("o_custkey")).distinct()
    active96.except(returners).except(urgent)
      .agg(count(lit(1)).as("n_customers"))
  }

  /** query49-shape (perf/query49.q): per channel, rank items by return
    * RATE on two measures (quantity ratio, currency ratio) and keep items
    * in the top-10 of either rank. The reference spells it as a 3-channel
    * UNION of window subqueries; Spark-first is ONE conditional-agg scan
    * with the windows partitioned by channel — same rows, one fact pass
    * (the DuckDB oracle keeps the reference's UNION spelling, so the gate
    * proves the equivalence). Ratios are a single IEEE division of
    * exact integer sums — bit-stable across engines. */
  val q219_ds_return_ranks: Q = (s, d) => {
    val channels = Seq("1-URGENT", "3-MEDIUM", "5-LOW")
    val sliver = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1996)
      .join(Tables.orders(s, d)
              .filter(col("o_orderpriority").isin(channels: _*))
              .select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority").as("channel"), col("l_partkey"))
      .agg(
        sum(when(col("l_returnflag") === "R", col("l_quantity")).otherwise(0.0))
          .cast("long").as("qty_ret"),
        sum(col("l_quantity")).cast("long").as("qty_tot"),
        sum(when(col("l_returnflag") === "R",
            col("l_extendedprice").cast(DecimalType(25, 2))).otherwise(lit(0.0)))
          .cast(DecimalType(25, 2)).as("amt_ret"),
        sum(col("l_extendedprice").cast(DecimalType(25, 2))).as("amt_tot"))
      .withColumn("qty_ratio", col("qty_ret").cast("double") / col("qty_tot").cast("double"))
      .withColumn("amt_ratio", (col("amt_ret").cast("double")) / col("amt_tot").cast("double"))
    val wq = Window.partitionBy(col("channel"))
      .orderBy(col("qty_ratio").desc, col("l_partkey"))
    val wa = Window.partitionBy(col("channel"))
      .orderBy(col("amt_ratio").desc, col("l_partkey"))
    sliver
      .withColumn("qty_rank", rank().over(wq))
      .withColumn("amt_rank", rank().over(wa))
      .filter(col("qty_rank") <= 10 || col("amt_rank") <= 10)
      .select(col("channel"), col("l_partkey"), col("qty_ret"), col("qty_tot"),
              col("qty_rank"), col("amt_rank"))
      .orderBy(col("channel"), col("l_partkey"))
  }

  /** query75-shape (perf/query75.q): year-over-year NET sales decline per
    * (channel, brand) — net = sold minus returned, this year vs last,
    * kept when the decline is >10%. The 10% threshold is compared
    * multiply-through on integer quantities (qty97 * 10 < qty96 * 9), so
    * no engine ever compares a float. One conditional-agg pass over the
    * fact with the part dimension broadcast. */
  val q220_ds_net_yoy_decline: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.part(s, d).select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
      .withColumn("net_qty",
        when(col("l_returnflag") === "R", -col("l_quantity")).otherwise(col("l_quantity")))
    li.groupBy(col("o_orderpriority").as("channel"), col("p_brand"))
      .agg(
        sum(when(year(col("l_shipdate")) === 1996, col("net_qty")).otherwise(0.0))
          .cast("long").as("qty96"),
        sum(when(year(col("l_shipdate")) === 1997, col("net_qty")).otherwise(0.0))
          .cast("long").as("qty97"))
      .filter(col("qty96") > 0 && col("qty97") * 10 < col("qty96") * 9)
      .orderBy(col("channel"), col("p_brand"))
  }

  /** query88-shape (perf/query88.q): the reference counts store traffic
    * in eight half-hour windows as EIGHT separate scalar subqueries and
    * cross-joins the 1x1 results into a single row. Spark-first is ONE
    * conditional-agg scan — eight `count(when(...))` lanes over the same
    * pass; the oracle keeps the reference's 8-subquery spelling, so the
    * gate proves the single-scan plan emits the identical row. At 100 TB
    * the difference is 1 fact scan vs 8. */
  val q221_ds_time_buckets: Q = (s, d) => {
    val views = Tables.events(s, d).filter(col("event_type") === "view")
    val lanes = (0 until 8).map { i =>
      count(when(hour(col("ts")).between(3 * i, 3 * i + 2), lit(1))).as(s"h$i")
    }
    views.agg(lanes.head, lanes.tail: _*)
  }

  /** query34/query73-shape (perf/query34.q): customers whose order count
    * in a year falls in a frequency band, rolled up to a census per
    * (segment, frequency). The fact reduces to a per-customer count
    * sliver FIRST (map-side combinable), the HAVING band shrinks it to
    * the interesting customers, and only that sliver joins the customer
    * dimension. */
  val q222_ds_frequent_buyers: Q = (s, d) => {
    val freq = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"))
      .filter(col("n_orders").between(2, 5))
    freq.join(Tables.customer(s, d),
              col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("n_orders"))
      .agg(count(lit(1)).as("n_cust"))
      .orderBy(col("c_mktsegment"), col("n_orders"))
  }

  /** query51-shape (perf/query51.q): two channels' weekly cumulative
    * sales compared week by week, keeping the weeks where one channel's
    * running total leads. The reference full-outer-joins the two channel
    * series before windowing; Spark-first folds both channels into ONE
    * conditional aggregation of a single fact pass (a week missing from
    * a channel contributes 0, exactly what the reference's COALESCE
    * does), then runs both running sums over the tiny weekly sliver.
    * Quantities stay integer so the cumulative compare is exact. */
  val q223_ds_cume_channels: Q = (s, d) => {
    val weekly = Tables.lineitem(s, d)
      .filter(year(col("l_shipdate")) === 1996)
      .join(Tables.orders(s, d)
              .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
              .select(col("o_orderkey"), col("o_orderpriority")),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(date_trunc("week", col("l_shipdate")).cast("date").as("wk"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT", col("l_quantity")).otherwise(0.0))
          .cast("long").as("qa"),
        sum(when(col("o_orderpriority") === "5-LOW", col("l_quantity")).otherwise(0.0))
          .cast("long").as("qb"))
    val w = Window.orderBy(col("wk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    weekly
      .select(col("wk"), sum(col("qa")).over(w).as("urgent_cume"),
              sum(col("qb")).over(w).as("low_cume"))
      .filter(col("urgent_cume") > col("low_cume"))
      .orderBy(col("wk"))
  }

  /** query31-shape (perf/query31.q): regions where one channel's
    * quarter-over-quarter growth outpaces the other's across consecutive
    * quarters. Both channels come out of ONE conditional-agg pass per
    * (nation, quarter); the consecutive-quarter self-join runs on that
    * nation x 4 sliver, never on orders rows; the cross-channel growth
    * compare multiplies through on integer counts (ua2*lo1 > lo2*ua1),
    * so no engine ever divides. */
  val q228_ds_growth_compare: Q = (s, d) => {
    val sliver = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996 &&
              col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").as("nation"), quarter(col("o_orderdate")).as("qtr"))
      .agg(
        count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("n_urgent"),
        count(when(col("o_orderpriority") === "5-LOW", lit(1))).as("n_low"))
    sliver.as("a").join(sliver.as("b"),
        col("a.nation") === col("b.nation") && col("b.qtr") === col("a.qtr") + 1)
      .where(col("a.n_urgent") > 0 && col("a.n_low") > 0 &&
             col("b.n_urgent") * col("a.n_low") > col("b.n_low") * col("a.n_urgent"))
      .select(col("a.nation").as("nation"), col("a.qtr").as("qtr_from"),
              col("a.n_urgent").as("ua1"), col("b.n_urgent").as("ua2"),
              col("a.n_low").as("lo1"), col("b.n_low").as("lo2"))
      .orderBy(col("nation"), col("qtr_from"))
  }

  /** DS query65-shape (perf/query65.q): per-group member revenue below
    * half the group average — store×item there, priority×customer here.
    * The fact is scanned once into the (priority, customer) aggregate
    * sliver; the per-priority total/count is a 5-row broadcast; the
    * "below average" gate multiplies through (rev·n·2 < tot) in exact
    * decimal, so no engine ever computes a float average. */
  val q250_ds_low_revenue: Q = (s, d) => {
    val ck = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
    val pa = ck.groupBy(col("o_orderpriority"))
      .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n"))
    ck.join(broadcast(pa), Seq("o_orderpriority"))
      .filter(col("rev") * col("n") * 2 < col("tot"))
      .select(col("o_orderpriority"), col("o_custkey"),
              col("rev").cast("double").as("rev"))
      .orderBy(col("o_orderpriority"), col("o_custkey"))
  }

  val queries: Map[String, Q] = Map(
    "q250_ds_low_revenue" -> q250_ds_low_revenue,
    "q174_ds_spend_histogram" -> q174_ds_spend_histogram,
    "q210_ds_except_chain" -> q210_ds_except_chain,
    "q228_ds_growth_compare" -> q228_ds_growth_compare,
    "q221_ds_time_buckets" -> q221_ds_time_buckets,
    "q222_ds_frequent_buyers" -> q222_ds_frequent_buyers,
    "q223_ds_cume_channels" -> q223_ds_cume_channels,
    "q219_ds_return_ranks" -> q219_ds_return_ranks,
    "q220_ds_net_yoy_decline" -> q220_ds_net_yoy_decline,
    "q202_ds_yoy_growth" -> q202_ds_yoy_growth,
    "q203_ds_channel_overlap" -> q203_ds_channel_overlap,
    "q204_ds_return_outliers" -> q204_ds_return_outliers,
    "q175_ds_profile" -> q175_ds_profile,
    "q170_ds_double_semi" -> q170_ds_double_semi,
    "q171_ds_iceberg" -> q171_ds_iceberg,
    "q172_ds_channel_profit" -> q172_ds_channel_profit,
    "q173_ds_follow_up" -> q173_ds_follow_up,
    "q157_ds_week_ratio" -> q157_ds_week_ratio,
    "q158_ds_excess_discount" -> q158_ds_excess_discount,
    "q159_ds_quantity_cov" -> q159_ds_quantity_cov,
    "q160_ds_best_worst" -> q160_ds_best_worst,
    "q161_ds_equal_share" -> q161_ds_equal_share,
    "q162_ds_hierarchy_rank" -> q162_ds_hierarchy_rank,
    "q163_ds_net_sales" -> q163_ds_net_sales,
    "q164_ds_repeat_chain" -> q164_ds_repeat_chain,
    "q165_ds_latency_pivot" -> q165_ds_latency_pivot,
    "q166_ds_before_after" -> q166_ds_before_after,
  )

  val oracles: Map[String, String] = Map(
    "q250_ds_low_revenue" ->
      """WITH ck AS (
        |  SELECT o_orderpriority, o_custkey,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        |  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1, 2),
        |pa AS (SELECT o_orderpriority, sum(rev) AS tot, count(*) AS n
        |       FROM ck GROUP BY 1)
        |SELECT ck.o_orderpriority, ck.o_custkey, CAST(ck.rev AS DOUBLE) AS rev
        |FROM ck JOIN pa ON ck.o_orderpriority = pa.o_orderpriority
        |WHERE ck.rev * pa.n * 2 < pa.tot
        |ORDER BY ck.o_orderpriority, ck.o_custkey""".stripMargin,
    "q228_ds_growth_compare" ->
      """WITH s AS (
        |  SELECT c_nationkey AS nation, quarter(o_orderdate) AS qtr,
        |    count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        |    count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE year(o_orderdate) = 1996
        |    AND o_orderpriority IN ('1-URGENT', '5-LOW')
        |  GROUP BY 1, 2)
        |SELECT a.nation, CAST(a.qtr AS INT) AS qtr_from,
        |  a.n_urgent AS ua1, b.n_urgent AS ua2, a.n_low AS lo1, b.n_low AS lo2
        |FROM s a JOIN s b ON a.nation = b.nation AND b.qtr = a.qtr + 1
        |WHERE a.n_urgent > 0 AND a.n_low > 0
        |  AND b.n_urgent * a.n_low > b.n_low * a.n_urgent
        |ORDER BY a.nation, qtr_from""".stripMargin,
    // the reference's 8-scalar-subquery cross-join spelling (query88),
    // proving the single-scan conditional-agg plan emits the same row
    "q221_ds_time_buckets" -> {
      val lanes = (0 until 8).map { i =>
        s"""(SELECT count(1) AS h$i FROM events
           |   WHERE event_type = 'view'
           |     AND hour(make_timestamp(epoch_ns(ts) // 1000))
           |         BETWEEN ${3 * i} AND ${3 * i + 2}) t$i""".stripMargin
      }.mkString(",\n")
      s"SELECT * FROM\n$lanes"
    },
    "q222_ds_frequent_buyers" ->
      """WITH f AS (
        |  SELECT o_custkey, count(1) AS n_orders FROM orders
        |  WHERE year(o_orderdate) = 1996
        |  GROUP BY o_custkey HAVING count(1) BETWEEN 2 AND 5)
        |SELECT c_mktsegment, n_orders, count(1) AS n_cust
        |FROM f JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // the reference's full-outer-join-of-channel-series spelling
    // (query51); COALESCE(missing week, 0) == the conditional agg's 0
    "q223_ds_cume_channels" ->
      """WITH li AS (
        |  SELECT CAST(date_trunc('week', l_shipdate) AS DATE) AS wk,
        |         o_orderpriority AS pri, CAST(l_quantity AS BIGINT) AS qty
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(l_shipdate) = 1996
        |    AND o_orderpriority IN ('1-URGENT', '5-LOW')),
        |a AS (SELECT wk, sum(qty) AS q FROM li WHERE pri = '1-URGENT' GROUP BY wk),
        |b AS (SELECT wk, sum(qty) AS q FROM li WHERE pri = '5-LOW' GROUP BY wk),
        |j AS (SELECT COALESCE(a.wk, b.wk) AS wk, COALESCE(a.q, 0) AS qa,
        |             COALESCE(b.q, 0) AS qb
        |      FROM a FULL OUTER JOIN b ON a.wk = b.wk)
        |SELECT wk, urgent_cume, low_cume FROM (
        |  SELECT wk,
        |    CAST(SUM(qa) OVER (ORDER BY wk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS urgent_cume,
        |    CAST(SUM(qb) OVER (ORDER BY wk ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS low_cume
        |  FROM j)
        |WHERE urgent_cume > low_cume ORDER BY wk""".stripMargin,
    // the reference's UNION-of-channel-subqueries spelling, proving the
    // single-scan conditional-agg plan emits the same rows
    "q219_ds_return_ranks" -> {
      def lane(ch: String) =
        s"""SELECT * FROM (
           |  SELECT channel, l_partkey, qty_ret, qty_tot,
           |    rank() OVER (ORDER BY CAST(qty_ret AS DOUBLE) / CAST(qty_tot AS DOUBLE) DESC,
           |                 l_partkey) AS qty_rank,
           |    rank() OVER (ORDER BY CAST(amt_ret AS DOUBLE) / CAST(amt_tot AS DOUBLE) DESC,
           |                 l_partkey) AS amt_rank
           |  FROM base WHERE channel = '$ch')
           |WHERE qty_rank <= 10 OR amt_rank <= 10""".stripMargin
      s"""WITH base AS (
         |  SELECT o_orderpriority AS channel, l_partkey,
         |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END) AS BIGINT) AS qty_ret,
         |    CAST(sum(l_quantity) AS BIGINT) AS qty_tot,
         |    sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(25,2))
         |             ELSE CAST(0 AS DECIMAL(25,2)) END) AS amt_ret,
         |    sum(CAST(l_extendedprice AS DECIMAL(25,2))) AS amt_tot
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
         |    AND year(l_shipdate) = 1996
         |  GROUP BY 1, 2)
         |SELECT channel, l_partkey, qty_ret, qty_tot, qty_rank, amt_rank FROM (
         |  ${lane("1-URGENT")}
         |  UNION ALL
         |  ${lane("3-MEDIUM")}
         |  UNION ALL
         |  ${lane("5-LOW")})
         |ORDER BY channel, l_partkey""".stripMargin
    },
    "q220_ds_net_yoy_decline" ->
      """SELECT o_orderpriority AS channel, p_brand,
        |  CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN net ELSE 0 END) AS BIGINT) AS qty96,
        |  CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN net ELSE 0 END) AS BIGINT) AS qty97
        |FROM (SELECT o_orderpriority, l_shipdate, p_brand,
        |        CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS net
        |      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                    JOIN part ON l_partkey = p_partkey
        |      WHERE year(l_shipdate) IN (1996, 1997))
        |GROUP BY 1, 2
        |HAVING CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN net ELSE 0 END) AS BIGINT) > 0
        |   AND CAST(sum(CASE WHEN year(l_shipdate) = 1997 THEN net ELSE 0 END) AS BIGINT) * 10
        |     < CAST(sum(CASE WHEN year(l_shipdate) = 1996 THEN net ELSE 0 END) AS BIGINT) * 9
        |ORDER BY 1, 2""".stripMargin,
    "q210_ds_except_chain" ->
      """SELECT COUNT(1) AS n_customers FROM (
        |  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R' AND year(o_orderdate) = 1996
        |  EXCEPT
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1996)""".stripMargin,
    "q202_ds_yoy_growth" ->
      """WITH yearly AS (
        |  SELECT o_custkey AS ck, year(o_orderdate) AS yr,
        |    CASE WHEN o_orderpriority < '3' THEN 'pri' ELSE 'std' END AS ch,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS total
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1, 2, 3)
        |SELECT s1.ck AS custkey,
        |  round(s2.total / s1.total, 6) AS ratio_std,
        |  round(u2.total / u1.total, 6) AS ratio_pri
        |FROM yearly s1
        |JOIN yearly s2 ON s1.ck = s2.ck AND s2.yr = 1997 AND s2.ch = 'std'
        |JOIN yearly u1 ON s1.ck = u1.ck AND u1.yr = 1996 AND u1.ch = 'pri'
        |JOIN yearly u2 ON s1.ck = u2.ck AND u2.yr = 1997 AND u2.ch = 'pri'
        |WHERE s1.yr = 1996 AND s1.ch = 'std'
        |  AND s1.total > 0 AND u1.total > 0
        |  AND u2.total * s1.total > s2.total * u1.total
        |ORDER BY custkey""".stripMargin,
    "q203_ds_channel_overlap" ->
      """WITH pri AS (SELECT DISTINCT o_custkey AS pk FROM orders WHERE o_orderpriority < '3'),
        |std AS (SELECT DISTINCT o_custkey AS sk FROM orders WHERE o_orderpriority >= '3')
        |SELECT
        |  COUNT(CASE WHEN pk IS NOT NULL AND sk IS NOT NULL THEN 1 END) AS both_channels,
        |  COUNT(CASE WHEN pk IS NOT NULL AND sk IS NULL THEN 1 END) AS pri_only,
        |  COUNT(CASE WHEN pk IS NULL AND sk IS NOT NULL THEN 1 END) AS std_only
        |FROM pri FULL OUTER JOIN std ON pk = sk""".stripMargin,
    "q204_ds_return_outliers" ->
      """WITH per_cust AS (
        |  SELECT c_custkey, c_nationkey,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS ret_rev
        |  FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1, 2),
        |per_nation AS (
        |  SELECT c_nationkey AS nk, COUNT(1) AS n_cust,
        |    SUM(CAST(ret_rev AS DECIMAL(25,2))) AS nation_sum
        |  FROM per_cust GROUP BY 1)
        |SELECT c_custkey AS custkey, n_name, ret_rev
        |FROM per_cust
        |JOIN per_nation ON c_nationkey = nk
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE ret_rev * n_cust > 1.2 * CAST(nation_sum AS DOUBLE)
        |ORDER BY custkey""".stripMargin,
    "q174_ds_spend_histogram" ->
      """WITH spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1)
        |SELECT CAST(FLOOR(sp / 50000) AS BIGINT) AS bucket, COUNT(1) AS n_customers
        |FROM spend GROUP BY 1 ORDER BY bucket""".stripMargin,
    "q175_ds_profile" ->
      """SELECT c_mktsegment, COUNT(1) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS acctbal_sum
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND year(o_orderdate) = 1996)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |                  WHERE o_custkey = c_custkey AND l_returnflag = 'R'
        |                    AND year(o_orderdate) = 1997)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q170_ds_double_semi" ->
      """WITH freq AS (
        |  SELECT l_partkey FROM lineitem GROUP BY 1
        |  HAVING COUNT(DISTINCT l_orderkey) > 20),
        |spend AS (
        |  SELECT o_custkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS sp
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1),
        |thr AS (SELECT MAX(sp) * 0.5 AS t FROM spend),
        |best AS (SELECT o_custkey FROM spend, thr WHERE sp > t)
        |SELECT COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS total_rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_partkey IN (SELECT l_partkey FROM freq)
        |  AND o_custkey IN (SELECT o_custkey FROM best)""".stripMargin,
    "q171_ds_iceberg" ->
      """WITH common AS (
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
        |  INTERSECT
        |  SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
        |thr AS (
        |  SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) / COUNT(1) AS avg_price
        |  FROM lineitem)
        |SELECT p_brand, p_type,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) AS rev,
        |  COUNT(1) AS n_items,
        |  GROUPING(p_brand, p_type) AS gid
        |FROM lineitem JOIN part ON l_partkey = p_partkey, thr
        |WHERE l_partkey IN (SELECT l_partkey FROM common)
        |  AND l_extendedprice > avg_price
        |GROUP BY ROLLUP (p_brand, p_type)
        |ORDER BY gid, p_brand NULLS FIRST, p_type NULLS FIRST""".stripMargin,
    "q172_ds_channel_profit" ->
      """WITH sales AS (
        |  SELECT o_orderpriority AS sp, SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS sales
        |  FROM orders GROUP BY 1),
        |rets AS (
        |  SELECT o_orderpriority AS rp, SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS returns
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R' GROUP BY 1),
        |j AS (
        |  SELECT COALESCE(sp, rp) AS channel, sales, returns
        |  FROM sales FULL OUTER JOIN rets ON sp = rp)
        |SELECT channel,
        |  CAST(SUM(sales) AS DOUBLE) AS sales_total,
        |  CAST(SUM(returns) AS DOUBLE) AS returns_total,
        |  CAST(SUM(sales) - SUM(returns) AS DOUBLE) AS profit,
        |  GROUPING(channel) AS gid
        |FROM j GROUP BY ROLLUP (channel)
        |ORDER BY gid, channel NULLS FIRST""".stripMargin,
    "q173_ds_follow_up" ->
      """SELECT CAST(year(o1.o_orderdate) AS INT) AS yr,
        |  CAST(month(o1.o_orderdate) AS INT) AS mo,
        |  COUNT(1) AS n_followups,
        |  COUNT(DISTINCT o1.o_custkey) AS n_customers
        |FROM orders o1 JOIN orders o2
        |  ON o1.o_custkey = o2.o_custkey
        |  AND o2.o_orderdate > o1.o_orderdate
        |  AND o2.o_orderdate <= o1.o_orderdate + INTERVAL 30 DAY
        |GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin,
    "q157_ds_week_ratio" ->
      """WITH weekly AS (
        |  SELECT CAST(FLOOR(datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) / 7) AS BIGINT) AS wk,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 0 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d0,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 1 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d1,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 2 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d2,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 3 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d3,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 4 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d4,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 5 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d5,
        |    CAST(SUM(CASE WHEN datediff('day', DATE '1996-01-01', CAST(o_orderdate AS DATE)) % 7 = 6 THEN CAST(o_totalprice AS DECIMAL(25,2)) END) AS DOUBLE) AS d6
        |  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
        |  GROUP BY 1)
        |SELECT c.wk AS wk,
        |  n.d0 / c.d0 AS r0, n.d1 / c.d1 AS r1, n.d2 / c.d2 AS r2,
        |  n.d3 / c.d3 AS r3, n.d4 / c.d4 AS r4, n.d5 / c.d5 AS r5,
        |  n.d6 / c.d6 AS r6
        |FROM weekly c JOIN weekly n ON n.wk = c.wk + 52
        |ORDER BY wk""".stripMargin,
    "q158_ds_excess_discount" ->
      """WITH per_part AS (
        |  SELECT l_partkey AS pk, COUNT(1) AS n_part,
        |         SUM(CAST(l_discount AS DECIMAL(25,6))) AS disc_sum
        |  FROM lineitem GROUP BY 1)
        |SELECT p_brand, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS excess_price
        |FROM lineitem
        |  JOIN per_part ON l_partkey = pk
        |  JOIN part ON l_partkey = p_partkey
        |WHERE l_discount * n_part > 1.3 * CAST(disc_sum AS DOUBLE)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q159_ds_quantity_cov" ->
      """WITH m AS (
        |  SELECT p_brand, CAST(month(l_shipdate) AS INT) AS mo,
        |         round(stddev(l_quantity) / avg(l_quantity), 6) AS cov
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE year(l_shipdate) = 1996
        |  GROUP BY 1, 2 HAVING COUNT(1) >= 2)
        |SELECT c.p_brand AS p_brand, c.mo AS mo, c.cov AS cov1, n.cov AS cov2
        |FROM m c JOIN m n ON c.p_brand = n.p_brand AND n.mo = c.mo + 1
        |WHERE c.cov > 0.5 AND n.cov > 0.5
        |ORDER BY p_brand, mo""".stripMargin,
    "q160_ds_best_worst" ->
      """WITH stats AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
        |      / COUNT(1) AS avgrev
        |  FROM lineitem GROUP BY 1),
        |best AS (
        |  SELECT p_name AS best_part, CAST(ROW_NUMBER() OVER (ORDER BY avgrev DESC, l_partkey) AS INT) AS rk
        |  FROM stats JOIN part ON l_partkey = p_partkey),
        |worst AS (
        |  SELECT p_name AS worst_part, CAST(ROW_NUMBER() OVER (ORDER BY avgrev ASC, l_partkey) AS INT) AS rk
        |  FROM stats JOIN part ON l_partkey = p_partkey)
        |SELECT best.rk AS rk, best_part, worst_part
        |FROM best JOIN worst ON best.rk = worst.rk
        |WHERE best.rk <= 10 ORDER BY rk""".stripMargin,
    "q161_ds_equal_share" ->
      """WITH lanes AS (
        |  SELECT l_partkey,
        |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS a,
        |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS n,
        |    CAST(COALESCE(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) END), 0) AS DOUBLE) AS r
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT *, a + n + r AS tot FROM lanes)
        |SELECT l_partkey, a, n, r, tot FROM t
        |WHERE a * 3 >= 0.9 * tot AND a * 3 <= 1.1 * tot
        |  AND n * 3 >= 0.9 * tot AND n * 3 <= 1.1 * tot
        |  AND r * 3 >= 0.9 * tot AND r * 3 <= 1.1 * tot
        |ORDER BY l_partkey""".stripMargin,
    "q162_ds_hierarchy_rank" ->
      """WITH rolled AS (
        |  SELECT r_name, n_name,
        |    CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE) /
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS margin,
        |    GROUPING(r_name, n_name) AS gid
        |  FROM lineitem
        |    JOIN orders   ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation   ON c_nationkey = n_nationkey
        |    JOIN region   ON n_regionkey = r_regionkey
        |  GROUP BY ROLLUP (r_name, n_name)),
        |ranked AS (
        |  SELECT gid, r_name, n_name, margin,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY gid, CASE WHEN gid = 0 THEN r_name END
        |      ORDER BY margin DESC, r_name NULLS FIRST, n_name NULLS FIRST) AS INT) AS rk
        |  FROM rolled)
        |SELECT gid, r_name, n_name, margin, rk FROM ranked WHERE rk <= 3
        |ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST""".stripMargin,
    "q163_ds_net_sales" ->
      """WITH rets AS (
        |  SELECT l_orderkey AS ret_key,
        |         SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS ret_amt
        |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        |net AS (
        |  SELECT o_custkey,
        |    SUM(CAST(o_totalprice AS DECIMAL(25,2)) -
        |        COALESCE(ret_amt, CAST(0 AS DECIMAL(25,2)))) AS net_amt
        |  FROM orders LEFT JOIN rets ON o_orderkey = ret_key
        |  GROUP BY 1)
        |SELECT c_custkey, c_name, CAST(net_amt AS DOUBLE) AS net_sales
        |FROM net JOIN customer ON o_custkey = c_custkey
        |ORDER BY net_sales DESC, c_custkey LIMIT 100""".stripMargin,
    "q164_ds_repeat_chain" ->
      """WITH s1 AS (
        |  SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q1
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1996),
        |s2 AS (
        |  SELECT o_custkey AS ck, l_partkey AS pk, l_quantity AS q2
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE year(o_orderdate) = 1997)
        |SELECT p_brand, COUNT(1) AS n_pairs,
        |  CAST(SUM(CAST(q1 AS DECIMAL(25,2))) AS DOUBLE) AS qty_first,
        |  CAST(SUM(CAST(q2 AS DECIMAL(25,2))) AS DOUBLE) AS qty_repeat
        |FROM s1 JOIN s2 ON s1.ck = s2.ck AND s1.pk = s2.pk
        |  JOIN part ON s1.pk = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q165_ds_latency_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(CASE WHEN lat <= 30 THEN 1 END) AS d30,
        |  COUNT(CASE WHEN lat > 30 AND lat <= 60 THEN 1 END) AS d60,
        |  COUNT(CASE WHEN lat > 60 AND lat <= 90 THEN 1 END) AS d90,
        |  COUNT(CASE WHEN lat > 90 AND lat <= 120 THEN 1 END) AS d120,
        |  COUNT(CASE WHEN lat > 120 THEN 1 END) AS dmore
        |FROM (
        |  SELECT o_orderpriority,
        |    datediff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS lat
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q166_ds_before_after" ->
      """SELECT s_suppkey, s_name,
        |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-04-02 00:00:00'
        |                 AND l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
        |            THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS qty_before,
        |  CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
        |                 AND l_shipdate <  TIMESTAMP '1997-07-31 00:00:00'
        |            THEN CAST(l_quantity AS DECIMAL(25,2)) END) AS DOUBLE) AS qty_after
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_suppkey, s_name
        |HAVING qty_before IS NOT NULL AND qty_after IS NOT NULL
        |  AND qty_after * 2 <= qty_before * 3
        |  AND qty_before * 2 <= qty_after * 3
        |ORDER BY s_suppkey""".stripMargin,
  )
}
