package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Sketches
import graft.{Q, Tables}

/** Driver-contract queries for the mergeable sketch family
  * ([[graft.functions.Sketches]]) and the incremental-rollup maintenance
  * pattern built on it — the reference's `compute_stats` NDV estimator
  * (ql/udf/generic/GenericUDAFComputeStats.java) and stats-aggregation
  * surface re-expressed as stored, mergeable summaries.
  *
  * Every oracle row here is EXACT by the under-fill contract (sketch
  * capacity strictly above the group's true cardinality at sf0.01 — the
  * q211 exact-when-fits pattern); over-capacity error bounds and merge
  * associativity under arbitrary partitioning are SketchSpec's job.
  */
object SketchOps {

  /** KMV capacity for the orders lanes: > 1,500 distinct custkeys at
    * sf0.01, so estimates are exact; at 100 TB the same query reports
    * with ~1.6% error (1/sqrt(k-2)) from the identical 32 KB sketch. */
  private val K = 4096

  /** Distinct customers per order priority, twice: once sketched
    * directly, once merged from per-month partial sketches — proving the
    * merge path (the one a 1000-executor rollup actually takes: each
    * day/partition sketches locally, a tiny merge job folds them) gives
    * the same answer as the direct pass. Both lanes are one shuffle of
    * k-bounded buffers; no row-level distinct ever happens. */
  val q246_kmv_distinct: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val direct = o.groupBy(col("o_orderpriority"))
      .agg(Sketches.kmvSketch(col("o_custkey"), K).as("sk"))
      .select(col("o_orderpriority"), Sketches.kmvEstimate(col("sk"), K).as("ndv_direct"))
    val partials = o
      .groupBy(col("o_orderpriority"), date_trunc("month", col("o_orderdate")).as("m"))
      .agg(Sketches.kmvSketch(col("o_custkey"), K).as("sk"))
    val merged = partials.groupBy(col("o_orderpriority"))
      .agg(Sketches.kmvMerge(col("sk"), K).as("sk"))
      .select(col("o_orderpriority"), Sketches.kmvEstimate(col("sk"), K).as("ndv_merged"))
    direct.join(merged, Seq("o_orderpriority"))
      .orderBy(col("o_orderpriority"))
  }

  /** Top-8 tokens per language by Misra-Gries counter map (capacity 64
    * > the 31-token vocabulary at sf0.01 → counts exact; at web scale
    * the same plan keeps a 64-entry map per language instead of a
    * billion-row token group-by, trading exactness for the
    * freq > n/(k+1) guarantee). Tie-break (count desc, token asc) is
    * total, so the rank filter is deterministic. */
  val q247_heavy_hitters: Q = (s, d) => {
    val k = 64
    val toks = Tables.documents(s, d)
      .select(col("lang"), explode(split(trim(col("text")), " +")).as("tok"))
    toks.groupBy(col("lang"))
      .agg(Sketches.mgSketch(col("tok"), k).as("hh"))
      .select(col("lang"), explode(col("hh")).as(Seq("tok", "cnt")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("cnt").desc, col("tok"))))
      .filter(col("rk") <= 8)
      .select(col("lang"), col("rk"), col("tok"), col("cnt"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Incremental rollup maintenance: the per-(priority, month) partial
    * table — counts, exact-decimal revenue, KMV customer sketches — is
    * WRITTEN TO PARQUET (the stored state a nightly job owns), then the
    * "new day" batch's partials are unioned in and the per-priority
    * report is produced by MERGING summaries only. The full-history
    * fact table is scanned exactly once (to seed the store); the update
    * path touches the new batch plus a |priorities × months|-row merge.
    * That is the 100 TB contract: report maintenance cost is O(new data
    * + summary count), never O(history). The oracle recomputes the
    * report from the raw table — merged partial state must be
    * indistinguishable from a full rescan. */
  val q248_incremental_rollup: Q = (s, d) => {
    val cutoff = lit("2001-01-01").cast("date")
    val o = Tables.orders(s, d)
    def partials(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("o_orderpriority"), date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n"),
           sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
           Sketches.kmvSketch(col("o_custkey"), K).as("sk"))
    val store = s"target/storage/${new java.io.File(d).getName}/rollup_partials"
    partials(o.filter(col("o_orderdate") < cutoff))
      .write.mode("overwrite").parquet(store)
    val merged = s.read.parquet(store)
      .unionByName(partials(o.filter(col("o_orderdate") >= cutoff)))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("n")).as("n_orders"),
           sum(col("rev")).cast("double").as("revenue"),
           Sketches.kmvMerge(col("sk"), K).as("sk"))
    merged.select(col("o_orderpriority"), col("n_orders"), col("revenue"),
                  Sketches.kmvEstimate(col("sk"), K).as("ndv_cust"))
      .orderBy(col("o_orderpriority"))
  }

  /** Streaming distinct-users-per-event-type with BOUNDED state: the
    * KMV aggregator runs inside a real Structured Streaming aggregation
    * (complete mode, AvailableNow), so per-key state is the k-capped
    * buffer — a streaming COUNT(DISTINCT) whose state cannot grow with
    * the user population. Parity: the sink's estimates must equal the
    * batch exact distinct counts (under-filled at sf0.01). */
  val q249_stream_distinct_sketch: Q = (s, d) => {
    s.catalog.dropTempView("q249_sink")
    val q = graft.streaming.EventsStream.readEvents(s, d)
      .groupBy(col("event_type"))
      .agg(Sketches.kmvSketch(col("user_id"), 1024).as("sk"))
      .select(col("event_type"), Sketches.kmvEstimate(col("sk"), 1024).as("ndv_users"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q249_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q249_sink").orderBy(col("event_type"))
  }

  /** Streaming heavy hitters with bounded state: the Misra-Gries map as
    * a real streaming aggregation (complete mode, AvailableNow) — the
    * trending-items report whose per-key state is a 256-entry counter
    * map however many users flow past. Exact at this scale (150 users
    * per type < capacity), so the parity oracle is the batch top-5;
    * user ids compare as STRINGS on both sides so the tie-break is
    * engine-independent. */
  val q253_stream_heavy_hitters: Q = (s, d) => {
    s.catalog.dropTempView("q253_sink")
    val q = graft.streaming.EventsStream.readEvents(s, d)
      .groupBy(col("event_type"))
      .agg(Sketches.mgSketch(col("user_id").cast("string"), 256).as("hh"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q253_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q253_sink")
      .select(col("event_type"), explode(col("hh")).as(Seq("uid", "cnt")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("cnt").desc, col("uid"))))
      .filter(col("rk") <= 5)
      .select(col("event_type"), col("rk"), col("uid"), col("cnt"))
      .orderBy(col("event_type"), col("rk"))
  }

  /** DDSketch quantiles per return flag, twice: sketched directly and
    * merged from per-month partial sketches that round-trip through a
    * PARQUET store (`map<int,bigint>` payload — ordinary columns any
    * later job can merge). Unlike q246/q211's exact-when-under-filled
    * contract, this row is hash-exact at ANY scale: the sketch's bins
    * are fixed by gamma alone, merge is counter addition (order-
    * invariant), and the oracle replays binning + rank walk in SQL —
    * sf100's answer would hash-match the same way. The reference's
    * percentile_approx (GenericUDAFPercentileApprox.java) cannot make
    * this claim: NumericHistogram bins depend on arrival order, so its
    * merged partials differ from a single pass. */
  val q281_dd_quantiles: Q = (s, d) => {
    val alpha = 0.01
    def quantiles(sk: org.apache.spark.sql.Column, suffix: String) = Seq(
      round(Sketches.ddQuantile(sk, 0.5, alpha), 6).as(s"p50$suffix"),
      round(Sketches.ddQuantile(sk, 0.9, alpha), 6).as(s"p90$suffix"),
      round(Sketches.ddQuantile(sk, 0.99, alpha), 6).as(s"p99$suffix"))
    val li = Tables.lineitem(s, d)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(Sketches.ddSketch(col("l_extendedprice"), alpha).as("sk"))
      .select(col("l_returnflag") +: quantiles(col("sk"), "_direct"): _*)
    val store = s"target/storage/${new java.io.File(d).getName}/dd_partials"
    li.groupBy(col("l_returnflag"), date_trunc("month", col("l_shipdate")).as("m"))
      .agg(Sketches.ddSketch(col("l_extendedprice"), alpha).as("sk"))
      .write.mode("overwrite").parquet(store)
    val merged = s.read.parquet(store)
      .groupBy(col("l_returnflag"))
      .agg(Sketches.ddMerge(col("sk")).as("sk"))
      .select(col("l_returnflag") +: quantiles(col("sk"), "_merged"): _*)
    direct.join(merged, Seq("l_returnflag"))
      .orderBy(col("l_returnflag"))
  }

  /** Streaming quantiles with BOUNDED state: the DDSketch inside a real
    * streaming aggregation (complete mode, AvailableNow) — p50/p95
    * reporting whose per-key state is a few-hundred-bin counter map no
    * matter how many events flow past. Because the sketch's merge is
    * order-invariant counter addition, micro-batch boundaries cannot
    * move the answer: the bit-exactness q281 pins for batch partials
    * holds verbatim for streaming state updates, so the oracle is the
    * same full replay, not a parity approximation. */
  val q285_stream_quantile_sketch: Q = (s, d) => {
    val alpha = 0.01
    s.catalog.dropTempView("q285_sink")
    val q = graft.streaming.EventsStream.readEvents(s, d)
      .groupBy(col("event_type"))
      .agg(Sketches.ddSketch(col("value"), alpha).as("sk"))
      .select(col("event_type"),
        round(Sketches.ddQuantile(col("sk"), 0.5, alpha), 6).as("p50"),
        round(Sketches.ddQuantile(col("sk"), 0.95, alpha), 6).as("p95"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q285_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q285_sink").orderBy(col("event_type"))
  }

  /** Sketch set algebra: distinct-customer overlap between two order
    * segments computed from their STORED sketches — union as a pure
    * built-in pairwise merge (bit-identical to re-aggregating), then
    * intersection by inclusion-exclusion. The cross-segment question a
    * 100 TB warehouse answers from two 32 KB summaries instead of a
    * distinct-join over history. Exact here by under-fill (|A∪B| < k);
    * the overflow band is SketchSpec's job. */
  val q286_kmv_set_ops: Q = (s, d) => {
    val o = Tables.orders(s, d)
    def seg(p: String, alias: String) =
      o.filter(col("o_orderpriority") === p)
        .agg(Sketches.kmvSketch(col("o_custkey"), K).as(alias))
    seg("1-URGENT", "ska").crossJoin(seg("2-HIGH", "skb"))
      .select(
        Sketches.kmvEstimate(col("ska"), K).as("ndv_a"),
        Sketches.kmvEstimate(col("skb"), K).as("ndv_b"),
        Sketches.kmvEstimate(Sketches.kmvUnionPair(col("ska"), col("skb"), K), K).as("ndv_union"),
        Sketches.kmvIntersectEstimate(col("ska"), col("skb"), K).as("ndv_intersect"))
  }

  /** The approx-NDV lane of q80, oracle-ized (q80 itself stays rows-only
    * because Spark's HLL++ estimate is never exactly replayable): the
    * ENGINE's mergeable NDV path (KMV, the reference's compute_stats FM
    * sketch analog) over q80's exact shape — per-returnflag NDV of
    * l_partkey and l_orderkey — with capacity 65536, above every
    * per-group NDV at sf0.01, so the estimate is under-fill EXACT and
    * DuckDB's COUNT(DISTINCT) replays it bit-for-bit. At sf0.1 the
    * ndv_order lane over-fills and degrades to the ±1/sqrt(k-2) estimate
    * — the documented under-fill-by-design sweep category (same as
    * q246); at 100 TB the identical plan ships one 512 KB sketch per
    * group instead of a row-level distinct. */
  val q303_approx_ndv_exact: Q = (s, d) => {
    val k = 65536
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(Sketches.kmvSketch(col("l_partkey"), k).as("sk_part"),
           Sketches.kmvSketch(col("l_orderkey"), k).as("sk_order"),
           count(lit(1)).as("n_rows"))
      .select(col("l_returnflag"),
        Sketches.kmvEstimate(col("sk_part"), k).as("ndv_part"),
        Sketches.kmvEstimate(col("sk_order"), k).as("ndv_order"),
        col("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  val queries: Map[String, Q] = Map(
    "q303_approx_ndv_exact" -> q303_approx_ndv_exact,
    "q253_stream_heavy_hitters" -> q253_stream_heavy_hitters,
    "q281_dd_quantiles" -> q281_dd_quantiles,
    "q285_stream_quantile_sketch" -> q285_stream_quantile_sketch,
    "q286_kmv_set_ops" -> q286_kmv_set_ops,
    "q246_kmv_distinct" -> q246_kmv_distinct,
    "q247_heavy_hitters" -> q247_heavy_hitters,
    "q248_incremental_rollup" -> q248_incremental_rollup,
    "q249_stream_distinct_sketch" -> q249_stream_distinct_sketch,
  )

  val oracles: Map[String, String] = Map(
    "q303_approx_ndv_exact" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS ndv_part,
        |  count(DISTINCT l_orderkey) AS ndv_order,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    // Full replay of the DDSketch computation: same gamma spelling
    // (IEEE-identical (1+0.01)/(1-0.01)), same ceil(ln(x)/ln(gamma))
    // binning, same nearest-rank walk, same bucket representative —
    // the merged lane must be bit-identical to the direct lane, so one
    // computation serves both column sets.
    "q281_dd_quantiles" ->
      """WITH g AS (SELECT (1 + 0.01::DOUBLE) / (1 - 0.01::DOUBLE) AS g),
        |b AS (SELECT l_returnflag AS flag,
        |        CAST(ceil(ln(CAST(l_extendedprice AS DOUBLE))
        |                  / ln((SELECT g FROM g))) AS INT) AS bin
        |      FROM lineitem),
        |c AS (SELECT flag, bin, CAST(count(*) AS BIGINT) AS cnt
        |      FROM b GROUP BY 1, 2),
        |w AS (SELECT flag, bin, cnt,
        |        SUM(cnt) OVER (PARTITION BY flag ORDER BY bin) AS cum,
        |        SUM(cnt) OVER (PARTITION BY flag) AS n
        |      FROM c),
        |pick AS (SELECT flag,
        |    MIN(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.5) THEN bin END) AS b50,
        |    MIN(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.9) THEN bin END) AS b90,
        |    MIN(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.99) THEN bin END) AS b99
        |  FROM w GROUP BY flag)
        |SELECT flag AS l_returnflag,
        |  round(2 * power(g, b50) / (g + 1), 6) AS p50_direct,
        |  round(2 * power(g, b90) / (g + 1), 6) AS p90_direct,
        |  round(2 * power(g, b99) / (g + 1), 6) AS p99_direct,
        |  round(2 * power(g, b50) / (g + 1), 6) AS p50_merged,
        |  round(2 * power(g, b90) / (g + 1), 6) AS p90_merged,
        |  round(2 * power(g, b99) / (g + 1), 6) AS p99_merged
        |FROM pick, g ORDER BY l_returnflag""".stripMargin,
    "q286_kmv_set_ops" ->
      """SELECT
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |   WHERE o_orderpriority = '1-URGENT') AS ndv_a,
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |   WHERE o_orderpriority = '2-HIGH') AS ndv_b,
        |  (SELECT count(DISTINCT o_custkey) FROM orders
        |   WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')) AS ndv_union,
        |  (SELECT count(*) FROM
        |    (SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |     INTERSECT
        |     SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH') t
        |  ) AS ndv_intersect""".stripMargin,
    "q285_stream_quantile_sketch" ->
      """WITH g AS (SELECT (1 + 0.01::DOUBLE) / (1 - 0.01::DOUBLE) AS g),
        |b AS (SELECT event_type,
        |        CASE WHEN value = 0 THEN -2147483648
        |             ELSE CAST(ceil(ln(CAST(value AS DOUBLE))
        |                            / ln((SELECT g FROM g))) AS INT) END AS bin
        |      FROM events),
        |c AS (SELECT event_type, bin, CAST(count(*) AS BIGINT) AS cnt
        |      FROM b GROUP BY 1, 2),
        |w AS (SELECT event_type, bin, cnt,
        |        SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
        |        SUM(cnt) OVER (PARTITION BY event_type) AS n
        |      FROM c),
        |pick AS (SELECT event_type,
        |    MIN(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.5) THEN bin END) AS b50,
        |    MIN(CASE WHEN cum >= ceil(CAST(n AS DOUBLE) * 0.95) THEN bin END) AS b95
        |  FROM w GROUP BY event_type)
        |SELECT event_type,
        |  round(CASE WHEN b50 = -2147483648 THEN 0
        |             ELSE 2 * power(g, b50) / (g + 1) END, 6) AS p50,
        |  round(CASE WHEN b95 = -2147483648 THEN 0
        |             ELSE 2 * power(g, b95) / (g + 1) END, 6) AS p95
        |FROM pick, g ORDER BY event_type""".stripMargin,
    "q253_stream_heavy_hitters" ->
      """WITH c AS (
        |  SELECT event_type, CAST(user_id AS VARCHAR) AS uid, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT event_type, uid, cnt,
        |        row_number() OVER (PARTITION BY event_type
        |                           ORDER BY cnt DESC, uid) AS rk
        |      FROM c)
        |SELECT event_type, rk, uid, cnt FROM r WHERE rk <= 5
        |ORDER BY event_type, rk""".stripMargin,
    "q246_kmv_distinct" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS ndv_direct,
        |  count(DISTINCT o_custkey) AS ndv_merged
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q247_heavy_hitters" ->
      """WITH t AS (
        |  SELECT lang, unnest(regexp_split_to_array(trim(text), ' +')) AS tok
        |  FROM documents),
        |c AS (SELECT lang, tok, count(*) AS cnt FROM t GROUP BY 1, 2),
        |r AS (SELECT lang, tok, cnt,
        |        row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rk
        |      FROM c)
        |SELECT lang, rk, tok, cnt FROM r WHERE rk <= 8 ORDER BY lang, rk""".stripMargin,
    "q248_incremental_rollup" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(DISTINCT o_custkey) AS ndv_cust
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q249_stream_distinct_sketch" ->
      """SELECT event_type, count(DISTINCT user_id) AS ndv_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
