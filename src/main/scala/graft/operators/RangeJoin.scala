package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Bucketed range join — point-in-interval joins WITHOUT a selective
  * equi-key (the reference reaches these through plain theta joins,
  * which plan as nested-loop: `ql/src/java/org/apache/hadoop/hive/ql/
  * optimizer/physical/` has no interval strategy, and Spark's own
  * planner falls back to BroadcastNestedLoopJoin the same way).
  *
  * The classic fix, composed from existing operators rather than a new
  * physical node: quantize time into fixed-width buckets, explode each
  * interval into the buckets it covers, equi-join points to intervals
  * on the bucket id, and re-apply the exact range predicate. Cost drops
  * from O(|points| x |intervals|) to
  * O(|points| + |intervals| x ceil(span/width) + |true matches|), and
  * the join is a shuffled/broadcast HASH join that AQE can skew-split —
  * the 100 TB shape. Pick `widthMicros` near the median interval span
  * so most intervals explode into ~1-2 buckets.
  *
  * Bucket math is done in microseconds (Spark timestamps are micros),
  * and the last covered bucket uses `end - 1us` so exclusive ends never
  * leak an extra bucket and fractional-width ends never miss one.
  */
object RangeJoin {

  /** Join `points` (event time `ts`) to `intervals` ([start, end),
    * end-exclusive) via bucket equi-join + exact re-filter. Column
    * names of `ts`/`start`/`end` must be distinct between the two
    * inputs (they are resolved by name after the join). `extraKeys`
    * adds equi-columns shared by both sides (e.g. a tenant id) to the
    * join key, tightening the hash lookup for free. */
  def bucketed(points: DataFrame, ts: Column,
               intervals: DataFrame, start: Column, end: Column,
               widthMicros: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be positive: $widthMicros")
    val p = points.withColumn("__bkt", floor(unix_micros(ts) / widthMicros))
    val i = intervals.withColumn("__bkt", explode(sequence(
      floor(unix_micros(start) / widthMicros),
      floor((unix_micros(end) - 1) / widthMicros))))
    p.join(i, Seq("__bkt") ++ extraKeys)
      .filter(ts >= start && ts < end)
      .drop("__bkt")
  }

  /** Interval-overlap join: [ls, le) x [rs, re) pairs with
    * ls < re && rs < le (end-exclusive; zero-length intervals never
    * match). Both sides bucket like [[bucketed]]; a pair sharing
    * several buckets would otherwise surface once per shared bucket,
    * so a row is kept only in the FIRST bucket both sides cover —
    * the one containing max(ls, rs), which any true overlap covers on
    * both sides. Exactly one surviving row per overlapping pair, so
    * there is no `distinct` and no second shuffle — the property that
    * matters when the join output is 100 TB-scale. */
  def overlaps(left: DataFrame, ls: Column, le: Column,
               right: DataFrame, rs: Column, re: Column,
               widthMicros: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    require(widthMicros > 0, s"widthMicros must be positive: $widthMicros")
    def burst(df: DataFrame, s: Column, e: Column) =
      df.withColumn("__bkt", explode(sequence(
        floor(unix_micros(s) / widthMicros),
        floor((unix_micros(e) - 1) / widthMicros))))
    burst(left, ls, le).join(burst(right, rs, re), Seq("__bkt") ++ extraKeys)
      .filter(ls < re && rs < le)
      .filter(col("__bkt") ===
        floor(greatest(unix_micros(ls), unix_micros(rs)) / widthMicros))
      .drop("__bkt")
  }

  /** Numeric band join: |lv - rv| <= delta without an equi-key (the
    * reconciliation shape — match ledger entries whose amounts differ
    * by at most a tolerance). Left rows sit in ONE bucket of width
    * delta; right rows explode into their bucket and both neighbors,
    * so every true match meets in exactly the left row's bucket — once,
    * no distinct. Cost O(|left| + 3|right| + matches) against the
    * nested-loop O(|left| x |right|). The exact |lv - rv| <= delta
    * re-filter runs on unmodified doubles, so results are bit-identical
    * to the naive join. */
  def band(left: DataFrame, lv: Column, right: DataFrame, rv: Column,
           delta: Double, extraKeys: Seq[String] = Nil): DataFrame = {
    require(delta > 0, s"delta must be positive: $delta")
    val l = left.withColumn("__bkt", floor(lv / delta).cast("long"))
    val rb = floor(rv / delta).cast("long")
    val r = right.withColumn("__bkt",
      explode(array(rb - 1, rb, rb + 1)))
    l.join(r, Seq("__bkt") ++ extraKeys)
      .filter(abs(lv - rv) <= delta)
      .drop("__bkt")
  }

  /** Gate row: hot-window attribution. Hot windows are (event_type,
    * day) cells with >= 70 events; every event landing inside another
    * type's hot window is attributed to it, rolled up per (event_type,
    * w_type). Intervals are 1-day spans over 1-hour buckets, so each
    * interval explodes into 24 buckets and the multi-bucket path is
    * exercised; the join itself is a broadcast HASH join (the window
    * sliver is tiny), never a nested loop. */
  val q236_range_join_hot: Q = (s, d) => {
    val ev = Tables.events(s, d).select(col("event_id"), col("event_type"), col("ts"))
    val hot = ev.groupBy(col("event_type").as("w_type"),
                         date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 70)
      .select(col("w_type"), col("w_start"),
              (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    bucketed(ev, col("ts"), hot, col("w_start"), col("w_end"),
             widthMicros = 3600L * 1000000L)
      .filter(col("event_type") =!= col("w_type"))
      .groupBy(col("event_type"), col("w_type"))
      .agg(count(lit(1)).as("n_hits"))
      .orderBy(col("event_type"), col("w_type"))
  }

  /** Gate row for [[overlaps]]: user sessions (30-min-gap islands, a
    * session staying "open" for its 30-min timeout tail) overlap-joined
    * to the q236 hot windows — how many live sessions each hot window
    * touched. Sessions are intervals on one side, windows on the other;
    * no equi-key links them, yet the plan stays a hash join and each
    * overlapping pair surfaces exactly once (first-shared-bucket rule,
    * no distinct). */
  val q237_session_overlap: Q = (s, d) => {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts")).as("s_start"),
           (max(col("ts")) + expr("INTERVAL 30 MINUTE")).as("s_end"))
    val hot = Tables.events(s, d)
      .groupBy(col("event_type").as("w_type"),
               date_trunc("day", col("ts")).as("w_start"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= 70)
      .select(col("w_type"), col("w_start"),
              (col("w_start") + expr("INTERVAL 1 DAY")).as("w_end"))
    overlaps(sess, col("s_start"), col("s_end"),
             hot, col("w_start"), col("w_end"), widthMicros = 3600L * 1000000L)
      .groupBy(col("w_type"), col("w_start"))
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("w_type"), col("w_start"))
  }

  /** Gate row for [[band]]: order-price reconciliation — pairs of
    * orders whose total prices differ by at most 0.5, the classic
    * "find the matching ledger entry" join. Self-join on a double
    * column with no equi-key; the band buckets keep it a hash join. */
  val q238_price_band: Q = (s, d) => {
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice"))
    band(o.select(col("o_orderkey").as("ida"), col("o_totalprice").as("pa")),
         col("pa"),
         o.select(col("o_orderkey").as("idb"), col("o_totalprice").as("pb")),
         col("pb"), delta = 0.5)
      .filter(col("ida") < col("idb"))
      .select(col("ida"), col("idb"), abs(col("pa") - col("pb")).as("price_diff"))
      .orderBy(col("ida"), col("idb"))
  }

  /** Gate row for [[band]] with `extraKeys`: reconciliation within a
    * category — order pairs in the SAME priority class whose prices
    * differ by <= 2.0. The equi-key rides the bucket id into one
    * composite hash key, so the join gets category isolation for free
    * (no post-filter on priority, no wider candidate set). */
  val q244_price_band_keyed: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority"))
    band(o.select(col("o_orderkey").as("ida"), col("o_totalprice").as("pa"),
                  col("o_orderpriority").as("prio")),
         col("pa"),
         o.select(col("o_orderkey").as("idb"), col("o_totalprice").as("pb"),
                  col("o_orderpriority").as("prio")),
         col("pb"), delta = 2.0, extraKeys = Seq("prio"))
      .filter(col("ida") < col("idb"))
      .select(col("prio"), col("ida"), col("idb"),
              abs(col("pa") - col("pb")).as("price_diff"))
      .orderBy(col("prio"), col("ida"), col("idb"))
  }

  val queries: Map[String, Q] = Map(
    "q236_range_join_hot" -> q236_range_join_hot,
    "q237_session_overlap" -> q237_session_overlap,
    "q238_price_band" -> q238_price_band,
    "q244_price_band_keyed" -> q244_price_band_keyed,
  )

  val oracles: Map[String, String] = Map(
    "q236_range_join_hot" ->
      """WITH e AS (
        |  SELECT event_id, event_type, make_timestamp(epoch_ns(ts) // 1000) AS ts
        |  FROM events),
        |w AS (
        |  SELECT event_type AS w_type,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start,
        |    CAST(date_trunc('day', ts) AS TIMESTAMP) + INTERVAL 1 DAY AS w_end
        |  FROM e GROUP BY 1, 2 HAVING count(1) >= 70)
        |SELECT e.event_type, w.w_type, count(1) AS n_hits
        |FROM e JOIN w ON e.ts >= w.w_start AND e.ts < w.w_end
        |  AND e.event_type <> w.w_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q237_session_overlap" ->
      s"""WITH ${EventsOps.sessionIslandCtes},
         |sess AS (SELECT user_id, sid, MIN(tmu) AS s_start,
         |           MAX(tmu) + INTERVAL 30 MINUTE AS s_end
         |         FROM s GROUP BY 1, 2),
         |w AS (SELECT event_type AS w_type,
         |        CAST(date_trunc('day', tmu) AS TIMESTAMP) AS w_start,
         |        CAST(date_trunc('day', tmu) AS TIMESTAMP) + INTERVAL 1 DAY AS w_end
         |      FROM e GROUP BY 1, 2 HAVING count(1) >= 70)
         |SELECT w.w_type, w.w_start, count(1) AS n_sessions
         |FROM sess JOIN w ON sess.s_start < w.w_end AND w.w_start < sess.s_end
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q238_price_band" ->
      """SELECT a.o_orderkey AS ida, b.o_orderkey AS idb,
        |  abs(a.o_totalprice - b.o_totalprice) AS price_diff
        |FROM orders a JOIN orders b
        |  ON abs(a.o_totalprice - b.o_totalprice) <= 0.5
        |  AND a.o_orderkey < b.o_orderkey
        |ORDER BY ida, idb""".stripMargin,
    "q244_price_band_keyed" ->
      """SELECT a.o_orderpriority AS prio,
        |  a.o_orderkey AS ida, b.o_orderkey AS idb,
        |  abs(a.o_totalprice - b.o_totalprice) AS price_diff
        |FROM orders a JOIN orders b
        |  ON a.o_orderpriority = b.o_orderpriority
        |  AND abs(a.o_totalprice - b.o_totalprice) <= 2.0
        |  AND a.o_orderkey < b.o_orderkey
        |ORDER BY prio, ida, idb""".stripMargin,
  )
}
