package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Event-time analytics over the `events` table — the batch semantics
  * that graft.streaming mirrors with Structured Streaming (the reference
  * has no query-time streaming; its ingest-only streaming is
  * hcatalog/streaming — SURVEY.md §2.10). Tumbling windows and
  * gap-based sessionization both shuffle once on (key) and scale
  * linearly; session assignment is the classic gaps-and-islands
  * window-function rewrite, which Spark executes with a single sort per
  * user partition.
  *
  * Oracle note: events.ts is nanosecond-precision; Spark reads it
  * truncated to micros, so oracles truncate with epoch_ns // 1000 before
  * comparing.
  */
object EventsOps {

  /** Tumbling 1-hour windows per event_type: count + exact value sum. */
  val q71_tumbling_window: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(25, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))
  }

  /** Sliding windows (1 hour every 30 min) — each event lands in 2
    * windows; expressed via the same window() generator. */
  val q72_sliding_window: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(25, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("n"), col("sum_value"))
      .orderBy(col("win_start"))
  }

  /** THE gap-sessionization prelude (30-min inactivity): session id by
    * cumulative break count over the (ts, event_id)-total order — shared
    * by q73 and q251 exactly as their SQL sides share sessionIslandCtes,
    * so the gap constant and tie-break can never drift between them. */
  private def withSessionIds(events: org.apache.spark.sql.DataFrame,
                             gapMinutes: Int = 30): org.apache.spark.sql.DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("brk",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("brk")).over(cum))
  }

  /** Gap-based sessionization (30-min inactivity): session id by
    * cumulative break count, then per-session metrics. */
  val q73_sessionize: Q = (s, d) => {
    withSessionIds(Tables.events(s, d))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(DecimalType(25, 2))).cast("double").as("sum_value"),
           (unix_seconds(max(col("ts"))) - unix_seconds(min(col("ts")))).as("duration_s"))
      .orderBy(col("user_id"), col("sid"))
  }

  /** Pivot: event counts per user bucketed by type (conditional
    * aggregation — GroupByOperator + CASE in the reference). */
  val q74_pivot: Q = (s, d) => {
    Tables.events(s, d)
      .groupBy((col("user_id") % 10).as("cohort"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("cohort"))
  }

  /** Streaming/batch parity as an oracle row: the watermarked tumbling
    * window agg (streaming.EventsStream.hourlyCounts) run as a REAL
    * Structured Streaming query — file source, AvailableNow trigger,
    * complete-mode memory sink — must equal the batch SQL DuckDB runs.
    * Complete mode re-emits the full aggregate on the final batch, so the
    * sink table is deterministic regardless of how the trigger splits the
    * input into micro-batches (the property that makes this gate honest:
    * a watermark/state bug would desync it from the batch oracle). */
  val q205_stream_batch_parity: Q = (s, d) => {
    s.catalog.dropTempView("q205_sink")
    val q = graft.streaming.EventsStream
      .hourlyCounts(graft.streaming.EventsStream.readEvents(s, d))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q205_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q205_sink").orderBy(col("win_start"), col("event_type"))
  }

  /** Stream-stream interval join parity: view→purchase attribution
    * (30-min window, both sides watermarked) as a real two-source
    * streaming join. Inner interval joins emit matches eagerly — the
    * watermark only bounds join STATE, not output — so at AvailableNow
    * termination the append-mode sink holds the complete join and can be
    * oracle-checked against DuckDB's batch self-join. */
  val q206_stream_join_parity: Q = (s, d) => {
    s.catalog.dropTempView("q206_sink")
    val src1 = graft.streaming.EventsStream.readEvents(s, d)
    val src2 = graft.streaming.EventsStream.readEvents(s, d)
    val q = graft.streaming.EventsStream
      .viewPurchaseAttribution(src1, src2)
      .writeStream.outputMode("append")
      .format("memory").queryName("q206_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q206_sink").orderBy(col("user_id"), col("view_ts"), col("purchase_ts"))
  }

  /** Session-window streaming parity: the stateful gap-merge case —
    * session_window(30 min) per user as a real streaming query. Session
    * windows exercise the state-store MERGE path (sessions grow and
    * coalesce as events arrive), the machinery the fixed-window q205 row
    * never touches. Complete mode emits the final merged sessions, which
    * must equal the batch gaps-and-islands rewrite DuckDB runs. */
  val q208_stream_session_parity: Q = (s, d) => {
    s.catalog.dropTempView("q208_sink")
    val q = graft.streaming.EventsStream
      .sessionCounts(graft.streaming.EventsStream.readEvents(s, d))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q208_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q208_sink").orderBy(col("user_id"), col("session_start"))
  }

  /** Dynamic-gap sessionization: session_window with a PER-EVENT gap
    * expression — a purchase holds the session open 60 minutes, any
    * other event only 15 (the adaptive-timeout model real clickstream
    * sessionizers use: high-intent actions extend the session). Each
    * event contributes the interval [ts, ts+gap); overlapping intervals
    * merge. The oracle replays the merge as a running-max-of-ends
    * gaps-and-islands rewrite, so the half-open boundary (an event AT
    * the running end starts a NEW session) and the per-type gap routing
    * must both be exact. Same one-exchange-per-user shape as fixed-gap
    * sessionize — scales identically. */
  val q261_dynamic_gap_sessions: Q = (s, d) => {
    val ev = Tables.events(s, d)
    ev.groupBy(
        session_window(col("ts"),
          when(col("event_type") === "purchase", lit("60 minutes"))
            .otherwise(lit("15 minutes"))).as("w"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Streaming exact-dedup parity: first-copy-wins dedup as a REAL
    * streaming aggregation (unbounded keyed state, no watermark — the
    * hcatalog streaming-ingest + dedup shape). Two streaming sources
    * union'd: the full corpus plus a partial REPLAY (every third doc),
    * so copy counts are genuinely mixed (1 or 2) and a state bug that
    * dropped or double-counted a replayed key would desync the gate.
    * Complete mode re-emits the converged groups at AvailableNow
    * termination, so the result is independent of micro-batch splits;
    * keep_id is min(doc_id) — deterministic, unlike dropDuplicates'
    * arrival-order winner. */
  val q217_stream_dedup_parity: Q = (s, d) => {
    s.catalog.dropTempView("q217_sink")
    val schema = Tables.documents(s, d).schema
    def src = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val q = src.unionByName(src.filter(col("doc_id") % 3 === 0))
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("q217_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table("q217_sink").orderBy(col("keep_id"))
  }

  /** Week-cohort retention matrix — the classic warehouse report
    * (cohort = week of first purchase; cell = distinct users from that
    * cohort purchasing again at each week offset; the sparse event type
    * keeps the matrix non-degenerate). One distinct shuffle on
    * (user, week), a per-user min sliver joined back, one final agg —
    * no window over raw events. Offsets are exact multiples of 7 days
    * (both engines truncate weeks to Monday), so the division is exact. */
  val q218_retention_cohorts: Q = (s, d) => {
    val uw = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    uw.join(first, Seq("user_id"))
      .groupBy(col("cohort_wk"),
               (datediff(col("wk"), col("cohort_wk")) / 7).cast("long").as("offset_weeks"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_wk"), col("offset_weeks"))
  }

  /** Streaming LEFT OUTER interval-join parity: unmatched views must
    * surface as null-purchase rows — but only once the watermark proves
    * no match can arrive, so the gate restricts BOTH engines to views at
    * least 2h behind max(ts) (watermark delay 1h + join interval 30m +
    * 30m margin); inside that horizon streamed == batch left join
    * exactly, nulls included. A state bug that dropped an unmatched view
    * (or emitted it twice — once on match, once on eviction) breaks the
    * hash. */
  val q227_stream_left_join_parity: Q = (s, d) => {
    s.catalog.dropTempView("q227_sink")
    val q = graft.streaming.EventsStream
      .viewPurchaseLeftOuter(
        graft.streaming.EventsStream.readEvents(s, d),
        graft.streaming.EventsStream.readEvents(s, d))
      .writeStream.outputMode("append")
      .format("memory").queryName("q227_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val maxTs = Tables.events(s, d).agg(max(col("ts"))).head().getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(maxTs.toInstant.minusSeconds(7200))
    s.table("q227_sink")
      .filter(col("view_ts") <= lit(cutoff))
      .orderBy(col("user_id"), col("view_ts"), col("purchase_ts").asc_nulls_first)
  }

  /** Strict ordered funnel view -> click -> purchase with a 24 h
    * conversion window per stage: each stage's timestamp is the user's
    * earliest event of that type STRICTLY after the previous stage and
    * within one day of it (the classic product-analytics funnel, as
    * multi-pass GROUP BY rather than a per-user event sort). Scale
    * shape: three aggregations and two joins all keyed on user_id —
    * Catalyst plans the exchange once and reuses the partitioning, so
    * raw events shuffle a filtered sliver per stage and there is no
    * window over the full event log. */
  val q233_funnel: Q = (s, d) => {
    val day = expr("INTERVAL 1 DAY")
    val e = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
    val c = e.filter(col("event_type") === "click").join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view") && col("ts") <= col("t_view") + day)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val p = e.filter(col("event_type") === "purchase").join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click") && col("ts") <= col("t_click") + day)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
    v.join(c, Seq("user_id"), "left").join(p, Seq("user_id"), "left")
      .select(
        (lit(1) + when(col("t_click").isNotNull, 1).otherwise(0)
          + when(col("t_purchase").isNotNull, 1).otherwise(0)).as("stage"))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Streaming funnel parity: the q233 semantics as EventTimeTimeout
    * keyed state must agree with the batch multi-pass GROUP BY — but
    * only funnels the watermark has provably CLOSED can compare, so
    * both engines restrict to first views older than
    * max(ts) - 52h (2h watermark delay + 48h funnel horizon + 2h
    * margin). A state bug that lost a stage, double-fired a timeout,
    * or mis-ordered in-batch events breaks the stage counts. */
  val q241_stream_funnel_parity: Q = (s, d) => {
    import s.implicits._
    s.catalog.dropTempView("q241_sink")
    val q = graft.streaming.EventsStream
      .funnelStages(graft.streaming.EventsStream.readEvents(s, d)
        .as[graft.streaming.EventsStream.Event])
      .writeStream.outputMode("append")
      .format("memory").queryName("q241_sink")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val maxTs = Tables.events(s, d).agg(max(col("ts"))).head().getTimestamp(0)
    val cutoff = java.sql.Timestamp.from(maxTs.toInstant.minusSeconds(52L * 3600))
    s.table("q241_sink")
      .filter(col("t_view") < lit(cutoff))
      .groupBy(col("stage")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("stage"))
  }

  /** Rolling 7-day active users (the WAU report): distinct users in
    * the window ending each active day. The only corpus-sized work is
    * ONE distinct on (user, day); that sliver then explodes x7 (each
    * active day feeds the 7 windows it belongs to) and aggregates —
    * no self-join of day ranges, no per-day rescan, which is the shape
    * that survives a year of 100 TB event logs. Windows ending on days
    * with no activity are omitted (semi-join on the active-day set). */
  val q243_rolling_active: Q = (s, d) => {
    val ud = Tables.events(s, d)
      .select(col("user_id"),
              date_trunc("day", col("ts")).cast("date").as("day"))
      .distinct()
    val dayset = ud.select(col("day").as("win_end")).distinct()
    ud.select(col("user_id"), explode(expr("sequence(0, 6)")).as("k"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("k").cast("int")).as("win_end"))
      .join(dayset, Seq("win_end"), "left_semi")
      .groupBy(col("win_end"))
      .agg(countDistinct(col("user_id")).as("wau"))
      .orderBy(col("win_end"))
  }

  /** Within-session transition matrix (the Markov path-mining report —
    * the reference spells it LAG/LEAD over a sessionized PTF): count
    * consecutive event-type pairs inside the 30-min-gap sessions. The
    * (user_id, sid) lead window is satisfied by the user_id hash
    * partition (subset clustering), so ONE exchange feeds all three
    * windows — only a re-sort on (user, sid, ts) is added — then the
    * pair counts aggregate a 25-row sliver. Ordering is total
    * ((ts, event_id) unique), so the lead is deterministic. */
  val q251_session_transitions: Q = (s, d) => {
    val bySess = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    withSessionIds(Tables.events(s, d))
      .withColumn("next_type", lead(col("event_type"), 1).over(bySess))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("from_type"), col("to_type"))
  }

  /** Regular-grid resampling with gap fill — the time-series alignment
    * step every metrics/feature pipeline needs before models or
    * dashboards consume event data (Hive users hand-roll it with a
    * calendar table join + windows; packaged here as one operator).
    * Buckets events onto a fixed step, densifies each key's span via
    * `sequence` + explode (grid size = span/step per key — bounded,
    * data-independent), left-joins the aggregates back, and fills gaps
    * three ways: zero-fill, forward-fill (last observation carried
    * forward), and linear interpolation between the surrounding
    * observations. One shuffle on key for the aggregate, one per-key
    * window sort for the fills — no driver loops, no calendar table.
    * At 100 TB the grid is still |keys| x span/step rows: the operator's
    * cost scales with the REPORT size, not the event volume. */
  def resample(df: org.apache.spark.sql.DataFrame, key: org.apache.spark.sql.Column,
               ts: org.apache.spark.sql.Column, value: org.apache.spark.sql.Column,
               stepSec: Long): org.apache.spark.sql.DataFrame = {
    val bucket = floor(ts.cast("long") / lit(stepSec.toDouble)).cast("long")
    val agg = df.select(key.as("k"), bucket.as("bucket"), value.as("v"))
      .groupBy(col("k"), col("bucket"))
      .agg(count(lit(1)).as("n"),
           sum(col("v").cast(DecimalType(25, 2))).cast("double").as("v"))
    val spans = agg.groupBy(col("k")).agg(min("bucket").as("b0"), max("bucket").as("b1"))
    val grid = spans.select(col("k"), explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val joined = grid.join(agg, Seq("k", "bucket"), "left")
    val past = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val future = Window.partitionBy(col("k")).orderBy(col("bucket"))
      .rowsBetween(0, Window.unboundedFollowing)
    val prevV = last(col("v"), ignoreNulls = true).over(past)
    val prevB = last(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(past)
    val nextV = first(col("v"), ignoreNulls = true).over(future)
    val nextB = first(when(col("v").isNotNull, col("bucket")), ignoreNulls = true).over(future)
    val interp = when(col("v").isNotNull, col("v"))
      .when(prevV.isNull, nextV)
      .when(nextV.isNull, prevV)
      .otherwise(prevV + (nextV - prevV) * (col("bucket") - prevB).cast("double")
                          / (nextB - prevB).cast("double"))
    joined.select(col("k"), col("bucket"),
      coalesce(col("n"), lit(0L)).as("n"),
      coalesce(col("v"), lit(0d)).as("v_zero"),
      prevV.as("v_ffill"),
      interp.as("v_interp"))
  }

  /** Hourly per-type value series, densified and gap-filled three ways
    * (the ~40 missing hours per type at sf0.01 exercise every fill). */
  val q289_resample: Q = (s, d) => {
    resample(Tables.events(s, d), col("event_type"), col("ts"), col("value"), 3600L)
      .select(col("k").as("event_type"), col("bucket"), col("n"),
              round(col("v_zero"), 6).as("v_zero"),
              round(col("v_ffill"), 6).as("v_ffill"),
              round(col("v_interp"), 6).as("v_interp"))
      .orderBy(col("event_type"), col("bucket"))
  }

  /** Streaming ingest into the external store with exactly-once batches
    * — the reference's hcatalog streaming arc (HiveEndPoint +
    * TransactionBatch: a writer commits named txn batches into a table;
    * a replayed batch must not double-write) on the handler seam: each
    * micro-batch lands via KvStore.appendBatch keyed by the batch id, so
    * sink-failure re-delivery is a locked no-op. The oracle recomputes
    * the aggregate straight from the events parquet, so the hash proves
    * the store received exactly one copy of every event. */
  val q306_stream_kv_ingest: Q = (s, d) => {
    val dir = s"target/stream_kv/${new java.io.File(d).getName}/events_store"
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    // fresh store + checkpoint: a prior run's committed batch tags would
    // make this run's (restarted) batch ids replay as no-ops
    fs.delete(new org.apache.hadoop.fs.Path(dir), true)
    fs.delete(new org.apache.hadoop.fs.Path(dir + "_ckpt"), true)
    graft.sources.KvStore.write(s,
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")).limit(0),
      dir, "event_id", numSegments = 2)
    val q = graft.streaming.EventsStream.readEvents(s, d)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        graft.sources.KvStore.appendBatch(b.sparkSession, b, dir,
          numSegments = 2, batchTag = s"b$id")
        ()
      }
      .option("checkpointLocation", dir + "_ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.read.format("graftkv").load(dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast(DecimalType(25, 2))).cast("double").as("sum_value"),
           min(col("event_id")).as("min_id"),
           max(col("event_id")).as("max_id"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, Q] = Map(
    "q306_stream_kv_ingest" -> q306_stream_kv_ingest,
    "q289_resample" -> q289_resample,
    "q251_session_transitions" -> q251_session_transitions,
    "q243_rolling_active" -> q243_rolling_active,
    "q241_stream_funnel_parity" -> q241_stream_funnel_parity,
    "q233_funnel" -> q233_funnel,
    "q208_stream_session_parity" -> q208_stream_session_parity,
    "q261_dynamic_gap_sessions" -> q261_dynamic_gap_sessions,
    "q217_stream_dedup_parity" -> q217_stream_dedup_parity,
    "q227_stream_left_join_parity" -> q227_stream_left_join_parity,
    "q218_retention_cohorts" -> q218_retention_cohorts,
    "q71_tumbling_window" -> q71_tumbling_window,
    "q72_sliding_window" -> q72_sliding_window,
    "q73_sessionize" -> q73_sessionize,
    "q74_pivot" -> q74_pivot,
    "q205_stream_batch_parity" -> q205_stream_batch_parity,
    "q206_stream_join_parity" -> q206_stream_join_parity,
  )

  /** DuckDB-side microsecond truncation of the ns timestamps. */
  private val tsMu = "make_timestamp(epoch_ns(ts) // 1000)"

  /** Gaps-and-islands sessionization CTEs (e/l/f/s, 30-min gap), shared
    * by the q73 oracle and RangeJoin's q237 oracle so the two spellings
    * can never drift; `e` carries a superset of the columns either
    * consumer needs. */
  private[operators] def sessionIslandCtes: String =
    s"""e AS (SELECT event_id, user_id, event_type, $tsMu AS tmu, value FROM events),
       |  l AS (SELECT *, LAG(tmu) OVER (PARTITION BY user_id ORDER BY tmu, event_id) AS prev_ts FROM e),
       |  f AS (SELECT *, CASE WHEN prev_ts IS NULL
       |                        OR epoch_us(tmu) - epoch_us(prev_ts) > 1800 * 1000000
       |                       THEN 1 ELSE 0 END AS brk FROM l),
       |  s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tmu, event_id
       |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM f)""".stripMargin

  /** The q233 funnel stage CTEs + final stage count, shared verbatim by
    * the batch (q233) and streaming-parity (q241) oracles so the two
    * can never drift; `where` injects the parity gate's cutoff. */
  private def funnelSql(where: String): String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, $tsMu AS ts FROM events),
       |v AS (SELECT user_id, min(ts) AS t_view FROM e
       |      WHERE event_type = 'view' GROUP BY 1),
       |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM e
       |      JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts > v.t_view
       |        AND e.ts <= v.t_view + INTERVAL 1 DAY GROUP BY 1),
       |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM e
       |      JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
       |        AND e.ts <= c.t_click + INTERVAL 1 DAY GROUP BY 1)
       |SELECT 1 + (CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
       |         + (CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS stage,
       |  count(1) AS n_users
       |FROM v LEFT JOIN c ON v.user_id = c.user_id
       |       LEFT JOIN p ON v.user_id = p.user_id
       |$where
       |GROUP BY 1 ORDER BY 1""".stripMargin

  val oracles: Map[String, String] = Map(
    "q306_stream_kv_ingest" ->
      """SELECT event_type, COUNT(1) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
        |  MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,
    "q289_resample" ->
      """WITH b AS (SELECT event_type AS k,
        |             CAST(floor(epoch(ts)/3600) AS BIGINT) AS bucket, value
        |           FROM events),
        |a AS (SELECT k, bucket, CAST(count(*) AS BIGINT) AS n,
        |        CAST(sum(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS v
        |      FROM b GROUP BY 1, 2),
        |s AS (SELECT k, min(bucket) AS b0, max(bucket) AS b1 FROM a GROUP BY 1),
        |g AS (SELECT k, unnest(generate_series(b0, b1)) AS bucket FROM s),
        |j AS (SELECT g.k, g.bucket, a.n, a.v
        |      FROM g LEFT JOIN a ON a.k = g.k AND a.bucket = g.bucket),
        |w AS (SELECT k, bucket, n, v,
        |    last_value(v IGNORE NULLS) OVER
        |      (PARTITION BY k ORDER BY bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    last_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
        |      (PARTITION BY k ORDER BY bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pb,
        |    first_value(v IGNORE NULLS) OVER
        |      (PARTITION BY k ORDER BY bucket
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
        |    first_value(CASE WHEN v IS NOT NULL THEN bucket END IGNORE NULLS) OVER
        |      (PARTITION BY k ORDER BY bucket
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
        |  FROM j)
        |SELECT k AS event_type, bucket, coalesce(n, 0) AS n,
        |  round(coalesce(v, 0), 6) AS v_zero,
        |  round(pv, 6) AS v_ffill,
        |  round(CASE WHEN v IS NOT NULL THEN v
        |             WHEN pv IS NULL THEN nv
        |             WHEN nv IS NULL THEN pv
        |             ELSE pv + (nv - pv) * (bucket - pb)
        |                       / CAST(nb - pb AS DOUBLE) END, 6) AS v_interp
        |FROM w ORDER BY event_type, bucket""".stripMargin,
    "q251_session_transitions" ->
      s"""WITH $sessionIslandCtes,
         |p AS (SELECT event_type,
         |        LEAD(event_type) OVER (PARTITION BY user_id, sid
         |                               ORDER BY tmu, event_id) AS next_type
         |      FROM s)
         |SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
         |FROM p WHERE next_type IS NOT NULL
         |GROUP BY 1, 2 ORDER BY n DESC, from_type, to_type""".stripMargin,
    "q243_rolling_active" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
        |  FROM events),
        |ex AS (SELECT user_id, day + CAST(k AS INTEGER) AS win_end
        |       FROM ud CROSS JOIN (SELECT unnest(range(0, 7)) AS k) ks),
        |days AS (SELECT DISTINCT day AS win_end FROM ud)
        |SELECT e.win_end, count(DISTINCT e.user_id) AS wau
        |FROM ex e JOIN days d ON e.win_end = d.win_end
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q241_stream_funnel_parity" -> funnelSql(
      "WHERE v.t_view < (SELECT max(ts) FROM e) - INTERVAL 52 HOUR"),
    "q233_funnel" -> funnelSql(""),
    "q227_stream_left_join_parity" ->
      s"""WITH e AS (
         |  SELECT user_id, event_type, $tsMu AS ts FROM events),
         |mx AS (SELECT max(ts) AS mts FROM (SELECT $tsMu AS ts FROM events)),
         |v AS (SELECT user_id, ts AS view_ts FROM e WHERE event_type = 'view'),
         |p AS (SELECT user_id AS p_user, ts AS purchase_ts FROM e
         |      WHERE event_type = 'purchase')
         |SELECT v.user_id, v.view_ts, p.purchase_ts
         |FROM v LEFT JOIN p ON v.user_id = p.p_user
         |  AND p.purchase_ts >= v.view_ts
         |  AND p.purchase_ts <= v.view_ts + INTERVAL 30 MINUTE
         |WHERE v.view_ts <= (SELECT mts FROM mx) - INTERVAL 2 HOUR
         |ORDER BY user_id, view_ts, purchase_ts NULLS FIRST""".stripMargin,
    "q217_stream_dedup_parity" ->
      """WITH c AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0)
        |SELECT min(doc_id) AS keep_id, count(1) AS n_copies
        |FROM c GROUP BY text ORDER BY keep_id""".stripMargin,
    "q218_retention_cohorts" ->
      """WITH uw AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events WHERE event_type = 'purchase'),
        |f AS (SELECT user_id, min(wk) AS cohort_wk FROM uw GROUP BY user_id)
        |SELECT f.cohort_wk,
        |  CAST((uw.wk - f.cohort_wk) / 7 AS BIGINT) AS offset_weeks,
        |  count(1) AS n_active
        |FROM uw JOIN f ON uw.user_id = f.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q71_tumbling_window" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', $tsMu) AS win_start, event_type,
         |  COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q72_sliding_window" ->
      s"""WITH e AS (SELECT $tsMu AS tmu, value FROM events),
         |  x AS (SELECT tmu, value,
         |          unnest([time_bucket(INTERVAL '30 minutes', tmu),
         |                  time_bucket(INTERVAL '30 minutes', tmu) - INTERVAL '30 minutes']) AS win_start
         |        FROM e)
         |SELECT win_start, COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
         |FROM x GROUP BY win_start ORDER BY win_start""".stripMargin,
    "q73_sessionize" ->
      s"""WITH $sessionIslandCtes
         |SELECT user_id, CAST(sid AS BIGINT) AS sid, COUNT(1) AS n_events,
         |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value,
         |  CAST(epoch_us(MAX(tmu)) // 1000000 - epoch_us(MIN(tmu)) // 1000000 AS BIGINT) AS duration_s
         |FROM s GROUP BY user_id, sid ORDER BY user_id, sid""".stripMargin,
    "q208_stream_session_parity" ->
      s"""WITH e AS (SELECT user_id, $tsMu AS tmu FROM events),
         |  l AS (SELECT *, LAG(tmu) OVER (PARTITION BY user_id ORDER BY tmu) AS prev_ts FROM e),
         |  f AS (SELECT *, CASE WHEN prev_ts IS NULL
         |                        OR epoch_us(tmu) - epoch_us(prev_ts) > 1800 * 1000000
         |                       THEN 1 ELSE 0 END AS brk FROM l),
         |  s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tmu
         |                                 ROWS UNBOUNDED PRECEDING) AS sid FROM f)
         |SELECT user_id, MIN(tmu) AS session_start, COUNT(1) AS n_events
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q261_dynamic_gap_sessions" ->
      s"""WITH e AS (SELECT user_id, event_type, $tsMu AS tmu FROM events),
         |g AS (SELECT user_id, tmu,
         |        epoch_us(tmu) + CASE WHEN event_type = 'purchase'
         |                             THEN 3600 ELSE 900 END
         |                        * CAST(1000000 AS BIGINT) AS eend
         |      FROM e),
         |m AS (SELECT user_id, tmu,
         |        CASE WHEN epoch_us(tmu) >= MAX(eend) OVER
         |               (PARTITION BY user_id ORDER BY tmu
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |             THEN 1 ELSE 0 END AS brk
         |      FROM g),
         |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY tmu
         |                               ROWS UNBOUNDED PRECEDING) AS sid FROM m)
         |SELECT user_id, MIN(tmu) AS session_start, COUNT(1) AS n_events
         |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,
    "q205_stream_batch_parity" ->
      s"""SELECT time_bucket(INTERVAL '1 hour', $tsMu) AS win_start, event_type,
         |  COUNT(1) AS n,
         |  CAST(SUM(CAST(value AS DECIMAL(25,2))) AS DOUBLE) AS sum_value
         |FROM events
         |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "q206_stream_join_parity" ->
      s"""SELECT v.user_id AS user_id, v.tmu AS view_ts, p.tmu AS purchase_ts
         |FROM (SELECT user_id, $tsMu AS tmu FROM events WHERE event_type = 'view') v
         |JOIN (SELECT user_id, $tsMu AS tmu FROM events WHERE event_type = 'purchase') p
         |  ON v.user_id = p.user_id
         | AND p.tmu >= v.tmu AND p.tmu <= v.tmu + INTERVAL '30 minutes'
         |ORDER BY user_id, view_ts, purchase_ts""".stripMargin,
    "q74_pivot" ->
      """SELECT user_id % 10 AS cohort,
        |  COUNT(1) FILTER (event_type = 'click') AS click,
        |  COUNT(1) FILTER (event_type = 'view') AS view,
        |  COUNT(1) FILTER (event_type = 'purchase') AS purchase,
        |  COUNT(1) FILTER (event_type = 'signup') AS signup,
        |  COUNT(1) FILTER (event_type = 'error') AS error
        |FROM events GROUP BY 1 ORDER BY cohort""".stripMargin,
  )
}
