package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming over the `events` table — the engine's upgrade of
  * the reference's ingest-only streaming (hcatalog/streaming/.../
  * HiveEndPoint.java, TransactionBatch.java; SURVEY.md §2.10 maps its txn
  * protocol to exactly-once file-sink commits). Queries are the streaming
  * twins of operators.EventsOps: same aggregates, plus watermarks for
  * late data and keyed state for custom sessionization.
  *
  * At scale: state size is bounded by (watermark horizon x key
  * cardinality); the 2h watermark drops events later than that instead of
  * growing state without bound.
  */
object EventsStream {

  /** THE event-time <-> micros contract, shared by every stateful
    * operator here (flatMapGroupsWithState and transformWithState twins
    * are pinned row-for-row against each other — one conversion, one
    * place to fix, like the Tables.events/readEvents dual chokepoint). */
  private[streaming] def us(t: java.sql.Timestamp): Long = {
    val i = t.toInstant; i.getEpochSecond * 1000000L + i.getNano / 1000L
  }
  private[streaming] def ts(u: Long): java.sql.Timestamp = java.sql.Timestamp.from(
    java.time.Instant.ofEpochSecond(u / 1000000L, (u % 1000000L) * 1000L))

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double, props: String)

  case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

  /** File-source stream of events; schema taken from the batch reader and
    * `ts` normalized to TimestampType exactly like Tables.events (nanos-long
    * and TIMESTAMP_NTZ encodings both handled) — withWatermark requires
    * TimestampType, so the normalization must happen before any event-time
    * operator. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/events.parquet")
    // the file stream source wants a directory; glob-filter to the one table
    val stream = spark.readStream
      .schema(raw.schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    raw.schema("ts").dataType match {
      case LongType => stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => stream.withColumn("ts", col("ts").cast(TimestampType))
      case _ => stream
    }
  }

  /** Watermarked tumbling-window counts (streaming twin of
    * q71_tumbling_window). */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(DecimalType(25, 2))).cast("double").as("sum_value"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))

  /** Built-in session windows (30-min gap), watermarked. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))

  /** Streaming exact dedup at ingest: drop replayed/duplicate records by
    * key inside the watermark horizon — the streaming twin of
    * q64_dedup_exact, and the idempotency layer a training-data ingest
    * pipeline puts in front of everything else. State is bounded by
    * (watermark horizon x arrival rate): dropDuplicatesWithinWatermark
    * evicts keys once the watermark passes them, so a replay storm cannot
    * grow state without bound. */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: purchases attributed to a view by the
    * same user within 30 minutes. Both sides watermarked so the join
    * state is bounded — late rows beyond the horizon are dropped instead
    * of held forever, the property that keeps a 100 TB/day attribution
    * join from accumulating unbounded state. */
  def viewPurchaseAttribution(views: DataFrame, purchases: DataFrame,
                              joinType: String = "inner"): DataFrame = {
    val v = views.filter(col("event_type") === "view")
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts").as("view_ts"))
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"))
    v.join(p,
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
        joinType)
      .select(col("user_id"), col("view_ts"), col("purchase_ts"))
  }

  /** LEFT OUTER stream-stream interval join: unmatched views emit a
    * null-purchase row only once the watermark proves no match can still
    * arrive (state eviction at view_ts + interval < watermark — the
    * no-data micro-batch after the last file advances it to
    * max(ts) - delay and flushes). Callers comparing against a batch
    * left join must therefore restrict both sides to views safely
    * behind the final watermark; q227 uses max(ts) - 2h (delay 1h +
    * interval 30m + 30m margin). */
  def viewPurchaseLeftOuter(views: DataFrame, purchases: DataFrame): DataFrame =
    viewPurchaseAttribution(views, purchases, "left_outer")

  case class OpenSession(user_id: Long, startUs: Long, endUs: Long, n: Long)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Long)

  /** Hand-rolled sessionization on EventTimeTimeout state — the surface
    * session_window cannot give you: emit ONLY when a session closes,
    * either because a later event broke the gap in-stream or because the
    * WATERMARK passed session_end + gap (state.hasTimedOut) and no
    * extension can ever arrive. That timeout close is exactly how a
    * 100 TB ingest bounds its keyed state: every open session is
    * guaranteed to leave memory one gap past the watermark.
    *
    * In-batch events merge in event-time order (a micro-batch delivers
    * its rows unordered); cross-batch ordering is the caller's watermark
    * contract, same as session_window's. */
  def timeoutSessions(events: Dataset[Event], gapMinutes: Int = 30,
                      delay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            Iterator.single(SessionOut(uid, ts(s.startUs), ts(s.endUs), s.n))
          } else {
            val times = rows.map(e => us(e.ts)).toArray.sorted
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var acc = state.getOption
            times.foreach { t =>
              acc match {
                case None => acc = Some(OpenSession(uid, t, t, 1L))
                case Some(s) if t - s.endUs <= gapUs =>
                  acc = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(uid, ts(s.startUs), ts(s.endUs), s.n)
                  acc = Some(OpenSession(uid, t, t, 1L))
              }
            }
            acc.foreach { open =>
              state.update(open)
              // timeout fires once the WATERMARK (not the clock) passes
              // session_end + gap; millis per the GroupState contract
              state.setTimeoutTimestamp(open.endUs / 1000L + gapMinutes * 60000L)
            }
            out.iterator
          }
      }
  }

  case class FunnelState(tViewUs: Long, tClickUs: Long, tPurchUs: Long)
  case class FunnelOut(user_id: Long, t_view: java.sql.Timestamp, stage: Int)

  /** Streaming strict funnel view -> click -> purchase with 24 h
    * per-stage conversion windows (operators.EventsOps.q233's batch
    * semantics as keyed state): each user's state is three stage
    * timestamps, advanced by events replayed in event-time order within
    * the batch; the funnel CLOSES — and emits exactly once — when the
    * WATERMARK passes t_view + 48 h, after which no event inside either
    * conversion window can still arrive. State is bounded the same way
    * as [[timeoutSessions]]: every open funnel leaves memory one
    * horizon past the watermark. Cross-batch event-time ordering is the
    * caller's watermark contract, as with session_window. */
  def funnelStages(events: Dataset[Event],
                   delay: String = "2 hours"): Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val dayUs = 86400L * 1000000L
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val s = state.get; state.remove()
            val stage = 1 + (if (s.tClickUs >= 0) 1 else 0) +
              (if (s.tPurchUs >= 0) 1 else 0)
            Iterator.single(FunnelOut(uid, ts(s.tViewUs), stage))
          } else {
            var s = state.getOption.getOrElse(FunnelState(-1L, -1L, -1L))
            rows.toArray.sortBy(e => (us(e.ts), e.event_id)).foreach { e =>
              val t = us(e.ts)
              e.event_type match {
                case "view" if s.tViewUs < 0 => s = s.copy(tViewUs = t)
                case "click" if s.tViewUs >= 0 && s.tClickUs < 0 &&
                  t > s.tViewUs && t <= s.tViewUs + dayUs =>
                  s = s.copy(tClickUs = t)
                case "purchase" if s.tClickUs >= 0 && s.tPurchUs < 0 &&
                  t > s.tClickUs && t <= s.tClickUs + dayUs =>
                  s = s.copy(tPurchUs = t)
                case _ =>
              }
            }
            if (s.tViewUs >= 0) {
              state.update(s)
              // both conversion windows are closed 48h after the first
              // view; fire on the WATERMARK one horizon past it
              state.setTimeoutTimestamp(s.tViewUs / 1000L + 2 * 86400000L)
            }
            Iterator.empty
          }
      }
  }

  /** Custom keyed state via flatMapGroupsWithState: running per-user
    * totals emitted on every update (the mapGroupsWithState surface the
    * reference has no analog for). */
  def runningUserTotals(events: Dataset[Event]): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserTotals, UserTotals](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Event], state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(uid, 0L, 0.0))
          var n = prev.n_events
          var s = prev.sum_value
          rows.foreach { e => n += 1; s += e.value }
          val next = UserTotals(uid, n, s)
          state.update(next)
          Iterator.single(next)
      }
  }

  /** [[timeoutSessions]] re-expressed on Spark 4's transformWithState —
    * the arbitrary-state API that SUPERSEDES flatMapGroupsWithState
    * (typed ValueState/ListState/MapState handles, explicit event-time
    * TIMERS instead of one implicit timeout, RocksDB-backed). Semantics
    * are identical by construction: merge in-batch events in event-time
    * order, close a session when a later event breaks the gap in-stream,
    * or when the WATERMARK timer at session_end + gap fires and no
    * extension can ever arrive. Timer discipline: one live timer per
    * key — each extension deletes the stale timer before registering the
    * new one, and the expiry handler re-checks the CURRENT session end
    * so a racing stale timer can never close an extended session.
    * StreamingSpec pins this twin row-for-row against the
    * flatMapGroupsWithState implementation on the closed-form corpus.
    *
    * Requires the RocksDB state-store provider
    * (spark.sql.streaming.stateStore.providerClass) — the processor is
    * where a 100 TB ingest keeps per-key state off-heap. */
  class SessionProcessor(gapMinutes: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.{Encoders, streaming => ss}

    private val gapUs = gapMinutes * 60L * 1000000L
    @transient private var open: ValueState[OpenSession] = _

    private def timerMs(endUs: Long) = endUs / 1000L + gapMinutes * 60000L

    override def init(outputMode: ss.OutputMode, timeMode: ss.TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val times = rows.map(e => us(e.ts)).toArray.sorted
      val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
      var acc = if (open.exists()) Some(open.get()) else None
      val prevTimer = acc.map(s => timerMs(s.endUs))
      times.foreach { t =>
        acc match {
          case None => acc = Some(OpenSession(uid, t, t, 1L))
          case Some(s) if t - s.endUs <= gapUs =>
            acc = Some(s.copy(endUs = math.max(s.endUs, t), n = s.n + 1))
          case Some(s) =>
            out += SessionOut(uid, ts(s.startUs), ts(s.endUs), s.n)
            acc = Some(OpenSession(uid, t, t, 1L))
        }
      }
      acc.foreach { o =>
        open.update(o)
        val next = timerMs(o.endUs)
        if (!prevTimer.contains(next)) {
          prevTimer.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(next)
        }
      }
      out.iterator
    }

    override def handleExpiredTimer(uid: Long, timerValues: TimerValues,
                                    info: ExpiredTimerInfo): Iterator[SessionOut] = {
      // act only if this timer matches the CURRENT session end (a stale
      // timer surviving an extension must not close the new session)
      if (open.exists()) {
        val s = open.get()
        if (info.getExpiryTimeInMs >= timerMs(s.endUs)) {
          open.clear()
          return Iterator.single(SessionOut(uid, ts(s.startUs), ts(s.endUs), s.n))
        }
      }
      Iterator.empty
    }
  }

  /** transformWithState twin of [[timeoutSessions]]. */
  def twsSessions(events: Dataset[Event], gapMinutes: Int = 30,
                  delay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
