package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream

/** Structured Streaming surface: the streaming queries must converge to
  * the same answers as their batch twins once all input is processed. */
class StreamingSpec extends AnyFunSuite {
  import TestSession._

  test("streaming hourly counts equal the batch tumbling windows") {
    val q = EventsStream.hourlyCounts(EventsStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly")
      .orderBy("win_start", "event_type")
      .collect()
    val batch = SparkEntry.queries("q71_tumbling_window")(spark, sf).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("streaming hourly counts hold at sf0.1 (100x the unit-test scale)") {
    // the state-size story (watermark horizon x key cardinality), checked
    // at the bench scale rather than the 0.001 unit-test slice
    val bigSf = "/root/testdata/sf0.1"
    val q = EventsStream.hourlyCounts(EventsStream.readEvents(spark, bigSf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_big")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_big")
      .orderBy("win_start", "event_type").collect()
    val batch = SparkEntry.queries("q71_tumbling_window")(spark, bigSf).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("streaming session windows cover every event") {
    val q = EventsStream.sessionCounts(EventsStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("sessions").agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }

  test("streaming dedup-at-ingest drops replayed records exactly") {
    // replay the whole table twice through the stream: the deduped count
    // must equal the batch distinct-key count, not 2x
    val dir = "target/stream_dedup_src"
    val once = Tables.events(spark, sf)
    once.write.mode("overwrite").parquet(dir)
    once.write.mode("append").parquet(dir)
    val raw = spark.read.parquet(dir)
    val stream0 = spark.readStream.schema(raw.schema).parquet(dir)
    val stream =
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        stream0.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else stream0
    val q = EventsStream.dedupedEvents(stream)
      .groupBy().count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("deduped")
      .start()
    try q.processAllAvailable() finally q.stop()
    val deduped = spark.table("deduped").collect()(0).getLong(0)
    val expected = once.select("event_id").distinct().count()
    assert(deduped == expected,
      s"replayed stream must dedup to $expected, got $deduped")
  }

  test("stream-stream interval join converges to the batch join") {
    val q = EventsStream.viewPurchaseAttribution(
        EventsStream.readEvents(spark, sf), EventsStream.readEvents(spark, sf))
      .writeStream.outputMode("append")
      .format("memory").queryName("attribution")
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attribution").count()
    val ev = Tables.events(spark, sf)
    val batch = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
      .join(ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("purchase_ts")),
        col("user_id") === col("p_user") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .count()
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    assert(batch > 0, "fixture should contain attributable purchases")
  }

  test("streaming document curation converges to the batch gate") {
    // the nightly q121-style curation (quality bar + first-copy-wins
    // exact dedup) run as a stream: micro-batched documents, dedup on
    // the text key via dropDuplicates, quality as a scan-side filter.
    // Once all input is processed the kept doc_id set must equal the
    // batch spelling's. Documents carry no event time, so this is the
    // unbounded-state variant — the watermark-bounded form is the
    // events-path dedup test above.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    val in = MemoryStream[(Long, String)]
    val q = in.toDS().toDF("doc_id", "text")
      .filter(graft.operators.TextAnalysis.qualityExpr >= 0.5)
      .dropDuplicates("text")
      .writeStream.outputMode("append")
      .format("memory").queryName("curated_stream")
      .start()
    try {
      docs.grouped(100).foreach { chunk => in.addData(chunk.toSeq); q.processAllAvailable() }
    } finally q.stop()
    // which doc_id survives per duplicate text depends on intra-batch
    // scheduling, but the kept TEXT set is deterministic: exactly one
    // representative per distinct above-bar text
    val streamed = spark.table("curated_stream")
      .select("text").collect().map(_.getString(0)).toSet
    val batch = Tables.documents(spark, sf)
      .filter(graft.operators.TextAnalysis.qualityExpr >= 0.5)
      .select("text").distinct().collect().map(_.getString(0)).toSet
    assert(streamed == batch,
      s"streamed curation kept ${streamed.size} texts, batch kept ${batch.size}")
    assert(spark.table("curated_stream").count() == batch.size,
      "stream emitted more than one representative for some text")
    assert(batch.nonEmpty, "curation gate should keep some documents")
  }

  test("EventTimeTimeout sessions close exactly on gap break or watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def ev(uid: Long, minute: Long) = EventsStream.Event(
      uid * 10000 + minute, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(minute.toInt)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))),
      uid, "view", 1.0, "{}")
    val in = MemoryStream[EventsStream.Event]
    val q = EventsStream.timeoutSessions(in.toDS(), gapMinutes = 30,
        delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("timeout_sessions")
      .start()
    try {
      // user 1: minutes 0,10,20 (session A), then 60,65 (session B —
      // 40-min gap closes A in-stream); user 2: a single event
      in.addData(ev(1, 0), ev(1, 10), ev(1, 20), ev(2, 5))
      q.processAllAvailable()
      in.addData(ev(1, 60), ev(1, 65))
      q.processAllAvailable()
      // sentinel far in the future: watermark passes every session's
      // end + gap, so B and user 2's singleton close via hasTimedOut
      in.addData(ev(99, 10000))
      q.processAllAvailable()
      // one more batch so the timeout (evaluated against the advanced
      // watermark) actually fires
      in.addData(ev(99, 10001))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("timeout_sessions")
      .filter(col("user_id") < 99)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:20:00.0", 3L),
      (1L, "2024-01-01 01:00:00.0", "2024-01-01 01:05:00.0", 2L),
      (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", 1L)), out)
  }

  test("transformWithState sessions (Spark 4 StatefulProcessor) match the " +
      "flatMapGroupsWithState twin on the closed-form corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // transformWithState requires the RocksDB state store provider
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    def ev(uid: Long, minute: Long) = EventsStream.Event(
      uid * 10000 + minute, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(minute.toInt)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))),
      uid, "view", 1.0, "{}")
    val in = MemoryStream[EventsStream.Event]
    val q = EventsStream.twsSessions(in.toDS(), gapMinutes = 30, delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("tws_sessions")
      .start()
    try {
      // identical feed to the flatMapGroupsWithState test above: session A
      // closes in-stream on the 40-min gap; B + the singleton close when
      // the watermark timer at end + gap fires
      in.addData(ev(1, 0), ev(1, 10), ev(1, 20), ev(2, 5))
      q.processAllAvailable()
      in.addData(ev(1, 60), ev(1, 65))
      q.processAllAvailable()
      in.addData(ev(99, 10000))
      q.processAllAvailable()
      in.addData(ev(99, 10001))
      q.processAllAvailable()
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
    val out = spark.table("tws_sessions")
      .filter(col("user_id") < 99)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect().map(r => (r.getLong(0),
        r.getTimestamp(1).toString, r.getTimestamp(2).toString, r.getLong(3))).toSet
    assert(out == Set(
      (1L, "2024-01-01 00:00:00.0", "2024-01-01 00:20:00.0", 3L),
      (1L, "2024-01-01 01:00:00.0", "2024-01-01 01:05:00.0", 2L),
      (2L, "2024-01-01 00:05:00.0", "2024-01-01 00:05:00.0", 1L)), out)
  }

  test("streaming funnel state machine: windows, ordering, and single emission") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    var nextId = 0L
    def ev(uid: Long, tpe: String, minute: Long) = {
      nextId += 1
      EventsStream.Event(nextId, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusMinutes(minute.toInt)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))),
        uid, tpe, 1.0, "{}")
    }
    val in = MemoryStream[EventsStream.Event]
    val q = EventsStream.funnelStages(in.toDS(), delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_sink")
      .start()
    try {
      in.addData(
        // user 1: full funnel inside the windows -> stage 3
        ev(1, "view", 0), ev(1, "click", 30), ev(1, "purchase", 60),
        // user 2: click lands OUTSIDE the 24h window -> stage 1
        ev(2, "view", 0), ev(2, "click", 60 * 25),
        // user 3: click before the first view never counts -> stage 1
        ev(3, "click", 0), ev(3, "view", 10),
        // user 4: purchase before the click never counts -> stage 2
        ev(4, "view", 0), ev(4, "purchase", 5), ev(4, "click", 10),
        // user 5: second view must not reset the funnel clock -> stage 2
        ev(5, "view", 0), ev(5, "view", 60 * 30), ev(5, "click", 20))
      q.processAllAvailable()
      // watermark sentinel far past every t_view + 48h horizon, then one
      // more batch so the timeouts fire against the advanced watermark
      in.addData(ev(99, "view", 60 * 24 * 40))
      q.processAllAvailable()
      in.addData(ev(99, "view", 60 * 24 * 40 + 1))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("funnel_sink").filter(col("user_id") < 99)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSeq
    // exactly one emission per user, at the expected stage
    assert(out.sorted == Seq((1L, 3), (2L, 1), (3L, 1), (4L, 2), (5L, 2)),
      out.sortBy(_._1).mkString(", "))
  }

  test("flatMapGroupsWithState running totals reach the batch totals") {
    import spark.implicits._
    val events = EventsStream.readEvents(spark, sf).as[EventsStream.Event]
    val q = EventsStream.runningUserTotals(events)
      .writeStream.outputMode("update")
      .format("memory").queryName("running")
      .start()
    try q.processAllAvailable() finally q.stop()
    // last update per user = final totals
    val finalTotals = spark.table("running")
      .groupBy("user_id").agg(max("n_events").as("n"))
    val batch = Tables.events(spark, sf).groupBy("user_id").count()
    val joined = finalTotals.join(batch, "user_id")
      .filter(col("n") =!= col("count")).count()
    assert(joined == 0, "a user's streamed running count disagrees with batch")
  }
}
