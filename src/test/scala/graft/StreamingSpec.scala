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

  test("streaming session windows cover every event") {
    val q = EventsStream.sessionCounts(EventsStream.readEvents(spark, sf))
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions")
      .start()
    try q.processAllAvailable() finally q.stop()
    val total = spark.table("sessions").agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
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
