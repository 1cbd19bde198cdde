package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream.Event

/** Late-data semantics: with a watermark, events older than
  * (max seen event time - delay) are dropped once the watermark has
  * advanced past their window in append mode — the policy SURVEY.md
  * §2.10 says is ours to define (Structured Streaming defaults). */
class WatermarkSpec extends AnyFunSuite {
  import TestSession._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("watermark drops events later than the delay; on-time late events still count") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val counts = input.toDF()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
    val q = counts.writeStream.outputMode("append")
      .format("memory").queryName("wm").start()
    try {
      def ev(id: Long, m: Int) = Event(id, ts(m), 1L, "view", 1.0, "{}")
      // batch 1: events at 10:00-10:04 and 10:31 (advances watermark to 10:21)
      input.addData(ev(1, 0), ev(2, 4), ev(3, 31))
      q.processAllAvailable()
      // batch 2: a too-late event at 10:02 (window [10:00,10:05) closed,
      // watermark 10:21) must be DROPPED; 10:33 is on time
      input.addData(ev(4, 2), ev(5, 33))
      q.processAllAvailable()
      // batch 3: advance watermark far enough to close + emit all windows
      input.addData(ev(6, 59))
      q.processAllAvailable()

      val out = spark.table("wm").collect()
        .map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
      // [10:00,10:05) emitted with 2 events — the late ev(4) was dropped
      assert(out("2024-01-01 10:00:00.0") == 2L, out.toString)
      // [10:30,10:35) holds ev(3) and the on-time ev(5)
      assert(out("2024-01-01 10:30:00.0") == 2L, out.toString)
    } finally q.stop()
  }
}
