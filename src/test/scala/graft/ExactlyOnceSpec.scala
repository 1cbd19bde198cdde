package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventsStream.Event

/** Exactly-once file-sink semantics — the engine's replacement for the
  * reference's transactional ingest protocol (hcatalog streaming
  * TransactionBatch commit, SURVEY.md §3.3): the parquet sink's
  * _spark_metadata commit log (a) makes batch commits idempotent — a
  * writer replaying an already-committed batchId is ignored — and
  * (b) scopes readers to committed files only, so partial/orphan files
  * are invisible. */
class ExactlyOnceSpec extends AnyFunSuite {
  import TestSession._

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("sink commit log: replayed batch ids are idempotent, readers see only committed files") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_eo_out").toString

    def ev(id: Long, m: Int) = Event(id, ts(m), 1L, "view", 1.0, "{}")

    // writer 1: commit batches 0 and 1
    val in1 = MemoryStream[Event]
    val q1 = in1.toDF().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("graft_eo_c1").toString)
      .start()
    try {
      in1.addData(ev(1, 1), ev(2, 2)); q1.processAllAvailable()
      in1.addData(ev(3, 3)); q1.processAllAvailable()
    } finally q1.stop()
    assert(spark.read.parquet(out).count() == 3)

    // writer 2: fresh checkpoint restarts at batchId 0 — the sink log
    // already committed batch 0, so this "replay" MUST be ignored
    // (idempotent commit, the heart of exactly-once on failure/retry)
    val in2 = MemoryStream[Event]
    val q2 = in2.toDF().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", Files.createTempDirectory("graft_eo_c2").toString)
      .start()
    try { in2.addData(ev(99, 4)); q2.processAllAvailable() } finally q2.stop()

    // orphan file dropped into the directory outside the commit log —
    // committed-files-only reads must not see it
    Tables.events(spark, sf).limit(5)
      .write.mode("append").parquet(s"$out/../orphan_stage")
    val orphan = new java.io.File(s"$out/../orphan_stage").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(orphan.toPath,
      java.nio.file.Paths.get(s"$out/zz-orphan.parquet"))

    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)),
      s"sink shows ${ids.mkString(",")} — replayed batch or orphan leaked in")
  }

  test("streaming upserts into a copy-on-write table; replayed batch leaves state unchanged") {
    // The reference's second ingest mode writes streams into ACID tables
    // (hcatalog streaming mutate API / MERGE on the transactional line).
    // Spark-first analog: foreachBatch + CopyOnWrite.merge. Keyed upserts
    // are idempotent by construction — re-merging an already-applied
    // batch replaces rows with themselves — so a foreachBatch replay
    // after a checkpoint-less restart converges to the same state.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tbl = Files.createTempDirectory("graft_eo_cow").toString + "/t"
    Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 0.0), (5L, 0.0))
      .toDF("id", "v").write.parquet(tbl)

    val in = MemoryStream[(Long, Double)]
    val q = in.toDS().toDF("id", "v").writeStream
      .outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        acid.CopyOnWrite.merge(spark, tbl, batch, Seq("id")); ()
      }
      .option("checkpointLocation", Files.createTempDirectory("graft_eo_cowc").toString)
      .start()
    try {
      in.addData((3L, 10.0), (4L, 10.0), (6L, 10.0)); q.processAllAvailable()
      in.addData((6L, 20.0), (7L, 20.0)); q.processAllAvailable()
    } finally q.stop()

    def state() = spark.read.parquet(tbl).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val expected = Map(1L -> 0.0, 2L -> 0.0, 3L -> 10.0, 4L -> 10.0,
                       5L -> 0.0, 6L -> 20.0, 7L -> 20.0)
    assert(state() == expected, s"streamed merge state diverged: ${state()}")

    // simulate the failure mode foreachBatch documents: the LAST batch
    // re-fires after a restart — state must not change
    val (upd, ins) = acid.CopyOnWrite.merge(spark, tbl,
      Seq((6L, 20.0), (7L, 20.0)).toDF("id", "v"), Seq("id"))
    assert(upd == 2 && ins == 0, s"replay should re-match, got upd=$upd ins=$ins")
    assert(state() == expected, "replayed batch mutated the table")
  }
}
