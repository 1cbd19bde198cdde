package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.Versioned

/** Pins the versioned snapshot table (graft.acid.Versioned): commit-marker
  * atomicity, snapshot isolation for in-flight readers, time travel,
  * vacuum retention, and writer serialization. q258's DuckDB oracle
  * additionally hash-pins the DML semantics per version.
  */
class VersionedSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_ver").toString + "/t"

  test("commits are atomic: a version without its marker is invisible") {
    val base = freshBase()
    assert(Versioned.versions(spark, base).isEmpty)
    val v1 = Versioned.commit(spark, base, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    assert(v1 == 1 && Versioned.currentVersion(spark, base) == Some(1))
    // simulate a crashed writer: data files land, marker never does
    val half = new java.io.File(s"$base/_versions/v00000002")
    Seq((9, "x")).toDF("id", "s").write.parquet(half.toString)
    new java.io.File(half, "_committed").delete()
    assert(Versioned.currentVersion(spark, base) == Some(1),
      "uncommitted version leaked into the read view")
    assert(Versioned.read(spark, base).count() == 2)
    // the next commit reclaims the orphan directory
    val v2 = Versioned.commit(spark, base, Seq((3, "c")).toDF("id", "s"))
    assert(v2 == 2 && Versioned.read(spark, base).count() == 1)
  }

  test("readers are pinned to their snapshot while new versions commit") {
    val base = freshBase()
    Versioned.commit(spark, base, (1 to 100).toDF("id"))
    val pinned = Versioned.read(spark, base) // resolves v1 NOW
    Versioned.commit(spark, base, (1 to 5).toDF("id"))
    // collected AFTER the second commit, still sees v1 in full
    assert(pinned.count() == 100)
    assert(Versioned.read(spark, base).count() == 5)
  }

  test("time travel reads exact historical states; unknown versions reject") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    Versioned.update(spark, base, col("id") === 1, Map("v" -> lit(99.0)))
    Versioned.delete(spark, base, col("id") === 2)
    assert(Versioned.versions(spark, base) == Seq(1, 2, 3))
    assert(Versioned.read(spark, base, Some(1)).agg(sum("v")).as[Double].head() == 30.0)
    assert(Versioned.read(spark, base, Some(2)).agg(sum("v")).as[Double].head() == 119.0)
    assert(Versioned.read(spark, base, Some(3)).agg(sum("v")).as[Double].head() == 99.0)
    val e = intercept[IllegalArgumentException] {
      Versioned.read(spark, base, Some(7))
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("vacuum drops only history, never the current version") {
    val base = freshBase()
    (1 to 4).foreach(n => Versioned.commit(spark, base, (1 to n).toDF("id")))
    val removed = Versioned.vacuum(spark, base, keep = 2)
    assert(removed == Seq(1, 2))
    assert(Versioned.versions(spark, base) == Seq(3, 4))
    assert(Versioned.read(spark, base).count() == 4)
    intercept[IllegalArgumentException] { Versioned.vacuum(spark, base, keep = 0) }
  }

  test("delta commit is O(changes) and readMerged applies newest-wins per key") {
    val base = freshBase()
    Versioned.commit(spark, base,
      Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("id", "s", "v"))
    val v2 = Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, "B2", 20.0), (4L, "d", 4.0)).toDF("id", "s", "v"),
      deletes = Some(Seq(Tuple1(3L)).toDF("id")))
    assert(v2 == 2)
    // the delta version stores only the 3 changed rows, not the table
    val deltaRows = spark.read.parquet(s"$base/_versions/v00000002").count()
    assert(deltaRows == 3, s"delta materialized $deltaRows rows")
    val got = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "a", 1.0), (2L, "B2", 20.0), (4L, "d", 4.0)))
    // stacked second delta: latest version wins over the earlier delta
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, "B3", 200.0)).toDF("id", "s", "v"))
    val got2 = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got2.toSeq == Seq((1L, "a"), (2L, "B3"), (4L, "d")))
  }

  test("compactDeltas folds the head into a full base; plain read matches") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((1L, 10.0)).toDF("id", "v"),
      deletes = Some(Seq(Tuple1(2L)).toDF("id")))
    val before = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val v3 = Versioned.compactDeltas(spark, base, Seq("id"))
    assert(v3 == 3)
    val after = Versioned.read(spark, base)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(before == after && after == Seq((1L, 10.0)))
    // idempotent: nothing to fold -> same version back
    assert(Versioned.compactDeltas(spark, base, Seq("id")) == 3)
    // readMerged on a delta-free head is the plain scan (no window node)
    val plan = Versioned.readMerged(spark, base, Seq("id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(500))
  }

  test("maintain(): delta threshold triggers auto-compaction, retention vacuums, below-threshold no-ops") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 0.0), (2L, 0.0)).toDF("id", "v"))
    // two deltas: below the threshold of 3 -> maintain must not compact
    (1 to 2).foreach(i => Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((1L, i.toDouble)).toDF("id", "v")))
    val m1 = Versioned.maintain(spark, base, maxDeltas = 3)
    assert(m1 == Versioned.Maintenance(2, compacted = false, Nil), m1.toString)
    assert(Versioned.currentVersion(spark, base).contains(3))
    // third delta crosses the threshold -> compaction folds the head
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((1L, 9.0)).toDF("id", "v"))
    val m2 = Versioned.maintain(spark, base, maxDeltas = 3)
    assert(m2.headDeltas == 3 && m2.compacted, m2.toString)
    val head = Versioned.currentVersion(spark, base).get
    assert(head == 5) // v5 = compacted full base
    val got = Versioned.read(spark, base)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 9.0), (2L, 0.0)))
    // retention: keep only the compacted head, old lineage vacuumed
    val m3 = Versioned.maintain(spark, base, maxDeltas = 3, retainVersions = 1)
    assert(!m3.compacted && m3.vacuumed == Seq(1, 2, 3, 4), m3.toString)
    assert(Versioned.versions(spark, base) == Seq(5))
    // idempotent: nothing left to do
    assert(Versioned.maintain(spark, base, 3, 1) ==
      Versioned.Maintenance(0, compacted = false, Nil))
  }

  test("read on a delta head returns the merged table, never a delta fragment") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"))
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((3L, 3.0)).toDF("id", "v"))
    // plain read() — no keys passed — must transparently merge via the
    // delta's own key sidecar and must not leak the _op lane
    val got = Versioned.read(spark, base)
    assert(got.columns.toSeq == Seq("id", "v"), got.columns.mkString(","))
    assert(got.count() == 3)
    // time travel to the delta version merges too
    assert(Versioned.read(spark, base, Some(2)).count() == 3)
    // and the pre-delta snapshot is still the plain base
    assert(Versioned.read(spark, base, Some(1)).count() == 2)
  }

  test("vacuum keeps whole lineages: no retained delta ever loses its base") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 1.0)).toDF("id", "v"))          // v1 full
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, 2.0)).toDF("id", "v"))                            // v2 delta
    Versioned.compactDeltas(spark, base, Seq("id"))                        // v3 full
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((3L, 3.0)).toDF("id", "v"))                            // v4 delta
    // keep=3 retains [2,3,4]; v2 is a delta whose base is v1, so v1 must
    // survive even though it is outside the keep window
    assert(Versioned.vacuum(spark, base, keep = 3).isEmpty)
    assert(Versioned.read(spark, base, Some(2)).count() == 2) // still readable
    // keep=2 retains [3,4] whose base is v3: the v1+v2 lineage drops whole
    assert(Versioned.vacuum(spark, base, keep = 2) == Seq(1, 2))
    assert(Versioned.read(spark, base).count() == 3)
  }

  test("vacuum never drops the base a delta head depends on") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 1.0)).toDF("id", "v"))        // v1 full
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, 2.0)).toDF("id", "v"))                          // v2 delta
    Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((3L, 3.0)).toDF("id", "v"))                          // v3 delta
    // keep=1 would naively drop v1+v2 — but v1 is the head's base and v2
    // part of the snapshot; retention clamps to the base
    assert(Versioned.vacuum(spark, base, keep = 1).isEmpty)
    assert(Versioned.readMerged(spark, base, Seq("id")).count() == 3)
    // after compaction the old base IS vacuumable
    Versioned.compactDeltas(spark, base, Seq("id"))                      // v4 full
    assert(Versioned.vacuum(spark, base, keep = 1) == Seq(1, 2, 3))
    assert(Versioned.read(spark, base).count() == 3)
  }

  test("tagged delta commits are idempotent: a replayed batch is a no-op") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1L, 1.0)).toDF("id", "v"))
    val v2 = Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, 2.0)).toDF("id", "v"), tag = Some("batch-7"))
    // replay with the same tag: same version back, nothing written
    val replay = Versioned.commitDelta(spark, base, Seq("id"),
      upserts = Seq((2L, 999.0)).toDF("id", "v"), tag = Some("batch-7"))
    assert(v2 == 2 && replay == 2)
    assert(Versioned.versions(spark, base) == Seq(1, 2))
    val got = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((1L, 1.0), (2L, 2.0)), "replayed batch was double-applied")
    assert(Versioned.committedTags(spark, base) == Map("batch-7" -> 2))
  }

  test("exactly-once streaming ingest into a versioned table (TransactionBatch analog)") {
    // the full streaming handshake: foreachBatch + tagged delta commit.
    // A restarted query REPLAYS its last uncommitted micro-batch (the
    // documented foreachBatch at-least-once contract); the tag turns the
    // replay into a no-op so the table stays exactly-once.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = freshBase()
    Versioned.commit(spark, base, Seq((0L, 0.0)).toDF("id", "v"))

    def ingest(batches: Seq[Seq[(Long, Double)]]): Unit = {
      val in = MemoryStream[(Long, Double)]
      val q = in.toDF().toDF("id", "v").writeStream
        .option("checkpointLocation",
          Files.createTempDirectory("graft_ver_eo").toString)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
          Versioned.commitDelta(spark, base, Seq("id"),
            upserts = batch, tag = Some(s"batch-$batchId"))
          ()
        }.start()
      try batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
    }

    ingest(Seq(Seq((1L, 1.0), (2L, 2.0)))) // writer 1 commits batch 0
    // writer 2 restarts from scratch: its batch 0 REPLAYS the exact data
    // writer 1 already committed (the at-least-once failure mode), then
    // batch 1 carries the genuinely new rows
    ingest(Seq(Seq((1L, 1.0), (2L, 2.0)), Seq((3L, 3.0))))
    val got = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (3L, 3.0)),
      s"replayed micro-batch double-applied or lost: $got")
  }

  test("streaming ingest with in-loop maintain(): deltas auto-compact mid-stream (Initiator analog)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = freshBase()
    Versioned.commit(spark, base, Seq((0L, 0.0)).toDF("id", "v"))
    val in = MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("id", "v").writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ver_mnt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        Versioned.commitDelta(spark, base, Seq("id"),
          upserts = batch, tag = Some(s"batch-$batchId"))
        Versioned.maintain(spark, base, maxDeltas = 2)
        ()
      }.start()
    try {
      Seq(Seq((1L, 1.0)), Seq((2L, 2.0)), Seq((3L, 3.0))).foreach { b =>
        in.addData(b: _*); q.processAllAvailable()
      }
    } finally q.stop()
    // batches 0,1 -> 2 deltas -> compacted to a full base; batch 2 is one
    // delta on top of it: the head never accumulates past the threshold
    val f = new java.io.File(s"$base/_versions")
    val heads = Versioned.versions(spark, base)
    val deltaTail = heads.reverse.takeWhile(v =>
      new java.io.File(f, f"v$v%08d/_delta").exists).size
    assert(deltaTail < 2, s"head delta count must stay under threshold, got $deltaTail")
    val got = Versioned.readMerged(spark, base, Seq("id"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == Seq((0L, 0.0), (1L, 1.0), (2L, 2.0), (3L, 3.0)))
  }

  test("concurrent commits serialize: distinct versions, nothing lost") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = freshBase()
    Versioned.commit(spark, base, Seq(0).toDF("id"))
    val fs = (1 to 4).map(n => Future(
      Versioned.commit(spark, base, Seq(n).toDF("id"))))
    val got = fs.map(Await.result(_, 5.minutes)).sorted
    assert(got == Seq(2, 3, 4, 5), s"version collision: $got")
    assert(Versioned.versions(spark, base) == Seq(1, 2, 3, 4, 5))
  }

  test("snapshot diff emits the four CDC lanes, null-safely; identical snapshots diff empty") {
    val base = freshBase()
    // k=1 stays, k=2 deleted, k=3 value->NULL (update), k=4 NULL->value
    // (update), k=5 inserted
    val v1 = Versioned.commit(spark, base,
      Seq((1L, Option("a")), (2L, Option("b")), (3L, Option("c")),
          (4L, None: Option[String])).toDF("k", "v"))
    val v2 = Versioned.commit(spark, base,
      Seq((1L, Option("a")), (3L, None: Option[String]), (4L, Option("d")),
          (5L, Option("e"))).toDF("k", "v"))
    val d = Versioned.diff(spark, base, v1, v2, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1),
                 if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(d == Set(
      ("delete", 2L, "b"),
      ("update_preimage", 3L, "c"), ("update_postimage", 3L, null),
      ("update_preimage", 4L, null), ("update_postimage", 4L, "d"),
      ("insert", 5L, "e")))
    // unchanged k=1 produces nothing; a self-diff is empty
    assert(Versioned.diff(spark, base, v2, v2, Seq("k")).count() == 0)
  }

  test("snapshot diff: NULL business keys and key-only tables are first-class") {
    val base = freshBase()
    // the NULL-key row changes its attribute between versions
    val v1 = Versioned.commit(spark, base,
      Seq((Option(1L), Option("a")), (None: Option[Long], Option("x"))).toDF("k", "v"))
    val v2 = Versioned.commit(spark, base,
      Seq((Option(1L), Option("a")), (None: Option[Long], Option("y"))).toDF("k", "v"))
    val lanes = Versioned.diff(spark, base, v1, v2, Seq("k")).collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
      .toSet
    assert(lanes == Set(("update_preimage", -1L, "x"), ("update_postimage", -1L, "y")),
      s"null-key change must surface, got $lanes")
    // key-only table (membership set): insert/delete lanes only, no crash
    val base2 = freshBase()
    val m1 = Versioned.commit(spark, base2, Seq(1L, 2L).toDF("k"))
    val m2 = Versioned.commit(spark, base2, Seq(2L, 3L).toDF("k"))
    val mem = Versioned.diff(spark, base2, m1, m2, Seq("k")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(mem == Set(("delete", 1L), ("insert", 3L)))
  }

  test("CDC round trip: applying diff(v1, v2) to snapshot v1 reproduces v2 exactly") {
    val base = freshBase()
    val v1df = Tables.orders(spark, sf)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
              col("o_totalprice").cast("double").as("price"))
    val v2df = v1df.filter(col("k") % 11 =!= 0)
      .withColumn("price", when(col("k") % 5 === 0, col("price") * 2).otherwise(col("price")))
      .unionByName(v1df.filter(col("k") % 31 === 0)
        .select((col("k") + 9000000L).as("k"), lit("Z").as("st"), col("price")))
    val v1 = Versioned.commit(spark, base, v1df)
    val v2 = Versioned.commit(spark, base, v2df)
    val changes = Versioned.diff(spark, base, v1, v2, Seq("k"))
    val followed = Versioned.applyDiff(Versioned.read(spark, base, Some(v1)), changes, Seq("k"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(t => (t._1, t._2, t._3)).toSeq
    assert(canon(followed) == canon(Versioned.read(spark, base, Some(v2))))
    // transfer is O(changes): the feed is far smaller than the table
    assert(changes.count() < v1df.count() / 2)

    // NULL business key through the full round trip: diff joins null-safe,
    // so applyDiff must too — the NULL-key update must REPLACE the old row
    // (not keep it alongside the post-image), and a NULL-key delete must land
    val base2 = freshBase()
    val n1 = Versioned.commit(spark, base2,
      Seq((Option(1L), "a"), (None: Option[Long], "x"), (Option(2L), "b"))
        .toDF("k", "st"))
    val n2 = Versioned.commit(spark, base2,
      Seq((Option(1L), "a"), (None: Option[Long], "y")).toDF("k", "st"))
    val nchanges = Versioned.diff(spark, base2, n1, n2, Seq("k"))
    val nfollowed = Versioned.applyDiff(Versioned.read(spark, base2, Some(n1)), nchanges, Seq("k"))
    def canon2(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
        .sortBy(identity).toSeq
    assert(canon2(nfollowed) == canon2(Versioned.read(spark, base2, Some(n2))),
      s"NULL-key round trip broke: ${canon2(nfollowed)}")
  }
}
