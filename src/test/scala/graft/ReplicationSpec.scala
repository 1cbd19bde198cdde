package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.Versioned
import graft.etl.Replication

/** Warehouse replication (etl/Replication — ReplicationSpec.java +
  * notification-log replay analog). Pins: bootstrap then incremental
  * sync converge the replica to the source; incremental ships ONLY the
  * CDC events (no full snapshot in the dump); replay of an applied dump
  * is a no-op; a gap (missing events) and a re-bootstrap of a live
  * replica are refused; the state marker tracks repl.last.id. */
class ReplicationSpec extends AnyFunSuite {
  import TestSession._

  private def dirs(name: String): (String, String, String) = {
    val root = s"target/storage/repl_spec/$name"
    val hconf = spark.sparkContext.hadoopConfiguration
    Seq(s"$root/src", s"$root/dst", s"$root/dump").foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    (s"$root/src", s"$root/dst", s"$root/dump")
  }

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_orderkey").collect().toSeq

  test("bootstrap + incremental sync converge the replica; incremental dumps carry only events") {
    val (src, dst, dump) = dirs("converge")
    val keys = Seq("o_orderkey")
    val v1 = Tables.orders(spark, sf).limit(300)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Versioned.commit(spark, src, v1)
    val s1 = Replication.sync(spark, src, dst, dump, keys)
    assert(s1 == 1 && Replication.lastReplicatedId(spark, dst).contains(1))
    assert(sorted(Versioned.read(spark, dst)) == sorted(v1))

    val v2 = v1.filter(col("o_orderkey") % 5 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 2 === 0, lit("Z")).otherwise(col("o_orderstatus")))
    Versioned.commit(spark, src, v2)
    val s2 = Replication.sync(spark, src, dst, dump, keys)
    assert(s2 == 2)
    assert(sorted(Versioned.read(spark, dst)) == sorted(v2))

    // the incremental dump holds CDC rows, not a snapshot: EXACTLY the
    // churn ships — one row per delete, two per changed row (pre+post
    // images), zero for the untouched majority. This is the 100 TB
    // argument in miniature: sync cost scales with change volume, not
    // table size.
    val events = spark.read.parquet(s"$dump/events")
    val lanes = events.groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val base = v1.collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val deleted = base.count(_._1 % 5 == 0)
    val updated = base.count { case (k, st) => k % 5 != 0 && k % 2 == 0 && st != "Z" }
    assert(lanes.getOrElse("delete", 0L) == deleted)
    assert(lanes.getOrElse("update_preimage", 0L) == updated)
    assert(lanes.getOrElse("update_postimage", 0L) == updated)
    assert(lanes.getOrElse("insert", 0L) == 0)
    assert(events.count() == deleted + 2L * updated)
  }

  test("replaying an applied dump is a no-op; gaps and re-bootstraps are refused") {
    val (src, dst, dump) = dirs("idem")
    val keys = Seq("o_orderkey")
    val v1 = Tables.orders(spark, sf).limit(120)
      .select(col("o_orderkey"), col("o_totalprice"))
    Versioned.commit(spark, src, v1)
    Replication.sync(spark, src, dst, dump, keys)
    Versioned.commit(spark, src, v1.filter(col("o_orderkey") % 3 =!= 0))
    Replication.sync(spark, src, dst, dump, keys)
    val after = sorted(Versioned.read(spark, dst))

    // idempotent replay: same dump again changes nothing
    assert(Replication.load(spark, dump, dst) == 2)
    assert(sorted(Versioned.read(spark, dst)) == after)
    assert(Versioned.currentVersion(spark, dst).contains(2))

    // gap: a dump starting past the replica's state is refused
    Versioned.commit(spark, src, v1.limit(50))
    Versioned.commit(spark, src, v1.limit(40))
    Replication.dump(spark, src, dump, keys, fromId = Some(3))
    intercept[Replication.ReplGapException](Replication.load(spark, dump, dst))

    // re-bootstrap of a live replica is refused (would fork history)
    Replication.dump(spark, src, dump, keys, fromId = None)
    intercept[Replication.ReplGapException](Replication.load(spark, dump, dst))

    // a table with its own history but NO replication state is not an
    // uninitialized replica — bootstrap refuses to fork over it
    val foreign = dst + "_foreign"
    Versioned.commit(spark, foreign, v1.limit(10))
    intercept[Replication.ReplGapException](Replication.load(spark, dump, foreign))
  }

  test("continuous replication from a stream: foreachBatch commit + sync keeps the replica converged") {
    // the scheduler pattern a deployment runs: every micro-batch lands
    // in the source versioned table (tagged — exactly-once under
    // replay), then one sync ships the batch's CDC events to the
    // replica. The replica is consistent after EVERY sync, not only at
    // the end.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val (src, dst, dump) = dirs("stream")
    val keys = Seq("o_orderkey")
    Versioned.commit(spark, src,
      Seq((1L, 10.0), (2L, 20.0)).toDF("o_orderkey", "o_totalprice"))
    Replication.sync(spark, src, dst, dump, keys)

    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
    val q = in.toDF().toDF("o_orderkey", "o_totalprice").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Versioned.commitDelta(spark, src, keys, upserts = batch,
          tag = Some(s"batch-$id"))
        Replication.sync(spark, src, dst, dump, keys)
        ()
      }.start()
    try {
      in.addData((2L, 25.0), (3L, 30.0)) // update + insert
      q.processAllAvailable()
      assert(sorted(Versioned.read(spark, dst)) ==
        Seq(Row(1L, 10.0), Row(2L, 25.0), Row(3L, 30.0)))
      in.addData((1L, 11.0))
      q.processAllAvailable()
      assert(sorted(Versioned.read(spark, dst)) ==
        Seq(Row(1L, 11.0), Row(2L, 25.0), Row(3L, 30.0)))
    } finally q.stop()
  }

  test("a dump from vacuumed source history is refused with re-bootstrap advice") {
    val (src, dst, dump) = dirs("vacuumed")
    val keys = Seq("o_orderkey")
    val base = Tables.orders(spark, sf).limit(40)
      .select(org.apache.spark.sql.functions.col("o_orderkey"),
              org.apache.spark.sql.functions.col("o_totalprice"))
    Versioned.commit(spark, src, base)
    Replication.sync(spark, src, dst, dump, keys)
    Versioned.commit(spark, src, base.limit(30))
    Versioned.commit(spark, src, base.limit(20))
    Versioned.vacuum(spark, src, keep = 1) // replica's v1 is gone
    val e = intercept[Replication.ReplGapException](
      Replication.sync(spark, src, dst, dump, keys))
    assert(e.getMessage.contains("re-bootstrapped"))
  }

  test("empty incremental (no new events) advances nothing and is valid") {
    val (src, dst, dump) = dirs("empty")
    val keys = Seq("o_orderkey")
    Versioned.commit(spark, src,
      Tables.orders(spark, sf).limit(60).select(col("o_orderkey"), col("o_totalprice")))
    Replication.sync(spark, src, dst, dump, keys)
    // no new source commits: sync dumps an empty event batch and no-ops
    assert(Replication.sync(spark, src, dst, dump, keys) == 1)
    assert(Versioned.currentVersion(spark, dst).contains(1))
    assert(Replication.lastReplicatedId(spark, dst).contains(1))
  }
}
