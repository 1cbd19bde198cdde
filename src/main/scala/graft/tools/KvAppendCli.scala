package graft.tools

import graft.Session
import graft.sources.KvStore

/** Minimal CLI over the graftkv append lane: one PROCESS appending
  * `batches` exactly-once batches into a SHARED store under the
  * cross-process lock service (`graft.txn.dir`). KvCrossProcessSpec
  * drives several of these JVMs concurrently to pin that the writer
  * lock serializes the meta commit ACROSS PROCESSES, not just across
  * threads of one session (the reference's HBase-handler guarantee
  * comes from the region server; here it must come from TxnManager).
  *
  * Keys are disjoint per worker (worker w, batch b, row i →
  * w*1_000_000 + b*1_000 + i), so a lost-update during the meta rewrite
  * shows up as missing rows, and a replayed batch as duplicates. Each
  * batch is also appended TWICE under its tag — the second call must be
  * the exactly-once no-op. */
object KvAppendCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 5,
      "usage: KvAppendCli <storeDir> <txnDir> <workerId> <batches> <rowsPerBatch>")
    val Array(storeDir, txnDir, workerIdS, batchesS, rowsS) = args
    val (workerId, batches, rows) = (workerIdS.toInt, batchesS.toInt, rowsS.toInt)
    val spark = Session.local("4")
    spark.conf.set("graft.txn.dir", txnDir)
    var applied = 0
    var replayed = 0
    for (b <- 0 until batches) {
      val base = workerId * 1000000L + b * 1000L
      val df = spark.range(0, rows.toLong)
        .selectExpr(s"id + ${base}L AS k", s"concat('w$workerId-b$b-', id) AS v")
      val tag = s"w$workerId-b$b"
      if (KvStore.appendBatch(spark, df, storeDir, numSegments = 2, batchTag = tag))
        applied += 1
      // replay of the SAME tag must be a locked no-op
      if (!KvStore.appendBatch(spark, df, storeDir, numSegments = 2, batchTag = tag))
        replayed += 1
    }
    println(s"APPENDED worker=$workerId applied=$applied replayed=$replayed")
    spark.stop()
  }
}
