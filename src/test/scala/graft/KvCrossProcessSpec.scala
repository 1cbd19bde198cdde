package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.KvStore

/** Cross-PROCESS serialization of graftkv appends (the round-9 write
  * half covered one session; this pins the lock SERVICE): several
  * concurrent JVMs — sharing nothing but the store directory and
  * `graft.txn.dir` — each append exactly-once batches with disjoint
  * keys, replaying every tag once. If TxnManager's exclusive lock did
  * not serialize the meta rewrite across processes, a racing commit
  * would drop the competing batch's segment lines (missing rows), and a
  * replay fence outside the lock would double-apply a tag (duplicate
  * rows). The final store must hold exactly every key once, and every
  * process must report each tag applied once and replayed once. */
class KvCrossProcessSpec extends AnyFunSuite {
  import TestSession._

  private def runCli(args: Seq[String]): Process = {
    val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED") ||
        a.startsWith("-Dspark.sql.session.timeZone"))
    val cmd = Seq("java") ++ jvm ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"), "graft.tools.KvAppendCli") ++ args
    Process(cmd).run(ProcessLogger(l => { outBuf.add(l); () }, _ => ()))
  }

  private val outBuf = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  test("concurrent appends from separate JVMs serialize under the lock service") {
    val store = Files.createTempDirectory("graft_kv_xproc").toString
    val txn = Files.createTempDirectory("graft_kv_xproc_txn").toString
    // seed the store (schema + keyCol) from THIS session
    KvStore.write(spark,
      spark.range(0, 0).selectExpr("id AS k", "CAST(NULL AS STRING) AS v"),
      store, "k", numSegments = 1)

    val workers = 3; val batches = 4; val rows = 50
    val procs = (1 to workers).map(w =>
      runCli(Seq(store, txn, w.toString, batches.toString, rows.toString)))
    val rcs = procs.map(_.exitValue())
    val out = outBuf.asScala.mkString("\n")
    assert(rcs.forall(_ == 0), s"worker JVM failed (rcs=$rcs):\n${out.takeRight(2000)}")
    // every process applied each tag exactly once and saw its replay fenced
    (1 to workers).foreach { w =>
      assert(out.contains(s"APPENDED worker=$w applied=$batches replayed=$batches"), out)
    }
    // the union of all appends, exactly once each — a lost meta update
    // would shrink the count, a broken replay fence would inflate it
    spark.sql("DROP TABLE IF EXISTS kv_xproc")
    spark.sql(s"CREATE TABLE kv_xproc USING graftkv LOCATION '$store'")
    val got = spark.table("kv_xproc")
    assert(got.count() == workers.toLong * batches * rows)
    assert(got.select("k").distinct().count() == workers.toLong * batches * rows)
    val perWorker = got.selectExpr("CAST(k DIV 1000000 AS INT) AS w")
      .groupBy("w").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(perWorker == (1 to workers).map(_ -> batches.toLong * rows).toMap)
  }
}
