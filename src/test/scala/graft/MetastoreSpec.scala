package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._
import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Persistent-metastore contract (the reference's HiveMetaStore service,
  * metastore/src/java/org/apache/hadoop/hive/metastore/HiveMetaStore.java:
  * catalog state survives the process that created it). One JVM writes a
  * database + partitioned managed table + view through
  * Session.persistent; a SECOND JVM — sharing nothing but the metastore
  * directory — must resolve all of it from the catalog alone. Embedded
  * derby is single-process-at-a-time (Hive's documented embedded-mode
  * limitation; the same builder pointed at hive.metastore.uris or a
  * server RDBMS is the shared-service mode), so the processes run
  * sequentially. */
class MetastoreSpec extends AnyFunSuite {

  private def runCli(mode: String, dir: String): (Int, String) = {
    val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED") ||
        a.startsWith("-Dspark.sql.session.timeZone"))
    val cmd = Seq("java") ++ jvm ++ Seq("-Xmx2g", "-cp",
      System.getProperty("java.class.path"), "graft.tools.CatalogCli", mode, dir)
    val out = new StringBuilder
    val rc = Process(cmd).!(ProcessLogger(l => out.append(l).append('\n'), _ => ()))
    (rc, out.toString)
  }

  test("catalog state persists across separate JVM processes") {
    val dir = Files.createTempDirectory("graft_metastore").toString
    val (rc1, out1) = runCli("write", dir)
    assert(rc1 == 0, s"writer failed:\n${out1.takeRight(2000)}")
    assert(out1.contains("WROTE n=100"), out1.takeRight(2000))
    // a different process, later: nothing shared but the metastore dir
    val (rc2, out2) = runCli("read", dir)
    assert(rc2 == 0, s"reader failed:\n${out2.takeRight(2000)}")
    assert(out2.contains("READ n=100 sum=9900 even=50 parts=3 tables=kv,kv_even"),
      out2.takeRight(2000))
  }
}
