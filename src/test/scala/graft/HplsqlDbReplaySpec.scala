package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.hplsql.Hplsql

/** Replay of the reference's DATABASE-mode HPL/SQL corpus
  * (hplsql/src/test/queries/db) against a synthesized `src` table with
  * the same shape Hive's classic src has (500 string key/value rows) —
  * these scripts exercise the table-integration half the local corpus
  * can't: cursors over real result sets, SELECT INTO from tables,
  * EXECUTE against the engine, %ROWTYPE records, SYS_REFCURSOR OUT
  * params, and DB2 returned result sets via ALLOCATE CURSOR.
  *
  * Scripts whose output depends on Hive sample-table CONTENT
  * (sample_07 codes, partition counts) or on engine DDL messages are
  * excluded — the replayed set depends only on src's 500-row count.
  */
class HplsqlDbReplaySpec extends AnyFunSuite {
  import TestSession._

  private val qDir = "/root/reference/hplsql/src/test/queries/db"
  private val rDir = "/root/reference/hplsql/src/test/results/db"

  private def ensureSrc(): Unit =
    spark.sql("SELECT CAST(id AS STRING) AS key, CAST(id * 10 AS STRING) AS value FROM range(500)")
      .createOrReplaceTempView("src")

  private val scripts = Seq(
    "cursor_attributes", "execute", "rowtype_attribute",
    "sys_refcursor", "create_procedure_return_cursor")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  private def expectedLines(name: String): Seq[String] =
    read(s"$rDir/$name.out.txt").split("\n", -1).toSeq
      .filterNot(l => l.startsWith("Ln:") || l.startsWith("EXEC "))
      .map(_.stripLineEnd)
      .reverse.dropWhile(_.isEmpty).reverse

  scripts.foreach { name =>
    test(s"reference db script $name.sql replays to its committed output") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      ensureSrc()
      val got = Hplsql.run(spark, read(s"$qDir/$name.sql")).output
        .split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
      assert(got == expectedLines(name), s"script $name.sql diverged")
    }
  }
}
