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
    "sys_refcursor", "create_procedure_return_cursor",
    "select_into", "select_into2", "type_attribute",
    "create_procedure_return_cursor2",
    "create_procedure_no_params", "describe", "truncate_table", "insert")

  /** Real warehouse tables the DML scripts hit (a temp view cannot be
    * TRUNCATEd or INSERTed into). */
  private def ensureTables(): Unit = {
    spark.sql("CREATE TABLE IF NOT EXISTS src_empty (key STRING) USING parquet")
    spark.sql("CREATE TABLE IF NOT EXISTS src_insert (value STRING) USING parquet")
  }

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  // with or without same-line SQL: `Ln:5 select` alone starts an echo
  // whose SQL begins on the NEXT line (select_into2.sql)
  private val SqlEcho = """^Ln:\d+ (?i:select)\b.*""".r

  /** Tracer lines strip as in the local spec, plus one db-corpus
    * artifact: a traced SQL that SPANS LINES spills its continuation
    * lines without the Ln: prefix ("Ln:9 SELECT CAST(...)" then a bare
    * "FROM src LIMIT 1") — those belong to the echo, not the script's
    * output, and drop until the next trace line. */
  private def expectedLines(name: String): Seq[String] = {
    var inEcho = false
    read(s"$rDir/$name.out.txt").split("\n", -1).toSeq.flatMap { l =>
      if (l.startsWith("Ln:") || l.startsWith("EXEC ")) {
        inEcho = SqlEcho.pattern.matcher(l).matches() &&
          !l.contains("SELECT completed") && !l.contains("SELECT INTO")
        None
      } else if (inEcho) None
      else Some(l.stripLineEnd)
    }.reverse.dropWhile(_.isEmpty).reverse
  }

  scripts.foreach { name =>
    test(s"reference db script $name.sql replays to its committed output") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      ensureSrc()
      ensureTables()
      if (name == "describe") {
        // the classic Hive src table carries column COMMENTs 'default'
        // (visible in describe.out.txt's third column) — describe must
        // hit a real commented table, not the temp view
        spark.catalog.dropTempView("src")
        spark.sql("DROP TABLE IF EXISTS src")
        spark.sql("CREATE TABLE src (key STRING COMMENT 'default', " +
          "value STRING COMMENT 'default') USING parquet")
      }
      val got = Hplsql.run(spark, read(s"$qDir/$name.sql")).output
        .split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
      assert(got == expectedLines(name), s"script $name.sql diverged")
      // trace-only scripts assert their SIDE EFFECTS too — an
      // interpreter that silently dropped the statements would
      // otherwise match their empty printed output
      name match {
        case "insert" =>
          // overwrite(500) then append(500)
          assert(spark.table("src_insert").count() == 1000)
          spark.sql("TRUNCATE TABLE src_insert")
        case "truncate_table" =>
          assert(spark.table("src_empty").count() == 0)
        case "describe" =>
          spark.sql("DROP TABLE IF EXISTS src")
          ensureSrc()
        case _ =>
      }
    }
  }
}
