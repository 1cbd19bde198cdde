package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.hplsql.DialectDdl

/** Verbatim replay of the reference's OFFLINE dialect-conversion corpus
  * (hplsql/src/test/queries/offline create_table_* vs results/offline):
  * SQL Server / Oracle / MySQL / PostgreSQL CREATE TABLE DDL converted
  * to engine DDL, byte-for-byte against the committed outputs —
  * type mapping, [x]/"x" requoting, dbo-schema dropping, constraint and
  * storage-clause stripping, MySQL COMMENT survival, layout
  * preservation.
  *
  * Excluded: create_table_td.sql (its CTAS statements route through the
  * reference's SELECT re-renderer, which reflows the query text — our
  * converter passes CTAS through untouched rather than reformat it);
  * the non-DDL offline scripts (select/update/delete — statement
  * conversion for execution, covered by the HPL/SQL interpreter lane).
  */
class OfflineReplaySpec extends AnyFunSuite {

  private val qDir = "/root/reference/hplsql/src/test/queries/offline"
  private val rDir = "/root/reference/hplsql/src/test/results/offline"

  private val scripts = Seq("create_table_mssql", "create_table_mssql2",
    "create_table_mysql", "create_table_ora", "create_table_ora2",
    "create_table_pg")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  private val Traced = """^Ln:\d+ (.*)$""".r

  /** Committed output minus tracer framing: bare statement-kind trace
    * lines drop; `Ln:N <sql first line>` keeps the sql; untouched
    * continuation lines keep verbatim. */
  private def expected(name: String): Seq[String] =
    read(s"$rDir/$name.out.txt").split("\n", -1).toSeq.flatMap {
      case Traced(rest) =>
        if (rest == "CREATE TABLE" || rest == "CREATE LOCAL TEMPORARY TABLE" ||
            rest == "USE" || rest.startsWith("SET ") || rest == "SET" ||
            rest.startsWith("SQL statement:")) None
        else Some(rest)
      case other => Some(other)
    }.map(_.stripLineEnd).reverse.dropWhile(_.isEmpty).reverse

  scripts.foreach { name =>
    test(s"offline script $name.sql converts to its committed output") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      val got = DialectDdl.convertScript(read(s"$qDir/$name.sql"))
        .mkString("\n").split("\n", -1).toSeq
        .reverse.dropWhile(_.isEmpty).reverse
      assert(got == expected(name), s"offline conversion of $name.sql diverged")
    }
  }
}
