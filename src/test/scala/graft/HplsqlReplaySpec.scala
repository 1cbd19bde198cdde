package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.hplsql.Hplsql

/** Verbatim replay of the reference's own HPL/SQL test corpus
  * (each hplsql/src/test/queries/local script vs its
  * results/local out.txt, both read from the reference checkout at
  * TEST TIME — nothing is copied). The expected output is the result file with interpreter
  * trace lines stripped (`Ln:` prefixes and `EXEC ...` dispatch notes
  * — those document the reference's tracer, not script semantics);
  * what remains is exactly the sequence of values the script prints.
  *
  * Excluded scripts, with reasons:
  *  - lang.sql — a lexer stress file for exotic identifier quoting
  *    (`:new.abc`, `[abc].[abc]`) we deliberately do not model.
  *  - include.sql — hardcodes a path relative to the reference's CWD.
  *  - interval.sql / timestamp.sql — the reference renders timestamps
  *    at millisecond precision (`+1 MICROSECOND` prints `.001`); this
  *    engine keeps true microseconds (HplsqlSpec pins `.000001`).
  *  - if3_bteq.sql — Teradata BTEQ dot-commands (`.if`, `.quit`).
  *  - seterror.sql — depends on a host shell; covered by HplsqlSpec's
  *    deterministic variant.
  *  - exception.sql — expected output interleaves handler prints with
  *    trace we strip ambiguously; HplsqlSpec pins the same semantics.
  */
class HplsqlReplaySpec extends AnyFunSuite {
  import TestSession._

  private val qDir = "/root/reference/hplsql/src/test/queries/local"
  private val rDir = "/root/reference/hplsql/src/test/results/local"

  private val scripts = Seq(
    "add", "assign", "bool", "bool_expr", "break", "case", "cast", "char",
    "coalesce", "concat", "create_function", "create_function2",
    "create_function3", "create_function4", "create_procedure",
    "create_procedure2", "create_procedure3", "create_procedure_no_params",
    "date", "dbms_output", "declare", "declare2", "declare3",
    "declare_condition", "decode", "equal", "exception_divide_by_zero",
    "exit", "expr", "float", "for_range", "if", "if2", "instr", "leave",
    "len", "length", "lower", "mult_div", "nvl", "nvl2", "print",
    "replace", "return", "sub", "substr", "substring", "timestamp_iso",
    "values_into", "while")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  /** Result file minus tracer lines = the printed-value sequence. */
  private def expectedLines(name: String): Seq[String] =
    read(s"$rDir/$name.out.txt").split("\n", -1).toSeq
      .filterNot(l => l.startsWith("Ln:") || l.startsWith("EXEC "))
      .map(_.stripLineEnd)
      .reverse.dropWhile(_.isEmpty).reverse // trailing blank padding

  scripts.foreach { name =>
    test(s"reference script $name.sql replays to its committed output") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      val got = Hplsql.run(spark, read(s"$qDir/$name.sql")).output
        .split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
      assert(got == expectedLines(name), s"script $name.sql diverged")
    }
  }
}
