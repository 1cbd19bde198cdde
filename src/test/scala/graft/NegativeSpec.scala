package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Error-path suite mirroring the reference's clientnegative corpus
  * (ql/src/test/queries/clientnegative/, 749 scripts): malformed input
  * must yield NULL (ANSI off, Hive cast semantics) or a clean typed
  * exception — never a crash, never a wrong value. */
class NegativeSpec extends AnyFunSuite {
  import TestSession._

  private def one(sqlText: String) = spark.sql(s"SELECT $sqlText AS r").collect()(0)

  test("bad string-to-number casts yield NULL") {
    assert(one("CAST('abc' AS INT)").isNullAt(0))
    assert(one("CAST('' AS DOUBLE)").isNullAt(0))
    assert(one("CAST('1.2.3' AS DECIMAL(10,2))").isNullAt(0))
    assert(one("CAST('2020-99-99' AS DATE)").isNullAt(0))
    // note: 'yesterday'/'now'/'epoch' are valid special timestamp strings
    assert(one("CAST('25:99:99' AS TIMESTAMP)").isNullAt(0))
  }

  test("division and modulo by zero yield NULL, not an error") {
    assert(one("1 / 0").isNullAt(0))
    assert(one("1 div 0").isNullAt(0))
    assert(one("1 % 0").isNullAt(0))
    assert(one("pmod(1, 0)").isNullAt(0))
    assert(one("CAST(1 AS DECIMAL(10,2)) / CAST(0 AS DECIMAL(10,2))").isNullAt(0))
  }

  test("decimal overflow yields NULL with ANSI off") {
    assert(one("CAST(12345.678 AS DECIMAL(5,2))").isNullAt(0))
    assert(one("CAST(CAST(99999999999999999999.0 AS DOUBLE) AS DECIMAL(10,0))").isNullAt(0))
  }

  test("out-of-bounds collection access yields NULL") {
    assert(one("element_at(array(1, 2, 3), 99)").isNullAt(0))
    assert(one("element_at(map('a', 1), 'z')").isNullAt(0))
    assert(one("CAST(NULL AS ARRAY<INT>)[0]").isNullAt(0))
  }

  test("malformed JSON yields NULL, not an error") {
    assert(one("get_json_object('{not json', '$.k')").isNullAt(0))
    assert(one("from_json('{\"a\": oops}', 'a INT').a").isNullAt(0))
  }

  test("math domain errors follow Hive semantics") {
    assert(one("sqrt(-1)").getDouble(0).isNaN)
    assert(one("ln(-1)").isNullAt(0))
    assert(one("log10(0)").isNullAt(0))
  }

  test("malformed regex raises a clean exception, not a crash") {
    val e = intercept[Throwable] {
      spark.sql("SELECT regexp_extract('abc', '[unclosed', 0)").collect()
    }
    assert(e.getMessage != null && e.getMessage.toLowerCase.contains("regex"),
      s"expected a regex error, got: ${e.getClass.getName}: ${e.getMessage}")
  }

  test("unresolved column is a clean AnalysisException") {
    Tables.nation(spark, sf).createOrReplaceTempView("neg_nation")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT no_such_col FROM neg_nation").collect()
    }
    assert(e.getMessage.contains("no_such_col"))
  }

  test("syntactically invalid SQL is a clean parse error") {
    val e = intercept[Exception] {
      spark.sql("SELEC 1")
    }
    assert(e.getClass.getName.toLowerCase.contains("parse"), e.getClass.getName)
  }

  test("aggregating a non-existent table fails cleanly") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT count(1) FROM table_that_does_not_exist")
    }
    assert(e.getMessage.toLowerCase.contains("table_that_does_not_exist"))
  }
}
