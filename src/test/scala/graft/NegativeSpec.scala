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

  // ---- DDL error family (create_table_failure*, create_view_failure*,
  // column_rename*, archive_partspec*) --------------------------------

  private def ddlError(sqlText: String): Throwable =
    intercept[AnalysisException] { spark.sql(sqlText) }

  test("CREATE TABLE with duplicate column names is rejected") {
    val e = ddlError("CREATE TABLE neg_dup_cols (a INT, a STRING) USING parquet")
    assert(e.getMessage.toLowerCase.contains("a"), e.getMessage)
  }

  test("CREATE TABLE in a non-existent database is rejected (create_table_failure1)") {
    val e = ddlError("CREATE TABLE db_does_not_exist.t (a INT) USING parquet")
    assert(e.getMessage.toLowerCase.contains("db_does_not_exist"), e.getMessage)
  }

  test("CREATE VIEW over a missing table fails and leaves no view behind") {
    intercept[AnalysisException] {
      spark.sql("CREATE TEMPORARY VIEW neg_bad_view AS SELECT * FROM missing_tbl")
    }
    val e = intercept[AnalysisException] { spark.sql("SELECT * FROM neg_bad_view") }
    assert(e.getMessage.contains("neg_bad_view"))
  }

  test("CREATE VIEW with duplicate output aliases is rejected (create_view_failure)") {
    val e = ddlError(
      "CREATE TEMPORARY VIEW neg_dup_alias (x, x) AS SELECT 1, 2")
    assert(e.getMessage.toLowerCase.contains("x"), e.getMessage)
  }

  test("partition spec on a non-partitioned table is rejected (archive_partspec analog)") {
    spark.sql("DROP TABLE IF EXISTS neg_nopart")
    spark.sql("CREATE TABLE neg_nopart (a INT) USING parquet")
    try {
      val e = ddlError("ALTER TABLE neg_nopart ADD PARTITION (p=1)")
      assert(e.getMessage.toLowerCase.contains("partition"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_nopart")
  }

  test("INSERT with a bogus static partition column is rejected (dyn_part analog)") {
    spark.sql("DROP TABLE IF EXISTS neg_part_tgt")
    spark.sql("CREATE TABLE neg_part_tgt (a INT) USING parquet PARTITIONED BY (p INT)")
    try {
      val e = ddlError("INSERT INTO neg_part_tgt PARTITION (zz=1) SELECT 1")
      assert(e.getMessage.toLowerCase.contains("zz") ||
             e.getMessage.toLowerCase.contains("partition"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_part_tgt")
  }

  // ---- bucketing DDL family (bucket_mapjoin_wrong_table_metadata*) ---

  test("bucketing by a non-existent column is rejected") {
    spark.sql("DROP TABLE IF EXISTS neg_bucket_bad")
    val e = ddlError(
      "CREATE TABLE neg_bucket_bad (a INT) USING parquet " +
        "CLUSTERED BY (no_such) INTO 4 BUCKETS")
    assert(e.getMessage.toLowerCase.contains("no_such") ||
           e.getMessage.toLowerCase.contains("bucket"), e.getMessage)
  }

  test("a non-positive bucket count is rejected") {
    spark.sql("DROP TABLE IF EXISTS neg_bucket_zero")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE neg_bucket_zero (a INT) USING parquet " +
        "CLUSTERED BY (a) INTO 0 BUCKETS")
    }
    assert(e.getMessage.toLowerCase.contains("bucket"), e.getMessage)
  }

  // ---- window-frame violations (windowing_*, distinct_windowing_*) ---

  test("window function nested inside an aggregate is rejected (windowing_leadlag_in_udaf)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT sum(lead(p_retailprice, 1) OVER (ORDER BY p_partkey)) FROM neg_part").collect()
    }
    assert(e.getMessage.toLowerCase.contains("window"), e.getMessage)
  }

  test("an unknown function used with OVER is a clean unresolved-routine error") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT nonexistfunc(p_partkey) OVER () FROM neg_part").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nonexistfunc"), e.getMessage)
  }

  test("inverted frame bounds are rejected (ROWS BETWEEN n FOLLOWING AND m PRECEDING)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT sum(p_size) OVER (ORDER BY p_partkey
                  |ROWS BETWEEN 3 FOLLOWING AND 1 PRECEDING) FROM neg_part""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("frame") ||
           e.getMessage.toLowerCase.contains("boundary"), e.getMessage)
  }

  test("DISTINCT inside a window aggregate is rejected (distinct_windowing_failure)") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT count(DISTINCT p_brand) OVER (PARTITION BY p_type) FROM neg_part")
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("distinct"), e.getMessage)
  }

  // ---- UDTF misuse (udtf_not_supported*, lateral_view_alias) ---------

  test("a generator nested inside another expression is rejected") {
    // (Spark 4 accepts multiple top-level generators per SELECT — an
    // engine extension over the reference, which rejects even that; the
    // hard error both engines share is nesting one in an expression.)
    val e = intercept[AnalysisException] {
      spark.sql("SELECT explode(array(1,2)) + 1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("generator"), e.getMessage)
  }

  test("a generator in the WHERE clause is rejected") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT 1 WHERE explode(array(true, false))").collect()
    }
    assert(e.getMessage.toLowerCase.contains("generator") ||
           e.getMessage.toLowerCase.contains("explode"), e.getMessage)
  }

  test("LATERAL VIEW alias count must match the generator arity (lateral_view_alias)") {
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT k FROM (SELECT 1 AS id)
                  |LATERAL VIEW explode(map('a', 1)) t AS k""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("alias"), e.getMessage)
  }

  // ---- grouping / ordering misuse (groupby_*, clusterbyorderby,
  // orderby_invalid_position, subquery_*) ------------------------------

  test("grouping_id outside GROUPING SETS/ROLLUP/CUBE is rejected") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT p_brand, grouping_id() FROM neg_part GROUP BY p_brand").collect()
    }
    assert(e.getMessage.toLowerCase.contains("grouping"), e.getMessage)
  }

  test("ORDER BY ordinal out of range is rejected (orderby_invalid_position)") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT p_brand FROM neg_part ORDER BY 99").collect()
    }
    assert(e.getMessage.contains("99"), e.getMessage)
  }

  test("CLUSTER BY cannot be combined with ORDER BY (clusterbyorderby)") {
    val e = intercept[Exception] {
      spark.sql("SELECT p_brand FROM neg_part CLUSTER BY p_brand ORDER BY p_brand").collect()
    }
    assert(e.getMessage.toUpperCase.contains("ORDER BY") ||
           e.getMessage.toUpperCase.contains("CLUSTER"), e.getMessage)
  }

  test("IN subquery with mismatched column count is rejected (subquery_multiple_cols)") {
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT p_partkey FROM neg_part
                  |WHERE p_partkey IN (SELECT p_partkey, p_brand FROM neg_part)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("subquery") ||
           e.getMessage.toLowerCase.contains("column"), e.getMessage)
  }

  test("non-deterministic scalar-subquery misuse: multi-row scalar subquery errors at runtime") {
    val e = intercept[Throwable] {
      spark.sql("SELECT (SELECT p_brand FROM neg_part) AS b").collect()
    }
    assert(e.getMessage.toLowerCase.contains("more than one row") ||
           e.getMessage.toLowerCase.contains("scalar"), e.getMessage)
  }

  test("UNION with mismatched column counts is rejected (union2/union3 analog)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_u")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT p_partkey FROM neg_part_u
                  |UNION ALL SELECT p_partkey, p_brand FROM neg_part_u""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("number of columns") ||
           e.getMessage.toLowerCase.contains("union"), e.getMessage)
  }

  test("INSERT with mismatched column count is rejected (insert arity analog)") {
    spark.sql("DROP TABLE IF EXISTS neg_ins_t")
    spark.sql("CREATE TABLE neg_ins_t (a INT, b STRING) USING parquet")
    try {
      val e = intercept[AnalysisException] {
        spark.sql("INSERT INTO neg_ins_t VALUES (1, 'x', 99)")
      }
      assert(e.getMessage.toLowerCase.contains("column") ||
             e.getMessage.toLowerCase.contains("data"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_ins_t")
  }

  test("TABLESAMPLE BUCKET x OUT OF y with x > y is rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_ts")
    val e = intercept[Throwable] {
      graft.operators.Sampling.bucketSample(
        spark.table("neg_part_ts"), col("p_partkey"), 9, 4).collect()
    }
    assert(e.getMessage.toLowerCase.contains("bucket") ||
           e.getMessage.toLowerCase.contains("requirement"), e.getMessage)
  }

  test("an invalid date literal yields NULL under the cast path (date_literal analog)") {
    val r = one("CAST('2024-13-45' AS DATE)")
    assert(r.isNullAt(0))
    val r2 = one("CAST('not-a-date' AS TIMESTAMP)")
    assert(r2.isNullAt(0))
  }

  test("LATERAL VIEW over a non-generator expression is rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_lv")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT x FROM neg_part_lv
                  |LATERAL VIEW upper(p_brand) t AS x""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("generator") ||
           e.getMessage.toLowerCase.contains("upper"), e.getMessage)
  }

  test("GROUP BY ordinal out of range is rejected (groupby_position analog)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_gb")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT p_brand, COUNT(1) FROM neg_part_gb GROUP BY 7").collect()
    }
    assert(e.getMessage.toLowerCase.contains("position") ||
           e.getMessage.toLowerCase.contains("group"), e.getMessage)
  }

  test("aggregate nested inside another aggregate is rejected (nested_agg analog)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_na")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT MAX(COUNT(p_size)) FROM neg_part_na").collect()
    }
    assert(e.getMessage.toLowerCase.contains("nested") ||
           e.getMessage.toLowerCase.contains("aggregate"), e.getMessage)
  }

  test("HAVING references a non-grouped, non-aggregated column -> rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_hv")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT p_brand, COUNT(1) FROM neg_part_hv
                  |GROUP BY p_brand HAVING p_size > 3""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("group") ||
           e.getMessage.toLowerCase.contains("aggregate"), e.getMessage)
  }

  // ---- round-4 continuation: ambiguity, wrong-object DDL, self-read
  // overwrite, runtime asserts (ambiguous_col*, drop_table_failure*,
  // alter_non_existent, udf_assert_true2, cte dup, analyze missing) ----

  test("ambiguous column reference across a self-join is rejected (ambiguous_col)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_amb")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT p_size FROM neg_amb a
                  |JOIN neg_amb b ON a.p_partkey = b.p_partkey""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("ambiguous"), e.getMessage)
  }

  test("casting an array to a numeric type is rejected (wrong_column_type analog)") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT CAST(array(1, 2) AS INT)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("cast"), e.getMessage)
  }

  test("assert_true(false) raises at runtime, true side is free (udf_assert_true2)") {
    assert(spark.sql("SELECT assert_true(1 < 2) IS NULL AS ok").collect()(0).getBoolean(0))
    val e = intercept[Exception] {
      spark.sql("SELECT assert_true(2 < 1)").collect()
    }
    assert(e.getMessage.contains("2 < 1") || e.getMessage.toLowerCase.contains("assert"),
      e.getMessage)
  }

  test("ALTER TABLE on a non-existent table is rejected (alter_non_existent_table)") {
    val e = ddlError("ALTER TABLE no_such_tbl_xyz ADD COLUMNS (z INT)")
    assert(e.getMessage.toLowerCase.contains("no_such_tbl_xyz") ||
           e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("DROP TABLE on a view and DROP VIEW on a table are both rejected (drop_table_failure)") {
    spark.sql("DROP TABLE IF EXISTS neg_obj_tbl")
    spark.sql("CREATE TABLE neg_obj_tbl (a INT) USING parquet")
    spark.sql("CREATE OR REPLACE VIEW neg_obj_view AS SELECT 1 AS one")
    try {
      val e1 = ddlError("DROP TABLE neg_obj_view")
      assert(e1.getMessage.toLowerCase.contains("view"), e1.getMessage)
      val e2 = ddlError("DROP VIEW neg_obj_tbl")
      assert(e2.getMessage.toLowerCase.contains("table") ||
             e2.getMessage.toLowerCase.contains("view"), e2.getMessage)
    } finally {
      spark.sql("DROP VIEW IF EXISTS neg_obj_view")
      spark.sql("DROP TABLE IF EXISTS neg_obj_tbl")
    }
  }

  test("INSERT OVERWRITE into a table being read in the same query is rejected") {
    spark.sql("DROP TABLE IF EXISTS neg_self_rw")
    spark.sql("CREATE TABLE neg_self_rw USING parquet AS SELECT 1 AS a")
    try {
      val e = intercept[AnalysisException] {
        spark.sql("INSERT OVERWRITE TABLE neg_self_rw SELECT a + 1 FROM neg_self_rw")
      }
      assert(e.getMessage.toLowerCase.contains("read") ||
             e.getMessage.toLowerCase.contains("overwrit"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_self_rw")
  }

  test("ANALYZE TABLE on a missing table is rejected (columnstats_tbllvl analog)") {
    val e = ddlError("ANALYZE TABLE missing_stats_tbl COMPUTE STATISTICS")
    assert(e.getMessage.toLowerCase.contains("missing_stats_tbl") ||
           e.getMessage.toLowerCase.contains("not found"), e.getMessage)
  }

  test("an invalid datetime pattern is a clean error, not garbage output") {
    val e = intercept[Exception] {
      spark.sql("SELECT date_format(date'2020-01-01', 'qq-ww-!')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("pattern") ||
           e.getMessage.toLowerCase.contains("illegal") ||
           e.getMessage.toLowerCase.contains("format"), e.getMessage)
  }

  test("duplicate CTE names in one WITH clause are rejected") {
    val e = intercept[AnalysisException] {
      spark.sql("WITH c AS (SELECT 1 AS x), c AS (SELECT 2 AS x) SELECT * FROM c").collect()
    }
    assert(e.getMessage.toLowerCase.contains("c") &&
           (e.getMessage.toLowerCase.contains("duplicate") ||
            e.getMessage.toLowerCase.contains("defined")), e.getMessage)
  }

  test("set operations with mismatched column counts are rejected (union-family)") {
    val e1 = intercept[AnalysisException] {
      spark.sql("SELECT 1, 2 INTERSECT SELECT 1").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("column"), e1.getMessage)
    val e2 = intercept[AnalysisException] {
      spark.sql("SELECT 1 EXCEPT SELECT 1, 2").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("column"), e2.getMessage)
  }

  test("set operation over incompatible types is rejected") {
    val e = intercept[AnalysisException] {
      spark.sql("SELECT array(1) AS a INTERSECT SELECT map('k', 1) AS a").collect()
    }
    assert(e.getMessage.toLowerCase.contains("compatible") ||
           e.getMessage.toLowerCase.contains("type"), e.getMessage)
  }

  test("USING join on a column absent from one side is rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_using_p")
    Tables.supplier(spark, sf).createOrReplaceTempView("neg_using_s")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT * FROM neg_using_p JOIN neg_using_s USING (p_partkey)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("p_partkey"), e.getMessage)
  }

  test("explode over a non-collection column is a clean type error") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_expl")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT explode(p_brand) FROM neg_expl").collect()
    }
    assert(e.getMessage.toLowerCase.contains("type") ||
           e.getMessage.toLowerCase.contains("array"), e.getMessage)
  }

  test("percentile fraction outside [0,1] and ntile(0) are rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_pctl")
    val e1 = intercept[Exception] {
      spark.sql("SELECT percentile(p_size, 1.5) FROM neg_pctl").collect()
    }
    assert(e1.getMessage.toLowerCase.contains("percentage") ||
           e1.getMessage.toLowerCase.contains("between"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT ntile(0) OVER (ORDER BY p_size) FROM neg_pctl").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("ntile") ||
           e2.getMessage.toLowerCase.contains("positive") ||
           e2.getMessage.toLowerCase.contains("greater"), e2.getMessage)
  }

  test("negative LIMIT is rejected; out-of-range array index yields NULL (ANSI off)") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_lim")
    val e = intercept[AnalysisException] {
      spark.sql("SELECT p_partkey FROM neg_lim LIMIT -1").collect()
    }
    assert(e.getMessage.toLowerCase.contains("limit"), e.getMessage)
    val r = spark.sql("SELECT array(1, 2)[5] AS v").collect()(0)
    assert(r.isNullAt(0), "out-of-range index must be NULL with ANSI off")
  }

  test("ALTER TABLE RENAME COLUMN on a v1 parquet table is rejected, not corrupting") {
    spark.sql("DROP TABLE IF EXISTS neg_rencol")
    spark.sql("CREATE TABLE neg_rencol (a INT, b STRING) USING parquet")
    try {
      val e = intercept[AnalysisException] {
        spark.sql("ALTER TABLE neg_rencol RENAME COLUMN a TO z")
      }
      assert(e.getMessage.toLowerCase.contains("rename") ||
             e.getMessage.toLowerCase.contains("support"), e.getMessage)
      // table remains intact and queryable after the rejected DDL
      assert(spark.table("neg_rencol").columns.sameElements(Array("a", "b")))
    } finally spark.sql("DROP TABLE IF EXISTS neg_rencol")
  }

  test("RANGE frame with an offset over a string sort key is rejected") {
    Tables.part(spark, sf).createOrReplaceTempView("neg_part_rf")
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT sum(p_size) OVER (ORDER BY p_brand
                  |  RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) FROM neg_part_rf""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("range") ||
           e.getMessage.toLowerCase.contains("data type"), e.getMessage)
  }

  // --- round-5 depth: the analysis families the reference stresses most
  // (clientnegative subquery_* / acid-on-nonacid writes / TRANSFORM
  // misuse / load-path misuse) ---

  test("comparing a scalar against a multi-column subquery is rejected (subquery_select_aggregate analog)") {
    Tables.registerAll(spark, sf)
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT n_name FROM nation
                  |WHERE n_nationkey = (SELECT s_suppkey, s_nationkey FROM supplier)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("column") ||
           e.getMessage.toLowerCase.contains("subquery"), e.getMessage)
  }

  test("scalar subquery producing more than one row fails loudly at runtime (subquery_scalar_multi_rows)") {
    Tables.registerAll(spark, sf)
    val e = intercept[Exception] {
      spark.sql("SELECT (SELECT s_suppkey FROM supplier) AS one FROM nation").collect()
    }
    assert(e.getMessage.toLowerCase.contains("more than one row") ||
           e.getMessage.contains("SCALAR_SUBQUERY_TOO_MANY_ROWS"), e.getMessage)
  }

  test("IN over a tuple with mismatched subquery column count is rejected (subquery_in_groupby kin)") {
    Tables.registerAll(spark, sf)
    val e = intercept[AnalysisException] {
      spark.sql("""SELECT n_name FROM nation
                  |WHERE (n_nationkey, n_name) IN (SELECT s_suppkey FROM supplier)""".stripMargin)
        .collect()
    }
    assert(e.getMessage.toLowerCase.contains("column") ||
           e.getMessage.toLowerCase.contains("mismatch"), e.getMessage)
  }

  test("TRANSFORM through a failing script surfaces the exit status (script_error analog)") {
    Tables.registerAll(spark, sf)
    val e = intercept[org.apache.spark.SparkException] {
      spark.sql("""SELECT TRANSFORM (n_name) USING 'false' AS (x STRING)
                  |FROM nation""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("exit") ||
           e.getMessage.toLowerCase.contains("status"), e.getMessage)
  }

  test("TRANSFORM through a nonexistent binary is a clean job failure, not a hang") {
    Tables.registerAll(spark, sf)
    val e = intercept[org.apache.spark.SparkException] {
      spark.sql("""SELECT TRANSFORM (n_name) USING '/no/such/graft_binary' AS (x STRING)
                  |FROM nation""".stripMargin).collect()
    }
    assert(e.getMessage.toLowerCase.contains("no such") ||
           e.getMessage.toLowerCase.contains("cannot run") ||
           e.getMessage.toLowerCase.contains("error"), e.getMessage)
  }

  test("UPDATE on a non-transactional parquet table is rejected (update_non_acid_table analog)") {
    spark.sql("DROP TABLE IF EXISTS neg_nonacid_u")
    spark.sql("CREATE TABLE neg_nonacid_u USING parquet AS SELECT id FROM range(3)")
    try {
      val e = intercept[Exception] {
        spark.sql("UPDATE neg_nonacid_u SET id = 0 WHERE id = 1")
      }
      assert(e.getMessage.toLowerCase.contains("update") ||
             e.getMessage.toLowerCase.contains("support"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_nonacid_u")
  }

  test("DELETE on a non-transactional parquet table is rejected (delete_non_acid_table analog)") {
    spark.sql("DROP TABLE IF EXISTS neg_nonacid_d")
    spark.sql("CREATE TABLE neg_nonacid_d USING parquet AS SELECT id FROM range(3)")
    try {
      val e = intercept[Exception] {
        spark.sql("DELETE FROM neg_nonacid_d WHERE id = 1")
      }
      assert(e.getMessage.toLowerCase.contains("delete") ||
             e.getMessage.toLowerCase.contains("support"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_nonacid_d")
  }

  test("MERGE INTO a non-transactional parquet table is rejected; CopyOnWrite is the graft path") {
    spark.sql("DROP TABLE IF EXISTS neg_nonacid_m")
    spark.sql("CREATE TABLE neg_nonacid_m USING parquet AS SELECT id FROM range(3)")
    try {
      val e = intercept[Exception] {
        spark.sql("""MERGE INTO neg_nonacid_m t USING (SELECT 1 AS id) s
                    |ON t.id = s.id WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.toLowerCase.contains("merge") ||
             e.getMessage.toLowerCase.contains("support"), e.getMessage)
    } finally spark.sql("DROP TABLE IF EXISTS neg_nonacid_m")
  }

  test("LOAD DATA from a missing path and unparsable LOAD DATA are typed errors") {
    spark.sql("DROP TABLE IF EXISTS neg_load_t")
    spark.sql("CREATE TABLE neg_load_t (id BIGINT) USING parquet")
    try {
      val e = intercept[IllegalArgumentException] {
        graft.etl.LoadData.load(spark, "/no/such/graft_load_dir", "neg_load_t")
      }
      assert(e.getMessage.contains("does not exist"), e.getMessage)
      intercept[IllegalArgumentException] {
        graft.etl.LoadData.sql(spark, "LOAD DATA SIDEWAYS INTO neg_load_t")
      }
    } finally spark.sql("DROP TABLE IF EXISTS neg_load_t")
  }

  test("LOAD DATA into a view is rejected (load_view_failure analog)") {
    spark.sql("DROP VIEW IF EXISTS neg_load_v")
    // persistent view (temp-view references are themselves rejected)
    spark.sql("CREATE VIEW neg_load_v AS SELECT 1 AS id")
    try {
      intercept[Exception] {
        graft.etl.LoadData.load(spark, "/tmp", "neg_load_v")
      }
    } finally spark.sql("DROP VIEW IF EXISTS neg_load_v")
  }

  test("streaming aggregate in append mode without a watermark is rejected") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("ts", TimestampType), StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_neg_s1").toString
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = stream.groupBy(window(col("ts"), "1 hour")).count()
    val e = intercept[AnalysisException] {
      agg.writeStream.outputMode("append").format("memory")
        .queryName("neg_nowatermark").start()
    }
    assert(e.getMessage.toLowerCase.contains("watermark"), e.getMessage)
  }

  test("streaming complete mode without an aggregation is rejected") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("v", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft_neg_s2").toString
    val stream = spark.readStream.schema(schema).parquet(dir)
    val e = intercept[AnalysisException] {
      stream.select(col("v")).writeStream.outputMode("complete")
        .format("memory").queryName("neg_nocomplete").start()
    }
    assert(e.getMessage.toLowerCase.contains("complete"), e.getMessage)
  }

  test("incremental candidates without the is_new flag column is a typed error") {
    import graft.operators.Dedup
    val idx = Dedup.bandIndex(Dedup.minhashSignatures(Dedup.shingleHashes(
      Tables.documents(spark, sf))))
    val e = intercept[AnalysisException] {
      Dedup.incrementalCandidatesFlagged(idx).collect()
    }
    assert(e.getMessage.contains("is_new"), e.getMessage)
  }

  test("PQ rejects undecodable configurations loudly") {
    import graft.operators.Similarity
    val emb = Tables.embeddings(spark, sf)
    // dim=64 not divisible by m=7 subspaces — a silent remainder would
    // quietly drop trailing dimensions from every code
    val e = intercept[IllegalArgumentException] {
      Similarity.pqEncode(emb, m = 7, ks = 16)
    }
    assert(e.getMessage.contains("divisible"), e.getMessage)
    intercept[IllegalArgumentException] { Similarity.pqEncode(emb, m = 0, ks = 16) }
    intercept[IllegalArgumentException] { Similarity.pqEncode(emb, m = 8, ks = 1) }
  }

  test("range-join family rejects non-positive widths loudly") {
    import graft.operators.RangeJoin
    import org.apache.spark.sql.functions.col
    val df = Tables.events(spark, sf)
    val e = intercept[IllegalArgumentException] {
      RangeJoin.bucketed(df, col("ts"), df, col("ts"), col("ts"), 0L)
    }
    assert(e.getMessage.contains("positive"), e.getMessage)
    intercept[IllegalArgumentException] {
      RangeJoin.overlaps(df, col("ts"), col("ts"), df, col("ts"), col("ts"), -1L)
    }
    intercept[IllegalArgumentException] {
      RangeJoin.band(df, col("value"), df, col("value"), 0.0)
    }
  }
}
