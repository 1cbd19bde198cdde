package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FunctionDdl, UdfDeploy}
import graft.hplsql.Hplsql

/** Compiled-UDF deployment (functions/UdfDeploy — FunctionTask.java /
  * exec/UDF.java evaluate-convention analog). Pins: DDL deploys and
  * drops; overload resolution by argument types; null short-circuit for
  * primitive params vs null flow-through for boxed; bad classes fail at
  * DDL time (not first query); procedural CREATE FUNCTION bodies still
  * parse (the AS-string form must not swallow them). */
class UdfDeploySpec extends AnyFunSuite {
  import TestSession._

  test("deploy via DDL, call from SQL, overloads resolve by type, drop deregisters") {
    Hplsql.run(spark,
      "CREATE TEMPORARY FUNCTION t_add AS 'graft.examples.ExampleAddUdf';")
    try {
      val r = spark.sql(
        "SELECT t_add(3, 4) AS i, t_add(cast(1.5 as double), cast(2.25 as double)) AS d")
        .collect()(0)
      assert(r.getInt(0) == 7)
      assert(r.getDouble(1) == 3.75)
      // the Int overload returns IntegerType, the Double one DoubleType
      val sch = spark.sql("SELECT t_add(1, 2) AS a, t_add(1.0d, 2.0d) AS b").schema
      assert(sch("a").dataType.typeName == "integer")
      assert(sch("b").dataType.typeName == "double")
    } finally Hplsql.run(spark, "DROP TEMPORARY FUNCTION t_add;")
    intercept[Exception](spark.sql("SELECT t_add(1, 2)").collect())
  }

  test("null semantics: primitive params short-circuit, boxed String flows through") {
    UdfDeploy.create(spark, "t_add2", "graft.examples.ExampleAddUdf")
    UdfDeploy.create(spark, "t_redact", "graft.examples.ExampleRedactDigitsUdf")
    try {
      val r = spark.sql(
        "SELECT t_add2(cast(null as int), 4) AS n, t_redact('a1b2') AS s, " +
          "t_redact(cast(null as string)) AS sn").collect()(0)
      assert(r.isNullAt(0)) // primitive param + null arg -> null, UDF never runs
      assert(r.getString(1) == "a#b#")
      assert(r.isNullAt(2)) // boxed param: the class saw the null and chose null
    } finally { UdfDeploy.drop(spark, "t_add2"); UdfDeploy.drop(spark, "t_redact") }
  }

  test("bad deployments fail at DDL time; USING JAR is refused with direction") {
    intercept[Exception](
      FunctionDdl.run(spark, "CREATE TEMPORARY FUNCTION nope AS 'no.such.Class'"))
    intercept[IllegalArgumentException](
      FunctionDdl.run(spark,
        "CREATE TEMPORARY FUNCTION nope AS 'graft.examples.ExampleAddUdf' USING JAR '/x.jar'"))
    // a class without evaluate is refused by the convention check
    intercept[Exception](
      FunctionDdl.run(spark, "CREATE TEMPORARY FUNCTION nope AS 'java.lang.String'"))
  }

  test("procedural CREATE FUNCTION still parses: AS-string is the only passthrough shape") {
    val out = Hplsql.run(spark,
      """CREATE FUNCTION twice(x INT) RETURNS INT
        |BEGIN
        |  RETURN x * 2;
        |END;
        |PRINT twice(21);""".stripMargin).output
    assert(out.trim == "42")
  }
}
