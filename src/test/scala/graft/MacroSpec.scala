package graft

import org.apache.spark.sql.AnalysisException
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Macros

/** CREATE/DROP TEMPORARY MACRO analog over Spark SQL scalar functions
  * (reference MacroSemanticAnalyzer.java; clientpositive/macro.q). */
class MacroSpec extends AnyFunSuite {
  import TestSession._

  test("Hive macro spellings register, evaluate inline, and drop") {
    // the three shapes from the reference's macro.q
    Macros.sql(spark, "CREATE TEMPORARY MACRO sigmoid(x DOUBLE) 1.0 / (1.0 + exp(-x))")
    assert(spark.sql("SELECT sigmoid(0.0) AS v").collect()(0).getDouble(0) == 0.5)

    Macros.sql(spark, "CREATE TEMPORARY MACRO fixed_number() 42")
    assert(spark.sql("SELECT fixed_number() AS v").collect()(0).getInt(0) == 42)

    Macros.sql(spark,
      "CREATE TEMPORARY MACRO simple_add(x INT, y INT) x + y")
    assert(spark.sql("SELECT simple_add(1, 9) AS v").collect()(0).getInt(0) == 10)

    // a macro call is expression inlining, not a UDF dispatch: the plan
    // shows the expanded arithmetic and stays codegen'd
    val df = spark.sql("SELECT simple_add(id, 1) AS v FROM range(5)")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), plan.take(500))

    Macros.sql(spark, "DROP TEMPORARY MACRO sigmoid")
    intercept[AnalysisException] { spark.sql("SELECT sigmoid(1.0)").collect() }
    // IF EXISTS tolerates a missing macro; bad grammar is a typed error
    Macros.sql(spark, "DROP TEMPORARY MACRO IF EXISTS never_was")
    intercept[IllegalArgumentException] { Macros.sql(spark, "CREATE MACRO nope") }
    Macros.sql(spark, "DROP TEMPORARY MACRO fixed_number")
    Macros.sql(spark, "DROP TEMPORARY MACRO simple_add")
  }

  test("macro redefinition replaces the previous body (CREATE OR REPLACE semantics)") {
    Macros.sql(spark, "CREATE TEMPORARY MACRO twice(x INT) x * 2")
    assert(spark.sql("SELECT twice(4) AS v").collect()(0).getInt(0) == 8)
    Macros.sql(spark, "CREATE TEMPORARY MACRO twice(x INT) x * 200")
    assert(spark.sql("SELECT twice(4) AS v").collect()(0).getInt(0) == 800)
    Macros.sql(spark, "DROP TEMPORARY MACRO twice")
  }
}
