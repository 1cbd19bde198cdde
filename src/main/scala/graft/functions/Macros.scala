package graft.functions

import org.apache.spark.sql.SparkSession

/** `CREATE TEMPORARY MACRO` / `DROP TEMPORARY MACRO` (reference
  * ql/src/java/org/apache/hadoop/hive/ql/parse/MacroSemanticAnalyzer.java):
  * a Hive macro is a named, typed-parameter SQL expression template,
  * expanded at analysis time. Spark 4's native SQL scalar functions
  * (`CREATE TEMPORARY FUNCTION name(params) RETURN body`) are the same
  * construct — the body is inlined into the calling plan by Catalyst, so
  * a macro call costs exactly its expression, never a UDF dispatch. This
  * shim only translates the Hive spelling; everything downstream
  * (registration, expansion, codegen) is the native session catalog.
  */
object Macros {

  private val Create =
    """(?is)\s*CREATE\s+TEMPORARY\s+MACRO\s+(\w+)\s*\(([^)]*)\)\s+(.+?)\s*""".r
  private val Drop =
    """(?is)\s*DROP\s+TEMPORARY\s+MACRO\s+(IF\s+EXISTS\s+)?(\w+)\s*""".r

  def sql(spark: SparkSession, statement: String): Unit = statement match {
    case Create(name, params, body) =>
      spark.sql(s"CREATE OR REPLACE TEMPORARY FUNCTION $name($params) RETURN $body")
    case Drop(ifExists, name) =>
      val opt = if (ifExists != null) "IF EXISTS " else ""
      spark.sql(s"DROP TEMPORARY FUNCTION $opt$name")
    case _ =>
      throw new IllegalArgumentException(s"cannot parse MACRO statement: $statement")
  }
}
