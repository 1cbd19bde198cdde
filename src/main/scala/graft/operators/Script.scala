package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** TRANSFORM ... USING 'cmd' — the reference's ScriptOperator
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/ScriptOperator.java:66,
  * 875 LoC: fork process, pump rows over stdin/stdout with a record
  * serde). Spark SQL's ScriptTransformationExec implements the identical
  * no-serde contract (tab-separated text rows), so the surface is just
  * SQL. The identity transform through `cat` round-trips rows to text
  * and back — the result must equal the direct aggregation, which is
  * what the oracle checks.
  */
object Script {

  /** Fingerprint queries live here too: native codegen'd expressions
    * (graft.functions.{PolyHash, MinGramHash}) applied per document.
    * Rows-only — the hash family has no DuckDB equivalent; exact values
    * are pinned in FingerprintSpec. */
  val q75_fingerprint: Q = (s, d) => {
    graft.functions.Fingerprint.register(s)
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.functions.Fingerprint.poly_hash(col("text")).as("fp"),
        graft.functions.Fingerprint.min_gram_hash(col("text"), 8).as("win_fp"))
      .orderBy(col("doc_id"))
  }

  /** TRANSFORM through `cat`: text-serde round trip + aggregate. */
  val q77_transform: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT flag, COUNT(1) AS n, SUM(CAST(qty AS DOUBLE)) AS sum_qty
        |FROM (
        |  SELECT TRANSFORM (l_returnflag, l_quantity)
        |  USING 'cat' AS (flag STRING, qty STRING)
        |  FROM lineitem) t
        |GROUP BY flag ORDER BY flag""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q75_fingerprint" -> q75_fingerprint,
    "q77_transform" -> q77_transform,
  )

  val oracles: Map[String, String] = Map(
    "q77_transform" ->
      """SELECT l_returnflag AS flag, COUNT(1) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin,
  )
}
