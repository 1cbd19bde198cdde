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
    * Hash-exact: the polynomial hash (h = h*31 + byte, wrapping i64) is
    * replayed in the DuckDB oracle with HUGEINT arithmetic mod 2^64 over
    * hex-decoded UTF-8 bytes, and the winnowing min-gram hash never
    * exceeds 2^46 at k=8 (31^7*255*8), so the oracle needs no wraparound
    * there at all. Exact values are additionally pinned in EtlSpec. */
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
    "q75_fingerprint" ->
      """WITH b AS (
        |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
        |  FROM documents),
        |byt AS (
        |  SELECT doc_id, n,
        |    list_transform(range(1, n+1),
        |      i -> (16*(strpos('0123456789ABCDEF', substr(hx, 2*i-1, 1))-1)
        |             + (strpos('0123456789ABCDEF', substr(hx, 2*i, 1))-1))::HUGEINT) AS bs
        |  FROM b),
        |fp AS (
        |  SELECT doc_id, n, bs,
        |    list_reduce(list_prepend(0::HUGEINT, bs),
        |      (a, x) -> (a*31 + x) % 18446744073709551616::HUGEINT) AS hu
        |  FROM byt)
        |SELECT doc_id,
        |  CAST(CASE WHEN hu >= 9223372036854775808::HUGEINT
        |            THEN hu - 18446744073709551616::HUGEINT ELSE hu END AS BIGINT) AS fp,
        |  CASE WHEN n >= 8 THEN
        |    CAST(list_min(list_transform(range(1, n - 6),
        |      st -> list_reduce(list_prepend(0::HUGEINT, list_slice(bs, st, st+7)),
        |              (a, x) -> a*31 + x))) AS BIGINT)
        |  END AS win_fp
        |FROM fp ORDER BY doc_id""".stripMargin,
    "q77_transform" ->
      """SELECT l_returnflag AS flag, COUNT(1) AS n, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY flag""".stripMargin,
  )
}
