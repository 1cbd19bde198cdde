package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** UDTF / LATERAL VIEW surface (SURVEY.md §2.6): the reference's
  * UDTFOperator + LateralViewForward/JoinOperator
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/UDTFOperator.java:43,
  * LateralViewJoinOperator.java:76) and builtins explode/posexplode/
  * stack (FunctionRegistry.java:447-453). In Spark these are Catalyst
  * Generators — `select($"*", explode(...))` is exactly LATERAL VIEW,
  * explode_outer the OUTER variant. Generators run inside whole-stage
  * codegen; no shuffle is introduced.
  */
object Generators {

  /** LATERAL VIEW explode: word frequency over part names. */
  val q46_explode: Q = (s, d) => {
    Tables.part(s, d)
      .select(explode(split(col("p_name"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
  }

  /** posexplode: position-tagged explode (0-based like Hive). */
  val q47_posexplode: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 200)
      .select(col("p_partkey"),
              posexplode(split(col("p_name"), " ")).as(Seq("pos", "word")))
      .orderBy(col("p_partkey"), col("pos"))
  }

  /** LATERAL VIEW OUTER explode: rows with empty generator output keep a
    * null row (LateralViewJoinOperator OUTER variant). Long words only —
    * most parts have none. */
  val q48_explode_outer: Q = (s, d) => {
    val longWords = filter(split(col("p_name"), " "), w => length(w) > 5)
    Tables.part(s, d)
      .filter(col("p_partkey") < 500)
      .select(col("p_partkey"), explode_outer(longWords).as("long_word"))
      .orderBy(col("p_partkey"), col("long_word"))
  }

  /** stack(): constant table generator joined against data
    * (GenericUDTFStack). */
  val q49_stack: Q = (s, d) => {
    val bands = Tables.region(s, d).sparkSession.range(1)
      .select(expr("stack(3, 'low', 0.0D, 'mid', 3.0D, 'high', 6.0D)")
        .as(Seq("band", "lo")))
    Tables.supplier(s, d)
      .join(bands, col("s_acctbal") >= col("lo") * 1000)
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("band"))
  }

  /** json_tuple UDTF (GenericUDTFJSONTuple; FunctionRegistry.java:447-453)
    * — multi-field JSON extraction in one generator pass. */
  val q99_json_tuple: Q = (s, d) => {
    Tables.events(s, d)
      .filter(col("event_id") < 1000)
      .select(col("event_id"),
        expr("json_tuple(props, 'k', 'missing')").as(Seq("k", "missing")))
      .select(col("event_id"), col("k").cast("int").as("k"),
              coalesce(col("missing"), lit("absent")).as("missing"))
      .orderBy(col("event_id"))
  }

  /** inline() UDTF (GenericUDTFInline; FunctionRegistry.java:447-453):
    * explode an array-of-structs into columns — here un-pivoting part
    * attributes into (attr, value) rows in one generator pass. */
  val q105_inline: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 100)
      .select(col("p_partkey"), inline(array(
        struct(lit("brand").as("attr"), col("p_brand").as("value")),
        struct(lit("type").as("attr"), col("p_type").as("value")))))
      .orderBy(col("p_partkey"), col("attr"))
  }

  /** parse_url_tuple UDTF (udf/generic/GenericUDTFParseUrlTuple.java):
    * extract N URL parts in one pass. Re-expressed as an N-column
    * projection of Spark's codegen'd parse_url — common-subexpression
    * elimination shares the parse, which is the UDTF's whole point.
    * Supports the reference's `QUERY:<key>` syntax. */
  def parseUrlTuple(url: Column, parts: String*): Seq[Column] = parts.map { p =>
    val c =
      if (p.startsWith("QUERY:"))
        call_function("parse_url", url, lit("QUERY"), lit(p.stripPrefix("QUERY:")))
      else call_function("parse_url", url, lit(p))
    c.as(p.toLowerCase.replace(":", "_"))
  }

  val q106_parse_url_tuple: Q = (s, d) => {
    val url = concat(lit("https://shop.example.com/"), col("c_mktsegment"),
      lit("/item?cust="), col("c_custkey"), lit("&seg="), col("c_mktsegment"))
    Tables.customer(s, d)
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey") +:
        parseUrlTuple(url, "PROTOCOL", "HOST", "PATH", "QUERY", "QUERY:cust"): _*)
      .orderBy(col("c_custkey"))
  }

  /** Chained LATERAL VIEWs — Hive's multi-generator statement form
    * (LateralViewJoinOperator stacked twice; ql/src/test/queries/
    * clientpositive/lateral_view.q exercises exactly this). Spark parses
    * the same syntax; each generator stays inside codegen, and the
    * per-row fan-out is the product of the two small generator arities
    * (words × mfgr fields), not a shuffle. */
  val q181_lateral_chain: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT w, m, COUNT(1) AS n
        |FROM part
        |LATERAL VIEW explode(split(p_name, ' ')) t1 AS w
        |LATERAL VIEW explode(split(p_type, ' ')) t2 AS m
        |WHERE p_partkey <= 500
        |GROUP BY w, m
        |ORDER BY n DESC, w, m""".stripMargin)
  }

  /** The reference's SQL invocation form, end to end: `LATERAL VIEW
    * parse_url_tuple(...)` resolved through the registered Generator
    * (functions/ParseUrlTuple.scala; GraftExtensions injects it), not
    * the Scala helper — what a migrating user actually types
    * (ql/.../GenericUDTFParseUrlTuple.java:55, FunctionRegistry.java:450). */
  val q310_parse_url_tuple_sql: Q = (s, d) => {
    Tables.registerAll(s, d)
    s.sql(
      """SELECT c_custkey, pr, ho, pa, qu, qc
        |FROM (SELECT c_custkey,
        |        concat('https://shop.example.com/', c_mktsegment,
        |               '/item?cust=', c_custkey, '&seg=', c_mktsegment) AS u
        |      FROM customer WHERE c_custkey <= 200) t
        |LATERAL VIEW parse_url_tuple(u, 'PROTOCOL', 'HOST', 'PATH', 'QUERY',
        |                             'QUERY:cust') b AS pr, ho, pa, qu, qc
        |ORDER BY c_custkey""".stripMargin)
  }

  val queries: Map[String, Q] = Map(
    "q310_parse_url_tuple_sql" -> q310_parse_url_tuple_sql,
    "q181_lateral_chain" -> q181_lateral_chain,
    "q105_inline" -> q105_inline,
    "q106_parse_url_tuple" -> q106_parse_url_tuple,
    "q46_explode" -> q46_explode,
    "q47_posexplode" -> q47_posexplode,
    "q48_explode_outer" -> q48_explode_outer,
    "q49_stack" -> q49_stack,
    "q99_json_tuple" -> q99_json_tuple,
  )

  val oracles: Map[String, String] = Map(
    "q310_parse_url_tuple_sql" ->
      """SELECT c_custkey,
        |  'https' AS pr,
        |  'shop.example.com' AS ho,
        |  '/' || c_mktsegment || '/item' AS pa,
        |  'cust=' || c_custkey || '&seg=' || c_mktsegment AS qu,
        |  CAST(c_custkey AS VARCHAR) AS qc
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
    "q105_inline" ->
      """SELECT p_partkey, 'brand' AS attr, p_brand AS value
        |FROM part WHERE p_partkey < 100
        |UNION ALL
        |SELECT p_partkey, 'type' AS attr, p_type AS value
        |FROM part WHERE p_partkey < 100
        |ORDER BY p_partkey, attr""".stripMargin,
    "q106_parse_url_tuple" ->
      """SELECT c_custkey,
        |  'https' AS protocol,
        |  'shop.example.com' AS host,
        |  '/' || c_mktsegment || '/item' AS path,
        |  'cust=' || c_custkey || '&seg=' || c_mktsegment AS query,
        |  CAST(c_custkey AS VARCHAR) AS query_cust
        |FROM customer WHERE c_custkey <= 200 ORDER BY c_custkey""".stripMargin,
    "q181_lateral_chain" ->
      """WITH t1 AS (SELECT p_type, unnest(string_split(p_name, ' ')) AS w
        |  FROM part WHERE p_partkey <= 500),
        |t2 AS (SELECT w, unnest(string_split(p_type, ' ')) AS m FROM t1)
        |SELECT w, m, COUNT(1) AS n FROM t2
        |GROUP BY w, m
        |ORDER BY n DESC, w, m""".stripMargin,
    "q46_explode" ->
      """SELECT word, COUNT(1) AS n FROM (
        |  SELECT unnest(string_split(p_name, ' ')) AS word FROM part) t
        |GROUP BY word ORDER BY n DESC, word""".stripMargin,
    "q47_posexplode" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws
        |           FROM part WHERE p_partkey < 200),
        |     e AS (SELECT p_partkey, ws,
        |                  unnest(generate_series(1, len(ws))) AS i FROM w)
        |SELECT p_partkey, CAST(i - 1 AS INT) AS pos, ws[i] AS word
        |FROM e ORDER BY p_partkey, pos""".stripMargin,
    "q48_explode_outer" ->
      """WITH t AS (SELECT p_partkey,
        |    list_filter(string_split(p_name, ' '), w -> length(w) > 5) AS lw
        |  FROM part WHERE p_partkey < 500)
        |SELECT p_partkey, u.long_word
        |FROM t LEFT JOIN LATERAL (SELECT unnest(lw) AS long_word) u ON TRUE
        |ORDER BY p_partkey, long_word""".stripMargin,
    "q49_stack" ->
      """WITH bands(band, lo) AS (VALUES ('low', 0.0), ('mid', 3.0), ('high', 6.0))
        |SELECT band, COUNT(1) AS n
        |FROM supplier JOIN bands ON s_acctbal >= lo * 1000
        |GROUP BY band ORDER BY band""".stripMargin,
    "q99_json_tuple" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  COALESCE(json_extract_string(props, '$.missing'), 'absent') AS missing
        |FROM events WHERE event_id < 1000 ORDER BY event_id""".stripMargin,
  )
}
