package graft.operators

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

  val queries: Map[String, Q] = Map(
    "q46_explode" -> q46_explode,
    "q47_posexplode" -> q47_posexplode,
    "q48_explode_outer" -> q48_explode_outer,
    "q49_stack" -> q49_stack,
    "q99_json_tuple" -> q99_json_tuple,
  )

  val oracles: Map[String, String] = Map(
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
