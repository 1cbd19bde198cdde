package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Scalar builtin surface (SURVEY.md §2.3 — FunctionRegistry.java:183-489).
  * The reference's ~250 builtins are nearly all same-named Spark builtins;
  * these queries pin the behavior of each family against the DuckDB oracle
  * so dialect/semantics drift is caught (e.g. Hive regexp_replace replaces
  * ALL matches; libm-backed math is rounded to kill 1-ulp engine drift).
  * All are narrow projections: at 100 TB the parquet scan reads only the
  * referenced columns (check ReadSchema in .explain).
  */
object ScalarFunctions {

  /** String function family (udf/generic/GenericUDFConcat etc.). */
  val q40_string_funcs: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 500)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit("/"), col("p_type")).as("cat"),
        concat_ws("-", col("p_brand"), col("p_type"), col("p_name")).as("cat_ws"),
        upper(col("p_name")).as("uname"),
        lower(col("p_type")).as("ltype"),
        length(col("p_name")).as("name_len"),
        substring(col("p_name"), 1, 4).as("name4"),
        lpad(col("p_brand"), 12, "*").as("brand_lpad"),
        rpad(col("p_brand"), 12, "#").as("brand_rpad"),
        trim(lpad(col("p_brand"), 12, " ")).as("brand_trim"),
        reverse(col("p_name")).as("rev_name"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
        regexp_extract(col("p_name"), "^(\\w+) ", 1).as("first_word"),
        split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
        instr(col("p_name"), "a").as("a_pos"),
        translate(col("p_name"), "abc", "xyz").as("trans"),
        repeat(col("p_brand"), 2).as("brand2"),
        ascii(col("p_name")).as("first_ascii"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        md5(col("p_name")).as("name_md5"),
        replace(col("p_name"), lit("small"), lit("tiny")).as("renamed"))
      .orderBy(col("p_partkey"))
  }

  /** Math function family. libm functions (sin/cos/exp/ln/pow) rounded to
    * 9 decimals: Java Math and C libm may differ in the final ulp. */
  val q41_math_funcs: Q = (s, d) => {
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice")).cast("double").as("fl"),
        ceil(col("l_extendedprice")).cast("double").as("ce"),
        round(col("l_extendedprice"), 1).as("rnd1"),
        abs(col("l_quantity") * -1).as("absq"),
        sqrt(col("l_quantity")).as("sq"),
        round(exp(col("l_discount")), 9).as("e_disc"),
        round(log(col("l_extendedprice")), 9).as("ln_price"),
        round(log10(col("l_extendedprice")), 9).as("log10_price"),
        round(pow(col("l_quantity"), lit(2.0)), 6).as("q2"),
        signum(col("l_quantity") - 25).as("sgn"),
        round(sin(col("l_quantity")), 9).as("sinq"),
        round(cos(col("l_quantity")), 9).as("cosq"),
        (col("l_orderkey") % 7).as("mod7"),
        pmod(col("l_orderkey") * -1, lit(7)).as("pmod7"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        (col("l_linenumber").bitwiseAND(5)).as("band"),
        (col("l_linenumber").bitwiseOR(8)).as("bor"),
        (col("l_linenumber").bitwiseXOR(3)).as("bxor"),
        greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
        least(col("l_quantity"), col("l_tax") * 100).as("le"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Date/time family (year..weekofyear, date arithmetic, formatting,
    * epoch — udf/generic/GenericUDFDate*). */
  val q42_date_funcs: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 500)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("fmt"),
        date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
        add_months(col("o_orderdate").cast("date"), 2).as("plus2m"),
        last_day(col("o_orderdate")).as("eom"),
        trunc(col("o_orderdate").cast("date"), "month").as("som"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date")).as("days_to_2002"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        dayofweek(col("o_orderdate")).as("dow"))
      .orderBy(col("o_orderkey"))
  }

  /** Conditional / null-handling family (GenericUDFCase/When/Coalesce/
    * NullIf, null-safe <=>). */
  val q43_conditional: Q = (s, d) => {
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        when(col("c_acctbal") < 0, "overdrawn")
          .when(col("c_acctbal") < 5000, "low")
          .otherwise("high").as("bal_band"),
        coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("seg"),
        (col("c_acctbal") <=> lit(0.0)).as("zero_safe"),
        greatest(col("c_acctbal"), lit(0.0)).as("nonneg"),
        least(col("c_nationkey"), lit(10)).as("cap10"),
        when(col("c_acctbal").isNull, 1).otherwise(0).as("is_null"),
        when(col("c_acctbal").isNotNull, 1).otherwise(0).as("not_null"))
      .orderBy(col("c_custkey"))
  }

  /** Complex-type constructors/accessors (array/map/struct,
    * GenericUDFArray/Map/Struct/SortArray/ArrayContains), reduced to
    * scalar outputs for the oracle. */
  val q44_complex_types: Q = (s, d) => {
    val words = split(col("p_name"), " ")
    Tables.part(s, d)
      .filter(col("p_partkey") < 500)
      .select(
        col("p_partkey"),
        size(words).as("n_words"),
        element_at(words, 1).as("w1"),
        element_at(words, -1).as("wlast"),
        array_contains(words, "small").as("has_small"),
        concat_ws("|", array_sort(words)).as("sorted_words"),
        concat_ws("|", slice(words, 1, 1)).as("first_slice"),
        struct(col("p_brand").as("b"), col("p_size").as("sz")).getField("sz").as("sz_via_struct"),
        map(lit("size"), col("p_size")).getItem("size").as("sz_via_map"),
        sequence(lit(1), col("p_size") % 3 + 1).as("seq").cast("string"))
      .orderBy(col("p_partkey"))
  }

  /** JSON family: get_json_object / from_json over events.props
    * (hcatalog JsonSerDe + GenericUDFJson). */
  val q45_json: Q = (s, d) => {
    Tables.events(s, d)
      .filter(col("event_id") < 2000)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_int"),
        from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.IntegerType)))).getField("k").as("k_struct"),
        (get_json_object(col("props"), "$.k").cast("int") % 10).as("k_mod"))
      .orderBy(col("event_id"))
  }

  /** Array algebra (sort_array/array_distinct/union/except/intersect/
    * flatten/reverse/slice — GenericUDFSortArray + the modern array
    * surface). Set-valued results are sorted and joined to strings:
    * Spark preserves first-occurrence order, DuckDB doesn't specify. */
  val q44b_array_funcs: Q = (s, d) => {
    val w1 = split(col("p_name"), " ")
    val w2 = split(lower(col("p_type")), " ")
    def asStr(c: org.apache.spark.sql.Column) = concat_ws("|", array_sort(c))
    Tables.part(s, d)
      .filter(col("p_partkey") < 400)
      .select(
        col("p_partkey"),
        asStr(array_distinct(concat(w1, w1))).as("dedup"),
        asStr(array_union(w1, w2)).as("uni"),
        asStr(array_except(w1, w2)).as("exc"),
        asStr(array_intersect(w1, array(lit("small"), lit("red"), lit("blue")))).as("inter"),
        asStr(flatten(array(w1, w2))).as("flat"),
        concat_ws("|", reverse(w1)).as("rev"),
        concat_ws("|", slice(w1, 1, 1)).as("head1"),
        array_position(w1, "small").as("pos_small"),
        size(array_remove(w1, "small")).as("n_wo_small"))
      .orderBy(col("p_partkey"))
  }

  val queries: Map[String, Q] = Map(
    "q40_string_funcs" -> q40_string_funcs,
    "q44b_array_funcs" -> q44b_array_funcs,
    "q41_math_funcs" -> q41_math_funcs,
    "q42_date_funcs" -> q42_date_funcs,
    "q43_conditional" -> q43_conditional,
    "q44_complex_types" -> q44_complex_types,
    "q45_json" -> q45_json,
  )

  val oracles: Map[String, String] = Map(
    "q44b_array_funcs" ->
      """WITH t AS (SELECT p_partkey,
        |    string_split(p_name, ' ') AS w1,
        |    string_split(lower(p_type), ' ') AS w2
        |  FROM part WHERE p_partkey < 400)
        |SELECT p_partkey,
        |  array_to_string(list_sort(list_distinct(list_concat(w1, w1))), '|') AS dedup,
        |coalesce(  array_to_string(list_sort(list_distinct(list_concat(w1, w2))), '|'), '') AS uni,
        |coalesce(  array_to_string(list_sort(list_distinct(list_filter(w1, x -> NOT list_contains(w2, x)))), '|'), '') AS exc,
        |coalesce(  array_to_string(list_sort(list_distinct(list_filter(w1, x -> list_contains(['small','red','blue'], x)))), '|'), '') AS inter,
        |  array_to_string(list_sort(list_concat(w1, w2)), '|') AS flat,
        |  array_to_string(list_reverse(w1), '|') AS rev,
        |  array_to_string(w1[1:1], '|') AS head1,
        |  CAST(coalesce(list_position(w1, 'small'), 0) AS BIGINT) AS pos_small,
        |  len(list_filter(w1, x -> x <> 'small')) AS n_wo_small
        |FROM t ORDER BY p_partkey""".stripMargin,
    "q40_string_funcs" ->
      """SELECT p_partkey,
        |  p_brand || '/' || p_type AS cat,
        |  concat_ws('-', p_brand, p_type, p_name) AS cat_ws,
        |  upper(p_name) AS uname,
        |  lower(p_type) AS ltype,
        |  length(p_name) AS name_len,
        |  substr(p_name, 1, 4) AS name4,
        |  lpad(p_brand, 12, '*') AS brand_lpad,
        |  rpad(p_brand, 12, '#') AS brand_rpad,
        |  trim(lpad(p_brand, 12, ' ')) AS brand_trim,
        |  reverse(p_name) AS rev_name,
        |  regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
        |  regexp_extract(p_name, '^(\w+) ', 1) AS first_word,
        |  split_part(p_name, ' ', 2) AS second_word,
        |  strpos(p_name, 'a') AS a_pos,
        |  translate(p_name, 'abc', 'xyz') AS trans,
        |  repeat(p_brand, 2) AS brand2,
        |  ascii(p_name) AS first_ascii,
        |  levenshtein(p_name, p_type) AS lev,
        |  md5(p_name) AS name_md5,
        |  replace(p_name, 'small', 'tiny') AS renamed
        |FROM part WHERE p_partkey < 500 ORDER BY p_partkey""".stripMargin,
    "q41_math_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  floor(l_extendedprice) AS fl,
        |  ceil(l_extendedprice) AS ce,
        |  round(l_extendedprice, 1) AS rnd1,
        |  abs(l_quantity * -1) AS absq,
        |  sqrt(l_quantity) AS sq,
        |  round(exp(l_discount), 9) AS e_disc,
        |  round(ln(l_extendedprice), 9) AS ln_price,
        |  round(log10(l_extendedprice), 9) AS log10_price,
        |  round(pow(l_quantity, 2.0), 6) AS q2,
        |  CASE WHEN l_quantity - 25 > 0 THEN 1.0
        |       WHEN l_quantity - 25 < 0 THEN -1.0 ELSE 0.0 END AS sgn,
        |  round(sin(l_quantity), 9) AS sinq,
        |  round(cos(l_quantity), 9) AS cosq,
        |  l_orderkey % 7 AS mod7,
        |  ((l_orderkey * -1) % 7 + 7) % 7 AS pmod7,
        |  l_linenumber << 3 AS shl,
        |  l_linenumber & 5 AS band,
        |  l_linenumber | 8 AS bor,
        |  xor(l_linenumber, 3) AS bxor,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_quantity, l_tax * 100) AS le
        |FROM lineitem WHERE l_orderkey < 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q42_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y,
        |  quarter(o_orderdate) AS q,
        |  month(o_orderdate) AS m,
        |  dayofmonth(o_orderdate) AS dom,
        |  strftime(o_orderdate, '%Y-%m-%d') AS fmt,
        |  CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS plus30,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS eom,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS som,
        |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
        |  (isodow(o_orderdate) % 7) + 1 AS dow
        |FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey""".stripMargin,
    "q43_conditional" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'MACHINERY'), 'OTHER') AS seg,
        |  c_acctbal IS NOT DISTINCT FROM 0.0 AS zero_safe,
        |  greatest(c_acctbal, 0.0) AS nonneg,
        |  least(c_nationkey, 10) AS cap10,
        |  CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS is_null,
        |  CASE WHEN c_acctbal IS NOT NULL THEN 1 ELSE 0 END AS not_null
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q44_complex_types" ->
      """WITH t AS (SELECT p_partkey, p_brand, p_size,
        |                  string_split(p_name, ' ') AS words FROM part
        |           WHERE p_partkey < 500)
        |SELECT p_partkey,
        |  len(words) AS n_words,
        |  words[1] AS w1,
        |  words[-1] AS wlast,
        |  list_contains(words, 'small') AS has_small,
        |  array_to_string(list_sort(words), '|') AS sorted_words,
        |  array_to_string(words[1:1], '|') AS first_slice,
        |  p_size AS sz_via_struct,
        |  p_size AS sz_via_map,
        |  '[' || array_to_string(generate_series(1, p_size % 3 + 1), ', ') || ']' AS seq
        |FROM t ORDER BY p_partkey""".stripMargin,
    "q45_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct,
        |  CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
  )
}
