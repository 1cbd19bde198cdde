package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Type-system edges from the reference's typeinfo layer
  * (serde/src/java/org/apache/hadoop/hive/serde2/typeinfo/TypeInfoFactory.java:45-68,
  * CharTypeInfo.java, DecimalTypeInfo.java):
  *
  *  - decimal(p,s): exact arithmetic, Hive precision/scale propagation
  *    (Spark implements Hive's rules natively), overflow -> NULL with ANSI
  *    off (pinned in CoercionSpec).
  *  - char(n)/varchar(n): Hive CAST pads char / truncates varchar; Spark
  *    only enforces these on table columns, so the cast semantics are
  *    provided as engine functions here (and table-level enforcement is
  *    pinned in CoercionSpec).
  *  - intervals: year-month / day-time arithmetic with end-of-month
  *    clamping (add_months semantics match the reference).
  *
  * All three run against DuckDB oracles — exact decimal strings, not
  * doubles, so a single ulp of drift in scale handling breaks the hash.
  */
object TypeSystem {

  /** Hive `CAST(x AS CHAR(n))`: truncate to n, then right-pad to n. */
  def hiveChar(c: Column, n: Int): Column = rpad(substring(c.cast("string"), 1, n), n, " ")

  /** Hive `CAST(x AS VARCHAR(n))`: truncate to n. */
  def hiveVarchar(c: Column, n: Int): Column = substring(c.cast("string"), 1, n)

  /** Exact decimal arithmetic: net/charged prices computed and summed as
    * decimals end-to-end, emitted as strings — any scale/rounding
    * divergence from the oracle's exact decimals is a hash mismatch. */
  val q107_decimal_arith: Q = (s, d) => {
    val price = col("l_extendedprice").cast(DecimalType(12, 2))
    val disc = col("l_discount").cast(DecimalType(4, 2))
    val tax = col("l_tax").cast(DecimalType(4, 2))
    val one = lit(1).cast(DecimalType(3, 2))
    val net = (price * (one - disc)).cast(DecimalType(25, 4))
    val charged = (price * (one - disc) * (one + tax)).cast(DecimalType(25, 6))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") < 1000)
      .groupBy(col("l_returnflag"))
      .agg(
        sum(net).cast(DecimalType(25, 4)).cast("string").as("sum_net_exact"),
        sum(charged).cast(DecimalType(25, 6)).cast("string").as("sum_charged_exact"),
        avg(net).cast(DecimalType(25, 8)).cast("string").as("avg_net_exact"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** char/varchar semantics as row-level functions over nation names. */
  val q108_char_varchar: Q = (s, d) => {
    Tables.nation(s, d)
      .select(col("n_nationkey"),
        hiveChar(col("n_name"), 12).as("name_char12"),
        length(hiveChar(col("n_name"), 12)).as("char_len"),
        hiveVarchar(col("n_name"), 5).as("name_vc5"),
        length(hiveVarchar(col("n_name"), 5)).as("vc_len"))
      .orderBy(col("n_nationkey"))
  }

  /** Interval arithmetic over order dates: year-month intervals clamp to
    * month end, day-time intervals are exact day addition. */
  val q109_intervals: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"), col("o_orderdate"),
        add_months(col("o_orderdate"), 3).as("plus_3m"),
        add_months(col("o_orderdate"), -14).as("minus_14m"),
        date_add(col("o_orderdate"), 45).as("plus_45d"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate")).as("days_to_end"))
      .orderBy(col("o_orderkey"))
  }

  /** The round-11 char(n) semantics (plans.HiveCharSemantics), driven
    * through the gate: under preserveCharVarcharTypeInfo, typed char
    * casts compare STRIPPED (char(15) = char(25) of the same text is
    * TRUE — padded bytes differ), char->string casts strip, and the
    * stored value pads to n (HiveChar.java compareTo/getValue). Confs
    * restore after analysis so later gate queries see the engine
    * defaults. */
  val q307_char_stripped: Q = (s, d) => {
    val prevPreserve = s.conf.get("spark.sql.preserveCharVarcharTypeInfo", "false")
    s.conf.set("spark.sql.preserveCharVarcharTypeInfo", "true")
    s.conf.set("graft.compat.hive.char", "true")
    try {
      Tables.part(s, d).createOrReplaceTempView("q307_part")
      s.sql("""SELECT p_partkey,
                      CAST(CAST(p_brand AS CHAR(15)) AS STRING) AS c15,
                      (CAST(p_brand AS CHAR(15)) = CAST(p_brand AS CHAR(25))) AS eq_chars,
                      length(CAST(p_brand AS CHAR(15))) AS len15
               FROM q307_part WHERE p_partkey <= 500 ORDER BY p_partkey""")
    } finally {
      s.conf.set("spark.sql.preserveCharVarcharTypeInfo", prevPreserve)
      s.conf.set("graft.compat.hive.char", "false")
    }
  }

  /** The round-12 Hive 2.1 decimal DIVISION derivation
    * (plans.HiveDecimalArithmetic; GenericUDFOPDivide
    * .deriveResultDecimalTypeInfo): decimal(20,10) / int-literal-4
    * derives decimal(22,12) there — p2 is the CONSTANT's digit count
    * (1), scale = max(6, s1+p2+1) = 12 — where Spark's own rule gives
    * scale 21. The string render pins the derived scale AND the
    * HALF_UP value chain. */
  val q308_decimal_hive_div: Q = (s, d) => {
    s.conf.set("graft.compat.hive.decimal", "true")
    try {
      Tables.lineitem(s, d).createOrReplaceTempView("q308_lineitem")
      s.sql("""SELECT l_orderkey, l_linenumber,
                      CAST(CAST(l_quantity AS DECIMAL(20,10)) / 4 AS STRING) AS divs
               FROM q308_lineitem WHERE l_orderkey <= 300
               ORDER BY l_orderkey, l_linenumber""")
    } finally s.conf.set("graft.compat.hive.decimal", "false")
  }

  val queries: Map[String, Q] = Map(
    "q107_decimal_arith" -> q107_decimal_arith,
    "q108_char_varchar" -> q108_char_varchar,
    "q109_intervals" -> q109_intervals,
    "q307_char_stripped" -> q307_char_stripped,
    "q308_decimal_hive_div" -> q308_decimal_hive_div,
  )

  val oracles: Map[String, String] = Map(
    "q307_char_stripped" ->
      """SELECT p_partkey, p_brand AS c15, true AS eq_chars, 15 AS len15
        |FROM part WHERE p_partkey <= 500 ORDER BY p_partkey""".stripMargin,
    "q308_decimal_hive_div" ->
      """SELECT l_orderkey, l_linenumber, printf('%.12f', l_quantity / 4) AS divs
        |FROM lineitem WHERE l_orderkey <= 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q107_decimal_arith" ->
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      AS DECIMAL(25,4))) AS DECIMAL(25,4)) AS VARCHAR) AS sum_net_exact,
        |  CAST(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))
        |      AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS VARCHAR) AS sum_charged_exact,
        |  CAST(CAST(AVG(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
        |      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))
        |      AS DECIMAL(25,4))) AS DECIMAL(25,8)) AS VARCHAR) AS avg_net_exact,
        |  COUNT(1) AS n_rows
        |FROM lineitem WHERE l_orderkey < 1000
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q108_char_varchar" ->
      """SELECT n_nationkey,
        |  rpad(substr(n_name, 1, 12), 12, ' ') AS name_char12,
        |  CAST(length(rpad(substr(n_name, 1, 12), 12, ' ')) AS INT) AS char_len,
        |  substr(n_name, 1, 5) AS name_vc5,
        |  CAST(length(substr(n_name, 1, 5)) AS INT) AS vc_len
        |FROM nation ORDER BY n_nationkey""".stripMargin,
    "q109_intervals" ->
      """SELECT o_orderkey, o_orderdate,
        |  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  CAST(o_orderdate - INTERVAL 14 MONTH AS DATE) AS minus_14m,
        |  CAST(o_orderdate + INTERVAL 45 DAY AS DATE) AS plus_45d,
        |  CAST(date_diff('day', o_orderdate, DATE '1998-12-01') AS INT) AS days_to_end
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
  )
}
