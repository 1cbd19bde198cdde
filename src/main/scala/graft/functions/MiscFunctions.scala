package graft.functions

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** The long tail of the reference's scalar registry (SURVEY.md §2.3):
  * radix/bit/binary encodings, Hive-compat string helpers, masking, URL
  * parsing, map construction. Split two ways:
  *  - q78: functions DuckDB also has -> oracle-checked.
  *  - q79: Hive/Spark-only functions (mask, parse_url, str_to_map,
  *    initcap, soundex, format_number, elt, find_in_set, sentences) ->
  *    rows-only; exact values pinned in MiscFunctionsSpec.
  */
object MiscFunctions {
  import org.apache.spark.sql.Column

  /** Hive's mask_* family (FunctionRegistry.java:484-489,
    * udf/generic/GenericUDFMaskFirstN.java et al.) as compositions over
    * Spark's builtin mask() — upper->X, lower->x, digit->n, rest kept. */
  private def maskAll(c: Column): Column = call_function("mask", c)

  def mask_first_n(c: Column, n: Int): Column =
    concat(maskAll(c.substr(lit(1), lit(n))), c.substr(lit(n + 1), length(c)))

  def mask_last_n(c: Column, n: Int): Column = {
    val keep = greatest(length(c) - n, lit(0))
    concat(c.substr(lit(1), keep), maskAll(c.substr(keep + 1, lit(n))))
  }

  def mask_show_first_n(c: Column, n: Int): Column =
    concat(c.substr(lit(1), lit(n)), maskAll(c.substr(lit(n + 1), length(c))))

  def mask_show_last_n(c: Column, n: Int): Column = {
    val keep = greatest(length(c) - n, lit(0))
    concat(maskAll(c.substr(lit(1), keep)), c.substr(keep + 1, lit(n)))
  }

  /** GenericUDFMaskHash: deterministic digest of the value. */
  def mask_hash(c: Column): Column = md5(c.cast("binary"))

  /** Register the reference-exact mask family as SQL functions on
    * `spark` (mask_first_n/last_n/show_first_n/show_last_n/mask_hash,
    * full Hive argument surface incl. numeric and date masking —
    * [[HiveMask]]). `includePlainMask = true` also overrides `mask`
    * itself with Hive's 9-argument form; default leaves Spark's
    * codegen'd builtin in place. */
  def registerMaskUdfs(spark: org.apache.spark.sql.SparkSession,
                       includePlainMask: Boolean = false): Unit =
    HiveMask.register(spark, includePlainMask)

  /** Encodings & radix math with DuckDB twins. */
  val q78_encodings: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 300)
      .select(
        col("p_partkey"),
        hex(col("p_name").cast("binary")).as("name_hex"),
        base64(col("p_name").cast("binary")).as("name_b64"),
        bin(col("p_size").cast("long")).as("size_bin"),
        conv(col("p_size").cast("string"), 10, 16).as("size_hex16"),
        sha2(col("p_name").cast("binary"), 256).as("name_sha256"),
        length(col("p_name").cast("binary")).as("n_bytes"))
      .orderBy(col("p_partkey"))
  }

  /** Hive-only surface: masking, URL parsing, map construction, misc
    * string helpers. Deterministic; pinned by spec, no DuckDB analog. */
  val q79_hive_compat: Q = (s, d) => {
    Tables.customer(s, d)
      .filter(col("c_custkey") < 200)
      .select(
        col("c_custkey"),
        expr("mask(c_name)").as("masked"),
        mask_show_first_n(col("c_name"), 4).as("masked_show4"),
        mask_first_n(col("c_name"), 4).as("masked_first4"),
        mask_last_n(col("c_name"), 3).as("masked_last3"),
        mask_show_last_n(col("c_name"), 2).as("masked_show_last2"),
        mask_hash(col("c_name")).as("masked_hash"),
        initcap(col("c_mktsegment")).as("seg_initcap"),
        soundex(col("c_name")).as("name_soundex"),
        format_number(col("c_acctbal"), 1).as("bal_fmt"),
        expr("elt(1 + CAST(c_custkey % 3 AS INT), 'alpha', 'beta', 'gamma')").as("elt_pick"),
        expr("find_in_set(c_mktsegment, 'BUILDING,AUTOMOBILE,MACHINERY')").as("seg_pos"),
        expr("parse_url(concat('http://example.com/', c_mktsegment, '?id=', c_custkey), 'PATH')").as("url_path"),
        expr("parse_url(concat('http://example.com/x?id=', c_custkey), 'QUERY', 'id')").as("url_id"),
        expr("str_to_map(concat('k1:', c_custkey, ',k2:', c_nationkey), ',', ':')['k2']").as("map_k2"),
        crc32(col("c_name").cast("binary")).as("name_crc32"),
        expr("sentences(concat(c_mktsegment, ' one. ', c_mktsegment, ' two.'))[0][1]").as("sent_tok"))
      .orderBy(col("c_custkey"))
  }

  /** Approximate aggregates (HLL NDV = the reference's compute_stats FM
    * sketch, GenericUDAFComputeStats.java; hive_percentile_approx = the
    * reference's NumericHistogram algorithm reimplemented as a
    * TypedImperativeAggregate, see NumericHistogram.scala; Spark's
    * Greenwald-Khanna percentile_approx kept alongside for contrast).
    * Rows-only; exactness/stability pinned in HistogramSpec. Every lane
    * now has a hash-exact twin: histogram via q294, percentile via q211,
    * and the approx-NDV lane via q303 (the engine's KMV path,
    * under-fill-exact against DuckDB COUNT DISTINCT) — HLL++ itself stays
    * rows-only because its estimate is not exactly replayable. */
  val q80_approx_aggs: Q = (s, d) => {
    HivePercentileApprox.register(s)
    HiveHistogramNumeric.register(s)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey")).as("ndv_part"),
        approx_count_distinct(col("l_orderkey")).as("ndv_order"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50_approx"),
        HivePercentileApprox.hive_percentile_approx(
          col("l_extendedprice"), 0.5, 1000).as("p50_hive_hist"),
        expr("histogram_numeric(l_quantity, 5)")(0).getField("y").as("hist_bin0_height"),
        expr("hive_histogram_numeric(l_quantity, 5)")(0).getField("y").as("hive_hist_bin0"))
      .orderBy(col("l_returnflag"))
  }

  /** hive_percentile_approx promoted from rows-only (q80) to a full
    * oracle row. The estimator is order-sensitive in general (partial
    * merges keep equal centroids as separate fragments, so interpolation
    * inside a value's mass depends on partition layout) — but when every
    * input value is globally UNIQUE, every bin has weight 1, fragments
    * cannot exist, and the quantile walk (NumericHistogram.scala:131-148,
    * reference GenericUDAFPercentileApprox.java) is a closed-form,
    * partitioning-independent formula DuckDB can recompute exactly:
    * aggregating over DISTINCT (flag, quantity) pairs makes the histogram
    * exact-when-fits AND fragment-free, so the gate compares real
    * interpolated quantiles bit-for-bit. */
  val q211_percentile_exact: Q = (s, d) => {
    HivePercentileApprox.register(s)
    val dv = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity").cast("double").as("v"))
      .distinct()
    dv.groupBy(col("l_returnflag"))
      .agg(
        HivePercentileApprox.hive_percentile_approx(col("v"), 0.25, 1000).as("p25"),
        HivePercentileApprox.hive_percentile_approx(col("v"), 0.37, 1000).as("p37"),
        HivePercentileApprox.hive_percentile_approx(col("v"), 0.5, 1000).as("p50"),
        HivePercentileApprox.hive_percentile_approx(col("v"), 0.9, 1000).as("p90"),
        count(lit(1)).as("m"))
      .orderBy(col("l_returnflag"))
  }

  /** histogram_numeric promoted from rows-only (q80) to a full oracle
    * row, by the q211 fits-exactly argument: NumericHistogram merges the
    * closest bin pair ONLY on overflow (NumericHistogram.scala, reference
    * GenericUDAFHistogramNumeric.java), so when the group's distinct
    * value count (l_quantity: 50) is under nbins (64), no merge ever
    * fires — in any partition, in any merge order — and the result is
    * exactly the sorted (value, count) pairs. DuckDB replays that as a
    * relational GROUP BY, bit-for-bit. The under-capacity regime is the
    * estimator's documented exactness contract, not a lucky case. */
  val q294_histogram_exact: Q = (s, d) => {
    HiveHistogramNumeric.register(s)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(expr("hive_histogram_numeric(l_quantity, 64)").as("hist"))
      .select(col("l_returnflag"), explode(col("hist")).as("bin"))
      .select(col("l_returnflag"),
        col("bin.x").cast("double").as("x"),
        col("bin.y").cast("double").as("y"))
      .orderBy(col("l_returnflag"), col("x"))
  }

  /** Long-tail string builtins (FunctionRegistry.java:183-269) with
    * DuckDB twins: substring_index (±n), locate, printf/format_string,
    * space, chr. */
  val q112_string_tail: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") < 200)
      .select(col("p_partkey"),
        substring_index(col("p_name"), " ", 2).as("si2"),
        substring_index(col("p_name"), " ", -1).as("si_last"),
        locate("al", col("p_name")).as("loc"),
        format_string("%s|%03d", col("p_brand"), col("p_size")).as("fmt"),
        expr("concat('[', space(2), ']')").as("sp"),
        expr("chr(65 + pmod(p_size, 26))").as("ch"))
      .orderBy(col("p_partkey"))
  }

  /** Long-tail date builtins (FunctionRegistry.java:274-294): next_day,
    * trunc-to-month. (months_between and the UTC conversions are pinned
    * in MiscFunctionsSpec — no faithful DuckDB twin.) */
  val q113_date_tail: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 2000)
      .select(col("o_orderkey"),
        next_day(col("o_orderdate"), "MO").as("next_mon"),
        trunc(col("o_orderdate"), "MM").as("mstart"),
        quarter(col("o_orderdate")).as("qtr"))
      .orderBy(col("o_orderkey"))
  }

  /** The full mask_* family (GenericUDFMask*.java), promoted from
    * spec-only pins to an oracle row: DuckDB has no mask(), but Hive's
    * default masking IS three character-class substitutions (upper→X,
    * lower→x, digit→n, other kept), so the oracle replicates it with
    * regexp_replace chains and substr splits — an independent spelling,
    * not a shared implementation. Scan-side projection, codegen'd. */
  val q187_masking: Q = (s, d) => {
    val c = col("c_name")
    Tables.customer(s, d).filter(col("c_custkey") <= 300)
      .select(col("c_custkey"),
        expr("mask(c_name)").as("m_all"),
        mask_first_n(c, 4).as("m_first4"),
        mask_last_n(c, 4).as("m_last4"),
        mask_show_first_n(c, 4).as("m_show_first4"),
        mask_show_last_n(c, 4).as("m_show_last4"),
        mask_hash(c).as("m_hash"))
      .orderBy(col("c_custkey"))
  }

  /** Second string long-tail oracle slice: levenshtein / find_in_set /
    * elt / translate / instr / ascii / chr (FunctionRegistry.java:
    * 191-269), each checked against an independent DuckDB spelling
    * (find_in_set -> list_position over a split list, elt -> CASE).
    * Complements q112's substring_index/locate/printf/space slice so
    * the whole Hive string surface is oracle-checked, not just pinned. */
  val q188_string_tail2: Q = (s, d) => {
    Tables.part(s, d).filter(col("p_partkey") <= 400)
      .select(col("p_partkey"),
        levenshtein(col("p_name"), col("p_type")).as("lev"),
        expr("find_in_set(p_brand, 'Brand#1,Brand#12,Brand#23,Brand#34,Brand#45')").as("fis"),
        expr("elt(1 + pmod(p_partkey, 2), p_brand, p_type)").as("elted"),
        translate(col("p_name"), "aeiou", "AEIOU").as("transl"),
        instr(col("p_name"), "a").as("ins"),
        ascii(col("p_brand")).as("asc"),
        expr("chr(65 + pmod(p_partkey, 26))").as("ch"))
      .orderBy(col("p_partkey"))
  }

  /** xpath family promoted to an oracle row (reference
    * ql/src/java/org/apache/hadoop/hive/ql/udf/xml/UDFXPathUtil.java +
    * GenericUDFXPath: xpath_string/xpath_int/xpath_boolean and the
    * node-list xpath). XML is synthesized in-query from nation, then
    * parsed back with real XPath evaluation; the DuckDB oracle recomputes
    * every field relationally with no XML at all — an independent
    * spelling, so extraction must exactly invert construction. */
  val q197_xpath: Q = (s, d) => {
    Tables.nation(s, d)
      .select(col("n_nationkey"), concat(
        lit("<n><k>"), col("n_nationkey"), lit("</k><nm>"), col("n_name"),
        lit("</nm><r>"), col("n_regionkey"), lit("</r></n>")).as("xml"))
      .select(
        expr("xpath_int(xml, '/n/k/text()')").as("k"),
        expr("xpath_string(xml, '/n/nm/text()')").as("nm"),
        expr("xpath_boolean(xml, '/n/r[text()=\"0\"]')").as("in_r0"),
        expr("size(xpath(xml, '/n/*/text()'))").as("n_children"))
      .orderBy(col("k"))
  }

  val queries: Map[String, Q] = Map(
    "q197_xpath" -> q197_xpath,
    "q188_string_tail2" -> q188_string_tail2,
    "q187_masking" -> q187_masking,
    "q78_encodings" -> q78_encodings,
    "q79_hive_compat" -> q79_hive_compat,
    "q80_approx_aggs" -> q80_approx_aggs,
    "q211_percentile_exact" -> q211_percentile_exact,
    "q294_histogram_exact" -> q294_histogram_exact,
    "q112_string_tail" -> q112_string_tail,
    "q113_date_tail" -> q113_date_tail,
  )

  val oracles: Map[String, String] = Map(
    // Recomputes the NumericHistogram quantile walk in closed form over
    // weight-1 bins: crossing bin b = first with b/m >= q, then
    // v[b-1] + (q*m - (b-1)) * (v[b] - v[b-1]) — same IEEE ops, same
    // association order as the Scala walk, so the match is bit-exact.
    "q211_percentile_exact" -> {
      def p(q: String, name: String) =
        s"""max(CASE WHEN b / m >= $q::DOUBLE AND (b - 1) / m < $q::DOUBLE THEN
           |  CASE WHEN b = 1 THEN v
           |       ELSE vprev + ($q::DOUBLE * m - (b - 1)) * (v - vprev) END
           |END) AS $name""".stripMargin
      s"""WITH dv AS (
         |  SELECT DISTINCT l_returnflag, CAST(l_quantity AS DOUBLE) AS v
         |  FROM lineitem),
         |r AS (
         |  SELECT l_returnflag, v,
         |    CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY v) AS DOUBLE) AS b,
         |    lag(v) OVER (PARTITION BY l_returnflag ORDER BY v) AS vprev,
         |    CAST(count(1) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS m
         |  FROM dv)
         |SELECT l_returnflag,
         |  ${p("0.25", "p25")},
         |  ${p("0.37", "p37")},
         |  ${p("0.5", "p50")},
         |  ${p("0.9", "p90")},
         |  CAST(max(m) AS BIGINT) AS m
         |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
    },
    "q294_histogram_exact" ->
      """SELECT l_returnflag,
        |  CAST(l_quantity AS DOUBLE) AS x,
        |  CAST(COUNT(*) AS DOUBLE) AS y
        |FROM lineitem
        |GROUP BY l_returnflag, l_quantity
        |ORDER BY l_returnflag, x""".stripMargin,
    "q197_xpath" ->
      """SELECT CAST(n_nationkey AS INT) AS k, n_name AS nm,
        |  n_regionkey = 0 AS in_r0, 3 AS n_children
        |FROM nation ORDER BY k""".stripMargin,
    "q188_string_tail2" ->
      """SELECT p_partkey,
        |  CAST(levenshtein(p_name, p_type) AS INT) AS lev,
        |  CAST(coalesce(list_position(
        |    string_split('Brand#1,Brand#12,Brand#23,Brand#34,Brand#45', ','),
        |    p_brand), 0) AS INT) AS fis,
        |  CASE WHEN 1 + (p_partkey % 2) = 1 THEN p_brand ELSE p_type END AS elted,
        |  translate(p_name, 'aeiou', 'AEIOU') AS transl,
        |  CAST(strpos(p_name, 'a') AS INT) AS ins,
        |  ascii(p_brand) AS asc,
        |  chr(CAST(65 + (p_partkey % 26) AS INT)) AS ch
        |FROM part WHERE p_partkey <= 400
        |ORDER BY p_partkey""".stripMargin,
    "q187_masking" -> {
      def mk(s: String) =
        s"regexp_replace(regexp_replace(regexp_replace($s, '[A-Z]', 'X', 'g'), " +
          s"'[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')"
      val keep = "greatest(length(c_name) - 4, 0)"
      s"""SELECT c_custkey,
         |  ${mk("c_name")} AS m_all,
         |  ${mk("substr(c_name, 1, 4)")} || substr(c_name, 5) AS m_first4,
         |  substr(c_name, 1, $keep) || ${mk(s"substr(c_name, $keep + 1)")} AS m_last4,
         |  substr(c_name, 1, 4) || ${mk("substr(c_name, 5)")} AS m_show_first4,
         |  ${mk(s"substr(c_name, 1, $keep)")} || substr(c_name, $keep + 1) AS m_show_last4,
         |  md5(c_name) AS m_hash
         |FROM customer WHERE c_custkey <= 300
         |ORDER BY c_custkey""".stripMargin
    },
    "q78_encodings" ->
      """SELECT p_partkey,
        |  hex(CAST(p_name AS BLOB)) AS name_hex,
        |  to_base64(CAST(p_name AS BLOB)) AS name_b64,
        |  bin(CAST(p_size AS BIGINT)) AS size_bin,
        |  upper(to_hex(p_size)) AS size_hex16,
        |  sha256(p_name) AS name_sha256,
        |  octet_length(CAST(p_name AS BLOB)) AS n_bytes
        |FROM part WHERE p_partkey < 300 ORDER BY p_partkey""".stripMargin,
    "q112_string_tail" ->
      """SELECT p_partkey,
        |  array_to_string(list_slice(string_split(p_name, ' '), 1, 2), ' ') AS si2,
        |  list_extract(string_split(p_name, ' '), len(string_split(p_name, ' '))) AS si_last,
        |  CAST(strpos(p_name, 'al') AS INT) AS loc,
        |  printf('%s|%03d', p_brand, p_size) AS fmt,
        |  '[' || repeat(' ', 2) || ']' AS sp,
        |  chr(CAST(65 + p_size % 26 AS INT)) AS ch
        |FROM part WHERE p_partkey < 200 ORDER BY p_partkey""".stripMargin,
    "q113_date_tail" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE)
        |    + CAST(((1 - isodow(o_orderdate) - 1 + 7) % 7) + 1 AS INT) AS next_mon,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mstart,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr
        |FROM orders WHERE o_orderkey < 2000 ORDER BY o_orderkey""".stripMargin,
  )
}
