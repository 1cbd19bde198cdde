package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}

/** Long-tail scalar builtins from the reference's function registry
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:200-420)
  * that earlier query slices had not touched: trig/root/log variants
  * (atan, cbrt, degrees, radians, log2, power), the ceiling/lcase/ucase
  * aliases, nvl, rlike, date_sub, from_unixtime/to_unix_timestamp,
  * unbase64, and complex-type accessors (named_struct, map_keys,
  * map_values).
  *
  * All are Spark builtins (codegen'd, no UDFs). Parity contract: libm
  * functions differ by 1 ulp across engines → round(..., 9); LONG-vs-
  * DOUBLE return types (ceil) cast to BIGINT on both sides; timestamps
  * compare through the UTC session zone; complex values are emitted as
  * derived scalars (concat_ws over keys/values) so the gate compares
  * plain strings.
  */
object LongTail {

  /** Hive `in_file(str, filename)` (ql/src/java/org/apache/hadoop/hive/ql/
    * udf/UDFInFile.java): true iff the string equals some line of the
    * file. Spark-first: the file is read ONCE at plan construction and
    * becomes a codegen'd `isin` literal set — no per-row file IO (the
    * reference caches the line set per JVM for the same reason). Callers
    * with membership sets too large for an In-literal should join against
    * `spark.read.textFile(path)` instead; this surface mirrors the
    * reference's small-lookup-file use. */
  def inFile(c: org.apache.spark.sql.Column, path: String): org.apache.spark.sql.Column = {
    val src = scala.io.Source.fromFile(path)
    val lines = try src.getLines().toList finally src.close()
    c.isin(lines: _*)
  }

  /** Math/string/date long tail, one row per sampled order. */
  val q167_longtail_scalars: Q = (s, d) => {
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(
        col("o_orderkey"),
        round(atan(col("o_totalprice")), 9).as("v_atan"),
        round(cbrt(col("o_totalprice")), 9).as("v_cbrt"),
        ceil(col("o_totalprice")).cast("long").as("v_ceiling"),
        round(degrees(col("o_totalprice") / 10000.0), 9).as("v_degrees"),
        round(radians(col("o_totalprice") / 10000.0), 9).as("v_radians"),
        round(log2(col("o_totalprice")), 9).as("v_log2"),
        round(pow(col("o_totalprice"), lit(0.5)), 9).as("v_power"),
        ltrim(concat(lit("  "), col("o_orderpriority"))).as("v_ltrim"),
        rtrim(concat(col("o_orderpriority"), lit("  "))).as("v_rtrim"),
        lower(col("o_orderpriority")).as("v_lcase"),
        upper(col("o_orderpriority")).as("v_ucase"),
        expr("nvl(nullif(o_orderpriority, '1-URGENT'), 'URGENTISH')").as("v_nvl"),
        col("o_orderpriority").rlike("^[12]").as("v_rlike"),
        date_sub(col("o_orderdate").cast("date"), 30).as("v_date_sub"),
        from_unixtime(col("o_orderkey") % 100000 + 1500000000L).as("v_from_unixtime"),
        to_unix_timestamp(col("o_orderdate")).as("v_to_unix"),
        unbase64(base64(col("o_orderpriority").cast("binary"))).cast("string")
          .as("v_unbase64"))
      .orderBy(col("o_orderkey"))
  }

  /** Complex-type accessors: named_struct field access, map_keys /
    * map_values flattened to CSV scalars. */
  val q168_complex_access: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") <= 200)
      .select(
        col("p_partkey"),
        expr("named_struct('sz', p_size, 'brand', p_brand).brand").as("v_struct"),
        concat_ws(",", map_keys(map(lit("sz"), col("p_size"),
                                    lit("sz2"), col("p_size") * 2))).as("keys_csv"),
        concat_ws(",", transform(
          map_values(map(lit("sz"), col("p_size"), lit("sz2"), col("p_size") * 2)),
          v => v.cast("string"))).as("vals_csv"))
      .orderBy(col("p_partkey"))
  }

  /** Bitmap-index surface (reference GenericUDAFEWAHBitmap +
    * UDFEWAHBitmapAnd/Or/Empty) proven against DuckDB set semantics:
    * bitmap cardinalities equal COUNT(DISTINCT), AND equals INTERSECT,
    * OR equals UNION. Each lane aggregates to one bitmap row; the cross
    * joins are 1x1. */
  val q169_bitmap_index: Q = (s, d) => {
    import BitmapIndex._
    val li = Tables.lineitem(s, d)
    def lane(flag: String) =
      li.filter(col("l_returnflag") === flag)
        .agg(bitmapAgg(col("l_orderkey")).as(s"bm_$flag"))
    lane("A").crossJoin(lane("N")).crossJoin(lane("R"))
      .select(
        bitmapCount(col("bm_A")).as("n_a"),
        bitmapCount(col("bm_N")).as("n_n"),
        bitmapCount(col("bm_R")).as("n_r"),
        bitmapCount(bitmapAnd(col("bm_A"), col("bm_N"))).as("n_and_an"),
        bitmapCount(bitmapOr(col("bm_A"), col("bm_R"))).as("n_or_ar"),
        bitmapEmpty(bitmapAnd(col("bm_A"), col("bm_N"))).as("and_empty"))
  }

  /** reflect / java_method (reference GenericUDFReflect, ql/src/java/org/
    * apache/hadoop/hive/ql/udf/generic/GenericUDFReflect.java) promoted
    * from spec pins to an oracle row: each reflective call targets a JDK
    * method whose result DuckDB can recompute natively (abs/greatest/
    * bin/to_hex/varchar cast) — the oracle knows nothing about
    * reflection, so the match proves the dispatch returns the right
    * VALUES, not just that it runs. reflect returns string (as in the
    * reference); numeric lanes cast back on both sides. */
  val q212_reflect: Q = (s, d) => {
    Tables.part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        expr("cast(reflect('java.lang.Math', 'abs', cast(p_size - 30 as int)) as int)")
          .as("v_abs"),
        expr("reflect('java.lang.Integer', 'toBinaryString', cast(p_size as int))")
          .as("v_bin"),
        expr("reflect('java.lang.Integer', 'toHexString', cast(p_size as int))")
          .as("v_hex"),
        expr("cast(reflect('java.lang.Math', 'max', cast(p_size as int), 25) as int)")
          .as("v_max"),
        expr("java_method('java.lang.String', 'valueOf', cast(p_size as int))")
          .as("v_str"))
      .orderBy(col("p_partkey"))
  }

  /** in_file promoted to an oracle row: the membership file is written
    * at plan construction (fixed three-line content), [[inFile]] folds it
    * into a codegen'd isin, and the oracle spells the same set as IN
    * literals — proving the file's line set, not just the plumbing. */
  val q213_in_file: Q = (s, d) => {
    val f = java.nio.file.Files.createTempFile("graft_infile_q213", ".txt")
    java.nio.file.Files.write(
      f, java.util.Arrays.asList("1-URGENT", "3-MEDIUM", "5-LOW"))
    f.toFile.deleteOnExit()
    Tables.orders(s, d)
      .filter(inFile(col("o_orderpriority"), f.toString))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** reflect2 (instance-method reflection, functions/Reflect2.scala) as
    * an oracle row: every reflective call targets a JDK instance method
    * DuckDB can recompute natively, and the expression's analysis-time
    * return-type derivation is exercised across string/int/boolean lanes.
    * indexOf is 0-based vs strpos 1-based — the oracle subtracts 1, which
    * also aligns the not-found case (-1 vs 0). */
  val q264_reflect2: Q = (s, d) => {
    Reflect2.register(s)
    Tables.part(s, d)
      .filter(col("p_partkey") <= 300)
      .select(
        col("p_partkey"),
        expr("reflect2(p_brand, 'length')").as("v_len"),
        expr("reflect2(p_brand, 'toLowerCase')").as("v_lower"),
        expr("reflect2(p_brand, 'concat', '!')").as("v_concat"),
        expr("reflect2(p_brand, 'indexOf', '#')").as("v_idx"),
        expr("reflect2(p_brand, 'substring', 6)").as("v_tail"),
        expr("reflect2(p_brand, 'replace', '#', '-')").as("v_repl"),
        expr("reflect2(p_brand, 'startsWith', 'Brand')").as("v_starts"),
        expr("reflect2(cast(p_size as int), 'compareTo', 25)").as("v_cmp"),
        expr("reflect2(cast(p_size as int), 'doubleValue')").as("v_dbl"))
      .orderBy(col("p_partkey"))
  }

  /** Compiled-UDF deployment end-to-end (functions/UdfDeploy — the
    * FunctionTask/Registry analog): two example classes (the contrib
    * module analog) deployed via the DDL through the HPL/SQL route,
    * then called from a plain relational query. The oracle recomputes
    * both evaluate bodies relationally; overload resolution is visible
    * in the hash (the Int overload returns ints, the Double one
    * doubles). DROP at the end proves deregistration (UdfDeploySpec
    * pins the post-drop failure). */
  val q298_udf_deploy: Q = (s, d) => {
    graft.hplsql.Hplsql.run(s,
      """CREATE TEMPORARY FUNCTION example_add AS 'graft.examples.ExampleAddUdf';
        |CREATE TEMPORARY FUNCTION redact_digits AS 'graft.examples.ExampleRedactDigitsUdf';""".stripMargin)
    Tables.part(s, d)
      .filter(col("p_partkey") <= 400)
      .select(
        col("p_partkey"),
        expr("example_add(cast(p_size as int), 7)").as("v_int_add"),
        expr("example_add(cast(p_retailprice as double), 0.5d)").as("v_dbl_add"),
        expr("redact_digits(p_name)").as("v_redacted"))
      .orderBy(col("p_partkey"))
  }

  /** Compiled-UDAF deployment (functions/UdafDeploy — the exec/UDAF.java
    * evaluator convention auto-detected by the same CREATE FUNCTION DDL):
    * a deployed average and a deployed string-max aggregate over a plain
    * groupBy, planned as a normal partial/final hash aggregate. The
    * oracle recomputes both relationally; avg is deterministic because
    * quantity is integral-valued (exact double sums at any partitioning)
    * and the single division happens once in terminate. */
  val q300_udaf_deploy: Q = (s, d) => {
    graft.hplsql.Hplsql.run(s,
      """CREATE TEMPORARY FUNCTION example_avg AS 'graft.examples.ExampleAvgUdaf';
        |CREATE TEMPORARY FUNCTION example_max AS 'graft.examples.ExampleMaxUdaf';""".stripMargin)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        expr("example_avg(l_quantity)").as("avg_qty"),
        expr("example_max(l_linestatus)").as("max_status"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  /** Compiled-UDTF deployment (functions/UdtfDeploy — the GenericUDTF
    * initialize/process/close convention): the deployed splitter runs in
    * the same Generate plan node as builtin explode, in a select list
    * over part names. The oracle replays the split with DuckDB list
    * subscripts. */
  val q301_udtf_deploy: Q = (s, d) => {
    graft.hplsql.Hplsql.run(s,
      "CREATE TEMPORARY FUNCTION example_split AS 'graft.examples.ExampleSplitUdtf';")
    Tables.part(s, d)
      .filter(col("p_partkey") <= 250)
      .select(col("p_partkey"), expr("example_split(p_name, ' ')"))
      .orderBy(col("p_partkey"), col("pos"))
  }

  val queries: Map[String, Q] = Map(
    "q298_udf_deploy" -> q298_udf_deploy,
    "q300_udaf_deploy" -> q300_udaf_deploy,
    "q301_udtf_deploy" -> q301_udtf_deploy,
    "q167_longtail_scalars" -> q167_longtail_scalars,
    "q168_complex_access" -> q168_complex_access,
    "q169_bitmap_index" -> q169_bitmap_index,
    "q212_reflect" -> q212_reflect,
    "q213_in_file" -> q213_in_file,
    "q264_reflect2" -> q264_reflect2,
  )

  val oracles: Map[String, String] = Map(
    "q300_udaf_deploy" ->
      """SELECT l_returnflag,
        |  SUM(l_quantity) / COUNT(l_quantity) AS avg_qty,
        |  MAX(l_linestatus) AS max_status,
        |  COUNT(1) AS n
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q301_udtf_deploy" ->
      """WITH w AS (SELECT p_partkey, string_split(p_name, ' ') AS ws
        |           FROM part WHERE p_partkey <= 250),
        |     e AS (SELECT p_partkey, ws,
        |                  unnest(generate_series(1, len(ws))) AS i FROM w)
        |SELECT p_partkey, CAST(i - 1 AS INT) AS pos, ws[i] AS token
        |FROM e ORDER BY p_partkey, pos""".stripMargin,
    "q298_udf_deploy" ->
      """SELECT p_partkey,
        |       CAST(p_size AS INTEGER) + 7 AS v_int_add,
        |       p_retailprice + 0.5 AS v_dbl_add,
        |       regexp_replace(p_name, '[0-9]', '#', 'g') AS v_redacted
        |FROM part
        |WHERE p_partkey <= 400
        |ORDER BY p_partkey""".stripMargin,
    "q264_reflect2" ->
      """SELECT p_partkey,
        |  CAST(length(p_brand) AS INT) AS v_len,
        |  lower(p_brand) AS v_lower,
        |  p_brand || '!' AS v_concat,
        |  CAST(strpos(p_brand, '#') - 1 AS INT) AS v_idx,
        |  substr(p_brand, 7) AS v_tail,
        |  replace(p_brand, '#', '-') AS v_repl,
        |  p_brand LIKE 'Brand%' AS v_starts,
        |  CAST(CASE WHEN p_size < 25 THEN -1 WHEN p_size = 25 THEN 0 ELSE 1 END AS INT) AS v_cmp,
        |  CAST(p_size AS DOUBLE) AS v_dbl
        |FROM part WHERE p_partkey <= 300
        |ORDER BY p_partkey""".stripMargin,
    "q212_reflect" ->
      """SELECT p_partkey,
        |  CAST(abs(p_size - 30) AS INT) AS v_abs,
        |  bin(p_size) AS v_bin,
        |  lower(to_hex(p_size)) AS v_hex,
        |  CAST(greatest(p_size, 25) AS INT) AS v_max,
        |  CAST(p_size AS VARCHAR) AS v_str
        |FROM part WHERE p_partkey <= 300
        |ORDER BY p_partkey""".stripMargin,
    "q213_in_file" ->
      """SELECT o_orderpriority, count(1) AS n
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM', '5-LOW')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q167_longtail_scalars" ->
      """SELECT o_orderkey,
        |  round(atan(o_totalprice), 9) AS v_atan,
        |  round(cbrt(o_totalprice), 9) AS v_cbrt,
        |  CAST(ceiling(o_totalprice) AS BIGINT) AS v_ceiling,
        |  round(degrees(o_totalprice / 10000.0), 9) AS v_degrees,
        |  round(radians(o_totalprice / 10000.0), 9) AS v_radians,
        |  round(log2(o_totalprice), 9) AS v_log2,
        |  round(power(o_totalprice, 0.5), 9) AS v_power,
        |  ltrim('  ' || o_orderpriority) AS v_ltrim,
        |  rtrim(o_orderpriority || '  ') AS v_rtrim,
        |  lcase(o_orderpriority) AS v_lcase,
        |  ucase(o_orderpriority) AS v_ucase,
        |  COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'URGENTISH') AS v_nvl,
        |  regexp_matches(o_orderpriority, '^[12]') AS v_rlike,
        |  CAST(o_orderdate AS DATE) - 30 AS v_date_sub,
        |  strftime(make_timestamp((o_orderkey % 100000 + 1500000000) * 1000000),
        |           '%Y-%m-%d %H:%M:%S') AS v_from_unixtime,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS v_to_unix,
        |  decode(from_base64(to_base64(encode(o_orderpriority)))) AS v_unbase64
        |FROM orders WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "q168_complex_access" ->
      """SELECT p_partkey,
        |  struct_extract({'sz': p_size, 'brand': p_brand}, 'brand') AS v_struct,
        |  array_to_string(map_keys(MAP {'sz': p_size, 'sz2': p_size * 2}), ',') AS keys_csv,
        |  array_to_string(list_transform(
        |    map_values(MAP {'sz': p_size, 'sz2': p_size * 2}),
        |    v -> CAST(v AS VARCHAR)), ',') AS vals_csv
        |FROM part WHERE p_partkey <= 200
        |ORDER BY p_partkey""".stripMargin,
    "q169_bitmap_index" ->
      """SELECT
        |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem WHERE l_returnflag = 'A') AS n_a,
        |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem WHERE l_returnflag = 'N') AS n_n,
        |  (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem WHERE l_returnflag = 'R') AS n_r,
        |  (SELECT COUNT(1) FROM (
        |     SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |     INTERSECT
        |     SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'N')) AS n_and_an,
        |  (SELECT COUNT(1) FROM (
        |     SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |     UNION
        |     SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')) AS n_or_ar,
        |  (SELECT COUNT(1) FROM (
        |     SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'A'
        |     INTERSECT
        |     SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'N')) = 0 AS and_empty
        |""".stripMargin,
  )
}
