package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Line-by-line audit of the reference's builtin function registry
  * (ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java:183-489
  * — the "≈250 builtins" of SURVEY §2.3).
  *
  * Every registered name is classified exactly once:
  *
  *  - `Scalar`/`Agg`/`Win`/`Gen`: resolvable in a graft session (Spark
  *    builtin or GraftExtensions-injected) — the smoke SQL is actually
  *    evaluated, so a Spark upgrade that drops or renames a function
  *    fails this suite, not a user.
  *  - `Api`: implemented as a graft API (no same-named SQL function);
  *    the pointer is either a driver-contract query key (asserted to
  *    exist in SparkEntry.queries) or a spec class in this package
  *    (asserted to load).
  *  - `Omit`: deliberately not implemented, with the justification.
  *
  * The literal-named subset is re-derived from the reference source at
  * test time (read-only) and reconciled against this classification, so
  * the audit cannot silently drift from the registry it claims to cover.
  * Constant-named registrations (casts via serdeConstants.*_TYPE_NAME,
  * lead/lag, unary +/-, PTF table functions, mask family — registry
  * lines 155-167, 271-272, 357-373, 456-457, 470-475, 484-489) are
  * enumerated in `constantNamed`.
  */
class RegistryAuditSpec extends AnyFunSuite {
  import TestSession._

  sealed trait Surface
  /** Spark/graft SQL function or expression syntax; smoke runs on a one-row relation. */
  case class Scalar(smoke: String) extends Surface
  /** Aggregate; smoke runs over VALUES (1.0),(2.0),(3.0) AS t(x). */
  case class Agg(smoke: String) extends Surface
  /** Window function; smoke carries its own OVER clause, same VALUES relation. */
  case class Win(smoke: String) extends Surface
  /** Generator (UDTF); smoke is a standalone SELECT. */
  case class Gen(smoke: String) extends Surface
  /** graft API implementation: pointer = SparkEntry.queries key or spec class name. */
  case class Api(pointer: String) extends Surface
  case class Omit(reason: String) extends Surface

  // ---- literal-named registrations (FunctionRegistry.java:183-453) ----
  val literal: Seq[(String, Surface)] = Seq(
    // operators & predicate syntax (:308-346)
    "!" -> Scalar("(!false)"),
    "!=" -> Scalar("1 != 2"),
    "%" -> Scalar("7 % 3"),
    "&" -> Scalar("5 & 3"),
    "*" -> Scalar("2 * 3"),
    "+" -> Scalar("1 + 2"),
    "-" -> Scalar("3 - 1"),
    "/" -> Scalar("7 / 2"), // int / int -> double, Hive semantics (CoercionSpec pin)
    "<" -> Scalar("1 < 2"),
    "<=" -> Scalar("1 <= 1"),
    "<=>" -> Scalar("null <=> null"),
    "<>" -> Scalar("1 <> 2"),
    "=" -> Scalar("1 = 1"),
    "==" -> Scalar("1 == 1"),
    ">" -> Scalar("2 > 1"),
    ">=" -> Scalar("2 >= 2"),
    "^" -> Scalar("5 ^ 2"),
    "|" -> Scalar("4 | 1"),
    "~" -> Scalar("~5"),
    "and" -> Scalar("true and true"),
    "or" -> Scalar("false or true"),
    "not" -> Scalar("not false"),
    "between" -> Scalar("2 between 1 and 3"),
    "case" -> Scalar("case when 1 = 1 then 'y' else 'n' end"),
    "when" -> Scalar("case when 1 = 2 then 'y' when 1 = 1 then 'z' end"),
    "in" -> Scalar("1 in (1, 2)"),
    "index" -> Scalar("array(1, 2)[0]"), // a[i] accessor
    "div" -> Scalar("7 div 2"),
    "like" -> Scalar("'ab' like 'a%'"),
    "rlike" -> Scalar("'ab' rlike 'a.'"),
    "regexp" -> Scalar("'ab' regexp 'a.'"),
    "$SUM0" -> Omit("internal zero-on-empty SUM backing windowed aggregation rewrites; " +
      "not user-invocable in the reference either (GenericUDAFSumEmptyIsZero)"),
    // string family (:183-269)
    "ascii" -> Scalar("ascii('a')"),
    "chr" -> Scalar("chr(65)"),
    "concat" -> Scalar("concat('a', 'b')"),
    "concat_ws" -> Scalar("concat_ws('-', 'a', 'b')"),
    "elt" -> Scalar("elt(1, 'a', 'b')"),
    "field" -> Api("q85_hive_compat"),
    "find_in_set" -> Scalar("find_in_set('b', 'a,b')"),
    "format_number" -> Scalar("format_number(1234.567, 1)"),
    "initcap" -> Scalar("initcap('ab cd')"),
    "instr" -> Scalar("instr('abc', 'b')"),
    "lcase" -> Scalar("lcase('A')"),
    "length" -> Scalar("length('abc')"),
    "levenshtein" -> Scalar("levenshtein('ab', 'ac')"),
    "locate" -> Scalar("locate('b', 'abc')"),
    "lower" -> Scalar("lower('A')"),
    "lpad" -> Scalar("lpad('a', 3, 'x')"),
    "ltrim" -> Scalar("ltrim('  a')"),
    "parse_url" -> Scalar("parse_url('http://h/p?q=1', 'HOST')"),
    "printf" -> Scalar("printf('%d-%s', 1, 'a')"),
    "regexp_extract" -> Scalar("regexp_extract('abc', '(b)', 1)"),
    "regexp_replace" -> Scalar("regexp_replace('abc', 'b', 'x')"),
    "repeat" -> Scalar("repeat('ab', 2)"),
    "replace" -> Scalar("replace('abc', 'b', 'x')"),
    "reverse" -> Scalar("reverse('ab')"),
    "rpad" -> Scalar("rpad('a', 3, 'x')"),
    "rtrim" -> Scalar("rtrim('a  ')"),
    "sentences" -> Scalar("sentences('Hi there. Bye now.')"),
    "soundex" -> Scalar("soundex('Tymczak')"),
    "space" -> Scalar("space(2)"),
    "split" -> Scalar("split('a,b,c', ',')"),
    "str_to_map" -> Scalar("str_to_map('a:1,b:2', ',', ':')"),
    "substr" -> Scalar("substr('abc', 2)"),
    "substring" -> Scalar("substring('abc', 2, 1)"),
    "substring_index" -> Scalar("substring_index('a.b.c', '.', 2)"),
    "translate" -> Scalar("translate('abc', 'bc', 'xy')"),
    "trim" -> Scalar("trim('  a  ')"),
    "ucase" -> Scalar("ucase('a')"),
    "upper" -> Scalar("upper('a')"),
    // math family (:197-241)
    "abs" -> Scalar("abs(-3)"),
    "acos" -> Scalar("acos(0.5)"),
    "asin" -> Scalar("asin(0.5)"),
    "atan" -> Scalar("atan(1)"),
    "bin" -> Scalar("bin(5)"),
    "bround" -> Scalar("bround(2.5)"),
    "cbrt" -> Scalar("cbrt(27.0)"),
    "ceil" -> Scalar("ceil(1.2)"),
    "ceiling" -> Scalar("ceiling(1.2)"),
    "conv" -> Scalar("conv('f', 16, 10)"),
    "cos" -> Scalar("cos(0)"),
    "degrees" -> Scalar("degrees(pi())"),
    "e" -> Scalar("e()"),
    "exp" -> Scalar("exp(1)"),
    "factorial" -> Scalar("factorial(5)"),
    "floor" -> Scalar("floor(1.8)"),
    "ln" -> Scalar("ln(exp(1))"),
    "log" -> Scalar("log(2, 8)"),
    "log10" -> Scalar("log10(100)"),
    "log2" -> Scalar("log2(8)"),
    "pi" -> Scalar("pi()"),
    "pmod" -> Scalar("pmod(-7, 3)"),
    "pow" -> Scalar("pow(2, 3)"),
    "power" -> Scalar("power(2, 3)"),
    "radians" -> Scalar("radians(180)"),
    "rand" -> Scalar("rand(42)"),
    "round" -> Scalar("round(2.345, 2)"),
    "sign" -> Scalar("sign(-2)"),
    "sin" -> Scalar("sin(0)"),
    "sqrt" -> Scalar("sqrt(4)"),
    "tan" -> Scalar("tan(0)"),
    "shiftleft" -> Scalar("shiftleft(1, 2)"),
    "shiftright" -> Scalar("shiftright(4, 1)"),
    "shiftrightunsigned" -> Scalar("shiftrightunsigned(4, 1)"),
    // binary / crypto / encodings (:242-265)
    "aes_encrypt" -> Scalar("aes_encrypt('t', '0123456789abcdef', 'ECB')"),
    "aes_decrypt" -> Scalar(
      "aes_decrypt(aes_encrypt('t', '0123456789abcdef', 'ECB'), '0123456789abcdef', 'ECB')"),
    "base64" -> Scalar("base64('ab')"),
    "crc32" -> Scalar("crc32('ab')"),
    "decode" -> Scalar("decode(encode('ab', 'utf-8'), 'utf-8')"),
    "encode" -> Scalar("encode('ab', 'utf-8')"),
    "hex" -> Scalar("hex(255)"),
    "md5" -> Scalar("md5('ab')"),
    "sha" -> Scalar("sha('ab')"),
    "sha1" -> Scalar("sha1('ab')"),
    "sha2" -> Scalar("sha2('ab', 256)"),
    "unbase64" -> Scalar("unbase64(base64('ab'))"),
    "unhex" -> Scalar("unhex(hex(255))"),
    // date/time (:274-294, 440-444)
    "add_months" -> Scalar("add_months(date'2020-01-31', 1)"),
    "current_date" -> Scalar("current_date()"),
    "current_timestamp" -> Scalar("current_timestamp()"),
    "date_add" -> Scalar("date_add(date'2020-01-01', 1)"),
    "date_format" -> Scalar("date_format(date'2020-01-01', 'yyyy')"),
    "date_sub" -> Scalar("date_sub(date'2020-01-02', 1)"),
    "datediff" -> Scalar("datediff(date'2020-01-02', date'2020-01-01')"),
    "day" -> Scalar("day(date'2020-01-02')"),
    "dayofmonth" -> Scalar("dayofmonth(date'2020-01-02')"),
    "from_unixtime" -> Scalar("from_unixtime(0)"),
    "from_utc_timestamp" -> Scalar("from_utc_timestamp(timestamp'2020-01-01 00:00:00', 'PST')"),
    "hour" -> Scalar("hour(timestamp'2020-01-01 01:02:03')"),
    "last_day" -> Scalar("last_day(date'2020-01-10')"),
    "minute" -> Scalar("minute(timestamp'2020-01-01 01:02:03')"),
    "month" -> Scalar("month(date'2020-05-01')"),
    "months_between" -> Scalar("months_between(date'2020-02-01', date'2020-01-01')"),
    "next_day" -> Scalar("next_day(date'2020-01-01', 'MO')"),
    "quarter" -> Scalar("quarter(date'2020-05-01')"),
    "second" -> Scalar("second(timestamp'2020-01-01 01:02:03')"),
    "to_date" -> Scalar("to_date('2020-01-02')"),
    "to_unix_timestamp" -> Scalar("to_unix_timestamp(timestamp'2020-01-01 00:00:00')"),
    "to_utc_timestamp" -> Scalar("to_utc_timestamp(timestamp'2020-01-01 00:00:00', 'PST')"),
    "trunc" -> Scalar("trunc(date'2020-05-05', 'MM')"),
    "unix_timestamp" -> Scalar("unix_timestamp(timestamp'2020-01-01 00:00:00')"),
    "weekofyear" -> Scalar("weekofyear(date'2020-01-01')"),
    "year" -> Scalar("year(date'2020-01-01')"),
    // conditional / null (:266, 328-346)
    "assert_true" -> Scalar("assert_true(1 < 2)"),
    "coalesce" -> Scalar("coalesce(null, 1)"),
    "greatest" -> Scalar("greatest(1, 2, 3)"),
    "if" -> Scalar("if(true, 'a', 'b')"),
    "isnotnull" -> Scalar("isnotnull(1)"),
    "isnull" -> Scalar("isnull(null)"),
    "least" -> Scalar("least(1, 2)"),
    "nvl" -> Scalar("nvl(null, 'x')"),
    // complex types (:413-434)
    "array" -> Scalar("array(1, 2)"),
    "array_contains" -> Scalar("array_contains(array(1, 2), 1)"),
    "map" -> Scalar("map('a', 1)"),
    "map_keys" -> Scalar("map_keys(map('a', 1))"),
    "map_values" -> Scalar("map_values(map('a', 1))"),
    "named_struct" -> Scalar("named_struct('f', 1)"),
    "size" -> Scalar("size(array(1, 2))"),
    "sort_array" -> Scalar("sort_array(array(3, 1))"),
    "struct" -> Scalar("struct(1, 'a')"),
    "create_union" -> Api("q85_hive_compat"),
    // JSON / XML (:296-306)
    "get_json_object" -> Scalar("get_json_object('{\"a\":1}', '$.a')"),
    "xpath" -> Scalar("xpath('<a><b>1</b><b>2</b></a>', 'a/b/text()')"),
    "xpath_boolean" -> Scalar("xpath_boolean('<a>1</a>', 'a = 1')"),
    "xpath_double" -> Scalar("xpath_double('<a>1.5</a>', 'a')"),
    "xpath_float" -> Scalar("xpath_float('<a>1.5</a>', 'a')"),
    "xpath_int" -> Scalar("xpath_int('<a>2</a>', 'a')"),
    "xpath_long" -> Scalar("xpath_long('<a>2</a>', 'a')"),
    "xpath_number" -> Scalar("xpath_number('<a>1.5</a>', 'a')"),
    "xpath_short" -> Scalar("xpath_short('<a>2</a>', 'a')"),
    "xpath_string" -> Scalar("xpath_string('<a><b>x</b></a>', 'a/b')"),
    // misc (:323-353, 409-422)
    "current_database" -> Scalar("current_database()"),
    "current_user" -> Scalar("current_user()"),
    "version" -> Scalar("version()"),
    "java_method" -> Scalar("java_method('java.lang.Math', 'max', 1, 2)"),
    "reflect" -> Scalar("reflect('java.lang.Math', 'abs', -3)"),
    "reflect2" -> Scalar("reflect2('ab', 'concat', 'c')"), // functions/Reflect2.scala, q264
    "hash" -> Scalar("hash('a', 1)"), // Murmur3; Hive-exact algorithm = hive_hash (HiveCompatSpec)
    "in_file" -> Api("LongTailSpec"),
    "ewah_bitmap" -> Api("q169_bitmap_index"),
    "ewah_bitmap_and" -> Api("q169_bitmap_index"),
    "ewah_bitmap_or" -> Api("q169_bitmap_index"),
    "ewah_bitmap_empty" -> Api("q169_bitmap_index"),
    // aggregates (:347-356, 390-411)
    "avg" -> Agg("avg(x)"),
    "count" -> Agg("count(x)"),
    "max" -> Agg("max(x)"),
    "min" -> Agg("min(x)"),
    "sum" -> Agg("sum(x)"),
    "corr" -> Agg("corr(x, x)"),
    "covar_pop" -> Agg("covar_pop(x, x)"),
    "covar_samp" -> Agg("covar_samp(x, x)"),
    "std" -> Agg("std(x)"),
    "stddev" -> Agg("stddev(x)"),
    "stddev_pop" -> Agg("stddev_pop(x)"),
    "stddev_samp" -> Agg("stddev_samp(x)"),
    "var_pop" -> Agg("var_pop(x)"),
    "var_samp" -> Agg("var_samp(x)"),
    "variance" -> Agg("variance(x)"),
    "percentile" -> Agg("percentile(x, 0.5)"),
    "percentile_approx" -> Agg("percentile_approx(x, 0.5)"), // Hive algorithm: hive_percentile_approx (HistogramSpec)
    "histogram_numeric" -> Agg("histogram_numeric(x, 2)"), // Hive algorithm: hive_histogram_numeric (HistogramSpec)
    "collect_list" -> Agg("collect_list(x)"),
    "collect_set" -> Agg("collect_set(x)"),
    "ngrams" -> Api("q83_ngrams_topk"),
    "context_ngrams" -> Api("q84_context_ngrams"),
    "compute_stats" -> Api("CatalogSpec"), // surfaced as ANALYZE TABLE ... COMPUTE STATISTICS
    // windowing (:459-466)
    "row_number" -> Win("row_number() over (order by x)"),
    "rank" -> Win("rank() over (order by x)"),
    "dense_rank" -> Win("dense_rank() over (order by x)"),
    "percent_rank" -> Win("percent_rank() over (order by x)"),
    "cume_dist" -> Win("cume_dist() over (order by x)"),
    "ntile" -> Win("ntile(2) over (order by x)"),
    "first_value" -> Win("first_value(x) over (order by x)"),
    "last_value" -> Win("last_value(x) over (order by x)"),
    // UDTFs (:436-453)
    "explode" -> Gen("select explode(array(1, 2))"),
    "posexplode" -> Gen("select posexplode(array('a'))"),
    "inline" -> Gen("select inline(array(named_struct('a', 1)))"),
    "stack" -> Gen("select stack(2, 1, 2)"),
    "json_tuple" -> Gen("select json_tuple('{\"a\":1}', 'a')"),
    "parse_url_tuple" -> Api("q106_parse_url_tuple"),
    "get_splits" -> Omit("LLAP/HS2 split-generation UDTF (GenericUDTFGetSplits) — " +
      "server-side scan planning, which Spark's DataSource planning subsumes"),
  )

  // ---- constant-named registrations ----
  val constantNamed: Seq[(String, Surface)] = Seq(
    // unary ops (:271-272)
    "positive" -> Scalar("positive(3)"),
    "negative" -> Scalar("negative(3)"),
    // cast functions, one per serdeConstants type name (:357-373);
    // CoercionSpec pins the Hive-divergent coercion behaviors
    "boolean" -> Scalar("cast('true' as boolean)"),
    "tinyint" -> Scalar("cast(1 as tinyint)"),
    "smallint" -> Scalar("cast(1 as smallint)"),
    "int" -> Scalar("cast('1' as int)"),
    "bigint" -> Scalar("cast(1 as bigint)"),
    "float" -> Scalar("cast(1.5 as float)"),
    "double" -> Scalar("cast('1.5' as double)"),
    "string" -> Scalar("cast(1 as string)"),
    "date" -> Scalar("cast('2020-01-01' as date)"),
    "timestamp" -> Scalar("cast('2020-01-01 00:00:00' as timestamp)"),
    "interval_year_month" -> Scalar("cast('1-2' as interval year to month)"),
    "interval_day_time" -> Scalar("cast('1 02:03:04' as interval day to second)"),
    "binary" -> Scalar("cast('a' as binary)"),
    "decimal" -> Scalar("cast('1.50' as decimal(5, 2))"),
    "varchar" -> Scalar("cast('abc' as varchar(2))"),
    "char" -> Scalar("cast('a' as char(3))"),
    // lead/lag (:456-457, :467-468)
    "lead" -> Win("lead(x, 1) over (order by x)"),
    "lag" -> Win("lag(x, 1) over (order by x)"),
    // PTF table functions (:470-475)
    "noop" -> Omit("identity PTF used to exercise the reference's PTF framework in its " +
      "own tests; no user-facing surface"),
    "noopwithmap" -> Omit("identity PTF with map-side variant; test-only, as noop"),
    "noopstreaming" -> Omit("streaming identity PTF; test-only, as noop"),
    "noopwithmapstreaming" -> Omit("streaming identity PTF with map-side variant; test-only"),
    "windowingtablefunction" -> Api("q20_window_rank"), // the OVER-clause executor itself
    "matchpath" -> Api("q98_matchpath"),
    // mask family (:484-489; GenericUDFMask*.UDF_NAME)
    "mask" -> Scalar("mask('AbCd-123')"),
    "mask_first_n" -> Api("MiscFunctionsSpec"),
    "mask_last_n" -> Api("MiscFunctionsSpec"),
    "mask_show_first_n" -> Api("MiscFunctionsSpec"),
    "mask_show_last_n" -> Api("MiscFunctionsSpec"),
    "mask_hash" -> Api("MiscFunctionsSpec"),
  )

  val registry: Seq[(String, Surface)] = literal ++ constantNamed

  private val refFile =
    "/root/reference/ql/src/java/org/apache/hadoop/hive/ql/exec/FunctionRegistry.java"

  test("classification is total, unique, and reconciles with the reference registry") {
    val names = registry.map(_._1)
    assert(names.distinct.size == names.size, {
      val dups = names.groupBy(identity).filter(_._2.size > 1).keys
      s"duplicate classifications: ${dups.mkString(", ")}"
    })
    // ≈250 builtins (SURVEY §2.3): 221 literal + 32 constant-named
    assert(literal.size == 221, s"literal classification count drifted: ${literal.size}")
    assert(constantNamed.size == 32, s"constant-named count drifted: ${constantNamed.size}")

    val p = Paths.get(refFile)
    // a machine without the reference checkout must report CANCELED, not
    // quietly pass — a silent green here would void the no-drift contract
    assume(Files.isReadable(p), s"reference registry not readable at $refFile")
    val src = new String(Files.readAllBytes(p), "UTF-8")
    val re = """register(?:GenericUDF|GenericUDAF|GenericUDTF|UDF|UDAF|Function)\("([^"]+)"""".r
    val extracted = re.findAllMatchIn(src).map(_.group(1)).toSet
    val classified = literal.map(_._1).toSet
    assert(extracted == classified,
      s"registry drift — unclassified: ${(extracted -- classified).toSeq.sorted.mkString(", ")}; " +
        s"stale: ${(classified -- extracted).toSeq.sorted.mkString(", ")}")
  }

  test("every scalar surface evaluates in a graft session") {
    val scalars = registry.collect { case (n, Scalar(s)) => (n, s) }
    scalars.grouped(16).foreach { batch =>
      val select = batch.zipWithIndex
        .map { case ((_, smoke), i) => s"($smoke) AS c$i" }.mkString(", ")
      val rows =
        try spark.sql(s"SELECT $select").collect()
        catch {
          case e: Exception =>
            fail(s"scalar batch [${batch.map(_._1).mkString(", ")}] failed: ${e.getMessage}")
        }
      assert(rows.length == 1)
    }
  }

  test("every aggregate surface evaluates over a grouped relation") {
    val aggs = registry.collect { case (n, Agg(s)) => (n, s) }
    val select = aggs.zipWithIndex.map { case ((_, s), i) => s"($s) AS a$i" }.mkString(", ")
    val rows = spark.sql(s"SELECT $select FROM VALUES (1.0), (2.0), (3.0) AS t(x)").collect()
    assert(rows.length == 1)
  }

  test("every window surface evaluates with its frame") {
    val wins = registry.collect { case (n, Win(s)) => (n, s) }
    val select = wins.zipWithIndex.map { case ((_, s), i) => s"($s) AS w$i" }.mkString(", ")
    val rows = spark.sql(s"SELECT $select FROM VALUES (1.0), (2.0), (3.0) AS t(x)").collect()
    assert(rows.length == 3)
  }

  test("every generator surface produces rows") {
    registry.collect { case (n, Gen(s)) => (n, s) }.foreach { case (name, smoke) =>
      assert(spark.sql(smoke).count() > 0, s"generator $name returned no rows")
    }
  }

  test("every Api pointer resolves to a declared query or a spec in this build") {
    registry.collect { case (n, Api(p)) => (n, p) }.foreach { case (name, pointer) =>
      if (pointer.startsWith("q")) {
        assert(SparkEntry.queries.contains(pointer),
          s"$name points at missing query $pointer")
      } else {
        // spec classes live in this package on the test classpath
        Class.forName(s"graft.$pointer")
      }
    }
  }

  test("the omit set is small, closed, and justified") {
    val omitted = registry.collect { case (n, Omit(r)) => (n, r) }
    val expected = Set("$SUM0", "get_splits",
      "noop", "noopwithmap", "noopstreaming", "noopwithmapstreaming")
    assert(omitted.map(_._1).toSet == expected,
      s"omit set drifted: ${omitted.map(_._1).sorted.mkString(", ")}")
    omitted.foreach { case (n, reason) => assert(reason.length > 20, s"$n lacks justification") }
  }
}
