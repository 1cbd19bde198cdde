package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the Hive-compat-only function family (q79) and approximate
  * aggregates (q80) that have no DuckDB oracle. */
class MiscFunctionsSpec extends AnyFunSuite {
  import TestSession._

  test("hive-compat functions produce the documented values") {
    val r = spark.sql(
      """SELECT mask('Customer#7') AS m,
        |  concat(substr('Customer#7', 1, 4), mask(substr('Customer#7', 5))) AS m4,
        |  initcap('building works') AS ic,
        |  soundex('Customer') AS sx,
        |  format_number(1234567.891, 1) AS fm,
        |  elt(2, 'alpha', 'beta', 'gamma') AS e,
        |  find_in_set('MACHINERY', 'BUILDING,AUTOMOBILE,MACHINERY') AS f,
        |  parse_url('http://example.com/a/b?id=42', 'PATH') AS pp,
        |  parse_url('http://example.com/a/b?id=42', 'QUERY', 'id') AS pq,
        |  str_to_map('k1:1,k2:2', ',', ':')['k2'] AS sm
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "Xxxxxxxx#n")          // mask: upper->X lower->x digit->n, other kept
    assert(r.getString(1) == "Custxxxx#n")
    assert(r.getString(2) == "Building Works")
    assert(r.getString(3) == "C235")
    assert(r.getString(4) == "1,234,567.9")
    assert(r.getString(5) == "beta")
    assert(r.getInt(6) == 3)
    assert(r.getString(7) == "/a/b")
    assert(r.getString(8) == "42")
    assert(r.getString(9) == "2")
  }

  test("mask_* variants follow the Hive masking contract") {
    import spark.implicits._
    import graft.functions.MiscFunctions._
    val df = Seq("Customer#7").toDF("s")
    val r = df.select(
      mask_first_n(col("s"), 4).as("f4"),
      mask_last_n(col("s"), 3).as("l3"),
      mask_show_first_n(col("s"), 4).as("sf4"),
      mask_show_last_n(col("s"), 2).as("sl2"),
      mask_hash(col("s")).as("h"),
      mask_first_n(col("s"), 99).as("f_over")).collect()(0)
    assert(r.getString(0) == "Xxxxomer#7")
    assert(r.getString(1) == "Customex#n")
    assert(r.getString(2) == "Custxxxx#n")
    assert(r.getString(3) == "Xxxxxxxx#7")
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("Customer#7".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(r.getString(4) == md)
    assert(r.getString(5) == "Xxxxxxxx#n", "n beyond length masks the whole string")
  }

  test("long-tail builtins with no DuckDB twin produce the documented values") {
    val r = spark.sql(
      """SELECT bround(2.5) AS b1, bround(3.5) AS b2,
        |  factorial(5) AS fact,
        |  sha1('abc') AS s1,
        |  CAST(unhex('4D') AS STRING) AS uh,
        |  CAST(decode(encode('héllo', 'UTF-8'), 'UTF-8') AS STRING) AS ed,
        |  months_between('1997-02-28 10:30:00', '1996-10-30') AS mb,
        |  CAST(from_utc_timestamp(TIMESTAMP '2024-01-15 12:00:00',
        |       'America/Los_Angeles') AS STRING) AS winter,
        |  CAST(from_utc_timestamp(TIMESTAMP '2024-07-15 12:00:00',
        |       'America/Los_Angeles') AS STRING) AS summer,
        |  CAST(to_utc_timestamp(TIMESTAMP '2024-01-15 04:00:00',
        |       'America/Los_Angeles') AS STRING) AS back,
        |  current_database() AS db,
        |  version() AS ver,
        |  assert_true(1 = 1) AS ok""".stripMargin).collect()(0)
    assert(r.getDecimal(0).doubleValue() == 2.0, "bankers rounding 2.5 -> 2")
    assert(r.getDecimal(1).doubleValue() == 4.0, "bankers rounding 3.5 -> 4")
    assert(r.getLong(2) == 120L)
    assert(r.getString(3) == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(r.getString(4) == "M")
    assert(r.getString(5) == "héllo")
    assert(math.abs(r.getDouble(6) - 3.94959677) < 1e-6, s"months_between ${r.getDouble(6)}")
    assert(r.getString(7) == "2024-01-15 04:00:00", "PST is UTC-8")
    assert(r.getString(8) == "2024-07-15 05:00:00", "PDT is UTC-7")
    assert(r.getString(9) == "2024-01-15 12:00:00")
    assert(r.getString(10) == "default")
    assert(r.getString(11).startsWith("4.1"))
    assert(r.isNullAt(12), "assert_true(true) yields NULL")
    val e = intercept[Throwable] {
      spark.sql("SELECT assert_true(1 = 2)").collect()
    }
    assert(e.getMessage != null)
  }

  test("aes_encrypt/aes_decrypt round-trip (deterministic ECB mode)") {
    val r = spark.sql(
      """SELECT CAST(aes_decrypt(aes_encrypt('secret payload', '0123456789abcdef',
        |  'ECB'), '0123456789abcdef', 'ECB') AS STRING) AS rt,
        |  base64(aes_encrypt('secret payload', '0123456789abcdef', 'ECB')) AS ct
        |""".stripMargin).collect()(0)
    assert(r.getString(0) == "secret payload")
    // ECB with a fixed key is deterministic — same ciphertext every run
    val again = spark.sql(
      "SELECT base64(aes_encrypt('secret payload', '0123456789abcdef', 'ECB'))")
      .collect()(0).getString(0)
    assert(r.getString(1) == again)
  }

  test("xpath family extracts from XML (Hive xpath_* surface)") {
    val r = spark.sql(
      """SELECT xpath_string('<a><b>hello</b><c>7</c></a>', 'a/b') AS s,
        |  xpath_int('<a><c>7</c></a>', 'a/c') AS i,
        |  xpath_boolean('<a><b>1</b></a>', 'a/b = 1') AS bo,
        |  xpath('<a><b>x</b><b>y</b></a>', 'a/b/text()') AS arr""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "hello")
    assert(r.getInt(1) == 7)
    assert(r.getBoolean(2))
    assert(r.getSeq[String](3) == Seq("x", "y"))
  }

  test("q79 runs over the corpus deterministically") {
    val a = SparkEntry.queries("q79_hive_compat")(spark, sf).collect()
    val b = SparkEntry.queries("q79_hive_compat")(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    assert(a.nonEmpty)
  }

  test("approximate aggregates are within tolerance of exact") {
    val approx = SparkEntry.queries("q80_approx_aggs")(spark, sf)
      .select("l_returnflag", "ndv_part", "p50_approx").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("ndv"),
           expr("percentile(l_extendedprice, 0.5)").as("p50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (k, (ndv, p50)) =>
      val (andv, ap50) = approx(k)
      assert(math.abs(andv - ndv).toDouble / ndv < 0.1, s"$k ndv $andv vs $ndv")
      assert(math.abs(ap50 - p50) / p50 < 0.1, s"$k p50 $ap50 vs $p50")
    }
  }

  test("TABLESAMPLE fraction sampling is in the right ballpark") {
    val n = Tables.lineitem(spark, sf).count()
    val sampled = Tables.lineitem(spark, sf).sample(0.1, seed = 42).count()
    assert(sampled > n / 20 && sampled < n / 5, s"$sampled of $n")
  }
}
