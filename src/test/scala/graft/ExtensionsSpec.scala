package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions entry point must resolve the engine's
  * custom expressions at session build (spark.sql.extensions set by
  * Session.configure) — no imperative register call first. */
class ExtensionsSpec extends AnyFunSuite {
  import TestSession._

  test("engine functions resolve via spark.sql.extensions") {
    assert(spark.conf.get("spark.sql.extensions").contains("graft.GraftExtensions"))
    val r = spark.sql(
      """SELECT poly_hash('abc') AS ph,
        |  min_gram_hash('abcdefgh', 4) AS mg,
        |  hive_percentile_approx(v, 0.5, 10) AS p50
        |FROM VALUES (1.0), (2.0), (3.0) AS t(v)""".stripMargin).collect()(0)
    // poly_hash('abc') = ((('a'*31)+'b')*31)+'c' over bytes
    val expected = "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xff))
    assert(r.getLong(0) == expected)
    assert(!r.isNullAt(1))
    // bins (1,1),(2,1),(3,1): csum/sum crosses 0.5 in bin 1 ->
    // 1 + (0.5*3 - 1) * (2-1)/1 = 1.5 (the histogram's interpolation)
    assert(r.getDouble(2) == 1.5)
  }
}
