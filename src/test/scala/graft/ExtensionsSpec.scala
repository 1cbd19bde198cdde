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

  test("first-token rewrite fires for literal delimiters only") {
    Tables.registerAll(spark, sf)
    val rewritten = spark.sql(
      "SELECT element_at(split(p_name, ' '), 1) AS t FROM part")
    val opt = rewritten.queryExecution.optimizedPlan.toString
    assert(opt.contains("substring_index") && !opt.contains("split("),
      "literal-delimiter first-token must rewrite to substring_index:\n" + opt)
    // results identical to the unrewritten semantics
    val viaRule = rewritten.collect().map(_.getString(0))
    val direct = spark.sql("SELECT substring_index(p_name, ' ', 1) AS t FROM part")
      .collect().map(_.getString(0))
    assert(viaRule.sameElements(direct))
    // regex delimiters must NOT rewrite (split semantics differ)
    val regexForm = spark.sql(
      "SELECT element_at(split(p_name, ' +'), 1) AS t FROM part")
      .queryExecution.optimizedPlan.toString
    assert(regexForm.contains("split("), regexForm)
    // nor deeper indexes
    val second = spark.sql(
      "SELECT element_at(split(p_name, ' '), 2) AS t FROM part")
      .queryExecution.optimizedPlan.toString
    assert(second.contains("split("), second)
  }
}
