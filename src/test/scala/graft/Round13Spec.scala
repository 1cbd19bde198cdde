package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Pins for the round-13 semantics, derived BY HAND from the reference
  * sources (not from replaying the corpus):
  *
  *  - the date/time string-parse shims now evaluate per ROW
  *    (plans.HiveLenientDate / HiveStrictTimestamp), so non-literal
  *    string columns parse like GenericUDF.getDateValue — the round-12
  *    gap was literal-only folding.
  *  - UNION branch widening follows getCommonClassForUnionAll
  *    (FunctionRegistry.java:680), which tests implicitConvertible(a,b)
  *    BEFORE (b,a): string-then-double widens to DOUBLE, double-then-
  *    string stays STRING.
  *  - MatchPath's Symbol/Plus/Chain iterator arithmetic
  *    (udf/ptf/MatchPath.java:446-603), including the documented quirk
  *    that a `+` run exiting at the partition end does NOT consume its
  *    final matched row (Plus.match: nextRow = idx - 1).
  *  - GenericUDTFParseUrlTuple's part semantics (case-sensitive names,
  *    java.net.URL parse, MalformedURLException → all-NULL row).
  */
class Round13Spec extends AnyFunSuite {
  import TestSession._

  private lazy val compat = {
    val s = spark.newSession()
    s.conf.set("graft.compat.hive.coercion", "true")
    s
  }

  test("date/time shims parse string COLUMNS per row, not just literals") {
    import compat.implicits._
    Seq((0, "2014-01-34"), (1, "2014-02-11"), (2, "01/14/2014"),
        (3, "2016-02-29 10:30:00"), (4, "2014-01-31"))
      .toDF("i", "d").createOrReplaceTempView("r13_dates")
    // hour(date-only string) is NULL there (UDFHour's two SDF patterns)
    val hours = compat.sql(
      "select i, hour(d) from r13_dates order by i").collect()
      .map(r => if (r.isNullAt(1)) -1 else r.getInt(1)).toSeq
    assert(hours == Seq(-1, -1, -1, 10, -1))
    // add_months over a COLUMN: '2014-01-34' ROLLS to 2014-02-03
    // (lenient SDF), +1 month = 2014-03-03; a non-matching prefix is
    // NULL; end-of-month snaps (2014-01-31 + 1 = 2014-02-28)
    val am = compat.sql(
      "select i, cast(add_months(d, 1) as string) from r13_dates order by i")
      .collect().map(_.getString(1)).toSeq
    assert(am == Seq("2014-03-03", "2014-03-11", null, "2016-03-31", "2014-02-28"))
    // last_day over the rolled column value
    val ld = compat.sql(
      "select i, cast(last_day(d) as string) from r13_dates order by i")
      .collect().map(_.getString(1)).toSeq
    assert(ld(0) == "2014-02-28" && ld(2) == null)
    // months_between: strict-timestamp first, lenient date fallback
    val mb = compat.sql(
      "select i, months_between(d, '2014-01-03') from r13_dates order by i")
      .collect().map(r => if (r.isNullAt(1)) Double.NaN else r.getDouble(1))
    assert(mb(0) == 1.0) // 2014-02-03 vs 2014-01-03
  }

  test("UNION widening is order-sensitive like getCommonClassForUnionAll") {
    // string-first, double-second -> DOUBLE (implicitConvertible(string,
    // double) tested first)
    val d1 = compat.sql(
      "select * from (select '1.5' v union all select cast(2.5 as double)) t")
    assert(d1.schema.head.dataType == DoubleType)
    assert(d1.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.5, 2.5))
    // double-first, string-second -> STRING (number->string group
    // conversion wins) — Spark's own pick, no rewrite
    val d2 = compat.sql(
      "select * from (select cast(2.5 as double) v union all select '1.5') t")
    assert(d2.schema.head.dataType == StringType)
    // engine sessions (no compat conf) keep Spark's string in BOTH
    val e1 = spark.sql(
      "select * from (select '1.5' v union all select cast(2.5 as double)) t")
    assert(e1.schema.head.dataType == StringType)
  }

  test("matchpath matcher: reference Plus/Chain arithmetic") {
    import spark.implicits._
    // LATE.LATE+ over delays (T,T,T,F,T): overlapping matches at rows
    // 1 (sz 3) and 2 (sz 2); the F row ends the greedy run
    val df = Seq((1, 1, 23.0), (1, 2, 105.0), (1, 3, 54.0),
                 (1, 4, -14.0), (1, 5, 21.0)).toDF("k", "seq", "delay")
    val out = operators.MatchPathSql.matchPath(spark, df,
      Seq("k"), Seq("seq"), "LATE.LATE+", Seq("late" -> "delay > 15"),
      Seq("seq as start_seq", "size(tpath) as sz"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(out == Seq((1, 3), (2, 2)))
    // end-of-partition quirk: over (T,T,T) the `+` exits on !hasNext
    // with nextRow = idx-1, so the LAST matched row is not consumed —
    // matches are (row1, sz2) and (row2, sz1), never sz3
    // (MatchPath.java Plus.match:536 vs Star.match:500)
    val df2 = Seq((1, 1, 99.0), (1, 2, 99.0), (1, 3, 99.0))
      .toDF("k", "seq", "delay")
    val out2 = operators.MatchPathSql.matchPath(spark, df2,
      Seq("k"), Seq("seq"), "LATE.LATE+", Seq("late" -> "delay > 15"),
      Seq("seq as start_seq", "size(tpath) as sz"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(out2 == Seq((1, 2), (2, 1)))
  }

  test("matchpath SQL invocation form end to end") {
    import spark.implicits._
    Seq((1, 1, "view"), (1, 2, "view"), (1, 3, "purchase"), (1, 4, "view"),
        (2, 5, "purchase"), (2, 6, "view"), (2, 7, "purchase"))
      .toDF("uid", "seq", "et").createOrReplaceTempView("r13_mp")
    val sql =
      """select uid, v, p from matchpath(on r13_mp
        |    distribute by uid sort by seq
        |  arg1('V.P'), arg2('V'), arg3(et = 'view'),
        |  arg4('P'), arg5(et = 'purchase'),
        |  arg6('uid, seq as v, tpath[1].seq as p'))
        |order by uid, v""".stripMargin
    val got = spark.sql(operators.MatchPathSql.rewrite(spark, sql))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSeq
    assert(got == Seq((1, 2, 3), (2, 6, 7)))
  }

  test("parse_url_tuple generator: reference part semantics") {
    val r = spark.sql(
      """SELECT b.* FROM (SELECT
        |  'http://u:pw@facebook.com/path1/p.php?k1=v1&k2=v2#Ref1' AS u) t
        |LATERAL VIEW parse_url_tuple(u, 'HOST', 'PATH', 'QUERY', 'REF',
        |  'PROTOCOL', 'FILE', 'AUTHORITY', 'USERINFO', 'QUERY:k1',
        |  'host', 'QUERY:nope') b
        |AS ho, pa, qu, re, pr, fi, au, us, qk1, badcase, nokey""".stripMargin)
      .collect().head
    assert(r.getString(0) == "facebook.com")
    assert(r.getString(1) == "/path1/p.php")
    assert(r.getString(2) == "k1=v1&k2=v2")
    assert(r.getString(3) == "Ref1")
    assert(r.getString(4) == "http")
    assert(r.getString(5) == "/path1/p.php?k1=v1&k2=v2")
    assert(r.getString(6) == "u:pw@facebook.com")
    assert(r.getString(7) == "u:pw")
    assert(r.getString(8) == "v1")
    assert(r.isNullAt(9), "part names are case-sensitive: 'host' is NULL")
    assert(r.isNullAt(10), "absent query key is NULL")
    // a url java.net.URL rejects yields ONE all-NULL row, same as NULL
    val bad = spark.sql(
      """SELECT b.* FROM (SELECT 'htttp://' AS u) t
        |LATERAL VIEW parse_url_tuple(u, 'HOST', 'PROTOCOL') b AS ho, pr""".stripMargin)
      .collect()
    assert(bad.length == 1 && bad.head.isNullAt(0) && bad.head.isNullAt(1))
  }
}
