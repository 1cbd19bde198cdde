package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reference-exact mask family (functions/HiveMask — GenericUDFMask*.java).
  * Every pinned value below is a committed expected output of the
  * reference's own udf_mask*.q tests (ql/src/test/results/clientpositive/
  * udf_mask*.q.out), including the byte/short overflow wraps the
  * reference's width-local digit accumulation produces. The corpus-level
  * replay (ClientPositiveReplaySpec) exercises the same values through
  * SQL; this spec pins them directly so a registry change can't silently
  * drop the coverage with the files excluded for char-padding reasons. */
class HiveMaskSpec extends AnyFunSuite {
  import TestSession._

  private lazy val s = {
    val ns = spark.newSession()
    graft.functions.MiscFunctions.registerMaskUdfs(ns, includePlainMask = true)
    ns
  }

  private def one(sql: String): Seq[Any] = {
    val r = s.sql(sql).collect()(0)
    (0 until r.length).map(r.get)
  }

  test("mask: string classes via Character.getType; numbers wrap in their own width") {
    assert(one("select mask('TestString-123', 'X', 'x', '0', ':')") == Seq("XxxxXxxxxx:000"))
    // (byte) 555 = 43 and (short) 55555 = -9981 — the reference's
    // committed overflow behavior, not an accident here
    assert(one("select mask(cast(123 as tinyint), -1, -1, -1, -1, '5')") == Seq(43.toByte))
    assert(one("select mask(cast(12345 as smallint), -1, -1, -1, -1, '5')") == Seq((-9981).toShort))
    assert(one("select mask(cast(12345 as int), -1, -1, -1, -1, '5')") == Seq(55555))
    assert(one("select mask(cast(12345 as bigint), -1, -1, -1, -1, '5')") == Seq(55555L))
  }

  test("mask: date fields replace day/month/year (1900-based year, 0-based month)") {
    def d(sql: String) = one(sql).head.toString
    assert(d("select mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 0, 0, 0)") == "1900-01-01")
    assert(d("select mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, 0, 0)") == "1900-01-20")
    assert(d("select mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 1, -1, 0)") == "1900-04-01")
    assert(d("select mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, 1, 0, -1)") == "2016-01-01")
    assert(d("select mask(cast('2016-04-20' as date), -1,-1,-1,-1,-1, -1, -1, -1)") == "2016-04-20")
  }

  test("mask_first_n / mask_last_n / show variants: string and numeric lanes") {
    assert(one("select mask_first_n('TestString-123', 4, 'X', 'x', '0', ':')") == Seq("XxxxString-123"))
    assert(one("select mask_last_n('TestString-123', 4, 'X', 'x', '0', ':')") == Seq("TestString:000"))
    assert(one("select mask_show_first_n('TestString-123', 4, 'X', 'x', '0', ':')") == Seq("TestXxxxxx:000"))
    assert(one("select mask_show_last_n('TestString-123', 4, 'X', 'x', '0', ':')") == Seq("XxxxXxxxxx-123"))
    // numeric lanes (reference expected values, incl. the short wrap)
    assert(one("select mask_last_n(cast(12345 as int), 4, -1, -1, -1, -1, '5')") == Seq(15555))
    assert(one("select mask_show_first_n(cast(12345 as int), 4, -1, -1, -1, -1, '9')") == Seq(12349))
    assert(one("select mask_show_last_n(cast(12345 as smallint), 4, -1, -1, -1, -1, '5')") == Seq((-13191).toShort))
    // dates reach the inherited base transform: defaults 1/0/0 -> 1900-01-01
    assert(one("select mask_first_n(cast('2016-04-20' as date), 4)").head.toString == "1900-01-01")
  }

  test("mask_hash: md5 hex for strings, NULL otherwise") {
    assert(one("select mask_hash('TestString-123')") == Seq("dd78d68ad1b23bde126812482dd70ac6"))
    assert(one("select mask_hash(cast(123 as int))") == Seq(null))
  }

  test("mask: unsupported value types fail analysis, not silently NULL") {
    // the reference's BaseMaskUDF rejects these at initialize time
    for (bad <- Seq("cast(1.5 as double)", "true", "cast(1 as decimal(5,2))")) {
      val e = intercept[Exception](s.sql(s"select mask($bad)").collect())
      assert(e.getMessage.contains("mask family does not support"), s"for $bad: ${e.getMessage}")
    }
    // supported lanes still analyze
    assert(s.sql("select mask(cast(null as string))").collect()(0).isNullAt(0))
  }

  test("default registration leaves Spark's builtin mask in place") {
    val plain = spark.newSession()
    graft.functions.MiscFunctions.registerMaskUdfs(plain) // no includePlainMask
    // Spark's builtin takes at most 5 args; Hive's 6-arg form must be
    // rejected — proof the builtin was not shadowed
    intercept[Exception] {
      plain.sql("select mask('a', 'X', 'x', '0', ':', '5')").collect()
    }
    assert(plain.sql("select mask_first_n('TestString-123', 4)").collect()(0).getString(0)
      == "XxxxString-123")
  }
}
