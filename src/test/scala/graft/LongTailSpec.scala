package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins long-tail registry functions DuckDB cannot oracle (factorial,
  * java_method/reflect, xpath numeric variants — reference
  * FunctionRegistry.java:230, :418-420, :306-313) and the bitmap-index
  * family's algebra (GenericUDAFEWAHBitmap.java + UDFEWAHBitmapAnd/Or/
  * Empty.java) against plain Set semantics. */
class LongTailSpec extends AnyFunSuite {
  import TestSession._

  test("factorial / java_method / reflect match the Hive contract") {
    val r = spark.sql(
      """SELECT factorial(5) AS f5, factorial(0) AS f0,
        |  java_method('java.lang.Math', 'max', 3, 4) AS jm,
        |  reflect('java.lang.String', 'valueOf', 17) AS rf
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 120L)
    assert(r.getLong(1) == 1L)
    assert(r.getString(2) == "4") // reflect family returns the string form
    assert(r.getString(3) == "17")
  }

  test("xpath numeric variants extract typed values") {
    val r = spark.sql(
      """SELECT xpath_double('<a><b>7.5</b></a>', 'a/b') AS xd,
        |  xpath_float('<a><b>2.5</b></a>', 'a/b') AS xf,
        |  xpath_long('<a><b>9</b></a>', 'a/b') AS xl,
        |  xpath_short('<a><b>3</b></a>', 'a/b') AS xs,
        |  xpath_number('<a><b>1.25</b></a>', 'a/b') AS xn
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 7.5)
    assert(r.getFloat(1) == 2.5f)
    assert(r.getLong(2) == 9L)
    assert(r.getShort(3) == 3.toShort)
    assert(r.getDouble(4) == 1.25)
  }

  test("bitmap family matches Set algebra on adversarial offsets") {
    import graft.functions.BitmapIndex._
    import spark.implicits._
    // offsets straddle word boundaries (63/64), share words, and leave
    // whole words empty — the cases the sparse pair encoding must elide.
    val a = Seq(0L, 1L, 63L, 64L, 1000L, 4096L, 100000L)
    val b = Seq(1L, 64L, 65L, 4096L, 99999L)
    val df = (a.map(("a", _)) ++ b.map(("b", _))).toDF("grp", "off")
    val bms = df.groupBy($"grp").agg(bitmapAgg($"off").as("bm"))
    val wide = bms.filter($"grp" === "a").select($"bm".as("bma"))
      .crossJoin(bms.filter($"grp" === "b").select($"bm".as("bmb")))
    val r = wide.select(
      bitmapCount($"bma"), bitmapCount($"bmb"),
      bitmapCount(bitmapAnd($"bma", $"bmb")),
      bitmapCount(bitmapOr($"bma", $"bmb")),
      bitmapEmpty(bitmapAnd($"bma", $"bmb")),
      bitmapEmpty(bitmapAnd($"bma", bitmapAnd($"bma", $"bmb")))).collect()(0)
    val (sa, sb) = (a.toSet, b.toSet)
    assert(r.getLong(0) == sa.size)
    assert(r.getLong(1) == sb.size)
    assert(r.getLong(2) == (sa intersect sb).size)
    assert(r.getLong(3) == (sa union sb).size)
    assert(!r.getBoolean(4))
    assert(!r.getBoolean(5))
  }

  test("in_file matches exact lines only (UDFInFile contract)") {
    import graft.functions.LongTail.inFile
    import spark.implicits._
    val f = java.io.File.createTempFile("infile", ".txt")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, "alpha\nbeta\ngam ma\n")
    val r = Seq("alpha", "beta ", "gam ma", "delta").toDF("s")
      .select($"s", inFile($"s", f.getPath).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(r("alpha") && r("gam ma"))
    assert(!r("beta ") && !r("delta")) // no trimming, no partial match
  }

  test("bitmap AND of disjoint sets is empty; encoding stays sorted-sparse") {
    import graft.functions.BitmapIndex._
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 700L), ("b", 2000L)).toDF("grp", "off")
    val bms = df.groupBy($"grp").agg(bitmapAgg($"off").as("bm"))
    val wide = bms.filter($"grp" === "a").select($"bm".as("bma"))
      .crossJoin(bms.filter($"grp" === "b").select($"bm".as("bmb")))
    val r = wide.select(bitmapEmpty(bitmapAnd($"bma", $"bmb")),
                        $"bma").collect()(0)
    assert(r.getBoolean(0))
    val enc = r.getSeq[Long](1)
    assert(enc.length == 4) // two words: offsets 10 and 700 are 2 sparse pairs
    val idx = enc.grouped(2).map(_.head).toSeq
    assert(idx == idx.sorted && idx.distinct == idx)
  }

  test("reflect2: assignable-parameter dispatch, binary returns, timestamp targets") {
    // equals(Object) must accept a String arg — the reference resolves
    // through MethodUtils.getMatchingAccessibleMethod (udf_reflect2.q)
    val r = spark.sql(
      """SELECT reflect2('val_86', 'equals', 'val_86') AS eq,
        |       reflect2('ab', 'getBytes') AS bs,
        |       reflect2(cast('2013-02-15 19:41:20' as timestamp), 'getTime') AS tm
        |""".stripMargin).collect()(0)
    assert(r.getBoolean(0))
    assert(new String(r.getAs[Array[Byte]](1), "UTF-8") == "ab")
    // session TZ is UTC, so the epoch millis are exact
    assert(r.getLong(2) == java.time.Instant.parse("2013-02-15T19:41:20Z").toEpochMilli)
  }

  test("reflect2: several assignable overloads resolve to the most specific one") {
    // Timestamp.compareTo with a java.sql.Date arg matches BOTH the
    // inherited compareTo(java.util.Date) and the Comparable bridge
    // compareTo(Object); commons-lang-style resolution must pick the
    // Date overload deterministically regardless of getMethods order
    val r = spark.sql(
      """SELECT reflect2(cast('2013-02-15 19:41:20' as timestamp), 'compareTo',
        |                cast('2013-02-15' as date)) AS cmp,
        |       reflect2(cast('2013-02-15 19:41:20' as timestamp), 'compareTo',
        |                cast('2013-02-16' as date)) AS cmp2
        |""".stripMargin).collect()(0)
    assert(r.getInt(0) > 0 && r.getInt(1) < 0)
  }
}
