package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style tests for the divergence-prone semantics SURVEY.md
  * §7.3 flags (type coercion, integer division, pmod, null propagation)
  * — the reference pins these with .q golden files. Cases are generated
  * from a fixed seed and evaluated vectorized in one DataFrame per
  * property, compared against a Scala-side model.
  */
class CoercionSpec extends AnyFunSuite {
  import TestSession._

  private val rnd = new scala.util.Random(42)
  private def ints(n: Int): Seq[Int] =
    Seq.fill(n)(rnd.nextInt(2000001) - 1000000)

  test("integer / is double division; div is integer division (Hive semantics)") {
    import spark.implicits._
    val pairs = ints(200).zip(ints(200).map(b => if (b == 0) 7 else b))
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        (col("a") / col("b")).as("slash"),
        expr("a div b").as("idiv"))
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val (a, b) = (r.getInt(0), r.getInt(1))
      assert(r.getDouble(2) == a.toDouble / b.toDouble, s"$a / $b")
      assert(r.getLong(3) == a.toLong / b.toLong, s"$a div $b")
    }
  }

  test("pmod is always non-negative; % follows the dividend sign") {
    import spark.implicits._
    val pairs = ints(200).zip(ints(200).map(b => math.abs(b) % 1000 + 1))
    val rows = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        pmod(col("a"), col("b")).as("p"), (col("a") % col("b")).as("m"))
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getInt(0), r.getInt(1))
      assert(r.getInt(2) == ((a % b) + b) % b, s"pmod($a, $b)")
      assert(r.getInt(2) >= 0)
      assert(r.getInt(3) == a % b, s"$a % $b")
    }
  }

  test("string<->numeric implicit comparison and null propagation") {
    val r = spark.sql(
      """SELECT '10' = 10 AS s_eq,
        |  concat('a', CAST(NULL AS STRING)) AS c_null,
        |  concat_ws('-', 'a', CAST(NULL AS STRING), 'b') AS cw,
        |  NULL <=> NULL AS nse,
        |  1 <=> NULL AS nse2,
        |  CAST('12abc' AS INT) AS bad_cast""".stripMargin).collect()(0)
    assert(r.getBoolean(0))
    assert(r.isNullAt(1), "concat propagates null (Hive semantics)")
    assert(r.getString(2) == "a-b", "concat_ws skips nulls")
    assert(r.getBoolean(3) && !r.getBoolean(4))
    assert(r.isNullAt(5), "failed cast yields null with ANSI off")
  }

  test("timestamp comparisons are UTC-stable") {
    assert(spark.conf.get("spark.sql.session.timeZone") == "UTC")
    val r = spark.sql(
      "SELECT unix_timestamp(TIMESTAMP '2000-01-01 00:00:00') AS e").collect()(0)
    assert(r.getLong(0) == 946684800L)
  }
}
