package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HiveCompat

/** Pins hive_hash to Hive's documented hash values, field() to Hive
  * semantics, and the uniontype shim's encoding. */
class HiveCompatSpec extends AnyFunSuite {
  import TestSession._

  test("hive_hash matches Hive's hashCode family") {
    HiveCompat.registerHiveHash(spark)
    val r = spark.sql(
      """SELECT hive_hash('abc') AS s,
        |  hive_hash(5) AS i,
        |  hive_hash(CAST(1234567890123 AS BIGINT)) AS l,
        |  hive_hash(true) AS b,
        |  hive_hash(5, 'abc') AS multi""".stripMargin).collect()(0)
    assert(r.getInt(0) == 96354)          // java String.hashCode("abc")
    assert(r.getInt(1) == 5)              // int hashes to itself
    assert(r.getInt(2) == ((1234567890123L ^ (1234567890123L >>> 32)).toInt))
    assert(r.getInt(3) == 1)              // Hive: true -> 1
    assert(r.getInt(4) == 5 * 31 + 96354) // multi-col: h = h*31 + hash(col)
  }

  test("field() returns the 1-based first-match index, 0 when absent") {
    import spark.implicits._
    val df = Seq("b", "c", "x").toDF("v")
      .select(HiveCompat.field(col("v"), lit("a"), lit("b"), lit("c")).as("f"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(2, 3, 0))
  }

  test("uniontype shim: only the active field is non-null") {
    import spark.implicits._
    val df = Seq((0, "hello", 1.5), (1, "world", 2.5)).toDF("tag", "s", "x")
      .select(HiveCompat.create_union(col("tag"), col("s"),
        col("x").cast("string")).as("u"))
    val rows = df.select(col("u.tag"), col("u.field0"), col("u.field1")).collect()
    assert(rows(0).getByte(0) == 0 && rows(0).getString(1) == "hello" && rows(0).isNullAt(2))
    assert(rows(1).getByte(0) == 1 && rows(1).isNullAt(1) && rows(1).getString(2) == "2.5")
  }

  test("hive-bucket sampling partitions the table exactly") {
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val buckets = (1 to 4).map(x =>
      HiveCompat.bucketSampleOn(li, x, 4, col("l_suppkey")).count())
    assert(buckets.sum == total, s"buckets $buckets don't cover $total")
    assert(buckets.forall(_ > 0))
  }
}
