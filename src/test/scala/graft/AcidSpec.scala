package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.CopyOnWrite

class AcidSpec extends AnyFunSuite {
  import TestSession._

  private def freshTable(): String = {
    val dir = Files.createTempDirectory("graft_acid").toString + "/orders"
    Tables.orders(spark, sf).write.parquet(dir)
    dir
  }

  test("UPDATE rewrites only matching rows") {
    val path = freshTable()
    // materialize all "before" facts now: the COW swap replaces the files
    // underneath, so a pre-swap DataFrame's cached listing goes stale
    val before = spark.read.parquet(path)
    val beforeCount = before.count()
    val expectAffected = before.filter(col("o_orderstatus") === "O").count()
    val untouchedBefore = before.filter(col("o_orderstatus") =!= "O")
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)

    val affected = CopyOnWrite.update(spark, path,
      col("o_orderstatus") === "O",
      Map("o_totalprice" -> (col("o_totalprice") * 1.1),
          "o_orderpriority" -> lit("9-REPRICED")))

    assert(affected == expectAffected)
    val after = spark.read.parquet(path)
    assert(after.count() == beforeCount)
    assert(after.filter(col("o_orderpriority") === "9-REPRICED").count() == expectAffected)
    val untouchedAfter = after.filter(col("o_orderstatus") =!= "O")
      .agg(sum(col("o_totalprice"))).collect()(0).getDouble(0)
    assert(untouchedAfter == untouchedBefore, "non-matching rows were modified")
  }

  test("DELETE removes exactly the matching rows") {
    val path = freshTable()
    val before = spark.read.parquet(path).count()
    val toDelete = spark.read.parquet(path).filter(col("o_totalprice") > 300000).count()
    assert(toDelete > 0)
    val deleted = CopyOnWrite.delete(spark, path, col("o_totalprice") > 300000)
    assert(deleted == toDelete)
    val after = spark.read.parquet(path)
    assert(after.count() == before - toDelete)
    assert(after.filter(col("o_totalprice") > 300000).count() == 0)
  }

  test("no-op update leaves the table untouched") {
    val path = freshTable()
    val affected = CopyOnWrite.update(spark, path,
      col("o_orderkey") < 0, Map("o_totalprice" -> lit(0.0)))
    assert(affected == 0)
    assert(spark.read.parquet(path).count() == Tables.orders(spark, sf).count())
  }
}
