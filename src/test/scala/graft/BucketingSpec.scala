package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables + sort-merge-bucket join — the reference's
  * SMBMapJoinOperator (exec/SMBMapJoinOperator.java:62): co-bucketed,
  * co-sorted tables join without a shuffle. In Spark: bucketBy writers
  * + a join whose plan shows no Exchange on either side — the property
  * that makes repeated fact-fact joins viable at 100 TB. */
class BucketingSpec extends AnyFunSuite {
  import TestSession._

  test("co-bucketed tables sort-merge join without shuffling") {
    spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
    spark.sql("DROP TABLE IF EXISTS graftdb.orders_b")
    spark.sql("DROP TABLE IF EXISTS graftdb.lineitem_b")
    // the in-memory catalog forgets tables across JVMs but their
    // directories persist — clear locations from any earlier aborted run
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    Seq("orders_b", "lineitem_b").foreach { t =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(s"$wh/graftdb.db/$t"))
    }

    Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graftdb.orders_b")
    Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graftdb.lineitem_b")

    // hint("merge") pins sort-merge (small test tables would otherwise
    // broadcast under the 64MB threshold; at real scale SMJ is automatic)
    val joined = spark.table("graftdb.lineitem_b").hint("merge")
      .join(spark.table("graftdb.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))

    // correctness: same as joining the raw parquet
    val expected = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.agg(sum("n")).collect()(0).getLong(0) == expected)

    // scale property: the join itself needs no shuffle on either input —
    // the only Exchange allowed is the one for the final groupBy
    joined.collect()
    val full = joined.queryExecution.executedPlan.toString
    // AQE appends "== Initial Plan ==" after the final plan — judge only
    // the final plan, and only the subtree under the join
    val plan = full.split("== Initial Plan ==")(0)
    assert(plan.contains("SortMergeJoin"), plan.take(1000))
    assert(plan.contains("Bucketed: true"), plan.take(3000))
    val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(joinPart.linesIterator.count(_.contains("Exchange")) == 0,
      s"bucketed join still shuffles:\n${plan.take(3000)}")

    spark.sql("DROP TABLE graftdb.orders_b")
    spark.sql("DROP TABLE graftdb.lineitem_b")
  }

  test("point filter on the bucket column prunes to one bucket at scan time") {
    // bucket pruning (the reference's TABLESAMPLE-on-bucketed-table read
    // path, ql/io/BucketizedHiveInputFormat kin): an equality filter on
    // the bucketing column must read 1 of 8 bucket files, not the table —
    // at 100 TB that is the difference between a point lookup and a scan
    spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
    spark.sql("DROP TABLE IF EXISTS graftdb.cust_bucketed")
    val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(s"$wh/graftdb.db/cust_bucketed"))
    Tables.customer(spark, sf)
      .write.bucketBy(8, "c_custkey").saveAsTable("graftdb.cust_bucketed")
    // autoBucketedScan drops bucketing when no join wants the
    // distribution — but that also forfeits bucket pruning; disable it so
    // the point filter can prune (the setting a lookup-heavy production
    // table would run with)
    val key = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val old = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val q = spark.table("graftdb.cust_bucketed").filter(col("c_custkey") === 42)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(2000))
      assert(q.collect().map(_.getAs[Number]("c_custkey").longValue()).forall(_ == 42L))
    } finally {
      spark.conf.set(key, old)
      spark.sql("DROP TABLE IF EXISTS graftdb.cust_bucketed")
    }
  }
}
