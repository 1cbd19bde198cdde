package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime bloom-filter semijoin reduction — the Spark-native analog of
  * the reference's HIVE-15269/HIVE-16260 dynamic semijoin reduction
  * (ql/src/java/org/apache/hadoop/hive/ql/optimizer/
  * DynamicPartitionPruningOptimization.java and the min/max+bloom
  * runtime filters TezCompiler injects): a selective filter on the dim
  * side builds a bloom filter that prunes the FACT side's shuffle input
  * before the join. Spark ships the machinery
  * (spark.sql.optimizer.runtime.bloomFilter.*); the engine's contract is
  * that the plan SHAPE appears under the same conditions Hive's
  * optimizer targets: big shuffle join + selective creation side. The
  * size thresholds (10 GB application side by default) are scale
  * guards — at 100 TB they pass on their own; at test scale we lower
  * them explicitly, which is the point of the pin: the rewrite is
  * reachable, correct, and OFF when the join broadcasts (a broadcast
  * hash join already prunes at the probe).
  */
class SemijoinReductionSpec extends AnyFunSuite {
  import TestSession._

  private def withConfs[A](pairs: (String, String)*)(body: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects a bloom filter on the fact side of a shuffle join") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "64MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val dim = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val fact = Tables.lineitem(spark, sf)
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val opt = joined.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") || opt.contains("bloom_filter"),
        "selective creation side must inject a runtime bloom filter:\n" + opt)
      // and the filtered answer is identical to the unfiltered-machinery one
      val got = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val want = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got == want)
    }
  }

  test("dynamic partition pruning fires on a partitioned fact joined to a filtered dim") {
    // the reference's DynamicPartitionPruningOptimization.java exactly:
    // the dim-side filter's key values prune fact PARTITIONS at runtime
    val path = "target/storage/dppspec/orders_by_priority"
    Tables.orders(spark, sf).write.mode("overwrite")
      .partitionBy("o_orderpriority").parquet(path)
    val fact = spark.read.parquet(path)
    val dim = Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("p"), col("o_orderstatus"))
      .filter(col("o_orderstatus") === "F").distinct()
    val joined = fact.join(dim, col("o_orderpriority") === col("p"))
      .groupBy(col("p")).agg(count(lit(1)).as("n"))
    val phys = joined.queryExecution.executedPlan.toString
    assert(phys.contains("dynamicpruning"),
      "partition-column join with a filtered dim must plan dynamic pruning:\n" + phys)
    assert(joined.collect().map(_.getLong(1)).sum > 0)
  }

  test("no injection when the join broadcasts or the filter is not selective") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      // broadcast-sized dim: Spark prefers the broadcast join, no bloom filter
      val joined = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
              col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
      val phys = joined.queryExecution.executedPlan.toString
      if (phys.contains("BroadcastHashJoin"))
        assert(!joined.queryExecution.optimizedPlan.toString.contains("might_contain"),
          "broadcast join must not carry a redundant bloom filter")
    }
    // default thresholds: tiny tables stay untouched (the scale guard)
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT"),
            col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    assert(!plain.queryExecution.optimizedPlan.toString.contains("might_contain"))
  }
}
