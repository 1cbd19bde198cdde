package graft

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SkewCatalog, SkewedTables}

/** SKEWED BY / list bucketing (sources/SkewedTables + plans/SkewRoute —
  * the HiveParser.g tableSkewed + ListBucketingPruner.java:57 analog).
  * The oracle row (q302) pins answers; this spec pins what the oracle
  * cannot see: a hot-value point query must actually read STRICTLY
  * FEWER files than the table holds (and zero files from other hot
  * directories), a cold-value query must skip every hot directory, a
  * predicate shape the pruner cannot prove must decline to the full
  * scan with the answer unchanged, and an Append that changes the
  * declared layout must be refused (it would silently mis-route). */
class SkewedTablesSpec extends AnyFunSuite {
  import TestSession._

  private val base = "target/storage/skewspec"

  /** Files actually scanned, post partition pruning (the numFiles metric
    * of every file scan in the executed plan; AQE nests the final plan
    * under AdaptiveSparkPlanExec). */
  private def filesScanned(df: DataFrame): Long = {
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] =
      p.collect {
        case s: FileSourceScanExec => Seq(s)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      }.flatten
    scans(df.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
  }

  private def writeSkewed(path: String): Long = {
    SkewedTables.write(Tables.orders(spark, sf), path, "o_orderstatus", Seq("O", "F"))
    spark.read.parquet(path).inputFiles.length.toLong
  }

  test("hot-value point query prunes to the hot directory only") {
    val path = s"$base/orders_hot"
    val total = writeSkewed(path)
    val q = SkewedTables.read(spark, path).filter(col("o_orderstatus") === "O")
    val n = filesScanned(q)
    assert(n < total, s"hot-value scan read $n of $total files — no pruning")
    // structural pin: the route landed as a PARTITION filter (directory-
    // level pruning), not a data filter
    val planStr = q.queryExecution.executedPlan.toString
    assert(planStr.contains("PartitionFilters") && planStr.contains(SkewedTables.DirCol),
      s"routing predicate did not reach PartitionFilters:\n$planStr")
    // answer identical to the unskewed base table
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count()
    assert(q.count() == expect)
  }

  test("cold-value query reads only the default directory, skipping every hot one") {
    val path = s"$base/orders_cold"
    writeSkewed(path)
    // 'P' is not in the declared hot list -> rows live only in the
    // default directory; the scan must touch no hot directory's files
    val q = SkewedTables.read(spark, path).filter(col("o_orderstatus") === "P")
    q.collect()
    val perDir = spark.read.parquet(path).inputFiles
      .groupBy(f => f.split("/").find(_.startsWith(SkewedTables.DirCol + "=")).getOrElse("?"))
    val defaultFiles = perDir(s"${SkewedTables.DirCol}=${SkewedTables.Default}").length
    assert(filesScanned(q) <= defaultFiles,
      "cold-value scan read beyond the default directory")
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "P").count()
    assert(q.count() == expect)
  }

  test("mixed IN (hot, cold) routes to the union; unprovable predicates decline") {
    val path = s"$base/orders_mixed"
    val total = writeSkewed(path)
    val mixed = SkewedTables.read(spark, path)
      .filter(col("o_orderstatus").isin("O", "P"))
    assert(filesScanned(mixed) < total, "IN (hot, cold) did not prune the other hot dir")
    assert(mixed.count() ==
      Tables.orders(spark, sf).filter(col("o_orderstatus").isin("O", "P")).count())

    // a predicate the pruner cannot prove (non-literal comparison) must
    // fall back to the full scan — and still be correct
    val unprovable = SkewedTables.read(spark, path)
      .filter(col("o_orderstatus") >= "P")
    assert(filesScanned(unprovable) == total, "range predicate must decline the route")
    assert(unprovable.count() ==
      Tables.orders(spark, sf).filter(col("o_orderstatus") >= "P").count())
  }

  test("sidecar re-registers the layout in a fresh catalog; reader schema hides the routing column") {
    val path = s"$base/orders_sidecar"
    val total = writeSkewed(path)
    SkewCatalog.clear()
    val q = SkewedTables.read(spark, path) // re-registers from _skew.json
    assert(!q.columns.contains(SkewedTables.DirCol))
    val routed = q.filter(col("o_orderstatus") === "F")
    assert(filesScanned(routed) < total, "sidecar re-registration did not re-arm pruning")
  }

  test("multi-column SKEWED BY: hot tuples route, cold tuples hit the default dir, partial binding declines") {
    val path = s"$base/orders_multi"
    SkewedTables.write(Tables.orders(spark, sf), path,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(Seq("O", "1-URGENT"), Seq("F", "5-LOW")), SaveMode.Overwrite)
    val total = spark.read.parquet(path).inputFiles.length.toLong
    val src = Tables.orders(spark, sf)

    val hot = SkewedTables.read(spark, path)
      .filter(col("o_orderstatus") === "O" && col("o_orderpriority") === "1-URGENT")
    assert(filesScanned(hot) < total, "hot-tuple scan did not prune")
    assert(hot.count() == src.filter(col("o_orderstatus") === "O" &&
      col("o_orderpriority") === "1-URGENT").count())

    // cold tuple (hot values of DIFFERENT tuples — ('F','1-URGENT') is
    // cold even though each part appears in some hot tuple)
    val cold = SkewedTables.read(spark, path)
      .filter(col("o_orderstatus") === "F" && col("o_orderpriority") === "1-URGENT")
    cold.collect()
    val defaultFiles = spark.read.parquet(path).inputFiles
      .count(_.contains(s"${SkewedTables.DirCol}=${SkewedTables.Default}")).toLong
    assert(filesScanned(cold) <= defaultFiles, "cold-tuple scan read beyond the default dir")
    assert(cold.count() == src.filter(col("o_orderstatus") === "F" &&
      col("o_orderpriority") === "1-URGENT").count())

    // binding only ONE of two skew columns cannot prove a directory set
    val partial = SkewedTables.read(spark, path).filter(col("o_orderstatus") === "O")
    assert(filesScanned(partial) == total, "partially-bound predicate must decline")
    assert(partial.count() == src.filter(col("o_orderstatus") === "O").count())
  }

  test("governance: skewed writes face the same INSERT/DELETE chokepoints as other writers") {
    import graft.security.AccessPolicies
    import org.apache.hadoop.security.AccessControlException
    val path = s"$base/orders_governed"
    writeSkewed(path)
    AccessPolicies.clear()
    try {
      AccessPolicies.protect(path)
      spark.conf.set("graft.auth.user", "nobody")
      // overwrite destroys previous contents: INSERT alone is not enough
      intercept[AccessControlException](writeSkewed(path))
      AccessPolicies.grant(path, "nobody", "INSERT")
      intercept[AccessControlException](writeSkewed(path))
      // append needs INSERT only
      SkewedTables.write(Tables.orders(spark, sf).limit(10), path,
        "o_orderstatus", Seq("O", "F"), SaveMode.Append)
      AccessPolicies.grant(path, "nobody", "DELETE", "SELECT")
      writeSkewed(path) // full overwrite privileges -> succeeds
    } finally {
      AccessPolicies.clear()
      spark.conf.unset("graft.auth.user")
    }
  }

  test("append with a different layout is refused; matching append keeps routing sound") {
    val path = s"$base/orders_append"
    writeSkewed(path)
    val extra = Tables.orders(spark, sf).limit(50)
    val e1 = intercept[IllegalArgumentException] {
      SkewedTables.write(extra, path, "o_orderstatus", Seq("O"), SaveMode.Append)
    }
    assert(e1.getMessage.contains("layout mismatch"))
    val e2 = intercept[IllegalArgumentException] {
      SkewedTables.write(extra.withColumnRenamed("o_orderstatus", "st")
        .withColumn("o_orderstatus", col("st")).drop("st"),
        path, "o_orderstatus", Seq("O", "F", "P"), SaveMode.Append)
    }
    assert(e2.getMessage.contains("layout mismatch"))
    // matching layout appends fine and the routed answer includes both writes
    SkewedTables.write(extra, path, "o_orderstatus", Seq("O", "F"), SaveMode.Append)
    val got = SkewedTables.read(spark, path).filter(col("o_orderstatus") === "O").count()
    val expect = Tables.orders(spark, sf).filter(col("o_orderstatus") === "O").count() +
      extra.filter(col("o_orderstatus") === "O").count()
    assert(got == expect)
  }

  test("hot values that cannot round-trip through the partitioned sink are refused") {
    // Spark folds an empty partition value AND the literal
    // '__HIVE_DEFAULT_PARTITION__' into the null-partition directory and
    // reads both back as NULL — a hot tuple encoding to either would land
    // rows in a directory the routing predicate can't name, and SkewRoute
    // would silently drop them. The writer must refuse loudly.
    val df = Tables.orders(spark, sf).limit(10)
    val e1 = intercept[IllegalArgumentException] {
      SkewedTables.write(df, s"$base/degenerate1", "o_orderstatus", Seq("O", ""))
    }
    assert(e1.getMessage.contains("may not be empty"))
    val e2 = intercept[IllegalArgumentException] {
      SkewedTables.write(df, s"$base/degenerate2", "o_orderstatus",
        Seq("__HIVE_DEFAULT_PARTITION__"))
    }
    assert(e2.getMessage.contains("__HIVE_DEFAULT_PARTITION__"))
    // multi-column tuples with empty PARTS are fine: the encoded name
    // (',' separated, %-escaped) is never empty and never the sentinel
    val two = df.withColumn("o2", col("o_orderstatus"))
    SkewedTables.write(two, s"$base/degenerate3",
      Seq("o_orderstatus", "o2"), Seq(Seq("", "")), SaveMode.Overwrite)
    assert(SkewedTables.read(spark, s"$base/degenerate3").count() == 10)
  }
}
