package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MaskPolicies

/** Policy-driven masking / row filtering (plans/TableMask). Pins: the
  * governed scan is rewritten transparently (no mask in the query text);
  * predicates evaluate against MASKED values, so a raw-value probe can
  * never match; row-filtered rows are invisible to any query; the mask
  * expression runs as builtins inside the plan (no UDF); a policy that
  * changes a column's type is rejected at registration. */
class MaskSpec extends AnyFunSuite {
  import TestSession._

  private val dir = "target/storage/mask_spec/customer"

  private def governed() = {
    Tables.customer(spark, sf).write.mode(SaveMode.Overwrite).parquet(dir)
    MaskPolicies.clear()
    MaskPolicies.register(spark, dir,
      rowFilter = Some("c_mktsegment <> 'BUILDING'"),
      masks = Map("c_name" -> "md5(cast(c_name as binary))"))
  }

  test("plain scans of a governed table see masked values and filtered rows only") {
    governed()
    try {
      val got = spark.read.parquet(dir)
      // row policy: BUILDING rows do not exist for any consumer
      assert(got.filter(col("c_mktsegment") === "BUILDING").count() == 0)
      // column policy: every c_name is an md5 digest, never a raw name
      val names = got.select(col("c_name")).limit(50).collect().map(_.getString(0))
      assert(names.nonEmpty && names.forall(_.matches("[0-9a-f]{32}")), names.take(3).mkString(","))
      // and the masked scan agrees with explicitly-masked raw data
      val want = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") =!= "BUILDING")
        .agg(count(lit(1)), min(md5(col("c_name").cast("binary")))).collect()(0)
      val have = got.agg(count(lit(1)), min(col("c_name"))).collect()(0)
      assert(have == want)
    } finally MaskPolicies.clear()
  }

  test("predicates see masked data: probing a raw value finds nothing, a digest finds rows") {
    governed()
    try {
      val raw = Tables.customer(spark, sf)
        .filter(col("c_mktsegment") =!= "BUILDING")
        .select(col("c_name")).first().getString(0)
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(raw.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val got = spark.read.parquet(dir)
      assert(got.filter(col("c_name") === raw).count() == 0,
        "a raw value must never match a governed scan")
      assert(got.filter(col("c_name") === digest).count() >= 1)
    } finally MaskPolicies.clear()
  }

  test("the rewrite stays codegen-friendly: md5 in the plan, no UDF, row filter pushed") {
    governed()
    try {
      val plan = spark.read.parquet(dir).filter(col("c_custkey") < 100)
        .select(col("c_name")).queryExecution.executedPlan.toString
      assert(plan.contains("md5"), plan.take(800))
      assert(!plan.contains("UDF"), plan.take(800))
      assert(plan.contains("c_mktsegment"), "row policy vanished:\n" + plan.take(800))
    } finally MaskPolicies.clear()
  }

  test("reading a raw FILE of a governed table is refused, not silently unmasked") {
    governed()
    try {
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getPath
      val e = intercept[org.apache.hadoop.security.AccessControlException](
        spark.read.parquet(file).count())
      assert(e.getMessage.contains("fragment"), e.getMessage)
    } finally MaskPolicies.clear()
  }

  test("a multi-path scan mixing a governed table with other data is refused") {
    governed()
    val other = "target/storage/mask_spec/other"
    Tables.customer(spark, sf).limit(20).write.mode(SaveMode.Overwrite).parquet(other)
    try {
      // governed dir in head AND non-head position: both refused — one
      // frame substitution would silently drop the other root's rows,
      // and skipping it would leak raw values
      for (paths <- Seq(Seq(dir, other), Seq(other, dir))) {
        val e = intercept[org.apache.hadoop.security.AccessControlException](
          spark.read.parquet(paths: _*).count())
        assert(e.getMessage.contains("multi-path"), e.getMessage)
      }
    } finally MaskPolicies.clear()
  }

  test("a masked table with a registered index still answers (routed, masked, no refusal)") {
    import graft.plans.IndexCatalog
    import graft.sources.CompactIndexIO
    val tdir = "target/storage/mask_spec/indexed"
    val idx = "target/storage/mask_spec/indexed_idx"
    // hash-cluster on custkey so the index prunes; mask the NAME column
    Tables.customer(spark, sf)
      .repartition(8, col("c_custkey"))
      .write.mode(SaveMode.Overwrite).parquet(tdir)
    CompactIndexIO.build(spark, tdir, "c_custkey", idx)
    MaskPolicies.clear(); IndexCatalog.clear()
    IndexCatalog.register(spark, tdir, "c_custkey", idx)
    MaskPolicies.register(spark, tdir, None,
      Map("c_name" -> "md5(cast(c_name as binary))"))
    try {
      val key = Tables.customer(spark, sf).select(col("c_custkey")).first().getLong(0)
      val q = spark.read.parquet(tdir).filter(col("c_custkey") === key)
        .select(col("c_name"))
      val rows = q.collect().map(_.getString(0))
      assert(rows.nonEmpty && rows.forall(_.matches("[0-9a-f]{32}")),
        s"indexed+masked scan must stay masked, got ${rows.take(2).mkString(",")}")
      // and the route actually pruned under the mask frame
      assert(q.inputFiles.length < 8,
        s"route did not prune: ${q.inputFiles.length} of 8 files")
    } finally { MaskPolicies.clear(); IndexCatalog.clear() }
  }

  test("a forged planted-scan option exempts nothing: masked on the table, refused on a fragment") {
    governed()
    try {
      // the marker's VALUE is a per-JVM nonce — option("...", "true")
      // is just an unknown reader option, so the scan is masked normally
      val forged = spark.read.option(graft.PathKeys.PlantedOption, "true").parquet(dir)
      val names = forged.select(col("c_name")).limit(20).collect().map(_.getString(0))
      assert(names.nonEmpty && names.forall(_.matches("[0-9a-f]{32}")),
        s"forged marker must not unmask: ${names.take(2).mkString(",")}")
      assert(forged.filter(col("c_mktsegment") === "BUILDING").count() == 0,
        "forged marker must not disable the row policy")
      // and a fragment probe with the forged marker is still refused
      val file = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.getPath
      intercept[org.apache.hadoop.security.AccessControlException](
        spark.read.option(graft.PathKeys.PlantedOption, "true").parquet(file).count())
    } finally MaskPolicies.clear()
  }

  test("a recursive scan rooted ABOVE a governed table is refused, not silently raw") {
    governed()
    try {
      val parent = new java.io.File(dir).getParentFile.getPath
      val e = intercept[org.apache.hadoop.security.AccessControlException](
        spark.read.option("recursiveFileLookup", "true")
          .schema(Tables.customer(spark, sf).schema).parquet(parent).count())
      assert(e.getMessage.contains("includes policy-governed"), e.getMessage)
    } finally MaskPolicies.clear()
  }

  test("policies that change a column's type or name non-existent columns are rejected") {
    Tables.customer(spark, sf).write.mode(SaveMode.Overwrite).parquet(dir)
    MaskPolicies.clear()
    val e = intercept[IllegalArgumentException](MaskPolicies.register(spark, dir,
      None, Map("c_name" -> "length(c_name)")))
    assert(e.getMessage.contains("preserve"))
    val e2 = intercept[IllegalArgumentException](MaskPolicies.register(spark, dir,
      None, Map("no_such" -> "md5(c_name)")))
    assert(e2.getMessage.contains("non-existent"))
    // and after clear() the raw values are visible again
    MaskPolicies.clear()
    val names = spark.read.parquet(dir).select(col("c_name")).limit(5)
      .collect().map(_.getString(0))
    assert(names.exists(!_.matches("[0-9a-f]{32}")))
  }
}
