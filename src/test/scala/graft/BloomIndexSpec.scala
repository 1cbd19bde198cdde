package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.IndexCatalog
import graft.sources.CompactIndexIO

/** Bloom-filter file index contracts: soundness (no false negatives —
  * the property that makes the route safe), effectiveness on the layout
  * zone maps cannot help (hash-clustered), a false-positive ceiling, and
  * the transparent IndexRoute path for kind="bloom".
  */
class BloomIndexSpec extends AnyFunSuite {
  import TestSession._

  private val base = "target/storage/bloom_spec"
  private val path = s"$base/orders_hash"
  private val idx = s"$base/orders_hash_idx"

  private lazy val built: Unit = {
    Tables.orders(spark, "/root/testdata/sf0.01")
      .repartition(16, col("o_custkey"))
      .write.mode("overwrite").parquet(path)
    CompactIndexIO.buildBloom(spark, path, "o_custkey", idx)
  }

  test("no false negatives: every file that contains a probed key survives pruning") {
    built
    val keys = Seq(7L, 101L, 512L, 1400L)
    val truth = spark.read.parquet(path)
      .filter(col("o_custkey").isin(keys: _*))
      .select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    val pruned = CompactIndexIO.prunedFilesBloom(spark, idx, keys).toSet
    assert(truth.subsetOf(pruned), s"lost files: ${truth.diff(pruned)}")
  }

  test("bloom route prunes a hash-clustered table to ~one file per key, same answer") {
    built
    val keys = Seq(101L, 512L, 1400L)
    val pruned = CompactIndexIO.prunedFilesBloom(spark, idx, keys)
    // hash clustering puts each key in exactly 1 of 16 files; allow FP slack
    assert(pruned.size <= keys.size + 2, s"kept ${pruned.size} of 16 files")
    val viaIndex = CompactIndexIO.readBloom(spark, path, idx, "o_custkey", keys)
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val full = spark.read.parquet(path).filter(col("o_custkey").isin(keys: _*))
      .agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(viaIndex == full)
  }

  test("empty probe set prunes to zero files instead of throwing") {
    built
    assert(CompactIndexIO.prunedFilesBloom(spark, idx, Nil).isEmpty)
    assert(CompactIndexIO.readBloom(spark, path, idx, "o_custkey", Nil).count() == 0)
  }

  test("absent keys almost never survive the probe (false-positive ceiling)") {
    built
    val absent = (0 until 20).map(i => 1000000L + i)
    val survivors = absent.map(k => CompactIndexIO.prunedFilesBloom(spark, idx, Seq(k)).size).sum
    // 16 KB bitset, ~940 keys/file, k=5 → FP rate ~5e-8; allow 1 fluke
    assert(survivors <= 1, s"$survivors of ${absent.size * 16} file-probes passed")
  }

  test("transparent bloom routing: a plain IN filter scans fewer files, same answer") {
    built
    IndexCatalog.clear()
    IndexCatalog.register(spark, path, "o_custkey", idx, kind = "bloom")
    try {
      def q = spark.read.parquet(path)
        .filter(col("o_custkey").isin(101L, 512L))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s"))
      val routedFiles = q.inputFiles.length
      assert(routedFiles < 16,
        s"transparent bloom route read $routedFiles of 16 files — no pruning")
      val got = q.collect()(0)
      IndexCatalog.clear()
      val plain = spark.read.parquet(path)
        .filter(col("o_custkey").isin(101L, 512L))
        .agg(count(lit(1)).as("n"), sum(col("o_orderkey")).as("s")).collect()(0)
      assert(got == plain, "transparent bloom route changed the answer")
    } finally IndexCatalog.clear()
  }
}
