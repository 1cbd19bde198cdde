package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder
import graft.sources.CompactIndexIO

/** Z-order layout contracts: the Morton code itself, losslessness of the
  * rewrite, and the point of the whole exercise — multi-column zone
  * pruning beats single-vector clustering on conjunctive range scans.
  */
class ZOrderSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("Morton code interleaves rank bits (x even, y odd)") {
    // identity quantization: lo=0, hi=255 at 8 bits maps v -> v
    val df = Seq((3L, 1L), (0L, 0L), (255L, 0L), (0L, 255L), (170L, 85L))
      .toDF("x", "y")
    val got = df.select(
      ZOrder.zvalue(Seq((col("x"), 0d, 255d), (col("y"), 0d, 255d)), 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    def morton(x: Long, y: Long): Long =
      (0 until 8).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
    assert(got == Seq(morton(3, 1), 0L, morton(255, 0), morton(0, 255), morton(170, 85)))
    // max-rank x alone fills the even bits, max-rank y the odd bits
    assert((got(2) | got(3)) == 0xFFFFL && (got(2) & got(3)) == 0L)
  }

  test("z-ordered rewrite is lossless and writes the requested file count") {
    val src = Tables.orders(spark, sf)
    val path = "target/storage/zorder_spec/orders_z"
    ZOrder.write(src, Seq("o_custkey", "o_totalprice"), path, bits = 8, numFiles = 8)
    val back = spark.read.parquet(path)
    assert(back.inputFiles.length == 8)
    assert(back.count() == src.count())
    // multiset equality via sorted key + checksum columns
    val a = src.select(col("o_orderkey"), col("o_custkey")).orderBy(col("o_orderkey")).collect()
    val b = back.select(col("o_orderkey"), col("o_custkey")).orderBy(col("o_orderkey")).collect()
    assert(a.sameElements(b))
  }

  test("equi-depth ranks keep pruning on a skewed dimension where linear ranks collapse") {
    val n = 50000
    // x long-tailed: 95% of rows dense in [0, 100), 5% tail up to ~1e6;
    // y comes from id's HIGH digits so it carries no information about x
    // (each y value sees the full dense x range)
    val df = spark.range(0, n, 1, 8).select(
      when(col("id") % 20 =!= 0, (col("id") % 100).cast("double"))
        .otherwise(lit(1000d) + (col("id") % 1000).cast("double") * 1000d).as("x"),
      ((col("id") / 100).cast("long") % 500).cast("double").as("y"),
      col("id"))
    val linPath = "target/storage/zorder_spec/skew_linear"
    val edPath = "target/storage/zorder_spec/skew_equidepth"
    ZOrder.write(df, Seq("x", "y"), linPath, bits = 8, numFiles = 16)
    ZOrder.writeEquiDepth(df, Seq("x", "y"), edPath, bits = 8, numFiles = 16)

    // narrow dense-region query (~3% of row mass): each equi-depth file
    // confines x to ~a quarter of percentile space (16 files = 4 top
    // interleaved bits = 2 bits per dim), so only zone-straddling files
    // survive; under linear ranks every dense-carrying file's zone spans
    // the whole dense region and nothing prunes
    def prunedOnX(path: String): Int = {
      val idx = s"$path-idx"
      CompactIndexIO.buildMinMax(spark, path, "x", idx)
      CompactIndexIO.prunedFilesRange(spark, idx, Some(60.5d), Some(63.5d)).size
    }
    val lin = prunedOnX(linPath)
    val ed = prunedOnX(edPath)
    // linear: the dense region all ranks to ~0, so x stops being encoded
    // and every dense-carrying file's zone spans the query range
    assert(lin >= 14, s"expected linear layout to keep ~all dense-carrying files, kept $lin")
    assert(ed <= 10 && ed < lin, s"equi-depth should localize the dense region, kept $ed of 16 (linear: $lin)")
    // losslessness of the equi-depth writer
    val back = spark.read.parquet(edPath)
    assert(back.count() == n)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) ==
      df.agg(sum(col("id"))).collect()(0).getLong(0))
  }

  test("OPTIMIZE ZORDER rewrites in place atomically: same rows, clustered layout, fresh staleness") {
    val src = Tables.orders(spark, "/root/testdata/sf0.01")
    val path = "target/storage/zorder_spec/orders_optimize"
    src.repartition(32).write.mode("overwrite").parquet(path) // unclustered, fragmented
    val before = spark.read.parquet(path).agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    val idx = s"$path-idx"
    CompactIndexIO.buildMinMax(spark, path, "o_custkey", idx)
    ZOrder.optimize(spark, path, Seq("o_custkey", "o_totalprice"), bits = 8, numFiles = 16)
    val after = spark.read.parquet(path).agg(count(lit(1)), sum(col("o_orderkey"))).collect()(0)
    assert(before == after, "OPTIMIZE changed the row multiset")
    assert(spark.read.parquet(path).inputFiles.length == 16)
    // every file replaced: the old index must report stale, and a refresh
    // against the new layout must prune the 2-D query
    assert(CompactIndexIO.isStale(spark, path, idx))
    CompactIndexIO.refresh(spark, path, "o_custkey", idx, kind = "minmax")
    val kept = CompactIndexIO.prunedFilesRange(spark, idx, Some(400L), Some(600L))
    assert(kept.size < 16, s"z-ordered layout should prune, kept ${kept.size}")
  }

  test("degenerate inputs: empty table writes empty and OPTIMIZE no-ops; all-null column rejects clearly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    val path = "target/storage/zorder_spec/empty"
    ZOrder.write(empty, Seq("x", "y"), path)
    assert(spark.read.parquet(path).count() == 0)
    ZOrder.optimize(spark, path, Seq("x", "y")) // must not throw
    ZOrder.writeEquiDepth(empty, Seq("x", "y"), path)
    assert(spark.read.parquet(path).count() == 0)
    val allNull = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long])).toDF("x", "y")
    val e = intercept[IllegalArgumentException](
      ZOrder.write(allNull, Seq("x", "y"), path + "2"))
    assert(e.getMessage.contains("entirely null"))
    // equi-depth must raise the SAME error for an all-null column on a
    // non-empty table (approxQuantile returns [] for both cases; only a
    // truly empty input is a legitimate silent plain write)
    val e2 = intercept[IllegalArgumentException](
      ZOrder.writeEquiDepth(allNull, Seq("x", "y"), path + "3"))
    assert(e2.getMessage.contains("entirely null"))
  }

  test("2-D range scan prunes z-ordered files; single-vector clustering reads everything") {
    val src = Tables.orders(spark, "/root/testdata/sf0.01")
    val n = 16
    val zPath = "target/storage/zorder_spec/orders_z16"
    val linPath = "target/storage/zorder_spec/orders_bykey"
    ZOrder.write(src, Seq("o_custkey", "o_totalprice"), zPath, bits = 8, numFiles = n)
    // the reference's one-sort-vector layout, on a column unrelated to
    // the predicate dimensions
    src.repartitionByRange(n, col("o_orderkey")).sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(linPath)

    def prunedCount(path: String): Int = {
      val idxC = s"$path-idxc"; val idxP = s"$path-idxp"
      CompactIndexIO.buildMinMax(spark, path, "o_custkey", idxC)
      CompactIndexIO.buildMinMax(spark, path, "o_totalprice", idxP)
      CompactIndexIO.prunedFilesRange(spark, idxC, Some(400L), Some(600L)).toSet
        .intersect(CompactIndexIO.prunedFilesRange(spark, idxP, Some(100000d), Some(200000d)).toSet)
        .size
    }
    val zFiles = prunedCount(zPath)
    val linFiles = prunedCount(linPath)
    assert(linFiles == n, s"orderkey-sorted layout should match every file, got $linFiles")
    assert(zFiles <= n / 2, s"z-order should prune most files, kept $zFiles of $n")

    // soundness: the pruned scan misses no qualifying row
    val pred = col("o_custkey").between(400L, 600L) &&
      col("o_totalprice").between(100000d, 200000d)
    val full = spark.read.parquet(zPath).filter(pred).count()
    val idxC = s"$zPath-idxc"
    val kept = CompactIndexIO.prunedFilesRange(spark, idxC, Some(400L), Some(600L))
    val viaIndex = spark.read.parquet(kept: _*).filter(pred).count()
    assert(viaIndex == full)
  }
}
