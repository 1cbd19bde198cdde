package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{HivePercentileApprox, StreamingHistogram}

/** Pins the NumericHistogram percentile_approx (the reference's
  * GenericUDAFPercentileApprox algorithm) — exactness when distinct
  * values fit in the bin budget, bounded error + determinism when
  * merging fires, and null handling. Retires the 10%-tolerance check
  * the Greenwald-Khanna builtin needed. */
class HistogramSpec extends AnyFunSuite {
  import TestSession._

  private def pa(dfExpr: String): Double = {
    import spark.implicits._
    HivePercentileApprox.register(spark)
    spark.sql(dfExpr).collect()(0).getDouble(0)
  }

  test("exact interpolated quantiles when distinct values fit in bins") {
    HivePercentileApprox.register(spark)
    import spark.implicits._
    val df = (1 to 100).toDF("v").repartition(8)
    df.createOrReplaceTempView("hist_small")
    val r50 = pa("SELECT hive_percentile_approx(v, 0.5, 200) FROM hist_small")
    val r25 = pa("SELECT hive_percentile_approx(v, 0.25, 200) FROM hist_small")
    val r100 = pa("SELECT hive_percentile_approx(v, 1.0, 200) FROM hist_small")
    assert(r50 == 50.0, s"p50=$r50")
    assert(r25 == 25.0, s"p25=$r25")
    assert(r100 == 100.0, s"p100=$r100")
  }

  test("bounded error and run-to-run determinism once bins merge") {
    HivePercentileApprox.register(spark)
    import spark.implicits._
    val vals = (0 until 10000).map(i => (i.toLong * 37 % 10000).toDouble)
    val df = vals.toDF("v").repartition(4)
    df.createOrReplaceTempView("hist_big")
    val a = pa("SELECT hive_percentile_approx(v, 0.9, 64) FROM hist_big")
    val b = pa("SELECT hive_percentile_approx(v, 0.9, 64) FROM hist_big")
    assert(a == b, "same data + partitioning must reproduce bit-identically")
    assert(math.abs(a - 9000.0) / 10000.0 < 0.02, s"p90=$a too far from exact 9000")
  }

  test("nulls are ignored; all-null input yields NULL") {
    HivePercentileApprox.register(spark)
    import spark.implicits._
    Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("v")
      .createOrReplaceTempView("hist_nulls")
    // bins (1,1),(3,1): csum/sum crosses 0.5 already in bin 0 -> 1.0
    // (the algorithm's early-return contract for the first bin)
    assert(pa("SELECT hive_percentile_approx(v, 0.5, 10) FROM hist_nulls") == 1.0)
    assert(pa("SELECT hive_percentile_approx(v, 0.75, 10) FROM hist_nulls") == 2.0)
    val r = spark.sql(
      "SELECT hive_percentile_approx(v, 0.5, 10) FROM hist_nulls WHERE v IS NULL")
      .collect()(0)
    assert(r.isNullAt(0))
  }

  test("hive_histogram_numeric emits exact (x, y) bins when values fit") {
    graft.functions.HiveHistogramNumeric.register(spark)
    import spark.implicits._
    // single partition: add() coalesces equal values -> one bin per value
    Seq(1.0, 1.0, 2.0, 3.0, 3.0, 3.0).toDF("v").coalesce(1)
      .createOrReplaceTempView("hist_hn")
    val bins = spark.sql("SELECT hive_histogram_numeric(v, 10) FROM hist_hn")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(bins == Seq((1.0, 2.0), (2.0, 1.0), (3.0, 3.0)))
    // multi-partition: the reference's merge (concat + sort, NO coalescing
    // of equal centroids under budget) may keep per-partition duplicate-x
    // bins — mass and quantiles stay exact, bins stay sorted
    Seq(1.0, 1.0, 2.0, 3.0, 3.0, 3.0).toDF("v").repartition(6)
      .createOrReplaceTempView("hist_hn_mp")
    val mp = spark.sql("SELECT hive_histogram_numeric(v, 10) FROM hist_hn_mp")
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(mp.map(_._2).sum == 6.0, s"mass not conserved: $mp")
    assert(mp.map(_._1) == mp.map(_._1).sorted, s"bins unsorted: $mp")
    assert(mp.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap ==
      Map(1.0 -> 2.0, 2.0 -> 1.0, 3.0 -> 3.0), s"per-value mass wrong: $mp")
  }

  test("partial merge is concat+sort+batch-trim, not incremental insert") {
    val h1 = new StreamingHistogram(2)
    Seq(0.0, 10.0).foreach(v => h1.add(v))
    val h2 = new StreamingHistogram(2)
    Seq(6.0, 7.0).foreach(v => h2.add(v))
    h1.mergeWith(h2)
    // batch (reference): [0,6,7,10] -> closest (6,7)=6.5 -> (6.5,10)=23/3.
    // incremental insert-per-bin would trim mid-stream: add 6 -> merge
    // (6,10)=8, add 7 -> merge (7,8)=7.5 — a different estimator.
    assert(h1.n == 2, s"n=${h1.n}")
    assert(h1.xs(0) == 0.0 && h1.ys(0) == 1.0)
    assert(h1.xs(1) == (6.5 * 2 + 10.0) / 3 && h1.ys(1) == 3.0,
      s"got (${h1.xs(1)}, ${h1.ys(1)})")
  }

  test("histogram core: closest-bin merging keeps mass and order") {
    val h = new StreamingHistogram(3)
    Seq(1.0, 100.0, 2.0, 101.0, 50.0).foreach(v => h.add(v))
    // 5 inserts into 3 bins: closest pairs (1,2) and (100,101) merge
    assert(h.n == 3)
    assert(h.quantile(0.0) == 1.5) // merged (1,2) centroid
    val ser = StreamingHistogram.deserialize(h.serialize())
    assert(ser.quantile(0.5) == h.quantile(0.5))
  }
}
