package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

/** Pins the mergeable-sketch contracts ([[graft.functions.Sketches]])
  * the oracle rows cannot: over-capacity error bounds, merge invariance
  * under arbitrary partitioning, and the Misra-Gries frequency
  * guarantees — the parts that carry the 100 TB story, where sketches
  * overflow by design.
  */
class SketchSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  /** Deterministic multiset: value i/3 for i in [0, 3n) — n distinct
    * values, each seen 3 times, spread over many partitions. */
  private def tripled(n: Int, parts: Int) =
    spark.range(0, 3L * n, 1, parts).select((col("id") / 3).cast("long").as("v"))

  test("KMV under-filled is the exact distinct set, invariant to partitioning") {
    val k = 1024
    for (parts <- Seq(1, 7, 32)) {
      val sk = tripled(500, parts)
        .agg(Sketches.kmvSketch(col("v"), k).as("sk"),
             Sketches.kmvEstimate(Sketches.kmvSketch(col("v"), k), k).as("est"))
        .collect()(0)
      assert(sk.getSeq[Long](0).length == 500, s"parts=$parts")
      assert(sk.getLong(1) == 500L, s"parts=$parts")
    }
  }

  test("KMV overflowed: k-min set is partition-invariant and the estimate is tight") {
    val k = 1024
    val n = 100000
    val sketches = Seq(3, 17).map { parts =>
      tripled(n, parts).agg(Sketches.kmvSketch(col("v"), k)).collect()(0).getSeq[Long](0)
    }
    // the k smallest hashes are a pure set property — partitioning cannot move them
    assert(sketches(0) == sketches(1))
    assert(sketches(0).length == k)
    val est = tripled(n, 17)
      .agg(Sketches.kmvEstimate(Sketches.kmvSketch(col("v"), k), k).as("e"))
      .collect()(0).getLong(0)
    // relative error ~1/sqrt(k-2) ≈ 3.1%; assert a 3-sigma-ish 10% band
    assert(math.abs(est.toDouble / n - 1.0) < 0.10, s"est=$est for ndv=$n")
  }

  test("KMV merge of stored partial sketches equals the direct sketch bit-for-bit") {
    val k = 256
    val df = tripled(20000, 13).withColumn("part", pmod(col("v"), lit(11)))
    val direct = df.agg(Sketches.kmvSketch(col("v"), k)).collect()(0).getSeq[Long](0)
    val merged = df.groupBy(col("part"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk"))
      .agg(Sketches.kmvMerge(col("sk"), k))
      .collect()(0).getSeq[Long](0)
    assert(direct == merged)
  }

  test("Misra-Gries is exact (and merge-stable) while distinct count fits the capacity") {
    val items = Seq.tabulate(600)(i => s"tok${i % 20}") // 20 distinct, skew-free
    for (parts <- Seq(1, 9)) {
      val got = items.toDF("t").repartition(parts)
        .agg(Sketches.mgSketch(col("t"), 64).as("hh"))
        .collect()(0).getMap[String, Long](0)
      assert(got.size == 20 && got.forall(_._2 == 30L), s"parts=$parts")
    }
  }

  test("Misra-Gries overflowed keeps every frequent item, undercounts by at most n/(k+1)") {
    val k = 8
    // heavy items h0..h3 (200 each) in a sea of 400 singletons: n = 1200
    val items = (0 until 4).flatMap(h => Seq.fill(200)(s"h$h")) ++
      (0 until 400).map(i => s"rare$i")
    val n = items.size
    val got = scala.util.Random.shuffle(items).toDF("t").repartition(5)
      .agg(Sketches.mgSketch(col("t"), k).as("hh"))
      .collect()(0).getMap[String, Long](0)
    assert(got.size <= k)
    for (h <- 0 until 4) {
      val key = s"h$h" // freq 200 > n/(k+1) ≈ 133 → guaranteed present
      assert(got.contains(key), s"$key missing from $got")
      assert(got(key) <= 200L && got(key) >= 200L - n / (k + 1), s"$key=${got.get(key)}")
    }
  }

  test("sketch capacity must exceed 1") {
    intercept[IllegalArgumentException](Sketches.kmvSketch(col("v"), 1))
    intercept[IllegalArgumentException](Sketches.mgSketch(col("v"), 0))
  }

  test("KMV pairwise union is bit-identical to re-aggregating; intersection is exact under-fill") {
    val k = 1024
    // A = [0, 600), B = [400, 1000): |A∩B| = 200, |A∪B| = 1000 < k
    val a = spark.range(0, 600, 1, 7).select(col("id").as("v"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk"))
    val b = spark.range(400, 1000, 1, 5).select(col("id").as("v"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk"))
    val both = spark.range(0, 1000, 1, 3).select(col("id").as("v"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk")).collect()(0).getSeq[Long](0)
    val row = a.crossJoin(b.select(col("sk").as("skb")))
      .select(Sketches.kmvUnionPair(col("sk"), col("skb"), k).as("u"),
              Sketches.kmvIntersectEstimate(col("sk"), col("skb"), k).as("i"))
      .collect()(0)
    assert(row.getSeq[Long](0) == both, "pairwise union != aggregated union")
    assert(row.getLong(1) == 200L)
  }

  test("KMV intersection estimate stays in the error band when overflowed") {
    val k = 1024
    val n = 60000 // |A| = |B| = 60k, overlap 20k, union 100k >> k
    val a = spark.range(0, n, 1, 9).select(col("id").as("v"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk"))
    val b = spark.range(n - 20000, 2 * n - 20000, 1, 9).select(col("id").as("v"))
      .agg(Sketches.kmvSketch(col("v"), k).as("sk"))
    val est = a.crossJoin(b.select(col("sk").as("skb")))
      .select(Sketches.kmvIntersectEstimate(col("sk"), col("skb"), k))
      .collect()(0).getLong(0)
    // three ±3.1%-band terms over counts up to 100k: allow ±15k absolute
    assert(math.abs(est - 20000L) < 15000L, s"intersection est=$est for truth=20000")
  }

  test("DDSketch quantiles are within alpha relative error of exact order statistics") {
    val alpha = 0.01
    val n = 50000
    // log-uniform-ish positive values, deterministic, many partitions
    val df = spark.range(1, n + 1, 1, 17)
      .select((exp(col("id").cast("double") / lit(n.toDouble) * 10d)).as("v"))
    val exact = df.orderBy(col("v")).collect().map(_.getDouble(0))
    val sk = df.agg(Sketches.ddSketch(col("v"), alpha).as("sk"))
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val est = sk.select(Sketches.ddQuantile(col("sk"), q, alpha)).collect()(0).getDouble(0)
      val truth = exact(math.ceil(q * n).toInt - 1)
      assert(math.abs(est / truth - 1d) <= alpha + 1e-12, s"q=$q est=$est truth=$truth")
    }
  }

  test("DDSketch merge of stored partials equals the direct sketch bit-for-bit") {
    val df = tripled(20000, 13)
      .select((col("v").cast("double") + 1d).as("x"), pmod(col("v"), lit(11)).as("part"))
    val direct = df.agg(Sketches.ddSketch(col("x"), 0.02).as("sk"))
      .collect()(0).getMap[Int, Long](0)
    val merged = df.groupBy(col("part"))
      .agg(Sketches.ddSketch(col("x"), 0.02).as("sk"))
      .agg(Sketches.ddMerge(col("sk")))
      .collect()(0).getMap[Int, Long](0)
    assert(direct == merged)
    assert(direct.values.sum == 60000L)
  }

  test("DDSketch: zeros live in the dedicated bin; low quantiles report exactly 0") {
    val df = spark.range(0, 1000, 1, 7)
      .select(when(col("id") < 300, 0d).otherwise(col("id").cast("double")).as("v"))
    val sk = df.agg(Sketches.ddSketch(col("v"), 0.01).as("sk"))
    val Seq(p10, p90) = Seq(0.1, 0.9).map(q =>
      sk.select(Sketches.ddQuantile(col("sk"), q, 0.01)).collect()(0).getDouble(0))
    assert(p10 == 0d)                      // rank 100 falls in the 300 zeros
    assert(math.abs(p90 / 900d - 1) <= 0.01) // upper tail unaffected
  }

  test("DDSketch collapse caps the bin count and preserves upper quantiles") {
    val maxBins = 32
    val df = spark.range(1, 100001, 1, 9).select(col("id").cast("double").as("v"))
    val sk = df.agg(Sketches.ddSketch(col("v"), 0.05, maxBins).as("sk"))
    val m = sk.collect()(0).getMap[Int, Long](0)
    assert(m.size <= maxBins)
    assert(m.values.sum == 100000L)        // collapse folds, never drops
    val p99 = sk.select(Sketches.ddQuantile(col("sk"), 0.99, 0.05)).collect()(0).getDouble(0)
    assert(math.abs(p99 / 99000d - 1) <= 0.05 + 1e-12) // upper quantile keeps its bound
  }

  test("DDSketch collapse never folds the zero bin: zeros still report exactly 0") {
    val maxBins = 16
    // 500 zeros + a wide log range that forces collapse
    val df = spark.range(0, 10500, 1, 5)
      .select(when(col("id") < 500, 0d).otherwise(exp(col("id").cast("double") / 500d)).as("v"))
    val sk = df.agg(Sketches.ddSketch(col("v"), 0.05, maxBins).as("sk"))
    val m = sk.collect()(0).getMap[Int, Long](0)
    assert(m.size <= maxBins)
    assert(m.getOrElse(Int.MinValue, 0L) == 500L,
      s"zero bin must survive collapse intact, got $m")
    val pLow = sk.select(Sketches.ddQuantile(col("sk"), 0.01, 0.05)).collect()(0).getDouble(0)
    assert(pLow == 0d, s"low quantile over zeros must be exactly 0, got $pLow")
  }

  test("DDSketch skips NULLs like percentile_approx (no phantom zero counts)") {
    val df = spark.range(0, 1000, 1, 4)
      .select(when(col("id") < 400, lit(null).cast("double"))
        .otherwise(col("id").cast("double")).as("v"))
    val m = df.agg(Sketches.ddSketch(col("v"), 0.01).as("sk"))
      .collect()(0).getMap[Int, Long](0)
    assert(m.values.sum == 600L, s"NULLs must not be counted, got ${m.values.sum}")
    assert(m.getOrElse(Int.MinValue, 0L) == 0L, "no NULL row may land in the zero bin")
  }

  test("DDSketch rejects negative inputs and bad alpha") {
    intercept[IllegalArgumentException](Sketches.ddSketch(col("v"), 0.01, maxBins = 1))
    intercept[IllegalArgumentException](Sketches.ddSketch(col("v"), 1.5))
    val thrown = intercept[Exception] {
      spark.range(1).select(lit(-1d).as("v"))
        .agg(Sketches.ddSketch(col("v"), 0.01)).collect()
    }
    assert(thrown.getMessage != null)
  }
}
