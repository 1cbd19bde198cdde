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
}
