package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Mergeable sketch family — the pre-aggregation pattern the reference
  * reaches for with `compute_stats`'s FM-sketch NDV estimator
  * (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFComputeStats.java,
  * NumDistinctValueEstimator.java) and `approx_count_distinct`-style
  * rollups: build a small fixed-size summary per partition/day once,
  * store it, and answer distinct-count / heavy-hitter questions later by
  * MERGING summaries — never rescanning history. At 100 TB this is the
  * difference between a daily job that reads one day and one that reads
  * three years.
  *
  * Two summaries, both typed [[Aggregator]]s (map-side partials merge in
  * the combiner, exactly like the reference's UDAF partial2 mode):
  *
  *  - KMV (k-minimum-values) distinct sketch: keep the k smallest
  *    distinct 64-bit hashes; under-filled it IS the exact distinct set
  *    (the driver-gate path — same exact-when-fits contract as
  *    hive_percentile_approx/q211), overflowed the k-th value estimates
  *    NDV as (k-1)/theta with ~1/sqrt(k-2) relative error
  *    (Bar-Yossef et al. 2002; the Theta-sketch special case).
  *  - Misra-Gries heavy hitters: capacity-k counter map; exact when a
  *    group's distinct count never exceeds k, otherwise every item with
  *    frequency > n/(k+1) is guaranteed present and counts underestimate
  *    by at most n/(k+1) (Misra-Gries 1982; merge rule from Agarwal et
  *    al., "Mergeable Summaries", PODS 2012).
  *
  * Hashing rides Spark's codegen'd `xxhash64`; sketch payloads are plain
  * `array<bigint>` / `map<string,bigint>` columns (Tungsten-native, no
  * kryo blob in the stored partials), so sketch tables are ordinary
  * parquet that any later job can merge.
  */
object Sketches {

  /** Sign-flip so SIGNED ordering of the stored value equals UNSIGNED
    * ordering of the raw xxhash64 — "k smallest" then means smallest in
    * the uniform [0, 2^64) hash space, which is what the estimator needs. */
  @inline private def flip(h: Long): Long = h ^ Long.MinValue

  private def requireK(k: Int): Unit =
    require(k > 1, s"sketch size k must be > 1, got $k")

  /** KMV buffer: a java TreeSet (kryo round-trips java collections
    * class-faithfully; chill rebuilds scala sorted sets as HashSet,
    * which breaks the typed-buffer decode). */
  private type KmvBuf = java.util.TreeSet[java.lang.Long]

  /** Capped insert: keep the k smallest distinct values in the set. */
  private def kmvAdd(b: KmvBuf, v: Long, k: Int): KmvBuf = {
    if (b.size < k) b.add(v)
    else if (v < b.last && !b.contains(v)) { b.pollLast(); b.add(v) }
    b
  }

  private def kmvFinish(b: KmvBuf): Array[Long] = {
    val out = new Array[Long](b.size)
    var i = 0
    val it = b.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** KMV build: keep the k smallest distinct sign-flipped hashes. */
  class KmvAgg(k: Int) extends Aggregator[Long, KmvBuf, Array[Long]] {
    requireK(k)
    def zero: KmvBuf = new java.util.TreeSet[java.lang.Long]()
    def reduce(b: KmvBuf, h: Long): KmvBuf = kmvAdd(b, flip(h), k)
    def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      y.forEach(v => kmvAdd(x, v, k)); x
    }
    def finish(b: KmvBuf): Array[Long] = kmvFinish(b)
    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** KMV merge: combine stored sketches (array columns, values already
    * sign-flipped) into one. */
  class KmvMergeAgg(k: Int) extends Aggregator[Array[Long], KmvBuf, Array[Long]] {
    requireK(k)
    def zero: KmvBuf = new java.util.TreeSet[java.lang.Long]()
    def reduce(b: KmvBuf, a: Array[Long]): KmvBuf = {
      a.foreach(kmvAdd(b, _, k)); b
    }
    def merge(x: KmvBuf, y: KmvBuf): KmvBuf = {
      y.forEach(v => kmvAdd(x, v, k)); x
    }
    def finish(b: KmvBuf): Array[Long] = kmvFinish(b)
    def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** Aggregate a column into a KMV sketch (sorted `array<bigint>` of the
    * k smallest sign-flipped xxhash64 values). */
  def kmvSketch(c: Column, k: Int): Column =
    udaf(new KmvAgg(k)).apply(xxhash64(c))

  /** Merge a column of stored KMV sketches. */
  def kmvMerge(sketch: Column, k: Int): Column =
    udaf(new KmvMergeAgg(k)).apply(sketch)

  /** NDV estimate off a sketch column — pure built-in expressions
    * (codegen'd; no UDF): exact cardinality when under-filled, else
    * (k-1)/theta where theta is the k-th smallest hash as a fraction of
    * the hash space. */
  def kmvEstimate(sketch: Column, k: Int): Column = {
    requireK(k)
    val kth = element_at(sketch, k).cast("double") + 9.223372036854775808e18
    val theta = kth / 1.8446744073709551616e19
    when(size(sketch) < k, size(sketch).cast("long"))
      .otherwise(round(lit(k - 1) / theta).cast("long"))
  }

  /** Misra-Gries build: capacity-k counter map over string items. */
  class MgAgg(k: Int) extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
    requireK(k)
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[String, Long], item: String): mutable.HashMap[String, Long] = {
      b.get(item) match {
        case Some(c) => b.update(item, c + 1)
        case None if b.size < k => b.update(item, 1L)
        case None => // decrement-all: the classic MG step
          // iterate a snapshot — mutating a mutable.HashMap mid-foreach
          // (even value-only updates) can skip entries
          b.toArray.foreach { case (i, c) =>
            if (c == 1L) b.remove(i) else b.update(i, c - 1)
          }
      }
      b
    }
    def merge(x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
      mgCombine(x, y, k)
    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Misra-Gries merge of stored counter maps. */
  class MgMergeAgg(k: Int) extends Aggregator[Map[String, Long], mutable.HashMap[String, Long], Map[String, Long]] {
    requireK(k)
    def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[String, Long], m: Map[String, Long]): mutable.HashMap[String, Long] =
      mgCombine(b, m, k)
    def merge(x: mutable.HashMap[String, Long], y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
      mgCombine(x, y, k)
    def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap
    def bufferEncoder: Encoder[mutable.HashMap[String, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  /** Mergeable-summaries combine: add counters, then if over capacity
    * subtract the (k+1)-th largest count from all and drop the ≤0. */
  private def mgCombine(x: mutable.HashMap[String, Long], y: Iterable[(String, Long)],
                        k: Int): mutable.HashMap[String, Long] = {
    y.foreach { case (i, c) => x.update(i, x.getOrElse(i, 0L) + c) }
    if (x.size > k) {
      val cut = x.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      // iterate a snapshot — see the reduce-path comment
      x.toArray.foreach { case (i, c) =>
        if (c - cut <= 0L) x.remove(i) else x.update(i, c - cut)
      }
    }
    x
  }

  /** Aggregate a string column into a Misra-Gries counter map
    * (`map<string,bigint>`). */
  def mgSketch(c: Column, k: Int): Column =
    udaf(new MgAgg(k)).apply(c)

  /** Merge a column of stored Misra-Gries maps. */
  def mgMerge(sketch: Column, k: Int): Column =
    udaf(new MgMergeAgg(k)).apply(sketch)
}
