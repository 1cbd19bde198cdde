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
  * Three summaries, all typed [[Aggregator]]s (map-side partials merge
  * in the combiner, exactly like the reference's UDAF partial2 mode):
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
  *  - DDSketch quantiles: fixed log-binned counter map with relative-
  *    error guarantee alpha and counter-addition merge (order-invariant,
  *    bit-exact under any partitioning) — see the section comment below.
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

  /** Pairwise union of two STORED KMV sketches as pure built-in
    * expressions: k smallest distinct hashes of the concatenation.
    * Stored values are sign-flipped (see [[flip]]), so signed
    * `array_sort` IS unsigned hash order and the slice keeps the true
    * k-minimum set — bit-identical to aggregating both inputs together. */
  def kmvUnionPair(a: Column, b: Column, k: Int): Column = {
    requireK(k)
    slice(array_sort(array_distinct(concat(a, b))), 1, k)
  }

  /** Intersection NDV of two stored sketches by inclusion-exclusion:
    * |A∩B| = est(A) + est(B) - est(A∪B). The segment-overlap question
    * ("how many users appear in BOTH sources?") answered from two
    * 32 KB summaries — no rescan, no join. Exact while |A∪B| < k;
    * overflowed, the error is the KMV band on each term (the
    * theta-sketch intersection of Dasgupta et al., "Theta Sketch
    * Framework", 2016, in its simplest inclusion-exclusion form).
    * Floored at 0: inclusion-exclusion of three estimates can land
    * slightly negative on near-disjoint sets. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column =
    greatest(lit(0L),
      kmvEstimate(a, k) + kmvEstimate(b, k) - kmvEstimate(kmvUnionPair(a, b, k), k))

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

  // --- DDSketch: mergeable quantiles with relative-error guarantee ----
  //
  // The third member of the mergeable-summary family (KMV = distinct,
  // Misra-Gries = heavy hitters, DDSketch = quantiles) — the reference's
  // percentile_approx (GenericUDAFPercentileApprox + NumericHistogram,
  // covered exactly by functions/NumericHistogram) answers the same
  // question but its bin boundaries depend on arrival order, so two
  // executors' partials merge to DIFFERENT bins than a single pass and
  // the result is not reproducible under re-partitioning. DDSketch
  // ("DDSketch: A Fast and Fully-Mergeable Quantile Sketch with
  // Relative-Error Guarantees", Masson/Rim/Lee, VLDB 2019) fixes the
  // bins up front: bucket i holds values in (gamma^(i-1), gamma^i] with
  // gamma = (1+alpha)/(1-alpha), so any value is off by at most alpha
  // relative error from its bucket representative 2*gamma^i/(gamma+1),
  // and a sketch is just a bin->count map whose merge is counter
  // ADDITION — commutative, associative, and bit-identical under any
  // partitioning or merge order. That order-invariance is what makes the
  // fleet rollup deterministic (and lets the DuckDB oracle replay the
  // whole computation hash-exactly at ANY scale — no under-fill crutch).
  //
  // State bound: bin indices are confined to |i| <= ln(maxDouble)/
  // ln(gamma) (~35k at alpha=0.01) and in practice to the data's dynamic
  // range (a price column spanning 1e2..1e5 at alpha=0.01 is ~350 bins,
  // ~6 KB). `maxBins` caps pathological ranges by collapsing the LOWEST
  // bins into one (the paper's collapsing variant: upper quantiles — the
  // ones SLOs care about — keep their guarantee). Collapse happens only
  // at finish, never mid-merge, so partial buffers stay order-invariant.

  /** Non-negative doubles only; zeros live in a dedicated bin below
    * every log bin so they sort first in quantile walks. */
  private[graft] val ZeroBin: Int = Int.MinValue

  private[graft] def ddBin(v: Double, lnGamma: Double): Int = {
    require(v >= 0 && !v.isNaN, s"ddsketch requires non-negative values, got $v")
    if (v == 0d) ZeroBin else math.ceil(math.log(v) / lnGamma).toInt
  }

  private def ddCollapse(b: mutable.HashMap[Int, Long], maxBins: Int): Map[Int, Long] =
    if (b.size <= maxBins) b.toMap
    else {
      // The dedicated zero bin NEVER collapses into a log bin: zeros must
      // keep representative 0 (the ddQuantile contract), so only the
      // lowest LOG bins fold into the lowest kept log bin. The zero bin
      // occupies one slot of the budget when present.
      val logKeys = b.keys.filter(_ != ZeroBin).toArray.sorted
      val budget = math.max(1, maxBins - (if (b.contains(ZeroBin)) 1 else 0))
      if (logKeys.length <= budget) b.toMap
      else {
        val drop = logKeys.take(logKeys.length - budget)
        val floor = logKeys(logKeys.length - budget)
        val folded = drop.map(b(_)).sum
        b.update(floor, b(floor) + folded)
        drop.foreach(b.remove)
        b.toMap
      }
    }

  /** DDSketch build: log-binned counter map over a double column.
    * Input is Option[Double] (nullable-double encoder) so NULLs are
    * SKIPPED like percentile_approx skips them — a primitive Double
    * input would silently decode NULL as 0.0 and count it in the zero
    * bin, shifting every quantile on columns with NULLs. */
  class DdAgg(alpha: Double, maxBins: Int)
      extends Aggregator[Option[Double], mutable.HashMap[Int, Long], Map[Int, Long]] {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    // >= 2: at 1 the dedicated zero bin plus one log bin could not both
    // be represented and the cap contract would be violated
    require(maxBins >= 2, s"maxBins >= 2, got $maxBins")
    private val lnGamma = math.log((1 + alpha) / (1 - alpha))
    def zero: mutable.HashMap[Int, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[Int, Long], v: Option[Double]): mutable.HashMap[Int, Long] =
      v match {
        case None => b
        case Some(x) =>
          val i = ddBin(x, lnGamma)
          b.update(i, b.getOrElse(i, 0L) + 1L); b
      }
    def merge(x: mutable.HashMap[Int, Long], y: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
      y.foreach { case (i, c) => x.update(i, x.getOrElse(i, 0L) + c) }; x
    }
    def finish(b: mutable.HashMap[Int, Long]): Map[Int, Long] = ddCollapse(b, maxBins)
    def bufferEncoder: Encoder[mutable.HashMap[Int, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder()
  }

  /** Merge of stored DDSketch maps (counter addition + final collapse). */
  class DdMergeAgg(maxBins: Int)
      extends Aggregator[Map[Int, Long], mutable.HashMap[Int, Long], Map[Int, Long]] {
    require(maxBins >= 2, s"maxBins >= 2, got $maxBins")
    def zero: mutable.HashMap[Int, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[Int, Long], m: Map[Int, Long]): mutable.HashMap[Int, Long] = {
      m.foreach { case (i, c) => b.update(i, b.getOrElse(i, 0L) + c) }; b
    }
    def merge(x: mutable.HashMap[Int, Long], y: mutable.HashMap[Int, Long]): mutable.HashMap[Int, Long] = {
      y.foreach { case (i, c) => x.update(i, x.getOrElse(i, 0L) + c) }; x
    }
    def finish(b: mutable.HashMap[Int, Long]): Map[Int, Long] = ddCollapse(b, maxBins)
    def bufferEncoder: Encoder[mutable.HashMap[Int, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Map[Int, Long]] = ExpressionEncoder()
  }

  /** Aggregate a double column into a DDSketch (`map<int,bigint>`). */
  def ddSketch(c: Column, alpha: Double, maxBins: Int = 4096): Column =
    udaf(new DdAgg(alpha, maxBins)).apply(c.cast("double"))

  /** Merge a column of stored DDSketches. */
  def ddMerge(sketch: Column, maxBins: Int = 4096): Column =
    udaf(new DdMergeAgg(maxBins)).apply(sketch)

  /** Quantile estimate off a sketch column — pure built-in expressions
    * (post-aggregation, one row per group): nearest-rank r = ceil(q*n),
    * walk bins ascending to the first with cum >= r, report the bucket
    * representative 2*gamma^i/(gamma+1) (0 for the zero bin). */
  def ddQuantile(sketch: Column, q: Double, alpha: Double): Column = {
    require(q > 0 && q <= 1, s"q in (0,1], got $q")
    val gamma = (1 + alpha) / (1 - alpha)
    val n = aggregate(map_values(sketch), lit(0L), (acc, c) => acc + c)
    val r = ceil(n.cast("double") * lit(q)).cast("long")
    // entries sorted by bin key; fold carries (cum, found-bin)
    val entries = array_sort(map_entries(sketch))
    val zeroAcc = struct(lit(0L).as("cum"), lit(null).cast("int").as("bin"))
    val walked = aggregate(entries, zeroAcc, (acc, e) => {
      val cum = acc.getField("cum") + e.getField("value")
      val hit = acc.getField("bin").isNull && (cum >= r)
      struct(cum.as("cum"),
             when(hit, e.getField("key")).otherwise(acc.getField("bin")).as("bin"))
    })
    val bin = walked.getField("bin")
    when(bin === lit(ZeroBin), lit(0d))
      .otherwise(lit(2d) * pow(lit(gamma), bin.cast("double")) / lit(gamma + 1))
  }
}
