package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Hive's percentile_approx algorithm — the streaming fixed-size histogram
  * of Ben-Haim & Tom-Tov (JMLR 11, 2010) that backs the reference's
  * GenericUDAFPercentileApprox (ql/src/java/org/apache/hadoop/hive/ql/udf/
  * generic/GenericUDAFPercentileApprox.java:66, NumericHistogram at
  * :356-369), reimplemented from the published algorithm as a Spark
  * [[TypedImperativeAggregate]].
  *
  * Contract (same as the reference):
  *  - at most `maxBins` (centroid, weight) bins, kept sorted by centroid;
  *  - adding a point inserts a unit bin, then merges the two CLOSEST bins
  *    (weighted-mean centroid, summed weight) when over capacity;
  *  - partial merge concatenates bin lists (linear merge of two sorted
  *    lists), then batch-trims the combined list down to maxBins —
  *    associative up to the algorithm's inherent order sensitivity,
  *    deterministic for a fixed partitioning. Equal centroids from
  *    different partitions are kept as separate bins under budget,
  *    exactly like the reference's merge (quantiles are unaffected);
  *  - trim ties break LEFTMOST — the one deliberate divergence from the
  *    reference, which breaks ties with a PRNG (NumericHistogram.java:232);
  *    a deterministic estimator reproduces bit-for-bit across retries;
  *  - quantile(q) walks cumulative weights and linearly interpolates
  *    between neighboring centroids inside the crossing bin;
  *  - when the number of distinct inputs never exceeds maxBins, no merge
  *    ever fires and the histogram is EXACT (pinned in the spec).
  *
  * Unlike Spark's built-in percentile_approx (Greenwald-Khanna), this
  * reproduces the reference's estimator family, retiring the 10%-tolerance
  * spec the builtin needed.
  */
final class StreamingHistogram(val maxBins: Int) extends Serializable {

  // the reference rejects non-positive B up front
  // (GenericUDAFHistogramNumeric "must be >= 2"); without this,
  // maxBins=0 would ArrayIndexOutOfBounds deep inside trim() on an
  // executor instead of failing the query with a readable message
  require(maxBins >= 2, s"histogram needs at least 2 bins, got $maxBins")
  // parallel arrays sorted by x; one spare slot so insert-then-trim
  // never reallocates
  private[graft] var n = 0
  private[graft] val xs = new Array[Double](maxBins + 1)
  private[graft] val ys = new Array[Double](maxBins + 1)

  private def insertAt(i: Int, x: Double, y: Double): Unit = {
    System.arraycopy(xs, i, xs, i + 1, n - i)
    System.arraycopy(ys, i, ys, i + 1, n - i)
    xs(i) = x; ys(i) = y; n += 1
  }

  private def lowerBound(v: Double): Int = {
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (xs(mid) < v) lo = mid + 1 else hi = mid
    }
    lo
  }

  def add(v: Double, w: Double = 1.0): Unit = {
    val i = lowerBound(v)
    if (i < n && xs(i) == v) ys(i) += w
    else { insertAt(i, v, w); if (n > maxBins) trim() }
  }

  /** Merge the two closest bins (weighted mean, summed weight). */
  private def trim(): Unit = {
    var best = 0; var bestGap = Double.MaxValue
    var i = 0
    while (i < n - 1) {
      val gap = xs(i + 1) - xs(i)
      if (gap < bestGap) { bestGap = gap; best = i }
      i += 1
    }
    val w = ys(best) + ys(best + 1)
    // the reference's exact fp sequence (NumericHistogram.java:245-249:
    // x *= y/d; x += x2/d*y2) — the algebraically-equal
    // (x·y + x2·y2)/d rounds differently in the last ulp
    xs(best) = xs(best) * (ys(best) / w)
    xs(best) += xs(best + 1) / w * ys(best + 1)
    ys(best) = w
    System.arraycopy(xs, best + 2, xs, best + 1, n - best - 2)
    System.arraycopy(ys, best + 2, ys, best + 1, n - best - 2)
    n -= 1
  }

  /** Partial merge, the reference's way (NumericHistogram.merge,
    * GenericUDAFPercentileApprox.java:356-369 / Ben-Haim & Tom-Tov
    * Algorithm 2): CONCATENATE both bin lists (both already sorted, so a
    * linear merge), then batch-trim the combined 2N-bin list down to
    * maxBins by repeatedly merging the closest pair. Incremental
    * insert+trim-per-bin would pick different closest pairs mid-stream
    * and diverge from the reference estimator on multi-partition input.
    * Equal centroids are NOT pre-coalesced: they form zero-width gaps the
    * trim loop merges first, exactly like the reference. */
  def mergeWith(o: StreamingHistogram): StreamingHistogram = {
    if (o.n == 0) return this
    val m = n + o.n
    val mx = new Array[Double](m)
    val my = new Array[Double](m)
    var i = 0; var j = 0; var k = 0
    while (i < n || j < o.n) {
      val takeThis = j >= o.n || (i < n && xs(i) <= o.xs(j))
      if (takeThis) { mx(k) = xs(i); my(k) = ys(i); i += 1 }
      else { mx(k) = o.xs(j); my(k) = o.ys(j); j += 1 }
      k += 1
    }
    var nn = k
    while (nn > maxBins) {
      var best = 0; var bestGap = Double.MaxValue
      var t = 0
      while (t < nn - 1) {
        val gap = mx(t + 1) - mx(t)
        if (gap < bestGap) { bestGap = gap; best = t }
        t += 1
      }
      val w = my(best) + my(best + 1)
      mx(best) = (mx(best) * my(best) + mx(best + 1) * my(best + 1)) / w
      my(best) = w
      System.arraycopy(mx, best + 2, mx, best + 1, nn - best - 2)
      System.arraycopy(my, best + 2, my, best + 1, nn - best - 2)
      nn -= 1
    }
    System.arraycopy(mx, 0, xs, 0, nn)
    System.arraycopy(my, 0, ys, 0, nn)
    n = nn
    this
  }

  def quantile(q: Double): Double = {
    if (n == 0) return Double.NaN
    var sum = 0.0
    var i = 0
    while (i < n) { sum += ys(i); i += 1 }
    var csum = 0.0
    var b = 0
    while (b < n) {
      csum += ys(b)
      if (csum / sum >= q) {
        if (b == 0) return xs(0)
        csum -= ys(b)
        return xs(b - 1) + (q * sum - csum) * (xs(b) - xs(b - 1)) / ys(b)
      }
      b += 1
    }
    xs(n - 1)
  }

  def serialize(): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 16 * n)
    buf.putInt(maxBins).putInt(n)
    var i = 0
    while (i < n) { buf.putDouble(xs(i)).putDouble(ys(i)); i += 1 }
    buf.array()
  }
}

object StreamingHistogram {
  def deserialize(bytes: Array[Byte]): StreamingHistogram = {
    val buf = ByteBuffer.wrap(bytes)
    val h = new StreamingHistogram(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { h.xs(i) = buf.getDouble(); h.ys(i) = buf.getDouble(); h.n += 1; i += 1 }
    h
  }
}

/** `hive_percentile_approx(col, q, maxBins)` aggregate expression. */
case class HivePercentileApprox(
    child: Expression,
    percentage: Expression,
    nBins: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StreamingHistogram] {

  private def toDouble(v: Any): Double = v match {
    case x: org.apache.spark.sql.types.Decimal => x.toDouble
    case d: java.lang.Number => d.doubleValue()
  }

  // scalar OR array-of-percentiles form (GenericUDAFPercentileApprox
  // accepts both; the array form returns one quantile per entry, all
  // read from the SAME histogram)
  private lazy val qs: Seq[Double] = percentage.eval() match {
    case a: org.apache.spark.sql.catalyst.util.ArrayData =>
      a.toDoubleArray().toIndexedSeq
    case v => Seq(toDouble(v))
  }
  private lazy val arrayForm: Boolean =
    percentage.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]
  private lazy val bins: Int = toDouble(nBins.eval()).toInt

  override def children: Seq[Expression] = Seq(child, percentage, nBins)
  override def nullable: Boolean = true
  override def dataType: DataType =
    if (arrayForm) org.apache.spark.sql.types.ArrayType(DoubleType) else DoubleType
  override def prettyName: String = "hive_percentile_approx"

  override def createAggregationBuffer(): StreamingHistogram = new StreamingHistogram(bins)

  override def update(buffer: StreamingHistogram, input: InternalRow): StreamingHistogram = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v))
    buffer
  }

  override def merge(buffer: StreamingHistogram, other: StreamingHistogram): StreamingHistogram =
    buffer.mergeWith(other)

  override def eval(buffer: StreamingHistogram): Any = {
    if (arrayForm) {
      val rs = qs.map(buffer.quantile)
      if (rs.exists(_.isNaN)) null
      else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(rs.toArray)
    } else {
      val r = buffer.quantile(qs.head)
      if (r.isNaN) null else r
    }
  }

  override def serialize(buffer: StreamingHistogram): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): StreamingHistogram =
    StreamingHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HivePercentileApprox =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HivePercentileApprox =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HivePercentileApprox =
    copy(child = newChildren(0), percentage = newChildren(1), nBins = newChildren(2))
}

object HivePercentileApprox {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hive_percentile_approx",
      es => HivePercentileApprox(es(0), es(1), es(2)), "scala_udf")

  def hive_percentile_approx(c: Column, q: Double, maxBins: Int): Column =
    call_function("hive_percentile_approx", c, lit(q), lit(maxBins))
}

object HiveHistogramNumeric {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hive_histogram_numeric",
      es => HiveHistogramNumeric(es(0), es(1)), "scala_udf")
}

/** `hive_histogram_numeric(col, nBins)` — the reference's
  * histogram_numeric (udf/generic/GenericUDAFHistogramNumeric.java):
  * same NumericHistogram buffer as percentile_approx, emitted as the
  * array of (x, y) centroid/weight bins instead of a quantile. Exact
  * (one bin per value) whenever distinct inputs fit in the budget. */
case class HiveHistogramNumeric(
    child: Expression,
    nBins: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StreamingHistogram] {

  private def toDouble(v: Any): Double = v match {
    case x: org.apache.spark.sql.types.Decimal => x.toDouble
    case d: java.lang.Number => d.doubleValue()
  }
  private lazy val bins: Int = toDouble(nBins.eval()).toInt

  override def children: Seq[Expression] = Seq(child, nBins)
  override def nullable: Boolean = true
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    new org.apache.spark.sql.types.StructType()
      .add("x", DoubleType).add("y", DoubleType))
  override def prettyName: String = "hive_histogram_numeric"

  override def createAggregationBuffer(): StreamingHistogram = new StreamingHistogram(bins)

  override def update(buffer: StreamingHistogram, input: InternalRow): StreamingHistogram = {
    val v = child.eval(input)
    if (v != null) buffer.add(toDouble(v))
    buffer
  }

  override def merge(buffer: StreamingHistogram, other: StreamingHistogram): StreamingHistogram =
    buffer.mergeWith(other)

  override def eval(buffer: StreamingHistogram): Any = {
    if (buffer.n == 0) null
    else org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      (0 until buffer.n).map(i =>
        InternalRow(buffer.xs(i), buffer.ys(i))).toArray[Any])
  }

  override def serialize(buffer: StreamingHistogram): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): StreamingHistogram =
    StreamingHistogram.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HiveHistogramNumeric =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HiveHistogramNumeric =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HiveHistogramNumeric =
    copy(child = newChildren(0), nBins = newChildren(1))
}
