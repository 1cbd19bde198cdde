package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** The reference's bitmap-index function family
  * (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDAFEWAHBitmap.java,
  * UDFEWAHBitmapAnd/Or/Empty.java): `ewah_bitmap` aggregates row offsets
  * into a compressed bitmap; and/or/empty combine and test them.
  *
  * Spark-first re-expression: the bitmap is a sparse word-aligned encoding
  * — a sorted `Array[Long]` of alternating (wordIndex, word) pairs with
  * zero words elided, the same all-words-or-nothing compression idea EWAH
  * uses, in a codegen-friendly array column. The aggregate is a typed
  * [[Aggregator]] (map-side partial maps merge by OR, exactly how the
  * reference's UDAF merges partial bitmaps per
  * GenericUDAFEWAHBitmap.java:141-160), so each group's bitmap is built
  * distributed with no row shuffle beyond the group-by itself.
  *
  * CONTRACT — combinator granularity: `bitmapAnd`/`bitmapOr`/
  * `bitmapEmpty`/`bitmapCount` are Scala UDFs evaluated once per ROW of
  * already-aggregated bitmaps, the reference's own usage shape (one
  * bitmap per index key; set algebra over a handful of lanes, as in
  * q169). That row count is the number of GROUPS, typically thousandsfold
  * smaller than the corpus, so per-call serialization is noise there. Do
  * NOT route per-event hot paths through these combinators — aggregate
  * first with [[bitmapAgg]] (codegen'd input side, map-side partials),
  * then combine the per-group results; a future native Expression upgrade
  * would only matter if a caller violates this.
  */
object BitmapIndex {

  /** Sparse bitmap aggregate over non-negative long offsets. */
  class BitmapAgg extends Aggregator[Long, mutable.HashMap[Long, Long], Array[Long]] {
    def zero: mutable.HashMap[Long, Long] = mutable.HashMap.empty
    def reduce(b: mutable.HashMap[Long, Long], a: Long): mutable.HashMap[Long, Long] = {
      val wi = a >>> 6
      b.update(wi, b.getOrElse(wi, 0L) | (1L << (a & 63)))
      b
    }
    def merge(x: mutable.HashMap[Long, Long], y: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
      y.foreach { case (i, w) => x.update(i, x.getOrElse(i, 0L) | w) }
      x
    }
    def finish(b: mutable.HashMap[Long, Long]): Array[Long] =
      b.iterator.filter(_._2 != 0).toArray.sortBy(_._1)
        .flatMap { case (i, w) => Array(i, w) }
    def bufferEncoder: Encoder[mutable.HashMap[Long, Long]] = Encoders.kryo
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  /** ewah_bitmap analog: aggregate a long column into a sparse bitmap. */
  def bitmapAgg(c: Column): Column =
    org.apache.spark.sql.functions.udaf(new BitmapAgg).apply(c)

  private def pairs(a: Seq[Long]): Iterator[(Long, Long)] =
    a.grouped(2).map(p => (p(0), p(1)))

  /** ewah_bitmap_and analog. */
  val bitmapAnd = udf { (a: Seq[Long], b: Seq[Long]) =>
    val mb = pairs(b).toMap
    pairs(a).flatMap { case (i, w) =>
      val m = w & mb.getOrElse(i, 0L)
      if (m != 0) Seq(i, m) else Nil
    }.toSeq
  }

  /** ewah_bitmap_or analog. */
  val bitmapOr = udf { (a: Seq[Long], b: Seq[Long]) =>
    val m = mutable.HashMap(pairs(a).toSeq: _*)
    pairs(b).foreach { case (i, w) => m.update(i, m.getOrElse(i, 0L) | w) }
    m.iterator.toSeq.sortBy(_._1).flatMap { case (i, w) => Seq(i, w) }
  }

  /** ewah_bitmap_empty analog: true iff no bit is set. */
  val bitmapEmpty = udf { (a: Seq[Long]) => a.isEmpty }

  /** Bit cardinality (the reference reads it off the bitmap for index
    * lookups; exposed directly here). */
  val bitmapCount = udf { (a: Seq[Long]) =>
    pairs(a).map { case (_, w) => java.lang.Long.bitCount(w).toLong }.sum
  }
}
