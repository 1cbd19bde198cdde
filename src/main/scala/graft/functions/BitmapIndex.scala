package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
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
  * The combinators `bitmapAnd`/`bitmapOr`/`bitmapEmpty`/`bitmapCount`
  * are pure built-in Catalyst expressions (map_zip_with / map_filter /
  * aggregate over the pair array) — no Scala UDF, no kryo round-trip:
  * the word merge runs on Tungsten array/map data directly, so routing
  * even a hot per-row path through them costs array traversal, not
  * serialization. (They were row-at-a-time kryo UDFs through round 4;
  * LongTailSpec pins value-equality with that original semantics.)
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

  import org.apache.spark.sql.functions._

  /** (wordIndex -> word) map view of the alternating-pair array. The
    * size==0 guard matters: sequence(1, 0) would count DOWN. */
  private def toMap(a: Column): Column =
    when(size(a) < 2,
         map_from_arrays(array().cast("array<bigint>"), array().cast("array<bigint>")))
      .otherwise(map_from_entries(transform(
        sequence(lit(1), (size(a) / 2).cast("int")),
        i => struct(element_at(a, i * 2 - 1), element_at(a, i * 2)))))

  /** Back to the canonical sorted alternating-pair array. */
  private def fromMap(m: Column): Column =
    flatten(transform(array_sort(map_entries(m)),
      e => array(e.getField("key"), e.getField("value"))))

  /** ewah_bitmap_and analog: intersect word maps, drop zero words. */
  def bitmapAnd(a: Column, b: Column): Column =
    fromMap(map_filter(
      map_zip_with(toMap(a), toMap(b), (_, x, y) =>
        coalesce(x, lit(0L)).bitwiseAND(coalesce(y, lit(0L)))),
      (_, v) => v =!= 0))

  /** ewah_bitmap_or analog: union word maps (zero words cannot arise —
    * both inputs elide them and OR preserves set bits). */
  def bitmapOr(a: Column, b: Column): Column =
    fromMap(map_zip_with(toMap(a), toMap(b), (_, x, y) =>
      coalesce(x, lit(0L)).bitwiseOR(coalesce(y, lit(0L)))))

  /** ewah_bitmap_empty analog: true iff no bit is set. */
  def bitmapEmpty(a: Column): Column = size(a) === 0

  /** Bit cardinality (the reference reads it off the bitmap for index
    * lookups; exposed directly here). */
  def bitmapCount(a: Column): Column =
    aggregate(map_values(toMap(a)), lit(0L),
      (acc, w) => acc + bit_count(w).cast("long"))
}
