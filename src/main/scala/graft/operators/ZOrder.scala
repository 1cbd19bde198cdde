package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the data-layout half
  * of the pruning stack whose read half is the zone-map index
  * (sources/CompactIndexIO.buildMinMax + plans/IndexRoute).
  *
  * The reference can physically cluster on ONE sort vector per table
  * (`CLUSTERED BY ... SORTED BY`, ql/.../parse/HiveParser.g's
  * tableBuckets clause): range predicates on the leading sort column
  * prune splits, predicates on any other column read everything. A
  * training-data warehouse filters fact tables on several independent
  * dimensions at once (customer AND price band, date AND quality
  * score), and at 100 TB the difference between "prune on one column"
  * and "prune on all of them" is the whole scan bill. Z-ordering fixes
  * the layout, not the reader: quantize each clustering column to a
  * `bits`-bit rank, interleave the rank bits into a single Morton code
  * (Morton 1966 — the standard multi-dim clustering key in modern
  * lakehouse formats), range-partition + sort the write by that code,
  * and every dimension's values become locally clustered in EVERY file,
  * so the per-file min/max zones the index already collects turn
  * multi-column conjunctions into multi-column file pruning.
  *
  * Scale design: the only non-scan work is the per-column (min, max)
  * bounds — a 1-row aggregate (metadata-scale driver read, same
  * contract as PipelineOps' bounds collect) — and the z-column itself
  * is pure codegen'd bitwise arithmetic (no UDF, no shuffle beyond the
  * one range-exchange the rewrite IS). Quantization uses linear
  * min/max scaling: ranks need only be monotone per dimension for
  * clustering to work; heavy skew costs rank resolution, not
  * correctness (an equi-depth variant would swap `linearRank` for a
  * boundary search — same interleave, same writer).
  */
object ZOrder {

  /** Spread the low `bits` bits of v so consecutive bits land `dims`
    * apart, starting at bit `offset` — built-in shift/mask Columns only,
    * so the whole Morton code stays inside whole-stage codegen. */
  private def spreadBits(v: Column, bits: Int, dims: Int, offset: Int): Column =
    (0 until bits)
      .map(i => shiftleft(shiftrightunsigned(v, i).bitwiseAND(lit(1L)), i * dims + offset))
      .reduce(_ bitwiseOR _)

  /** Monotone linear rank of c in [0, 2^bits): floor((c-lo)/(hi-lo) * (2^bits-1) + 0.5). */
  private def linearRank(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    val span = if (hi > lo) hi - lo else 1d
    round((c.cast("double") - lit(lo)) / lit(span) * lit((1 << bits) - 1)).cast("long")
  }

  /** Morton code over the given (column, lo, hi) dimensions. */
  def zvalue(dims: Seq[(Column, Double, Double)], bits: Int): Column = {
    require(dims.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bits * dims.size <= 62, s"bits=$bits x ${dims.size} dims exceeds a long")
    dims.zipWithIndex.map { case ((c, lo, hi), i) =>
      spreadBits(linearRank(c, lo, hi, bits), bits, dims.size, i)
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite df into `numFiles` z-ordered parquet files at `path`.
    * Lossless: same rows, new physical order. */
  def write(df: DataFrame, cols: Seq[String], path: String,
            bits: Int = 8, numFiles: Int = 16): Unit = {
    // one-row bounds aggregate: the metadata-scale driver read
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val boundsRow = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val dims = cols.zipWithIndex.map { case (c, i) =>
      (col(c), boundsRow.getDouble(2 * i), boundsRow.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zvalue(dims, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
