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

  /** Morton code over pre-computed rank columns (each in [0, 2^bits)). */
  def zvalueFromRanks(ranks: Seq[Column], bits: Int): Column = {
    require(ranks.size >= 2, "z-ordering needs at least 2 dimensions")
    require(bits * ranks.size <= 62, s"bits=$bits x ${ranks.size} dims exceeds a long")
    ranks.zipWithIndex.map { case (r, i) =>
      spreadBits(r, bits, ranks.size, i)
    }.reduce(_ bitwiseOR _)
  }

  /** Morton code over the given (column, lo, hi) dimensions. */
  def zvalue(dims: Seq[(Column, Double, Double)], bits: Int): Column =
    zvalueFromRanks(dims.map { case (c, lo, hi) => linearRank(c, lo, hi, bits) }, bits)

  /** Equi-depth rank: index of c's quantile bucket among `bounds`
    * (the 2^bits - 1 interior quantile boundaries). A skewed dimension
    * collapses under linear ranks — 99% of a long-tailed column can land
    * in bucket 0, and the Morton code stops encoding it — while
    * equi-depth boundaries spend the same number of buckets on every
    * PERCENTILE, so dense regions keep their resolution. The boundary
    * probe is a counting filter over a broadcast literal array
    * (O(2^bits) per row inside codegen; bits <= 8 keeps that trivial). */
  def equiDepthRank(c: Column, bounds: Seq[Double]): Column =
    size(filter(typedLit(bounds), b => b < c.cast("double"))).cast("long")

  /** The one writer every entry point funnels through: attach the Morton
    * code, range-partition + sort by it, drop it, write. */
  private def writeClustered(df: DataFrame, z: Column, numFiles: Int, dest: String): Unit =
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dest)

  /** One-row bounds aggregate (the metadata-scale driver read). None for
    * an empty input; a clear error for an all-null clustering column —
    * either would otherwise surface as an opaque NPE mid-write. */
  private def linearDims(df: DataFrame, cols: Seq[String]): Option[Seq[(Column, Double, Double)]] = {
    val aggs = cols.flatMap(c => Seq(min(col(c).cast("double")), max(col(c).cast("double"))))
    val boundsRow = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    if (boundsRow.isNullAt(0) && df.isEmpty) None
    else Some(cols.zipWithIndex.map { case (c, i) =>
      require(!boundsRow.isNullAt(2 * i),
        s"cannot z-order on '$c': the column is entirely null")
      (col(c), boundsRow.getDouble(2 * i), boundsRow.getDouble(2 * i + 1))
    })
  }

  /** Rewrite df into `numFiles` z-ordered parquet files at `path`.
    * Lossless: same rows, new physical order. An empty input writes an
    * empty (but valid) table. */
  def write(df: DataFrame, cols: Seq[String], path: String,
            bits: Int = 8, numFiles: Int = 16): Unit =
    linearDims(df, cols) match {
      case Some(dims) => writeClustered(df, zvalue(dims, bits), numFiles, path)
      case None => df.write.mode("overwrite").parquet(path)
    }

  /** In-place `OPTIMIZE ... ZORDER BY`: atomically rewrite an EXISTING
    * table directory into the z-ordered layout — the lakehouse OPTIMIZE
    * command, built from this module's writer plus [[graft.acid
    * .CopyOnWrite]]'s locked staged-swap protocol (writers serialize on
    * the sidecar lock; a concurrent reader sees the old or new layout,
    * never a mix, and the row multiset is identical either way so the
    * swap is invisible to queries). Compose with zone-map/bloom index
    * `refresh` afterwards: OPTIMIZE replaces every file, which is
    * exactly the drift `isStale` reports. */
  def optimize(spark: org.apache.spark.sql.SparkSession, path: String,
               cols: Seq[String], bits: Int = 8, numFiles: Int = 16): Unit =
    graft.acid.CopyOnWrite.withTableLock(spark, path) {
      val df = spark.read.parquet(path)
      // bounds + z-column resolve against the CURRENT files inside the lock
      linearDims(df, cols) match {
        case None => () // empty table: nothing to lay out, leave it alone
        case Some(dims) =>
          graft.acid.CopyOnWrite.stagedSwap(spark, path) { staging =>
            writeClustered(df, zvalue(dims, bits), numFiles, staging.toString)
            true
          }
          ()
      }
    }

  /** Equi-depth variant of [[write]] for skewed clustering columns:
    * boundaries come from approxQuantile (Greenwald-Khanna — one pass,
    * bounded driver state, deterministic for a fixed input), so each
    * dimension's 2^bits ranks hold equal row mass regardless of the
    * value distribution. Same interleave, same writer. */
  def writeEquiDepth(df: DataFrame, cols: Seq[String], path: String,
                     bits: Int = 8, numFiles: Int = 16): Unit = {
    val probs = (1 until (1 << bits)).map(_.toDouble / (1 << bits)).toArray
    val asDouble = cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(s"__ed_$c", col(c).cast("double"))
    }
    // ONE multi-column quantile pass for all dimensions' boundaries —
    // the per-column overload would re-scan the table per dimension
    val allBounds = asDouble.stat
      .approxQuantile(cols.map(c => s"__ed_$c").toArray, probs, 0.001)
    if (allBounds.exists(_.isEmpty)) {
      // approxQuantile returns an empty array BOTH for an empty input and
      // for an all-null clustering column on a non-empty table. Only the
      // former is a legitimate no-boundary write; the latter gets the same
      // loud error write()/linearDims raises, not a silent plain write.
      if (df.isEmpty) { df.write.mode("overwrite").parquet(path); return }
      val nullCols = cols.zip(allBounds).collect { case (c, b) if b.isEmpty => c }
      require(nullCols.isEmpty,
        s"cannot z-order on '${nullCols.head}': the column is entirely null")
    }
    val ranks = cols.zip(allBounds).map { case (c, bounds) =>
      equiDepthRank(col(c), bounds.toSeq)
    }
    writeClustered(df, zvalueFromRanks(ranks, bits), numFiles, path)
  }
}
