package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — effective-dated
  * dimension history (Kimball's SCD2: close the old row, append the new
  * one, never lose an attribute's past value).
  *
  * The reference gives users the raw material for this — `MERGE INTO`
  * with multiple WHEN clauses (ql/parse/MergeSemanticAnalyzer.java,
  * covered by q152) — and Hive documentation's canonical SCD2 recipe is
  * exactly two MERGE branches. This module packages the pattern as one
  * declarative transform so the engine, not the user, owns the
  * correctness subtleties: null-safe change detection (a NULL->value
  * attribute flip IS a change), no-op suppression (a batch row equal to
  * the current row must NOT spawn a new version), and delta semantics
  * (keys absent from the batch are untouched).
  *
  * Scale shape: one full-outer join of CURRENT rows vs the batch on the
  * business key — history rows never join, never shuffle (they pass
  * through by union). At 100 TB the current slice is the small side and
  * broadcasts; version churn accumulates in history, which this pass
  * only concatenates. Pure DataFrame -> DataFrame: storage/locking is
  * [[graft.acid.CopyOnWrite]]/[[graft.acid.Versioned]]'s job.
  */
object Scd2 {

  val MetaCols: Seq[String] = Seq("valid_from", "valid_to", "is_current")

  /** Snapshot -> dimension: every row current as of `asOf`. */
  def init(snapshot: DataFrame, asOf: Column): DataFrame =
    snapshot
      .withColumn("valid_from", asOf.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))

  /** Apply a change batch (one row per business key: new attribute
    * values; keys may be new) effective at `asOf`. Returns the full new
    * dimension: history untouched, genuinely-changed current rows closed
    * out at `asOf`, their replacements plus brand-new keys appended as
    * current. */
  def applyChanges(dim: DataFrame, batch: DataFrame,
                   keys: Seq[String], attrs: Seq[String], asOf: Column): DataFrame = {
    require(keys.nonEmpty && attrs.nonEmpty, "scd2 needs key and attribute columns")
    require(dim.columns.toSet == (keys ++ attrs ++ MetaCols).toSet,
      s"dimension columns ${dim.columns.mkString(",")} must be exactly keys + attrs + $MetaCols")
    // The one-row-per-key batch precondition is ENFORCED, not assumed: a
    // duplicate key would fan the full-outer join out and emit multiple
    // is_current versions, silently corrupting the dimension (the same
    // cardinality contract SQL MERGE raises an error for). The probe is
    // one aggregation over the batch — O(changes), not O(dimension).
    val dups = batch.groupBy(keys.map(k => col(k) as k): _*)
      .count().filter(col("count") > 1).limit(1).collect()
    require(dups.isEmpty,
      s"scd2 batch carries duplicate business key ${dups.headOption.getOrElse("")}" +
        " — one row per key per apply (merge upstream duplicates first)")
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    // presence markers + null-safe key equality: a NULL business key is
    // a legitimate dimension member — probing the key columns with
    // isNotNull would silently DELETE its current row on every apply
    val b = batch.select(
      (keys ++ attrs).map(c => col(c).as(s"__b_$c")) :+ lit(true).as("__b_in"): _*)
    val currentM = current.withColumn("__d_in", lit(true))
    val joinCond = keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _)
    val j = currentM.join(b, joinCond, "full_outer")
    val inBatch = col("__b_in").isNotNull
    val inDim = col("__d_in").isNotNull
    // null-safe: NULL -> value and value -> NULL both count as changes
    val changed = attrs.map(a => !(col(a) <=> col(s"__b_$a"))).reduce(_ || _)

    val dimCols = dim.columns.toIndexedSeq
    // current rows not changed by this batch (absent from it, or no-op)
    val kept = j.filter(inDim && (!inBatch || !changed)).select(dimCols.map(col): _*)
    // genuinely changed: close the old version at asOf
    val closed = j.filter(inDim && inBatch && changed)
      .select(dimCols.map(col): _*)
      .withColumn("valid_to", asOf.cast("date"))
      .withColumn("is_current", lit(false))
    // their replacements + brand-new keys open at asOf
    val opened = j.filter(inBatch && (!inDim || changed))
      .select((keys ++ attrs).map(c => col(s"__b_$c").as(c)): _*)
      .withColumn("valid_from", asOf.cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(true))
      .select(dimCols.map(col): _*)
    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** Point-in-time lookup: the version of each key valid at `at`
    * ([valid_from, valid_to) semantics; open rows have null valid_to). */
  def asOf(dim: DataFrame, at: Column): DataFrame =
    dim.filter(col("valid_from") <= at.cast("date") &&
               (col("valid_to").isNull || col("valid_to") > at.cast("date")))
}
