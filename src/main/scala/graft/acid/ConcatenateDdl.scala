package graft.acid

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** `ALTER TABLE t [PARTITION (spec)] CONCATENATE` — the small-file merge
  * DDL (reference HiveParser.g alterStatementSuffixMergeFiles, executed
  * by DDLTask.mergeFiles → the same block-merge machinery the compactor
  * uses). Routed to [[CopyOnWrite.compact]] on the table's (or
  * partition's) directory: a locked staged-swap `coalesce` rewrite —
  * no shuffle, scan splits concatenate into ~128 MB writers, readers
  * never see a partial state, and the pass is recorded in
  * [[CompactionHistory]].
  *
  * The reference's partitioned-table rule carries over: a partitioned
  * table needs an explicit PARTITION clause (DDLSemanticAnalyzer raises
  * "source table ... is partitioned but no partition desc found"), so a
  * typo can never rewrite every partition at once. Already-compact
  * directories no-op (files <= 2x the ideal count), so scheduling
  * CONCATENATE blindly is safe — same idempotence as the compactor.
  *
  * Concurrency caveat (same as the reference's MoveTask-based merge): a
  * reader scanning the WHOLE partitioned table in the instant a
  * partition's staged swap runs can see the transient
  * `<part>.cow_staging` sibling and fail partition discovery; readers
  * of the partition itself are protected by the swap's rename
  * atomicity. Schedule per-partition merges like the reference does —
  * off the hot read path. */
object ConcatenateDdl {

  private val Re =
    """(?is)\s*ALTER\s+TABLE\s+([\w.]+)\s*(?:PARTITION\s*\(([^)]*)\)\s*)?CONCATENATE\s*;?\s*""".r

  def matches(sql: String): Boolean = sql match {
    case Re(_, _) => true
    case _ => false
  }

  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case Re(table, partSpec) =>
      val meta = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      val loc = new Path(meta.location).toUri.getPath
      val dir = Option(partSpec) match {
        case None =>
          require(meta.partitionColumnNames.isEmpty,
            s"table $table is partitioned; CONCATENATE needs an explicit " +
              "PARTITION (...) clause (DDLSemanticAnalyzer rule)")
          loc
        case Some(spec) =>
          require(meta.partitionColumnNames.nonEmpty,
            s"table $table is not partitioned")
          // k = v pairs -> the k=v directory layout, in PARTITION-COLUMN
          // order (the clause may spell them in any order)
          val kv = spec.split(",").map { p =>
            val Array(k, v) = p.split("=", 2)
            (k.trim.toLowerCase, v.trim.stripPrefix("'").stripSuffix("'"))
          }.toMap
          val missing = meta.partitionColumnNames.map(_.toLowerCase).filterNot(kv.contains)
          require(missing.isEmpty,
            s"PARTITION clause missing key(s): ${missing.mkString(", ")}")
          meta.partitionColumnNames.map(c => s"$c=${kv(c.toLowerCase)}")
            .mkString(loc + "/", "/", "")
      }
      val (before, after) = CopyOnWrite.compact(spark, dir)
      // the rewrite replaced files under a catalog table: drop the
      // cached file listing so readers re-list (DDLTask fires the same
      // invalidation after mergeFiles' MoveTask)
      spark.catalog.refreshTable(table)
      spark.createDataFrame(
        java.util.List.of(Row(dir, before, after)),
        StructType.fromDDL("path STRING, files_before INT, files_after INT"))
    case _ => throw new IllegalArgumentException(s"not a CONCATENATE statement: $sql")
  }
}
