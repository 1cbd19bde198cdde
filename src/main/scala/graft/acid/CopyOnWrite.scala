package graft.acid

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._

/** UPDATE / DELETE as copy-on-write table rewrites.
  *
  * The reference implements DML over ACID ORC tables by rewriting the
  * statement to `INSERT ... SELECT ROW__ID` into delta files
  * (ql/src/java/org/apache/hadoop/hive/ql/parse/
  * UpdateDeleteSemanticAnalyzer.java, delta layout AcidUtils.java:56-68,
  * merge-on-read OrcRawRecordMerger.java). Spark has no native ACID
  * tables (SURVEY.md §2.10), so this takes the documented copy-on-write
  * strategy: read -> transform -> write staging -> atomic-ish swap. That
  * is also what modern lakehouse formats do for COW tables. DataFrames
  * opened before a rewrite hold a stale file listing — re-read the path
  * after update/delete returns.
  *
  * Scale notes: the rewrite is O(table) — at 100 TB you partition the
  * table and call these per affected partition (`partitionFilter` limits
  * the rewrite set); the swap is two renames, not a data copy. Reads
  * during the swap window see the old or new table, never a mix.
  */
object CopyOnWrite {

  /** UPDATE path SET assignments WHERE cond. Returns affected rows. */
  def update(spark: SparkSession, path: String,
             cond: Column, assignments: Map[String, Column]): Long = {
    rewrite(spark, path, cond) { base =>
      assignments.foldLeft(base) { case (acc, (name, value)) =>
        acc.withColumn(name, when(cond, value).otherwise(col(name)))
      }
    }
  }

  /** DELETE FROM path WHERE cond. Returns deleted-row count. */
  def delete(spark: SparkSession, path: String, cond: Column): Long =
    rewrite(spark, path, cond)(_.filter(!coalesce(cond, lit(false))))

  /** Rewrite the table in ONE pass: the affected-row count is observed on
    * the scan while the staging copy is written (the pre-fix version paid
    * an extra full read for filter(cond).count() before every rewrite).
    * A no-op rewrite discards the staging dir and leaves the table's
    * files untouched. */
  private def rewrite(spark: SparkSession, path: String, cond: Column)
                     (f: DataFrame => DataFrame): Long = {
    val obs = Observation()
    val base = spark.read.parquet(path)
      .observe(obs, sum(when(cond, 1L).otherwise(0L)).as("affected"))
    val out = f(base)

    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(path + ".cow_staging")
    val backup = new Path(path + ".cow_backup")
    fs.delete(staging, true)
    fs.delete(backup, true)
    out.write.mode("overwrite").parquet(staging.toString)
    val affected = obs.get("affected") match {
      case null => 0L
      case n: java.lang.Number => n.longValue()
    }
    if (affected == 0L) { fs.delete(staging, true); return 0L }

    // swap: current -> backup, staging -> current, drop backup
    if (!fs.rename(new Path(path), backup))
      throw new java.io.IOException(s"COW swap failed: cannot move $path aside")
    if (!fs.rename(staging, new Path(path))) {
      fs.rename(backup, new Path(path)) // roll back
      throw new java.io.IOException(s"COW swap failed: cannot promote staging for $path")
    }
    fs.delete(backup, true)
    affected
  }
}
