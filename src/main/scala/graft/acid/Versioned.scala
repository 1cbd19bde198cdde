package graft.acid

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned snapshot tables: multi-version copy-on-write with reader
  * snapshot isolation and time travel.
  *
  * The reference's ACID tables get this from delta directories named by
  * transaction id plus a metastore that hands readers a valid-txn list
  * (ql/src/java/org/apache/hadoop/hive/ql/io/AcidUtils.java:56-68 — base
  * + delta_<txnid> layout; lockmgr/DbTxnManager.java issues the ids).
  * [[CopyOnWrite]] covers single-writer rewrites but has two documented
  * gaps: a reader that lists files during the swap's rename window finds
  * no table at all, and an overwritten snapshot is gone — no
  * reproducibility. This module closes both with the commit-marker
  * design modern lakehouse formats use, reduced to its minimum:
  *
  * {{{
  *   table/                       (basePath)
  *     _versions/v00000001/  ...parquet files... + _committed
  *     _versions/v00000002/  ...parquet files... + _committed
  * }}}
  *
  *  - A writer (serialized by [[CopyOnWrite]]'s sidecar lock protocol,
  *    here on `basePath + ".ver_lock"`) writes version N+1's files into a
  *    new directory, then creates the empty `_committed` marker LAST.
  *    Marker creation is the one atomic commit point (single
  *    create-file op on HDFS/local alike — no rename of the data dir).
  *  - A reader resolves "current" = the highest version directory whose
  *    marker exists. A half-written version is invisible (no marker); a
  *    concurrent commit is either fully visible or not at all. Once a
  *    reader resolves a version it keeps reading THAT directory — later
  *    commits never mutate it — which is snapshot isolation for the
  *    whole query regardless of how long it runs.
  *  - Old versions stay until [[vacuum]], giving `asOf` time travel — the
  *    reproducibility primitive a training pipeline needs to re-read the
  *    exact corpus snapshot a model was trained on.
  *
  * Scale notes: resolving a version is one directory listing of version
  * names (metadata-scale, not data-scale); data files are never listed
  * across versions. DML is O(table) copy-on-write exactly like
  * [[CopyOnWrite]] — at 100 TB you partition and version per partition,
  * or adopt a full lakehouse format; this module is the engine-level
  * contract those formats implement. Vacuum never touches the live
  * version, so it is safe to run concurrently with readers of the
  * current snapshot (only readers pinned to vacuumed history break, the
  * same contract as every lakehouse retention policy).
  */
object Versioned {

  private val VersionsDir = "_versions"
  private val Marker = "_committed"
  private val Pad = 8

  private def fs(spark: SparkSession, base: String): FileSystem =
    new Path(base).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionPath(base: String, v: Int): Path =
    new Path(s"$base/$VersionsDir/v${("%0" + Pad + "d").format(v)}")

  /** Committed version numbers, ascending (metadata listing only). */
  def versions(spark: SparkSession, base: String): Seq[Int] = {
    val f = fs(spark, base)
    val dir = new Path(s"$base/$VersionsDir")
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d+") &&
        f.exists(new Path(s.getPath, Marker)))
      .map(_.getPath.getName.drop(1).toInt)
      .sorted
  }

  /** Latest committed version, if any. */
  def currentVersion(spark: SparkSession, base: String): Option[Int] =
    versions(spark, base).lastOption

  /** Read a snapshot: the latest committed version, or `asOf` for time
    * travel. The returned DataFrame is pinned to that version's directory
    * — concurrent commits never change what it reads. */
  def read(spark: SparkSession, base: String, asOf: Option[Int] = None): DataFrame = {
    val vs = versions(spark, base)
    require(vs.nonEmpty, s"no committed versions under $base/$VersionsDir")
    val v = asOf match {
      case Some(n) =>
        require(vs.contains(n), s"version $n not committed (have ${vs.mkString(",")})")
        n
      case None => vs.last
    }
    spark.read.parquet(versionPath(base, v).toString)
  }

  /** Commit `df` as the next version and return its number. The data is
    * fully written before the marker lands, so readers never see a
    * partial snapshot. Serialized against other writers by the same
    * lock-file protocol as [[CopyOnWrite]] (create-no-overwrite sidecar,
    * stale reclaim) so two writers cannot claim the same version. */
  def commit(spark: SparkSession, base: String, df: DataFrame): Int =
    withVersionLock(spark, base) {
      val f = fs(spark, base)
      val next = currentVersion(spark, base).getOrElse(0) + 1
      val dir = versionPath(base, next)
      f.delete(dir, true) // leftover from a crashed writer: overwrite
      df.write.parquet(dir.toString)
      f.create(new Path(dir, Marker), false).close() // THE commit point
      next
    }

  /** UPDATE ... SET assignments WHERE cond as a new version. Returns the
    * new version number (the previous snapshot stays readable). */
  def update(spark: SparkSession, base: String,
             cond: Column, assignments: Map[String, Column]): Int =
    withVersionLock(spark, base) {
      val cur = read(spark, base)
      val out = assignments.foldLeft(cur) { case (acc, (name, value)) =>
        acc.withColumn(name, when(cond, value).otherwise(col(name)))
      }
      commitUnlocked(spark, base, out)
    }

  /** DELETE FROM ... WHERE cond as a new version. */
  def delete(spark: SparkSession, base: String, cond: Column): Int =
    withVersionLock(spark, base) {
      commitUnlocked(spark, base,
        read(spark, base).filter(!coalesce(cond, lit(false))))
    }

  /** Drop committed versions older than `keep` latest (never the
    * current one). Returns the removed version numbers. */
  def vacuum(spark: SparkSession, base: String, keep: Int = 1): Seq[Int] =
    withVersionLock(spark, base) {
      require(keep >= 1, "must keep at least the current version")
      val f = fs(spark, base)
      val old = versions(spark, base).dropRight(keep)
      old.foreach(v => f.delete(versionPath(base, v), true))
      old
    }

  // commit() without re-acquiring the (non-reentrant) lock — for DML
  // paths that must hold the lock across their read+transform+commit
  private def commitUnlocked(spark: SparkSession, base: String, df: DataFrame): Int = {
    val f = fs(spark, base)
    val next = currentVersion(spark, base).getOrElse(0) + 1
    val dir = versionPath(base, next)
    f.delete(dir, true)
    df.write.parquet(dir.toString)
    f.create(new Path(dir, Marker), false).close()
    next
  }

  /** Same protocol as CopyOnWrite's table lock, on a versioned-table
    * sidecar. Writers serialize; readers never take it. */
  private def withVersionLock[T](spark: SparkSession, base: String)(body: => T): T = {
    val f = fs(spark, base)
    f.mkdirs(new Path(s"$base/$VersionsDir"))
    val lock = new Path(base + ".ver_lock")
    val deadline = System.nanoTime() + CopyOnWrite.LockWaitMs * 1000000L
    var acquired = false
    while (!acquired) {
      try {
        val out = f.create(lock, false)
        out.writeBytes(
          s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName} " +
          s"${System.currentTimeMillis()}\n")
        out.close()
        acquired = true
      } catch { case _: java.io.IOException =>
        try {
          val st = f.getFileStatus(lock)
          if (System.currentTimeMillis() - st.getModificationTime > CopyOnWrite.StaleLockMs)
            f.delete(lock, false)
        } catch { case _: java.io.FileNotFoundException => () }
        if (System.nanoTime() > deadline)
          throw new java.io.IOException(
            s"versioned-table writer lock busy after ${CopyOnWrite.LockWaitMs}ms: $lock")
        Thread.sleep(50)
      }
    }
    try body finally f.delete(lock, false)
  }
}
