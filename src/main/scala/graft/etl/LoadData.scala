package graft.etl

import org.apache.hadoop.fs.{FileUtil, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.catalog.CatalogTableType

/** `LOAD DATA [LOCAL] INPATH` — the classic file-into-table ingestion
  * statement (reference
  * ql/src/java/org/apache/hadoop/hive/ql/parse/LoadSemanticAnalyzer.java +
  * the MoveTask it plans). Hive's LOAD DATA is a pure file operation:
  * no rewrite and no row-level validation — INPATH moves the source
  * files into the table/partition directory (an HDFS rename, i.e. a
  * namenode metadata op), LOCAL INPATH copies them from the client box,
  * OVERWRITE clears the target first, and loading into a fresh partition
  * registers it in the metastore.
  *
  * Spark's native LOAD DATA command requires Hive-serde tables, so graft
  * re-expresses the same semantics over the catalog API plus the Hadoop
  * FileSystem: still zero data rewrite — the property that matters at
  * 100 TB, where ingesting a day's drop must be a rename + ADD PARTITION,
  * never a scan — and the same-filesystem move stays a metadata-only
  * rename on a real cluster.
  */
object LoadData {

  /** Load the file (or every non-hidden file of the directory) at
    * `inpath` into `table`, optionally into one fully-specified
    * partition. Returns the number of files landed.
    *
    * @param local     copy (keep the source) instead of move — Hive's
    *                  LOCAL INPATH, whose client-box source can't be
    *                  renamed into the warehouse filesystem
    * @param overwrite clear the target table/partition directory first
    */
  def load(spark: SparkSession, inpath: String, table: String,
           overwrite: Boolean = false, local: Boolean = false,
           partition: Seq[(String, String)] = Nil): Long = {
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    val meta = catalog.getTableMetadata(ident) // throws if the table is missing
    require(meta.tableType != CatalogTableType.VIEW,
      s"LOAD DATA target $table is a view")
    val partCols = meta.partitionColumnNames
    // the spec is a MAP (Hive semantics): any order, but exactly the
    // partition columns; re-sequence it into declaration order so the
    // directory layout is always .../k1=v1/k2=v2
    require(partition.map(_._1.toLowerCase).toSet == partCols.map(_.toLowerCase).toSet &&
        partition.size == partCols.size,
      s"LOAD DATA partition spec (${partition.map(_._1).mkString(", ")}) must name " +
        s"exactly the partition columns (${partCols.mkString(", ")}) of $table")
    val partOrdered = partCols.map(pc =>
      partition.find(_._1.equalsIgnoreCase(pc)).get match { case (_, v) => (pc, v) })

    val conf = spark.sessionState.newHadoopConf()
    val src = new Path(inpath)
    val srcFs = src.getFileSystem(conf)
    require(srcFs.exists(src), s"LOAD DATA source path $inpath does not exist")
    val files =
      if (srcFs.getFileStatus(src).isDirectory) {
        val entries = srcFs.listStatus(src).toSeq.filter(st => !isHidden(st.getPath.getName))
        // Hive rejects a source containing directories; silently loading
        // only the top level would drop the nested data without a trace
        val dirs = entries.filter(_.isDirectory)
        require(dirs.isEmpty,
          s"LOAD DATA source $inpath contains subdirectories (${dirs.map(_.getPath.getName).mkString(", ")})")
        entries.filter(_.isFile).map(_.getPath)
      } else Seq(src)
    require(files.nonEmpty, s"LOAD DATA source path $inpath holds no files")

    val targetDir = partOrdered.foldLeft(new Path(meta.location)) {
      case (p, (k, v)) => new Path(p, s"$k=$v")
    }
    val fs = targetDir.getFileSystem(conf)
    if (overwrite && fs.exists(targetDir))
      fs.listStatus(targetDir).filter(st => !isHidden(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
    fs.mkdirs(targetDir)
    files.foreach { f =>
      // a same-named file already in the target gets a `_copy_N` suffix
      // (Hive's MoveTask collision rule) — loading kv1.txt twice APPENDS
      // the rows; only OVERWRITE cleared the directory above
      var dest = new Path(targetDir, f.getName)
      var copy = 0
      while (fs.exists(dest)) {
        copy += 1
        val name = f.getName
        val dot = name.lastIndexOf('.')
        val withCopy =
          if (dot > 0) s"${name.substring(0, dot)}_copy_$copy${name.substring(dot)}"
          else s"${name}_copy_$copy"
        dest = new Path(targetDir, withCopy)
      }
      val ok =
        if (local) FileUtil.copy(srcFs, f, fs, dest, false, conf)
        else fs.rename(f, dest)
      require(ok, s"LOAD DATA failed to land $f at $dest")
    }

    if (partOrdered.nonEmpty) {
      // escape quotes: a value like it's must not break (or inject into)
      // the generated ALTER statement
      val spec = partOrdered.map { case (k, v) => s"$k='${v.replace("'", "''")}'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($spec)")
    }
    spark.sql(s"REFRESH TABLE $table")
    files.size.toLong
  }

  private def isHidden(name: String) = name.startsWith(".") || name.startsWith("_")

  private val Grammar =
    """(?is)\s*LOAD\s+DATA\s+(LOCAL\s+)?INPATH\s+'([^']+)'\s+(OVERWRITE\s+)?INTO\s+TABLE\s+([\w.]+)(?:\s+PARTITION\s*\(([^)]*)\))?\s*""".r

  /** The statement form: `LOAD DATA [LOCAL] INPATH '<path>' [OVERWRITE]
    * INTO TABLE <name> [PARTITION (k='v', ...)]`. */
  def sql(spark: SparkSession, statement: String): Long = statement match {
    case Grammar(local, inpath, overwrite, table, partSpec) =>
      // split on commas OUTSIDE quotes: p='a,b' is one value, not two
      val partition = Option(partSpec).map(_.trim).filter(_.nonEmpty)
        .map(_.split(",(?=(?:[^']*'[^']*')*[^']*$)").toSeq.map { kv =>
          val Array(k, v) = kv.split("=", 2).map(_.trim)
          k -> v.stripPrefix("'").stripSuffix("'")
        }).getOrElse(Nil)
      load(spark, inpath, table,
        overwrite = overwrite != null, local = local != null, partition = partition)
    case _ =>
      throw new IllegalArgumentException(
        s"cannot parse LOAD DATA statement: $statement")
  }
}
