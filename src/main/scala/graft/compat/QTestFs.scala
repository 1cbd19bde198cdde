package graft.compat

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import QTestStatements._

/** Filesystem plumbing of the corpus replay — harness `dfs` command
  * side effects, the reference's path-escape character set, symlink
  * manifest resolution, and the pseudo-partition dynamic-insert
  * fallback. Split from QTestReplay (round 14); behavior unchanged. */
private[compat] object QTestFs {
  /** Execute one harness `dfs` command's file-system side effect; only
    * the temp scratch area is writable (never the read-only reference).
    * Unknown forms are ignored (listings/cats are presentation). */
  /** The reference's FileUtils.escapePathName character set
    * (common/src/java/org/apache/hadoop/hive/common/FileUtils.java:217):
    * all control chars INCLUDING U+0000 — which Spark's
    * ExternalCatalogUtils clone omits, so a NUL partition value crashes
    * Spark's dynamic write (escape1) — plus the listed specials. */
  private[compat] def hiveEscapePathName(s: String): String =
    if (s.isEmpty) "__HIVE_DEFAULT_PARTITION__"
    else s.flatMap { c =>
      if (c < ' ' || c == '\u007F' || "\"#%'*/:=?\\{[]^".indexOf(c.toInt) >= 0)
        f"%%${c.toInt}%02X"
      else c.toString
    }

  /** Fallback for dynamic-partition INSERTs whose partition VALUES
    * Spark's writer cannot represent — its path escaping omits U+0000
    * (TASK_WRITE_FAILED), and its catalog read maps the default
    * partition's stored name to NULL where the reference reads back the
    * literal string `__HIVE_DEFAULT_PARTITION__`. Rebuild the table as
    * an UNPARTITIONED parquet stand-in with the partition columns as
    * trailing data columns carrying the reference's stored VALUES
    * (escape1's SELECT * then matches byte-exact); a marker table
    * property routes later partial-spec DROP PARTITION statements to a
    * staged DELETE ([[runDml]]). Single-shot by design: the overwrite
    * rebuilds from this INSERT alone (the corpus family fills each such
    * table exactly once). */
  private[compat] val PseudoPartProp = "graft.pseudo.partitions"

  private[compat] def manualDynamicInsert(spark: SparkSession, stmt: String): Boolean = {
    val Re = ("(?is)^\\s*insert\\s+overwrite\\s+table\\s+`?([\\w.]+)`?\\s+" +
      "partition\\s*\\(([^)]*)\\)\\s*((?:select|with)\\b.*)$").r
    val m = Re.findFirstMatchIn(stmt).getOrElse(return false)
    val items = m.group(2).split(",").map(_.trim).toSeq
    val static = items.filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim.toLowerCase -> v.trim.stripPrefix("'").stripSuffix("'")
    }
    val dyn = items.filterNot(_.contains("=")).map(_.toLowerCase)
    if (dyn.isEmpty) return false
    val df = spark.sql(HiveRewrites(m.group(3).trim.stripSuffix(";")))
    val cat = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(m.group(1))
    val meta = cat.getTableMetadata(ident)
    val partCols = meta.partitionColumnNames
    if (partCols.isEmpty) return false
    val dataFields = meta.schema.fields.filterNot(f => partCols.contains(f.name))
    val nData = df.schema.length - dyn.length
    if (nData != dataFields.length) return false
    val DefaultPart = "__HIVE_DEFAULT_PARTITION__"
    // the reference maps null AND empty dynamic values onto the default
    // partition name, and READS that name back as the value
    val dynExprs: Map[String, org.apache.spark.sql.Column] =
      dyn.zipWithIndex.map { case (d, i) =>
        val c = col(df.columns(nData + i)).cast("string")
        d -> when(c.isNull || c === "", lit(DefaultPart)).otherwise(c)
      }.toMap
    val staticMap = static.toMap
    val partExprs = partCols.map { p =>
      val t = meta.schema(p).dataType
      staticMap.get(p.toLowerCase) match {
        case Some(v) => lit(v).cast(t).as(p)
        case None => dynExprs(p.toLowerCase).cast(t).as(p)
      }
    }
    val out = df.select((df.columns.take(nData).zip(dataFields).map {
      case (c, f) => col(c).cast(f.dataType).as(f.name)
    } ++ partExprs).toIndexedSeq: _*)
    val stage = s"graft_dynins_stage"
    out.createOrReplaceTempView(stage)
    spark.sql(s"DROP TABLE ${ident.quotedString}")
    spark.sql(s"CREATE TABLE ${ident.quotedString} USING parquet " +
      s"TBLPROPERTIES ('$PseudoPartProp' = '${partCols.mkString(",")}') " +
      s"AS SELECT * FROM $stage")
    spark.catalog.dropTempView(stage)
    true
  }

  /** INSERT OVERWRITE DIRECTORY ... STORED AS RCFILE (no row format). */
  private[compat] val RcDirRe =
    ("(?is)^\\s*insert\\s+overwrite\\s+(?:local\\s+)?directory\\s+'([^']+)'\\s*" +
      "stored\\s+as\\s+rcfile\\s+((?:select|with)\\b.*)$").r

  /** `dfs -cp <manifest> <warehouse>/<symlink-table>/...` for a
    * SymlinkTextInputFormat table: the copied file is a MANIFEST of
    * harness-relative paths/globs, one per line, naming the REAL data
    * files (ql/io/SymlinkTextInputFormat.java getSplits reads every
    * line of every file under the table dir and globs it). Resolved
    * eagerly at copy time — each glob target lands in the table's
    * lines-table directory, so subsequent scans read the data the
    * reference's input format would have mounted. Returns true when
    * the command was consumed. */
  private[compat] def resolveSymlinkCopy(spark: SparkSession, cmd: String,
      refData: String, symlinkTables: Set[String]): Boolean = {
    if (symlinkTables.isEmpty) return false
    val toks = cmd.trim.split("\\s+")
    if (toks.length != 4 || toks(1) != "-cp") return false
    val (src, dst) = (toks(2), toks(3))
    val tbl = symlinkTables.find(t => dst.toLowerCase.contains("/" + t + "/"))
      .getOrElse(return false)
    val dataIdx = src.indexOf("data/files/")
    val manifest =
      if (dataIdx >= 0)
        Paths.get(refData, src.substring(dataIdx + "data/files/".length))
      else Paths.get(src)
    if (!Files.exists(manifest)) return true
    val loc = Paths.get(new java.net.URI(spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(
        HiveDdl.linesTable(tbl))).location.toString).getPath)
    Files.createDirectories(loc)
    val dataDir = Paths.get(refData)
    new String(Files.readAllBytes(manifest), UTF_8)
      .split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
        val li = line.indexOf("data/files/")
        val rel =
          if (li >= 0) line.substring(li + "data/files/".length)
          else Paths.get(line).getFileName.toString
        // nio glob handles the manifests' `*` and `{a,b}` alternations
        val matcher = dataDir.getFileSystem.getPathMatcher("glob:" + rel)
        Files.list(dataDir).iterator().asScala
          .filter(p => matcher.matches(dataDir.relativize(p)))
          .foreach { t =>
            Files.copy(t, loc.resolve(
              manifest.getFileName.toString + "_" + t.getFileName.toString),
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          }
      }
    try spark.sessionState.catalog.invalidateAllCachedTables()
    catch { case _: Exception => () }
    true
  }

  private[compat] def execDfs(cmd: String, refData: String): Unit = {
    import java.nio.file.{Files => JFiles, Paths => JPaths, StandardCopyOption}
    val tmpBase = JPaths.get(System.getProperty("java.io.tmpdir"), "qtest_tmp")
    def inTmp(p: String): Boolean = JPaths.get(p).normalize.startsWith(tmpBase)
    // dfs arguments may carry a file: scheme after re-rooting — the
    // local filesystem ops below want bare paths. A scheme-LESS absolute
    // path is a DEFAULT-FS (hdfs) path there (root_dir_external_table's
    // `dfs -cp /tmp/.../000000_0 /000000_0`) — it lands on the same
    // hdfsroot scratch the hdfs:/// re-rooting uses. Reference-tree and
    // scratch paths stay put.
    val toks = cmd.split("\\s+").toSeq
      .map(t => if (t.startsWith("file://")) t.stripPrefix("file://")
                else t.stripPrefix("file:"))
      .map(t =>
        if (t.startsWith("/") && !t.startsWith("/root/") &&
            !JPaths.get(t).normalize.startsWith(tmpBase))
          tmpBase.toString + "/hdfsroot" + t
        else t)
    toks match {
      case Seq(_, mk, dir) if mk.contains("mkdir") || mk.contains("test.dfs.mkdir") =>
        if (inTmp(dir)) { JFiles.createDirectories(JPaths.get(dir)); () }
      case Seq(_, "-copyFromLocal" | "-put", src, dst) if inTmp(dst) =>
        // resolve the harness-relative source onto the reference's
        // data/files tree (keep any subpath below data/files)
        val from = {
          val idx = src.indexOf("data/files/")
          val fromRef =
            if (idx >= 0) JPaths.get(refData, src.substring(idx + "data/files/".length))
            else JPaths.get(refData, JPaths.get(src).getFileName.toString)
          // a source the reference tree does not hold may be the output
          // of an earlier re-rooted INSERT OVERWRITE DIRECTORY
          if (JFiles.exists(fromRef) || idx < 0) fromRef
          else tmpBase.resolve("dirs")
            .resolve(src.substring(idx + "data/files/".length))
        }
        JFiles.createDirectories(JPaths.get(dst).getParent)
        if (JFiles.isDirectory(from)) {
          // directory sources copy recursively (ext_test_space)
          def rec(sf: java.io.File, df: java.io.File): Unit =
            if (sf.isDirectory) {
              JFiles.createDirectories(df.toPath)
              Option(sf.listFiles()).foreach(_.foreach(c => rec(c, new java.io.File(df, c.getName))))
            } else {
              JFiles.copy(sf.toPath, df.toPath, StandardCopyOption.REPLACE_EXISTING); ()
            }
          rec(from.toFile, new java.io.File(dst))
        } else if (JFiles.exists(from)) {
          JFiles.copy(from, JPaths.get(dst), StandardCopyOption.REPLACE_EXISTING); ()
        }
      case Seq(_, "-cp", src0, dst) if inTmp(dst) =>
        // a `<dir>/000000_0`-style reducer-output name refers to the
        // replay's own INSERT DIRECTORY files, which carry engine part
        // names — resolve to the nth data file by sort order
        val src = {
          val f = new java.io.File(src0)
          if (!f.exists && f.getName.matches("\\d{6}_\\d+") &&
              f.getParentFile != null && f.getParentFile.isDirectory) {
            val parts = Option(f.getParentFile.listFiles()).toSeq.flatten
              .filter(x => x.isFile && !x.getName.startsWith("_") &&
                !x.getName.startsWith(".")).sortBy(_.getName)
            parts.lift(f.getName.takeWhile(_ != '_').toInt)
              .map(_.getPath).getOrElse(src0)
          } else src0
        }
        // -cp of a reference data DIRECTORY into the scratch (the source
        // may live anywhere readable; only the tmp destination is written)
        def copy(s: java.io.File, d: java.io.File): Unit =
          if (s.isDirectory) {
            JFiles.createDirectories(d.toPath)
            Option(s.listFiles()).foreach(_.foreach(c => copy(c, new java.io.File(d, c.getName))))
          } else if (s.isFile) {
            // a DIRECTORY destination (dfs-style trailing slash) takes
            // the source's file name
            val t = if (d.isDirectory || dst.endsWith("/"))
              new java.io.File(d, s.getName) else d
            JFiles.createDirectories(t.toPath.getParent)
            JFiles.copy(s.toPath, t.toPath, StandardCopyOption.REPLACE_EXISTING)
            ()
          }
        copy(new java.io.File(src), new java.io.File(dst))
      case Seq(_, rm, dir) if (rm == "-rmr" || rm == "-rm") &&
          inTmp(dir.replace("*", "x")) =>
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete(); ()
        }
        val f = new java.io.File(dir)
        if (f.getName.contains("*")) {
          val re = ("\\Q" + f.getName.replace("*", "\\E.*\\Q") + "\\E").r
          Option(f.getParentFile.listFiles()).foreach(_.foreach(c =>
            if (re.pattern.matcher(c.getName).matches()) del(c)))
        } else del(f)
      case _ => ()
    }
  }
}
