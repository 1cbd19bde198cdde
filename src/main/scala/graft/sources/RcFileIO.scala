package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.hadoop.fs.Path
import org.apache.hadoop.hive.ql.io.{RCFileInputFormat, RCFileOutputFormat}
import org.apache.hadoop.hive.serde2.columnar.{BytesRefArrayWritable, BytesRefWritable}
import org.apache.hadoop.io.LongWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** RCFile read/write compatibility — the reference's columnar row-group
  * format (ql/src/java/org/apache/hadoop/hive/ql/io/RCFile.java, key
  * buffer = per-column lengths, value buffer = concatenated column bytes;
  * ColumnarSerDe text cell encoding,
  * serde/src/java/org/apache/hadoop/hive/serde2/columnar/ColumnarSerDe.java:65).
  *
  * The format machinery itself is NOT reimplemented: Spark's distribution
  * ships hive-exec-core, so the scan rides the real
  * `RCFileInputFormat` through `SparkContext.hadoopFile` — the same
  * public InputFormat every legacy warehouse's RCFile partitions were
  * written for, which is exactly what a migrating user needs to read
  * them. This module supplies the Spark-side halves the InputFormat
  * does not: schema-on-read decoding of the lazy text cells (the
  * LazySimpleSerDe contract — UTF-8 text, `\N` for NULL) into typed
  * columns via Catalyst casts, and a writer for round-trip testing and
  * reverse migration.
  *
  * Scale: RCFileInputFormat is splittable on row-group sync markers, so
  * the scan parallelizes like any FileInputFormat source (one task per
  * split, no driver materialization); decoding is a per-partition map
  * and the casts are codegen'd Catalyst expressions. There is no column
  * pruning here — the InputFormat reads whole row groups — which matches
  * the reference's own non-vectorized RCFile path and is the documented
  * cost of the legacy format (migrate to parquet/ORC for pruning).
  */
object RcFileIO {

  private val NullCell = "\\N".getBytes(UTF_8)

  /** Read an RCFile file/directory with schema-on-read semantics: each
    * cell is decoded from its ColumnarSerDe text form and cast to the
    * declared field type. Missing trailing columns (schema evolution —
    * files written before a column was added) read as NULL, matching the
    * reference's ColumnarStruct behavior. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val n = schema.length
    // completeness gate for directories THIS writer produced: part files
    // without the commit marker mean a failed/partial write and must not
    // read back as a valid-but-short dataset. Bare files and external
    // (e.g. MR-produced) dirs with their own _SUCCESS pass through.
    val root = new Path(path)
    val gfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (gfs.getFileStatus(root).isDirectory) {
      val entries = gfs.listStatus(root).map(_.getPath.getName)
      if (entries.exists(_.endsWith(".rc")) && !entries.contains("_SUCCESS"))
        throw new java.io.IOException(
          s"incomplete rcfile write at $path (part files present, no _SUCCESS)")
    }
    val rows = spark.sparkContext.hadoopFile(
        path, classOf[RCFileInputFormat[LongWritable, BytesRefArrayWritable]],
        classOf[LongWritable], classOf[BytesRefArrayWritable])
      .map { case (_, refs) =>
        // the record reader REUSES the BytesRefArrayWritable: copy every
        // cell out before returning (same rule as Hadoop Text/Writable)
        val cells = new Array[Any](n)
        var i = 0
        while (i < n) {
          if (i < refs.size) {
            val r = refs.get(i)
            val s = new String(r.getData, r.getStart, r.getLength, UTF_8)
            cells(i) = if (s == "\\N") null else s
          }
          i += 1
        }
        Row.fromSeq(cells.toIndexedSeq)
      }
    val raw = spark.createDataFrame(rows,
      StructType(schema.map(f => StructField(f.name, StringType, nullable = true))))
    raw.select(schema.map(f => col(f.name).cast(f.dataType).as(f.name)).toIndexedSeq: _*)
  }

  /** Write a DataFrame as uncompressed RCFile: every cell rendered in
    * its text form (string cast under the pinned-UTC session), NULL as
    * `\N`. Overwrite semantics (the target is replaced).
    *
    * Writes one file per partition straight through `RCFile.Writer`
    * rather than `saveAsHadoopFile(RCFileOutputFormat)`: the output
    * format's `getRecordWriter` resolves the MapReduce task work
    * directory (`getWorkOutputPath`), which exists only under a real MR
    * task commit protocol — under Spark's old-API writer it is unset and
    * the format NPEs. Going straight to the Writer keeps the bytes
    * identical (same class writes them) without depending on MR task
    * state. Distributed: each task opens/creates its own file, nothing
    * funnels through the driver. */
  def write(df: DataFrame, path: String, codec: Option[String] = None): Unit = {
    val nCols = df.schema.length
    val spark = df.sparkSession
    // validate BEFORE touching the target: a bad argument must not
    // destroy existing data. Pure-Java codecs only (zlib); the reader
    // side is free — RCFile records the codec class per file and
    // RCFileInputFormat restores it.
    val codecClass = codec.map {
      case "gzip" => classOf[org.apache.hadoop.io.compress.GzipCodec]
      case "deflate" => classOf[org.apache.hadoop.io.compress.DefaultCodec]
      case other => throw new IllegalArgumentException(
        s"unsupported rcfile codec '$other' (gzip | deflate)")
    }
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    fs.mkdirs(p)
    val pathStr = path
    // ship the DRIVER's hadoop conf (the AvroIO idiom): a bare executor
    // Configuration would lose fs.defaultFS/credentials, so a scheme-less
    // path would resolve to executor-LOCAL disks — a "successful" write
    // the driver-side read then sees as empty
    val hconf = spark.sparkContext.broadcast(
      new org.apache.spark.SerializableWritable(spark.sparkContext.hadoopConfiguration))
    val text = df.select(df.schema.map(f => col(f.name).cast("string")).toIndexedSeq: _*)
    text.rdd.mapPartitionsWithIndex { (idx, it) =>
      if (!it.hasNext) Iterator.empty
      else {
        // copy before mutating: the broadcast value is shared task-wide
        val conf = new org.apache.hadoop.conf.Configuration(hconf.value.value)
        RCFileOutputFormat.setColumnNumber(conf, nCols)
        val dest = new Path(f"$pathStr/part-$idx%05d.rc")
        // per-ATTEMPT temp + rename-on-commit (the AvroIO idiom): a
        // retried or speculative attempt writes its own temp file, and
        // only one attempt's rename lands; losers clean up. Without
        // this, two live attempts would interleave appends on the
        // final file.
        val ctx = org.apache.spark.TaskContext.get()
        val attempt = if (ctx == null) 0L else ctx.taskAttemptId()
        val tmp = new Path(f"$pathStr/.part-$idx%05d-attempt-$attempt.rc.inprogress")
        val lfs = tmp.getFileSystem(conf)
        val writer = new org.apache.hadoop.hive.ql.io.RCFile.Writer(
          lfs, conf, tmp, null,
          codecClass.map(c =>
            org.apache.hadoop.util.ReflectionUtils.newInstance(c, conf)
              .asInstanceOf[org.apache.hadoop.io.compress.CompressionCodec])
            .orNull)
        val refs = new BytesRefArrayWritable(nCols)
        it.foreach { row =>
          var i = 0
          while (i < nCols) {
            val bytes = if (row.isNullAt(i)) NullCell else row.getString(i).getBytes(UTF_8)
            refs.set(i, new BytesRefWritable(bytes, 0, bytes.length))
            i += 1
          }
          writer.append(refs) // append copies into column buffers: reuse is safe
        }
        writer.close()
        // first commit wins; a failed rename with NO committed dest is a
        // real failure and must fail the task — silently deleting the
        // only copy would later read back as a valid-but-short dataset
        if (!lfs.rename(tmp, dest)) {
          if (!lfs.exists(dest))
            throw new java.io.IOException(s"rcfile commit rename failed: $tmp")
          lfs.delete(tmp, false) // lost the race: identical data landed
        }
        Iterator.single(idx)
      }
    }.count(): Unit
    fs.create(new Path(p, "_SUCCESS"), true).close()
  }
}
