package graft.sources

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder, LogicalTypes}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.SerializableWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Minimal Avro container-file reader/writer over the public avro-1.12 API.
  *
  * The reference ships AvroSerDe
  * (serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java:48) as a
  * first-class storage format; this distribution has no spark-avro datasource
  * jar, so the format surface is vendored directly: Spark schema <-> Avro
  * record schema conversion, a distributed writer (one container file per
  * partition, written through the Hadoop FileSystem API so any FS scheme the
  * cluster mounts works), and a distributed reader (file-per-task
  * parallelism — Avro containers are block-splittable, but file granularity
  * is the simple correct unit and matches how the reference's
  * AvroContainerInputFormat assigns one mapper per small file).
  *
  * Type mapping (the AvroSerDe subset our tables exercise):
  *   boolean/int/long/float/double/string/binary 1:1,
  *   TimestampType <-> long + timestamp-micros logical type,
  *   DateType      <-> int  + date logical type,
  *   ArrayType(t)  <-> array(t), nullable fields <-> union(null, t).
  * Anything else fails loudly at write time rather than silently corrupting.
  *
  * Scale notes: the writer is one pass, no shuffle, no driver data movement —
  * each task streams its partition straight to its own container file with
  * deflate compression. The reader's unit of parallelism is the file, so a
  * 100 TB layout wants the writer's output (one file per upstream partition)
  * rather than a few giant files; that is the same contract as the
  * reference's mapper-per-split. The Hadoop Configuration is shipped via
  * broadcast (SerializableWritable) so kerberized/object-store FS settings
  * reach executors.
  */
object AvroIO {

  // ---- schema conversion -------------------------------------------------

  def toAvroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, f.name))
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toList.asJava)
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, path: String): Schema = {
    val base = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case TimestampType =>
        LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case TimestampNTZType =>
        LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
      case DateType =>
        LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
      case ArrayType(elem, containsNull) =>
        Schema.createArray(fieldSchema(elem, containsNull, s"$path[]"))
      case other =>
        throw new IllegalArgumentException(
          s"AvroIO: unsupported type $other at '$path' " +
            "(supported: boolean/int/long/float/double/string/binary/timestamp/date/array)")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  // ---- Avro -> Spark schema (AvroSerDe's avro.schema.literal contract) ----

  /** Spark DDL type string for an Avro schema node — the mapping the
    * reference's SchemaToTypeInfo performs for `avro.schema.literal`
    * tables (serde/src/java/org/apache/hadoop/hive/serde2/avro/
    * SchemaToTypeInfo.java): unions with null unwrap to their non-null
    * branch, logical decimal/date/timestamp-millis map to their SQL
    * types, enum/fixed degrade to string/binary. */
  def sparkDdlType(s: Schema): String = {
    import Schema.Type._
    val logical = Option(s.getLogicalType).map(_.getName).getOrElse("")
    s.getType match {
      case NULL => "void"
      case BOOLEAN => "boolean"
      case INT if logical == "date" => "date"
      case INT => "int"
      case LONG if logical.startsWith("timestamp-") => "timestamp"
      case LONG => "bigint"
      case FLOAT => "float"
      case DOUBLE => "double"
      case STRING | ENUM => "string"
      case BYTES | FIXED if logical == "decimal" || decimalProp(s) =>
        val (p, sc) = Option(s.getLogicalType)
          .collect { case d: LogicalTypes.Decimal => (d.getPrecision, d.getScale) }
          .getOrElse((
            Option(s.getProp("precision")).map(_.replace("\"", "").trim.toInt).getOrElse(38),
            Option(s.getProp("scale")).map(_.replace("\"", "").trim.toInt).getOrElse(0)))
        s"decimal($p,$sc)"
      case BYTES | FIXED => "binary"
      case ARRAY => s"array<${sparkDdlType(s.getElementType)}>"
      case MAP => s"map<string,${sparkDdlType(s.getValueType)}>"
      case RECORD =>
        val fs = s.getFields.asScala
          .map(f => s"${f.name}:${sparkDdlType(f.schema)}").mkString(",")
        s"struct<$fs>"
      case UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        if (nonNull.size == 1) sparkDdlType(nonNull.head)
        else
          // AvroSerDe reads a multi-branch union as uniontype<T0..Tn>
          // (null branch = column nullability); map onto the engine's
          // declared struct-tag encoding, matching HiveDdl's text lane
          nonNull.zipWithIndex
            .map { case (b, i) => s"field$i:${sparkDdlType(b)}" }
            .mkString("struct<tag:tinyint,", ",", ">")
      case other => throw new IllegalArgumentException(
        s"AvroIO: unsupported avro type $other")
    }
  }

  /** (name, DDL type) columns of a record-typed avro.schema.literal. */
  def columnsOf(schemaJson: String): Seq[(String, String)] = {
    val s = new Schema.Parser().parse(schemaJson)
    require(s.getType == Schema.Type.RECORD, s"avro.schema.literal is not a record: $s")
    s.getFields.asScala.map(f => (f.name, sparkDdlType(f.schema))).toSeq
  }

  // ---- value conversion --------------------------------------------------

  private def toAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case TimestampType =>
        val ts = v.asInstanceOf[java.sql.Timestamp]
        ts.getTime * 1000L + (ts.getNanos % 1000000L) / 1000L
      case TimestampNTZType =>
        val ldt = v.asInstanceOf[java.time.LocalDateTime]
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
      case DateType =>
        v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt
      case BinaryType => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case ArrayType(elem, _) =>
        v.asInstanceOf[scala.collection.Seq[Any]].map(toAvro(_, elem)).asJava
      case _ => v
    }
  }

  private def fromAvro(v: Any, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => v.toString // Utf8 -> String
      case TimestampType =>
        val micros = v.asInstanceOf[Long]
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case TimestampNTZType =>
        val micros = v.asInstanceOf[Long]
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(micros, 1000000L),
          (Math.floorMod(micros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
      case DateType =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case BinaryType =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case ArrayType(elem, _) =>
        v.asInstanceOf[java.util.List[Any]].asScala.map(fromAvro(_, elem)).toSeq
      case _ => v
    }
  }

  // ---- writer ------------------------------------------------------------

  /** Write `df` as a directory of Avro container files, one per partition.
    *
    * Commit protocol (the part a naive writer gets wrong): each task
    * streams to an attempt-private temp name and RENAMES to the final
    * part file only on successful completion, so failed/zombie/speculative
    * attempts never leave a partial or interleaved container under a
    * final name; the driver then writes a `_SUCCESS` marker, and
    * [[read]] refuses a directory without one — a half-finished job
    * reads as an error, not as silently missing rows. */
  def write(df: DataFrame, path: String): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroJson = toAvroSchema(schema).toString
    val hconf = spark.sparkContext.broadcast(
      new SerializableWritable(spark.sparkContext.hadoopConfiguration))

    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    fs.mkdirs(dir)

    df.rdd.foreachPartition { rows =>
      val ctx = TaskContext.get()
      val part = ctx.partitionId()
      val avroSchema = new Schema.Parser().parse(avroJson)
      val conf = hconf.value.value
      val fsx = new Path(path).getFileSystem(conf)
      val finalPath = new Path(path, f"part-$part%05d.avro")
      val tmpPath = new Path(path,
        f".part-$part%05d-attempt-${ctx.taskAttemptId()}%d.avro.tmp")
      val out = fsx.create(tmpPath, true)
      val writer = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(avroSchema, out)
      var committed = false
      try {
        rows.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          var i = 0
          while (i < schema.length) {
            rec.put(i, toAvro(row.get(i), schema(i).dataType)); i += 1
          }
          writer.append(rec)
        }
        writer.close()
        // FIRST attempt to commit wins; both attempts hold identical
        // data, so a loser simply discards its temp. Never delete-then-
        // rename: a zombie speculative attempt could delete the winner's
        // committed file and die before its own rename, leaving _SUCCESS
        // blessing a directory with a silently missing partition.
        val won = fsx.rename(tmpPath, finalPath)
        if (!won && !fsx.exists(finalPath))
          throw new java.io.IOException(s"commit rename failed: $tmpPath")
        if (!won) fsx.delete(tmpPath, false) // lost the race: identical data landed
        committed = true
      } finally {
        if (!committed) { try writer.close() catch { case _: Exception => () }
                          fsx.delete(tmpPath, false); () }
      }
    }
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  // ---- reader ------------------------------------------------------------

  /** Read a directory of Avro container files with a declared Spark schema
    * (schema-on-read, matched by field name — same contract as the
    * reference's avro.schema.literal table property). */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val dir = new Path(path)
    val fs = dir.getFileSystem(conf)
    require(fs.exists(new Path(dir, "_SUCCESS")),
      s"AvroIO.read: $path has no _SUCCESS marker — refusing a (possibly " +
        "partial) uncommitted write")
    val files = fs.listStatus(dir).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString).sorted
    require(files.nonEmpty, s"AvroIO.read: no .avro files under $path")

    val hconf = spark.sparkContext.broadcast(new SerializableWritable(conf))
    val fieldNames = schema.fieldNames
    val fieldTypes = schema.fields.map(_.dataType)

    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { file =>
        val in = new FsInput(new Path(file), hconf.value.value)
        val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        // close on task completion, not only on iterator exhaustion — a
        // short-circuiting consumer (limit, take) abandons the iterator
        // mid-stream and would otherwise leak the file handle
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          try reader.close() catch { case _: Exception => () }
        })
        new Iterator[Row] {
          def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fieldNames.indices.map { i =>
              fromAvro(rec.get(fieldNames(i)), fieldTypes(i))
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  // ---- raw container ingestion (LOAD DATA of .avro files) -----------------

  /** Schema-aware conversion of one decoded Avro value to the declared
    * Spark type: the FILE's schema decides how to interpret raw ints and
    * longs (date/timestamp-millis/micros logical types, decimal bytes),
    * then the value coerces to the declared column type — the same
    * resolution the reference's AvroDeserializer performs. */
  /** Old-Hive decimal marker: `"logicalType":"decimal"` with STRING
    * precision/scale props that avro's LogicalTypes parser rejects. */
  private def decimalProp(s: Schema): Boolean =
    Option(s.getProp("logicalType")).contains("decimal")

  private def convert(v: Any, s: Schema, dt: DataType): Any = {
    import Schema.Type._
    if (v == null) return null
    val sch =
      if (s.getType == UNION) {
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        require(nonNull.size == 1, s"AvroIO: multi-branch union not supported: $s")
        nonNull.head
      } else s
    val logical = Option(sch.getLogicalType).map(_.getName).getOrElse("")
    (sch.getType, dt) match {
      case (INT, DateType) if logical == "date" =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case (LONG, TimestampType) =>
        val micros = logical match {
          case "timestamp-micros" => v.asInstanceOf[Long]
          case _ => v.asInstanceOf[Long] * 1000L // timestamp-millis (AvroSerDe's form)
        }
        val ts = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
        ts.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
        ts
      case (BYTES | FIXED, d: DecimalType) if logical == "decimal" || decimalProp(sch) =>
        val bytes = v match {
          case bb: ByteBuffer =>
            val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
          case gf: org.apache.avro.generic.GenericFixed => gf.bytes()
        }
        // old Hive wrote scale/precision as STRING props, which avro's
        // LogicalTypes parser rejects — AvroSerdeUtils reads the raw prop
        val scale = Option(sch.getLogicalType)
          .collect { case dl: LogicalTypes.Decimal => dl.getScale }
          .orElse(Option(sch.getProp("scale")).map(_.replace("\"", "").trim.toInt))
          .getOrElse(0)
        new java.math.BigDecimal(new java.math.BigInteger(bytes), scale)
          .setScale(d.scale, java.math.RoundingMode.HALF_UP)
      case (BYTES, BinaryType) =>
        val bb = v.asInstanceOf[ByteBuffer]
        val arr = new Array[Byte](bb.remaining()); bb.duplicate().get(arr); arr
      case (FIXED, BinaryType) => v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes()
      case (STRING | ENUM, StringType) => v.toString
      case (ARRAY, ArrayType(elem, _)) =>
        v.asInstanceOf[java.util.List[Any]].asScala
          .map(convert(_, sch.getElementType, elem)).toSeq
      case (MAP, MapType(_, vt, _)) =>
        // the reference's AvroDeserializer materializes maps into a
        // String-keyed java.util.HashMap, and SELECT renders them in ITS
        // iteration order — reproduce that order (ListMap preserves it
        // through Catalyst's map conversion)
        val hm = new java.util.HashMap[String, Any]()
        v.asInstanceOf[java.util.Map[Any, Any]].asScala
          .foreach { case (k, mv) => hm.put(k.toString, convert(mv, sch.getValueType, vt)) }
        scala.collection.immutable.ListMap(
          hm.entrySet().asScala.toSeq.map(e => e.getKey -> e.getValue): _*)
      case (RECORD, st: StructType) =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(st.fields.toIndexedSeq.map { f =>
          Option(rec.getSchema.getField(f.name)) match {
            case Some(rf) => convert(rec.get(rf.pos), rf.schema, f.dataType)
            case None => null
          }
        })
      case (_, LongType) => v.asInstanceOf[Number].longValue()
      case (_, IntegerType) => v.asInstanceOf[Number].intValue()
      case (_, DoubleType) => v.asInstanceOf[Number].doubleValue()
      case (_, FloatType) => v.asInstanceOf[Number].floatValue()
      case (_, StringType) => v.toString
      case _ => v
    }
  }

  /** Read bare Avro container files (a single file or a directory of
    * files as LOAD DATA delivers them — no commit marker) against the
    * table's declared Spark schema. `readerSchemaJson`, when the table
    * declared `avro.schema.literal`, resolves schema evolution the
    * reference's way (AvroSerdeUtils.determineSchemaOrThrowException):
    * fields absent from the file take the reader schema's defaults. */
  def readRaw(spark: SparkSession, path: String, schema: StructType,
              readerSchemaJson: Option[String] = None): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    require(fs.exists(root), s"AvroIO.readRaw: $path does not exist")
    val files =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_") &&
            !st.getPath.getName.startsWith("."))
          .map(_.getPath.toString).sorted
      else Seq(path)
    require(files.nonEmpty, s"AvroIO.readRaw: no files under $path")
    val hconf = spark.sparkContext.broadcast(new SerializableWritable(conf))
    val fields = schema.fields
    val rows = spark.sparkContext
      .parallelize(files, files.length)
      .flatMap { file =>
        val in = new FsInput(new Path(file), hconf.value.value)
        val datum = readerSchemaJson match {
          case Some(json) =>
            new GenericDatumReader[GenericRecord](null, new Schema.Parser().parse(json))
          case None => new GenericDatumReader[GenericRecord]()
        }
        val reader = DataFileReader.openReader(in, datum)
        // decimal BYTES decode at the WRITER's scale (avro schema
        // resolution never rescales bytes; the declared-scale conversion
        // happens after decode, as AvroDeserializer does)
        val writerSchema = reader.getSchema
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
          try reader.close() catch { case _: Exception => () }
        })
        new Iterator[Row] {
          def hasNext: Boolean = { val h = reader.hasNext; if (!h) reader.close(); h }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq(fields.toIndexedSeq.map { f =>
              Option(rec.getSchema.getField(f.name)) match {
                case Some(rf) =>
                  val decodeSch = Option(writerSchema.getField(f.name))
                    .map(_.schema).getOrElse(rf.schema)
                  convert(rec.get(rf.pos), decodeSch, f.dataType)
                case None => null
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }
}
