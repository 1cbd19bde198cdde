package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-format surface beyond the oracle round-trips: compression
  * codecs per format (the reference's
  * hive.exec.compress.output/mapred.output.compression.codec surface) and
  * scan-level pushdown parity for ORC. */
class FormatsSpec extends AnyFunSuite {
  import TestSession._

  private def roundTrip(fmt: String, codec: String): Unit = {
    val src = Tables.nation(spark, sf)
    val path = s"target/fmtspec/${fmt}_$codec"
    val w = src.write.mode("overwrite").option("compression", codec)
    fmt match {
      case "csv" => w.option("header", "true").csv(path)
      case "json" => w.json(path)
      case "orc" => w.orc(path)
      case "parquet" => w.parquet(path)
    }
    val r = fmt match {
      case "csv" => spark.read.schema(src.schema).option("header", "true").csv(path)
      case "json" => spark.read.schema(src.schema).json(path)
      case "orc" => spark.read.orc(path)
      case "parquet" => spark.read.parquet(path)
    }
    assert(r.count() == src.count(), s"$fmt/$codec lost rows")
    assert(r.agg(sum("n_nationkey")).collect()(0).getLong(0)
        == src.agg(sum("n_nationkey")).collect()(0).getLong(0), s"$fmt/$codec corrupted values")
  }

  test("compressed round-trips per format") {
    roundTrip("csv", "gzip")
    roundTrip("json", "gzip")
    roundTrip("orc", "zlib")
    roundTrip("orc", "snappy")
    roundTrip("parquet", "zstd")
  }

  test("ORC scans push filters and prune columns like parquet") {
    val path = "target/fmtspec/lineitem_orc_plan"
    Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
      .write.mode("overwrite").orc(path)
    val p = spark.read.orc(path)
      .filter(col("l_quantity") > 30)
      .groupBy("l_returnflag").agg(sum("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity"), p.take(2000))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), readSchema)
  }

  test("malformed rows follow the SerDe tolerance contract per mode") {
    // LazySimpleSerDe nulls unparseable fields instead of failing the
    // job; Spark's PERMISSIVE mode is the same contract, with
    // DROPMALFORMED / FAILFAST as the stricter variants.
    import spark.implicits._
    val path = "target/fmtspec/malformed_csv"
    Seq("1,alpha,10.5", "2,beta,not_a_number", "broken row with no commas", "4,delta,2.25")
      .toDF("value").coalesce(1).write.mode("overwrite").text(path)
    val schema = "id INT, name STRING, score DOUBLE"
    val permissive = spark.read.schema(schema).csv(path)
    assert(permissive.count() == 4)
    assert(permissive.filter(col("score").isNull).count() == 2,
      "bad double and short row must null-fill, not fail")
    // materialize every column: with CSV column pruning a bare count()
    // never parses the fields, so malformed rows go undetected
    val dropped = spark.read.schema(schema).option("mode", "DROPMALFORMED").csv(path)
      .select("id", "name", "score").collect()
    assert(dropped.length == 2, "DROPMALFORMED keeps only clean rows")
    val e = intercept[Exception] {
      spark.read.schema(schema).option("mode", "FAILFAST").csv(path).collect()
    }
    assert(e.getMessage.toLowerCase.contains("malformed"), e.getMessage)
  }

  test("SequenceFile round-trips via the RDD API (HiveSequenceFileOutputFormat analog)") {
    // the one format whose Spark mapping is genuinely the RDD layer
    // (SURVEY.md §1.3): key-value pairs, splittable, no DataFrame source
    val path = "target/fmtspec/nation_seq"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(path), true)
    val src = Tables.nation(spark, sf)
    src.select("n_nationkey", "n_name").rdd
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
      .saveAsSequenceFile(path)
    val back = spark.sparkContext.sequenceFile[Long, String](path)
    assert(back.count() == src.count())
    assert(back.collect().toMap == src.collect()
      .map(r => r.getAs[Number](0).longValue() -> r.getString(1)).toMap)
  }

  test("vendored Avro writer/reader round-trips every supported type") {
    import spark.implicits._
    import java.sql.{Date, Timestamp}
    val ts = Timestamp.valueOf("2024-03-15 12:34:56.789123")
    val src = Seq(
      (1L, Some(42), 3.5f, 2.25, true, "alpha", Array[Byte](1, 2, 3),
       Some(Date.valueOf("2024-03-15")), Some(ts), Seq(1.0, 2.0, 3.0)),
      (2L, None, -1.5f, 0.0, false, "has \"quotes\" and, commas", Array[Byte](),
       None, None, Seq.empty[Double])
    ).toDF("id", "i", "f", "d", "b", "s", "bin", "dt", "ts", "arr")
    val path = "target/fmtspec/alltypes_avro"
    sources.AvroIO.write(src, path)
    val back = sources.AvroIO.read(spark, path, src.schema).orderBy("id").collect()
    val orig = src.orderBy("id").collect()
    assert(back.length == orig.length)
    orig.indices.foreach { r =>
      src.schema.indices.foreach { c =>
        (orig(r).get(c), back(r).get(c)) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), s"row $r col $c")
          case (a, b) => assert(a == b, s"row $r col ${src.schema(c).name}: $a != $b")
        }
      }
    }
    // micros precision must survive exactly (timestamp-micros logical type)
    assert(back(0).getTimestamp(8).getNanos == 789123000)
  }

  test("Avro reader parallelism is one task per container file") {
    val src = Tables.nation(spark, sf).repartition(4)
    val path = "target/fmtspec/nation_avro_parts"
    sources.AvroIO.write(src, path)
    val back = sources.AvroIO.read(spark, path, src.schema)
    assert(back.rdd.getNumPartitions == 4, "file-per-task parallelism")
    assert(back.count() == src.count())
  }

  test("Avro read refuses an uncommitted directory (no _SUCCESS)") {
    val src = Tables.region(spark, sf)
    val path = "target/fmtspec/region_avro_commit"
    sources.AvroIO.write(src, path)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path, "_SUCCESS"), false)
    val e = intercept[IllegalArgumentException] {
      sources.AvroIO.read(spark, path, src.schema)
    }
    assert(e.getMessage.contains("_SUCCESS"), e.getMessage)
    // no stray temp files survive a successful commit either
    sources.AvroIO.write(src, path)
    val leftovers = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .map(_.getPath.getName).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, leftovers.mkString(","))
    assert(sources.AvroIO.read(spark, path, src.schema).count() == src.count())
  }

  test("Avro rejects unsupported types loudly at write time") {
    import spark.implicits._
    val bad = Seq((1, Map("k" -> 1))).toDF("id", "m")
    val e = intercept[IllegalArgumentException] {
      sources.AvroIO.write(bad, "target/fmtspec/bad_avro")
    }
    assert(e.getMessage.contains("unsupported type"), e.getMessage)
  }

  test("RCFile round-trips typed rows through the real RCFileInput/OutputFormat") {
    import spark.implicits._
    val src = Seq(
      (1L, "alpha", 3.5, "2024-01-02"),
      (2L, "has\ttab? no — text cells are length-prefixed, tabs survive", -0.25, "1999-12-31"),
      (3L, null.asInstanceOf[String], 1.0e7, "2024-06-30"))
      .toDF("id", "s", "v", "d")
      .select(col("id"), col("s"), col("v"), col("d").cast("date").as("d"))
    val path = "target/fmtspec/rcfile_rt"
    sources.RcFileIO.write(src, path)
    val back = sources.RcFileIO.read(spark, path, src.schema)
    // field names/types round-trip; the reader is nullable-everywhere by
    // design (any text cell can be \N), so nullability is not compared
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
        == src.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.orderBy("id").collect()
    val want = src.orderBy("id").collect()
    assert(got.toSeq == want.toSeq)
    // NULL really travels as the \N marker, not the 4-char string
    assert(got(2).isNullAt(1))
  }

  test("RCFile gzip-compressed round-trip: codec restored from file metadata") {
    import spark.implicits._
    val src = (1 to 500).map(i => (i.toLong, "text " * 20 + i)).toDF("id", "s")
    val plain = "target/fmtspec/rcfile_plain"
    val gz = "target/fmtspec/rcfile_gz"
    sources.RcFileIO.write(src, plain)
    sources.RcFileIO.write(src, gz, codec = Some("gzip"))
    // reader needs no codec hint: RCFile stores the codec class per file
    val back = sources.RcFileIO.read(spark, gz, src.schema)
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
    def bytes(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-")).map(_.length()).sum
    assert(bytes(gz) < bytes(plain) / 2,
      s"gzip rcfile not smaller: ${bytes(gz)} vs ${bytes(plain)}")
    intercept[IllegalArgumentException] {
      sources.RcFileIO.write(src, gz, codec = Some("zstd"))
    }
  }

  test("RCFile schema evolution: missing trailing columns read as NULL") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val src = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val path = "target/fmtspec/rcfile_evolve"
    sources.RcFileIO.write(src, path)
    val widened = StructType(src.schema.fields :+ StructField("added", IntegerType))
    val back = sources.RcFileIO.read(spark, path, widened).orderBy("id").collect()
    assert(back.length == 2 && back.forall(_.isNullAt(2)))
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "a")
  }

  test("RCFile scan distributes: one task per file, no driver materialization") {
    // multi-partition write -> multiple rcfiles -> the read RDD keeps at
    // least that parallelism (splittable FileInputFormat path)
    import spark.implicits._
    val src = (1 to 100).map(i => (i.toLong, s"row$i")).toDF("id", "s").repartition(4)
    val path = "target/fmtspec/rcfile_par"
    sources.RcFileIO.write(src, path)
    val back = sources.RcFileIO.read(spark, path, src.schema)
    assert(back.rdd.getNumPartitions >= 4,
      s"expected >=4 read partitions, got ${back.rdd.getNumPartitions}")
    assert(back.count() == 100)
  }

  test("skip.header/footer.line.count skip lines per FILE across a multi-file table") {
    // HiveContextAwareRecordReader.java:304-336 skips header and footer
    // lines of EACH file (the reference makes footer'd files
    // unsplittable); two files must each lose their own header + 2
    // footers, not 1+2 lines of the concatenated table
    val dir = java.nio.file.Files.createTempDirectory("graft_hdrftr")
    def put(name: String, body: String): Unit =
      java.nio.file.Files.write(dir.resolve(name),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    put("f1.txt", "k\tv\na\t1\nb\t2\nfoot1\t0\nfoot2\t0\n")
    put("f2.txt", "k\tv\nc\t3\nfoot1\t0\nfoot2\t0\n")
    put("empty.txt", "")
    val stmts = graft.compat.HiveDdl.translateStatements(
      "CREATE EXTERNAL TABLE graft_hf (k STRING, v INT) ROW FORMAT " +
        "DELIMITED FIELDS TERMINATED BY '\\t' LOCATION '" + dir + "' " +
        "tblproperties ('skip.header.line.count'='1', " +
        "'skip.footer.line.count'='2')",
      Set.empty, Set.empty)
    try {
      stmts.foreach(spark.sql(_))
      val rows = spark.sql("SELECT k, v FROM graft_hf ORDER BY k")
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      assert(rows == Seq(("a", 1), ("b", 2), ("c", 3)))
    } finally {
      spark.sql("DROP VIEW IF EXISTS graft_hf")
      spark.sql("DROP TABLE IF EXISTS graft_hf__lines")
    }
  }

  test("delimited text survives values containing the quote character") {
    import spark.implicits._
    val tricky = Seq((1L, "plain"), (2L, "has \"quotes\""), (3L, "comma, inside"),
                     (4L, "newline \\n escape"), (5L, ""))
      .toDF("id", "s")
    val path = "target/fmtspec/tricky_csv"
    tricky.write.mode("overwrite").option("header", "true").csv(path)
    val back = spark.read.schema(tricky.schema).option("header", "true").csv(path)
      .na.fill("", Seq("s"))
    assert(back.orderBy("id").collect().map(_.getString(1)).toSeq
        == tricky.orderBy("id").collect().map(_.getString(1)).toSeq)
  }
}
