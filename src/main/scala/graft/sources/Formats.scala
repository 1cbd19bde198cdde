package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Storage-format surface: the reference's non-parquet SerDes re-expressed
  * as Spark datasources.
  *
  *  - delimited text  <- serde/src/java/org/apache/hadoop/hive/serde2/lazy/LazySimpleSerDe.java
  *  - CSV             <- serde/src/java/org/apache/hadoop/hive/serde2/OpenCSVSerde.java
  *  - JSON            <- hcatalog/core/src/main/java/org/apache/hive/hcatalog/data/JsonSerDe.java
  *  - ORC             <- ql/src/java/org/apache/hadoop/hive/ql/io/orc/OrcInputFormat.java
  *  - regex-parsed    <- serde/src/java/org/apache/hadoop/hive/serde2/RegexSerDe.java
  *
  * Each query is a full round-trip: write the parquet fixture out in the
  * target format, read it back through Spark's reader, aggregate — and the
  * DuckDB oracle computes the same aggregate straight from the parquet
  * source, so any encode/decode divergence (quoting, null encoding, date
  * formats, type mapping) breaks the hash match.
  *
  * Scale notes: every format here is a splittable scan in Spark except
  * multiline JSON (not used); ORC/parquet carry column pruning + predicate
  * pushdown, text/CSV/JSON are schema-on-read full scans exactly like the
  * reference's SerDe path. Writes land under target/fmt/<sf>/ keyed by the
  * source dir so concurrent sf runs don't collide. Hive's AvroSerDe is
  * covered by the vendored [[AvroIO]] (the spark-avro datasource jar is not
  * in this distribution, but the core avro library is).
  */
object Formats {

  private def tmpDir(sfDir: String, name: String): String =
    s"target/fmt/${new java.io.File(sfDir).getName}/$name"

  /** CSV round-trip (OpenCSVSerde): quoting + header + explicit read
    * schema (CSV is stringly — schema-on-read like the SerDe's
    * columns.types). */
  val q100_csv_roundtrip: Q = (s, d) => {
    val src = Tables.customer(s, d)
    val path = tmpDir(d, "customer_csv")
    src.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)
    s.read.schema(src.schema).option("header", "true").csv(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
           sum(col("c_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** ORC round-trip: columnar scan with pruning/pushdown parity to the
    * reference's OrcInputFormat path. */
  val q101_orc_scan: Q = (s, d) => {
    val src = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"),
              col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val path = tmpDir(d, "lineitem_orc")
    src.write.mode(SaveMode.Overwrite).orc(path)
    s.read.orc(path)
      .filter(col("l_discount") > 0.02)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(DecimalType(25, 2))).cast("double").as("sum_qty"),
           sum(col("l_extendedprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** JSON-lines round-trip (JsonSerDe): dates/decimals survive via the
    * explicit read schema. */
  val q102_json_source: Q = (s, d) => {
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderdate"))
    val path = tmpDir(d, "orders_json")
    src.write.mode(SaveMode.Overwrite).json(path)
    s.read.schema(src.schema).json(path)
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_year"), col("o_orderstatus"))
  }

  /** LazySimpleSerDe-style delimited text: -separated fields,
    * schema-on-read via split + cast (the lazy-deserialization contract:
    * strings stay raw until a field is touched). */
  val q103_text_delimited: Q = (s, d) => {
    val src = Tables.supplier(s, d)
    val path = tmpDir(d, "supplier_text")
    src.select(concat_ws("",
        col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val parts = split(col("value"), "")
    s.read.text(path)
      .select(parts.getItem(0).cast("long").as("s_suppkey"),
              parts.getItem(1).as("s_name"),
              parts.getItem(2).cast("long").as("s_nationkey"),
              parts.getItem(3).cast("double").as("s_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
           sum(col("s_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"))
      .orderBy(col("s_nationkey"))
  }

  /** RegexSerDe: log-style lines parsed by regexp_extract groups (the
    * serde's input.regex -> one column per capture group). */
  val q104_regex_text: Q = (s, d) => {
    val src = Tables.part(s, d)
    val path = tmpDir(d, "part_log")
    src.select(format_string("part=%d brand=%s size=%d", col("p_partkey"),
        col("p_brand"), col("p_size")).as("value"))
      .write.mode(SaveMode.Overwrite).text(path)
    val re = "part=([0-9]+) brand=(.*) size=([0-9]+)"
    s.read.text(path)
      .select(regexp_extract(col("value"), re, 1).cast("long").as("p_partkey"),
              regexp_extract(col("value"), re, 2).as("p_brand"),
              regexp_extract(col("value"), re, 3).cast("long").as("p_size"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"), sum(col("p_size")).as("sum_size"),
           min(col("p_partkey")).as("min_key"))
      .orderBy(col("p_brand"))
  }

  /** Avro round-trip (AvroSerDe,
    * serde/src/java/org/apache/hadoop/hive/serde2/avro/AvroSerDe.java:48):
    * write orders through the vendored container-file writer, read back
    * with a declared schema, aggregate. The oracle computes the same
    * aggregate from parquet, so any encode/decode divergence (timestamp
    * micros mapping, union-null handling, field-name matching) breaks the
    * hash. */
  val q137_avro_roundtrip: Q = (s, d) => {
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
              col("o_totalprice"), col("o_orderdate"))
    val path = tmpDir(d, "orders_avro")
    AvroIO.write(src, path)
    AvroIO.read(s, path, src.schema)
      .groupBy(year(col("o_orderdate")).as("o_year"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           min(col("o_orderkey")).as("min_key"))
      .orderBy(col("o_year"), col("o_orderstatus"))
  }

  /** RCFile round-trip (RCFile.java + ColumnarSerDe): write orders through
    * the real RCFileOutputFormat, scan back through RCFileInputFormat with
    * schema-on-read text decoding, aggregate. Covers long/string/double/
    * date-ish types plus NULL cells (`\N` encoding) via the nullif lane;
    * the oracle computes the same aggregate from parquet, so any
    * encode/decode divergence breaks the hash. */
  val q255_rcfile_roundtrip: Q = (s, d) => {
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"),
              nullif(col("o_orderstatus"), lit("P")).as("status_np"),
              col("o_totalprice"), col("o_orderdate"))
    val path = tmpDir(d, "orders_rcfile")
    RcFileIO.write(src, path)
    RcFileIO.read(s, path, src.schema)
      .groupBy(year(col("o_orderdate")).as("o_year"), col("status_np"))
      .agg(count(lit(1)).as("n_orders"),
           count(col("status_np")).as("n_nonnull"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           min(col("o_orderkey")).as("min_key"))
      // nulls LAST explicitly: Spark defaults nulls-first, DuckDB
      // nulls-last — the oracle hash compares row order
      .orderBy(col("o_year"), col("status_np").asc_nulls_last)
  }

  /** External-storage-handler analog (hbase-handler/src/java/org/apache/
    * hadoop/hive/hbase/HBaseStorageHandler.java:90 + its
    * decomposePredicate split): documents keyed by doc_id live in the
    * graftkv sorted-segment store and are read back through the
    * DataSource V2 connector ([[KvSource]]) with a key-range predicate.
    * The connector prunes segments by key range (HBase region pruning)
    * and stops each surviving segment at the range's stop-row; the
    * oracle reads the same rows straight from parquet, so the hash
    * proves the store round trip AND that pruning is a sound superset.
    * KvHandlerSpec pins the pruning itself (fewer splits than
    * segments). */
  val q295_kv_handler: Q = (s, d) => {
    val dir = tmpDir(d, "kv_documents")
    KvStore.write(s,
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      dir, "doc_id", numSegments = 8)
    s.read.format("graftkv").load(dir)
      .filter(col("doc_id") >= 50 && col("doc_id") <= 249)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_id"),
           max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"))
  }

  /** List bucketing / SKEWED BY (HiveParser.g tableSkewed +
    * ListBucketingPruner.java:57): orders written list-bucketed on
    * o_orderstatus with hot values ('O','F'), read back through
    * [[SkewedTables.read]] with a plain IN ('O','P') filter. 'O' is hot
    * (own directory), 'P' is cold (default directory) — [[graft.plans
    * .SkewRoute]] conjoins `__skew_dir IN ('O','__SKEW_DEFAULT__')`, so
    * the 'F' directory is partition-pruned away; the DuckDB oracle
    * computes the same answer from the unskewed base table, proving the
    * routing is a sound superset. SkewedTablesSpec pins the pruning
    * itself (hot scan reads strictly fewer files; cold scan skips every
    * hot directory). */
  val q302_skewed_route: Q = (s, d) => {
    val dir = tmpDir(d, "orders_skewed")
    SkewedTables.write(Tables.orders(s, d), dir, "o_orderstatus", Seq("O", "F"))
    SkewedTables.read(s, dir)
      .filter(col("o_orderstatus").isin("O", "P"))
      .groupBy(col("o_orderstatus"), year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           min(col("o_orderkey")).as("min_key"))
      .orderBy(col("o_orderstatus"), col("o_year"))
  }

  /** Multi-column list bucketing (tableSkewed's general form: SKEWED BY
    * (c1,c2) ON (('v1','v2'),...)): orders bucketed on the
    * (status, priority) TUPLE. The filter binds both columns — one hot
    * tuple ('O','1-URGENT') and one cold pair ('F','1-URGENT'), whose
    * parts are each hot in SOME tuple but whose combination is cold — so
    * the route reads exactly the hot directory + the default directory;
    * the oracle recomputes from the unskewed base table. */
  val q304_skewed_multi: Q = (s, d) => {
    val dir = tmpDir(d, "orders_skewed_multi")
    SkewedTables.write(Tables.orders(s, d), dir,
      Seq("o_orderstatus", "o_orderpriority"),
      Seq(Seq("O", "1-URGENT"), Seq("F", "5-LOW")), SaveMode.Overwrite)
    SkewedTables.read(s, dir)
      .filter(col("o_orderstatus").isin("O", "F") &&
              col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           min(col("o_orderkey")).as("min_key"),
           max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  /** The handler's WRITE half through SQL (HiveHBaseTableOutputFormat
    * direction): documents INSERT OVERWRITE'd into a graftkv-backed
    * catalog table, then a second slice INSERT INTO'd (append lane, new
    * segments), read back through the same table with key pushdown. The
    * oracle reassembles the identical union straight from parquet, so
    * the hash proves both write lanes land losslessly. */
  val q305_kv_insert: Q = (s, d) => {
    val dir = tmpDir(d, "kv_docs_insert")
    // seed the store so the catalog table can infer its schema
    KvStore.write(s,
      Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
        .filter(col("doc_id") < 0),
      dir, "doc_id", numSegments = 4)
    Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars"))
      .createOrReplaceTempView("q305_docs")
    s.sql("DROP TABLE IF EXISTS q305_kv")
    s.sql(s"CREATE TABLE q305_kv USING graftkv LOCATION '${new java.io.File(dir).getAbsolutePath}'")
    s.sql("INSERT OVERWRITE TABLE q305_kv SELECT * FROM q305_docs WHERE doc_id % 2 = 0")
    s.sql("INSERT INTO q305_kv SELECT * FROM q305_docs WHERE doc_id % 2 = 1")
    s.table("q305_kv")
      .filter(col("doc_id") >= 100 && col("doc_id") <= 499)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("sum_chars"),
           min(col("doc_id")).as("min_id"),
           max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"))
  }

  /** The round-11/12 avro.schema.literal INGESTION lane end to end:
    * write a container file with AvroIO, derive the table columns from
    * the embedded schema the way a `tblproperties('avro.schema.literal')`
    * CREATE does (AvroIO.columnsOf -> sparkDdlType), create the table
    * from that derived DDL, ingest the raw container through
    * AvroIO.read, and aggregate. The oracle reads the same slice from
    * parquet, so a type-mapping or decode divergence breaks the hash. */
  val q309_avro_literal_ingest: Q = (s, d) => {
    val src = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal").cast("double").as("s_acctbal"))
    val path = tmpDir(d, "supplier_avro_lit")
    AvroIO.write(src, path)
    val literal = AvroIO.toAvroSchema(src.schema, "supplier").toString
    val cols = AvroIO.columnsOf(literal)
      .map { case (n, t) => s"`$n` $t" }.mkString(", ")
    s.sql("DROP TABLE IF EXISTS q309_avro_tbl")
    // the catalog is per-JVM but the managed warehouse dir persists —
    // a prior run's location would fail this run's CREATE
    locally {
      val wh = new java.io.File(
        new java.net.URI(s.conf.get("spark.sql.warehouse.dir")).getPath,
        "q309_avro_tbl")
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete(); ()
      }
      if (wh.exists()) rm(wh)
    }
    s.sql(s"CREATE TABLE q309_avro_tbl ($cols) USING parquet")
    AvroIO.read(s, path, s.table("q309_avro_tbl").schema)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .insertInto("q309_avro_tbl")
    s.table("q309_avro_tbl")
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
           min(col("s_name")).as("first_name"),
           sum(col("s_acctbal").cast(DecimalType(20, 2)))
             .cast("double").as("sum_bal"))
      .orderBy(col("s_nationkey"))
  }

  val queries: Map[String, Q] = Map(
    "q309_avro_literal_ingest" -> q309_avro_literal_ingest,
    "q100_csv_roundtrip" -> q100_csv_roundtrip,
    "q302_skewed_route" -> q302_skewed_route,
    "q304_skewed_multi" -> q304_skewed_multi,
    "q305_kv_insert" -> q305_kv_insert,
    "q295_kv_handler" -> q295_kv_handler,
    "q101_orc_scan" -> q101_orc_scan,
    "q102_json_source" -> q102_json_source,
    "q103_text_delimited" -> q103_text_delimited,
    "q104_regex_text" -> q104_regex_text,
    "q137_avro_roundtrip" -> q137_avro_roundtrip,
    "q255_rcfile_roundtrip" -> q255_rcfile_roundtrip,
  )

  /** Oracles read the SAME data straight from parquet — the round-trip
    * must be lossless for the hash to match. */
  val oracles: Map[String, String] = Map(
    "q309_avro_literal_ingest" ->
      """SELECT s_nationkey, count(*) AS n_supp, min(s_name) AS first_name,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(20,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q304_skewed_multi" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM orders
        |WHERE o_orderstatus IN ('O','F') AND o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,
    "q305_kv_insert" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 100 AND doc_id <= 499
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q302_skewed_route" ->
      """SELECT o_orderstatus, CAST(year(o_orderdate) AS INT) AS o_year,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key
        |FROM orders WHERE o_orderstatus IN ('O','P')
        |GROUP BY 1, 2 ORDER BY o_orderstatus, o_year""".stripMargin,
    "q295_kv_handler" ->
      """SELECT lang, COUNT(1) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |  MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents WHERE doc_id >= 50 AND doc_id <= 249
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q100_csv_roundtrip" ->
      """SELECT c_mktsegment, COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q101_orc_scan" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  COUNT(1) AS n_rows
        |FROM lineitem WHERE l_discount > 0.02
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q102_json_source" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_orderstatus""".stripMargin,
    "q103_text_delimited" ->
      """SELECT s_nationkey, COUNT(1) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal
        |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q104_regex_text" ->
      """SELECT p_brand, COUNT(1) AS n_parts,
        |  CAST(SUM(p_size) AS BIGINT) AS sum_size,
        |  MIN(p_partkey) AS min_key
        |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q137_avro_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, o_orderstatus,
        |  COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_orderstatus""".stripMargin,
    "q255_rcfile_roundtrip" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
        |  NULLIF(o_orderstatus, 'P') AS status_np,
        |  COUNT(1) AS n_orders,
        |  COUNT(NULLIF(o_orderstatus, 'P')) AS n_nonnull,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key
        |FROM orders GROUP BY 1, 2 ORDER BY o_year, status_np""".stripMargin,
  )
}
