package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.etl.MultiInsert
import graft.acid.{CopyOnWrite, Versioned}

/** Storage-side operator surfaces promoted to oracle-checked round
  * trips: SMB (bucketed) joins, partitioned FileSink, multi-insert
  * fan-out, and ACID MERGE. Each query WRITES through the operator under
  * test, reads the result back, and aggregates — the DuckDB oracle
  * computes the same answer straight from the parquet sources, so the
  * storage layer must be lossless AND the operator semantics exact for
  * the hash to match.
  *
  * (These surfaces were previously pinned by ScalaTest only —
  * BucketingSpec / EtlSpec / AcidSpec keep the plan-shape and
  * counter-level assertions; these rows put them under the driver's
  * external gate too.)
  */
object StorageOps {

  private def tmp(sfDir: String, name: String): String =
    s"target/storage/${new java.io.File(sfDir).getName}/$name"

  private def dbFor(sfDir: String): String =
    "graft_smb_" + new java.io.File(sfDir).getName.replace('.', '_')

  /** SMB join (reference SMBMapJoinOperator.java / CommonMergeJoinOperator
    * .java): both sides bucketed+sorted on the join key at write time, so
    * the join needs NO exchange — the 100 TB contract for repeated joins
    * on the same key. BucketingSpec pins the zero-exchange plan; this row
    * pins the results through the driver gate. */
  val q149_smb_join: Q = (s, d) => {
    val db = dbFor(d)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    // an in-memory catalog forgets tables across JVMs but their warehouse
    // directories persist — drop AND clear the stale locations, or
    // saveAsTable fails with LOCATION_ALREADY_EXISTS on the next session
    val dbLoc = new org.apache.hadoop.fs.Path(s.catalog.getDatabase(db).locationUri)
    val fs = dbLoc.getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq("orders_smb", "lineitem_smb").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $db.$t")
      val loc = new org.apache.hadoop.fs.Path(dbLoc, t)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    Tables.orders(s, d).write.mode(SaveMode.Overwrite)
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_smb")
    Tables.lineitem(s, d).write.mode(SaveMode.Overwrite)
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_smb")
    s.table(s"$db.lineitem_smb")
      .join(s.table(s"$db.orders_smb"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast(DecimalType(25, 2))).cast("double").as("sum_qty"))
      .orderBy(col("o_orderstatus"))
  }

  /** Partitioned FileSink (FileSinkOperator.java dynamic-partition write
    * path): write orders partitioned by status, read back with a
    * partition filter — the scan must prune to the one partition
    * directory (PartitionFilters, no data read from the others). */
  val q150_partitioned_sink: Q = (s, d) => {
    val path = tmp(d, "orders_parted")
    Tables.orders(s, d).write.mode(SaveMode.Overwrite)
      .partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderstatus") === "F")
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_year"))
  }

  /** Multi-insert fan-out (SemanticAnalyzer.genBodyPlan: one scan, many
    * FileSinks): one materialization of orders feeds two destination
    * writes; the query reads both destinations back and aggregates, so
    * any per-destination re-scan divergence or routing error breaks the
    * hash. */
  val q151_multi_insert: Q = (s, d) => {
    val (a, b) = (tmp(d, "mi_f"), tmp(d, "mi_o"))
    MultiInsert.from(Tables.orders(s, d))
      .insert(a)(_.filter(col("o_orderstatus") === "F"))
      .insert(b)(_.filter(col("o_orderstatus") === "O"))
      .run()
    s.read.parquet(a).unionAll(s.read.parquet(b))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** ACID MERGE (MergeSemanticAnalyzer.java; copy-on-write flavor):
    * refresh a COW copy of customer, merge in updates (+100 balance for
    * one segment) plus brand-new rows, read the merged table back. The
    * oracle recomputes the merged state relationally from the source —
    * update routing, anti-join survivor logic, and the staged swap must
    * all be exact. */
  val q152_merge_upsert: Q = (s, d) => {
    val path = tmp(d, "customer_cow")
    val base = Tables.customer(s, d)
    base.write.mode(SaveMode.Overwrite).parquet(path)
    val updates = base.filter(col("c_mktsegment") === "BUILDING")
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
    // negated keys are disjoint from real custkeys at ANY scale factor
    // (an additive offset collides once max(c_custkey) exceeds it)
    val inserts = base.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select((-col("c_custkey") - 1L).as("c_custkey"),
              concat(lit("NEW#"), col("c_custkey")).as("c_name"),
              col("c_nationkey"),
              lit(0.0).as("c_acctbal"),
              lit("NEWSEG").as("c_mktsegment"))
    CopyOnWrite.merge(s, path, updates.unionByName(inserts), Seq("c_custkey"))
    s.read.parquet(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
           sum(col("c_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** LOAD DATA INPATH + TRUNCATE TABLE PARTITION round-trip (reference
    * LoadSemanticAnalyzer.java / DDLTask.truncateTable): stage each order
    * status as raw parquet, LOAD each stage into its partition of an
    * empty catalog table (file moves + ADD PARTITION — zero rewrite),
    * then TRUNCATE the 'P' partition. The oracle recomputes the surviving
    * state straight from orders, so a load that loses/duplicates files or
    * a truncate that misses/overshoots its partition breaks the hash. */
  val q189_load_data: Q = (s, d) => {
    val db = dbFor(d)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val dbLoc = new org.apache.hadoop.fs.Path(s.catalog.getDatabase(db).locationUri)
    val fs = dbLoc.getFileSystem(s.sparkContext.hadoopConfiguration)
    s.sql(s"DROP TABLE IF EXISTS $db.orders_loaded")
    val loc = new org.apache.hadoop.fs.Path(dbLoc, "orders_loaded")
    if (fs.exists(loc)) fs.delete(loc, true)

    val base = Tables.orders(s, d)
    // empty partitioned table carrying the full schema
    base.filter(lit(false)).write.mode(SaveMode.Overwrite)
      .partitionBy("o_orderstatus").saveAsTable(s"$db.orders_loaded")
    Seq("F", "O", "P").foreach { st =>
      val stage = tmp(d, s"load_stage_$st")
      base.filter(col("o_orderstatus") === st).drop("o_orderstatus")
        .write.mode(SaveMode.Overwrite).parquet(stage)
      graft.etl.LoadData.sql(s,
        s"LOAD DATA INPATH '$stage' INTO TABLE $db.orders_loaded " +
          s"PARTITION (o_orderstatus='$st')")
    }
    s.sql(s"TRUNCATE TABLE $db.orders_loaded PARTITION (o_orderstatus='P')")
    s.table(s"$db.orders_loaded")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** EXPORT/IMPORT round-trip (reference ExportSemanticAnalyzer.java /
    * ImportSemanticAnalyzer.java): a partitioned copy of customer is
    * exported (data + replayable DDL descriptor), replayed as a fresh
    * table, and aggregated from the IMPORTED side — the oracle computes
    * the same answer from the source table, so the descriptor, the data
    * copy, and partition re-discovery must all be lossless. */
  val q190_export_import: Q = (s, d) => {
    val db = dbFor(d)
    s.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    val dbLoc = new org.apache.hadoop.fs.Path(s.catalog.getDatabase(db).locationUri)
    val fs = dbLoc.getFileSystem(s.sparkContext.hadoopConfiguration)
    Seq("cust_exp", "cust_imp").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $db.$t")
      val loc = new org.apache.hadoop.fs.Path(dbLoc, t)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    val expDir = new org.apache.hadoop.fs.Path(tmp(d, "cust_export"))
    val expFs = expDir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (expFs.exists(expDir)) expFs.delete(expDir, true)

    Tables.customer(s, d).write.mode(SaveMode.Overwrite)
      .partitionBy("c_mktsegment").saveAsTable(s"$db.cust_exp")
    graft.etl.ExportImport.exportTable(s, s"$db.cust_exp", expDir.toString)
    graft.etl.ExportImport.importTable(s, expDir.toString, s"$db.cust_imp")
    s.table(s"$db.cust_imp")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_cust"),
           sum(col("c_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** INSERT OVERWRITE DIRECTORY, statement form (reference
    * SemanticAnalyzer directory-target FileSink): the Hive multi-insert
    * grammar writes a filtered projection to a directory; the query reads
    * the directory back and aggregates, oracle recomputes from source. */
  val q191_overwrite_directory: Q = (s, d) => {
    Tables.registerAll(s, d)
    val dir = tmp(d, "iod_lineitem")
    MultiInsert.sql(s,
      s"""FROM lineitem
         |INSERT OVERWRITE DIRECTORY '$dir'
         |  SELECT l_linestatus, l_quantity, l_extendedprice
         |  WHERE l_returnflag = 'R'""".stripMargin)
    s.read.parquet(dir)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
           sum(col("l_quantity").cast(DecimalType(25, 2))).cast("double").as("sum_qty"))
      .orderBy(col("l_linestatus"))
  }

  /** ACID UPDATE + DELETE (UpdateDeleteSemanticAnalyzer.java, copy-on-
    * write flavor): flag indebted suppliers, delete one nation's rows,
    * read the surviving state back. The oracle recomputes both mutations
    * relationally, so predicate routing, the untouched-row passthrough,
    * and the staged swap must all be exact. */
  val q192_update_delete: Q = (s, d) => {
    val path = tmp(d, "supplier_cow")
    Tables.supplier(s, d).write.mode(SaveMode.Overwrite).parquet(path)
    CopyOnWrite.update(s, path, col("s_acctbal") < 0,
      Map("s_name" -> lit("IN_DEBT")))
    CopyOnWrite.delete(s, path, col("s_nationkey") === 3)
    s.read.parquet(path)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"),
           sum(col("s_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"),
           sum(when(col("s_name") === "IN_DEBT", 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("s_nationkey"))
  }

  /** SequenceFile round-trip (HiveSequenceFileOutputFormat /
    * SequenceFileInputFormat): the one format whose Spark mapping is
    * genuinely the RDD layer (SURVEY §1.3 — key-value pairs, splittable,
    * no DataFrame source). Write (doc_id, lang) pairs, read them back
    * through sequenceFile[Long, String], aggregate — the oracle computes
    * the same rollup from the parquet source, so the binary round trip
    * must be lossless. */
  val q193_seqfile_roundtrip: Q = (s, d) => {
    val path = tmp(d, "docs_seq")
    val fs = org.apache.hadoop.fs.FileSystem.get(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    Tables.documents(s, d).select(col("doc_id"), col("lang")).rdd
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1)))
      .saveAsSequenceFile(path)
    val back = s.sparkContext.sequenceFile[Long, String](path)
    s.createDataFrame(back).toDF("doc_id", "lang")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           min(col("doc_id")).as("min_id"),
           max(col("doc_id")).as("max_id"))
      .orderBy(col("lang"))
  }

  /** Small-file compaction round-trip (the reference's merge-files task,
    * DDLTask ALTER TABLE CONCATENATE kin / txn compactor Worker.java):
    * write orders deliberately fragmented (32 splits), compact via
    * CopyOnWrite.compact — a shuffle-free coalesce rewrite — and
    * aggregate the compacted table. A compaction that loses or
    * duplicates rows breaks the hash; the require makes a silent no-op
    * impossible, so this gate row really exercises the rewrite. */
  val q196_compaction: Q = (s, d) => {
    val path = tmp(d, "orders_compact")
    Tables.orders(s, d).repartition(32).write.mode(SaveMode.Overwrite).parquet(path)
    val (before, after) = CopyOnWrite.compact(s, path)
    require(after < before, s"compaction did not reduce files: $before -> $after")
    s.read.parquet(path)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Compact index route (reference CREATE INDEX ... AS 'COMPACT',
    * ql/index/compact/CompactIndexHandler.java + HiveIndexedInputFormat's
    * split pruning — see sources/CompactIndexIO): write orders
    * range-clustered on o_orderpriority (the layout a sorted insert
    * produces), build the (value, file) index, and answer a selective
    * predicate by scanning ONLY index-named files. The oracle computes
    * the same answer from the base table, so a pruning bug that drops a
    * file (missing rows) or the index mapping a value to wrong files
    * (exact re-filter masks extras, never losses) breaks the hash.
    * FormatsSpec pins that the routed scan actually reads fewer files. */
  val q269_compact_index: Q = (s, d) => {
    val path = tmp(d, "orders_indexed")
    val idx = tmp(d, "orders_idx_priority")
    Tables.orders(s, d).repartitionByRange(8, col("o_orderpriority"), col("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    graft.sources.CompactIndexIO.build(s, path, "o_orderpriority", idx)
    graft.sources.CompactIndexIO.read(s, path, idx, "o_orderpriority", Seq("1-URGENT", "2-HIGH"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Zone-map (min/max) index route for a RANGE predicate — the sibling
    * of q269's value index (reference analogs: ORC stripe stats pruning
    * in ql/io/orc/RecordReaderImpl, bitmap index ranges in ql/index/
    * bitmap/): orders written date-clustered, per-file min/max built,
    * and a one-year BETWEEN answered from only the files whose zone
    * intersects the range. Same soundness shape as q269: the exact
    * re-filter masks over-selection, so only a LOST file can move the
    * hash — which is exactly what the oracle would catch. */
  val q275_minmax_index: Q = (s, d) => {
    val path = tmp(d, "orders_date_clustered")
    val idx = tmp(d, "orders_idx_date")
    Tables.orders(s, d).repartitionByRange(8, col("o_orderdate"))
      .sortWithinPartitions(col("o_orderdate"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    graft.sources.CompactIndexIO.buildMinMax(s, path, "o_orderdate", idx)
    graft.sources.CompactIndexIO.readRange(s, path, idx, "o_orderdate",
        java.sql.Timestamp.valueOf("1996-01-01 00:00:00"),
        java.sql.Timestamp.valueOf("1996-12-31 23:59:59"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Z-order layout + TWO-dimensional zone-map pruning — the layout half
    * ([[ZOrder]]) composed with q275's read half. The reference can sort
    * a table on one vector (`CLUSTERED BY ... SORTED BY`, tableBuckets in
    * ql/.../parse/HiveParser.g), so only the leading column prunes;
    * Morton-interleaving the (custkey, totalprice) ranks clusters BOTH
    * dimensions into every file, and the conjunctive range scan below
    * reads only files whose custkey zone AND totalprice zone intersect
    * the predicate (ZOrderSpec pins the file counts: a fraction of the
    * layout's files vs ALL files under single-column clustering). The
    * exact re-filter masks over-selection, so only a lost file can move
    * the hash — the pruning path itself is inside the oracle contract. */
  val q283_zorder_2d: Q = (s, d) => {
    val path = tmp(d, "orders_zorder")
    val idxC = tmp(d, "orders_idx_z_custkey")
    val idxP = tmp(d, "orders_idx_z_totalprice")
    ZOrder.write(Tables.orders(s, d), Seq("o_custkey", "o_totalprice"), path,
                 bits = 8, numFiles = 16)
    graft.sources.CompactIndexIO.buildMinMax(s, path, "o_custkey", idxC)
    graft.sources.CompactIndexIO.buildMinMax(s, path, "o_totalprice", idxP)
    val files = graft.sources.CompactIndexIO
      .prunedFilesRange(s, idxC, Some(400L), Some(600L)).toSet
      .intersect(graft.sources.CompactIndexIO
        .prunedFilesRange(s, idxP, Some(100000d), Some(200000d)).toSet)
      .toSeq.sorted
    val full = s.read.parquet(path)
    val scanned =
      if (files.isEmpty) full.limit(0)
      else s.read.schema(full.schema).parquet(files: _*)
    scanned
      .filter(col("o_custkey").between(400L, 600L) &&
              col("o_totalprice").between(100000d, 200000d))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** SCD Type 2 dimension maintenance (etl/Scd2) — the two-branch MERGE
    * recipe the reference's MERGE INTO (MergeSemanticAnalyzer.java,
    * q152) leaves to the user, owned by the engine: a customer-segment
    * dimension initialized at 1995-01-01 takes one change batch at
    * 2024-01-15 containing genuine changes, no-op rows (suppressed — no
    * phantom versions), and brand-new keys. The emitted dimension shows
    * closed-out history rows, untouched currents, and the new versions;
    * a point-in-time asOf read is pinned in EtlSpec. */
  val q287_scd2: Q = (s, d) => {
    val base = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val dim0 = graft.etl.Scd2.init(base, lit("1995-01-01"))
    val batch = base.filter(col("c_custkey") % 10 === 3)
      .select(col("c_custkey"), lit("MACHINERY").as("c_mktsegment"))
      .unionByName(base.filter(col("c_custkey") % 97 === 0)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
                lit("AUTOMOBILE").as("c_mktsegment")))
    graft.etl.Scd2.applyChanges(dim0, batch, Seq("c_custkey"), Seq("c_mktsegment"),
                          lit("2024-01-15"))
      .select(col("c_custkey"), col("c_mktsegment"),
              col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  /** Change-data feed between two versioned snapshots (acid/Versioned
    * .diff) — v1 is the orders slice, v2 applies a delete (%13), an
    * update (%7 → status 'X') and inserts (+3,000,000 keys), committed
    * as real snapshot versions; the diff emits the standard four-lane
    * CDC format a downstream incremental consumer would ingest. The
    * oracle recomputes both snapshots and the diff relationally, so
    * every lane (including the update pre/post pair) is hash-checked. */
  val q288_snapshot_diff: Q = (s, d) => {
    val store = tmp(d, "orders_cdc")
    val fsPath = new org.apache.hadoop.fs.Path(store)
    fsPath.getFileSystem(s.sparkContext.hadoopConfiguration).delete(fsPath, true)
    val v1 = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val v2 = v1.filter(col("o_orderkey") % 13 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("X")).otherwise(col("o_orderstatus")))
      .unionByName(v1.filter(col("o_orderkey") % 113 === 0)
        .select((col("o_orderkey") + 3000000L).as("o_orderkey"),
                lit("N").as("o_orderstatus"), col("o_totalprice")))
    val a = graft.acid.Versioned.commit(s, store, v1)
    val b = graft.acid.Versioned.commit(s, store, v2)
    graft.acid.Versioned.diff(s, store, a, b, Seq("o_orderkey"))
      .select(col("_change_type"), col("o_orderkey"), col("o_orderstatus"),
              col("o_totalprice").cast("double").as("price"))
      .orderBy(col("o_orderkey"), col("_change_type"))
  }

  /** Dynamic-partition OVERWRITE (Hive's nonstrict dynamic partition
    * INSERT OVERWRITE, hive.exec.dynamic.partition semantics in
    * FileSinkOperator + MoveTask: only partitions RECEIVING rows are
    * replaced, untouched partitions survive): the F partition is
    * overwritten with just its 1996 slice while O and P keep their full
    * contents — static overwrite mode would have dropped them. The
    * oracle recomputes the expected post-state per partition, so
    * replace-only-touched routing is inside the hash contract; EtlSpec
    * additionally pins that untouched partitions keep their very FILES
    * (zero rewrite) and that static mode differs. */
  val q292_dynamic_overwrite: Q = (s, d) => {
    val path = tmp(d, "orders_dynpart")
    val base = Tables.orders(s, d)
    base.write.mode(SaveMode.Overwrite).partitionBy("o_orderstatus").parquet(path)
    base.filter(col("o_orderstatus") === "F" && year(col("o_orderdate")) === 1996)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("o_orderstatus").parquet(path)
    s.read.parquet(path)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
  }

  /** Bloom-filter file index over a HASH-clustered layout — the point-
    * lookup sibling of q269 (value index) and q275 (zone map), analog of
    * the reference's bitmap index (ql/index/bitmap/BitmapIndexHandler
    * .java) and ORC bloom filters (ql/io/orc/WriterImpl BloomFilterIO).
    * The table is hash-distributed on custkey, so every file's [min,max]
    * spans the whole key domain and a zone map prunes NOTHING — but each
    * key lives in exactly one file, and the per-file bloom probe finds
    * it (plus vanishingly-rare false positives the exact re-filter
    * absorbs; BloomIndexSpec pins the no-false-negative soundness and
    * the FP rate). The membership test itself runs distributed over the
    * index table — only surviving file names reach the driver. */
  val q284_bloom_index: Q = (s, d) => {
    val path = tmp(d, "orders_hash_custkey")
    val idx = tmp(d, "orders_idx_bloom")
    Tables.orders(s, d).repartition(16, col("o_custkey"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    graft.sources.CompactIndexIO.buildBloom(s, path, "o_custkey", idx)
    graft.sources.CompactIndexIO.readBloom(s, path, idx, "o_custkey", Seq(101L, 512L, 1400L))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_custkey"))
  }

  /** Materialized view with automatic rewrite (plans/MaterializedViews —
    * the HIVE-14249 `ENABLE REWRITE` arc on the reference's Calcite CBO
    * base, ql/optimizer/calcite/): materialize the per-(priority, status)
    * rollup, then answer a COARSER aggregate (by status only) that the
    * rewrite routes through the view's stored rows via the aggregate-
    * projection matcher — the query never touches the orders table
    * (MvSpec pins the scan path). The oracle computes from base orders,
    * so the rewrite must be answer-invariant. Counts re-aggregate with
    * SUM over the view's cells; the decimal total survives re-aggregation
    * exactly because the view stores the decimal (pre-cast) partial. */
  val q276_mv_rewrite: Q = (s, d) => {
    val path = tmp(d, "mv_prio_status")
    val defn = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).as("sum_price_dec"))
    graft.plans.MaterializedViews.create(s, "mv_prio_status", defn, path)
    val out = defn
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("n_orders")).as("n_orders"),
           sum(col("sum_price_dec")).cast("double").as("sum_price"))
      .orderBy(col("o_orderstatus"))
    // exercise + pin the rewrite NOW, then deregister: a gate row must
    // not leave a JVM-global registration that reroutes every later
    // matching aggregate in this session to the gate's temp files (and
    // breaks outright once those files are cleaned up)
    val routed = out.queryExecution.executedPlan.toString
    require(routed.contains("mv_prio_status"),
      "mv rewrite did not route the coarser aggregate:\n" + routed.take(600))
    out.count() // execute while routing is live
    graft.plans.MaterializedViews.drop("mv_prio_status")
    out // re-optimizes without the view on write: same rows from base
  }

  /** TRANSPARENT index routing (plans/IndexRoute — the
    * hive.optimize.index.filter compiler rewrite): after registration, a
    * PLAIN filter over the indexed path — no index API in the query —
    * must be routed through the file-pruned scan by the optimizer rule.
    * Same data/layout as q269; the difference under test is that the
    * QUERY is ordinary spark.read + filter. */
  val q279_index_transparent: Q = (s, d) => {
    val path = tmp(d, "orders_indexed")
    val idx = tmp(d, "orders_idx_priority")
    Tables.orders(s, d).repartitionByRange(8, col("o_orderpriority"), col("o_orderkey"))
      .write.mode(SaveMode.Overwrite).parquet(path)
    graft.sources.CompactIndexIO.build(s, path, "o_orderpriority", idx)
    graft.plans.IndexCatalog.register(s, path, "o_orderpriority", idx)
    s.read.parquet(path)
      .filter(col("o_orderpriority").isin("3-MEDIUM", "4-NOT SPECIFIED"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** Incremental MV maintenance end-to-end (plans/IncrementalMv — the
    * HIVE-20962 append-only incremental rebuild): base written in batch
    * 1, view created, batch 2 APPENDED, view refreshed — the refresh
    * must take the O(new files) path (the require pins it) and the final
    * cells must equal the oracle's full aggregate over all of orders.
    * A merge bug (lost cell, double-counted delta, wrong merge fn) moves
    * the hash. */
  val q278_incremental_mv: Q = (s, d) => {
    import graft.plans.IncrementalMv
    import graft.plans.IncrementalMv.AggSpec
    val tableDir = tmp(d, "orders_mv_base")
    val mvPath = tmp(d, "mv_inc_orders")
    val all = Tables.orders(s, d)
    all.filter(col("o_orderkey") % 2 === 0).repartition(4)
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
    val aggs = Seq(
      AggSpec("count", "o_orderkey", "n_orders"),
      AggSpec("sum", "o_orderkey", "sum_keys"),
      AggSpec("min", "o_totalprice", "min_price"),
      AggSpec("max", "o_totalprice", "max_price"))
    IncrementalMv.create(s, "mv_q278", tableDir, None, Seq("o_orderpriority"), aggs, mvPath)
    all.filter(col("o_orderkey") % 2 === 1).repartition(2)
      .write.mode(SaveMode.Append).parquet(tableDir)
    val r = IncrementalMv.refresh(s, tableDir, None, Seq("o_orderpriority"), aggs, mvPath)
    require(r.mode == "incremental" && r.newFiles == 2,
      s"refresh must ride the incremental path: $r")
    graft.plans.MaterializedViews.drop("mv_q278")
    IncrementalMv.read(s, mvPath).orderBy(col("o_orderpriority"))
  }

  /** Versioned snapshot DML + time travel (acid.Versioned — the
    * base/delta multi-version idea from AcidUtils.java:56-68 with
    * commit-marker atomicity): commit supplier as v1, UPDATE to v2,
    * DELETE to v3, then read ALL THREE snapshots back via time travel
    * and aggregate each. The oracle recomputes every version's state
    * relationally, so snapshot immutability (v1/v2 unchanged by later
    * DML), update routing, and delete filtering must all be exact. */
  val q258_versioned_dml: Q = (s, d) => {
    val base = tmp(d, "supplier_ver")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    Versioned.commit(s, base, Tables.supplier(s, d)) // v1
    Versioned.update(s, base, col("s_acctbal") < 0,
      Map("s_name" -> lit("IN_DEBT"))) // v2
    Versioned.delete(s, base, col("s_nationkey") === 3) // v3
    (1 to 3).map { v =>
      Versioned.read(s, base, asOf = Some(v))
        .agg(count(lit(1)).as("n_supp"),
             sum(col("s_acctbal").cast(DecimalType(25, 2))).cast("double").as("sum_bal"),
             sum(when(col("s_name") === "IN_DEBT", 1L).otherwise(0L)).as("n_flagged"))
        .select(lit(v).as("version"), col("n_supp"), col("sum_bal"), col("n_flagged"))
    }.reduce(_.unionAll(_)).orderBy(col("version"))
  }

  /** Merge-on-read deltas (acid.Versioned delta path — AcidUtils
    * delta_<txnid> + OrcRawRecordMerger newest-wins semantics): base
    * commit, then an O(changes) delta (20 repriced orders upserted, one
    * status's orders deleted, 3 synthetic rows inserted), read via the
    * window merge, then compact and read the plain scan — both lanes
    * aggregated and unioned, so the oracle catches a divergence between
    * the merge-on-read view and its compacted materialization. */
  val q259_merge_on_read: Q = (s, d) => {
    val base = tmp(d, "orders_mor")
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val src = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Versioned.commit(s, base, src) // v1: full base
    // disjoint from the delete lane: a key both upserted and deleted in
    // ONE delta would merge in arbitrary order (the documented contract)
    val upserts = src.filter(col("o_orderkey") <= 100 && col("o_orderstatus") =!= "P")
      .withColumn("o_totalprice", col("o_totalprice") * 2.0)
      .unionAll(s.range(1, 4).select(
        (col("id") * -1).as("o_orderkey"), lit("Z").as("o_orderstatus"),
        lit(10.0).as("o_totalprice")))
    val deletes = src.filter(col("o_orderstatus") === "P")
      .select(col("o_orderkey"))
    Versioned.commitDelta(s, base, Seq("o_orderkey"), upserts, Some(deletes)) // v2
    def agg(df: org.apache.spark.sql.DataFrame, lane: String) =
      df.groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
             min(col("o_orderkey")).as("min_key"))
        .select(lit(lane).as("lane"), col("o_orderstatus"), col("n_orders"),
                col("sum_price"), col("min_key"))
    val merged = agg(Versioned.readMerged(s, base, Seq("o_orderkey")), "merged")
    Versioned.compactDeltas(s, base, Seq("o_orderkey")) // v3: folds the delta
    val compacted = agg(Versioned.read(s, base), "compacted")
    merged.unionAll(compacted).orderBy(col("lane"), col("o_orderstatus"))
  }

  /** Warehouse replication round-trip (etl/Replication — the reference's
    * replication-v1: EXPORT/IMPORT FOR REPLICATION + notification-log
    * replay, ReplicationSpec.java / DbNotificationListener.java): a
    * versioned source table is BOOTSTRAP-synced to a replica, then
    * mutated (deletes + attribute updates + inserts in one commit) and
    * INCREMENTALLY synced — only the CDC events ship the second time.
    * An extra replay of the same incremental dump pins idempotency
    * (ReplicationSpec.allowEventReplacementInto: events at or below the
    * replica's state are no-ops); a duplicate apply would double rows
    * and break the hash. The oracle recomputes the FINAL source state
    * relationally — the replica must equal it exactly. */
  val q296_replication: Q = (s, d) => {
    import graft.etl.Replication
    val src = tmp(d, "repl_src")
    val dst = tmp(d, "repl_dst")
    val dump1 = tmp(d, "repl_dump_boot")
    val dump2 = tmp(d, "repl_dump_inc")
    val hconf = s.sparkContext.hadoopConfiguration
    Seq(src, dst, dump1, dump2).foreach { p =>
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(hconf).delete(hp, true)
    }
    val keys = Seq("o_orderkey")
    val v1 = Tables.orders(s, d)
      .filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    Versioned.commit(s, src, v1)
    Replication.sync(s, src, dst, dump1, keys) // bootstrap

    val v2 = v1.filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("o_orderstatus",
        when(col("o_orderkey") % 7 === 0, lit("P")).otherwise(col("o_orderstatus")))
      .unionByName(Tables.orders(s, d).filter(col("o_orderkey") % 3 === 0)
        .select((col("o_orderkey") + 5000000L).as("o_orderkey"),
                lit("R").as("o_orderstatus"), col("o_totalprice")))
    Versioned.commit(s, src, v2)
    Replication.sync(s, src, dst, dump2, keys) // incremental: CDC only
    Replication.load(s, dump2, dst)            // replay: must be a no-op

    Versioned.read(s, dst)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(DecimalType(25, 2))).cast("double").as("sum_price"),
           min(col("o_orderkey")).as("min_key"),
           max(col("o_orderkey")).as("max_key"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, Q] = Map(
    "q296_replication" -> q296_replication,
    "q196_compaction" -> q196_compaction,
    "q269_compact_index" -> q269_compact_index,
    "q275_minmax_index" -> q275_minmax_index,
    "q283_zorder_2d" -> q283_zorder_2d,
    "q284_bloom_index" -> q284_bloom_index,
    "q287_scd2" -> q287_scd2,
    "q288_snapshot_diff" -> q288_snapshot_diff,
    "q292_dynamic_overwrite" -> q292_dynamic_overwrite,
    "q276_mv_rewrite" -> q276_mv_rewrite,
    "q278_incremental_mv" -> q278_incremental_mv,
    "q279_index_transparent" -> q279_index_transparent,
    "q258_versioned_dml" -> q258_versioned_dml,
    "q259_merge_on_read" -> q259_merge_on_read,
    "q149_smb_join" -> q149_smb_join,
    "q150_partitioned_sink" -> q150_partitioned_sink,
    "q151_multi_insert" -> q151_multi_insert,
    "q152_merge_upsert" -> q152_merge_upsert,
    "q189_load_data" -> q189_load_data,
    "q190_export_import" -> q190_export_import,
    "q191_overwrite_directory" -> q191_overwrite_directory,
    "q192_update_delete" -> q192_update_delete,
    "q193_seqfile_roundtrip" -> q193_seqfile_roundtrip,
  )

  val oracles: Map[String, String] = Map(
    "q296_replication" ->
      """WITH v1 AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey % 3 <> 0),
        |v2 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0 THEN 'P' ELSE o_orderstatus END
        |           AS o_orderstatus,
        |         o_totalprice
        |  FROM v1 WHERE o_orderkey % 11 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 5000000, 'R', o_totalprice FROM orders
        |  WHERE o_orderkey % 3 = 0)
        |SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |  MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key
        |FROM v2 GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q279_index_transparent" ->
      """SELECT o_orderpriority, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q278_incremental_mv" ->
      """SELECT o_orderpriority, COUNT(o_orderkey) AS n_orders,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS sum_keys,
        |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q276_mv_rewrite" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q275_minmax_index" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
        |                      AND TIMESTAMP '1996-12-31 23:59:59'
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q292_dynamic_overwrite" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM (
        |  SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderstatus = 'F' AND year(o_orderdate) = 1996
        |) t GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q288_snapshot_diff" ->
      """WITH v1 AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
        |v2 AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END
        |           AS o_orderstatus,
        |         o_totalprice
        |  FROM orders WHERE o_orderkey % 13 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 3000000, 'N', o_totalprice FROM orders
        |  WHERE o_orderkey % 113 = 0),
        |ins AS (SELECT 'insert' AS _change_type, b.o_orderkey, b.o_orderstatus,
        |               CAST(b.o_totalprice AS DOUBLE) AS price
        |        FROM v2 b LEFT JOIN v1 a ON a.o_orderkey = b.o_orderkey
        |        WHERE a.o_orderkey IS NULL),
        |del AS (SELECT 'delete', a.o_orderkey, a.o_orderstatus,
        |               CAST(a.o_totalprice AS DOUBLE)
        |        FROM v1 a LEFT JOIN v2 b ON a.o_orderkey = b.o_orderkey
        |        WHERE b.o_orderkey IS NULL),
        |up AS (SELECT a.o_orderkey, a.o_orderstatus AS sa, b.o_orderstatus AS sb,
        |              a.o_totalprice AS pa, b.o_totalprice AS pb
        |       FROM v1 a JOIN v2 b ON a.o_orderkey = b.o_orderkey
        |       WHERE a.o_orderstatus <> b.o_orderstatus
        |          OR a.o_totalprice <> b.o_totalprice),
        |pre AS (SELECT 'update_preimage', o_orderkey, sa, CAST(pa AS DOUBLE) FROM up),
        |post AS (SELECT 'update_postimage', o_orderkey, sb, CAST(pb AS DOUBLE) FROM up)
        |SELECT * FROM ins UNION ALL SELECT * FROM del
        |UNION ALL SELECT * FROM pre UNION ALL SELECT * FROM post
        |ORDER BY o_orderkey, _change_type""".stripMargin,
    "q287_scd2" ->
      """WITH base AS (SELECT c_custkey, c_mktsegment FROM customer),
        |chg AS (
        |  SELECT c_custkey, 'MACHINERY' AS new_seg FROM base WHERE c_custkey % 10 = 3
        |  UNION ALL
        |  SELECT c_custkey + 1000000, 'AUTOMOBILE' AS new_seg FROM base
        |  WHERE c_custkey % 97 = 0),
        |closed AS (
        |  SELECT b.c_custkey, b.c_mktsegment,
        |         DATE '1995-01-01' AS valid_from, DATE '2024-01-15' AS valid_to,
        |         FALSE AS is_current
        |  FROM base b JOIN chg ON b.c_custkey = chg.c_custkey
        |  WHERE b.c_mktsegment <> chg.new_seg),
        |kept AS (
        |  SELECT b.c_custkey, b.c_mktsegment,
        |         DATE '1995-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |         TRUE AS is_current
        |  FROM base b
        |  WHERE NOT EXISTS (SELECT 1 FROM chg
        |                    WHERE chg.c_custkey = b.c_custkey
        |                      AND b.c_mktsegment <> chg.new_seg)),
        |opened AS (
        |  SELECT chg.c_custkey, chg.new_seg AS c_mktsegment,
        |         DATE '2024-01-15' AS valid_from, CAST(NULL AS DATE) AS valid_to,
        |         TRUE AS is_current
        |  FROM chg LEFT JOIN base b ON b.c_custkey = chg.c_custkey
        |  WHERE b.c_custkey IS NULL OR b.c_mktsegment <> chg.new_seg)
        |SELECT * FROM closed UNION ALL SELECT * FROM kept
        |UNION ALL SELECT * FROM opened
        |ORDER BY c_custkey, valid_from""".stripMargin,
    "q284_bloom_index" ->
      """SELECT o_custkey, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_custkey IN (101, 512, 1400)
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "q283_zorder_2d" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_custkey BETWEEN 400 AND 600
        |  AND o_totalprice BETWEEN 100000 AND 200000
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q269_compact_index" ->
      """SELECT o_orderpriority, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q149_smb_join" ->
      """SELECT o_orderstatus, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q150_partitioned_sink" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY 1 ORDER BY o_year""".stripMargin,
    "q151_multi_insert" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q189_load_data" ->
      """SELECT o_orderstatus, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q190_export_import" ->
      """SELECT c_mktsegment, COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q191_overwrite_directory" ->
      """SELECT l_linestatus, COUNT(1) AS n_items,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem WHERE l_returnflag = 'R'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "q192_update_delete" ->
      """WITH survivors AS (
        |  SELECT s_nationkey, s_acctbal,
        |    CASE WHEN s_acctbal < 0 THEN 'IN_DEBT' ELSE s_name END AS s_name
        |  FROM supplier WHERE s_nationkey <> 3)
        |SELECT s_nationkey, COUNT(1) AS n_supp,
        |  CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal,
        |  CAST(SUM(CASE WHEN s_name = 'IN_DEBT' THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |FROM survivors GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin,
    "q193_seqfile_roundtrip" ->
      """SELECT lang, COUNT(1) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "q259_merge_on_read" ->
      """WITH final AS (
        |  SELECT o_orderkey, o_orderstatus,
        |    CASE WHEN o_orderkey <= 100 THEN o_totalprice * 2.0
        |         ELSE o_totalprice END AS o_totalprice
        |  FROM orders WHERE o_orderstatus <> 'P'
        |  UNION ALL
        |  SELECT -CAST(x AS BIGINT), 'Z', CAST(10.0 AS DOUBLE)
        |  FROM generate_series(1, 3) t(x)),
        |agg AS (
        |  SELECT 'merged' AS lane, o_orderstatus, COUNT(1) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price,
        |    MIN(o_orderkey) AS min_key
        |  FROM final GROUP BY o_orderstatus
        |  UNION ALL
        |  SELECT 'compacted', o_orderstatus, COUNT(1),
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE),
        |    MIN(o_orderkey)
        |  FROM final GROUP BY o_orderstatus)
        |SELECT lane, o_orderstatus, n_orders, sum_price, min_key
        |FROM agg ORDER BY lane, o_orderstatus""".stripMargin,
    "q258_versioned_dml" ->
      """WITH v1 AS (
        |  SELECT s_name, s_acctbal, s_nationkey FROM supplier),
        |v2 AS (
        |  SELECT CASE WHEN s_acctbal < 0 THEN 'IN_DEBT' ELSE s_name END AS s_name,
        |    s_acctbal, s_nationkey FROM v1),
        |v3 AS (SELECT * FROM v2 WHERE s_nationkey <> 3),
        |agg AS (
        |  SELECT CAST(1 AS INT) AS version, COUNT(1) AS n_supp,
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal,
        |    CAST(SUM(CASE WHEN s_name = 'IN_DEBT' THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged
        |  FROM v1
        |  UNION ALL
        |  SELECT CAST(2 AS INT), COUNT(1),
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE),
        |    CAST(SUM(CASE WHEN s_name = 'IN_DEBT' THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM v2
        |  UNION ALL
        |  SELECT CAST(3 AS INT), COUNT(1),
        |    CAST(SUM(CAST(s_acctbal AS DECIMAL(25,2))) AS DOUBLE),
        |    CAST(SUM(CASE WHEN s_name = 'IN_DEBT' THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM v3)
        |SELECT version, n_supp, sum_bal, n_flagged FROM agg ORDER BY version""".stripMargin,
    "q196_compaction" ->
      """SELECT o_orderpriority, COUNT(1) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(25,2))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q152_merge_upsert" ->
      """WITH merged AS (
        |  SELECT c_custkey,
        |    CASE WHEN c_mktsegment = 'BUILDING' THEN c_acctbal + 100.0
        |         ELSE c_acctbal END AS c_acctbal,
        |    c_mktsegment
        |  FROM customer
        |  UNION ALL
        |  SELECT -c_custkey - 1, 0.0, 'NEWSEG'
        |  FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        |SELECT c_mktsegment, COUNT(1) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(25,2))) AS DOUBLE) AS sum_bal
        |FROM merged GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  )
}
