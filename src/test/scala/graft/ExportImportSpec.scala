package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.ExportImport

/** EXPORT/IMPORT round trips (reference ExportSemanticAnalyzer.java /
  * ImportSemanticAnalyzer.java): dump = data copy + replayable DDL in a
  * `_metadata` descriptor; restore = DDL replay + copy + partition
  * discovery. */
class ExportImportSpec extends AnyFunSuite {
  import TestSession._

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("unpartitioned table round-trips data, schema, and DDL") {
    spark.sql("DROP TABLE IF EXISTS graft_exp1")
    spark.sql("DROP TABLE IF EXISTS graft_imp1")
    spark.sql(
      """CREATE TABLE graft_exp1 USING parquet AS
        |SELECT id, concat('v', id) AS s FROM range(100)""".stripMargin)
    val dir = tmp("graft_exp1_")
    try {
      ExportImport.exportTable(spark, "graft_exp1", dir)
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_metadata")),
        "export must write the _metadata descriptor")
      ExportImport.importTable(spark, dir, "graft_imp1")
      assert(spark.table("graft_imp1").schema == spark.table("graft_exp1").schema)
      val a = spark.table("graft_exp1").collect().map(_.toSeq).toSet
      val b = spark.table("graft_imp1").collect().map(_.toSeq).toSet
      assert(a == b, s"round trip lost rows: ${a.size} vs ${b.size}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_exp1")
      spark.sql("DROP TABLE IF EXISTS graft_imp1")
    }
  }

  test("partitioned table round-trips with partitions registered, including cross-database") {
    spark.sql("DROP TABLE IF EXISTS graft_exp2")
    spark.sql("DROP DATABASE IF EXISTS graft_impdb CASCADE")
    spark.sql("CREATE DATABASE graft_impdb")
    spark.sql(
      """CREATE TABLE graft_exp2 USING parquet PARTITIONED BY (p) AS
        |SELECT id, CAST(id % 3 AS INT) AS p FROM range(90)""".stripMargin)
    val dir = tmp("graft_exp2_")
    try {
      ExportImport.exportTable(spark, "graft_exp2", dir)
      ExportImport.importTable(spark, dir, "graft_impdb.orders_restored")
      val parts = spark.sql("SHOW PARTITIONS graft_impdb.orders_restored")
        .collect().map(_.getString(0)).sorted
      assert(parts.sameElements(Array("p=0", "p=1", "p=2")), parts.mkString(","))
      assert(spark.table("graft_impdb.orders_restored").count() == 90)
      // partition pruning works on the restored table (catalog-complete)
      val plan = spark.table("graft_impdb.orders_restored")
        .filter(col("p") === 1).queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(p"), plan.take(800))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_exp2")
      spark.sql("DROP DATABASE IF EXISTS graft_impdb CASCADE")
    }
  }

  test("importing an EXTERNAL table never aliases the live source location") {
    spark.sql("DROP TABLE IF EXISTS graft_ext_src")
    spark.sql("DROP TABLE IF EXISTS graft_ext_imp")
    val loc = tmp("graft_ext_loc_")
    spark.sql(s"CREATE TABLE graft_ext_src (id BIGINT) USING parquet LOCATION '$loc'")
    spark.sql("INSERT INTO graft_ext_src VALUES (1), (2)")
    val dir = tmp("graft_ext_exp_")
    try {
      ExportImport.exportTable(spark, "graft_ext_src", dir)
      // source keeps evolving after the export
      spark.sql("INSERT INTO graft_ext_src VALUES (3)")
      ExportImport.importTable(spark, dir, "graft_ext_imp")
      val impLoc = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier("graft_ext_imp")).location
      assert(new org.apache.hadoop.fs.Path(impLoc).toUri.getPath !=
        new org.apache.hadoop.fs.Path(loc).toUri.getPath,
        "imported table must own a fresh location, not the live source dir")
      // import = snapshot at export time; source = snapshot + later insert
      assert(spark.table("graft_ext_imp").count() == 2)
      assert(spark.table("graft_ext_src").count() == 3,
        "import corrupted the live source table")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_ext_src")
      spark.sql("DROP TABLE IF EXISTS graft_ext_imp")
    }
  }

  test("export refuses a non-empty target; import refuses a dir without _metadata") {
    spark.sql("DROP TABLE IF EXISTS graft_exp3")
    spark.sql("CREATE TABLE graft_exp3 USING parquet AS SELECT id FROM range(5)")
    val dirty = tmp("graft_exp3_")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dirty, "junk.txt"), "x")
    try {
      intercept[IllegalArgumentException] {
        ExportImport.exportTable(spark, "graft_exp3", dirty)
      }
      intercept[IllegalArgumentException] {
        ExportImport.importTable(spark, tmp("graft_empty_"), "graft_never")
      }
    } finally spark.sql("DROP TABLE IF EXISTS graft_exp3")
  }
}
