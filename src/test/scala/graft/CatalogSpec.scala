package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** DDL / catalog surface — the reference's DDLTask + ColumnStatsTask
  * (exec/DDLTask.java, ANALYZE in parse/ColumnStatsSemanticAnalyzer.java)
  * mapped to Spark's catalog: CREATE DATABASE/TABLE (partitioned CTAS),
  * INSERT INTO, SHOW/DESCRIBE, ANALYZE ... COMPUTE STATISTICS, partition
  * pruning against a catalog table, DROP. */
class CatalogSpec extends AnyFunSuite {
  import TestSession._

  test("full DDL lifecycle: create, insert, analyze, describe, prune, drop") {
    Tables.registerAll(spark, sf)
    spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
    spark.sql("DROP TABLE IF EXISTS graftdb.orders_by_year")

    // partitioned CTAS (dynamic partitions — FileSinkOperator semantics)
    spark.sql(
      """CREATE TABLE graftdb.orders_by_year USING parquet
        |PARTITIONED BY (y)
        |AS SELECT o_orderkey, o_custkey, o_totalprice,
        |          year(o_orderdate) AS y
        |   FROM orders""".stripMargin)

    val total = spark.table("graftdb.orders_by_year").count()
    assert(total == spark.table("orders").count())

    // INSERT INTO appends to the right partition
    spark.sql(
      """INSERT INTO graftdb.orders_by_year
        |SELECT -1 AS o_orderkey, -1 AS o_custkey, 0.0 AS o_totalprice,
        |       1995 AS y""".stripMargin)
    assert(spark.table("graftdb.orders_by_year").count() == total + 1)

    // catalog metadata
    val tables = spark.sql("SHOW TABLES IN graftdb").collect().map(_.getString(1))
    assert(tables.contains("orders_by_year"))
    val cols = spark.sql("DESCRIBE graftdb.orders_by_year")
      .collect().map(_.getString(0))
    assert(cols.contains("o_orderkey") && cols.contains("y"))
    val parts = spark.sql("SHOW PARTITIONS graftdb.orders_by_year").count()
    assert(parts >= 7, s"expected >=7 year partitions, got $parts")

    // stats (ANALYZE TABLE ... COMPUTE STATISTICS [FOR COLUMNS])
    spark.sql("ANALYZE TABLE graftdb.orders_by_year COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE graftdb.orders_by_year COMPUTE STATISTICS FOR COLUMNS o_totalprice")
    val stats = spark.sql("DESCRIBE EXTENDED graftdb.orders_by_year")
      .collect().map(r => s"${r.getString(0)}=${r.getString(1)}").mkString("\n")
    assert(stats.contains("Statistics"), stats)

    // partition pruning on the catalog table
    val plan = spark.table("graftdb.orders_by_year")
      .filter(col("y") === 1996).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(y"), plan.take(1200))

    spark.sql("DROP TABLE graftdb.orders_by_year")
    assert(!spark.sql("SHOW TABLES IN graftdb").collect()
      .map(_.getString(1)).contains("orders_by_year"))
  }

  test("SHOW CREATE TABLE reproduces a runnable DDL statement") {
    spark.sql("DROP TABLE IF EXISTS graft_sct")
    spark.sql("DROP TABLE IF EXISTS graft_sct2")
    spark.sql(
      """CREATE TABLE graft_sct (k BIGINT, s STRING, d DECIMAL(10,2))
        |USING parquet PARTITIONED BY (p INT)
        |COMMENT 'show-create round trip'""".stripMargin)
    try {
      val ddl = spark.sql("SHOW CREATE TABLE graft_sct").collect()(0).getString(0)
      assert(ddl.contains("DECIMAL(10,2)") && ddl.contains("PARTITIONED BY"), ddl)
      // the emitted DDL must itself run (round-trip under a new name)
      spark.sql(ddl.replaceFirst("TABLE .*graft_sct", "TABLE graft_sct2"))
      val cols2 = spark.table("graft_sct2").schema.fieldNames.toSeq
      assert(cols2 == Seq("k", "s", "d", "p"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_sct")
      spark.sql("DROP TABLE IF EXISTS graft_sct2")
    }
  }

  test("SHOW FUNCTIONS and DESCRIBE FUNCTION cover the registry") {
    val fns = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    Seq("explode", "percentile_approx", "mask", "parse_url", "xpath",
        "str_to_map", "histogram_numeric").foreach(f =>
      assert(fns.contains(f), s"builtin $f missing from SHOW FUNCTIONS"))
    val desc = spark.sql("DESCRIBE FUNCTION EXTENDED percentile_approx")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("percentile"), desc)
    // engine-registered temp functions appear too
    graft.functions.HivePercentileApprox.register(spark)
    val withTemp = spark.sql("SHOW FUNCTIONS").collect().map(_.getString(0)).toSet
    assert(withTemp.contains("hive_percentile_approx"))
  }

  test("CREATE TABLE ... USING <format> is the STORED AS surface") {
    // Hive: CREATE TABLE ... ROW FORMAT DELIMITED ... STORED AS TEXTFILE;
    // Spark: USING csv/json/orc/parquet with OPTIONS
    Seq("csv", "json", "orc").foreach { fmt =>
      spark.sql(s"DROP TABLE IF EXISTS graft_stored_$fmt")
      spark.sql(
        s"""CREATE TABLE graft_stored_$fmt (k BIGINT, name STRING)
           |USING $fmt""".stripMargin)
      try {
        spark.sql(
          s"INSERT INTO graft_stored_$fmt VALUES (1, 'alpha'), (2, 'beta')")
        val r = spark.sql(
          s"SELECT k, name FROM graft_stored_$fmt ORDER BY k").collect()
        assert(r.map(x => (x.getLong(0), x.getString(1))).toSeq
            == Seq((1L, "alpha"), (2L, "beta")), s"USING $fmt round-trip")
        val meta = spark.sql(s"DESCRIBE FORMATTED graft_stored_$fmt")
          .collect().map(x => s"${x.getString(0)}|${x.getString(1)}").mkString
        assert(meta.contains(fmt), s"provider $fmt missing from metadata")
      } finally spark.sql(s"DROP TABLE IF EXISTS graft_stored_$fmt")
    }
  }

  test("DESCRIBE FORMATTED exposes storage metadata") {
    spark.sql("DROP TABLE IF EXISTS graft_dfmt")
    spark.sql("CREATE TABLE graft_dfmt USING parquet AS SELECT 1 AS a, 'x' AS b")
    try {
      val rows = spark.sql("DESCRIBE FORMATTED graft_dfmt")
        .collect().map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
      assert(rows.contains("Provider") && rows.contains("parquet"), rows)
      assert(rows.contains("Location"), rows)
    } finally spark.sql("DROP TABLE IF EXISTS graft_dfmt")
  }

  test("SHOW COLUMNS, TBLPROPERTIES round-trip, and ALTER TABLE RENAME") {
    spark.sql("DROP TABLE IF EXISTS graft_props")
    spark.sql("DROP TABLE IF EXISTS graft_props2")
    spark.sql("CREATE TABLE graft_props (a INT, b STRING) USING parquet " +
      "TBLPROPERTIES ('owner.team' = 'data-eng', 'retention.days' = '30')")
    try {
      val cols = spark.sql("SHOW COLUMNS IN graft_props")
        .collect().map(_.getString(0)).sorted
      assert(cols.sameElements(Array("a", "b")), cols.mkString(","))
      def props() = spark.sql("SHOW TBLPROPERTIES graft_props")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(props()("owner.team") == "data-eng" && props()("retention.days") == "30")
      spark.sql("ALTER TABLE graft_props SET TBLPROPERTIES ('retention.days' = '90')")
      assert(props()("retention.days") == "90")
      spark.sql("ALTER TABLE graft_props UNSET TBLPROPERTIES ('owner.team')")
      assert(!props().contains("owner.team"))
      spark.sql("ALTER TABLE graft_props RENAME TO graft_props2")
      assert(spark.catalog.tableExists("graft_props2") &&
             !spark.catalog.tableExists("graft_props"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_props")
      spark.sql("DROP TABLE IF EXISTS graft_props2")
    }
  }

  test("CREATE TABLE LIKE and ALTER TABLE ADD COLUMNS evolve schemas in place") {
    spark.sql("DROP TABLE IF EXISTS graft_like_src")
    spark.sql("DROP TABLE IF EXISTS graft_like_dst")
    spark.sql("CREATE TABLE graft_like_src (a INT, b STRING) USING parquet")
    try {
      spark.sql("CREATE TABLE graft_like_dst LIKE graft_like_src")
      // LIKE copies the schema but none of the data
      assert(spark.table("graft_like_dst").schema ==
             spark.table("graft_like_src").schema)
      spark.sql("INSERT INTO graft_like_src VALUES (1, 'x')")
      assert(spark.table("graft_like_dst").count() == 0)
      // ADD COLUMNS widens the schema; old rows read NULL for new cols
      spark.sql("INSERT INTO graft_like_dst VALUES (2, 'y')")
      spark.sql("ALTER TABLE graft_like_dst ADD COLUMNS (c DOUBLE)")
      val row = spark.sql(
        "SELECT a, b, c FROM graft_like_dst WHERE a = 2").collect()(0)
      assert(row.getInt(0) == 2 && row.getString(1) == "y" && row.isNullAt(2))
      spark.sql("INSERT INTO graft_like_dst VALUES (3, 'z', 1.5)")
      assert(spark.sql("SELECT c FROM graft_like_dst WHERE a = 3")
        .collect()(0).getDouble(0) == 1.5)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_like_src")
      spark.sql("DROP TABLE IF EXISTS graft_like_dst")
    }
  }

  test("MSCK REPAIR TABLE discovers partitions written outside the catalog") {
    // the reference's metastore-check path (DDLTask msck / HIVE-17824
    // lineage): files land in partition directories out-of-band, MSCK
    // reconciles the catalog. Spark's MSCK REPAIR TABLE is the same
    // surface; ALTER TABLE ... RECOVER PARTITIONS is its alias.
    import spark.implicits._
    val loc = java.nio.file.Files.createTempDirectory("graft_msck").toString
    // partition files written directly to p=.../ paths, no catalog involved
    Seq((1L, "a")).toDF("id", "s").write.parquet(s"$loc/p=1")
    Seq((2L, "b"), (3L, "c")).toDF("id", "s").write.parquet(s"$loc/p=2")
    spark.sql("DROP TABLE IF EXISTS graft_msck")
    spark.sql(
      s"""CREATE TABLE graft_msck (id BIGINT, s STRING, p INT)
         |USING parquet PARTITIONED BY (p) LOCATION '$loc'""".stripMargin)
    try {
      assert(spark.sql("SHOW PARTITIONS graft_msck").count() == 0,
        "catalog should start empty — partitions were written out-of-band")
      spark.sql("MSCK REPAIR TABLE graft_msck")
      val parts = spark.sql("SHOW PARTITIONS graft_msck")
        .collect().map(_.getString(0)).sorted
      assert(parts.sameElements(Array("p=1", "p=2")), parts.mkString(","))
      assert(spark.table("graft_msck").count() == 3)
      // late-arriving partition + the RECOVER PARTITIONS alias
      Seq((4L, "d")).toDF("id", "s").write.parquet(s"$loc/p=3")
      spark.sql("ALTER TABLE graft_msck RECOVER PARTITIONS")
      assert(spark.sql("SHOW PARTITIONS graft_msck").count() == 3)
      assert(spark.table("graft_msck").filter($"p" === 3).count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_msck")
  }

  test("LOAD DATA INPATH: file-move ingestion into managed and partitioned tables") {
    // reference parse/LoadSemanticAnalyzer.java + MoveTask: ingestion is a
    // rename + partition registration, never a rewrite
    import spark.implicits._
    import graft.etl.LoadData
    val stage = java.nio.file.Files.createTempDirectory("graft_load_stage").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "s").write.parquet(s"$stage/b1")
    Seq((3L, "c")).toDF("id", "s").write.parquet(s"$stage/b2")
    Seq((9L, "z")).toDF("id", "s").write.parquet(s"$stage/b3")
    spark.sql("DROP TABLE IF EXISTS graft_load")
    spark.sql("DROP TABLE IF EXISTS graft_loadp")
    spark.sql("CREATE TABLE graft_load (id BIGINT, s STRING) USING parquet")
    try {
      // plain INPATH moves the staged files away
      assert(LoadData.sql(spark,
        s"LOAD DATA INPATH '$stage/b1' INTO TABLE graft_load") >= 1)
      assert(spark.table("graft_load").count() == 2)
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/b1"))
        .filter(p => p.toString.endsWith(".parquet")).count() == 0,
        "INPATH must MOVE the source files, not copy them")
      // INTO appends; LOCAL keeps the source
      LoadData.sql(spark, s"LOAD DATA LOCAL INPATH '$stage/b2' INTO TABLE graft_load")
      assert(spark.table("graft_load").count() == 3)
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(s"$stage/b2"))
        .filter(p => p.toString.endsWith(".parquet")).count() >= 1,
        "LOCAL INPATH must keep the source files")
      // OVERWRITE replaces the table contents
      LoadData.sql(spark, s"LOAD DATA LOCAL INPATH '$stage/b2' OVERWRITE INTO TABLE graft_load")
      assert(spark.table("graft_load").collect().map(_.getLong(0)).toSet == Set(3L))

      // partitioned target: files land under p=7 and the partition registers
      spark.sql(
        """CREATE TABLE graft_loadp (id BIGINT, s STRING, p INT)
          |USING parquet PARTITIONED BY (p)""".stripMargin)
      LoadData.sql(spark, s"LOAD DATA INPATH '$stage/b3' INTO TABLE graft_loadp PARTITION (p='7')")
      assert(spark.sql("SHOW PARTITIONS graft_loadp").collect()
        .map(_.getString(0)).sameElements(Array("p=7")))
      assert(spark.table("graft_loadp").filter($"p" === 7).count() == 1)
      // spec must name the partition columns exactly
      intercept[IllegalArgumentException] {
        LoadData.load(spark, s"$stage/b2", "graft_loadp")
      }
      // the spec is a MAP: any order; values may contain commas; a source
      // containing subdirectories is rejected, not silently half-loaded
      spark.sql("DROP TABLE IF EXISTS graft_loadp2")
      spark.sql(
        """CREATE TABLE graft_loadp2 (id BIGINT, s STRING, y INT, m STRING)
          |USING parquet PARTITIONED BY (y, m)""".stripMargin)
      Seq((4L, "d")).toDF("id", "s").write.parquet(s"$stage/b4")
      LoadData.sql(spark,
        s"LOAD DATA INPATH '$stage/b4' INTO TABLE graft_loadp2 PARTITION (m='a,b', y='2024')")
      assert(spark.table("graft_loadp2").filter($"y" === 2024 && $"m" === "a,b").count() == 1)
      val e = intercept[IllegalArgumentException] {
        LoadData.sql(spark, s"LOAD DATA LOCAL INPATH '$stage' INTO TABLE graft_load")
      }
      assert(e.getMessage.contains("subdirectories"), e.getMessage)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_load")
      spark.sql("DROP TABLE IF EXISTS graft_loadp")
      spark.sql("DROP TABLE IF EXISTS graft_loadp2")
    }
  }

  test("TRUNCATE TABLE empties data, preserves schema, and scopes to a partition") {
    // reference exec/DDLTask.java truncateTable: Spark's native TRUNCATE
    // covers datasource tables, so the surface needs coverage, not code
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS graft_trunc")
    spark.sql(
      """CREATE TABLE graft_trunc (id BIGINT, s STRING, p INT)
        |USING parquet PARTITIONED BY (p)""".stripMargin)
    try {
      spark.sql("INSERT INTO graft_trunc VALUES (1, 'a', 1), (2, 'b', 1), (3, 'c', 2)")
      // partition-scoped truncate drops only p=1 rows, keeps both partitions' metadata path
      spark.sql("TRUNCATE TABLE graft_trunc PARTITION (p=1)")
      assert(spark.table("graft_trunc").collect().map(_.getLong(0)).toSet == Set(3L))
      // full truncate: zero rows, schema + insertability intact
      spark.sql("TRUNCATE TABLE graft_trunc")
      assert(spark.table("graft_trunc").count() == 0)
      assert(spark.table("graft_trunc").columns.sameElements(Array("id", "s", "p")))
      spark.sql("INSERT INTO graft_trunc VALUES (9, 'z', 3)")
      assert(spark.table("graft_trunc").count() == 1)
    } finally spark.sql("DROP TABLE IF EXISTS graft_trunc")
  }

  test("pre/post-exec hook analog: QueryExecutionListener observes completed queries") {
    // the reference's ExecuteWithHookContext pre/post hooks (ql/hooks/,
    // SURVEY.md §2.11) map to Spark's QueryExecutionListener: registered
    // on the session, called after each action with the full
    // QueryExecution (plans + metrics) — the audit-log/lineage hook point
    val seen = new java.util.concurrent.CopyOnWriteArrayList[(String, Long)]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = {
        seen.add((funcName, durationNs)); ()
      }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val n = Tables.nation(spark, sf).filter(col("n_nationkey") < 10).count()
      assert(n > 0)
      // listener delivery is asynchronous (ExecutionListenerBus) — poll
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(!seen.isEmpty, "hook never observed the completed action")
      assert(seen.stream.anyMatch(p => p._2 > 0), "hook saw no duration metric")
    } finally spark.listenerManager.unregister(listener)
  }
}
