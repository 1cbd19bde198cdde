package graft.operators

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{Q, Tables}
import graft.etl.MultiInsert
import graft.acid.CopyOnWrite

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

  val queries: Map[String, Q] = Map(
    "q149_smb_join" -> q149_smb_join,
    "q150_partitioned_sink" -> q150_partitioned_sink,
    "q151_multi_insert" -> q151_multi_insert,
    "q152_merge_upsert" -> q152_merge_upsert,
  )

  val oracles: Map[String, String] = Map(
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
