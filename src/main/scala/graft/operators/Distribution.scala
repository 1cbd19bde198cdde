package graft.operators

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** DISTRIBUTE BY / CLUSTER BY / SORT BY + virtual columns (SURVEY.md
  * §2.7, §2.1): the reference's ReduceSinkOperator partition/sort
  * contract (genReduceSinkPlan, parse/SemanticAnalyzer.java:6601) and
  * TableScanOperator's INPUT__FILE__NAME. Partition placement is
  * engine-defined (Spark hash vs Hive hash), so these are rows-only with
  * invariants pinned in DistributionSpec; the aggregate shapes are
  * deterministic where possible.
  */
object Distribution {

  /** CLUSTER BY = repartition by key + sort within partitions. Output:
    * per-partition stats proving co-location (every key in exactly one
    * partition). Partition ids are Spark-hash-defined -> rows-only. */
  val q81_cluster_by: Q = (s, d) => {
    Tables.orders(s, d)
      .repartition(8, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"), col("o_orderkey"))
      .withColumn("pid", spark_partition_id())
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("pid")).as("n_partitions"),
           count(lit(1)).as("n_rows"))
      .filter(col("n_partitions") =!= 1) // co-location violations only
  }

  /** Virtual columns: INPUT__FILE__NAME analog. */
  val q82_virtual_columns: Q = (s, d) => {
    Tables.lineitem(s, d)
      .select(regexp_extract(input_file_name(), "([^/]+)/?$", 1).as("file"))
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("file"))
  }

  val queries: Map[String, Q] = Map(
    "q81_cluster_by" -> q81_cluster_by,
    "q82_virtual_columns" -> q82_virtual_columns,
  )

  /** q81 must be EMPTY (no key split across partitions) — expressible as
    * an oracle: zero rows. q82: the test tables are single parquet files,
    * so the trailing path component is the table file itself. */
  val oracles: Map[String, String] = Map(
    "q81_cluster_by" ->
      """SELECT o_custkey, CAST(0 AS BIGINT) AS n_partitions,
        |  CAST(0 AS BIGINT) AS n_rows FROM orders WHERE 1 = 0""".stripMargin,
    "q82_virtual_columns" ->
      "SELECT 'lineitem.parquet' AS file, COUNT(1) AS n FROM lineitem",
  )
}
