package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family (SURVEY.md §2);
  * `oracleSql` gives a DuckDB-runnable equivalent for every SQL-expressible
  * query (same column names — the driver sorts columns by name and hashes
  * values).
  */
object SparkEntry {

  private val modules: Seq[(Map[String, Q], Map[String, String])] = Seq(
    (operators.Relational.queries, operators.Relational.oracles),
    (operators.Windows.queries, operators.Windows.oracles),
    (operators.Grouping.queries, operators.Grouping.oracles),
    (functions.ScalarFunctions.queries, functions.ScalarFunctions.oracles),
    (operators.Generators.queries, operators.Generators.oracles),
    (operators.Subqueries.queries, operators.Subqueries.oracles),
    (operators.Sampling.queries, operators.Sampling.oracles),
    (operators.TextAnalysis.queries, operators.TextAnalysis.oracles),
    (operators.Dedup.queries, operators.Dedup.oracles),
    (operators.Similarity.queries, operators.Similarity.oracles),
    (operators.EventsOps.queries, operators.EventsOps.oracles),
    (operators.AsofOps.queries, operators.AsofOps.oracles),
    (operators.RangeJoin.queries, operators.RangeJoin.oracles),
    (operators.SketchOps.queries, operators.SketchOps.oracles),
    (operators.AuditOps.queries, operators.AuditOps.oracles),
    (operators.PipelineOps.queries, operators.PipelineOps.oracles),
    (operators.Multimodal.queries, operators.Multimodal.oracles),
    (operators.Script.queries, operators.Script.oracles),
    (functions.MiscFunctions.queries, functions.MiscFunctions.oracles),
    (operators.Distribution.queries, operators.Distribution.oracles),
    (functions.NGrams.queries, functions.NGrams.oracles),
    (operators.TpchMore.queries, operators.TpchMore.oracles),
    (operators.TpcdsShapes.queries, operators.TpcdsShapes.oracles),
    (operators.TpcdsShapes2.queries, operators.TpcdsShapes2.oracles),
    (operators.MatchPath.queries, operators.MatchPath.oracles),
    (functions.HiveCompat.queries, functions.HiveCompat.oracles),
    (sources.Formats.queries, sources.Formats.oracles),
    (operators.StorageOps.queries, operators.StorageOps.oracles),
    (operators.JoinStrategies.queries, operators.JoinStrategies.oracles),
    (functions.TypeSystem.queries, functions.TypeSystem.oracles),
    (functions.LongTail.queries, functions.LongTail.oracles),
    (hplsql.HplsqlGate.queries, hplsql.HplsqlGate.oracles),
    (operators.ConstraintOps.queries, operators.ConstraintOps.oracles),
    (operators.BpeTrainer.queries, operators.BpeTrainer.oracles),
    (operators.GovernanceOps.queries, operators.GovernanceOps.oracles),
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.q1_agg(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.iterator.flatMap(_._2).toMap
}
