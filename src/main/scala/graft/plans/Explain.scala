package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.catalog.HiveTableRelation
import org.apache.spark.sql.catalyst.expressions.DynamicPruning
import org.apache.spark.sql.catalyst.plans.logical.View
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.StructType

import graft.security.AccessPolicies

/** EXPLAIN DEPENDENCY / EXPLAIN AUTHORIZATION — the two ExplainTask
  * modes beyond plan printing (exec/ExplainTask.java:88
  * getJSONDependencies — "the set of input tables and partitions";
  * ExplainSemanticAnalyzer's AUTHORIZATION mode reports inputs/outputs
  * with the current user and required privileges).
  *
  * Spark-first: both are WALKS of the already-analyzed Catalyst plan, so
  * they see through views, CTEs and subqueries for free — exactly the
  * entity set the reference assembles in ReadEntity inputs. Partition
  * dependencies come from the physical scan's partition filters replayed
  * against the relation's FileIndex, i.e. they reflect partition PRUNING
  * (a query over one `ds` reports one partition, not the table's
  * hundreds) — metadata-only work, no data read. */
object GraftExplain {

  /** Input tables/relations of a query: (name, type) pairs — the
    * `input_tables` half of getJSONDependencies. Views that analysis
    * expanded report as VIRTUAL_VIEW alongside the base tables they
    * resolve to, matching the reference's parent-tracked entries. */
  def inputs(df: DataFrame): Seq[(String, String)] =
    df.queryExecution.analyzed.collect {
      case v: View =>
        Seq((v.desc.identifier.unquotedString, "VIRTUAL_VIEW"))
      case l: LogicalRelation => l.catalogTable match {
        case Some(ct) => Seq((ct.identifier.unquotedString, ct.tableType.name))
        case None => l.relation match {
          case h: HadoopFsRelation =>
            h.location.rootPaths.map(p => (p.toString, "PATH"))
          case other => Seq((other.toString, "RELATION"))
        }
      }
      case r: DataSourceV2Relation =>
        Seq((r.table.name(), "EXTERNAL_HANDLER"))
      case h: HiveTableRelation =>
        Seq((h.tableMeta.identifier.unquotedString, h.tableMeta.tableType.name))
    }.flatten.distinct

  /** Partition dependencies: for every partitioned file scan, the
    * partitions that survive static pruning, spelled
    * `<root>@<k1=v1/k2=v2>` like the reference's
    * `default@srcpart@ds=2008-04-08/hr=11`. Dynamic (runtime) pruning
    * filters are not yet evaluable at explain time and are skipped, as
    * in the reference (DPP partitions only resolve at execution). */
  def partitions(df: DataFrame): Seq[String] =
    df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.relation.partitionSchema.nonEmpty =>
        val static = f.partitionFilters
          .filterNot(_.exists(_.isInstanceOf[DynamicPruning]))
        val rootName = f.relation.location.rootPaths.headOption
          .map(_.getName).getOrElse("")
        f.relation.location.listFiles(static, Nil).flatMap { pd =>
          pd.files.headOption.map { fl =>
            val segs = partSegments(fl.getPath.getParent)
            if (segs.isEmpty) rootName else s"$rootName@${segs.mkString("/")}"
          }
        }
    }.flatten.distinct.sorted

  private def partSegments(dir: Path): Seq[String] = {
    var p = dir
    var segs = List.empty[String]
    while (p != null && p.getName.contains("=")) {
      segs = p.getName :: segs
      p = p.getParent
    }
    segs
  }

  /** EXPLAIN DEPENDENCY: one row, the reference's JSON object shape as
    * typed columns. */
  def dependency(spark: SparkSession, df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val row = Row(
      inputs(df).map { case (n, t) => Row(n, t) },
      partitions(df))
    spark.createDataFrame(Seq(row).asJava, StructType.fromDDL(
      "input_tables ARRAY<STRUCT<tablename: STRING, tabletype: STRING>>, " +
      "input_partitions ARRAY<STRING>"))
  }

  /** EXPLAIN AUTHORIZATION: per scanned root, which governed object (if
    * any) covers it, the current principal, the privilege a read
    * requires, and whether it would be allowed — the non-throwing twin
    * of the enforcement rule, for debugging policy before running. */
  def authorization(spark: SparkSession, df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    val user = AccessPolicies.currentUser(spark)
    // the ANALYZED plan: optimization would run the enforcement rule and
    // throw for a denied principal — explain must report, not enforce
    val roots = df.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.rootPaths.map(_.toString)
        case _ => Nil
      }
      // DSv2 lane parity: the enforcement rule SELECT-checks graftkv
      // stores, so the probe must report them too
      case r: DataSourceV2Relation => r.table match {
        case kv: graft.sources.KvTable => Seq(graft.PathKeys.normalize(kv.dir))
        case _ => Nil
      }
    }.flatten.distinct
    val rows = roots.flatMap { r =>
      val keys = AccessPolicies.governing(r)
      if (keys.isEmpty) Seq(Row(r, null, user, "SELECT", true))
      else keys.map(k =>
        Row(r, k, user, "SELECT", AccessPolicies.held(spark, k).contains("SELECT")))
    }
    spark.createDataFrame(rows.asJava, StructType.fromDDL(
      "input STRING, governed_by STRING, principal STRING, " +
      "privilege STRING, allowed BOOLEAN"))
  }
}

/** `EXPLAIN DEPENDENCY <query>` / `EXPLAIN AUTHORIZATION <query>` —
  * grammar the reference adds over plain EXPLAIN
  * (HiveParser.g explainStatement KW_DEPENDENCY|KW_AUTHORIZATION),
  * routed from the HPL/SQL passthrough like the other engine DDL. */
object ExplainDdl {
  private val Re = """(?is)\s*EXPLAIN\s+(DEPENDENCY|AUTHORIZATION)\s+(.+?)\s*;?\s*""".r

  def matches(sql: String): Boolean = sql match {
    case Re(_, _) => true
    case _ => false
  }

  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case Re(mode, query) =>
      val df = spark.sql(query)
      if (mode.equalsIgnoreCase("DEPENDENCY")) GraftExplain.dependency(spark, df)
      else GraftExplain.authorization(spark, df)
    case _ => throw new IllegalArgumentException(s"not an explain statement: $sql")
  }
}
