package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.SqlShims

/** Disk-backed materialized views with automatic query rewrite — the
  * feature the reference line grew right after 2.1 (HIVE-14249 /
  * HIVE-18839: `CREATE MATERIALIZED VIEW ... ENABLE REWRITE`, matched by
  * Calcite's SubstitutionVisitor against the user query). The reference
  * at 2.1 already ships the CBO half of that machinery
  * (ql/src/java/org/apache/hadoop/hive/ql/optimizer/calcite/); this is
  * the completion of the arc, re-expressed Spark-first:
  *
  *  - A view is CREATEd by materializing its defining DataFrame to
  *    parquet and registering the OPTIMIZED logical plan of the
  *    definition.
  *  - An injected optimizer rule walks each query plan; any subtree whose
  *    `sameResult` (Spark's canonicalized, exprId-normalized plan
  *    equivalence — the same test CacheManager uses for CACHE TABLE hits)
  *    matches a registered definition is replaced by a scan of the
  *    materialized parquet, output-aliased back onto the subtree's
  *    attribute ids so everything above resolves unchanged.
  *
  * Difference from CACHE TABLE (CacheSpec's LLAP-analog): the
  * materialization lives on disk, is shared across sessions and
  * restarts, and is refreshed explicitly (REFRESH MATERIALIZED VIEW) —
  * semantics, not memory management. At 100 TB the rewrite turns every
  * repeated dashboard aggregate from a full fact scan into a KB-scale
  * read; registration order is irrelevant because matching is structural.
  *
  * Staleness contract (Hive's `hive.materializedview.rewriting` window
  * analog, simplified): the registry never auto-invalidates — REFRESH is
  * the user's statement that the base tables changed. A gate caller that
  * wants source-drift detection composes `CompactIndexIO.isStale`-style
  * file listings; the view itself stays deliberately dumb.
  */
object MaterializedViews {

  final case class Mv(name: String, definition: LogicalPlan, path: String)

  private val registry = new ConcurrentHashMap[String, Mv]()

  def clear(): Unit = registry.clear()
  def isEmpty: Boolean = registry.isEmpty
  def registered: Seq[String] = registry.keySet.asScala.toSeq.sorted

  /** Materialize `df` at `path` and enable rewrite. Write completes
    * BEFORE registration so the rule can never route a query (including
    * this write) to a half-written view. */
  def create(spark: SparkSession, name: String, df: DataFrame, path: String): Unit = {
    registry.remove(name)
    df.write.mode("overwrite").parquet(path)
    val plan = df.queryExecution.optimizedPlan
    registry.put(name, Mv(name, plan, path))
  }

  def drop(name: String): Unit = registry.remove(name)

  /** Re-materialize from the stored definition (the base tables are
    * re-read; the definition plan is immutable). Deregisters during the
    * rewrite window so the recompute cannot be routed to the stale copy. */
  def refresh(spark: SparkSession, name: String): Unit = {
    val mv = Option(registry.remove(name))
      .getOrElse(throw new IllegalArgumentException(s"no materialized view $name"))
    SqlShims.ofRows(spark, mv.definition).write.mode("overwrite").parquet(mv.path)
    // frames planned against the previous materialization hold its file
    // listing; drop the cached metadata so they re-list (Hive's rebuild
    // has the same invalidation step)
    spark.catalog.refreshByPath(mv.path)
    registry.put(name, mv)
  }

  private[plans] def all: Seq[Mv] = registry.values.asScala.toSeq

  private[plans] def register(mv: Mv): Unit = registry.put(mv.name, mv)
}

/** The Hive DDL surface for materialized views (HiveParser.g grew these
  * productions right after 2.1 — createMaterializedViewStatement,
  * alterMaterializedViewStatement):
  *
  *   CREATE MATERIALIZED VIEW name AS <select>
  *   ALTER MATERIALIZED VIEW name REBUILD
  *   DROP MATERIALIZED VIEW name
  *
  * Materializations land under the session warehouse dir. Routed from
  * SQL dispatchers (HPL/SQL passthrough) the same way constraint DDL is.
  */
object MvDdl {

  private val Create =
    """(?is)\s*CREATE\s+MATERIALIZED\s+VIEW\s+(\w+)\s+AS\s+(.+)""".r
  private val Rebuild =
    """(?is)\s*ALTER\s+MATERIALIZED\s+VIEW\s+(\w+)\s+REBUILD\s*""".r
  private val DropMv =
    """(?is)\s*DROP\s+MATERIALIZED\s+VIEW\s+(?:IF\s+EXISTS\s+)?(\w+)\s*""".r

  def matches(sql: String): Boolean =
    Create.matches(sql) || Rebuild.matches(sql) || DropMv.matches(sql)

  private def pathFor(spark: SparkSession, name: String): String = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    s"$wh/graft_mv/$name"
  }

  def run(spark: SparkSession, sql: String): Unit = sql match {
    case Create(name, select) =>
      MaterializedViews.create(spark, name.toLowerCase, spark.sql(select),
        pathFor(spark, name.toLowerCase))
    case Rebuild(name) => MaterializedViews.refresh(spark, name.toLowerCase)
    case DropMv(name) => MaterializedViews.drop(name.toLowerCase)
    case other => throw new IllegalArgumentException(s"Unrecognized MV DDL: $other")
  }
}

/** The rewrite rule, injected via GraftExtensions. Matching is top-down
  * so the LARGEST matching subtree wins (a query that IS the view
  * becomes a bare scan; a query aggregating above the view keeps only
  * the outer aggregate).
  *
  * Two match shapes:
  *  1. Whole-subtree `sameResult` — exprId-normalized structural
  *     equality, the CacheManager test.
  *  2. Aggregate PROJECTION of an Aggregate-rooted view: the optimizer
  *     prunes unreferenced view columns out of the query's aggregate
  *     before this rule can see an exact match, so an Aggregate whose
  *     child sameResults the view's child, whose grouping is the view's
  *     grouping, and whose every output is semantically one of the
  *     view's outputs routes to a column subset of the materialization
  *     (the simplest case of Calcite SubstitutionVisitor's
  *     aggregate-unify rule).
  */
object MvRewrite extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, NamedExpression}
  import org.apache.spark.sql.catalyst.plans.logical.Aggregate

  private def mvScan(mv: MaterializedViews.Mv): LogicalPlan =
    SqlShims.analyzed(SparkSession.active.read.parquet(mv.path))

  /** Position-map the full scan onto the subtree's expected exprIds. */
  private def fullScan(mv: MaterializedViews.Mv, target: LogicalPlan): Option[LogicalPlan] = {
    val rel = mvScan(mv)
    if (rel.output.length != target.output.length) return None
    val aliased = target.output.zip(rel.output).map { case (want, have) =>
      Alias(have, want.name)(exprId = want.exprId, qualifier = want.qualifier)
    }
    Some(Project(aliased, rel))
  }

  /** Strip attribute-only Projects (ColumnPruning inserts narrower ones
    * on the query side than the view side materialized). */
  private def stripProjects(p: LogicalPlan): LogicalPlan = p match {
    case Project(pl, c) if pl.forall(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]) =>
      stripProjects(c)
    case other => other
  }

  /** Aggregate-projection match (shape 2). */
  private def aggProjection(t: Aggregate, mv: MaterializedViews.Mv): Option[LogicalPlan] =
    mv.definition match {
      case d: Aggregate if stripProjects(t.child).sameResult(stripProjects(d.child)) =>
        // both children are (column subsets of) the same base scan, so
        // attribute NAMES identify columns; rewrite the query's
        // expressions into the view's attribute space by name.
        val attrMap: Map[Long, Attribute] =
          t.child.output.flatMap(q =>
            d.child.output.find(_.name == q.name).map(v => q.exprId.id -> v)).toMap
        def substituted(e: Expression): Option[Expression] = {
          var ok = true
          val s = e.transformUp {
            case a: Attribute => attrMap.get(a.exprId.id) match {
              case Some(v) => v
              case None => ok = false; a
            }
          }
          if (ok) Some(s) else None
        }
        def strip(e: Expression): Expression = e match {
          case Alias(c, _) => c
          case other => other
        }
        // grouping must agree as a semantic multiset
        val g2 = t.groupingExpressions.flatMap(substituted)
        if (g2.length != t.groupingExpressions.length ||
            g2.length != d.groupingExpressions.length ||
            !g2.forall(x => d.groupingExpressions.exists(_.semanticEquals(x))))
          return None
        // each requested output must be semantically one of the view's
        val idx: Seq[Int] = t.aggregateExpressions.map { ne =>
          substituted(strip(ne)) match {
            case Some(s) => d.aggregateExpressions.indexWhere(de => strip(de).semanticEquals(s))
            case None => -1
          }
        }
        if (idx.contains(-1)) return None
        val rel = mvScan(mv)
        if (rel.output.length != d.aggregateExpressions.length) return None
        val aliased = t.aggregateExpressions.zip(idx).map { case (want, i) =>
          Alias(rel.output(i), want.name)(exprId = want.exprId, qualifier =
            want.toAttribute.qualifier)
        }
        Some(Project(aliased, rel))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaterializedViews.isEmpty) return plan
    val views = MaterializedViews.all
    plan.transformDown {
      case t =>
        // single sameResult pass per node — the canonicalized comparison
        // is the expensive part, so never run it twice (guard + body)
        views.find(v => t.sameResult(v.definition))
          .flatMap(mv => fullScan(mv, t))
          .orElse(t match {
            case a: Aggregate => views.view.flatMap(v => aggProjection(a, v)).headOption
            case _ => None
          })
          .getOrElse(t)
    }
  }
}
