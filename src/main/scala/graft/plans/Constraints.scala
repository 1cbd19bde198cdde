package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, EqualTo, Expression, IsNotNull}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Informational PRIMARY KEY / FOREIGN KEY constraints and the optimizer
  * rewrites they license — the analog of HIVE-13290's `ALTER TABLE ... ADD
  * CONSTRAINT ... DISABLE NOVALIDATE RELY` surface in the reference
  * (ql/src/java/org/apache/hadoop/hive/ql/parse/HiveParser.g:1163,2070-2082;
  * key processing in parse/BaseSemanticAnalyzer.java:627-700; metastore
  * objects SQLPrimaryKey/SQLForeignKey). Hive 2.1 constraints are never
  * enforced (`DISABLE NOVALIDATE`); `RELY` is the user's explicit grant
  * that the optimizer may assume them. We implement exactly that contract:
  * nothing is validated, and only RELY constraints feed the rewrites.
  *
  * Scale rationale: at 100 TB the wins here are structural, not
  * micro-optimizations. A fact-to-dimension join whose dimension columns
  * are never referenced is a full shuffle (or a broadcast + probe over
  * every fact row) that produces bit-identical output to a simple
  * null-filter on the fact side; `SELECT DISTINCT` over a key-carrying
  * projection is a full hash aggregate (map-side + exchange + reduce-side)
  * that deduplicates nothing. Both patterns are endemic in generated BI
  * SQL and view-on-view stacks where the view joins in dimensions the
  * outer query doesn't use. The reference gained the same rewrites when
  * Calcite's RelMdUniqueKeys/JoinRemoveRule started consuming these
  * constraints; Spark 4 has no informational-constraint surface, so this
  * is genuinely additive.
  *
  * Table identity is VERIFIED, not guessed: a scan counts as registered
  * table `t` only when (a) it is a single-root scan, (b) the root's
  * basename is `t`, AND (c) the session's current resolution of the name
  * `t` (temp view or catalog table) lands on that exact location. A
  * derived copy that merely shares the basename (`/tmp/backup/
  * orders.parquet`), or a multi-root scan whose first root matches,
  * never licenses a rewrite — these rewrites DELETE joins and
  * aggregates, so a loose identity would return wrong rows, not just a
  * slow plan. The registry is the session-shared metastore analog (one
  * per JVM, like metastore/HiveMetaStore.java's embedded mode).
  */
object ConstraintCatalog {

  final case class PrimaryKey(name: String, table: String, cols: Seq[String], rely: Boolean)
  final case class ForeignKey(childTable: String, childCols: Seq[String],
                              parentTable: String, parentCols: Seq[String], rely: Boolean)

  private val pks = new ConcurrentHashMap[String, PrimaryKey]()
  private val fks = new ConcurrentHashMap[String, ForeignKey]() // keyed by constraint name

  def addPrimaryKey(name: String, table: String, cols: Seq[String], rely: Boolean): Unit = {
    pks.put(table.toLowerCase,
      PrimaryKey(name.toLowerCase, table.toLowerCase, cols.map(_.toLowerCase), rely))
    invalidateResolutionCache()
  }

  def addForeignKey(name: String, childTable: String, childCols: Seq[String],
                    parentTable: String, parentCols: Seq[String], rely: Boolean): Unit = {
    fks.put(name.toLowerCase,
      ForeignKey(childTable.toLowerCase, childCols.map(_.toLowerCase),
        parentTable.toLowerCase, parentCols.map(_.toLowerCase), rely))
    invalidateResolutionCache()
  }

  def dropConstraint(name: String): Unit = {
    fks.remove(name.toLowerCase)
    // Hive names PKs too; the PK map is keyed by table (one PK per table,
    // HiveParser.g allows a single primaryKeyWithName), so scan by name.
    pks.entrySet.asScala.filter(_.getValue.name == name.toLowerCase)
      .foreach(e => pks.remove(e.getKey))
    invalidateResolutionCache()
  }

  def clear(): Unit = { pks.clear(); fks.clear(); invalidateResolutionCache() }

  // --- table-name -> location resolution cache -----------------------
  //
  // ConstraintRewrites verifies scan identity by resolving the table
  // NAME through the session catalog. Unbounded, that is a catalog
  // lookup + full analysis inside an optimizer rule, for every
  // candidate scan, on every (re)optimization. Successful resolutions
  // are cached per (session, table) and invalidated on every constraint
  // mutation — so the documented refresh point for a table whose
  // LOCATION moved (e.g. a re-created temp view) is re-registering its
  // constraints (what ConstraintOps.registerAll does) or clear().
  // The outer map holds the SESSION OBJECT weakly: identity keying
  // without identityHashCode (which is neither collision-free across
  // live sessions nor stable across GC'd ones — a hash reuse would let
  // one session's binding license a join deletion against another's
  // catalog), and a closed session's entries vanish with it.
  // FAILED resolutions are NOT cached: a view created after its
  // constraints were registered starts firing on its first query, and
  // the failed-lookup path a misconfigured name pays per optimization is
  // a cheap catalog miss, not the full analysis the cache exists for.
  private val locCache = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, String]]())

  /** Drop all cached name->location bindings (called on every constraint
    * mutation; call directly after re-pointing a registered table's name
    * at a new location without touching its constraints). */
  def invalidateResolutionCache(): Unit = locCache.clear()

  /** The single-root storage location the session currently resolves
    * `table` to, or None (multi-root, unresolvable). Cached — see above. */
  private[plans] def resolvedLocation(spark: SparkSession, table: String): Option[String] = {
    val perSession = locCache.synchronized {
      var m = locCache.get(spark)
      if (m == null) { m = new ConcurrentHashMap[String, String](); locCache.put(spark, m) }
      m
    }
    val t = table.toLowerCase
    Option(perSession.get(t)).orElse {
      val resolved = resolveNow(spark, t)
      resolved.foreach(perSession.put(t, _))
      resolved
    }
  }

  private def resolveNow(spark: SparkSession, table: String): Option[String] =
    try {
      val roots = spark.table(table).queryExecution.analyzed.collect {
        case LogicalRelation(f: HadoopFsRelation, _, _, _, _) => f.location.rootPaths
      }.flatten
      if (roots.size == 1) Some(roots.head.toUri.getPath.stripSuffix("/")) else None
    } catch {
      // name doesn't resolve in this session: not that table. Narrow on
      // purpose — a genuine failure (OOM, interrupt) must propagate, not
      // silently disable rewrites.
      case _: org.apache.spark.sql.AnalysisException => None
    }

  def primaryKey(table: String): Option[PrimaryKey] = Option(pks.get(table.toLowerCase))

  def foreignKeys(childTable: String, parentTable: String): Seq[ForeignKey] =
    fks.values.asScala.toSeq.filter(fk =>
      fk.childTable == childTable.toLowerCase && fk.parentTable == parentTable.toLowerCase)

  def isEmpty: Boolean = pks.isEmpty && fks.isEmpty

  /** Any constraint mentions this table name? (Cheap pre-filter before
    * the session-catalog verification in ConstraintRewrites.scanTable.) */
  private[plans] def knowsTable(table: String): Boolean = {
    val t = table.toLowerCase
    pks.containsKey(t) ||
      fks.values.asScala.exists(fk => fk.childTable == t || fk.parentTable == t)
  }

  /** Catalog listing, the `DESCRIBE EXTENDED` constraint-section analog. */
  def describe(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val pkRows = pks.values.asScala.toSeq.map(pk =>
      ("PRIMARY KEY " + pk.name, pk.table, pk.cols.mkString(","), "", "", pk.rely))
    val fkRows = fks.asScala.toSeq.map { case (name, fk) =>
      ("FOREIGN KEY " + name, fk.childTable, fk.childCols.mkString(","),
        fk.parentTable, fk.parentCols.mkString(","), fk.rely)
    }
    (pkRows ++ fkRows).toDF("constraint", "table_name", "cols", "ref_table", "ref_cols", "rely")
  }
}

/** The Hive DDL surface for constraints, accepted verbatim:
  *
  *   ALTER TABLE t ADD CONSTRAINT nm PRIMARY KEY (c1, c2) DISABLE NOVALIDATE [RELY]
  *   ALTER TABLE t ADD CONSTRAINT nm FOREIGN KEY (c) REFERENCES p(pc) DISABLE NOVALIDATE [RELY]
  *   ALTER TABLE t DROP CONSTRAINT nm
  *
  * Grammar mirror of HiveParser.g's alterStatementSuffixAddConstraint /
  * primaryKeyWithName / foreignKeyWithName productions. ENABLE or VALIDATE
  * are rejected exactly as the reference rejects them in 2.1
  * (BaseSemanticAnalyzer.processPrimaryKeyInfos: "Invalid Primary Key
  * syntax ENABLE feature not supported yet").
  */
object ConstraintDdl {

  private val AddPk =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+PRIMARY\s+KEY\s*\(([^)]+)\)\s+DISABLE\s+NOVALIDATE(\s+RELY)?(\s+NORELY)?\s*""".r
  private val AddFk =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+ADD\s+CONSTRAINT\s+(\w+)\s+FOREIGN\s+KEY\s*\(([^)]+)\)\s+REFERENCES\s+(\w+)\s*\(([^)]+)\)\s+DISABLE\s+NOVALIDATE(\s+RELY)?(\s+NORELY)?\s*""".r
  private val Drop =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+DROP\s+CONSTRAINT\s+(\w+)\s*""".r

  private def cols(s: String): Seq[String] = s.split(",").map(_.trim.toLowerCase).toSeq

  /** Is this statement constraint DDL this object handles? (Used by SQL
    * dispatchers — e.g. the HPL/SQL interpreter's passthrough — to route
    * here instead of spark.sql, which has no such grammar.) */
  def matches(sql: String): Boolean =
    AddPk.matches(sql) || AddFk.matches(sql) || Drop.matches(sql)

  def run(sql: String): Unit = sql match {
    case AddPk(table, name, pkCols, rely, _) =>
      ConstraintCatalog.addPrimaryKey(name, table, cols(pkCols), rely != null)
    case AddFk(table, name, fkCols, parent, pCols, rely, _) =>
      ConstraintCatalog.addForeignKey(name, table, cols(fkCols), parent, cols(pCols), rely != null)
    case Drop(_, name) =>
      ConstraintCatalog.dropConstraint(name)
    case other if other.toUpperCase.contains("ENABLE") || other.toUpperCase.contains(" VALIDATE") =>
      throw new IllegalArgumentException(
        "Invalid constraint syntax: ENABLE/VALIDATE feature not supported yet (Hive 2.1 parity)")
    case other =>
      throw new IllegalArgumentException(s"Unrecognized constraint DDL: $other")
  }
}

/** Constraint-driven rewrites, injected via GraftExtensions into the
  * operator-optimization batch:
  *
  * 1. PK-FK join elimination. `Project(refs ⊆ fact, fact ⋈_{fk=pk} dim)`
  *    where the dim side is a bare scan of the parent table and the join
  *    keys are exactly a RELY foreign key onto the parent's full RELY
  *    primary key:
  *      - INNER: replaced by `Project(refs, Filter(fk IS NOT NULL, fact))`.
  *        Sound because RELY-RI says every non-null fk value has exactly
  *        one parent row (existence from the FK, at-most-one from the PK),
  *        so the join neither drops nor duplicates fact rows beyond
  *        null-key elimination — which the IS NOT NULL filter reproduces.
  *      - LEFT OUTER: replaced by `Project(refs, fact)`. Needs only PK
  *        uniqueness (≤1 match per fact row, unmatched rows survive
  *        null-extended, and the null-extended columns are unreferenced).
  *
  * 2. DISTINCT-over-PK elimination. A distinct (Aggregate whose output is
  *    exactly its grouping attributes) whose grouping set covers a RELY
  *    primary key of the single underlying scan, reached through
  *    row-preserving Project/Filter only, dedupes nothing: replaced by a
  *    Project, deleting the exchange + two hash aggregates.
  *
  * Both fire only on patterns proven from the registry; an empty registry
  * is a guaranteed no-op (the rule is in every session via extensions, so
  * the no-fire path must be free).
  */
class ConstraintRewrites(sessionOf: () => SparkSession) extends Rule[LogicalPlan] {

  /** Basename table identity of a bare (un-filtered) scan, tolerating two
    * wrappers the optimizer itself inserts on join inputs: the
    * attribute-only Project from ColumnPruning, and IsNotNull filters from
    * InferFiltersFromConstraints. The IsNotNull attr names are returned so
    * the caller can check they cover ONLY join-key columns — a null join
    * key can never match, so filtering it is invisible to the join; an
    * IsNotNull on any OTHER column genuinely shrinks the dim side and
    * must block elimination. */
  private def bareScan(plan: LogicalPlan): Option[(String, Set[String])] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) => bareScan(child)
    case Filter(cond, child) =>
      val conjuncts = splitConjuncts(cond)
      val notNulls = conjuncts.collect { case IsNotNull(a: Attribute) => a.name.toLowerCase }
      if (notNulls.size == conjuncts.size)
        bareScan(child).map { case (t, nn) => (t, nn ++ notNulls) }
      else None
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      scanTable(fs).map(t => (t, Set.empty[String]))
    case _ => None
  }

  /** VERIFIED table identity for a scan (see the object doc): the
    * basename must be a registered table name AND the session's current
    * resolution of that name must land on this exact single-root
    * location. Anything else — derived copies sharing the basename,
    * multi-root scans, unresolvable names — declines the rewrite. */
  private def scanTable(fs: HadoopFsRelation): Option[String] = {
    val roots = fs.location.rootPaths
    if (roots.size != 1) return None
    val path = roots.head.toUri.getPath.stripSuffix("/")
    val base = roots.head.getName.toLowerCase.stripSuffix(".parquet")
    if (!ConstraintCatalog.knowsTable(base)) return None
    // cached per (session, name) — see ConstraintCatalog.resolvedLocation;
    // resolves against THIS rule's owning session, not whatever session
    // happens to be thread-active during optimization
    if (ConstraintCatalog.resolvedLocation(sessionOf(), base).contains(path)) Some(base)
    else None
  }

  /** Table identity for the FK (fact) side: arbitrary Filters are fine —
    * a subset of the child table keeps every FK fact true — but only
    * attribute-preserving Projects, so a rename can never masquerade as
    * the FK column. */
  private def factTable(plan: LogicalPlan): Option[String] = plan match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[Attribute]) => factTable(child)
    case Filter(_, child) => factTable(child)
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => scanTable(fs)
    case _ => None
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** If `cond` is a pure conjunction of left-attr = right-attr equalities,
    * return the (leftName, rightName) pairs. */
  private def equiPairs(cond: Expression, left: LogicalPlan, right: LogicalPlan): Option[Seq[(String, String)]] = {
    val ls = left.outputSet
    val rs = right.outputSet
    val pairs = splitConjuncts(cond).map {
      case EqualTo(a: Attribute, b: Attribute) if ls.contains(a) && rs.contains(b) =>
        Some((a.name.toLowerCase, b.name.toLowerCase))
      case EqualTo(b: Attribute, a: Attribute) if ls.contains(a) && rs.contains(b) =>
        Some((a.name.toLowerCase, b.name.toLowerCase))
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten) else None
  }

  /** Decide whether `j` (whose parent references only `required`) can be
    * collapsed onto its left child; returns the replacement child. */
  private def eliminate(required: AttributeSet, j: Join): Option[LogicalPlan] = {
    if (ConstraintCatalog.isEmpty) return None
    if (!required.subsetOf(j.left.outputSet)) return None
    val cond = j.condition.getOrElse(return None)
    val (parent, parentNotNulls) = bareScan(j.right).getOrElse(return None)
    val pk = ConstraintCatalog.primaryKey(parent).filter(_.rely).getOrElse(return None)
    val pairs = equiPairs(cond, j.left, j.right).getOrElse(return None)
    // Join keys must cover the parent's full primary key (extra equalities
    // only shrink the match set below one — fine for LEFT OUTER, fatal for
    // INNER, so INNER additionally requires an exact FK-onto-PK match).
    val rightKeys = pairs.map(_._2).toSet
    if (!pk.cols.forall(rightKeys.contains)) return None
    // dim-side filters are tolerable only as IsNotNull over the join keys
    if (!parentNotNulls.subsetOf(rightKeys)) return None
    j.joinType match {
      case LeftOuter =>
        Some(j.left)
      case Inner =>
        // Exact registered FK onto exactly the PK columns, nothing more.
        val fkMatch = ConstraintCatalog.foreignKeys(factTable(j.left).getOrElse(return None), parent)
          .filter(_.rely)
          .exists { fk =>
            val declared = fk.childCols.zip(fk.parentCols).toSet
            pairs.toSet == declared && rightKeys == pk.cols.toSet
          }
        if (!fkMatch) return None
        val leftByName = j.left.output.groupBy(_.name.toLowerCase)
        val fkAttrs = pairs.map(_._1).distinct.flatMap(n => leftByName.getOrElse(n, Nil).headOption)
        if (fkAttrs.size != pairs.map(_._1).distinct.size) return None
        val notNull = fkAttrs.map(IsNotNull(_): Expression).reduce(And)
        Some(Filter(notNull, j.left))
      case _ => None
    }
  }

  /** Is `agg` a plain DISTINCT: output == grouping attributes, no
    * aggregate functions? */
  private def distinctShape(agg: Aggregate): Option[Seq[Attribute]] = {
    val groupAttrs = agg.groupingExpressions.flatMap {
      case a: Attribute => Some(a)
      case _ => None
    }
    val outAttrs = agg.aggregateExpressions.flatMap {
      case a: Attribute => Some(a)
      case Alias(a: Attribute, _) => Some(a)
      case _ => None
    }
    if (groupAttrs.size == agg.groupingExpressions.size &&
        outAttrs.size == agg.aggregateExpressions.size &&
        outAttrs.toSet.subsetOf(groupAttrs.toSet)) Some(groupAttrs)
    else None
  }

  /** Walk `plan` down through row-preserving ops, mapping each of `attrs`
    * to the scan column it is a direct alias of; succeeds when the walk
    * ends at a single bare scan whose RELY PK ⊆ the mapped names. */
  private def coversPk(attrs: Seq[Attribute], plan: LogicalPlan): Boolean = {
    def walk(names: Map[Long, String], p: LogicalPlan): Boolean = p match {
      case Filter(_, child) => walk(names, child)
      case Project(pl, child) =>
        // An attr traces through a Project iff it appears verbatim in the
        // projection; aliases/renames conservatively stop the trace.
        val surviving = pl.collect {
          case a: Attribute if names.contains(a.exprId.id) => a.exprId.id -> names(a.exprId.id)
        }.toMap
        walk(surviving, child)
      case LogicalRelation(fs: HadoopFsRelation, out, _, _, _) =>
        scanTable(fs).flatMap(t => ConstraintCatalog.primaryKey(t).filter(_.rely)) match {
          case Some(pk) =>
            val traced = out.filter(a => names.contains(a.exprId.id)).map(_.name.toLowerCase).toSet
            pk.cols.forall(traced.contains)
          case None => false
        }
      case _ => false
    }
    walk(attrs.map(a => a.exprId.id -> a.name.toLowerCase).toMap, plan)
  }

  /** COUNT(DISTINCT pk...) over a single scan is COUNT(pk...): with the
    * full RELY primary key among the counted columns, every surviving row
    * is already unique, so the DISTINCT's Expand + extra aggregation
    * level buys nothing. Only fires when the aggregate's child traces to
    * one bare scan through row-preserving ops (a join below could
    * duplicate key values and genuinely needs the DISTINCT). */
  private def rewriteCountDistinct(a: Aggregate): Aggregate = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count}
    a.copy(aggregateExpressions = a.aggregateExpressions.map(_.transform {
      case ae: AggregateExpression if ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(children) if children.nonEmpty &&
              children.forall(_.isInstanceOf[Attribute]) &&
              coversPk(children.map(_.asInstanceOf[Attribute]), a.child) =>
            ae.copy(isDistinct = false)
          case _ => ae
        }
    }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (ConstraintCatalog.isEmpty) return plan
    plan.transform {
      case p @ Project(_, j: Join) =>
        eliminate(p.references, j).map(c => p.copy(child = c)).getOrElse(p)
      case a @ Aggregate(_, _, j: Join, _) if distinctShape(a).isEmpty =>
        eliminate(a.references, j).map(c => a.copy(child = c)).getOrElse(rewriteCountDistinct(a))
      case a: Aggregate =>
        distinctShape(a) match {
          case Some(groupAttrs) if coversPk(groupAttrs, a.child) =>
            Project(a.aggregateExpressions, a.child)
          case _ =>
            a.child match {
              case j: Join =>
                eliminate(a.references, j).map(c => a.copy(child = c))
                  .getOrElse(rewriteCountDistinct(a))
              case _ => rewriteCountDistinct(a)
            }
        }
    }
  }
}

/** Session-agnostic singleton for tests and ad-hoc invocation — resolves
  * table names against the thread-active session. GraftExtensions
  * injects a per-session instance instead, so each session's rule
  * verifies identity against ITS OWN catalog. */
object ConstraintRewrites extends ConstraintRewrites(() => SparkSession.active)
