package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.SqlShims

/** Policy-driven column masking and row filtering — the reference's
  * compile-time table masking hook (ql/src/java/org/apache/hadoop/hive/
  * ql/parse/TableMask.java, the seam Ranger's column-mask/row-filter
  * policies plug into: the SEMANTIC ANALYZER rewrites every reference to
  * a governed table into a subquery that filters rows and substitutes
  * masked column expressions, so no query — however it is phrased — can
  * observe raw values). Re-expressed Spark-first: a policy registry
  * keyed by table location plus an injected Catalyst rule that replaces
  * every scan of a governed table with
  *
  * {{{ Project(masked columns, Filter(row policy, fresh scan)) }}}
  *
  * grafted back onto the original scan's attribute ids, so plans above
  * resolve unchanged and every consumer — aggregates, joins, predicates
  * the optimizer pushes down — computes over MASKED values only. A
  * pushed-down user predicate lands ABOVE the mask projection and is
  * substituted through it by Catalyst, never reordered below the policy
  * filter against raw data.
  *
  * Masks are ANSI-SQL expression strings over the table's columns
  * (typically the mask_* compositions of MiscFunctions, which are pure
  * builtins — mask/md5/concat/substr — so the rewrite stays inside
  * whole-stage codegen and pushes no UDF into the scan). A mask must
  * preserve the column's data type (same rule Ranger enforces);
  * [[MaskPolicies.register]] validates that eagerly by planning the
  * rewrite once at registration.
  *
  * Scale: the rewrite adds one codegen'd projection over the scan — no
  * shuffle, no extra pass; the row filter participates in normal filter
  * pushdown toward the parquet reader.
  */
object MaskPolicies {

  /** `masks`: column name -> SQL expression over the table's raw columns
    * (must evaluate to the column's own type). `rowFilter`: SQL boolean
    * over raw columns; rows failing it are invisible. `exemptRoles`:
    * sessions whose ACTIVE roles intersect this set read the table RAW
    * — the Ranger policy-item model, where a mask/row-filter policy
    * names the users/groups/roles it applies to and privileged roles
    * (auditors, data stewards) are carved out. Empty = applies to
    * everyone. */
  final case class Policy(tableDir: String, rowFilter: Option[String],
                          masks: Map[String, String],
                          exemptRoles: Set[String] = Set.empty)

  private val byPath = new ConcurrentHashMap[String, Policy]()

  def register(spark: SparkSession, tableDir: String, rowFilter: Option[String],
               masks: Map[String, String],
               exemptRoles: Set[String] = Set.empty): Unit = {
    require(rowFilter.nonEmpty || masks.nonEmpty, "empty policy")
    val policy = Policy(tableDir, rowFilter,
      masks.map { case (k, v) => (k.toLowerCase, v) },
      exemptRoles.map(_.toLowerCase))
    val raw = spark.read.parquet(tableDir)
    val unknown = policy.masks.keySet -- raw.columns.map(_.toLowerCase).toSet
    require(unknown.isEmpty, s"mask on non-existent column(s): ${unknown.mkString(", ")}")
    // eager validation: the masked plan must analyze and keep the schema
    val masked = TableMaskRule.maskedFrame(spark, raw, policy)
    val before = raw.schema.map(f => (f.name.toLowerCase, f.dataType))
    val after = masked.schema.map(f => (f.name.toLowerCase, f.dataType))
    require(before == after,
      s"policy must preserve the table schema; got $after, want $before")
    byPath.put(graft.PathKeys.normalize(tableDir), policy)
  }

  def drop(tableDir: String): Unit = byPath.remove(graft.PathKeys.normalize(tableDir))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty

  private[plans] def lookup(rootPath: org.apache.hadoop.fs.Path): Option[Policy] =
    // exact key only: a governed dir's own root. Longest-key resolution
    // is unnecessary here because fragments are refused outright below.
    Option(byPath.get(rootPath.toUri.getPath.stripSuffix("/")))

  /** True when the scan root is a STRICT descendant of a governed dir —
    * a single data file or partition subdir of a masked table. Such a
    * scan must be refused outright: masking it against the whole-table
    * policy would change its row set, and letting it through would leak
    * raw values around the policy (the same reason Ranger denies direct
    * HDFS access to policy-covered tables). */
  private[plans] def coversFragment(rootPath: org.apache.hadoop.fs.Path): Boolean =
    graft.PathKeys.isFragment(byPath.keySet.asScala, rootPath)

  /** Governed dirs a scan rooted at an ANCESTOR would sweep up (e.g. a
    * recursive read of the warehouse parent). Such scans are refused:
    * the relation's schema/row set is not the governed table's, so the
    * policy frame cannot be substituted — and letting it through would
    * return the governed rows raw. */
  private[plans] def coveredBy(rootPath: org.apache.hadoop.fs.Path): Seq[String] =
    graft.PathKeys.containedKeys(byPath.keySet.asScala, rootPath)
}

class TableMaskRule(sessionOf: () => SparkSession) extends Rule[LogicalPlan] {
  import TableMaskRule.maskedFrame

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaskPolicies.isEmpty) return plan
    plan.transform {
      // DataSource V2 lane (the graftkv external-storage connector):
      // the mask frame substitutes a parquet relation, so it cannot be
      // grafted onto a kv scan — a governed kv dir (or a kv store inside
      // or above one) is refused outright, never returned raw
      case rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
        rel.table match {
          case kv: graft.sources.KvTable => refuseGovernedKv(kv.dir); rel
          case _ => rel
        }
      case rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        rel.relation.table match {
          case kv: graft.sources.KvTable => refuseGovernedKv(kv.dir); rel
          case _ => rel
        }
      case rel @ LogicalRelation(fs: HadoopFsRelation, out, _, _, _)
          if !graft.PathKeys.isPlanted(fs.options) =>
        val roots = fs.location.rootPaths
        val governed = roots.flatMap(r => MaskPolicies.lookup(r).map(r -> _))
        roots.find(MaskPolicies.coversFragment).foreach { frag =>
          throw new org.apache.hadoop.security.AccessControlException(
            s"direct read of a fragment of a policy-governed table: $frag")
        }
        // the mirror bypass: a scan rooted ABOVE a governed dir (e.g.
        // recursiveFileLookup on its parent) would sweep up governed
        // rows raw — refuse it symmetrically to the fragment refusal
        roots.foreach { r =>
          val swept = MaskPolicies.coveredBy(r)
          if (swept.nonEmpty)
            throw new org.apache.hadoop.security.AccessControlException(
              s"scan rooted at $r includes policy-governed table(s) " +
              s"${swept.mkString(", ")}; query the governed table on its own")
        }
        if (governed.isEmpty) rel
        else if (roots.size > 1)
          // a multi-root relation mixing governed and other data cannot
          // be masked by substituting one table's frame (the other
          // roots' rows would silently vanish) — refuse loudly
          throw new org.apache.hadoop.security.AccessControlException(
            s"multi-path scan includes policy-governed table ${governed.head._1}; " +
            "query the governed table on its own")
        else if ({
          val policy = governed.head._2
          policy.exemptRoles.nonEmpty &&
            graft.security.Roles.currentRoles(sessionOf()).exists(policy.exemptRoles)
        }) {
          // an ACTIVE exempt role reads raw — the Ranger policy-item
          // carve-out. Activation is SET ROLE state, so an auditor who
          // drops the role (SET ROLE NONE) is masked again immediately.
          rel
        } else {
          val policy = governed.head._2
          val spark = sessionOf()
          // fresh full-width scan: the governed relation may already be
          // column-pruned, but masks/filters may need other raw columns
          val masked = SqlShims.analyzed(maskedFrame(spark,
            spark.read.option(graft.PathKeys.PlantedOption, graft.PathKeys.plantedToken)
              .parquet(policy.tableDir), policy))
          val byName = masked.output.map(a => (a.name.toLowerCase, a)).toMap
          val aliased = out.map { want =>
            val have = byName.getOrElse(want.name.toLowerCase,
              throw new IllegalStateException(s"masked frame lost column ${want.name}"))
            Alias(have, want.name)(exprId = want.exprId, qualifier = want.qualifier)
          }
          org.apache.spark.sql.catalyst.plans.logical.Project(aliased, masked)
        }
    }
  }

  private def refuseGovernedKv(dir: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(graft.PathKeys.normalize(dir))
    val governed = MaskPolicies.lookup(p).nonEmpty ||
      MaskPolicies.coversFragment(p) || MaskPolicies.coveredBy(p).nonEmpty
    if (governed)
      throw new org.apache.hadoop.security.AccessControlException(
        s"graftkv scan of a policy-governed location: $dir — masking is not " +
        "expressible through the kv connector; query the governed table directly")
  }
}

object TableMaskRule extends TableMaskRule(() => SparkSession.active) {

  /** The Filter(rowPolicy) + Project(masks) frame over `raw`, columns in
    * `raw`'s order under their original names. */
  private[plans] def maskedFrame(spark: SparkSession,
                                 raw: org.apache.spark.sql.DataFrame,
                                 p: MaskPolicies.Policy): org.apache.spark.sql.DataFrame = {
    val filtered = p.rowFilter.map(raw.filter).getOrElse(raw)
    filtered.selectExpr(raw.columns.map { c =>
      p.masks.get(c.toLowerCase)
        .map(m => s"($m) AS `$c`")
        .getOrElse(s"`$c`")
    }.toIndexedSeq: _*)
  }

}
