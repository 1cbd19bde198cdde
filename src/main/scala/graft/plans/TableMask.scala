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
    * over raw columns; rows failing it are invisible. */
  final case class Policy(tableDir: String, rowFilter: Option[String],
                          masks: Map[String, String])

  private val byPath = new ConcurrentHashMap[String, Policy]()

  def register(spark: SparkSession, tableDir: String, rowFilter: Option[String],
               masks: Map[String, String]): Unit = {
    require(rowFilter.nonEmpty || masks.nonEmpty, "empty policy")
    val policy = Policy(tableDir, rowFilter, masks.map { case (k, v) => (k.toLowerCase, v) })
    val raw = spark.read.parquet(tableDir)
    val unknown = policy.masks.keySet -- raw.columns.map(_.toLowerCase).toSet
    require(unknown.isEmpty, s"mask on non-existent column(s): ${unknown.mkString(", ")}")
    // eager validation: the masked plan must analyze and keep the schema
    val masked = TableMaskRule.maskedFrame(spark, raw, policy)
    val before = raw.schema.map(f => (f.name.toLowerCase, f.dataType))
    val after = masked.schema.map(f => (f.name.toLowerCase, f.dataType))
    require(before == after,
      s"policy must preserve the table schema; got $after, want $before")
    byPath.put(normalize(tableDir), policy)
  }

  def drop(tableDir: String): Unit = byPath.remove(normalize(tableDir))
  def clear(): Unit = { byPath.clear(); TableMaskRule.reset() }
  def isEmpty: Boolean = byPath.isEmpty

  private def normalize(dir: String): String = {
    // absolutize: gate rows register relative dirs, while a scan's
    // rootPaths come back fully qualified — both must hit the same key
    val p = new org.apache.hadoop.fs.Path(dir).toUri.getPath
    val abs = if (new java.io.File(p).isAbsolute) p
              else new java.io.File(p).getAbsolutePath
    abs.stripSuffix("/")
  }

  private[plans] def lookup(rootPath: org.apache.hadoop.fs.Path): Option[Policy] =
    Option(byPath.get(rootPath.toUri.getPath.stripSuffix("/")))

  /** True when the scan root is a STRICT descendant of a governed dir —
    * a single data file or partition subdir of a masked table. Such a
    * scan must be refused outright: masking it against the whole-table
    * policy would change its row set, and letting it through would leak
    * raw values around the policy (the same reason Ranger denies direct
    * HDFS access to policy-covered tables). */
  private[plans] def coversFragment(rootPath: org.apache.hadoop.fs.Path): Boolean = {
    val p = rootPath.toUri.getPath.stripSuffix("/")
    !byPath.containsKey(p) && byPath.keySet.asScala.exists(k => p.startsWith(k + "/"))
  }
}

object TableMaskRule extends Rule[LogicalPlan] {

  // Scans this rule itself planted (by attribute id): the masked subplan
  // contains a fresh scan of the SAME governed dir, which must not be
  // rewritten again on the next fixpoint iteration.
  private val planted = ConcurrentHashMap.newKeySet[Long]()

  private[plans] def reset(): Unit = planted.clear()

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

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (MaskPolicies.isEmpty) return plan
    plan.transform {
      case rel @ LogicalRelation(fs: HadoopFsRelation, out, _, _, _)
          if !out.exists(a => planted.contains(a.exprId.id)) =>
        fs.location.rootPaths.find(MaskPolicies.coversFragment).foreach { frag =>
          throw new org.apache.hadoop.security.AccessControlException(
            s"direct read of a fragment of a policy-governed table: $frag")
        }
        (for {
          root <- fs.location.rootPaths.headOption
          policy <- MaskPolicies.lookup(root)
        } yield {
          val spark = SparkSession.active
          // fresh full-width scan: the governed relation may already be
          // column-pruned, but masks/filters may need other raw columns
          val masked = SqlShims.analyzed(
            maskedFrame(spark, spark.read.parquet(policy.tableDir), policy))
          masked.foreach {
            case LogicalRelation(_, o, _, _, _) => o.foreach(a => planted.add(a.exprId.id))
            case _ =>
          }
          val byName = masked.output.map(a => (a.name.toLowerCase, a)).toMap
          val aliased = out.map { want =>
            val have = byName.getOrElse(want.name.toLowerCase,
              throw new IllegalStateException(s"masked frame lost column ${want.name}"))
            Alias(have, want.name)(exprId = want.exprId, qualifier = want.qualifier)
          }
          org.apache.spark.sql.catalyst.plans.logical.Project(aliased, masked)
        }).getOrElse(rel)
    }
  }
}
