package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.{SkewCatalog, SkewedTables}

/** List-bucketing pruning — the compile-time half of the reference's
  * skewed tables (ql/src/java/org/apache/hadoop/hive/ql/optimizer/
  * listbucketingpruner/ListBucketingPruner.java:57, grammar
  * HiveParser.g tableSkewed): a filter binding EVERY skew column of a
  * registered list-bucketed layout to literals is conjoined with the
  * equivalent predicate on the routing directory column, so native
  * partition pruning reads only the directories that can hold matching
  * rows.
  *
  *  - hot tuple (in the declared ON list): rows live ONLY in that
  *    tuple's directory → route to its encoded name.
  *  - cold tuple: rows live ONLY in the shared default directory →
  *    route `__skew_dir = '__SKEW_DEFAULT__'`.
  *  - IN predicates cross-product into candidate tuples (capped — a
  *    blown-up product declines to the full scan rather than build a
  *    giant IN).
  *
  * Soundness mirrors IndexRoute's: the ORIGINAL filter stays (the
  * route is a superset restriction implied by [[SkewedTables.write]]'s
  * layout invariant), and the rule declines anything but literal
  * equality/IN covering ALL skew columns — range, non-literal, or
  * partially-bound predicates fall back to the full scan, exactly as
  * the reference's pruner does for non-constant skew predicates. The
  * added conjunct is on a partition column, so
  * PruneFileSourcePartitions (which runs after the operator-
  * optimization batch this rule is injected into) turns it into
  * directory-level pruning — zero data files from the skipped
  * directories are even listed into the scan.
  *
  * Fixed-point guard: the rule never fires on a condition that already
  * references the routing column (its own output, or a user who reads
  * the layout raw and routes by hand).
  */
object SkewRoute extends Rule[LogicalPlan] {

  /** Candidate-tuple cap: above this the route's IN list stops paying
    * for itself and the rule declines (sound — just no pruning). */
  private val MaxTuples = 64

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** String literal values of an equality/IN conjunct on `column`. The
    * skew columns are STRING by [[SkewedTables.write]]'s contract, so
    * only UTF8String literals route; a cast or non-string comparison
    * declines. */
  private def valuesFor(cond: Expression, column: String): Option[Seq[String]] =
    conjuncts(cond).collectFirst {
      case EqualTo(a: Attribute, Literal(s: UTF8String, _)) if a.name.equalsIgnoreCase(column) =>
        Seq(s.toString)
      case EqualTo(Literal(s: UTF8String, _), a: Attribute) if a.name.equalsIgnoreCase(column) =>
        Seq(s.toString)
      case In(a: Attribute, vs) if a.name.equalsIgnoreCase(column) && vs.nonEmpty &&
          vs.forall { case Literal(_: UTF8String, _) => true; case _ => false } =>
        vs.map(_.asInstanceOf[Literal].value.asInstanceOf[UTF8String].toString)
    }

  /** Cross product of per-column candidate values, or None when it
    * exceeds [[MaxTuples]]. */
  private def tuplesOf(perColumn: Seq[Seq[String]]): Option[Seq[Seq[String]]] = {
    if (perColumn.map(_.size.toLong).product > MaxTuples) return None
    Some(perColumn.foldLeft(Seq(Seq.empty[String])) { (acc, vs) =>
      for { t <- acc; v <- vs } yield t :+ v
    })
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (SkewCatalog.isEmpty) return plan
    plan.transform {
      case f @ Filter(cond, rel @ LogicalRelation(fs: HadoopFsRelation, out, _, _, _))
          if !cond.references.exists(_.name == SkewedTables.DirCol) =>
        val routed = for {
          root <- fs.location.rootPaths.headOption
          meta <- SkewCatalog.lookup(root)
          // partition-type inference can type the routing column as
          // int/date when every present directory name is numeric (a
          // hot-values-only layout with no cold rows) — a string literal
          // against that attribute would be an ill-typed post-analysis
          // predicate, so decline instead
          dirAttr <- out.find(a => a.name == SkewedTables.DirCol &&
            a.dataType == org.apache.spark.sql.types.StringType)
          // every skew column must be literal-bound, else decline
          perColumn <- meta.columns.foldLeft(Option(Seq.empty[Seq[String]])) {
            (acc, c) => acc.flatMap(s => valuesFor(cond, c).map(s :+ _))
          }
          tuples <- tuplesOf(perColumn)
        } yield {
          val dirs = tuples.map { t =>
            val enc = SkewedTables.encodeDir(t)
            if (meta.hotDirs(enc)) enc else SkewedTables.Default
          }.distinct
          val route: Expression =
            if (dirs.size == 1) EqualTo(dirAttr, Literal(dirs.head))
            else In(dirAttr, dirs.map(Literal(_)))
          Filter(And(cond, route), rel)
        }
        routed.getOrElse(f)
    }
  }
}
