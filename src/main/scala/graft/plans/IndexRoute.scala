package graft.plans

import java.util.concurrent.ConcurrentHashMap

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, EqualTo, Expression, In, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.SqlShims

import graft.sources.CompactIndexIO

/** Transparent index routing — the other half of the reference's compact
  * index (ql/index/compact/CompactIndexHandler.java): Hive users never
  * call the index; `hive.optimize.index.filter` makes the COMPILER
  * rewrite a filtered scan to read only the index-named splits
  * (HiveIndexedInputFormat). Same contract here: register an index
  * against a table path, and a plain `df.filter(col === v)` (or IN) over
  * that path is rewritten by this rule to scan only the files the index
  * names — the query text never changes.
  *
  * Soundness: the route keeps the ORIGINAL Filter on top (the index
  * over-approximates, the filter is exact), and it refuses to fire when
  * the table's current file listing differs from the one the index was
  * built against (the DEFERRED REBUILD staleness contract — a drifted
  * index must degrade to a full scan, never to silent wrong answers).
  *
  * At 100 TB the file listing comparison is catalog-metadata scale (the
  * same listing the scan itself needs), and the index lookup reads a
  * value-sliver of a (value, file) table — exactly the costs Hive's
  * split pruning paid on the client.
  */
object IndexCatalog {

  final case class IndexMeta(tableDir: String, column: String, indexDir: String,
                             knownFiles: Set[String])

  private val byPath = new ConcurrentHashMap[String, IndexMeta]()

  /** Register after CompactIndexIO.build. Captures the file snapshot so
    * routing can detect drift without re-reading the index's stored
    * listing on every query. */
  def register(spark: SparkSession, tableDir: String, column: String, indexDir: String): Unit = {
    val files = spark.read.parquet(tableDir).inputFiles.toSet
    byPath.put(normalize(tableDir), IndexMeta(tableDir, column.toLowerCase, indexDir, files))
  }

  def drop(tableDir: String): Unit = byPath.remove(normalize(tableDir))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty

  private def normalize(dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.toUri.getPath.stripSuffix("/")
  }

  private[plans] def lookup(rootPath: org.apache.hadoop.fs.Path): Option[IndexMeta] =
    Option(byPath.get(rootPath.toUri.getPath.stripSuffix("/")))
}

object IndexRoute extends Rule[LogicalPlan] {

  /** Catalyst-internal literal → external value, for the types a value
    * index is built on (strings and plain numerics; anything else —
    * timestamps, intervals, binary — declines the route rather than risk
    * an internal-vs-external representation mismatch in the lookup). */
  private def external(v: Any): Option[Any] = v match {
    case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toJavaBigDecimal)
    case _: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
         _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
         _: java.lang.Boolean => Some(v)
    case _ => None
  }

  /** Literal values of an equality/IN predicate on `column`, if the
    * predicate conjunct set contains one. */
  private def valuesFor(cond: Expression, column: String): Option[Seq[Any]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case o => Seq(o)
    }
    val raw = conjuncts(cond).collectFirst {
      case EqualTo(a: Attribute, Literal(v, _)) if a.name.toLowerCase == column => Seq(v)
      case EqualTo(Literal(v, _), a: Attribute) if a.name.toLowerCase == column => Seq(v)
      case In(a: Attribute, vs) if a.name.toLowerCase == column &&
          vs.forall(_.isInstanceOf[Literal]) =>
        vs.map(_.asInstanceOf[Literal].value)
    }
    raw.flatMap { vs =>
      val ext = vs.map(external)
      if (ext.forall(_.isDefined)) Some(ext.flatten) else None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (IndexCatalog.isEmpty) return plan
    plan.transform {
      case f @ Filter(cond, rel @ LogicalRelation(fs: HadoopFsRelation, out, _, _, _)) =>
        val routed = for {
          root <- fs.location.rootPaths.headOption
          meta <- IndexCatalog.lookup(root)
          // staleness guard: route only while the table is the one indexed
          if fs.location.inputFiles.toSet == meta.knownFiles
          values <- valuesFor(cond, meta.column)
          spark = SparkSession.active
          files = CompactIndexIO.prunedFiles(spark, meta.indexDir, values)
          if files.size < meta.knownFiles.size
        } yield {
          val pruned =
            if (files.isEmpty)
              SqlShims.analyzed(spark.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](), rel.schema))
            else SqlShims.analyzed(spark.read.schema(rel.schema).parquet(files: _*))
          val aliased = out.zip(pruned.output).map { case (want, have) =>
            Alias(have, want.name)(exprId = want.exprId, qualifier = want.qualifier)
          }
          Filter(cond, Project(aliased, pruned))
        }
        routed.getOrElse(f)
    }
  }
}
