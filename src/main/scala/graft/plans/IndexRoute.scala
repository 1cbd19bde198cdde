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
                             knownFiles: Set[String], kind: String = "value")

  private val byPath = new ConcurrentHashMap[String, IndexMeta]()

  /** Register after CompactIndexIO.build (kind="value") or buildMinMax
    * (kind="minmax"). Captures the file snapshot so routing can detect
    * drift without re-reading the index's stored listing on every
    * query. */
  def register(spark: SparkSession, tableDir: String, column: String, indexDir: String,
               kind: String = "value"): Unit = {
    require(Set("value", "minmax", "bloom")(kind), s"unknown index kind $kind")
    val files = spark.read.parquet(tableDir).inputFiles.toSet
    byPath.put(normalize(tableDir), IndexMeta(tableDir, column.toLowerCase, indexDir, files, kind))
  }

  /** Re-capture the file snapshot after an index refresh: the staleness
    * guard pins the listing captured at register time, so a refreshed
    * index would otherwise NEVER route again (guard mismatch on every
    * query, silently degrading to full scans). No-op if unregistered. */
  def refreshSnapshot(spark: SparkSession, tableDir: String): Unit = {
    val key = normalize(tableDir)
    Option(byPath.get(key)).foreach { meta =>
      byPath.put(key, meta.copy(knownFiles =
        spark.read.parquet(meta.tableDir).inputFiles.toSet))
    }
  }

  def drop(tableDir: String): Unit = byPath.remove(normalize(tableDir))
  def clear(): Unit = byPath.clear()
  def isEmpty: Boolean = byPath.isEmpty

  // absolutized key (graft.PathKeys): scan rootPaths come back fully
  // qualified, so a relative registration key would never match (the
  // routing silently never fired for relative dirs before this — caught
  // when the plan pins were made non-vacuous, see IndexSpec)
  private def normalize(dir: String): String = graft.PathKeys.normalize(dir)

  private[plans] def lookup(rootPath: org.apache.hadoop.fs.Path): Option[IndexMeta] =
    Option(byPath.get(rootPath.toUri.getPath.stripSuffix("/")))
}

object IndexRoute extends Rule[LogicalPlan] {

  /** Catalyst-internal literal → external value. Strings, numerics, and
    * (for the zone-map route) timestamps/dates convert; anything else
    * declines the route rather than risk an internal-vs-external
    * representation mismatch in the lookup. */
  private def external(v: Any, dt: org.apache.spark.sql.types.DataType): Option[Any] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    import org.apache.spark.sql.types.{DateType, TimestampNTZType, TimestampType}
    (v, dt) match {
      case (s: org.apache.spark.unsafe.types.UTF8String, _) => Some(s.toString)
      case (d: org.apache.spark.sql.types.Decimal, _) => Some(d.toJavaBigDecimal)
      case (micros: java.lang.Long, TimestampType) =>
        Some(DateTimeUtils.toJavaTimestamp(micros))
      case (micros: java.lang.Long, TimestampNTZType) =>
        // NTZ literals must stay NTZ: a raw micros Long would reach the
        // zone-map filter as BIGINT vs TIMESTAMP_NTZ (analysis error)
        Some(DateTimeUtils.microsToLocalDateTime(micros))
      case (days: java.lang.Integer, DateType) => Some(DateTimeUtils.toJavaDate(days))
      case (_: java.lang.Long | _: java.lang.Integer | _: java.lang.Short |
            _: java.lang.Byte | _: java.lang.Double | _: java.lang.Float |
            _: java.lang.Boolean, _) => Some(v)
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case o => Seq(o)
  }

  /** Literal values of an equality/IN predicate on `column`, if the
    * predicate conjunct set contains one. */
  private def valuesFor(cond: Expression, column: String): Option[Seq[Any]] = {
    val raw = conjuncts(cond).collectFirst {
      case EqualTo(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column =>
        Seq((v, l.dataType))
      case EqualTo(l @ Literal(v, _), a: Attribute) if a.name.toLowerCase == column =>
        Seq((v, l.dataType))
      case In(a: Attribute, vs) if a.name.toLowerCase == column &&
          vs.forall(_.isInstanceOf[Literal]) =>
        vs.map(x => (x.asInstanceOf[Literal].value, x.dataType))
    }
    raw.flatMap { vs =>
      val ext = vs.map { case (v, dt) => external(v, dt) }
      if (ext.forall(_.isDefined)) Some(ext.flatten) else None
    }
  }

  /** [lo, hi] bounds (either side optional, at least one present) from
    * range conjuncts on `column`. Strict bounds widen to inclusive —
    * sound for file pruning since the exact filter re-applies on top. */
  private def boundsFor(cond: Expression, column: String): Option[(Option[Any], Option[Any])] = {
    import org.apache.spark.sql.catalyst.expressions.{GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
    var lo: Option[(Any, org.apache.spark.sql.types.DataType)] = None
    var hi: Option[(Any, org.apache.spark.sql.types.DataType)] = None
    conjuncts(cond).foreach {
      case GreaterThanOrEqual(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column => lo = Some((v, l.dataType))
      case GreaterThan(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column => lo = Some((v, l.dataType))
      case LessThanOrEqual(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column => hi = Some((v, l.dataType))
      case LessThan(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column => hi = Some((v, l.dataType))
      case LessThanOrEqual(l @ Literal(v, _), a: Attribute) if a.name.toLowerCase == column => lo = Some((v, l.dataType))
      case LessThan(l @ Literal(v, _), a: Attribute) if a.name.toLowerCase == column => lo = Some((v, l.dataType))
      case GreaterThanOrEqual(l @ Literal(v, _), a: Attribute) if a.name.toLowerCase == column => hi = Some((v, l.dataType))
      case GreaterThan(l @ Literal(v, _), a: Attribute) if a.name.toLowerCase == column => hi = Some((v, l.dataType))
      case EqualTo(a: Attribute, l @ Literal(v, _)) if a.name.toLowerCase == column =>
        lo = Some((v, l.dataType)); hi = Some((v, l.dataType))
      case _ =>
    }
    if (lo.isEmpty && hi.isEmpty) None
    else {
      val loExt = lo.map { case (v, dt) => external(v, dt) }
      val hiExt = hi.map { case (v, dt) => external(v, dt) }
      if (loExt.exists(_.isEmpty) || hiExt.exists(_.isEmpty)) None
      else Some((loExt.flatten, hiExt.flatten))
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
          spark = SparkSession.active
          files <- meta.kind match {
            case "value" =>
              valuesFor(cond, meta.column)
                .map(vs => CompactIndexIO.prunedFiles(spark, meta.indexDir, vs))
            case "minmax" =>
              boundsFor(cond, meta.column)
                .map { case (lo, hi) => CompactIndexIO.prunedFilesRange(spark, meta.indexDir, lo, hi) }
            case "bloom" =>
              valuesFor(cond, meta.column)
                .map(vs => CompactIndexIO.prunedFilesBloom(spark, meta.indexDir, vs))
          }
          if files.size < meta.knownFiles.size
        } yield {
          val pruned =
            if (files.isEmpty)
              SqlShims.analyzed(spark.createDataFrame(
                new java.util.ArrayList[org.apache.spark.sql.Row](), rel.schema))
            else SqlShims.analyzed(spark.read.schema(rel.schema)
              // engine-planted marker: a routed file-level scan must not
              // be mistaken for a user probing governed-table fragments
              .option(graft.PathKeys.PlantedOption, graft.PathKeys.plantedToken)
              .parquet(files: _*))
          val aliased = out.zip(pruned.output).map { case (want, have) =>
            Alias(have, want.name)(exprId = want.exprId, qualifier = want.qualifier)
          }
          Filter(cond, Project(aliased, pruned))
        }
        routed.getOrElse(f)
    }
  }
}
