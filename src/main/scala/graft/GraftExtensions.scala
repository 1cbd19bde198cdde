package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{HiveContextNGrams, HiveHistogramNumeric, HiveNGrams, HivePercentileApprox, MinGramHash, ParseUrlTuple, PolyHash, Reflect2, VectorDot}

/** Session-extension entry point — the engine's custom Catalyst
  * expressions and aggregates registered the way a cluster deployment
  * would ship them (the analog of the reference's FunctionRegistry
  * bootstrap, ql/src/java/org/apache/hadoop/hive/ql/exec/
  * FunctionRegistry.java:183):
  *
  * {{{ spark.sql.extensions=graft.GraftExtensions }}}
  *
  * Session.configure sets this, so every Verify/Bench/driver session gets
  * poly_hash / min_gram_hash / hive_percentile_approx resolved at build
  * time with no imperative register calls (the per-module register()
  * helpers remain for sessions built without the config and are
  * idempotent on top of this).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    // per-session instances: the authorization principal, mask-frame
    // builder, and constraint identity must come from the session that
    // OWNS the plan, not SparkSession.active (which on a shared thread
    // may be a different session — a cross-session privilege confusion
    // for the first two, a wrong-catalog rewrite for the third)
    // reference-dialect implicit coercions (timestamp/boolean-vs-numeric
    // comparisons, non-boolean WHERE) — inert unless the session sets
    // graft.compat.hive.coercion (the compat session does)
    ext.injectResolutionRule(_ => new plans.HiveImplicitCoercion)
    // reference-dialect char(n) stripped-comparison semantics — inert
    // unless the session sets graft.compat.hive.char (the compat session)
    ext.injectResolutionRule(_ => new plans.HiveCharSemantics)
    // Hive 2.1 decimal divide/avg result-type derivation — inert unless
    // the session sets graft.compat.hive.decimal (the compat session)
    ext.injectResolutionRule(_ => new plans.HiveDecimalArithmetic)
    // reference-dialect per-UDF date/time string parsing (lenient SDF
    // rolls, hour-of-date-only NULL, add_months end-of-month) — inert
    // unless graft.compat.hive.coercion is set (the compat session)
    ext.injectResolutionRule(_ => new plans.HiveDateTimeShims)
    // reference RANGE-frame semantics over NULL ordering keys — inert
    // unless graft.compat.hive.coercion is set (the compat session)
    ext.injectResolutionRule(_ => new plans.HiveWindowNullRange)
    // DISTINCT window aggregates over collect_set — inert unless
    // graft.compat.hive.coercion is set (the compat session)
    ext.injectResolutionRule(_ => new plans.HiveDistinctWindow)
    // std/variance(DISTINCT x) folded in the reference's ascending
    // single-reducer order — inert unless compat coercion is set
    ext.injectResolutionRule(_ => new plans.HiveDistinctVariance)
    // GROUP BY / ORDER BY over MAP columns via map_entries — inert
    // unless compat coercion is set
    ext.injectResolutionRule(_ => new plans.HiveMapGroupOrder)
    // UNION branch widening to Hive's common class (string+double →
    // double) — inert unless graft.compat.hive.coercion is set
    ext.injectResolutionRule(_ => new plans.HiveUnionWiden)
    // RANGE-frame peers over TIMESTAMP keys compare at SECONDS there
    // (LongValueBoundaryScanner) — inert unless compat coercion is set
    ext.injectResolutionRule(_ => new plans.HiveTimestampRangePeers)
    ext.injectOptimizerRule(s => new security.AuthorizationRule(() => s))
    ext.injectOptimizerRule(s => new plans.TableMaskRule(() => s))
    ext.injectOptimizerRule(_ => plans.FirstTokenRewrite)
    ext.injectOptimizerRule(s => new plans.ConstraintRewrites(() => s))
    ext.injectOptimizerRule(_ => plans.MvRewrite)
    ext.injectOptimizerRule(_ => plans.IndexRoute)
    ext.injectOptimizerRule(_ => plans.SkewRoute)
    ext.injectPlannerStrategy(_ => new plans.AsofJoinStrategy)
    // QUALIFY (Teradata window-predicate clause) as a delegating-parser
    // text rewrite — grammar Spark lacks; zero cost on statements
    // without the keyword
    ext.injectParser((_, delegate) => new plans.GraftSqlParser(delegate))
    ext.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      es => PolyHash(es.head)))
    ext.injectFunction((
      FunctionIdentifier("min_gram_hash"),
      new ExpressionInfo(classOf[MinGramHash].getName, "min_gram_hash"),
      es => MinGramHash(es.head, es(1).eval().asInstanceOf[Number].intValue())))
    ext.injectFunction((
      FunctionIdentifier("hive_percentile_approx"),
      new ExpressionInfo(classOf[HivePercentileApprox].getName, "hive_percentile_approx"),
      es => HivePercentileApprox(es(0), es(1), es(2))))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      es => VectorDot(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("hive_histogram_numeric"),
      new ExpressionInfo(classOf[HiveHistogramNumeric].getName, "hive_histogram_numeric"),
      es => HiveHistogramNumeric(es(0), es(1))))
    ext.injectFunction((
      FunctionIdentifier("reflect2"),
      new ExpressionInfo(classOf[Reflect2].getName, "reflect2"),
      es => Reflect2(es)))
    // parse_url_tuple UDTF — a Generator, so both reference invocation
    // forms (`LATERAL VIEW parse_url_tuple(...)` and `SELECT
    // parse_url_tuple(...) AS (a, b, ...)`) resolve from SQL
    ext.injectFunction((
      FunctionIdentifier("parse_url_tuple"),
      new ExpressionInfo(classOf[ParseUrlTuple].getName, "parse_url_tuple"),
      es => ParseUrlTuple(es)))
    // ngrams / context_ngrams UDAFs — registered as AggregateFunctions so
    // the reference's `ngrams(sentences(lower(c)), 2, 100, 1000)
    // .estfrequency` SQL form resolves (FunctionRegistry.java:398-399)
    ext.injectFunction((
      FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[HiveNGrams].getName, "ngrams"),
      es => HiveNGrams.build(es)))
    ext.injectFunction((
      FunctionIdentifier("context_ngrams"),
      new ExpressionInfo(classOf[HiveContextNGrams].getName, "context_ngrams"),
      es => HiveContextNGrams.build(es)))
  }
}
