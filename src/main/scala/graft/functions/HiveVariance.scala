package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types._

/** The reference's variance/stddev family, bit-exact — same RUNNING
  * FORMULA, not just the same math (ql/src/java/org/apache/hadoop/hive/
  * ql/udf/generic/GenericUDAFVariance.java):
  *
  *   iterate:  count++; sum += v;
  *             if (count > 1) { t = count·v − sum;
  *                              variance += t² / (count·(count−1)) }
  *   merge:    t = (m/n)·a − b;
  *             variance += varB + ((n/m)/(n+m))·t²
  *   var_pop   = variance/count        (0 when count == 1)
  *   var_samp  = variance/(count−1)    (0 when count == 1 — the
  *             reference returns 0, not NULL, for a single element)
  *
  * Spark's CentralMomentAgg tracks (mean, m2) with a different update
  * ordering, so double rounding diverges in the last ~2 ulps — enough
  * to flip the corpus goldens (decimal_udf `stddev(key)`). Compat
  * sessions re-register the SQL names onto this; engine sessions keep
  * Spark's aggregates.
  */
case class HiveVariance(child: Expression, kind: String)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = kind

  private lazy val count =
    AttributeReference("count", LongType, nullable = false)()
  private lazy val sum =
    AttributeReference("sum", DoubleType, nullable = false)()
  private lazy val variance =
    AttributeReference("variance", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(count, sum, variance)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0.0), Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = child
    val nc = Add(count, Literal(1L))
    val ns = Add(sum, x)
    val t = Subtract(Multiply(Cast(nc, DoubleType), x), ns)
    val inc = Divide(Multiply(t, t),
      Multiply(Cast(nc, DoubleType),
        Cast(Subtract(nc, Literal(1L)), DoubleType)))
    Seq(
      If(IsNull(x), count, nc),
      If(IsNull(x), sum, ns),
      If(Or(IsNull(x), LessThanOrEqual(nc, Literal(1L))), variance,
        Add(variance, inc)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val n = count.left
    val m = count.right
    val a = sum.left
    val b = sum.right
    val t = Subtract(
      Multiply(Divide(Cast(m, DoubleType), Cast(n, DoubleType)), a), b)
    val inc = Multiply(Multiply(
      Divide(Divide(Cast(n, DoubleType), Cast(m, DoubleType)),
        Add(Cast(n, DoubleType), Cast(m, DoubleType))), t), t)
    Seq(
      Add(n, m),
      Add(a, b),
      If(EqualTo(n, Literal(0L)), variance.right,
        If(EqualTo(m, Literal(0L)), variance.left,
          Add(variance.left, Add(variance.right, inc)))))
  }

  override lazy val evaluateExpression: Expression = {
    val divisor = kind match {
      case "var_pop" | "stddev_pop" => Cast(count, DoubleType)
      case _ => Cast(Subtract(count, Literal(1L)), DoubleType)
    }
    val v = If(EqualTo(count, Literal(0L)),
      Literal(null, DoubleType),
      If(GreaterThan(count, Literal(1L)), Divide(variance, divisor),
        Literal(0.0)))
    if (kind.startsWith("stddev")) Sqrt(v) else v
  }

  override protected def withNewChildInternal(newChild: Expression): HiveVariance =
    copy(child = newChild)
}

/** The reference's corr(x, y) — running means plus co-moments with its
  * exact iterate/merge arithmetic (GenericUDAFCorrelation.java:
  * deltaX/count running means; merge recombines via
  * (avgA−avgB)²·nA·nB/n with the reference's long-vs-double cast
  * placement). NULL when fewer than two pairs. */
case class HiveCorrelation(left: Expression, right: Expression)
    extends DeclarativeAggregate with BinaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "corr"

  private lazy val count =
    AttributeReference("count", LongType, nullable = false)()
  private lazy val xavg =
    AttributeReference("xavg", DoubleType, nullable = false)()
  private lazy val yavg =
    AttributeReference("yavg", DoubleType, nullable = false)()
  private lazy val xvar =
    AttributeReference("xvar", DoubleType, nullable = false)()
  private lazy val yvar =
    AttributeReference("yvar", DoubleType, nullable = false)()
  private lazy val covar =
    AttributeReference("covar", DoubleType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(count, xavg, yavg, xvar, yvar, covar)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0.0), Literal(0.0), Literal(0.0), Literal(0.0),
      Literal(0.0))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = left
    val y = right
    val anyNull = Or(IsNull(x), IsNull(y))
    val deltaX = Subtract(x, xavg)
    val deltaY = Subtract(y, yavg)
    val nc = Add(count, Literal(1L))
    val nxavg = Add(xavg, Divide(deltaX, Cast(nc, DoubleType)))
    val nyavg = Add(yavg, Divide(deltaY, Cast(nc, DoubleType)))
    val first = LessThanOrEqual(nc, Literal(1L)) // count>1 checked post-inc
    Seq(
      If(anyNull, count, nc),
      If(anyNull, xavg, nxavg),
      If(anyNull, yavg, nyavg),
      If(Or(anyNull, first), xvar,
        Add(xvar, Multiply(deltaX, Subtract(x, nxavg)))),
      If(Or(anyNull, first), yvar,
        Add(yvar, Multiply(deltaY, Subtract(y, nyavg)))),
      If(Or(anyNull, first), covar,
        Add(covar, Multiply(deltaX, Subtract(y, nyavg)))))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val nA = count.left
    val nB = count.right
    val nc = Add(nA, nB)
    val ncD = Cast(nc, DoubleType)
    def merged(avgA: Expression, avgB: Expression): Expression =
      Divide(Add(Multiply(avgA, Cast(nA, DoubleType)),
        Multiply(avgB, Cast(nB, DoubleType))), ncD)
    val dx = Subtract(xavg.left, xavg.right)
    val dy = Subtract(yavg.left, yavg.right)
    // xvar/yvar: ((d·d)·nA)·nB/count, all double steps; covar: the
    // reference multiplies nA·nB as LONGS first — kept verbatim
    def momInc(d: Expression): Expression =
      Divide(Multiply(Multiply(Multiply(d, d), Cast(nA, DoubleType)),
        Cast(nB, DoubleType)), ncD)
    val covInc = Multiply(Multiply(dx, dy),
      Divide(Cast(Multiply(nA, nB), DoubleType), ncD))
    def pick(l: Expression, r: Expression, m: Expression): Expression =
      If(EqualTo(nA, Literal(0L)), r, If(EqualTo(nB, Literal(0L)), l, m))
    Seq(
      nc,
      pick(xavg.left, xavg.right, merged(xavg.left, xavg.right)),
      pick(yavg.left, yavg.right, merged(yavg.left, yavg.right)),
      pick(xvar.left, xvar.right,
        Add(xvar.left, Add(xvar.right, momInc(dx)))),
      pick(yvar.left, yvar.right,
        Add(yvar.left, Add(yvar.right, momInc(dy)))),
      pick(covar.left, covar.right,
        Add(covar.left, Add(covar.right, covInc))))
  }

  override lazy val evaluateExpression: Expression =
    If(LessThan(count, Literal(2L)), Literal(null, DoubleType),
      Divide(Divide(covar, Sqrt(xvar)), Sqrt(yvar)))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HiveCorrelation =
    copy(left = newLeft, right = newRight)
}

object HiveVariance {
  /** Re-point the SQL names at the reference-formula aggregates
    * (compat sessions only; `variance`/`std` are the reference's
    * population aliases). The builders return the BARE
    * AggregateFunction — the analyzer wraps it with the invocation's
    * own isDistinct flag, so `std(DISTINCT x)` plans through Spark's
    * distinct-aggregate expansion exactly as the reference evaluates
    * GenericUDAFVariance over de-duplicated keys
    * (vectorized_distinct_gby); a pre-wrapped AggregateExpression
    * would hard-error FUNCTION_WITH_UNSUPPORTED_SYNTAX there. */
  def register(s: SparkSession): Unit = {
    Seq("variance" -> "var_pop", "var_pop" -> "var_pop",
      "var_samp" -> "var_samp", "std" -> "stddev_pop",
      "stddev" -> "stddev_pop", "stddev_pop" -> "stddev_pop",
      "stddev_samp" -> "stddev_samp").foreach { case (name, kind) =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        name,
        es => HiveVariance(Cast(es.head, DoubleType), kind), "scala_udf")
    }
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "corr",
      es => HiveCorrelation(Cast(es(0), DoubleType), Cast(es(1), DoubleType)),
      "scala_udf")
  }
}
