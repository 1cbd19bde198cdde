package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._

/** Hive 2.1's decimal division/average RESULT-TYPE derivation and value
  * chain, reproduced for the compat dialect (gated on
  * `graft.compat.hive.decimal`, set only by the corpus replay session —
  * engine sessions keep Spark's derivation).
  *
  * Division (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/
  * GenericUDFOPDivide.java:118, deriveResultDecimalTypeInfo):
  * {{{
  *   intDig = min(38, p1 - s1 + s2)
  *   decDig = min(38, max(6, s1 + p2 + 1))
  *   if (intDig + decDig > 38) {           // shrink, slight negative bias
  *     decDig -= (intDig + decDig - 38)/2 + 1
  *     intDig  = 38 - decDig
  *   }
  *   result = decimal(intDig + decDig, decDig)
  * }}}
  * Spark's no-precision-loss mode keeps scale = max(6, s1+p2+1) unshrunk
  * (e.g. decimal(30,10)/bigint → (38,30) vs Hive's (38,23)), so rendered
  * scales — and overflow-to-null boundaries — diverge.
  *
  * Average (GenericUDAFAverage.java:229): intPart = p - s, scale =
  * min(s + 4, 38 - intPart) — Spark's bounded(p+4, s+4) matches until
  * p + 4 > 38, where Hive sacrifices the extra scale first.
  *
  * Integral operands take Hive's decimal equivalents — byte (3,0),
  * short (5,0), int (10,0), long (19,0) (TypeInfoUtils) — NOT Spark's
  * (20,0) for long.
  */
object HiveDecimalArith {
  /** Marks Average aggregates already wrapped in the Hive-type cast. */
  val AvgDone: TreeNodeTag[Unit] = TreeNodeTag[Unit]("graft.decimal.avg")

  val MaxPrecision = 38

  def divideType(p1: Int, s1: Int, p2: Int, s2: Int): DecimalType = {
    var intDig = math.min(MaxPrecision, p1 - s1 + s2)
    var decDig = math.min(MaxPrecision, math.max(6, s1 + p2 + 1))
    val diff = intDig + decDig - MaxPrecision
    if (diff > 0) {
      decDig -= diff / 2 + 1 // slight negative bias, as the reference
      intDig = MaxPrecision - decDig
    }
    DecimalType(intDig + decDig, decDig)
  }

  def avgType(p: Int, s: Int): DecimalType = {
    val intPart = p - s
    val scale = math.min(s + 4, MaxPrecision - intPart)
    DecimalType(intPart + scale, scale)
  }

  /** HiveDecimal.trim: strip trailing zeros, no negative scales. */
  private def trim(d: JBigDecimal): JBigDecimal = {
    if (d.compareTo(JBigDecimal.ZERO) == 0) JBigDecimal.ZERO
    else {
      val t = d.stripTrailingZeros()
      if (t.scale < 0) t.setScale(0) else t
    }
  }

  /** HiveDecimal.normalize(bd, allowRounding=true). */
  def normalize(bd0: JBigDecimal): JBigDecimal = {
    var bd = trim(bd0)
    val intDigits = bd.precision - bd.scale
    if (intDigits > MaxPrecision) return null
    val maxScale =
      math.min(MaxPrecision, math.min(MaxPrecision - intDigits, bd.scale))
    if (bd.scale > maxScale)
      bd = trim(bd.setScale(maxScale, RoundingMode.HALF_UP))
    bd
  }

  /** HiveDecimal.enforcePrecisionScale — HALF_UP to the target scale,
    * null when the integer digits overflow the target. */
  def enforce(bd0: JBigDecimal, maxPrec: Int, maxScale: Int): JBigDecimal = {
    if (bd0.compareTo(JBigDecimal.ZERO) == 0 && bd0.scale == 0 &&
        maxPrec == maxScale)
      return bd0.setScale(maxScale)
    var bd = trim(bd0)
    if (bd.scale > maxScale) bd = bd.setScale(maxScale, RoundingMode.HALF_UP)
    if (bd.precision - bd.scale > maxPrec - maxScale) null else bd
  }
}

/** `decimal / decimal` with Hive 2.1's result type and value chain:
  * quotient at scale 38 HALF_UP (HiveDecimal.divide:233), normalized to
  * 38 digits, then enforced to the derived result type — each step
  * rounds exactly where the reference rounds. Divide-by-zero is NULL.
  * Compat-lane only (never on the bench path), so interpreted eval. */
case class HiveDecimalDivide(left: Expression, right: Expression,
    resultType: DecimalType)
  extends BinaryExpression with CodegenFallback {

  import HiveDecimalArith._

  override def dataType: DataType = resultType
  override def nullable: Boolean = true
  override def prettyName: String = "hive_decimal_divide"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val lb = l.asInstanceOf[Decimal].toJavaBigDecimal
    val rb = r.asInstanceOf[Decimal].toJavaBigDecimal
    if (rb.signum == 0) return null
    var bd = lb.divide(rb, MaxPrecision, RoundingMode.HALF_UP)
    bd = normalize(bd)
    if (bd == null) return null
    bd = enforce(bd, resultType.precision, resultType.scale)
    if (bd == null) return null
    val d = Decimal(BigDecimal(bd))
    if (d.changePrecision(resultType.precision, resultType.scale)) d else null
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HiveDecimalDivide =
    copy(left = newLeft, right = newRight)
}

class HiveDecimalArithmetic extends Rule[LogicalPlan] {

  import HiveDecimalArith._

  /** Expression under coercion-inserted casts (a user-written CAST is
    * the operand; a DecimalPrecision-inserted one is not). */
  private def origin(e: Expression): Expression = e match {
    case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      origin(c.child)
    case _ => e
  }

  /** Hive's decimal shape of an EXACT-numeric operand. CONSTANT
    * operands report their VALUE's digits, not the type's
    * (WritableConstantIntObjectInspector.precision():50 =
    * BigDecimal.valueOf(v).precision(); the decimal constant OI
    * reports the normalized value's precision/scale) — `key / 2`
    * derives with p2 = 1, not 10. Non-constant integrals take the
    * TypeInfoUtils defaults; None for approximate/non-numeric types. */
  private def exactDec(e: Expression): Option[(Int, Int)] = {
    val o = origin(e)
    def constPS: Option[(Int, Int)] =
      if (!o.foldable) None
      else o.eval() match {
        case null => None
        case d: Decimal =>
          val bd = HiveDecimalArith.normalize(d.toJavaBigDecimal)
          if (bd == null) None
          else Some((math.max(bd.precision, bd.scale), bd.scale))
        case v: Byte => Some((JBigDecimal.valueOf(v.toLong).precision, 0))
        case v: Short => Some((JBigDecimal.valueOf(v.toLong).precision, 0))
        case v: Int => Some((JBigDecimal.valueOf(v.toLong).precision, 0))
        case v: Long => Some((JBigDecimal.valueOf(v).precision, 0))
        case _ => None
      }
    o.dataType match {
      case d: DecimalType => constPS.orElse(Some((d.precision, d.scale)))
      case ByteType => constPS.orElse(Some((3, 0)))
      case ShortType => constPS.orElse(Some((5, 0)))
      case IntegerType => constPS.orElse(Some((10, 0)))
      case LongType => constPS.orElse(Some((19, 0)))
      case _ => None
    }
  }

  private def toDec(e: Expression, p: Int, s: Int): Expression = {
    val o = origin(e)
    if (o.dataType == DecimalType(p, s)) o else Cast(o, DecimalType(p, s))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.decimal", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          case d @ Divide(l, r, _)
              if l.resolved && r.resolved &&
                exactDec(l).isDefined && exactDec(r).isDefined &&
                (origin(l).dataType.isInstanceOf[DecimalType] ||
                  origin(r).dataType.isInstanceOf[DecimalType]) =>
            val (p1, s1) = exactDec(l).get
            val (p2, s2) = exactDec(r).get
            HiveDecimalDivide(toDec(l, p1, s1), toDec(r, p2, s2),
              divideType(p1, s1, p2, s2))
          case ae @ AggregateExpression(avg: Average, _, _, _, _)
              if avg.child.resolved &&
                avg.child.dataType.isInstanceOf[DecimalType] &&
                avg.getTagValue(AvgDone).isEmpty => {
            val dt = avg.child.dataType.asInstanceOf[DecimalType]
            val ht = avgType(dt.precision, dt.scale)
            avg.setTagValue(AvgDone, ())
            if (ht == avg.dataType) ae else Cast(ae, ht)
          }
          // pure-literal decimal arithmetic constant-folds THERE
          // (ConstantPropagate), and the folded constant's OI carries
          // the normalized VALUE's minimal type — `0.09765625BD *
          // 0.09765625BD * 0.0125BD * 578992BD` types (and renders) as
          // decimal(18,16), trailing zeros gone, not the derived
          // multiply chain's (29,20)
          case e: Expression
              if e.resolved && e.foldable && !e.isInstanceOf[Literal] &&
                e.dataType.isInstanceOf[DecimalType] &&
                (e.isInstanceOf[BinaryArithmetic] ||
                  e.isInstanceOf[UnaryMinus] ||
                  e.isInstanceOf[HiveDecimalDivide]) =>
            (try Some(e.eval()) catch { case _: Exception => None }) match {
              case None => e // eval failure: leave for normal analysis
              case Some(null) => Literal(null, e.dataType)
              case Some(d: Decimal) =>
                val bd = normalize(d.toJavaBigDecimal)
                if (bd == null) Literal(null, e.dataType)
                else {
                  val s = bd.scale
                  val p = math.max(bd.precision, s)
                  Literal(Decimal(BigDecimal(bd), p, s), DecimalType(p, s))
                }
              case Some(_) => e
            }
        }
    }
}
