package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** The reference dialect's implicit coercions that ANSI-off Spark still
  * rejects — the SURVEY §1.2 risk register pair, closed as an injected
  * resolution rule gated on `graft.compat.hive.coercion` (set only by
  * the compat session; engine sessions keep Spark's stricter analysis):
  *
  *  1. Comparisons between types with no common comparison class
  *     convert BOTH sides to double — GenericUDFBaseCompare.java:141
  *     ("For now, we always convert to double if we can't find a common
  *     type") with getCommonClassForComparison (FunctionRegistry.java:
  *     728) returning double for timestamp-vs-numeric and null for
  *     boolean-vs-numeric. `ctimestamp1 <= 0` and `cboolean1 > 0` are
  *     both double comparisons there; Hive's timestamp→double is epoch
  *     seconds with fractional nanos and boolean→double is 1.0/0.0 —
  *     exactly Spark's non-ANSI Cast semantics for both.
  *
  *  2. Non-boolean WHERE conditions evaluate by UDFToBoolean truthiness
  *     (ql/udf/UDFToBoolean.java): numerics/timestamps are `!= 0`,
  *     strings are `length != 0`, dates are NULL (filtered out).
  *
  * Both rewrites happen during resolution, before CheckAnalysis would
  * reject the plan; on the double path predicate pushdown of the cast
  * comparison is lost, which is the reference's own behavior (it, too,
  * evaluates the converted comparison row by row).
  */
class HiveImplicitCoercion extends Rule[LogicalPlan] {

  private def numeric(t: DataType): Boolean = t.isInstanceOf[NumericType]

  /** Hive compares these pairs as double; Spark's analysis rejects them. */
  private def doubleCompare(a: DataType, b: DataType): Boolean =
    ((a == TimestampType && numeric(b)) || (numeric(a) && b == TimestampType)
      || (a == BooleanType && numeric(b)) || (numeric(a) && b == BooleanType))

  /** UDFToBoolean truthiness of a non-boolean condition. */
  private def truthy(e: Expression): Option[Expression] = e.dataType match {
    case BooleanType => None
    case _: NumericType | TimestampType =>
      Some(Not(EqualTo(Cast(e, DoubleType), Literal(0.0d))))
    case StringType => Some(GreaterThan(Length(e), Literal(0)))
    case DateType => Some(Literal(null, BooleanType)) // UDFToBoolean: null
    case NullType => Some(Literal(null, BooleanType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else {
      val compared = plan.resolveOperatorsUp {
        case p =>
          p.transformExpressionsUp {
            case cmp: BinaryComparison
                if cmp.left.resolved && cmp.right.resolved &&
                  doubleCompare(cmp.left.dataType, cmp.right.dataType) =>
              cmp.withNewChildren(
                Seq(Cast(cmp.left, DoubleType), Cast(cmp.right, DoubleType)))
            // boolean→timestamp is 1 SECOND there (UDFToBoolean family
            // treats integers as seconds; Spark's direct cast lands on
            // 1 microsecond) — route through int
            case c: Cast
                if c.dataType == TimestampType && c.child.resolved &&
                  c.child.dataType == BooleanType =>
              Cast(Cast(c.child, IntegerType), TimestampType)
          }
      }
      compared.resolveOperatorsUp {
        case f @ Filter(cond, child) if cond.resolved && cond.dataType != BooleanType =>
          truthy(cond).map(t => Filter(t, child)).getOrElse(f)
      }
    }
}
