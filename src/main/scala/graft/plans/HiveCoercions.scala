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

  /** Expression under coercion-inserted casts (user-written CASTs are
    * the expression: `cast('0.22' as float)` IS a float operand). */
  private def origin(e: Expression): Expression = e match {
    case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      origin(c.child)
    case _ => e
  }

  private def rollable(e: Expression): Boolean =
    e.dataType == StringType && e.foldable && lenientDateLit(e).isDefined

  /** A foldable string whose STRICT date parse fails but whose lenient
    * (field-rolling) parse succeeds → the rolled date literal. */
  private def lenientDateLit(e: Expression): Option[Expression] = {
    val s = e.eval() match {
      case null => return None
      case v => v.toString.trim
    }
    val Ymd = "^(\\d{1,4})-(\\d{1,2})-(\\d{1,2})$".r
    Ymd.findFirstMatchIn(s) match {
      case Some(m) =>
        val (y, mo, d) = (m.group(1).toInt, m.group(2).toInt, m.group(3).toInt)
        val valid = try { java.time.LocalDate.of(y, mo, d); true }
          catch { case _: Exception => false }
        if (valid) None // a real calendar date — Spark's own cast handles it
        else try {
          val rolled = java.time.LocalDate.of(y, 1, 1)
            .plusMonths(mo.toLong - 1).plusDays(d.toLong - 1)
          Some(Literal(rolled.toEpochDay.toInt, DateType))
        } catch { case _: Exception => None }
      case None => None
    }
  }

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
            // integral/boolean→timestamp reads MILLISECONDS there by
            // default (PrimitiveObjectInspectorUtils.getTimestamp
            // intToTimestampInSeconds=false), SECONDS under
            // hive.int.timestamp.conversion.in.seconds (which several
            // corpus files SET mid-stream — the replay mirrors it into
            // graft.compat.int.ts.seconds). Floats/doubles read seconds
            // in both engines.
            case c: Cast
                if c.dataType == TimestampType && c.child.resolved &&
                  (c.child.dataType match {
                    case ByteType | ShortType | IntegerType | LongType |
                         BooleanType => true
                    case _ => false
                  }) =>
              val seconds = conf
                .getConfString("graft.compat.int.ts.seconds", "false").toBoolean
              if (seconds) {
                if (c.child.dataType == BooleanType)
                  Cast(Cast(c.child, IntegerType), TimestampType)
                else c // Spark's own integral cast IS seconds
              } else
                // exact: millis → micros by integer multiply (the
                // reference builds `new Timestamp(millis)`); a double
                // route would lose precision past 2^53 and can round
                // negative epochs differently
                MicrosToTimestamp(
                  Multiply(Cast(c.child, LongType), Literal(1000L)))
            // an explicit decimal→string cast renders NORMALIZED there
            // (HiveDecimal.toString strips trailing zeros; GenericUDFToString)
            // — Spark keeps the declared scale's zeros
            case c: Cast
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                  c.dataType == StringType && c.child.resolved &&
                  c.child.dataType.isInstanceOf[DecimalType] =>
              RegExpReplace(
                RegExpReplace(Cast(c.child, StringType),
                  Literal("([.][0-9]*?)0+$"), Literal("$1")),
                Literal("[.]$"), Literal(""))
            // the reference's year()/month()/day()/hour()/minute()/
            // second() accept INTERVAL arguments (field extraction);
            // Spark spells those extract_* — re-point by child type
            case y: Year
                if y.child.resolved &&
                  y.child.dataType.isInstanceOf[YearMonthIntervalType] =>
              ExtractANSIIntervalYears(y.child)
            case mo: Month
                if mo.child.resolved &&
                  mo.child.dataType.isInstanceOf[YearMonthIntervalType] =>
              ExtractANSIIntervalMonths(mo.child)
            case d: DayOfMonth
                if d.child.resolved &&
                  d.child.dataType.isInstanceOf[DayTimeIntervalType] =>
              ExtractANSIIntervalDays(d.child)
            case h: Hour
                if h.child.resolved &&
                  h.child.dataType.isInstanceOf[DayTimeIntervalType] =>
              ExtractANSIIntervalHours(h.child)
            case mi: Minute
                if mi.child.resolved &&
                  mi.child.dataType.isInstanceOf[DayTimeIntervalType] =>
              ExtractANSIIntervalMinutes(mi.child)
            case se: Second
                if se.child.resolved &&
                  se.child.dataType.isInstanceOf[DayTimeIntervalType] =>
              // the reference's second() is integral
              Cast(ExtractANSIIntervalSeconds(se.child), IntegerType)
            // date-vs-string comparisons parse the string with a LENIENT
            // SimpleDateFormat there (DateUtils.getDateFormat):
            // '1970-02-29' rolls to 1970-03-01; Spark's strict parse
            // yields NULL and drops every row. Coercion may already have
            // cast the literal — match through casts.
            case cmp: BinaryComparison
                if cmp.left.resolved && cmp.right.resolved &&
                  ((origin(cmp.left).dataType == DateType &&
                    rollable(origin(cmp.right))) ||
                   (origin(cmp.right).dataType == DateType &&
                    rollable(origin(cmp.left)))) =>
              if (origin(cmp.left).dataType == DateType)
                cmp.withNewChildren(
                  Seq(origin(cmp.left), lenientDateLit(origin(cmp.right)).get))
              else cmp.withNewChildren(
                Seq(lenientDateLit(origin(cmp.left)).get, origin(cmp.right)))
            // sqrt of a NEGATIVE returns NULL there (UDFSqrt guards
            // `if (i < 0) return null`), never NaN
            case sq: Sqrt
                if sq.getTagValue(HiveWindowNullRange.MaskedTag).isEmpty &&
                  sq.child.resolved =>
              val g = Sqrt(sq.child)
              g.setTagValue(HiveWindowNullRange.MaskedTag, ())
              If(LessThan(Cast(sq.child, DoubleType), Literal(0.0)),
                Literal(null, DoubleType), g)
            // log(base, x) with base <= 1 is NULL there (UDFLog's
            // `if (base <= 1.0) return null`); Spark computes the math
            case lg: Logarithm
                if lg.getTagValue(HiveWindowNullRange.MaskedTag).isEmpty &&
                  lg.left.resolved && lg.right.resolved =>
              val g = Logarithm(lg.left, lg.right)
              g.setTagValue(HiveWindowNullRange.MaskedTag, ())
              If(LessThanOrEqual(Cast(lg.left, DoubleType), Literal(1.0)),
                Literal(null, DoubleType), g)
            // cast(boolean AS string) renders UPPERCASE there — the
            // vectorized CastBooleanToString and LazyUtils both write
            // 'TRUE'/'FALSE' (vectorized_casts golden)
            case c: Cast
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                  c.dataType == StringType && c.child.resolved &&
                  c.child.dataType == BooleanType =>
              If(IsNull(c.child), Literal(null, StringType),
                If(c.child, Literal("TRUE"), Literal("FALSE")))
            // cast(timestamp|string AS boolean): UDFToBoolean truthiness
            // (epoch != 0; string length != 0) — Spark nulls or rejects
            case c: Cast
                if c.dataType == BooleanType && c.child.resolved &&
                  c.child.dataType == TimestampType =>
              Not(EqualTo(Cast(c.child, DoubleType), Literal(0.0d)))
            case c: Cast
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                  c.dataType == BooleanType && c.child.resolved &&
                  c.child.dataType == StringType =>
              If(IsNull(c.child), Literal(null, BooleanType),
                GreaterThan(Length(c.child), Literal(0)))
            // a user CAST(integral AS FLOAT) must keep its float
            // ROUNDING: SimplifyCasts would collapse a following
            // double-widening cast straight onto the integral
            case c: Cast
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                  c.getTagValue(HiveWindowNullRange.MaskedTag).isEmpty &&
                  c.dataType == FloatType && c.child.resolved &&
                  (c.child.dataType match {
                    case ByteType | ShortType | IntegerType | LongType => true
                    case _ => false
                  }) =>
              c.setTagValue(HiveWindowNullRange.MaskedTag, ())
              FloatBarrier(c)
            // user CAST(timestamp AS double): TimestampWritable
            // .getDouble computes floor-SECONDS + nanos/1e9 as a double
            // ADDITION (-1.386s renders -1.3860000000000001); Spark's
            // micros/1e6 rounds once and differs in the last ulp
            case c: Cast
                if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                  c.getTagValue(HiveWindowNullRange.MaskedTag).isEmpty &&
                  c.dataType == DoubleType && c.child.resolved &&
                  c.child.dataType == TimestampType =>
              c.setTagValue(HiveWindowNullRange.MaskedTag, ())
              val us = UnixMicros(c.child)
              val mod = Pmod(us, Literal(1000000L))
              val sec = IntegralDivide(Subtract(us, mod), Literal(1000000L))
              Add(Cast(sec, DoubleType),
                Divide(Cast(Multiply(mod, Literal(1000L)), DoubleType),
                  Literal(1.0e9)))
            // sign(decimal) is an INT there (UDFSign's decimal overload
            // returns IntWritable); double input stays double
            case sg: Signum
                if sg.getTagValue(HiveWindowNullRange.MaskedTag).isEmpty &&
                  sg.child.resolved &&
                  origin(sg.child).dataType.isInstanceOf[DecimalType] =>
              val g = Signum(sg.child)
              g.setTagValue(HiveWindowNullRange.MaskedTag, ())
              Cast(g, IntegerType)
            // hex() has no double overload there — UDFHex's implicit
            // conversion routes fractional numerics through STRING
            // (hex(-200.0D) is hex('-200.0')); Spark's hex(double)
            // two's-complements the long
            case h: Hex
                if h.child.resolved && (origin(h.child).dataType match {
                  case FloatType | DoubleType | _: DecimalType => true
                  case _ => false
                }) =>
              Hex(Cast(origin(h.child), StringType))
            // RLIKE with an EMPTY pattern is FALSE there (UDFRegExp
            // keeps a `pattern.length == 0 -> false` guard); Spark's
            // empty regex matches everything
            case rl @ RLike(l, r)
                if l.resolved && r.resolved && r.foldable &&
                  r.dataType == StringType && {
                    val v = r.eval(); v != null && v.toString.isEmpty
                  } =>
              If(IsNull(l), Literal(null, BooleanType), Literal(false))
            // sum(string): GenericUDAFSum's merge sets empty=false
            // BEFORE the double parse and iterate swallows the
            // NumberFormatException — a non-null unparseable string
            // makes the sum non-empty and adds nothing, so
            // sum('val_20', ...) is 0.0 there, never NULL
            // (ppd_windowing2 goldens). Spark's cast-to-null would
            // leave the whole sum NULL.
            case agg @ aggregate.AggregateExpression(
                s: aggregate.Sum, _, _, _, _)
                if s.child.resolved &&
                  origin(s.child).dataType == StringType =>
              val c = origin(s.child)
              agg.copy(aggregateFunction = s.copy(child =
                If(IsNull(c), Literal(null, DoubleType),
                  Coalesce(Seq(Cast(c, DoubleType), Literal(0.0))))))
            // `decimal IN ('0.22', ...)`: the reference unifies IN lists
            // on the VALUE's type (decimal); Spark unifies on string and
            // compares rendered text ('0.220' ≠ '0.22')
            case in @ In(v, list)
                if v.resolved && list.forall(_.resolved) &&
                  origin(v).dataType.isInstanceOf[DecimalType] && list.nonEmpty &&
                  list.exists(e => origin(e).dataType == StringType) &&
                  list.forall(e => origin(e).foldable &&
                    (origin(e).dataType == StringType ||
                      numeric(origin(e).dataType))) =>
              def toDec(e: Expression): Expression = e.dataType match {
                // float reaches decimal through its shortest string form
                // (HiveDecimal.create(Float.toString): 11.22f IS 11.22)
                case FloatType => Cast(Cast(e, StringType), DecimalType(38, 18))
                case _ => Cast(e, DecimalType(38, 18))
              }
              val (nv, nl) = (toDec(origin(v)),
                list.map(e => toDec(origin(e))))
              if (nv.fastEquals(v) && nl.zip(list).forall(p2 => p2._1.fastEquals(p2._2)))
                in
              else In(nv, nl)
            // decimal-vs-float comparisons convert the float to DECIMAL
            // through its shortest string form there (HiveDecimal.create
            // via Float.toString: 0.22f is EXACTLY 0.22) — Spark's
            // double widening makes 0.22f ≠ 0.22 forever. Idempotent by
            // value: the rebuilt tree re-matches but rebuilds equal.
            case cmp: BinaryComparison
                if cmp.left.resolved && cmp.right.resolved &&
                  ((origin(cmp.left).dataType.isInstanceOf[DecimalType] &&
                    origin(cmp.right).dataType == FloatType) ||
                   (origin(cmp.left).dataType == FloatType &&
                    origin(cmp.right).dataType.isInstanceOf[DecimalType])) =>
              def side(e: Expression): Expression = e.dataType match {
                case FloatType => Cast(Cast(e, StringType), DecimalType(38, 18))
                case _ => Cast(e, DecimalType(38, 18))
              }
              val (l, r) = (side(origin(cmp.left)), side(origin(cmp.right)))
              if (l.fastEquals(cmp.left) && r.fastEquals(cmp.right)) cmp
              else cmp.withNewChildren(Seq(l, r))
          }
      }
      compared.resolveOperatorsUp {
        case f @ Filter(cond, child) if cond.resolved && cond.dataType != BooleanType =>
          truthy(cond).map(t => Filter(t, child)).getOrElse(f)
      }
    }
}

/** The reference's RANGE-frame semantics for rows whose ORDER key is
  * NULL (WindowingTableFunction.ValueBoundaryScanner, the use-case
  * table at WindowingTableFunction.java:968): under ASC nulls-first,
  * a null-key row's frame is
  *
  *   - [partition start, end of the null run)  when lo ∈ {UNB P, N P}
  *     and hi ∈ {CURRENT, N F} — the null PEER GROUP, which is exactly
  *     Spark's frame too;
  *   - EMPTY                                   when hi is N PRECEDING
  *     (end scan returns 0) or both bounds sit at/after CURRENT
  *     (start scans to the first non-null key);
  *   - [first non-null, partition end)         when lo ∈ {CURRENT,
  *     N F} and hi is UNB FOLLOWING — the NON-NULL rows only.
  *
  * Spark instead always gives null-key rows their peer group (plus the
  * tail for unbounded-following). Both divergent cases contain NO
  * null-key rows, so masking the aggregate's arguments with
  * `IF(key IS NULL, NULL, arg)` reproduces them exactly: null rows
  * aggregate nothing (sum→NULL, count→0 — Hive's empty-frame results)
  * or only the non-null rows, while non-null rows are untouched (their
  * value-range frames never include null-key rows in either engine).
  * Gated on the compat conf; DESC / nulls-last frames are left to
  * Spark (no corpus golden pins them).
  */
class HiveWindowNullRange extends Rule[LogicalPlan] {

  import HiveWindowNullRange._

  private sealed trait Kind
  private case object UnbP extends Kind
  private case object OffP extends Kind
  private case object Cur extends Kind
  private case object OffF extends Kind
  private case object UnbF extends Kind

  /** Foldable NUMERIC frame bound → its value in (signed) whole units;
    * None for the special boundary markers and interval bounds. */
  private def numericBound(b: Expression): Option[Long] = b match {
    case UnboundedPreceding | UnboundedFollowing | CurrentRow => None
    case e if e.resolved && e.foldable && e.dataType.isInstanceOf[NumericType] =>
      e.eval() match {
        case null => None
        case n: Number => Some(n.longValue())
        case d: Decimal => Some(d.toLong)
        case _ => None
      }
    case _ => None
  }

  private def kind(b: Expression): Option[Kind] = b match {
    case UnboundedPreceding => Some(UnbP)
    case UnboundedFollowing => Some(UnbF)
    case CurrentRow => Some(Cur)
    case e if e.foldable =>
      e.eval() match {
        case null => None
        case n: Number =>
          val v = n.doubleValue()
          Some(if (v < 0) OffP else if (v > 0) OffF else Cur)
        case d: Decimal =>
          val v = d.toDouble
          Some(if (v < 0) OffP else if (v > 0) OffF else Cur)
        case _ => None // calendar intervals: sign not cheaply known
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          // `range N preceding` over a TIMESTAMP ordering key: the
          // reference reads N as SECONDS
          // (TimestampValueBoundaryScanner); Spark demands an interval
          case spec @ WindowSpecDefinition(_, Seq(so),
              SpecifiedWindowFrame(RangeFrame, lo, hi))
              if so.child.resolved && so.child.dataType == TimestampType &&
                (numericBound(lo).isDefined || numericBound(hi).isDefined) =>
            def conv(b: Expression): Expression = numericBound(b) match {
              case Some(secs) => Literal.create(
                java.time.Duration.ofSeconds(secs), DayTimeIntervalType())
              case None => b
            }
            spec.copy(frameSpecification =
              SpecifiedWindowFrame(RangeFrame, conv(lo), conv(hi)))

          case we @ WindowExpression(ae: aggregate.AggregateExpression,
              spec @ WindowSpecDefinition(_, Seq(so),
                SpecifiedWindowFrame(RangeFrame, lo, hi)))
              if we.getTagValue(MaskedTag).isEmpty && so.child.resolved &&
                so.child.nullable && so.direction == Ascending &&
                so.nullOrdering == NullsFirst &&
                (for (l <- kind(lo); h <- kind(hi))
                  yield h == OffP || l == Cur || l == OffF).getOrElse(false) =>
            val key = so.child
            val maskedAf = ae.aggregateFunction
              .withNewChildren(ae.aggregateFunction.children.map(c =>
                If(IsNull(key), Literal(null, c.dataType), c)))
              .asInstanceOf[aggregate.AggregateFunction]
            val out = WindowExpression(ae.copy(aggregateFunction = maskedAf), spec)
            out.setTagValue(MaskedTag, ())
            out
        }
    }
}

object HiveWindowNullRange {
  val MaskedTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.window.nullrange")
}

/** DISTINCT window aggregates — COUNT/SUM/AVG(DISTINCT x) OVER w — which
  * the reference's PTF executor supports (WindowingTableFunction wraps
  * the UDAF over the de-duplicated frame) and Spark rejects outright
  * (DISTINCT_WINDOW_FUNCTION_UNSUPPORTED). Rewritten over
  * `collect_set(x) OVER w` (null-free, distinct — exactly the value
  * multiset the reference's evaluator sees), with the reference's
  * type coercions: integral sums are bigint, string/timestamp sums
  * convert per UDFToDouble with GenericUDAFSum's swallow-and-count
  * parse failures (unparseable strings add 0), averages SKIP
  * unparseable strings entirely (count stays 0 → NULL), decimal
  * sum/avg take the reference's derived types. Gated on the compat
  * conf. */
class HiveDistinctWindow extends Rule[LogicalPlan] {

  import aggregate._

  private def setOver(c: Expression, spec: WindowSpecDefinition): Expression =
    WindowExpression(
      AggregateExpression(CollectSet(c), Complete, isDistinct = false), spec)

  /** fold the collected set: aggregate(set, zero, (acc, v) -> acc + f(v)) */
  private def foldSum(set: Expression, elemType: DataType, accType: DataType,
                      zero: Expression, add: (Expression, Expression) => Expression): Expression = {
    val acc = NamedLambdaVariable("acc", accType, nullable = true)
    val v = NamedLambdaVariable("v", elemType, nullable = true)
    val ident = NamedLambdaVariable("fin", accType, nullable = true)
    ArrayAggregate(set, zero,
      LambdaFunction(add(acc, v), Seq(acc, v)),
      LambdaFunction(ident, Seq(ident)))
  }

  private def nullUnlessNonEmpty(set: Expression, agg: Expression,
                                 t: DataType): Expression =
    If(GreaterThan(Size(set, legacySizeOfNull = false), Literal(0)), agg,
      Literal(null, t))

  private def sumOf(c: Expression, spec: WindowSpecDefinition): Expression = {
    val set = setOver(c, spec)
    c.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        nullUnlessNonEmpty(set,
          foldSum(set, c.dataType, LongType, Literal(0L),
            (a, v) => Add(a, Cast(v, LongType))), LongType)
      case d: DecimalType =>
        val rt = DecimalType(math.min(38, d.precision + 10), d.scale)
        nullUnlessNonEmpty(set,
          Cast(foldSum(set, c.dataType, rt, Cast(Literal(0), rt),
            (a, v) => Cast(Add(a, Cast(v, rt)), rt)), rt), rt)
      case StringType =>
        nullUnlessNonEmpty(set,
          foldSum(set, c.dataType, DoubleType, Literal(0.0),
            (a, v) => Add(a, Coalesce(Seq(Cast(v, DoubleType), Literal(0.0))))),
          DoubleType)
      case _ => // float/double/timestamp/boolean per UDFToDouble
        nullUnlessNonEmpty(set,
          foldSum(set, c.dataType, DoubleType, Literal(0.0),
            (a, v) => Add(a, Cast(v, DoubleType))), DoubleType)
    }
  }

  private def avgOf(c: Expression, spec: WindowSpecDefinition): Expression = {
    val set0 = setOver(c, spec)
    c.dataType match {
      case d: DecimalType =>
        val st = DecimalType(math.min(38, d.precision + 10), d.scale)
        val at = HiveDecimalArith.avgType(d.precision, d.scale)
        val sum = foldSum(set0, c.dataType, st, Cast(Literal(0), st),
          (a, v) => Cast(Add(a, Cast(v, st)), st))
        nullUnlessNonEmpty(set0,
          Cast(Divide(sum, Cast(Size(set0, legacySizeOfNull = false),
            DecimalType(10, 0))), at), at)
      case StringType =>
        // GenericUDAFAverage skips unparseable strings entirely
        val v0 = NamedLambdaVariable("v", StringType, nullable = true)
        val valid = ArrayFilter(set0,
          LambdaFunction(IsNotNull(Cast(v0, DoubleType)), Seq(v0)))
        val sum = foldSum(valid, StringType, DoubleType, Literal(0.0),
          (a, v) => Add(a, Cast(v, DoubleType)))
        nullUnlessNonEmpty(valid, Divide(sum,
          Cast(Size(valid, legacySizeOfNull = false), DoubleType)), DoubleType)
      case _ =>
        val sum = foldSum(set0, c.dataType, DoubleType, Literal(0.0),
          (a, v) => Add(a, Cast(v, DoubleType)))
        nullUnlessNonEmpty(set0, Divide(sum,
          Cast(Size(set0, legacySizeOfNull = false), DoubleType)), DoubleType)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          case WindowExpression(
              ae @ AggregateExpression(af, _, true, _, _), spec: WindowSpecDefinition)
              if af.children.forall(_.resolved) && af.children.size == 1 =>
            val c = af.children.head
            af match {
              case _: Count => Size(setOver(c, spec), legacySizeOfNull = false)
              case _: Sum => sumOf(c, spec)
              case _: Average => avgOf(c, spec)
              case _ => // min/max etc: DISTINCT cannot change the value
                WindowExpression(ae.copy(isDistinct = false), spec)
            }
        }
    }
}

/** DISTINCT over the compat variance lanes — `std(DISTINCT x)` /
  * `variance(DISTINCT x)` etc., which the reference evaluates by
  * feeding GenericUDAFVariance the de-duplicated keys of its single
  * sorted reducer IN ASCENDING KEY ORDER (the distinct expression is
  * the reduce key, so iteration order is the key sort —
  * GroupByOperator over a sorted ReduceSink). Spark's expand-based
  * distinct plan would accumulate in partition-hash order, which
  * flips the running-formula doubles in the last ulps
  * (vectorized_distinct_gby's std(distinct cint) golden).
  *
  * Rewritten as an ascending fold over `sort_array(collect_set(x))`
  * with the reference's exact iterate arithmetic
  * (GenericUDAFVariance.java:183-192) and final division
  * (var_pop = variance/count, var_samp = variance/(count-1), 0.0 for a
  * single element, NULL for none). The collected set funnels each
  * group's distinct values into one buffer — the same memory profile
  * as the reference's own single-reducer evaluation, and gated to the
  * compat session (engine sessions keep Spark's distinct planning). */
class HiveDistinctVariance extends Rule[LogicalPlan] {

  import aggregate._

  private def field(acc: Expression, i: Int, n: String, t: DataType): Expression =
    GetStructField(acc, i, Some(n))

  /** the reference's running formula, folded left over the sorted set */
  private def foldVariance(set: Expression, kind: String): Expression = {
    val sorted = new ArraySort(set)
    val accT = StructType(Seq(
      StructField("count", LongType, nullable = false),
      StructField("sum", DoubleType, nullable = false),
      StructField("variance", DoubleType, nullable = false)))
    val acc = NamedLambdaVariable("acc", accT, nullable = false)
    val v = NamedLambdaVariable("v", DoubleType, nullable = true)
    val cnt = field(acc, 0, "count", LongType)
    val sum = field(acc, 1, "sum", DoubleType)
    val vr = field(acc, 2, "variance", DoubleType)
    // iterate: count++; sum += v; if (count > 1)
    //   { t = count·v − sum; variance += t²/(count·(count−1)) }
    val nc = Add(cnt, Literal(1L))
    val ns = Add(sum, v)
    val t = Subtract(Multiply(Cast(nc, DoubleType), v), ns)
    val inc = Divide(Multiply(t, t),
      Multiply(Cast(nc, DoubleType), Cast(Subtract(nc, Literal(1L)), DoubleType)))
    val step = CreateNamedStruct(Seq(
      Literal("count"), nc,
      Literal("sum"), ns,
      Literal("variance"),
      If(LessThanOrEqual(nc, Literal(1L)), vr, Add(vr, inc))))
    val fin = NamedLambdaVariable("res", accT, nullable = false)
    val fCnt = field(fin, 0, "count", LongType)
    val fVar = field(fin, 2, "variance", DoubleType)
    val divisor = kind match {
      case "var_pop" | "stddev_pop" => Cast(fCnt, DoubleType)
      case _ => Cast(Subtract(fCnt, Literal(1L)), DoubleType)
    }
    val value = If(EqualTo(fCnt, Literal(0L)), Literal(null, DoubleType),
      If(GreaterThan(fCnt, Literal(1L)), Divide(fVar, divisor), Literal(0.0)))
    val folded = ArrayAggregate(
      sorted,
      CreateNamedStruct(Seq(
        Literal("count"), Literal(0L),
        Literal("sum"), Literal(0.0),
        Literal("variance"), Literal(0.0))),
      LambdaFunction(step, Seq(acc, v)),
      LambdaFunction(if (kind.startsWith("stddev")) Sqrt(value) else value,
        Seq(fin)))
    folded
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate =>
        agg.transformExpressionsUp {
          case AggregateExpression(hv: graft.functions.HiveVariance, _, true, filter, _)
              if hv.child.resolved =>
            foldVariance(
              AggregateExpression(CollectSet(hv.child), Complete,
                isDistinct = false, filter),
              hv.kind)
        }
    }
}

/** GROUP BY / ORDER BY over MAP columns — legal in the reference
  * (maps compare by their LazyBinary serialized bytes through
  * ObjectInspectorUtils; groupby_complex_types* group and order on
  * `MAP(key, value)`), rejected outright by Spark's analysis
  * (maps are neither orderable nor groupable there). Rewritten onto
  * `map_entries`: a map grouping expression groups by its entries
  * array (same equivalence classes — entry order of the map
  * constructor is deterministic), result occurrences rebuild the map
  * via map_from_entries over the grouped entries, and a map sort key
  * orders by the entries array (element-wise struct comparison =
  * key-then-value, the byte order of LazyBinary's single-entry
  * string maps; multi-entry maps with equal prefixes order by length
  * both here and there). Gated on graft.compat.hive.coercion. */
class HiveMapGroupOrder extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Sort}

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case agg: Aggregate
          if agg.groupingExpressions.exists(e =>
            e.resolved && e.dataType.isInstanceOf[MapType]) =>
        val mapGroups = agg.groupingExpressions.filter(e =>
          e.resolved && e.dataType.isInstanceOf[MapType])
        val newGrouping = agg.groupingExpressions.map {
          case g if g.resolved && g.dataType.isInstanceOf[MapType] => MapEntries(g)
          case g => g
        }
        val newAggs = agg.aggregateExpressions.map { ae =>
          ae.transformUp {
            case e if mapGroups.exists(_.semanticEquals(e)) =>
              MapFromEntries(MapEntries(e))
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(groupingExpressions = newGrouping,
          aggregateExpressions = newAggs)
      case sort: Sort
          if sort.order.exists(o =>
            o.child.resolved && o.child.dataType.isInstanceOf[MapType]) =>
        sort.copy(order = sort.order.map { o =>
          if (o.child.resolved && o.child.dataType.isInstanceOf[MapType])
            o.copy(child = MapEntries(o.child))
          else o
        })
    }
}

/** The reference's char(n) COMPARISON semantics under
  * `spark.sql.preserveCharVarcharTypeInfo=true` — gated on
  * `graft.compat.hive.char` (compat session only). HiveChar stores and
  * renders the PADDED value but compares, hashes, and aggregates the
  * STRIPPED one (common/src/java/org/apache/hadoop/hive/common/type/
  * HiveChar.java: compareTo/equals/hashCode on getStrippedValue;
  * ObjectInspectorUtils.hashCode CHAR case → HiveCharWritable.hashCode).
  * Spark compares the padded bytes, so `char(10) = 'abc'` and
  * char(10)-vs-char(20) joins diverge. Rewrites, during resolution:
  *
  *  - comparisons / IN with a char side → rtrim every char operand
  *    (space-stripping only, exactly StringUtils.stripEnd(v, " "));
  *  - HiveHash over char/varchar args → char args stripped, varchar
  *    cast (the writable hashes its exact value);
  *  - compute_stats(char) aggregates the stripped form (char_udf1.q.out
  *    pins maxlength of a char(20) at the stripped width).
  */
object HiveCharSemantics {
  /** Marks char→string casts this rule already rewrote (fixed point). */
  val StrippedTag: org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit] =
    org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.char.stripped")
}

class HiveCharSemantics extends Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
  import HiveCharSemantics.StrippedTag

  private def isChar(t: DataType): Boolean = t.isInstanceOf[CharType]

  /** A char/varchar→string Cast carrying the already-rewritten mark. */
  private def markedCast(e: Expression): Cast = {
    val c = Cast(e, StringType)
    c.setTagValue(StrippedTag, ())
    c
  }

  /** Does a char value feed this operand (directly, through coercion's
    * or the parser's casts, or through an earlier pass's strip)? The
    * coercion rules share the resolution fixed point with this one, so
    * any of the forms can arrive first. */
  private def charOrigin(e: Expression): Boolean = e match {
    case _ if isChar(e.dataType) => true
    case c: Cast => charOrigin(c.child)
    case t: StringTrimRight => charOrigin(t.srcStr)
    case _ => false
  }

  private def stringy(t: DataType): Boolean =
    t == StringType || t.isInstanceOf[CharType] || t.isInstanceOf[VarcharType]

  /** Comparisons with a char participant: char sides always compare
    * stripped; a string/varchar LITERAL folds to the char type first
    * and so strips too (orc_ppd_char's `c="apple "`), but a
    * string/varchar COLUMN keeps its exact value (char_join1's
    * 'abc ' row joins nothing). Already-stripped sides pass through,
    * keeping the fixed point stable. */
  private def stripStr(e: Expression): Expression = e match {
    case _: StringTrimRight => e
    case _ if charOrigin(e) && e.dataType == StringType => StringTrimRight(e)
    case _ if charOrigin(e) && stringy(e.dataType) =>
      StringTrimRight(markedCast(e))
    case _ if e.foldable && e.dataType == StringType => StringTrimRight(e)
    case _ if e.foldable && stringy(e.dataType) =>
      StringTrimRight(markedCast(e))
    case _ => e
  }

  /** HiveCharWritable/HiveVarcharWritable.hashCode = Text.hashCode =
    * WritableComparator.hashBytes with SEED 1 over the UTF-8 BYTES,
    * i.e. 31^byteLen + the seed-0 byte hash HiveHash computes. A
    * leading 0x01 byte reproduces the seed exactly (h = 31·0 + 1 = 1
    * after one step), so hashing "\\u0001" ++ s under HiveHash IS the
    * Text hash — byte-length-correct for any value, no length table.
    * NULL hashes to 0. */
  private def textHash(s: Expression): Expression =
    If(IsNull(s), Literal(0),
      HiveHash(Seq(Concat(Seq(Literal("\u0001"), s)))))

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.char", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          // EVERY char→string conversion yields the STRIPPED value in
          // the reference — explicit casts AND the implicit ones
          // argument coercion inserts for string UDFs
          // (PrimitiveObjectInspectorConverter / GenericUDFUtils: char
          // arguments reach UDFs via getStrippedValue; udf_translate,
          // udf_substring_index goldens). The rebuilt Cast carries the
          // done-mark, keeping the fixed point.
          case c: Cast
              if c.dataType == StringType && c.child.resolved &&
                isChar(c.child.dataType) &&
                c.getTagValue(StrippedTag).isEmpty =>
            StringTrimRight(markedCast(c.child))
          // string functions whose char arguments the reference strips
          // (the UDF sees getStrippedValue; golden-pinned by
          // udf_translate / udf_substring_index) — Spark passes these
          // CharType args through un-cast, padded
          case e: Expression
              if e.resolved &&
                Set("translate", "substring_index")(e.prettyName) &&
                e.children.exists(c => isChar(c.dataType)) =>
            e.withNewChildren(e.children.map(c =>
              if (isChar(c.dataType)) StringTrimRight(markedCast(c)) else c))
          case cmp: BinaryComparison
              if cmp.left.resolved && cmp.right.resolved &&
                (charOrigin(cmp.left) || charOrigin(cmp.right)) =>
            val (l, r) = (stripStr(cmp.left), stripStr(cmp.right))
            if (l.fastEquals(cmp.left) && r.fastEquals(cmp.right)) cmp
            else cmp.withNewChildren(Seq(l, r))
          case in @ In(v, list)
              if v.resolved && list.forall(_.resolved) &&
                (charOrigin(v) || list.exists(charOrigin)) =>
            val (nv, nl) = (stripStr(v), list.map(stripStr))
            if (nv.fastEquals(v) && nl.zip(list).forall(p2 => p2._1.fastEquals(p2._2))) in
            else In(nv, nl)
          // hash() over char/varchar columns: the writables hash their
          // Text form (stripped for char, exact for varchar) at seed 1;
          // rebuild the multi-arg chain (r = 31*r + h_i, seed 0 —
          // GenericUDFHash/getBucketHashCode) from per-column hashes
          case h: HiveHash if h.children.forall(_.resolved) && h.children.exists(c =>
              isChar(c.dataType) || c.dataType.isInstanceOf[VarcharType]) =>
            h.children.map { c =>
              c.dataType match {
                case _: CharType => textHash(StringTrimRight(markedCast(c)))
                case _: VarcharType => textHash(markedCast(c))
                case _ => HiveHash(Seq(c)): Expression
              }
            }.reduceLeft((acc, x) => Add(Multiply(acc, Literal(31)), x))
          case agg @ AggregateExpression(
              cs: graft.functions.HiveComputeStats, _, _, _, _)
              if cs.child.resolved && (isChar(cs.child.dataType) ||
                cs.child.dataType.isInstanceOf[VarcharType]) =>
            agg.copy(aggregateFunction = cs.copy(
              child =
                if (isChar(cs.child.dataType))
                  StringTrimRight(markedCast(cs.child))
                else markedCast(cs.child)))
        }
    }
}

/** Identity over a FLOAT value that the optimizer cannot see through:
  * Spark's SimplifyCasts collapses `CAST(CAST(i AS FLOAT) AS DOUBLE)`
  * into `CAST(i AS DOUBLE)`, skipping the float ROUNDING the reference
  * applies (vectorized_casts pins `cast(cint as float) + double` at
  * float precision). Wrapping the user's float cast keeps the rounding. */
/** RANGE-frame peer equality over a TIMESTAMP order key is
  * SECONDS-based there: getBoundaryScanner maps TIMESTAMP onto
  * LongValueBoundaryScanner (WindowingTableFunction.java:1163), whose
  * isEqual compares PrimitiveObjectInspectorUtils.getLong = Timestamp
  * Writable.getSeconds() — sub-second differences do NOT split peer
  * groups, so `sum(b) over (partition by s order by ts)` over rows a
  * few micros apart aggregates the WHOLE second as one peer group
  * (windowing_multipartitioning's goldens carry the full-partition
  * sums). Spark compares full-precision micros. Re-key the window's
  * RANGE ordering at seconds (Cast ts→long = floor seconds — monotone,
  * so only tie structure changes, which is exactly the point).
  * Aggregate window functions only: rank/lag/lead never consult the
  * boundary scanner. Gated on graft.compat.hive.coercion. */
class HiveTimestampRangePeers extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

  private def defaultRange(f: Expression): Boolean = f match {
    case SpecifiedWindowFrame(RangeFrame, UnboundedPreceding, CurrentRow) => true
    case UnspecifiedFrame => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p => p.transformExpressionsUp {
        case we @ WindowExpression(fn: AggregateExpression,
            spec @ WindowSpecDefinition(_, Seq(so), frame))
            if so.child.resolved && so.child.dataType == TimestampType &&
              defaultRange(frame) =>
          we.copy(windowSpec = spec.copy(orderSpec =
            Seq(so.copy(child = Cast(so.child, LongType)))))
      }
    }
}

/** UNION branch common-type widening, the reference way
  * (FunctionRegistry.getCommonClassForUnionAll:680): a STRING branch
  * unioned with a DOUBLE (or DECIMAL) branch widens to the NUMERIC type
  * — `implicitConvertible(string, double)` holds there — where Spark's
  * WidenSetOperationTypes picks STRING (union32's
  * `CAST(key AS DOUBLE) UNION ALL CAST(key AS BIGINT)` renders '0.0'
  * beside '0' here, '0.0 0.0' there). All other pairings agree between
  * the two engines, so this rule fires only on the string-vs-
  * double/decimal corner: it recovers each branch's PRE-coercion type
  * by unwrapping the non-user to-string cast Spark inserted, folds the
  * reference's common type across branches, and re-casts the union
  * OUTPUT (keeping exprIds, so enclosing operators stay bound).
  * Gated on graft.compat.hive.coercion — inert in engine sessions.
  *
  * Pass-ordering invariant: re-aliasing with the SAME exprId but a
  * changed dataType relies on no parent having already resolved
  * references against the union's old string type when this rule
  * fires. That holds in the compat session because the rule runs in
  * the resolution batch, where a parent of a just-widened Union is
  * re-resolved in the same fixed point; a pre-analyzed subtree spliced
  * under a new parent (e.g. a resolved view) would instead need fresh
  * exprIds via resolveOperatorsUpWithNewOutput, which no corpus or
  * gate shape exercises — documenting rather than churning exprIds. */
class HiveUnionWiden extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Project, Union}
  import org.apache.spark.sql.catalyst.trees.TreeNodeTag

  private val Done = TreeNodeTag[Unit]("graft.hive.unionwiden")

  /** Column i's type BEFORE Spark's set-op widening: unwrap the
    * coercion-inserted (non-user) cast to string over a numeric. */
  private def preCoercion(child: LogicalPlan, i: Int): DataType = child match {
    case Project(pl, _) => pl(i) match {
      case Alias(c: Cast, _)
          if c.dataType == StringType &&
            c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty &&
            c.child.resolved && c.child.dataType.isInstanceOf[NumericType] =>
        c.child.dataType
      case e => e.dataType
    }
    case p => p.output(i).dataType
  }

  /** getCommonClassForUnionAll restricted to the divergent corner. The
    * reference's derivation is ORDER-SENSITIVE — it tests
    * `implicitConvertible(a, b)` before `(b, a)` — so `string UNION ALL
    * double` widens to DOUBLE (string converts implicitly to double)
    * while `double UNION ALL string` yields STRING (number→string group
    * conversion, tested first). Spark picks string in BOTH directions;
    * only the string-first-numeric-second corner diverges. Same for
    * decimal, the other numeric type string implicitly converts to. */
  private def common(a: DataType, b: DataType): Option[DataType] = (a, b) match {
    case _ if a == b => Some(a)
    case (StringType, DoubleType) => Some(DoubleType)
    case (StringType, d: DecimalType) => Some(d)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case u: Union
          if u.resolved && u.getTagValue(Done).isEmpty &&
            u.children.length >= 2 =>
        u.setTagValue(Done, ())
        val n = u.children.head.output.length
        val targets = (0 until n).map { i =>
          val pres = u.children.map(c => preCoercion(c, i))
          if (pres.distinct.length <= 1) None
          else pres.tail.foldLeft(Option(pres.head)) {
            case (Some(acc), t) => common(acc, t)
            case (None, _) => None
          }.filter(t => u.output(i).dataType == StringType &&
            t != StringType)
        }
        if (targets.forall(_.isEmpty)) u
        else Project(u.output.zipWithIndex.map { case (a, i) =>
          targets(i) match {
            case Some(t) =>
              Alias(Cast(a, t), a.name)(exprId = a.exprId): NamedExpression
            case None => a: NamedExpression
          }
        }, u)
    }
}

case class FloatBarrier(child: Expression)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "float_barrier"
  override def nullSafeEval(v: Any): Any = v
  override protected def withNewChildInternal(newChild: Expression): FloatBarrier =
    copy(child = newChild)
}
