package graft.plans

import java.text.{ParsePosition, SimpleDateFormat}

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types._

/** The reference dialect's STRING→date/time parse rules for the
  * date/time UDF family — per-UDF SimpleDateFormat parsing, not a
  * uniform cast (gated on `graft.compat.hive.coercion`; engine sessions
  * keep Spark's parsing):
  *
  *  - hour/minute/second(string) try "yyyy-MM-dd HH:mm:ss" then
  *    "HH:mm:ss" and return NULL when neither matches — a date-only
  *    string is NULL there, midnight here (ql/udf/UDFHour.java:34).
  *  - add_months/last_day/quarter/trunc/months_between parse string
  *    dates with a LENIENT SimpleDateFormat("yyyy-MM-dd")
  *    (GenericUDF.getDateValue:495 via DateUtils.getDateFormat):
  *    '2014-01-34' ROLLS to 2014-02-03, trailing text after the date is
  *    ignored, single-digit fields and 3-digit years parse; a
  *    non-matching prefix ('01/14/2014') is NULL.
  *  - add_months preserves end-of-month: when the input is the last day
  *    of its month the result snaps to the last day of the target month
  *    (GenericUDFAddMonths.addMonth:118).
  *  - months_between first tries the strict timestamp form (seconds
  *    required), then falls back to the lenient DATE parse that drops
  *    any malformed time part ('1995-02-02 10:39' counts as midnight —
  *    GenericUDFMonthsBetween.evaluate).
  *  - date_format builds a SimpleDateFormat from the pattern and
  *    returns NULL for every row when the pattern is SDF-invalid
  *    ('Q'), rather than erroring (GenericUDFDateFormat.java:79).
  *  - from/to_utc_timestamp resolve zones via TimeZone.getTimeZone —
  *    3-letter ids ('PST') work and unknown ids mean GMT
  *    (GenericUDFFromUtcTimestamp.java:112).
  *  - GREATEST/LEAST coerce mixed argument types to the common
  *    COMPARISON class — double when there is none
  *    (FunctionRegistry.getCommonClassForComparison).
  *
  * LITERAL string arguments fold at analysis time; non-foldable string
  * COLUMNS evaluate the same parse per row through
  * [[HiveLenientDate]]/[[HiveStrictTimestamp]] (hour/minute/second were
  * always runtime-guarded via the RLIKE time-bearing test), so column
  * data parses like the reference too.
  */
object HiveDateTimeShims {
  /** Marks nodes this rule already rewrote (fixed-point guard). */
  val Done: TreeNodeTag[Unit] = TreeNodeTag[Unit]("graft.hive.dt")

  /** Lenient "yyyy-MM-dd" parse → epoch days, as DateUtils.getDateFormat
    * (rolls invalid fields, ignores trailing text, default JVM zone). */
  def lenientDateDays(s: String): Option[Int] = {
    val fmt = new SimpleDateFormat("yyyy-MM-dd")
    val pos = new ParsePosition(0)
    val d = fmt.parse(s, pos)
    if (d == null) None
    else Some(d.toInstant.atZone(java.time.ZoneId.systemDefault())
      .toLocalDate.toEpochDay.toInt)
  }

  /** The reference's string→timestamp converter shape: strict
    * `yyyy-mm-dd hh:mm:ss[.f...]` (java.sql.Timestamp.valueOf). */
  def strictTimestamp(s: String): Option[java.sql.Timestamp] =
    try Some(java.sql.Timestamp.valueOf(s.trim)) catch {
      case _: Exception => None
    }
}

/** Per-row lenient "yyyy-MM-dd" parse (string → DATE) — the runtime
  * form of [[HiveDateTimeShims.lenientDateDays]], so NON-LITERAL string
  * columns get the reference's GenericUDF.getDateValue semantics
  * (lenient roll, trailing text ignored, non-matching prefix → NULL)
  * instead of Spark's strict cast. CodegenFallback: compat-session-only
  * and O(1)/row, same class as HiveRand. */
case class HiveLenientDate(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DateType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    HiveDateTimeShims.lenientDateDays(s.toString) match {
      case Some(d) => d
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): HiveLenientDate =
    copy(child = newChild)
}

/** Per-row strict `yyyy-mm-dd hh:mm:ss[.f]` parse (string → TIMESTAMP,
  * java.sql.Timestamp.valueOf), NULL on mismatch — the runtime form of
  * [[HiveDateTimeShims.strictTimestamp]] for months_between's
  * timestamp-first argument rule. */
case class HiveStrictTimestamp(child: Expression)
    extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = true
  override protected def nullSafeEval(s: Any): Any =
    HiveDateTimeShims.strictTimestamp(s.toString) match {
      case Some(ts) =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.fromJavaTimestamp(ts)
      case None => null
    }
  override protected def withNewChildInternal(newChild: Expression): HiveStrictTimestamp =
    copy(child = newChild)
}

class HiveDateTimeShims extends Rule[LogicalPlan] {

  import HiveDateTimeShims._

  private def origin(e: Expression): Expression = e match {
    case c: Cast if c.getTagValue(Cast.USER_SPECIFIED_CAST).isEmpty =>
      origin(c.child)
    case _ => e
  }

  private def isStringy(e: Expression): Boolean =
    origin(e).dataType == StringType

  private def foldedString(e: Expression): Option[String] = {
    val o = origin(e)
    if (o.dataType == StringType && o.foldable)
      Option(o.eval()).map(_.toString)
    else None
  }

  /** Foldable string date arg → lenient-parsed DATE literal. */
  private def lenientDateLiteral(e: Expression): Option[Expression] =
    foldedString(e).map { s =>
      lenientDateDays(s) match {
        case Some(days) => Literal(days, DateType)
        case None => Literal(null, DateType)
      }
    }

  /** Lenient date parse for LITERAL or COLUMN string args: literals
    * fold at analysis time, columns evaluate per row. */
  private def lenientDateExpr(e: Expression): Option[Expression] =
    lenientDateLiteral(e).orElse {
      val o = origin(e)
      if (o.dataType == StringType && !o.foldable) Some(HiveLenientDate(o))
      else None
    }

  /** months_between arg for literal or column strings: strict timestamp
    * first, else the lenient DATE parse at session-zone midnight. */
  private def tsOrDateExpr(e: Expression): Option[Expression] =
    tsOrDateLiteral(e).orElse {
      val o = origin(e)
      if (o.dataType == StringType && !o.foldable)
        Some(If(IsNotNull(HiveStrictTimestamp(o)), HiveStrictTimestamp(o),
          Cast(HiveLenientDate(o), TimestampType)))
      else None
    }

  /** months_between arg: strict timestamp, else lenient date midnight. */
  private def tsOrDateLiteral(e: Expression): Option[Expression] =
    foldedString(e).map { s =>
      strictTimestamp(s) match {
        case Some(ts) =>
          Literal(org.apache.spark.sql.catalyst.util.DateTimeUtils
            .fromJavaTimestamp(ts), TimestampType)
        case None =>
          lenientDateDays(s) match {
            case Some(days) => Cast(Literal(days, DateType), TimestampType)
            case None => Literal(null, TimestampType)
          }
      }
    }

  /** Some(rolled literal) when the STRICT parse of s fails but the
    * reference's valueOf roll succeeds; None otherwise (strictly-valid
    * and unparseable strings both keep Spark's cast). */
  private def rolledCastLiteral(s0: String, dt: DataType): Option[Expression] = {
    val s = s0.trim
    val Ymd = "^(\\d{1,4})-(\\d{1,2})-(\\d{1,2})".r
    val strictOk = Ymd.findPrefixMatchOf(s).exists { m =>
      try { java.time.LocalDate.of(m.group(1).toInt, m.group(2).toInt,
        m.group(3).toInt); true }
      catch { case _: Exception => false }
    }
    if (strictOk) return None
    dt match {
      case DateType =>
        (try Some(java.sql.Date.valueOf(s)) catch { case _: Exception => None })
          .map(d => Literal(d.toLocalDate.toEpochDay.toInt, DateType))
      case _ =>
        (try Some(java.sql.Timestamp.valueOf(s)) catch {
          case _: Exception =>
            try Some(java.sql.Timestamp.valueOf(s + " 00:00:00"))
            catch { case _: Exception => None }
        }).map(ts => Literal(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(ts), TimestampType))
    }
  }

  /** `hour/minute/second(string)`: NULL unless the string leads with a
    * full date-and-time or a time-of-day (the two SDF patterns). */
  private val TimeBearing =
    "^\\s*(\\d{1,6}-\\d{1,2}-\\d{1,2} )?\\d{1,2}:\\d{1,2}:\\d{1,2}"

  private def timeField(build: Expression => Expression,
                        c: Expression): Expression = {
    val guarded = build(Cast(c, TimestampType))
    guarded.setTagValue(Done, ())
    If(RLike(c, Literal(TimeBearing)), guarded, Literal(null, IntegerType))
  }

  /** Hive's common COMPARISON class across greatest/least args:
    * identical stays, otherwise numeric widening within the numeric
    * group, double when the groups differ. */
  private def comparisonType(ts: Seq[DataType]): DataType = {
    def num(t: DataType): Boolean =
      t.isInstanceOf[NumericType]
    // the reference's numeric precedence: tinyint < smallint < int <
    // bigint < decimal < float < double (TypeInfoUtils registry order)
    def width(t: DataType): Int = t match {
      case ByteType => 0; case ShortType => 1; case IntegerType => 2
      case LongType => 3; case _: DecimalType => 4; case FloatType => 5
      case DoubleType => 6; case _ => 7
    }
    ts.reduceLeft { (a, b) =>
      if (a == b) a
      else if (num(a) && num(b)) { if (width(a) >= width(b)) a else b }
      else DoubleType
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("graft.compat.hive.coercion", "false").toBoolean) plan
    else plan.resolveOperatorsUp {
      case p =>
        p.transformExpressionsUp {
          // user-written CAST(string AS date/timestamp): the reference
          // routes through java.sql.Date/Timestamp.valueOf, whose
          // lenient GregorianCalendar ROLLS invalid calendar dates —
          // cast('2002-02-31' as timestamp) is 2002-03-03 there, NULL
          // under Spark's parser. Fires only where the strict parse
          // fails but the roll succeeds.
          case c: Cast
              if c.getTagValue(Cast.USER_SPECIFIED_CAST).isDefined &&
                (c.dataType == DateType || c.dataType == TimestampType) &&
                c.child.resolved && c.child.foldable &&
                c.child.dataType == StringType && c.child.eval() != null &&
                rolledCastLiteral(c.child.eval().toString, c.dataType).isDefined =>
            rolledCastLiteral(c.child.eval().toString, c.dataType).get

          case h: Hour
              if h.getTagValue(Done).isEmpty && h.child.resolved &&
                isStringy(h.child) =>
            timeField(e => Hour(e), origin(h.child))
          case m: Minute
              if m.getTagValue(Done).isEmpty && m.child.resolved &&
                isStringy(m.child) =>
            timeField(e => Minute(e), origin(m.child))
          case s: Second
              if s.getTagValue(Done).isEmpty && s.child.resolved &&
                isStringy(s.child) =>
            timeField(e => Second(e), origin(s.child))

          // add_months: lenient string parse + the END-OF-MONTH rule
          // for every input type
          case am @ AddMonths(d0, n)
              if am.getTagValue(Done).isEmpty && d0.resolved && n.resolved =>
            val d1 = lenientDateExpr(d0).getOrElse(d0)
            val d = if (d1.dataType == DateType) d1 else Cast(d1, DateType)
            def marked(): Expression = {
              val e = AddMonths(d, n)
              e.setTagValue(Done, ())
              e
            }
            If(EqualTo(d, LastDay(d)), LastDay(marked()), marked())

          case LastDay(d0)
              if d0.resolved && isStringy(d0) &&
                lenientDateExpr(d0).isDefined =>
            LastDay(lenientDateExpr(d0).get)

          case q @ Quarter(d0)
              if d0.resolved && isStringy(d0) &&
                lenientDateExpr(d0).isDefined =>
            Quarter(lenientDateExpr(d0).get)

          case t @ TruncDate(d0, fmt)
              if d0.resolved && isStringy(d0) &&
                lenientDateExpr(d0).isDefined =>
            TruncDate(lenientDateExpr(d0).get, fmt)

          case mb @ MonthsBetween(d1, d2, r, tz)
              if d1.resolved && d2.resolved &&
                (tsOrDateExpr(d1).isDefined ||
                  tsOrDateExpr(d2).isDefined) =>
            MonthsBetween(tsOrDateExpr(d1).getOrElse(d1),
              tsOrDateExpr(d2).getOrElse(d2), r, tz)

          // datediff: the reference subtracts RAW millis — strings
          // parse to UTC midnight, DATE values carry LOCAL midnight,
          // timestamps their epoch instant — then truncates the
          // millis/86400000 division toward zero
          // (GenericUDFDateDiff.convertToDate + evaluate:112). A
          // timestamp-vs-date pair straddling a DST change is one day
          // off Spark's calendar diff.
          case dd @ DateDiff(end, start)
              if dd.getTagValue(Done).isEmpty && end.resolved &&
                start.resolved &&
                Seq(end, start).exists(e =>
                  origin(e).dataType == TimestampType) =>
            def secs(e: Expression): Expression = {
              val o = origin(e)
              o.dataType match {
                case TimestampType => Cast(o, LongType)
                case DateType => Cast(Cast(o, TimestampType), LongType)
                case _ => // string: UTC midnight = epochDay · 86400
                  Multiply(Cast(UnixDate(Cast(o, DateType)), LongType),
                    Literal(86400L))
              }
            }
            Cast(IntegralDivide(Subtract(secs(end), secs(start)),
              Literal(86400L)), IntegerType)

          // date_format: SDF-invalid patterns mean a NULL column, and
          // the empty pattern formats every non-null row to ''
          case df @ DateFormatClass(d, fmt, _)
              if df.getTagValue(Done).isEmpty && fmt.resolved &&
                fmt.foldable && fmt.dataType == StringType &&
                fmt.eval() != null =>
            val pat = fmt.eval().toString
            val valid =
              try { new SimpleDateFormat(pat); true }
              catch { case _: IllegalArgumentException => false }
            if (!valid) Literal(null, StringType)
            else if (pat.isEmpty)
              If(IsNull(d), Literal(null, StringType), Literal(""))
            else { df.setTagValue(Done, ()); df }

          // from/to_utc_timestamp: zone ids resolve the JDK
          // TimeZone.getTimeZone way ('PST' works, unknown is GMT)
          case f @ FromUTCTimestamp(ts, tz)
              if tz.resolved && tz.foldable && tz.dataType == StringType &&
                tz.eval() != null && {
                  val z = tz.eval().toString
                  java.util.TimeZone.getTimeZone(z).toZoneId.toString != z
                } =>
            FromUTCTimestamp(ts, Literal(java.util.TimeZone
              .getTimeZone(tz.eval().toString).toZoneId.toString))
          case f @ ToUTCTimestamp(ts, tz)
              if tz.resolved && tz.foldable && tz.dataType == StringType &&
                tz.eval() != null && {
                  val z = tz.eval().toString
                  java.util.TimeZone.getTimeZone(z).toZoneId.toString != z
                } =>
            ToUTCTimestamp(ts, Literal(java.util.TimeZone
              .getTimeZone(tz.eval().toString).toZoneId.toString))

          // GREATEST/LEAST over mixed types — the common comparison
          // class, double when there is none
          case g @ Greatest(cs)
              if cs.forall(_.resolved) && cs.map(_.dataType).distinct.size > 1 =>
            val t = comparisonType(cs.map(_.dataType))
            Greatest(cs.map(c => if (c.dataType == t) c else Cast(c, t)))
          case l @ Least(cs)
              if cs.forall(_.resolved) && cs.map(_.dataType).distinct.size > 1 =>
            val t = comparisonType(cs.map(_.dataType))
            Least(cs.map(c => if (c.dataType == t) c else Cast(c, t)))
        }
    }
}
