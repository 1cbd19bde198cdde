package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's data-masking UDF family, bit-faithful
  * (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/GenericUDFMask.java,
  * GenericUDFMaskFirstN/LastN/ShowFirstN/ShowLastN/MaskHash.java):
  *
  *  - `mask(value[, upper, lower, digit, other, number, day, month, year])`
  *  - `mask_first_n(value[, n, upper, lower, digit, other, number])`
  *  - `mask_last_n(...)`, `mask_show_first_n(...)`, `mask_show_last_n(...)`
  *  - `mask_hash(value)` — md5 hex of a string, NULL for other types
  *
  * Character masking classifies by `Character.getType` (upper → X,
  * lower → x, decimal digit → n, other kept; -1 = keep, a string arg's
  * first char = replacement). Numeric masking rebuilds the value digit
  * by digit IN THE VALUE'S OWN WIDTH — the reference accumulates into a
  * byte/short and lets Java wrap, so `mask(123Y, ..., '5')` is
  * (byte) 555 = 43 and `mask(12345S, ..., '5')` is (short) 55555 =
  * -9981; those wraps are committed expected outputs, reproduced here
  * exactly. Date masking replaces day/month/year fields with
  * `java.util.Date`'s lenient semantics (year counted from 1900, month
  * 0-based, out-of-range fields roll over).
  *
  * Eval-based with CodegenFallback: a governance/compat surface, not a
  * hot loop (the policy-driven TableMask path uses the codegen'd
  * builtins; this family exists for reference-exact SQL compat —
  * registered per session via [[MiscFunctions.registerMaskUdfs]] or the
  * compat session, NOT globally: plain `mask` would otherwise shadow
  * Spark's codegen'd builtin for every engine user). */
object HiveMask {

  sealed trait Mode
  case object Mask extends Mode          // params: upper lower digit other number day month year
  case object FirstN extends Mode        // params: n upper lower digit other number
  case object LastN extends Mode
  case object ShowFirstN extends Mode
  case object ShowLastN extends Mode

  private[functions] val Unmasked = -1

  /** One parsed parameter set (defaults = the reference's). */
  private[functions] final case class Params(
      upper: Int = 'X', lower: Int = 'x', digit: Int = 'n', other: Int = Unmasked,
      number: Int = 1, day: Int = 1, month: Int = 0, year: Int = 0, n: Int = 4)

  def register(spark: SparkSession, includePlainMask: Boolean): Unit = {
    val reg = spark.sessionState.functionRegistry
    def put(name: String, mode: Mode): Unit =
      reg.createOrReplaceTempFunction(name, es => HiveMaskExpr(es, mode), "scala_udf")
    if (includePlainMask) put("mask", Mask)
    put("mask_first_n", FirstN)
    put("mask_last_n", LastN)
    put("mask_show_first_n", ShowFirstN)
    put("mask_show_last_n", ShowLastN)
    reg.createOrReplaceTempFunction("mask_hash", es => MaskHashExpr(es.head), "scala_udf")
  }
}

final case class HiveMaskExpr(children: Seq[Expression], mode: HiveMask.Mode)
    extends Expression with CodegenFallback {
  import HiveMask._

  override def nullable: Boolean = true
  override def dataType: DataType = children.head.dataType match {
    // the char/varchar adapters return fresh writables, not the input
    // type — a char result renders at the writable's 255-char width
    case _: CharType | _: VarcharType => StringType
    case dt => dt
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)

  /** The reference's BaseMaskUDF rejects unsupported value types at
    * initialize time — fail analysis the same way rather than silently
    * returning NULL for a typo'd column (double, boolean, decimal...).
    * NullType passes: a bare NULL literal evals to NULL regardless. */
  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.isEmpty)
      return TypeCheckResult.TypeCheckFailure("mask family requires a value argument")
    children.head.dataType match {
      case StringType | ByteType | ShortType | IntegerType | LongType | DateType | NullType =>
        TypeCheckResult.TypeCheckSuccess
      // char/varchar reach the transformer through their
      // Hive(Char|Varchar)TransformerAdapter (BaseMaskUDF.java:159) —
      // char transforms its PADDED value and the char writable re-pads
      // the result to MAX_CHAR_LENGTH (255); varchar is exact
      case _: CharType | _: VarcharType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"mask family does not support ${dt.simpleString} values " +
          "(the reference's BaseMaskUDF rejects them at initialize)")
    }
  }

  /** getCharArg: -1 keeps, a string's first code point replaces. */
  private def charArg(v: Any, dflt: Int): Int = v match {
    case null => dflt
    case s: UTF8String => if (s.numChars() == 0) dflt else s.toString.codePointAt(0)
    case n: Number => n.intValue()
    case _ => dflt
  }

  /** getIntArg: integral value, or a string parsed as an int. */
  private def intArg(v: Any, dflt: Int): Int = v match {
    case null => dflt
    case s: UTF8String =>
      try s.toString.trim.toInt catch { case _: NumberFormatException => dflt }
    case n: Number => n.intValue()
    case _ => dflt
  }

  private def params(row: InternalRow): Params = {
    val vs = children.tail.map(_.eval(row))
    def c(i: Int, d: Int) = if (vs.length > i) charArg(vs(i), d) else d
    def n(i: Int, d: Int) = if (vs.length > i) intArg(vs(i), d) else d
    val base = mode match {
      case Mask =>
        Params(upper = c(0, 'X'), lower = c(1, 'x'), digit = c(2, 'n'), other = c(3, Unmasked),
          number = n(4, 1), day = n(5, 1), month = n(6, 0), year = n(7, 0))
      case _ =>
        // the N-variants consume charCount first; day/month/year slots
        // still exist after numberChar (the transformers inherit the
        // base date masking, so mask_first_n(date) → 1900-01-01)
        Params(n = math.max(0, n(0, 4)),
          upper = c(1, 'X'), lower = c(2, 'x'), digit = c(3, 'n'), other = c(4, Unmasked),
          number = n(5, 1), day = n(6, 1), month = n(7, 0), year = n(8, 0))
    }
    // the reference clamps invalid replacement fields back to defaults
    base.copy(
      number = if (base.number < 0 || base.number > 9) 1 else base.number,
      day = if (base.day != Unmasked && (base.day < 1 || base.day > 31)) 1 else base.day,
      month = if (base.month != Unmasked && (base.month < 0 || base.month > 11)) 0 else base.month)
  }

  private def transformChar(cp: Int, p: Params): Int = Character.getType(cp) match {
    case Character.UPPERCASE_LETTER => if (p.upper != Unmasked) p.upper else cp
    case Character.LOWERCASE_LETTER => if (p.lower != Unmasked) p.lower else cp
    case Character.DECIMAL_DIGIT_NUMBER => if (p.digit != Unmasked) p.digit else cp
    case _ => if (p.other != Unmasked) p.other else cp
  }

  private def transformString(s: String, p: Params): String = {
    val len = s.length
    val sb = new java.lang.StringBuilder(len)
    def masked(i: Int): Boolean = mode match {
      case Mask => true
      case FirstN => i < p.n
      case LastN => i >= math.max(0, len - p.n)
      case ShowFirstN => i >= p.n
      case ShowLastN => i < len - p.n // len <= n handled by caller guard
    }
    val showAll = (mode == ShowFirstN || mode == ShowLastN) && len <= p.n
    var i = 0
    while (i < len) {
      val ch = s.charAt(i).toInt
      sb.appendCodePoint(if (!showAll && masked(i)) transformChar(ch, p) else ch)
      i += 1
    }
    sb.toString
  }

  /** Digit walk from least-significant, accumulating IN the value's own
    * width so the reference's overflow wraps reproduce exactly.
    * `maskAt(i, digitCount)` decides per digit index (LSD = 0). */
  private def transformLong(value: Long, p: Params, bits: Int): Long = {
    var vAbs = if (value < 0) -value else value
    var digitCount = 0
    var t = vAbs
    while (t != 0) { digitCount += 1; t /= 10 }
    val maskAt: Int => Boolean = mode match {
      case Mask => _ => true
      case FirstN =>
        val retain = if (digitCount < p.n) 0 else digitCount - p.n
        i => i >= retain
      case LastN => i => i < p.n
      case ShowFirstN =>
        val maskCount = digitCount - p.n
        if (maskCount <= 0) return value
        i => i < maskCount
      case ShowLastN => i => i >= p.n
    }
    var ret = 0L
    var pos = 1L
    var i = 0
    def clamp(x: Long): Long = bits match {
      case 8 => x.toByte.toLong
      case 16 => x.toShort.toLong
      case 32 => x.toInt.toLong
      case _ => x
    }
    while (vAbs != 0) {
      ret = clamp(ret + (if (maskAt(i)) p.number * pos else (vAbs % 10) * pos))
      vAbs /= 10
      pos *= 10
      i += 1
    }
    if (value < 0) clamp(-ret) else ret
  }

  /** Date masking with java.util lenient rollover (reference uses the
    * deprecated java.sql.Date field constructor: year from 1900, month
    * 0-based). Only plain `mask` reaches dates. */
  private def transformDate(days: Int, p: Params): Int = {
    val orig = java.time.LocalDate.ofEpochDay(days.toLong)
    val y = if (p.year == Unmasked) orig.getYear else 1900 + p.year
    val m0 = if (p.month == Unmasked) orig.getMonthValue - 1 else p.month
    val d = if (p.day == Unmasked) orig.getDayOfMonth else p.day
    val rolled = java.time.LocalDate.of(y, 1, 1).plusMonths(m0.toLong).plusDays((d - 1).toLong)
    rolled.toEpochDay.toInt
  }

  override def eval(input: InternalRow): Any = {
    val v = children.head.eval(input)
    if (v == null) return null
    val p = params(input)
    children.head.dataType match {
      case StringType | _: VarcharType =>
        UTF8String.fromString(transformString(v.asInstanceOf[UTF8String].toString, p))
      case _: CharType => // padded in, re-padded to 255 out
        val t = transformString(v.asInstanceOf[UTF8String].toString, p)
        UTF8String.fromString(t.padTo(255, ' ').mkString)
      case ByteType => transformLong(v.asInstanceOf[Byte].toLong, p, 8).toByte
      case ShortType => transformLong(v.asInstanceOf[Short].toLong, p, 16).toShort
      case IntegerType => transformLong(v.asInstanceOf[Int].toLong, p, 32).toInt
      case LongType => transformLong(v.asInstanceOf[Long], p, 64)
      case DateType => transformDate(v.asInstanceOf[Int], p)
      case _ => null // the reference supports no other types
    }
  }
}

/** GenericUDFMaskHash: md5 hex of a string value; NULL for any other
  * type (the reference returns null rather than erroring). */
final case class MaskHashExpr(child: Expression)
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
  override def eval(input: InternalRow): Any = child.eval(input) match {
    case s: UTF8String =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes).map(b => f"$b%02x").mkString
      child.dataType match {
        // char input hashes its PADDED value into a char writable,
        // which renders at the 255-char width (BaseMaskUDF adapters)
        case _: org.apache.spark.sql.types.CharType =>
          UTF8String.fromString(hex.padTo(255, ' ').mkString)
        case _ => UTF8String.fromString(hex)
      }
    case _ => null
  }
}
