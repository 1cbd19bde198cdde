package graft.compat

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Hive fetch-format rendering (serde2 LazySimpleSerDe text form) —
  * how the reference's CLI prints every value type, reproduced so the
  * replay's `got` rows compare byte-exact against committed goldens.
  * Split from QTestReplay (round 14); behavior unchanged. */
private[compat] object QTestRender {

  /** The zone the reference's test harness pinned (QTestUtil). */
  private[compat] val HarnessZone = java.time.ZoneId.of("America/Los_Angeles")

  private[compat] val TsFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss")

  /** TimestampWritable.toString: rendered in the harness zone, whole-
    * second fraction dropped entirely, trailing zeros trimmed otherwise.
    * Formatted at an EXPLICIT zone — java.sql.Timestamp.toString renders
    * in the JVM default zone, which is not the harness's. The collect
    * path built this Timestamp through Spark's proleptic→hybrid rebase
    * (toJavaTimestamp); fromJavaTimestamp is its exact inverse, so
    * formatting the recovered micros round-trips pre-Gregorian values
    * (year 1039) the way the reference's own parse→print does. */
  private[compat] def renderTimestamp(ts: java.sql.Timestamp): String = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val micros = DateTimeUtils.fromJavaTimestamp(ts)
    val zdt = java.time.LocalDateTime.ofInstant(
      DateTimeUtils.microsToInstant(micros), HarnessZone)
    val base = zdt.format(TsFmt)
    if (zdt.getNano == 0) base
    else base + "." + f"${zdt.getNano}%09d".reverse.dropWhile(_ == '0').reverse
  }

  /** HiveDecimal values print at their DECLARED scale (cast(key as
    * decimal(10,2)) renders `0.00`) — plain form, no zero-stripping. */
  private[compat] def renderDecimal(d: java.math.BigDecimal): String = d.toPlainString

  /** HiveIntervalYearMonth.toString: `y-m`, months normalized to 0-11,
    * one leading sign. */
  private[compat] def renderYearMonth(p: java.time.Period): String = {
    val total = p.toTotalMonths
    val sign = if (total < 0) "-" else ""
    s"$sign${math.abs(total) / 12}-${math.abs(total) % 12}"
  }

  /** HiveIntervalDayTime.toString: `d hh:mm:ss.fffffffff` with a fixed
    * 9-digit nano field. */
  private[compat] def renderDayTime(dur: java.time.Duration): String = {
    val neg = dur.isNegative
    val d = dur.abs
    val sec = d.getSeconds
    val sign = if (neg) "-" else ""
    f"$sign${sec / 86400}%d ${sec / 3600 % 24}%02d:${sec / 60 % 60}%02d:${sec % 60}%02d.${d.getNano}%09d"
  }

  /** Top-level column rendering: nulls are `NULL`, strings bare. */
  def renderValue(v: Any, dt: DataType): String = v match {
    case null => "NULL"
    case _ => dt match {
      case StringType => v.toString
      case BooleanType | ByteType | ShortType | IntegerType | LongType => v.toString
      case FloatType => java.lang.Float.toString(v.asInstanceOf[Float])
      case DoubleType => java.lang.Double.toString(v.asInstanceOf[Double])
      case _: DecimalType => renderDecimal(v.asInstanceOf[java.math.BigDecimal])
      case TimestampType => renderTimestamp(v.asInstanceOf[java.sql.Timestamp])
      case DateType => v.toString
      case _: YearMonthIntervalType => renderYearMonth(v.asInstanceOf[java.time.Period])
      case _: DayTimeIntervalType => renderDayTime(v.asInstanceOf[java.time.Duration])
      case BinaryType => new String(v.asInstanceOf[Array[Byte]], UTF_8)
      case at: ArrayType =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(renderNested(_, at.elementType)).mkString("[", ",", "]")
      case mt: MapType =>
        v.asInstanceOf[scala.collection.Map[Any, Any]].toSeq
          .map { case (k, mv) =>
            s"${renderNested(k, mt.keyType)}:${renderNested(mv, mt.valueType)}" }
          .mkString("{", ",", "}")
      case st: StructType
          if st.fields.length >= 2 && st.fields.head.name == "tag" &&
            st.fields.tail.zipWithIndex.forall { case (f, i) => f.name == s"field$i" } =>
        // the struct-tag uniontype encoding renders the reference's
        // UnionObject.toString way: {tag:value}
        val r = v.asInstanceOf[Row]
        val tag = Option(r.get(0)).map(_.toString.toInt).getOrElse(-1)
        val active =
          if (tag >= 0 && tag + 1 < st.fields.length)
            renderNested(r.get(tag + 1), st.fields(tag + 1).dataType)
          else "null"
        s"{$tag:$active}"
      case st: StructType =>
        // field names render AS DECLARED (parquet_create's
        // struct<A:string,B:string> prints {"A":...}); HiveQL's own
        // lowercasing already happened at parse time for query-built
        // structs
        val r = v.asInstanceOf[Row]
        st.fields.zipWithIndex
          .map { case (f, idx) =>
            "\"" + f.name + "\":" + renderNested(r.get(idx), f.dataType) }
          .mkString("{", ",", "}")
      case _ => v.toString
    }
  }

  /** Inside complex types the reference JSON-izes: strings/timestamps/
    * dates quoted, null lowercase, numerics bare — and decimals print
    * NORMALIZED (HiveDecimal.toString strips trailing zeros; only
    * top-level table columns pad to the declared scale). */
  private[compat] def renderNested(v: Any, dt: DataType): String = v match {
    case null => "null"
    case _ => dt match {
      case StringType | _: CharType | _: VarcharType => "\"" + v.toString + "\""
      case TimestampType => "\"" + renderTimestamp(v.asInstanceOf[java.sql.Timestamp]) + "\""
      case DateType => "\"" + v.toString + "\""
      case _: DecimalType =>
        val d = v.asInstanceOf[java.math.BigDecimal]
        (if (d.compareTo(java.math.BigDecimal.ZERO) == 0) java.math.BigDecimal.ZERO
         else d.stripTrailingZeros).toPlainString
      case _ => renderValue(v, dt)
    }
  }

  def renderRow(row: Row, schema: StructType): String =
    schema.fields.zipWithIndex
      .map { case (f, i) => renderValue(row.get(i), f.dataType) }
      .mkString("\t")
}
