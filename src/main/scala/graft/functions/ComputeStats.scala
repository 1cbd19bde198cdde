package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's Flajolet-Martin NDV estimator, BIT-FAITHFUL
  * (ql/udf/generic/NumDistinctValueEstimator.java): 31-bit vectors,
  * pairwise hashes `a*v + b mod 2^31-1` with a/b drawn from
  * java.util.Random(99397)/(9876413) — including the committed quirks
  * (odd-only draws, the `+ 2^30` negative adjustment whose shift binds
  * after the minus, and the index-31 overflow when a hash is zero). The
  * serialized form is the concatenated FastBitSet text the reference
  * commits in its expected outputs, so replays compare byte-exact. */
final class FmSketch(val nvec: Int) extends Serializable {
  import FmSketch._

  // indices 0..31 per vector — one Long word each
  val bits: Array[Long] = new Array[Long](nvec)

  def add(v: Long): Unit = {
    val (a, b) = FmSketch.ab(nvec)
    var i = 0
    while (i < nvec) {
      var hash = {
        var tempHash = a(i).toLong * v + b(i).toLong
        tempHash %= Mod
        var h = tempHash.toInt
        if (h < 0) h += Mod
        h
      }
      var index = 0
      while (index < BitVectorSize && hash % 2 == 0) { hash = hash >> 1; index += 1 }
      bits(i) |= 1L << index
      i += 1
    }
  }

  def merge(o: FmSketch): Unit = {
    var i = 0
    while (i < nvec) { bits(i) |= o.bits(i); i += 1 }
  }

  /** FM estimate: least significant CLEAR bit averaged over vectors. */
  def estimate: Long = {
    var sum = 0
    var i = 0
    while (i < nvec) {
      sum += java.lang.Long.numberOfTrailingZeros(~bits(i))
      i += 1
    }
    val avg = sum / (nvec * 1.0) - math.log(Phi) / math.log(2.0)
    math.pow(2.0, avg).toLong
  }

  /** FastBitSet.toString concatenation: `{0, 1, 2}{0, 4}…`. */
  def serializeText: String = {
    val sb = new StringBuilder
    var i = 0
    while (i < nvec) {
      sb.append('{')
      var bit = 0
      var first = true
      while (bit < 64) {
        if ((bits(i) & (1L << bit)) != 0) {
          if (!first) sb.append(", ")
          sb.append(bit); first = false
        }
        bit += 1
      }
      sb.append('}')
      i += 1
    }
    sb.toString
  }
}

object FmSketch {
  val BitVectorSize = 31
  private val Mod = (1 << BitVectorSize) - 1
  private val Phi = 0.77351

  // a/b per vector-count, derived exactly as the reference does; cached
  // because the Random draws are pure functions of nvec
  private val cache = new java.util.concurrent.ConcurrentHashMap[Int, (Array[Int], Array[Int])]()
  def ab(nvec: Int): (Array[Int], Array[Int]) =
    cache.computeIfAbsent(nvec, { n =>
      val a = new Array[Int](n)
      val b = new Array[Int](n)
      val aR = new java.util.Random(99397)
      val bR = new java.util.Random(9876413)
      var i = 0
      while (i < n) {
        var av = aR.nextInt()
        while (av % 2 == 0) av = aR.nextInt()
        a(i) = av
        var bv = bR.nextInt()
        while (bv % 2 == 0) bv = bR.nextInt()
        b(i) = bv
        // the reference writes `1 << BIT_VECTOR_SIZE - 1`, which Java
        // parses as 1 << 30 — preserved verbatim
        if (a(i) < 0) a(i) = a(i) + (1 << (BitVectorSize - 1))
        if (b(i) < 0) b(i) = b(i) + (1 << (BitVectorSize - 1))
        i += 1
      }
      (a, b)
    })
}

/** Per-type running state of one compute_stats aggregation. */
final class ComputeStatsBuffer extends Serializable {
  var countNulls = 0L
  var countTrues = 0L
  var countFalses = 0L
  var hasValue = false
  var minL = 0L; var maxL = 0L
  var minD = 0.0; var maxD = 0.0
  var minDec: java.math.BigDecimal = _
  var maxDec: java.math.BigDecimal = _
  var maxLen = 0L; var sumLen = 0L; var count = 0L
  var fm: FmSketch = _
}

/** `compute_stats(col, numBitVectors)` — the reference's column-stats
  * UDAF (ql/udf/generic/GenericUDAFComputeStats.java), returning the
  * SAME text the reference's fetch renders for its result struct,
  * including the committed `ndvbitvector` FM bit patterns (FmSketch is
  * bit-faithful) and per-type quirks: HiveDecimal min/max print
  * NORMALIZED (trailing zeros stripped), dates quoted, doubles in Java
  * spelling, `avglength` divides by values+nulls. Emitted as one string
  * (the rendering is the contract the corpus pins; the reference's
  * nested struct is display-only). */
case class HiveComputeStats(
    child: Expression,
    numVectors: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ComputeStatsBuffer] {

  private lazy val nvec: Int = numVectors.eval() match {
    case n: Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"compute_stats numBitVectors must be a literal int, got $other")
  }

  /** The reference's evaluator families (getEvaluator switch). */
  private lazy val family: String = child.dataType match {
    case BooleanType => "Boolean"
    case ByteType | ShortType | IntegerType | LongType | TimestampType => "Long"
    case FloatType | DoubleType => "Double"
    case StringType => "String"
    case _: CharType | _: VarcharType => "String" // same binary repr
    case BinaryType => "Binary"
    case _: DecimalType => "Decimal"
    case DateType => "Date"
    case other => throw new IllegalArgumentException(
      s"compute_stats: unsupported column type $other")
  }

  override def children: Seq[Expression] = Seq(child, numVectors)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "compute_stats"

  override def createAggregationBuffer(): ComputeStatsBuffer = new ComputeStatsBuffer

  /** HiveDecimal normalization: exact zero collapses, else trailing
    * zeros strip (HiveDecimal.trim). */
  private def normDec(d: java.math.BigDecimal): java.math.BigDecimal =
    if (d.compareTo(java.math.BigDecimal.ZERO) == 0) java.math.BigDecimal.ZERO
    else d.stripTrailingZeros

  override def update(buf: ComputeStatsBuffer, row: InternalRow): ComputeStatsBuffer = {
    val v = child.eval(row)
    if (v == null) { buf.countNulls += 1; return buf }
    def fm(): FmSketch = {
      if (buf.fm == null) buf.fm = new FmSketch(nvec)
      buf.fm
    }
    family match {
      case "Boolean" =>
        if (v.asInstanceOf[Boolean]) buf.countTrues += 1 else buf.countFalses += 1
      case "Long" =>
        val l = child.dataType match {
          case TimestampType => Math.floorDiv(v.asInstanceOf[Long], 1000000L) // seconds
          case _ => v.asInstanceOf[Number].longValue()
        }
        if (!buf.hasValue || l < buf.minL) buf.minL = l
        if (!buf.hasValue || l > buf.maxL) buf.maxL = l
        buf.hasValue = true
        fm().add(l)
      case "Double" =>
        val d = v.asInstanceOf[Number].doubleValue()
        if (!buf.hasValue || d < buf.minD) buf.minD = d
        if (!buf.hasValue || d > buf.maxD) buf.maxD = d
        buf.hasValue = true
        fm().add(java.lang.Double.hashCode(d).toLong)
      case "Decimal" =>
        val dec = normDec(v.asInstanceOf[Decimal].toJavaBigDecimal)
        if (buf.minDec == null || dec.compareTo(buf.minDec) < 0) buf.minDec = dec
        if (buf.maxDec == null || dec.compareTo(buf.maxDec) > 0) buf.maxDec = dec
        buf.hasValue = true
        fm().add(dec.hashCode().toLong)
      case "Date" =>
        val days = v.asInstanceOf[Int]
        if (!buf.hasValue || days < buf.minL) buf.minL = days.toLong
        if (!buf.hasValue || days > buf.maxL) buf.maxL = days.toLong
        buf.hasValue = true
        fm().add(days.toLong)
      case "String" =>
        val s = v.asInstanceOf[UTF8String].toString
        if (s.length > buf.maxLen) buf.maxLen = s.length.toLong
        buf.sumLen += s.length
        buf.count += 1
        fm().add(s.hashCode.toLong)
      case "Binary" =>
        val len = v.asInstanceOf[Array[Byte]].length
        if (len > buf.maxLen) buf.maxLen = len.toLong
        buf.sumLen += len
        buf.count += 1
    }
    buf
  }

  override def merge(buf: ComputeStatsBuffer, o: ComputeStatsBuffer): ComputeStatsBuffer = {
    buf.countNulls += o.countNulls
    buf.countTrues += o.countTrues
    buf.countFalses += o.countFalses
    if (o.hasValue) {
      if (!buf.hasValue) { buf.minL = o.minL; buf.maxL = o.maxL; buf.minD = o.minD; buf.maxD = o.maxD }
      else {
        buf.minL = math.min(buf.minL, o.minL); buf.maxL = math.max(buf.maxL, o.maxL)
        buf.minD = math.min(buf.minD, o.minD); buf.maxD = math.max(buf.maxD, o.maxD)
      }
      buf.hasValue = true
    }
    if (o.minDec != null && (buf.minDec == null || o.minDec.compareTo(buf.minDec) < 0))
      buf.minDec = o.minDec
    if (o.maxDec != null && (buf.maxDec == null || o.maxDec.compareTo(buf.maxDec) > 0))
      buf.maxDec = o.maxDec
    buf.maxLen = math.max(buf.maxLen, o.maxLen)
    buf.sumLen += o.sumLen
    buf.count += o.count
    if (o.fm != null) { if (buf.fm == null) buf.fm = new FmSketch(o.fm.nvec); buf.fm.merge(o.fm) }
    buf
  }

  override def eval(buf: ComputeStatsBuffer): Any = {
    val ndv = if (buf.fm == null) 0L else buf.fm.estimate
    val vec = if (buf.fm == null) "" else buf.fm.serializeText
    val json = family match {
      case "Boolean" =>
        s"""{"columntype":"Boolean","counttrues":${buf.countTrues},""" +
          s""""countfalses":${buf.countFalses},"countnulls":${buf.countNulls}}"""
      case "Long" =>
        val (mn, mx) = if (buf.hasValue) (buf.minL.toString, buf.maxL.toString) else ("null", "null")
        s"""{"columntype":"Long","min":$mn,"max":$mx,"countnulls":${buf.countNulls},""" +
          s""""numdistinctvalues":$ndv,"ndvbitvector":"$vec"}"""
      case "Double" =>
        val (mn, mx) =
          if (buf.hasValue) (java.lang.Double.toString(buf.minD), java.lang.Double.toString(buf.maxD))
          else ("null", "null")
        s"""{"columntype":"Double","min":$mn,"max":$mx,"countnulls":${buf.countNulls},""" +
          s""""numdistinctvalues":$ndv,"ndvbitvector":"$vec"}"""
      case "Decimal" =>
        val mn = Option(buf.minDec).map(_.toPlainString).getOrElse("null")
        val mx = Option(buf.maxDec).map(_.toPlainString).getOrElse("null")
        s"""{"columntype":"Decimal","min":$mn,"max":$mx,"countnulls":${buf.countNulls},""" +
          s""""numdistinctvalues":$ndv,"ndvbitvector":"$vec"}"""
      case "Date" =>
        val (mn, mx) =
          if (buf.hasValue)
            ("\"" + java.time.LocalDate.ofEpochDay(buf.minL) + "\"",
             "\"" + java.time.LocalDate.ofEpochDay(buf.maxL) + "\"")
          else ("null", "null")
        s"""{"columntype":"Date","min":$mn,"max":$mx,"countnulls":${buf.countNulls},""" +
          s""""numdistinctvalues":$ndv,"ndvbitvector":"$vec"}"""
      case "String" =>
        val total = buf.count + buf.countNulls
        val avg = if (total == 0) 0.0 else buf.sumLen / (1.0 * total)
        s"""{"columntype":"String","maxlength":${buf.maxLen},""" +
          s""""avglength":${java.lang.Double.toString(avg)},"countnulls":${buf.countNulls},""" +
          s""""numdistinctvalues":$ndv,"ndvbitvector":"$vec"}"""
      case "Binary" =>
        val total = buf.count + buf.countNulls
        val avg = if (total == 0) 0.0 else buf.sumLen / (1.0 * total)
        s"""{"columntype":"Binary","maxlength":${buf.maxLen},""" +
          s""""avglength":${java.lang.Double.toString(avg)},"countnulls":${buf.countNulls}}"""
    }
    UTF8String.fromString(json)
  }

  override def serialize(buf: ComputeStatsBuffer): Array[Byte] = {
    val mnDec = Option(buf.minDec).map(_.toString.getBytes(UTF_8)).getOrElse(Array.emptyByteArray)
    val mxDec = Option(buf.maxDec).map(_.toString.getBytes(UTF_8)).getOrElse(Array.emptyByteArray)
    val fmN = if (buf.fm == null) 0 else buf.fm.nvec
    val bb = ByteBuffer.allocate(8 * 10 + 1 + 4 + mnDec.length + 4 + mxDec.length +
      4 + 8 * fmN)
    bb.putLong(buf.countNulls).putLong(buf.countTrues).putLong(buf.countFalses)
      .putLong(buf.minL).putLong(buf.maxL)
      .putDouble(buf.minD).putDouble(buf.maxD)
      .putLong(buf.maxLen).putLong(buf.sumLen).putLong(buf.count)
    bb.put(if (buf.hasValue) 1.toByte else 0.toByte)
    bb.putInt(mnDec.length); bb.put(mnDec)
    bb.putInt(mxDec.length); bb.put(mxDec)
    bb.putInt(fmN)
    if (buf.fm != null) buf.fm.bits.foreach(bb.putLong(_))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ComputeStatsBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new ComputeStatsBuffer
    buf.countNulls = bb.getLong; buf.countTrues = bb.getLong; buf.countFalses = bb.getLong
    buf.minL = bb.getLong; buf.maxL = bb.getLong
    buf.minD = bb.getDouble; buf.maxD = bb.getDouble
    buf.maxLen = bb.getLong; buf.sumLen = bb.getLong; buf.count = bb.getLong
    buf.hasValue = bb.get() == 1
    val mnLen = bb.getInt
    if (mnLen > 0) { val a = new Array[Byte](mnLen); bb.get(a); buf.minDec = new java.math.BigDecimal(new String(a, UTF_8)) }
    val mxLen = bb.getInt
    if (mxLen > 0) { val a = new Array[Byte](mxLen); bb.get(a); buf.maxDec = new java.math.BigDecimal(new String(a, UTF_8)) }
    val fmN = bb.getInt
    if (fmN > 0) {
      buf.fm = new FmSketch(fmN)
      var i = 0
      while (i < fmN) { buf.fm.bits(i) = bb.getLong; i += 1 }
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HiveComputeStats =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HiveComputeStats =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HiveComputeStats =
    copy(child = newChildren(0), numVectors = newChildren(1))
}

object HiveComputeStats {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "compute_stats", es => HiveComputeStats(es(0), es(1)), "scala_udf")
}
