package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared n-gram frequency buffer for the `ngrams` / `context_ngrams`
  * UDAFs — the engine's analog of the reference's NGramEstimator
  * (ql/src/java/org/apache/hadoop/hive/ql/udf/generic/NGramEstimator.java).
  *
  * Counting is EXACT until the buffer exceeds `2*k*pf` entries, at which
  * point the lowest-frequency entries are trimmed down to `k*pf`
  * (NGramEstimator.java:176-184 keeps the same 2× high-water mark so the
  * N·log N trim amortizes). The reference's trim breaks frequency ties in
  * HashMap iteration order; ours breaks them lexicographically (keep the
  * smallest ngram) so partial aggregation stays deterministic — the only
  * divergence, and only reachable past the 200k-distinct-ngrams mark at
  * the default k=100, pf=1000 (NGramEstimator.initialize:78 raises pf so
  * k*pf >= 1000).
  *
  * The final result is sorted by (frequency desc, ngram lexicographic
  * asc, ngram length asc) — NGramEstimator.getNGrams:104-121 — and
  * truncated to k; an empty buffer yields SQL NULL ("SQL standard -
  * return null for zero elements", getNGrams:97).
  */
final class NGramFreqBuffer(val k: Int, val pf0: Int) extends Serializable {
  // minimum precision factor, NGramEstimator.initialize:78-80
  val pf: Int = if (k.toLong * pf0 < 1000) 1000 / k else pf0
  val freqs: mutable.HashMap[List[String], Double] = mutable.HashMap.empty

  def add(ng: List[String]): Unit = {
    freqs.update(ng, freqs.getOrElse(ng, 0.0) + 1.0)
    if (freqs.size > 2L * k * pf) trimTo(k * pf)
  }

  def mergeWith(other: NGramFreqBuffer): NGramFreqBuffer = {
    other.freqs.foreach { case (ng, c) =>
      freqs.update(ng, freqs.getOrElse(ng, 0.0) + c)
    }
    if (freqs.size > k.toLong * pf) trimTo(k * pf) // NGramEstimator.merge:256
    this
  }

  /** Drop lowest-frequency entries until `target` remain (ties: drop the
    * lexicographically LARGEST first, a deterministic stand-in for the
    * reference's hash-order tie pick). */
  private def trimTo(target: Int): Unit = {
    if (freqs.size > target) {
      val doomed = freqs.toSeq
        .sortWith((a, b) => NGramFreqBuffer.lt(a, b))
        .take(freqs.size - target)
      doomed.foreach { case (ng, _) => freqs.remove(ng) }
    }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(pf0); out.writeInt(freqs.size)
    freqs.foreach { case (ng, c) =>
      out.writeInt(ng.length)
      ng.foreach(out.writeUTF)
      out.writeDouble(c)
    }
    out.flush()
    bos.toByteArray
  }

  /** Final result rows sorted per getNGrams:104-121, truncated to k. */
  def result(): ArrayData = {
    if (freqs.isEmpty) null
    else {
      val sorted = freqs.toSeq.sortWith { case ((g1, c1), (g2, c2)) =>
        if (c1 != c2) c1 > c2
        else {
          val cmp = NGramFreqBuffer.cmpWords(g1, g2)
          if (cmp != 0) cmp < 0 else g1.length < g2.length
        }
      }.take(k)
      new GenericArrayData(sorted.map { case (ng, c) =>
        InternalRow(
          new GenericArrayData(ng.map(w => UTF8String.fromString(w))), c)
      })
    }
  }
}

object NGramFreqBuffer {
  /** element-wise java.lang.String.compareTo, zero-padded by length */
  def cmpWords(a: List[String], b: List[String]): Int = {
    var x = a; var y = b
    while (x.nonEmpty && y.nonEmpty) {
      val c = x.head.compareTo(y.head)
      if (c != 0) return c
      x = x.tail; y = y.tail
    }
    0
  }

  /** trim order: (freq asc, ngram DESC) so the keep-set boundary keeps
    * the lexicographically smallest. */
  private def lt(a: (List[String], Double), b: (List[String], Double)): Boolean =
    if (a._2 != b._2) a._2 < b._2
    else cmpWords(a._1, b._1) > 0

  def deserialize(bytes: Array[Byte]): NGramFreqBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new NGramFreqBuffer(in.readInt(), in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val ng = List.fill(len)(in.readUTF())
      buf.freqs.update(ng, in.readDouble())
      i += 1
    }
    buf
  }

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("ngram", ArrayType(StringType)),
    StructField("estfrequency", DoubleType))))

  /** Walk the input value — `array<string>` (one sequence) or
    * `array<array<string>>` (one sequence per inner array, n-grams never
    * crossing the boundary — GenericUDAFnGrams.java:306-333) — feeding
    * each word sequence to `f`. */
  def foreachSequence(value: Any, elemType: DataType)(f: IndexedSeq[String] => Unit): Unit = {
    value match {
      case null => ()
      case outer: ArrayData => elemType match {
        case ArrayType(StringType, _) =>
          var i = 0
          while (i < outer.numElements()) {
            val inner = outer.getArray(i)
            if (inner != null) f(toWords(inner))
            i += 1
          }
        case StringType => f(toWords(outer))
        case other => throw new IllegalArgumentException(
          s"ngrams: expected array<string> or array<array<string>>, got array<$other>")
      }
      case other => throw new IllegalArgumentException(
        s"ngrams: expected an array input, got $other")
    }
  }

  private def toWords(arr: ArrayData): IndexedSeq[String] = {
    val n = arr.numElements()
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      val u = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      out(i) = if (u == null) null else u.toString
      i += 1
    }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
  }

  def constInt(e: Expression, name: String, fname: String): Int = e.eval() match {
    case n: java.lang.Number => n.intValue()
    case other => throw new IllegalArgumentException(
      s"$fname: '$name' must be a constant integer, got $other")
  }
}

/** Hive's `ngrams(array, n, k [, pf])` UDAF as a SQL-registered Catalyst
  * aggregate (GenericUDAFnGrams.java) — estimates the top-k most frequent
  * n-grams, returning `array<struct<ngram:array<string>,
  * estfrequency:double>>` so the reference's
  * `ngrams(sentences(lower(contents)), 2, 100, 1000).estfrequency`
  * invocation resolves (FunctionRegistry.java:398). n-grams are emitted
  * per inner sequence (iterate:302-334), counted exactly (NGramEstimator
  * trims only past 2*k*pf distinct ngrams), final order (freq desc,
  * ngram asc). */
case class HiveNGrams(
    child: Expression,
    nExpr: Expression,
    kExpr: Expression,
    pfExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NGramFreqBuffer] {

  private lazy val n = {
    val v = NGramFreqBuffer.constInt(nExpr, "n", "ngrams")
    require(v >= 1, s"ngrams needs 'n' to be at least 1, but you supplied $v")
    v
  }
  private lazy val k = {
    val v = NGramFreqBuffer.constInt(kExpr, "k", "ngrams")
    require(v >= 1, s"ngrams needs 'k' to be at least 1, but you supplied $v")
    v
  }
  private lazy val pf = {
    val v = NGramFreqBuffer.constInt(pfExpr, "pf", "ngrams")
    require(v >= 1, s"ngrams needs 'pf' to be at least 1, but you supplied $v")
    v
  }
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"ngrams: expected an array column, got $other")
  }

  override def children: Seq[Expression] = Seq(child, nExpr, kExpr, pfExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = NGramFreqBuffer.resultType
  override def prettyName: String = "ngrams"

  override def createAggregationBuffer(): NGramFreqBuffer = new NGramFreqBuffer(k, pf)

  override def update(buffer: NGramFreqBuffer, input: InternalRow): NGramFreqBuffer = {
    NGramFreqBuffer.foreachSequence(child.eval(input), elemType) { words =>
      // processNgrams (GenericUDAFnGrams.java:260-268): every window of n
      var i = words.length - n
      while (i >= 0) {
        buffer.add(List.tabulate(n)(j => words(i + j)))
        i -= 1
      }
    }
    buffer
  }

  override def merge(buffer: NGramFreqBuffer, other: NGramFreqBuffer): NGramFreqBuffer =
    buffer.mergeWith(other)

  override def eval(buffer: NGramFreqBuffer): Any = buffer.result()

  override def serialize(buffer: NGramFreqBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): NGramFreqBuffer =
    NGramFreqBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HiveNGrams =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HiveNGrams =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HiveNGrams =
    copy(child = newChildren(0), nExpr = newChildren(1),
      kExpr = newChildren(2), pfExpr = newChildren(3))
}

object HiveNGrams {
  /** SQL forms: ngrams(arr, n, k) and ngrams(arr, n, k, pf). */
  def build(es: Seq[Expression]): HiveNGrams = es match {
    case Seq(a, n, k) => HiveNGrams(a, n, k, org.apache.spark.sql.catalyst.expressions.Literal(1))
    case Seq(a, n, k, pf) => HiveNGrams(a, n, k, pf)
    case _ => throw new IllegalArgumentException(
      s"ngrams requires 3 or 4 arguments, got ${es.length}")
  }
}

/** Hive's `context_ngrams(array, array<string>, k [, pf])` UDAF
  * (GenericUDAFContextNGrams.java): counts the words filling the NULL
  * slots of the context pattern wherever the non-null words match —
  * `context_ngrams(sentences(lower(s)), array("he", null), 100)` yields
  * the words following "he". The emitted ngram holds ONLY the filler
  * words (processNgrams:279-303); the context must be non-empty and
  * contain at least one null (iterate:225-235). */
case class HiveContextNGrams(
    child: Expression,
    contextExpr: Expression,
    kExpr: Expression,
    pfExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[NGramFreqBuffer] {

  private lazy val context: IndexedSeq[String] = contextExpr.eval() match {
    case arr: ArrayData =>
      val out = (0 until arr.numElements()).map { i =>
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).toString
      }
      require(out.nonEmpty,
        "context_ngrams needs a context array with at least one element.")
      require(out.contains(null),
        "context_ngrams: the context array needs to contain at least one " +
          "'null' value to indicate what should be counted.")
      out
    case other => throw new IllegalArgumentException(
      s"context_ngrams: the context must be a constant array, got $other")
  }
  private lazy val k = {
    val v = NGramFreqBuffer.constInt(kExpr, "k", "context_ngrams")
    require(v >= 1, s"context_ngrams needs 'k' to be at least 1, but you supplied $v")
    v
  }
  private lazy val pf = {
    val v = NGramFreqBuffer.constInt(pfExpr, "pf", "context_ngrams")
    require(v >= 1, s"context_ngrams needs 'pf' to be at least 1, but you supplied $v")
    v
  }
  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case other => throw new IllegalArgumentException(
      s"context_ngrams: expected an array column, got $other")
  }

  override def children: Seq[Expression] = Seq(child, contextExpr, kExpr, pfExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = NGramFreqBuffer.resultType
  override def prettyName: String = "context_ngrams"

  override def createAggregationBuffer(): NGramFreqBuffer = new NGramFreqBuffer(k, pf)

  override def update(buffer: NGramFreqBuffer, input: InternalRow): NGramFreqBuffer = {
    val ctxLen = context.length
    NGramFreqBuffer.foreachSequence(child.eval(input), elemType) { words =>
      var i = words.length - ctxLen
      while (i >= 0) {
        var ok = true
        var j = 0
        while (ok && j < ctxLen) {
          val cw = context(j)
          if (cw != null && cw != words(i + j)) ok = false
          j += 1
        }
        if (ok) {
          val filler = (0 until ctxLen).collect {
            case j2 if context(j2) == null => words(i + j2)
          }.toList
          buffer.add(filler)
        }
        i -= 1
      }
    }
    buffer
  }

  override def merge(buffer: NGramFreqBuffer, other: NGramFreqBuffer): NGramFreqBuffer =
    buffer.mergeWith(other)

  override def eval(buffer: NGramFreqBuffer): Any = buffer.result()

  override def serialize(buffer: NGramFreqBuffer): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): NGramFreqBuffer =
    NGramFreqBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HiveContextNGrams =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HiveContextNGrams =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HiveContextNGrams =
    copy(child = newChildren(0), contextExpr = newChildren(1),
      kExpr = newChildren(2), pfExpr = newChildren(3))
}

object HiveContextNGrams {
  /** SQL forms: context_ngrams(arr, ctx, k) and (arr, ctx, k, pf). */
  def build(es: Seq[Expression]): HiveContextNGrams = es match {
    case Seq(a, c, k) =>
      HiveContextNGrams(a, c, k, org.apache.spark.sql.catalyst.expressions.Literal(1))
    case Seq(a, c, k, pf) => HiveContextNGrams(a, c, k, pf)
    case _ => throw new IllegalArgumentException(
      s"context_ngrams requires 3 or 4 arguments, got ${es.length}")
  }
}
