package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType}

/** The reference's seeded rand(): one `java.util.Random(seed)` per UDF
  * instance per TASK (ql/udf/UDFRand.java — the seed is the literal,
  * never mixed with a partition id), drawn once per row in scan order.
  * Spark's own Rand mixes the partition index into the seed and uses
  * XORShift, so every value differs. With matching input splits the
  * sequences align row for row, which is what the corpus goldens
  * commit (rand_partitionpruner*, udf4's rand(3) = 0.731057369148862
  * — `new java.util.Random(3).nextDouble()`). Compat sessions only.
  */
case class HiveRand(seed: Long)
    extends LeafExpression with Nondeterministic with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "rand"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.util.Random(seed)

  override protected def evalInternal(input: InternalRow): Any =
    rng.nextDouble()
}

/** Trig functions via StrictMath: the reference goldens carry fdlibm
  * values (Math.cos(-200.0) differs from StrictMath.cos(-200.0) in the
  * last ulp on JVMs with the vectorized intrinsic —
  * vectorized_math_funcs pins the fdlibm result). Compat sessions only.
  */
case class StrictMathFn(name: String, child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = name

  private val fn: Double => Double = name match {
    case "sin" => StrictMath.sin
    case "cos" => StrictMath.cos
    case "tan" => StrictMath.tan
    case "asin" => StrictMath.asin
    case "acos" => StrictMath.acos
    case "atan" => StrictMath.atan
    case "sinh" => StrictMath.sinh
    case "cosh" => StrictMath.cosh
    case "tanh" => StrictMath.tanh
  }

  override def nullSafeEval(v: Any): Any = fn(v.asInstanceOf[Double])

  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): StrictMathFn =
    copy(child = newChild)
}

object StrictMathFn {
  def register(s: org.apache.spark.sql.SparkSession): Unit =
    Seq("sin", "cos", "tan", "asin", "acos", "atan",
      "sinh", "cosh", "tanh").foreach { n =>
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        n, es => StrictMathFn(n,
          org.apache.spark.sql.catalyst.expressions.Cast(es.head, DoubleType)),
        "scala_udf")
    }
}

/** ln/log2/log10/log via java.lang.Math.log with the reference's
  * domain guards (UDFLn family: argument <= 0 is NULL; log base <= 1
  * is NULL). Spark's logarithm expressions use StrictMath.log, which
  * differs from the intrinsic Math.log in the last ulp on this JVM —
  * the goldens pin Math.log. Compat sessions only. */
case class HiveMathLog(
    base: Option[org.apache.spark.sql.catalyst.expressions.Expression],
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    divisor: Double)
    extends org.apache.spark.sql.catalyst.expressions.Expression
    with CodegenFallback {

  override def children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    base.toSeq :+ child
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "log"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return null
    val x = v match {
      case d: java.lang.Number => d.doubleValue()
      case _ => return null
    }
    if (x <= 0.0) return null
    base match {
      case Some(b) =>
        val bv = b.eval(input)
        if (bv == null) return null
        val bd = bv.asInstanceOf[java.lang.Number].doubleValue()
        if (bd <= 1.0) return null
        Math.log(x) / Math.log(bd)
      case None =>
        if (divisor == 1.0) Math.log(x)
        else if (divisor == 10.0) Math.log10(x) // UDFLog10 uses Math.log10
        else Math.log(x) / Math.log(divisor)
    }
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]): HiveMathLog =
    if (base.isDefined) copy(base = Some(cs(0)), child = cs(1))
    else copy(child = cs(0))
}

object HiveMathLog {
  def register(s: org.apache.spark.sql.SparkSession): Unit = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    def c(e: org.apache.spark.sql.catalyst.expressions.Expression) =
      Cast(e, DoubleType)
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "ln", es => HiveMathLog(None, c(es.head), 1.0), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "log2", es => HiveMathLog(None, c(es.head), 2.0), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "log10", es => HiveMathLog(None, c(es.head), 10.0), "scala_udf")
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      "log", es =>
        if (es.size == 1) HiveMathLog(None, c(es.head), 1.0)
        else HiveMathLog(Some(c(es.head)), c(es(1)), 1.0), "scala_udf")
  }
}
