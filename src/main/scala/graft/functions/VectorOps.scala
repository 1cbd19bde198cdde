package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over embedding arrays — the similarity suite's
  * innermost loop. Spark has no vector dot; the compositional spelling
  * (`aggregate(zip_with(a, b, _*_), 0d, _+_)`) allocates a zipped array
  * per row and evaluates the lambdas INTERPRETED (higher-order functions
  * are CodegenFallback), which is exactly the wrong shape for the
  * hottest expression in a 100 TB ANN scan. This is the custom-
  * `Expression`-with-`doGenCode` path SURVEY.md §2.3 reserves for such
  * gaps (reference kin: the vectorized UDF columns of
  * ql/src/java/org/apache/hadoop/hive/ql/exec/vector/expressions/).
  *
  * Accumulation is sequential left-to-right in double — bit-identical to
  * the fold order of the compositional spelling it replaces (and to the
  * DuckDB list_aggregate oracle), interpreted or codegen'd. Sides may
  * independently be array<float> or array<double> (corpus vectors are
  * float, plane literals double); extra elements on the longer side are
  * ignored; null ELEMENTS are treated as 0.
  */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vector_dot"

  private def floatSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot needs array<float>/array<double> inputs, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lf, rf) = (floatSide(left), floatSide(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, isFloat: Boolean) =
        if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ${get(a, floatSide(left))} * ${get(b, floatSide(right))};
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column API (resolution via the function registry — Column internals
    * are private[sql] in Spark 4). */
  def vector_dot(a: Column, b: Column): Column = call_function("vector_dot", a, b)

  /** Register on sessions built without GraftExtensions. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vector_dot", es => VectorDot(es(0), es(1)), "scala_udf")
}
