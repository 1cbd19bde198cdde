package graft.functions

import java.lang.reflect.Method

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The reference's `reflect` / `java_method` semantics
  * (GenericUDFReflect.java + AbstractGenericUDFReflect.java), which
  * differ from Spark's builtin `reflect` in three user-visible ways:
  *
  *  1. the method is resolved AT EVALUATION time, so a reflect call in a
  *     never-taken CASE branch with a bogus method never errors
  *     (udf_case.q's short-circuit test);
  *  2. a default-constructed INSTANCE is used when available, so
  *     zero-arg instance methods work — `reflect('java.lang.String',
  *     'isEmpty')` is `new String().isEmpty()` = "true";
  *  3. the result is always stringified (`String.valueOf(...)`).
  *
  * Registered only in the reference-dialect compat session; engine
  * sessions keep Spark's codegen'd static-only builtin. CodegenFallback
  * like the reference's own row-mode reflect (its vectorizer bails too).
  */
final case class HiveReflect(children: Seq[Expression])
    extends Expression with CodegenFallback {

  require(children.length >= 2, "reflect requires (class, method[, arg1...])")

  override def prettyName: String = "reflect"
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(children = cs)

  private def boxed(dt: DataType): Class[_] = dt match {
    case StringType  => classOf[String]
    case IntegerType => classOf[java.lang.Integer]
    case LongType    => classOf[java.lang.Long]
    case DoubleType  => classOf[java.lang.Double]
    case FloatType   => classOf[java.lang.Float]
    case ShortType   => classOf[java.lang.Short]
    case ByteType    => classOf[java.lang.Byte]
    case BooleanType => classOf[java.lang.Boolean]
    case _: DecimalType => classOf[java.math.BigDecimal]
    case TimestampType  => classOf[java.sql.Timestamp]
    case DateType       => classOf[java.sql.Date]
    case BinaryType     => classOf[Array[Byte]]
    case NullType    => classOf[Object]
    case other => throw new IllegalArgumentException(
      s"reflect arguments must be primitive, got $other")
  }

  private def primitiveOf(c: Class[_]): Class[_] = c match {
    case x if x == classOf[java.lang.Integer] => java.lang.Integer.TYPE
    case x if x == classOf[java.lang.Long]    => java.lang.Long.TYPE
    case x if x == classOf[java.lang.Double]  => java.lang.Double.TYPE
    case x if x == classOf[java.lang.Float]   => java.lang.Float.TYPE
    case x if x == classOf[java.lang.Short]   => java.lang.Short.TYPE
    case x if x == classOf[java.lang.Byte]    => java.lang.Byte.TYPE
    case x if x == classOf[java.lang.Boolean] => java.lang.Boolean.TYPE
    case x => x
  }

  // resolved lazily at first eval and cached while (class, method) names
  // repeat — the reference re-resolves only when either name changes
  @transient private var cachedKey: (String, String) = _
  @transient private var cachedMethod: Method = _
  @transient private var cachedInstance: AnyRef = _

  /** The reference's findMethod: first a String-returning method whose
    * params accept the arg classes (primitive, boxed, or assignable),
    * else the exact (name, primitive classes) lookup — here over a
    * SORTED candidate list so resolution is deterministic across JVMs. */
  private def resolve(className: String, methodName: String): Unit = {
    val cls = Class.forName(className)
    val argBoxed = children.drop(2).map(c => boxed(c.dataType))
    val stringReturning = cls.getMethods
      .filter { m =>
        m.getName == methodName && m.getParameterCount == argBoxed.length &&
          classOf[String].isAssignableFrom(m.getReturnType) &&
          m.getParameterTypes.zip(argBoxed).forall { case (p, a) =>
            p == primitiveOf(a) || p == a || p.isAssignableFrom(a)
          }
      }
      .sortBy(_.getParameterTypes.map(_.getName).mkString(","))
      .headOption
    cachedMethod = stringReturning.getOrElse(
      cls.getMethod(methodName, argBoxed.map(primitiveOf): _*))
    cachedInstance =
      try cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
      catch { case _: Exception => null }
    cachedKey = (className, methodName)
  }

  private def toJava(v: Any, dt: DataType): AnyRef =
    if (v == null) null
    else dt match {
      case _: DecimalType =>
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaTimestamp(v.asInstanceOf[Long])
      case DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils.toJavaDate(v.asInstanceOf[Int])
      case _ => v match {
        case s: UTF8String => s.toString
        case other         => other.asInstanceOf[AnyRef]
      }
    }

  override def eval(input: InternalRow): Any = {
    val clsName = children.head.eval(input)
    val mName = children(1).eval(input)
    if (clsName == null || mName == null) return null
    val key = (clsName.toString, mName.toString)
    if (cachedKey != key) resolve(key._1, key._2)
    val args = children.drop(2).map(c => toJava(c.eval(input), c.dataType))
    // the reference catches invocation failures and returns NULL
    try UTF8String.fromString(String.valueOf(cachedMethod.invoke(cachedInstance, args: _*)))
    catch { case _: Exception => null }
  }
}

object HiveReflect {
  /** Shadow Spark's static-only builtins in a reference-dialect session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("reflect", es => HiveReflect(es), "scala_udf")
    reg.createOrReplaceTempFunction("java_method", es => HiveReflect(es), "scala_udf")
  }
}
