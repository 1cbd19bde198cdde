package graft.functions

import java.lang.reflect.Method

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `reflect2(value, 'method', args...)` — instance-method reflection ON
  * the value itself (reference GenericUDFReflect2, ql/src/java/org/apache/
  * hadoop/hive/ql/udf/generic/GenericUDFReflect2.java). Complements
  * `reflect`/`java_method` (static dispatch, q212): `reflect2('ab',
  * 'concat', 'c')` calls `"ab".concat("c")`.
  *
  * Spark-first shape: a Catalyst `Expression` whose METHOD IS RESOLVED
  * ONCE at analysis time from the child's data type (the reference does
  * the same in initialize(): the method and return ObjectInspector are
  * fixed per-query, only invoke() runs per row). The return Spark type is
  * derived from the Java return type, so downstream operators see a
  * properly typed column — unlike `reflect`, which stringifies. Per-row
  * work is a cached `Method.invoke` — inherently non-codegen (same in the
  * reference's vectorizer, which bails to row mode for reflect UDFs),
  * hence CodegenFallback; keep it off 100TB hot paths, as the reference
  * docs advise for its own reflect family.
  */
case class Reflect2(children: Seq[Expression]) extends Expression with CodegenFallback {

  require(children.length >= 2, "reflect2 requires (value, methodName, args...)")

  override def prettyName: String = "reflect2"
  override def nullable: Boolean = true

  private def targetClass: Class[_] = javaClass(children.head.dataType)
  private def methodName: String =
    children(1).eval(null) match {
      case s: UTF8String => s.toString
      case other => throw new IllegalArgumentException(
        s"reflect2 method name must be a string literal, got $other")
    }

  private def javaClass(dt: DataType): Class[_] = dt match {
    case StringType  => classOf[String]
    case IntegerType => classOf[java.lang.Integer]
    case LongType    => classOf[java.lang.Long]
    case DoubleType  => classOf[java.lang.Double]
    case FloatType   => classOf[java.lang.Float]
    case ShortType   => classOf[java.lang.Short]
    case ByteType    => classOf[java.lang.Byte]
    case BooleanType => classOf[java.lang.Boolean]
    // the reference's reflect2 exposes timestamp/date values as their
    // java.sql classes (GenericUDFReflect2 works over any primitive OI),
    // so `reflect2(ts, 'getYear')` dispatches on java.sql.Timestamp
    case TimestampType => classOf[java.sql.Timestamp]
    case DateType      => classOf[java.sql.Date]
    case other => throw new IllegalArgumentException(
      s"reflect2 target must be a primitive/string column, got $other")
  }

  /** Unwrap a Catalyst internal value to the JVM value reflection sees. */
  private def toJava(v: Any): AnyRef = v match {
    case s: UTF8String => s.toString
    case other         => other.asInstanceOf[AnyRef]
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

  /** Resolved once (lazily at first use per task; deterministic). Tries
    * boxed signatures first, then primitive — `String.substring(int)`
    * resolves from an IntegerType arg. */
  @transient private lazy val method: Method = {
    val argClasses = children.drop(2).map(c => javaClass(c.dataType))
    val cls = targetClass
    def find(sig: Seq[Class[_]]): Option[Method] =
      try Some(cls.getMethod(methodName, sig: _*)) catch { case _: NoSuchMethodException => None }
    // last resort: assignability scan (the reference resolves through
    // commons-lang MethodUtils.getMatchingAccessibleMethod, which is why
    // `reflect2(s, 'equals', t)` finds equals(Object) for a String arg).
    // Class.getMethods order is unspecified, so with several assignable
    // overloads (Object vs a narrower type) pick the MOST SPECIFIC one,
    // commons-lang style, from a deterministically sorted candidate list.
    def findAssignable(): Option[Method] = {
      val cands = cls.getMethods.filter { m =>
        m.getName == methodName && m.getParameterCount == argClasses.length &&
          m.getParameterTypes.zip(argClasses).forall { case (p, a) =>
            p.isAssignableFrom(a) || p == primitiveOf(a)
          }
      }.sortBy(_.getParameterTypes.map(_.getName).mkString(","))
      // a is at least as specific as b if every a-param is assignable to
      // the matching b-param (b's params are the supertypes)
      def atLeastAsSpecific(a: Method, b: Method): Boolean =
        a.getParameterTypes.zip(b.getParameterTypes).forall { case (pa, pb) =>
          pb.isAssignableFrom(pa) || pb == pa }
      cands.reduceLeftOption((best, m) => if (atLeastAsSpecific(m, best)) m else best)
    }
    find(argClasses)
      .orElse(find(argClasses.map(primitiveOf)))
      .orElse(find(argClasses.map(c =>
        if (c == classOf[String]) classOf[CharSequence] else c))) // String.replace
      .orElse(findAssignable())
      .getOrElse(throw new IllegalArgumentException(
        s"reflect2: no method $methodName(${argClasses.map(_.getSimpleName).mkString(",")}) " +
          s"on ${cls.getName}"))
  }

  override lazy val dataType: DataType = method.getReturnType match {
    case c if c == classOf[String]            => StringType
    case java.lang.Integer.TYPE               => IntegerType
    case c if c == classOf[java.lang.Integer] => IntegerType
    case java.lang.Long.TYPE                  => LongType
    case c if c == classOf[java.lang.Long]    => LongType
    case java.lang.Double.TYPE                => DoubleType
    case c if c == classOf[java.lang.Double]  => DoubleType
    case java.lang.Float.TYPE                 => FloatType
    case java.lang.Boolean.TYPE               => BooleanType
    case c if c == classOf[java.lang.Boolean] => BooleanType
    case java.lang.Short.TYPE                 => ShortType
    case java.lang.Byte.TYPE                  => ByteType
    case java.lang.Character.TYPE             => StringType
    case c if c == classOf[Array[Byte]]       => BinaryType // e.g. String.getBytes
    case other => throw new IllegalArgumentException(
      s"reflect2: unsupported return type ${other.getName} of $methodName")
  }

  /** Internal micros/days -> the java.sql values the method sees; both
    * the target AND each argument need this (a DateType arg is an Int
    * internally, never what the reflected method expects). */
  private def toInvokable(v: Any, dt: DataType): AnyRef =
    if (v == null) null
    else dt match {
      case TimestampType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaTimestamp(v.asInstanceOf[Long])
      case DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaDate(v.asInstanceOf[Int])
      case _ => toJava(v)
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val target = children.head.eval(input)
    if (target == null) return null
    val args = children.drop(2).map(c => toInvokable(c.eval(input), c.dataType))
    if (args.contains(null)) return null
    val javaTarget: AnyRef = toInvokable(target, children.head.dataType)
    val result = method.invoke(javaTarget, args: _*)
    result match {
      case null       => null
      case s: String  => UTF8String.fromString(s)
      case c: java.lang.Character => UTF8String.fromString(c.toString)
      case other      => other
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Reflect2 = copy(children = newChildren)
}

object Reflect2 {
  def reflect2(value: Column, method: String, args: Column*): Column =
    call_function("reflect2", (value +: org.apache.spark.sql.functions.lit(method) +: args): _*)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "reflect2", es => Reflect2(es), "scala_udf")
}
