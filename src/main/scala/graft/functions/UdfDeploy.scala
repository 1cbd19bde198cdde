package graft.functions

import java.lang.reflect.{Method, Modifier}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled-UDF deployment — `CREATE [TEMPORARY] FUNCTION name AS
  * '<classname>'` (reference: ql/src/java/org/apache/hadoop/hive/ql/
  * parse/FunctionSemanticAnalyzer.java + exec/FunctionTask.java, which
  * register a class following the classic UDF convention — a public
  * `evaluate(...)` method per overload, exec/UDF.java's contract — into
  * exec/Registry.java; `contrib/` ships example UDFs of exactly this
  * shape).
  *
  * Spark-first: the deployed class becomes a Catalyst [[Expression]]
  * whose `evaluate` overload is RESOLVED ONCE from the call site's
  * argument types (the reference does the same in
  * GenericUDFBridge.initialize: method resolution happens at compile
  * time, only invoke() runs per row). The return Spark type comes from
  * the Java return type, so downstream operators are properly typed.
  * Per-row work is a cached `Method.invoke` — non-codegen by nature
  * (CodegenFallback), the same row-mode bail the reference's vectorizer
  * takes for bridged UDFs. Ship the class in the application jar
  * (`spark.jars`) exactly as Hive ships it with ADD JAR; at 100 TB
  * prefer builtin compositions ([[graft.functions.Macros]]) on hot
  * paths — reflection dispatch costs ~100ns/row.
  *
  * Null semantics follow the reference's bridge: a null argument aimed
  * at a PRIMITIVE parameter short-circuits to null (the UDF cannot
  * observe it); boxed/String parameters receive the null and may handle
  * it.
  */
case class DeployedUdf(funcName: String, className: String,
                       children: Seq[Expression])
  extends Expression with CodegenFallback {

  override def prettyName: String = funcName
  override def nullable: Boolean = true

  private def javaClass(dt: DataType): Class[_] = dt match {
    case StringType  => classOf[String]
    case IntegerType => classOf[java.lang.Integer]
    case LongType    => classOf[java.lang.Long]
    case DoubleType  => classOf[java.lang.Double]
    case FloatType   => classOf[java.lang.Float]
    case ShortType   => classOf[java.lang.Short]
    case ByteType    => classOf[java.lang.Byte]
    case BooleanType => classOf[java.lang.Boolean]
    case BinaryType  => classOf[Array[Byte]]
    case other => throw new IllegalArgumentException(
      s"$funcName: unsupported argument type $other (compiled UDFs take " +
        "primitive/string/binary columns)")
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

  // one lazy val, not a destructured pair: pattern-destructured lazy
  // vals synthesize a NON-transient tuple field, which drags the
  // Method into task serialization
  @transient private lazy val boundEval: (AnyRef, Method) = {
    val cls = UdfDeploy.loadClass(className)
    val argClasses = children.map(c => javaClass(c.dataType))
    def find(sig: Seq[Class[_]]): Option[Method] =
      try Some(cls.getMethod("evaluate", sig: _*))
      catch { case _: NoSuchMethodException => None }
    val m = find(argClasses).orElse(find(argClasses.map(primitiveOf)))
      .getOrElse(throw new IllegalArgumentException(
        s"$funcName: ${cls.getName} has no evaluate(" +
          s"${argClasses.map(_.getSimpleName).mkString(",")}) — the UDF " +
          "convention is one public evaluate method per overload"))
    (cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef], m)
  }
  private def instance: AnyRef = boundEval._1
  private def method: Method = boundEval._2

  override lazy val dataType: DataType = method.getReturnType match {
    case c if c == classOf[String]            => StringType
    case java.lang.Integer.TYPE               => IntegerType
    case c if c == classOf[java.lang.Integer] => IntegerType
    case java.lang.Long.TYPE                  => LongType
    case c if c == classOf[java.lang.Long]    => LongType
    case java.lang.Double.TYPE                => DoubleType
    case c if c == classOf[java.lang.Double]  => DoubleType
    case java.lang.Float.TYPE                 => FloatType
    case c if c == classOf[java.lang.Float]   => FloatType
    case java.lang.Boolean.TYPE               => BooleanType
    case c if c == classOf[java.lang.Boolean] => BooleanType
    case java.lang.Short.TYPE                 => ShortType
    case java.lang.Byte.TYPE                  => ByteType
    case c if c == classOf[Array[Byte]]       => BinaryType
    case other => throw new IllegalArgumentException(
      s"$funcName: unsupported return type ${other.getName} of ${className}.evaluate")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val m = method // force resolution before arg work
    val params = m.getParameterTypes
    val args = new Array[AnyRef](children.length)
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) {
        if (params(i).isPrimitive) return null // bridge null short-circuit
        args(i) = null
      } else args(i) = (v match {
        case s: UTF8String => s.toString
        case other => other
      }).asInstanceOf[AnyRef]
      i += 1
    }
    m.invoke(instance, args: _*) match {
      case null => null
      case s: String => UTF8String.fromString(s)
      case other => other
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object UdfDeploy {

  private[functions] def loadClass(className: String): Class[_] = {
    val cls = Class.forName(className, true,
      Option(Thread.currentThread().getContextClassLoader)
        .getOrElse(getClass.getClassLoader))
    require(
      UdafDeploy.looksLikeUdaf(cls) || UdtfDeploy.looksLikeUdtf(cls) ||
        cls.getMethods.exists(m =>
          m.getName == "evaluate" && Modifier.isPublic(m.getModifiers)),
      s"$className follows none of the deployable conventions: scalar " +
        "evaluate(...) (exec/UDF.java), aggregate iterate/terminatePartial/" +
        "merge/terminate (exec/UDAF.java), or table-function initialize()/" +
        "process(...) (GenericUDTF.java)")
    cls
  }

  /** Register `name` as a call to `className` — the
    * FunctionTask.createTemporaryFunction analog. The class's SHAPE picks
    * the registration (FunctionTask inspects the deployed class the same
    * way: UDAF subclasses register as aggregates, GenericUDTF subclasses
    * as table functions, everything else as scalar evaluate). Validates
    * eagerly (FunctionTask fails the DDL, not the first query). */
  def create(spark: SparkSession, name: String, className: String): Unit = {
    val cls = loadClass(className)
    val builder: Seq[Expression] => Expression =
      if (UdafDeploy.looksLikeUdaf(cls)) es => DeployedUdaf(name, className, es)
      else if (UdtfDeploy.looksLikeUdtf(cls)) es => DeployedUdtf(name, className, es)
      else es => DeployedUdf(name, className, es)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, builder, "hive")
  }

  def drop(spark: SparkSession, name: String): Unit =
    spark.sessionState.functionRegistry.dropFunction(
      org.apache.spark.sql.catalyst.FunctionIdentifier(name))
}

/** `CREATE [OR REPLACE] [TEMPORARY] FUNCTION name AS 'classname'` /
  * `DROP [TEMPORARY] FUNCTION [IF EXISTS] name` for compiled UDFs —
  * grammar Spark lacks without Hive support, routed from the HPL/SQL
  * passthrough like the other engine DDL. (`USING JAR` is refused with
  * direction: ship the jar via spark.jars / --jars, Spark's ADD JAR.) */
object FunctionDdl {
  private val CreateRe =
    """(?is)\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?FUNCTION\s+([\w.]+)\s+AS\s+'([^']+)'\s*(.*?)\s*;?\s*""".r
  private val DropRe =
    """(?is)\s*DROP\s+(?:TEMPORARY\s+)?FUNCTION\s+(?:IF\s+EXISTS\s+)?([\w.]+)\s*;?\s*""".r

  def matches(sql: String): Boolean = sql match {
    case CreateRe(_, _, _) => true
    case DropRe(name) =>
      // only claim DROP FUNCTION for names we deployed — Spark's own
      // DROP TEMPORARY FUNCTION (macros) must keep working
      deployed.contains(name.toLowerCase)
    case _ => false
  }

  private val deployed = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def run(spark: SparkSession, sql: String): DataFrame = sql match {
    case CreateRe(name, className, rest) =>
      if (rest.nonEmpty)
        throw new IllegalArgumentException(
          s"unsupported clause '$rest' — ship jars via spark.jars (ADD JAR analog)")
      UdfDeploy.create(spark, name, className)
      deployed.add(name.toLowerCase)
      spark.emptyDataFrame
    case DropRe(name) =>
      UdfDeploy.drop(spark, name)
      deployed.remove(name.toLowerCase)
      spark.emptyDataFrame
    case _ => throw new IllegalArgumentException(s"not a function DDL: $sql")
  }
}
