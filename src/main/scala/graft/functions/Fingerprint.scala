package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Document fingerprinting as native Catalyst expressions (codegen'd, no
  * UDF serialization cost) — the custom-`Expression` path SURVEY.md §2.3
  * reserves for functions Spark lacks. The reference's closest analogs
  * are its hash UDFs (ql/src/java/org/apache/hadoop/hive/ql/udf/UDFHash.java)
  * and the ngrams UDAF family; fingerprints are the modern pipeline
  * primitive built on them.
  *
  * - [[PolyHash]]: order-sensitive polynomial rolling hash of the whole
  *   string (h = h*31 + byte, wrapping i64). Two texts differing anywhere
  *   hash differently (w.h.p.) — content addressing / exact dedup keys.
  * - [[MinGramHash]]: winnowing-style fingerprint — minimum polynomial
  *   hash over all character k-grams. Stable under appends/small edits
  *   away from the minimizing gram — near-dup blocking keys.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
    h
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 31L + ($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Minimum rolling k-gram hash (winnowing fingerprint). Returns null for
  * strings shorter than k bytes. */
case class MinGramHash(child: Expression, k: Int) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_gram_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.length < k) null
    else {
      var best = Long.MaxValue
      var start = 0
      while (start + k <= bytes.length) {
        var h = 0L
        var i = start
        while (i < start + k) { h = h * 31L + (bytes(i) & 0xff); i += 1 }
        if (h < best) best = h
        start += 1
      }
      best
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val best = ctx.freshName("best")
      val st = ctx.freshName("st")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |if ($bytes.length < $k) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $best = Long.MAX_VALUE;
         |  for (int $st = 0; $st + $k <= $bytes.length; $st++) {
         |    long $h = 0L;
         |    for (int $i = $st; $i < $st + $k; $i++) {
         |      $h = $h * 31L + ($bytes[$i] & 0xff);
         |    }
         |    if ($h < $best) $best = $h;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinGramHash =
    copy(child = newChild)
}

object Fingerprint {
  /** Column API (requires register(spark) once per session — Column
    * internals are private[sql] in Spark 4, so resolution goes through
    * the function registry). */
  def poly_hash(c: Column): Column = call_function("poly_hash", c)
  def min_gram_hash(c: Column, k: Int): Column =
    call_function("min_gram_hash", c, org.apache.spark.sql.functions.lit(k))

  /** Register as SQL functions on a session. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("poly_hash", es => PolyHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("min_gram_hash",
      es => MinGramHash(es.head, es(1).eval().asInstanceOf[Number].intValue()), "scala_udf")
  }
}
