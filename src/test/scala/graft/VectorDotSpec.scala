package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps.vector_dot

/** Pins the native vector_dot Catalyst expression: known values, codegen
  * vs interpreted parity, mixed float/double sides, length mismatch, and
  * null handling — plus bit-identity of cosine scores against the
  * compositional zip_with + aggregate spelling it replaced. */
class VectorDotSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  test("known values, float and double element types") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0)))
      .toDF("f", "d")
    val r = df.select(
      vector_dot(col("f"), col("d")).as("fd"),
      vector_dot(col("f"), col("f")).as("ff"),
      vector_dot(col("d"), col("d")).as("dd")).collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
    assert(r.getDouble(2) == 77.0)
  }

  test("codegen and interpreted evaluation agree") {
    val df = Seq.tabulate(64)(i =>
      (Array.tabulate(16)(j => (i * 17 + j * 3).toFloat / 7f),
       Array.tabulate(16)(j => (i * 5 - j).toDouble / 3d))).toDF("a", "b")
    val codegen = df.select(vector_dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      df.select(vector_dot(col("a"), col("b"))).collect().map(_.getDouble(0))
    }
    assert(codegen.toSeq == interp.toSeq)
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val olds = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("length mismatch uses the common prefix; null array yields null") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Seq(10.0, 10.0))).toDF("a", "b")
    assert(df.select(vector_dot(col("a"), col("b"))).collect()(0).getDouble(0) == 30.0)
    val withNull = df.select(vector_dot(col("a"),
      lit(null).cast("array<double>")).as("v"))
    assert(withNull.collect()(0).isNullAt(0))
  }

  test("cosine scores are bit-identical to the compositional spelling") {
    val emb = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"))
    def oldDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    val both = emb.select(col("vec_id"),
      vector_dot(col("embedding"), col("embedding")).as("nu"),
      oldDot(col("embedding"), col("embedding")).as("old"))
    assert(both.filter(col("nu") =!= col("old")).isEmpty)
  }

  test("SQL surface resolves through the extension registration") {
    val r = spark.sql(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS v").collect()(0)
    assert(r.getDouble(0) == 11.0)
  }
}
