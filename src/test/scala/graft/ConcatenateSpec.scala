package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.hplsql.Hplsql

/** ALTER TABLE ... CONCATENATE (acid/ConcatenateDdl — the
  * alterStatementSuffixMergeFiles / DDLTask.mergeFiles analog). Pins:
  * small files merge without changing results; partition-scoped merge
  * touches ONLY that partition's files; partitioned tables refuse the
  * unscoped form; already-compact dirs no-op. */
class ConcatenateSpec extends AnyFunSuite {
  import TestSession._

  private def files(dir: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).filter(_.isFile).map(_.getPath.getName).toSeq
      .filter(_.startsWith("part-")).sorted
  }

  test("unpartitioned: many small files merge to few, results identical, re-run no-ops") {
    val dir = new java.io.File("target/storage/concat_spec/orders_flat").getAbsolutePath
    val df = Tables.orders(spark, sf).limit(500).select("o_orderkey", "o_totalprice")
    df.repartition(16).write.mode("overwrite").parquet(dir)
    assert(files(dir).size == 16)
    spark.sql("DROP TABLE IF EXISTS concat_flat")
    spark.sql(s"CREATE TABLE concat_flat USING parquet LOCATION '$dir'")
    try {
      val before = df.orderBy("o_orderkey").collect().toSeq
      val out = Hplsql.run(spark, "ALTER TABLE concat_flat CONCATENATE;")
      assert(files(dir).size == 1)
      assert(spark.read.parquet(dir).orderBy("o_orderkey").collect().toSeq == before)
      // second run: already compact, nothing rewritten
      val names = files(dir)
      Hplsql.run(spark, "ALTER TABLE concat_flat CONCATENATE;")
      assert(files(dir) == names)
    } finally spark.sql("DROP TABLE IF EXISTS concat_flat")
  }

  test("partitioned: PARTITION clause scopes the merge; unscoped form refused") {
    val dir = new java.io.File("target/storage/concat_spec/orders_part").getAbsolutePath
    Tables.orders(spark, sf).limit(600)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      .repartition(8).write.mode("overwrite")
      .partitionBy("o_orderstatus").parquet(dir)
    spark.sql("DROP TABLE IF EXISTS concat_part")
    spark.sql(s"CREATE TABLE concat_part USING parquet LOCATION '$dir'")
    spark.sql("MSCK REPAIR TABLE concat_part")
    try {
      val untouched = files(s"$dir/o_orderstatus=O")
      assert(files(s"$dir/o_orderstatus=F").size > 2)
      val total = spark.table("concat_part").count()

      intercept[Exception](
        Hplsql.run(spark, "ALTER TABLE concat_part CONCATENATE;"))
      Hplsql.run(spark,
        "ALTER TABLE concat_part PARTITION (o_orderstatus='F') CONCATENATE;")
      assert(files(s"$dir/o_orderstatus=F").size == 1)
      assert(files(s"$dir/o_orderstatus=O") == untouched) // byte-level untouched
      assert(spark.table("concat_part").count() == total)
    } finally spark.sql("DROP TABLE IF EXISTS concat_part")
  }
}
