package graft.tools

import graft.Session

/** Minimal CLI over the persistent metastore (Session.persistent):
  * `write <dir>` creates a database, a partitioned managed table, and a
  * view; `read <dir>` — typically a LATER PROCESS — resolves all three
  * from the metastore alone and prints a checkable summary line.
  * MetastoreSpec drives one JVM per mode to pin cross-process catalog
  * persistence (the reference's HiveMetaStore durability contract). */
object CatalogCli {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: CatalogCli write|read <dir>")
    val (mode, dir) = (args(0), args(1))
    val spark = Session.persistent(dir)
    mode match {
      case "write" =>
        spark.sql("CREATE DATABASE IF NOT EXISTS graftdb")
        spark.range(0, 100)
          .selectExpr("id", "id * 2 AS v", "CAST(id % 3 AS INT) AS part")
          .write.mode("overwrite").format("parquet")
          .partitionBy("part").saveAsTable("graftdb.kv")
        spark.sql("CREATE OR REPLACE VIEW graftdb.kv_even AS " +
          "SELECT * FROM graftdb.kv WHERE id % 2 = 0")
        println(s"WROTE n=${spark.table("graftdb.kv").count()}")
      case "read" =>
        val n = spark.table("graftdb.kv").count()
        val s = spark.table("graftdb.kv").selectExpr("sum(v)").head().getLong(0)
        val even = spark.table("graftdb.kv_even").count()
        val parts = spark.sql("SHOW PARTITIONS graftdb.kv").count()
        val tables = spark.sql("SHOW TABLES IN graftdb")
          .collect().map(_.getString(1)).sorted.mkString(",")
        println(s"READ n=$n sum=$s even=$even parts=$parts tables=$tables")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
