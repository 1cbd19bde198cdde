package graft.tools
import org.apache.spark.sql.SparkSession
import graft.{Session, Tables}
object RegProbe {
  def main(args: Array[String]): Unit = {
    val spark = Session.configure(SparkSession.builder()
      .master("local[32]").config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 4).foreach { p =>
      val t0 = System.nanoTime()
      Tables.registerAll(spark, "/root/testdata/sf0.1")
      println(f"[parts] registerAll pass $p: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val t1 = System.nanoTime()
    (1 to 10).foreach(_ => Tables.orders(spark, "/root/testdata/sf0.1"))
    println(f"[parts] 10x read.parquet(orders): ${(System.nanoTime() - t1) / 1e9}%.3f s")
    spark.stop()
  }
}
