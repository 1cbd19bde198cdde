package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Session, Tables}
import graft.operators.Dedup

/** Ad-hoc stage-by-stage timing of the LSH dedup pipeline (optimization
  * probe, not part of the driver contract). */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Session.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[parts] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    (1 to 2).foreach { pass =>
      println(s"[parts] ---- pass $pass ----")
      time("docs scan")(noop(Tables.documents(spark, sfDir)))
      time("shingleHashes")(noop(Dedup.shingleHashes(Tables.documents(spark, sfDir))))
      time("signatures k=32")(noop(
        Dedup.minhashSignatures(Dedup.shingleHashes(Tables.documents(spark, sfDir)), k = 32)))
      time("bandIndex")(noop(
        Dedup.bandIndex(
          Dedup.minhashSignatures(Dedup.shingleHashes(Tables.documents(spark, sfDir)), k = 32),
          bands = 8)))
      time("lshCandidates")(noop(
        Dedup.lshCandidates(
          Dedup.minhashSignatures(Dedup.shingleHashes(Tables.documents(spark, sfDir)), k = 32),
          bands = 8)))
      time("q65 full")(noop {
        val shRaw = Dedup.shingleHashes(Tables.documents(spark, sfDir))
        val cands = Dedup.lshCandidates(Dedup.minhashSignatures(shRaw, k = 32), bands = 8)
        Dedup.exactJaccard(cands, shRaw, keepZero = false)
          .filter(col("jac") >= 0.7)
          .select(col("ida"), col("idb"), round(col("jac"), 6).as("jac"))
          .orderBy(col("ida"), col("idb"))
      })
    }
    spark.stop()
  }
}
