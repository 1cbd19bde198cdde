package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.{Bench, Session, SparkEntry}

/** Dump `.explain("formatted")` for every bench headline query to
  * <outDir>/<query>_<suffix>.txt (optimization-round evidence; not part
  * of the driver contract).
  *
  * Usage: runMain graft.tools.PlanDumpAll <outDir> <suffix> [sfDir] [names...]
  */
object PlanDumpAll {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val names = if (args.length > 3) args.drop(3).toSeq else Bench.headline
    Files.createDirectories(outDir)
    val spark = Session.configure(SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(outDir.resolve(s"${name}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] $name -> ${name}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
