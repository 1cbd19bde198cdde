package graft.tools

import graft.{Session, SparkEntry}

/** Ad-hoc plan printer (not part of the driver contract; run with
  * runMain graft.tools.PlanDump <queryName> [sfDir] [formatted]). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = Session.local(cores = "8")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2 && args(2) == "formatted") df.explain("formatted")
    else println(df.queryExecution.sparkPlan.toString)
  }
}
