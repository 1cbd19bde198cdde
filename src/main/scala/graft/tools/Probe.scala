package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.{Session, SparkEntry}

/** Ad-hoc optimization probe (not part of the driver contract): times a
  * query's noop-sink evaluation N times and prints the FINAL (post-AQE)
  * executed plan, so exchange/stage reuse is visible — the initial
  * explain of an AQE plan shows the un-deduplicated tree.
  *
  * Usage: runMain graft.tools.Probe <queryName> [sfDir] [passes] [plan|noplan]
  */
object Probe {
  def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val passes = if (args.length > 2) args(2).toInt else 3
    val showPlan = args.length <= 3 || args(3) == "plan"
    val spark = Session.configure(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var last: DataFrame = null
    (1 to passes).foreach { p =>
      val t0 = System.nanoTime()
      last = SparkEntry.queries(name)(spark, sfDir)
      noop(last)
      println(f"[probe] $name pass $p: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    if (showPlan) {
      // the noop write runs its own QueryExecution, so `last.queryExecution`
      // never executes (and would print the pre-AQE plan); capture the
      // write's POST-execution plan — ReusedExchange/AQEShuffleRead visible —
      // via a listener on the final pass
      val captured = new java.util.concurrent.atomic.AtomicReference[String]("")
      val listener = new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit =
          captured.set(qe.executedPlan.toString)
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      }
      spark.listenerManager.register(listener)
      noop(SparkEntry.queries(name)(spark, sfDir))
      // listener delivery is async; poll briefly for the capture
      val deadline = System.nanoTime() + 10e9.toLong
      while (captured.get.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      spark.listenerManager.unregister(listener)
      println("[probe] ===== final executed plan =====")
      println(captured.get)
    }
    spark.stop()
  }
}
