package graft.tools

/** Prints the driver-contract sizes (ad-hoc; not part of the contract). */
object CountContract {
  def main(args: Array[String]): Unit = {
    println(s"queries=${graft.SparkEntry.queries.size} oracles=${graft.SparkEntry.oracleSql.size}")
  }
}
