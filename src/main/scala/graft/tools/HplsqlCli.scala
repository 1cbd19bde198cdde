package graft.tools

import graft.{Session, Tables}
import graft.hplsql.Hplsql

/** The `hplsql` launcher analog (reference bin/hplsql →
  * hplsql/src/main/java/org/apache/hive/hplsql/Hplsql.java):
  *
  *   runMain graft.tools.HplsqlCli -f script.sql [-d sfDir]
  *   runMain graft.tools.HplsqlCli -e "PRINT 1 + 2" [-d sfDir]
  *
  * `-d` registers the test tables as views first, so scripts can query
  * them; output goes to stdout exactly as PRINT produces it. */
object HplsqlCli {
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect { case Array(k, v) => (k, v) }.toMap
    val script = opts.get("-f") match {
      case Some(path) =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      case None => opts.getOrElse("-e",
        sys.error("usage: HplsqlCli -f <script.sql> | -e <stmt> [-d <sfDir>]"))
    }
    val spark = Session.local()
    opts.get("-d").foreach(Tables.registerAll(spark, _))
    Hplsql.run(spark, script, out = println)
    spark.stop()
  }
}
