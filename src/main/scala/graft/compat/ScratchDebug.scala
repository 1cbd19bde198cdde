package graft.compat
object ScratchDebug {
  def main(args: Array[String]): Unit = {
    val spark = QTestReplay.compatSession(graft.Session.local("8"), "/root/reference/data/files")
    val q = "select key, value, count(*) from src b group by key, value"
    spark.sql("drop view if exists cv3")
    try { spark.sql(s"create view cv3 AS SELECT * FROM ($q) __v"); println("STAR OK " + spark.table("cv3").schema.fieldNames.mkString("|")) }
    catch { case e: Exception => println("STAR FAIL " + e.getMessage.take(120)) }
    spark.sql("drop view if exists cv4")
    try { spark.sql(s"create view cv4 (`key`,`value`,`_c2`) AS SELECT * FROM ($q) __v"); println("LIST OK " + spark.table("cv4").schema.fieldNames.mkString("|")) }
    catch { case e: Exception => println("LIST FAIL " + e.getMessage.take(120)) }
    spark.stop()
  }
}
