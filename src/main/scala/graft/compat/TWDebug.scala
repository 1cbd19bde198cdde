package graft.compat

object TWDebug {
  def main(args: Array[String]): Unit = {
    val spark0 = graft.Session.local("4")
    val spark = QTestReplay.compatSession(spark0, "/root/reference/data/files")
    QTestReplay.registerFixtures(spark, "/root/reference/data/files")
    spark.sql("DROP VIEW IF EXISTS dest1")
    spark.sql("DROP TABLE IF EXISTS dest1")
    spark.sql("DROP TABLE IF EXISTS dest1__lines")
    val create = "CREATE TABLE dest1(len STRING)"
    HiveDdl.translateStatements(create, Set("dest1"), Set.empty)
      .foreach { st => println("DDL>>" + st); spark.sql(st) }
    val ins = "FROM src1 INSERT OVERWRITE TABLE dest1 SELECT reverse(src1.value)"
    // mimic the replay chain minimally
    val vb = Map("dest1" -> create)
    val m = classOf[QTestReplay.type]
    // call through the replay path: use reflection-free — just inline
    spark.sql(s"INSERT OVERWRITE TABLE `dest1__lines` SELECT coalesce(CAST(`__d0` AS STRING), '\\\\N') FROM ( SELECT reverse(src1.value) FROM src1 ) __ti(__d0)")
    val rows = spark.table("dest1").collect().map(r => Option(r.get(0)).map(v => s"'$v'").getOrElse("NULL"))
    println("COUNT>>" + rows.length)
    rows.sorted.foreach(r => println("R>>" + r))
    spark.stop()
  }
}
