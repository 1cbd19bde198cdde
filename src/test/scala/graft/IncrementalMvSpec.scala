package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{IncrementalMv, MaterializedViews}
import graft.plans.IncrementalMv.AggSpec

/** Incremental aggregate-MV maintenance (plans/IncrementalMv). Pins:
  * the incremental path reads ONLY appended files; merged cells equal a
  * full recompute for every supported aggregate; removed files trigger
  * the automatic full-recompute fallback; AVG is rejected; the
  * registered view keeps routing queries after an incremental refresh. */
class IncrementalMvSpec extends AnyFunSuite {
  import TestSession._

  private val base = "target/storage/incmv"

  private def aggs = Seq(
    AggSpec("count", "o_orderkey", "n_orders"),
    AggSpec("sum", "o_orderkey", "sum_keys"), // bigint: order-proof exact
    AggSpec("min", "o_totalprice", "min_price"),
    AggSpec("max", "o_totalprice", "max_price"))

  private def fullRecompute(dir: String) =
    spark.read.parquet(dir).groupBy(col("o_orderpriority"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           sum(col("o_orderkey")).as("sum_keys"),
           min(col("o_totalprice")).as("min_price"),
           max(col("o_totalprice")).as("max_price"))

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap

  test("append-only refresh is incremental, reads only new files, and matches full recompute") {
    MaterializedViews.clear()
    val tableDir = s"$base/orders_growing"
    val mvPath = s"$base/mv_growing"
    val all = Tables.orders(spark, sf)
    all.filter(col("o_orderkey") % 2 === 0).repartition(4)
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
    IncrementalMv.create(spark, "mv_inc", tableDir, None,
      Seq("o_orderpriority"), aggs, mvPath)

    // batch 2 appended
    all.filter(col("o_orderkey") % 2 === 1).repartition(2)
      .write.mode(SaveMode.Append).parquet(tableDir)

    // the delta frame sees exactly the appended files
    val delta = IncrementalMv.deltaFrame(spark, tableDir, mvPath)
    assert(delta.inputFiles.length == 2,
      s"delta must be the 2 appended files, saw ${delta.inputFiles.length}")

    val r = IncrementalMv.refresh(spark, tableDir, None, Seq("o_orderpriority"), aggs, mvPath)
    assert(r.mode == "incremental" && r.newFiles == 2 && r.removedFiles == 0, r.toString)
    assert(asMap(IncrementalMv.read(spark, mvPath)) == asMap(fullRecompute(tableDir)),
      "incrementally merged cells must equal the full recompute")
  }

  test("removed files force the full-recompute fallback; noop when nothing changed") {
    MaterializedViews.clear()
    val tableDir = s"$base/orders_shrinking"
    val mvPath = s"$base/mv_shrinking"
    Tables.orders(spark, sf).repartition(4)
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
    IncrementalMv.create(spark, "mv_shrink", tableDir, None,
      Seq("o_orderpriority"), aggs, mvPath)

    assert(IncrementalMv.refresh(spark, tableDir, None,
      Seq("o_orderpriority"), aggs, mvPath).mode == "noop")

    // rewrite the base smaller (files replaced) -> full
    Tables.orders(spark, sf).filter(col("o_orderstatus") === "F").repartition(2)
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
    val r = IncrementalMv.refresh(spark, tableDir, None, Seq("o_orderpriority"), aggs, mvPath)
    assert(r.mode == "full" && r.removedFiles > 0, r.toString)
    assert(asMap(IncrementalMv.read(spark, mvPath)) == asMap(fullRecompute(tableDir)))
  }

  test("filtered view maintains only matching rows; AVG is rejected") {
    MaterializedViews.clear()
    val tableDir = s"$base/orders_filtered"
    val mvPath = s"$base/mv_filtered"
    val all = Tables.orders(spark, sf)
    all.limit(800).write.mode(SaveMode.Overwrite).parquet(tableDir)
    IncrementalMv.create(spark, "mv_filtered", tableDir,
      Some(col("o_orderstatus") === "F"), Seq("o_orderpriority"), aggs, mvPath)
    all.except(all.limit(800)).write.mode(SaveMode.Append).parquet(tableDir)
    val r = IncrementalMv.refresh(spark, tableDir, Some(col("o_orderstatus") === "F"),
      Seq("o_orderpriority"), aggs, mvPath)
    assert(r.mode == "incremental")
    val want = asMap(spark.read.parquet(tableDir).filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(col("o_orderkey")).as("n_orders"), sum(col("o_orderkey")).as("sum_keys"),
           min(col("o_totalprice")).as("min_price"), max(col("o_totalprice")).as("max_price")))
    assert(asMap(IncrementalMv.read(spark, mvPath)) == want)

    intercept[IllegalArgumentException] { AggSpec("avg", "o_totalprice", "bad") }
    MaterializedViews.clear()
  }

  test("streaming maintenance: each micro-batch lands incrementally in the view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    MaterializedViews.clear()
    val baseDir = s"$base/stream_base"
    val mvPath = s"$base/stream_mv"
    val ckpt = s"$base/stream_ckpt"
    Seq(s"$base/stream_base", mvPath, ckpt).foreach { d =>
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .as[(String, Long, Double)].collect().toSeq
    val (b1, b2) = orders.splitAt(orders.length / 2)

    // seed the base + view with batch 1 (create runs on existing data)
    b1.toDF("o_orderpriority", "o_orderkey", "o_totalprice")
      .repartition(2).write.mode("overwrite").parquet(baseDir)
    val mvAggs = Seq(IncrementalMv.AggSpec("count", "o_orderkey", "n"),
      IncrementalMv.AggSpec("sum", "o_orderkey", "s"))
    IncrementalMv.create(spark, "mv_stream", baseDir, None,
      Seq("o_orderpriority"), mvAggs, mvPath)

    // stream batch 2 through the maintainer
    val ms = MemoryStream[(String, Long, Double)]
    ms.addData(b2)
    val q = graft.streaming.MvStream.maintain(spark,
      ms.toDF.toDF("o_orderpriority", "o_orderkey", "o_totalprice"),
      baseDir, None, Seq("o_orderpriority"), mvAggs, mvPath, ckpt)
    q.awaitTermination(120000)

    val got = IncrementalMv.read(spark, mvPath).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    val want = orders.groupBy(_._1).map { case (k, rows) =>
      (k, (rows.size.toLong, rows.map(_._2).sum)) }
    assert(got == want, "streamed batches must fold into the same cells as a full recompute")
    MaterializedViews.clear()
  }

  test("refresh writes merged cells via staged swap, never collecting them on the driver") {
    MaterializedViews.clear()
    val tableDir = s"$base/orders_staged"
    val mvPath = s"$base/mv_staged"
    val all = Tables.orders(spark, sf)
    all.limit(600).repartition(3).write.mode(SaveMode.Overwrite).parquet(tableDir)
    IncrementalMv.create(spark, "mv_staged", tableDir, None,
      Seq("o_orderpriority"), aggs, mvPath)
    all.except(all.limit(600)).repartition(2).write.mode(SaveMode.Append).parquet(tableDir)

    // Pin: no action named collect* ever runs over a cells-shaped plan.
    // (The files-listing collect has schema [src_file] and is exempt —
    // that one is metadata-scale by design.)
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        events.add(funcName + "|" + qe.analyzed.schema.fieldNames.mkString(","))
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val r = IncrementalMv.refresh(spark, tableDir, None, Seq("o_orderpriority"), aggs, mvPath)
      assert(r.mode == "incremental", r.toString)
      // the listener bus is async: wait until it goes quiet
      var last = -1; var same = 0
      val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
      while (same < 4 && System.nanoTime < deadline) {
        Thread.sleep(100)
        val n = events.size
        if (n == last) same += 1 else { same = 0; last = n }
      }
      val evs = events.toArray(Array.empty[String]).toSeq
      assert(evs.nonEmpty, "listener saw no actions at all — pin is vacuous")
      val cellCollects = evs.filter(e => e.startsWith("collect") && e.contains("n_orders"))
      assert(cellCollects.isEmpty, s"merged cells materialized on the driver: $cellCollects")
    } finally spark.listenerManager.unregister(listener)
    // and the staged swap left a clean dir + correct cells behind
    val fs = new org.apache.hadoop.fs.Path(mvPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$mvPath/data.cow_staging")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$mvPath/data.cow_backup")))
    assert(asMap(IncrementalMv.read(spark, mvPath)) == asMap(fullRecompute(tableDir)))
    MaterializedViews.clear()
  }

  test("the registered view still routes queries after an incremental refresh") {
    MaterializedViews.clear()
    val tableDir = s"$base/orders_routed"
    val mvPath = s"$base/mv_routed"
    Tables.orders(spark, sf).repartition(3)
      .write.mode(SaveMode.Overwrite).parquet(tableDir)
    IncrementalMv.create(spark, "mv_routed", tableDir, None,
      Seq("o_orderpriority"), Seq(AggSpec("count", "o_orderkey", "n_orders")), mvPath)
    val q = spark.read.parquet(tableDir).groupBy(col("o_orderpriority"))
      .agg(count(col("o_orderkey")).as("n_orders"))
    assert(q.queryExecution.executedPlan.toString.contains("mv_routed"),
      "matching query must route to the maintained view")
    MaterializedViews.clear()
  }
}
