package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.Asof

/** Pins the custom AS-OF JOIN operator (graft.plans.AsofJoin): semantics
  * against an in-engine aggregate reformulation, plan shape (custom exec
  * node, no cartesian, left row count preserved), self-join lineage
  * safety, and tolerance behavior. The DuckDB `ASOF LEFT JOIN` oracle
  * additionally hash-pins q125/q126 through the driver gate. */
class AsofSpec extends AnyFunSuite {
  import TestSession._

  private def sides = {
    val p = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val v = Tables.events(spark, sf).filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts").as("v_ts"))
    (p, v)
  }

  test("as-of join equals the max-aggregate reformulation") {
    val (p, v) = sides
    val got = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
      .select(col("purchase_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    // reference semantics: latest view with v_ts <= p_ts, per purchase
    val want = p.join(v, p("user_id") === v("v_user") && v("v_ts") <= p("p_ts"), "left")
      .groupBy(col("purchase_id")).agg(max(col("v_ts")).as("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(got.size == want.size)
    assert(got == want)
  }

  test("left row multiplicity is preserved exactly") {
    val (p, v) = sides
    assert(Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts").count()
      == p.count())
  }

  test("tolerance nulls out matches older than the window") {
    val (p, v) = sides
    val tol = 6L * 3600 * 1000 * 1000 // 6h in us
    val got = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts",
        toleranceUs = Some(tol))
      .select(col("purchase_id"), col("p_ts"), col("v_ts"))
    // every surviving match is within tolerance...
    assert(got.filter(col("v_ts").isNotNull &&
      unix_micros(col("p_ts")) - unix_micros(col("v_ts")) > tol).isEmpty)
    // ...and tolerance only FILTERS the untolerated join's matches
    val unfiltered = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
      .select(col("purchase_id"),
        when(unix_micros(col("p_ts")) - unix_micros(col("v_ts")) <= tol, col("v_ts"))
          .as("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    assert(got.collect().map(r => (r.getLong(0), r.get(2))).toMap == unfiltered)
  }

  test("plan uses AsofJoinExec with no cartesian or window buffer") {
    val (p, v) = sides
    val plan = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("self-as-of (shared lineage) re-aliases cleanly") {
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("ts"))
    // same DataFrame on both sides: right must get fresh exprIds
    val prior = Asof.join(
      ev.select(col("event_id").as("eid"), col("user_id").as("u"), col("ts").as("t")),
      ev.select(col("user_id").as("u2"), col("ts").as("t2")),
      Seq("u"), Seq("u2"), "t", "t2")
    assert(prior.count() == ev.count())
    // each event's matched t2 is itself or an earlier event (same user)
    assert(prior.filter(col("t2").isNotNull && col("t2") > col("t")).isEmpty)
    // an event always matches at least itself (t2 <= t includes equality)
    assert(prior.filter(col("t2").isNull).isEmpty)
  }

  test("null keys and null times never match (SQL equality semantics)") {
    import spark.implicits._
    val l = Seq((Some(1L), Some(10L), "a"), (None, Some(20L), "b"),
                (Some(2L), None, "c"), (Some(1L), Some(5L), "d"))
      .toDF("k", "t", "tag")
    val r = Seq((Some(1L), Some(4L), "r1"), (None, Some(1L), "rnull"),
                (Some(1L), None, "rtnull"), (Some(2L), Some(1L), "r2"))
      .toDF("rk", "rt", "rtag")
    val got = Asof.join(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select(col("tag"), col("rtag"))
      .collect().map(x => (x.getString(0), Option(x.getString(1)))).toMap
    assert(got("a") == Some("r1")) // normal match
    assert(got("b") == None)       // null left key: no match
    assert(got("c") == None)       // null left time: no match
    assert(got("d") == Some("r1")) // 4 <= 5; null-time right row ignored
  }

  test("TIMESTAMP_NTZ time columns are accepted end-to-end (both sides NTZ)") {
    // NTZ is the reference's own TIMESTAMP semantics (timezone-less,
    // serde/.../TypeInfoFactory.java:56-57); the operator accepts it as a
    // first-class time type, including tolerance (NTZ stores micros-as-long
    // exactly like TimestampType). The loaders normalize events to
    // TimestampType, so this pins the operator-level contract directly.
    val (p, v) = sides
    val pn = p.withColumn("p_ts", col("p_ts").cast("timestamp_ntz"))
    val vn = v.withColumn("v_ts", col("v_ts").cast("timestamp_ntz"))
    val ntz = Asof.join(pn, vn, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts",
        toleranceUs = Some(6L * 3600 * 1000 * 1000))
      .select(col("purchase_id"), col("v_ts").cast("timestamp").as("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    val tz = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts",
        toleranceUs = Some(6L * 3600 * 1000 * 1000))
      .select(col("purchase_id"), col("v_ts"))
      .collect().map(r => (r.getLong(0), r.get(1))).toMap
    // session timezone is pinned UTC, so NTZ and TZ paths agree exactly
    assert(ntz == tz)
  }

  test("mismatched time types are rejected up front") {
    val (p, v) = sides
    val e = intercept[IllegalArgumentException] {
      Asof.join(p, v.withColumn("v_ts", col("v_ts").cast("long")),
        Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
    }
    assert(e.getMessage.contains("share a type"))
  }

  test("ambiguous column names are rejected up front") {
    val (p, v) = sides
    val clash = v.withColumnRenamed("v_user", "user_id")
    val e = intercept[IllegalArgumentException] {
      Asof.join(p, clash, Seq("user_id"), Seq("user_id"), "p_ts", "v_ts")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("DateType time with a tolerance is rejected (days vs microseconds trap)") {
    val (p, v) = sides
    val pd = p.withColumn("p_ts", to_date(col("p_ts")))
    val vd = v.withColumn("v_ts", to_date(col("v_ts")))
    // without tolerance, date-typed as-of is fine
    assert(Asof.join(pd, vd, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
      .count() > 0)
    val e = intercept[IllegalArgumentException] {
      Asof.join(pd, vd, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts",
        toleranceUs = Some(86400000000L))
    }
    assert(e.getMessage.contains("DAYS"), e.getMessage)
  }

  test("composite keys partition the match space (q136 semantics)") {
    val (p, v) = sides
    val pk = p.withColumn("day", to_date(col("p_ts")))
    val vk = v.withColumn("v_day", to_date(col("v_ts")))
    val multi = Asof.join(pk, vk, Seq("user_id", "day"), Seq("v_user", "v_day"),
        "p_ts", "v_ts")
      .select(col("purchase_id"), col("v_ts")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    val single = Asof.join(p, v, Seq("user_id"), Seq("v_user"), "p_ts", "v_ts")
      .select(col("purchase_id"), col("v_ts")).collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(multi.keySet == single.keySet, "left multiplicity must be identical")
    // same-day matches agree with the single-key join; cross-day matches null out
    multi.foreach { case (id, m) =>
      assert(m.forall(_ == single(id).get), s"purchase $id: multi-key matched a different view")
    }
    assert(multi.count(_._2.isEmpty) > single.count(_._2.isEmpty),
      "some purchase should lose its (earlier-day) view under the day key")
  }
}
