package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.etl.DataQuality._

/** Unit + plan contracts for [[graft.etl.DataQuality]]: exact violation
  * counts on a synthetic frame (incl. the NULLs-pass semantics of the
  * non-NotNull rules), and the one-scan-for-all-row-local-rules plan
  * shape that makes a 10-rule audit affordable at 100 TB. */
class DataQualitySpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private val frame = Seq(
    (Some(1L), 10.0, "1-URGENT"),
    (Some(1L), -5.0, "9-BAD"),   // dup id, below range, bad format
    (Some(2L), 999.0, "2-HIGH"), // above range
    (None, 50.0, null)           // null id; null text passes Matches
  ).toDF("id", "amount", "pri")

  test("row-local rules count exactly, and NULLs pass range/format rules") {
    val got = audit(frame, "t", Seq(
        NotNull("id"), InRange("amount", 0.0, 100.0), Matches("pri", "^[1-5]-")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map(
      "t.not_null(id)" -> 1L,
      "t.in_range(amount)" -> 2L,
      "t.matches(pri)" -> 1L))
  }

  test("unique counts excess rows; foreign key counts orphans, null FKs pass") {
    val dim = Seq(1L).toDF("k")
    val got = audit(frame, "t", Seq(
        Unique(Seq("id")), ForeignKey("id", dim, "k")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // id=1 twice -> 1 excess; id=2 orphan (null id passes)
    assert(got == Map("t.unique(id)" -> 1L, "t.foreign_key(id)" -> 1L))
  }

  test("all row-local rules share one table scan; heavy rules add one each") {
    val orders = Tables.orders(spark, sf)
    val plan = audit(orders, "orders", Seq(
        NotNull("o_custkey"), InRange("o_totalprice", 0, 1e6),
        Matches("o_orderpriority", "^[1-5]-"), Unique(Seq("o_orderkey"))))
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 2, s"expected 2 scans (row-local lane + unique lane), got $scans\n$plan")
  }

  test("empty rule list is rejected") {
    intercept[IllegalArgumentException](audit(frame, "t", Seq.empty))
  }
}
