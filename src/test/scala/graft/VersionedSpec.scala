package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.acid.Versioned

/** Pins the versioned snapshot table (graft.acid.Versioned): commit-marker
  * atomicity, snapshot isolation for in-flight readers, time travel,
  * vacuum retention, and writer serialization. q258's DuckDB oracle
  * additionally hash-pins the DML semantics per version.
  */
class VersionedSpec extends AnyFunSuite {
  import TestSession._
  import spark.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_ver").toString + "/t"

  test("commits are atomic: a version without its marker is invisible") {
    val base = freshBase()
    assert(Versioned.versions(spark, base).isEmpty)
    val v1 = Versioned.commit(spark, base, Seq((1, "a"), (2, "b")).toDF("id", "s"))
    assert(v1 == 1 && Versioned.currentVersion(spark, base) == Some(1))
    // simulate a crashed writer: data files land, marker never does
    val half = new java.io.File(s"$base/_versions/v00000002")
    Seq((9, "x")).toDF("id", "s").write.parquet(half.toString)
    new java.io.File(half, "_committed").delete()
    assert(Versioned.currentVersion(spark, base) == Some(1),
      "uncommitted version leaked into the read view")
    assert(Versioned.read(spark, base).count() == 2)
    // the next commit reclaims the orphan directory
    val v2 = Versioned.commit(spark, base, Seq((3, "c")).toDF("id", "s"))
    assert(v2 == 2 && Versioned.read(spark, base).count() == 1)
  }

  test("readers are pinned to their snapshot while new versions commit") {
    val base = freshBase()
    Versioned.commit(spark, base, (1 to 100).toDF("id"))
    val pinned = Versioned.read(spark, base) // resolves v1 NOW
    Versioned.commit(spark, base, (1 to 5).toDF("id"))
    // collected AFTER the second commit, still sees v1 in full
    assert(pinned.count() == 100)
    assert(Versioned.read(spark, base).count() == 5)
  }

  test("time travel reads exact historical states; unknown versions reject") {
    val base = freshBase()
    Versioned.commit(spark, base, Seq((1, 10.0), (2, 20.0)).toDF("id", "v"))
    Versioned.update(spark, base, col("id") === 1, Map("v" -> lit(99.0)))
    Versioned.delete(spark, base, col("id") === 2)
    assert(Versioned.versions(spark, base) == Seq(1, 2, 3))
    assert(Versioned.read(spark, base, Some(1)).agg(sum("v")).as[Double].head() == 30.0)
    assert(Versioned.read(spark, base, Some(2)).agg(sum("v")).as[Double].head() == 119.0)
    assert(Versioned.read(spark, base, Some(3)).agg(sum("v")).as[Double].head() == 99.0)
    val e = intercept[IllegalArgumentException] {
      Versioned.read(spark, base, Some(7))
    }
    assert(e.getMessage.contains("not committed"))
  }

  test("vacuum drops only history, never the current version") {
    val base = freshBase()
    (1 to 4).foreach(n => Versioned.commit(spark, base, (1 to n).toDF("id")))
    val removed = Versioned.vacuum(spark, base, keep = 2)
    assert(removed == Seq(1, 2))
    assert(Versioned.versions(spark, base) == Seq(3, 4))
    assert(Versioned.read(spark, base).count() == 4)
    intercept[IllegalArgumentException] { Versioned.vacuum(spark, base, keep = 0) }
  }

  test("concurrent commits serialize: distinct versions, nothing lost") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val base = freshBase()
    Versioned.commit(spark, base, Seq(0).toDF("id"))
    val fs = (1 to 4).map(n => Future(
      Versioned.commit(spark, base, Seq(n).toDF("id"))))
    val got = fs.map(Await.result(_, 5.minutes)).sorted
    assert(got == Seq(2, 3, 4, 5), s"version collision: $got")
    assert(Versioned.versions(spark, base) == Seq(1, 2, 3, 4, 5))
  }
}
