package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's honest-reporting contract (round-5 postmortem:
  * Bench caught Throwable, recorded the elapsed time, and shipped
  * q73=0.077s for a query that crashed — with rc 0).
  */
class BenchSpec extends AnyFunSuite {

  test("every headline name resolves in SparkEntry.queries") {
    assert(Bench.unresolvedHeadline.isEmpty,
      s"headline names missing from SparkEntry.queries: ${Bench.unresolvedHeadline}")
  }

  test("a failed query is excluded from timings and listed under failed") {
    val h = Bench.headline.take(3)
    val ok = Seq(h(0) -> 1.0, h(2) -> 3.0)
    val json = Bench.render(
      cold = ok, steady1 = ok, steady2 = ok,
      failed = Seq(h(1)), sfDir = "sfX")
    // failure-injected query never appears as a timing
    assert(!json.contains("\"" + h(1) + "\":"),
      s"failed query ${h(1)} leaked into a timing map: $json")
    assert(json.contains(s""""failed":["${h(1)}"]"""))
    // survivors keep their min-across-passes timing
    assert(json.contains("\"" + h(0) + "\":1.0"))
  }

  test("a query that failed only in one pass is dropped from EVERY timing map") {
    val h = Bench.headline.take(2)
    val full = Seq(h(0) -> 1.0, h(1) -> 2.0)
    val partial = Seq(h(0) -> 1.0) // h(1) crashed in steady2
    val json = Bench.render(full, full, partial, failed = Seq(h(1)), "sfX")
    // not in the headline map, the cold map, or either steady map — a
    // partial success is still not a trustworthy number
    assert(!json.contains("\"" + h(1) + "\":"),
      s"partially-failed query ${h(1)} leaked a timing: $json")
    // and the cold total excludes it too
    assert(json.contains(""""value_cold":1.0"""))
  }

  test("no failures yields an empty failed list and all timings present") {
    val h = Bench.headline.take(2)
    val p = Seq(h(0) -> 0.5, h(1) -> 0.25)
    val json = Bench.render(p, p, p, failed = Nil, "sfX")
    assert(json.contains(""""failed":[]"""))
    assert(json.contains("\"" + h(0) + "\":0.5"))
    assert(json.contains("\"" + h(1) + "\":0.25"))
  }
}
