package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Pins [[Dedup.sharedSpans]] — the ExactSubstr-style shared-token-span
  * detector — on hand-built corpora where every expected run length is
  * known in closed form. */
class SpanSpec extends AnyFunSuite {
  import TestSession._

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val w = (1 to 40).map(i => s"w$i")
  private def span(from: Int, to: Int) = w.slice(from - 1, to).mkString(" ")

  test("single embedded run is found with exact length and alignment") {
    val corpus = docs(
      1L -> span(1, 30),
      2L -> s"x1 x2 x3 ${span(10, 21)} y1 y2 y3", // 12 shared tokens
      3L -> "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")
    val out = Dedup.sharedSpans(corpus, k = 8, minRun = 10, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 12L, 1L)))
  }

  test("two disjoint runs on different diagonals stay separate spans") {
    val corpus = docs(
      1L -> span(1, 30),
      2L -> s"${span(1, 10)} q1 q2 q3 q4 ${span(20, 29)}")
    val out = Dedup.sharedSpans(corpus, k = 8, minRun = 8, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 10L, 2L)))
  }

  test("runs shorter than minRun are suppressed") {
    val corpus = docs(
      1L -> span(1, 30),
      2L -> s"x1 x2 x3 ${span(10, 18)} y1 y2 y3") // 9 shared < minRun 10
    val out = Dedup.sharedSpans(corpus, k = 8, minRun = 10, dfCap = 64)
    assert(out.count() == 0)
  }

  test("df cap drops boilerplate shingles instead of exploding the join") {
    // the shared run appears in ALL 5 docs -> its shingles have df 5;
    // with dfCap 4 every match is suppressed, with dfCap 5 all C(5,2)
    // pairs surface
    val corpus = docs((1L to 5L).map(i => i -> s"a$i b$i c$i ${span(1, 12)} d$i"): _*)
    val capped = Dedup.sharedSpans(corpus, k = 8, minRun = 10, dfCap = 4)
    assert(capped.count() == 0, "over-cap shingles must be dropped")
    val open = Dedup.sharedSpans(corpus, k = 8, minRun = 10, dfCap = 5)
    assert(open.count() == 10, "all C(5,2) pairs expected under the cap")
  }

  test("repeated shingle inside one document does not inflate runs") {
    // doc 2 contains the shared block twice; each copy aligns with doc 1
    // on its own diagonal -> one pair, two spans, max run = block length
    val corpus = docs(
      1L -> span(1, 12),
      2L -> s"${span(1, 12)} m1 m2 ${span(1, 12)}")
    val out = Dedup.sharedSpans(corpus, k = 8, minRun = 10, dfCap = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 2L, 12L, 2L)))
  }

  test("spanContamination flags only train docs leaking eval spans, asymmetrically") {
    val train = docs(
      1L -> s"t1 t2 t3 ${span(1, 15)} t4 t5", // leaks a 15-token eval span
      2L -> "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", // clean
      3L -> s"${span(1, 9)} v1 v2 v3")        // 9-token overlap < minRun
    val ev = docs(100L -> span(1, 20))
    val out = Dedup.spanContamination(train, ev, k = 8, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((100L, 1L, 15L, 1L)))
  }

  test("spanContamination == sharedSpans restricted to cross-set pairs") {
    val all = Tables.documents(spark, sf)
    val viaShared = Dedup.sharedSpans(all, k = 8, minRun = 20, dfCap = Int.MaxValue)
      .filter((col("ida") % 5 === 3) =!= (col("idb") % 5 === 3))
      .select(
        when(col("ida") % 5 === 3, col("ida")).otherwise(col("idb")).as("eval_id"),
        when(col("ida") % 5 === 3, col("idb")).otherwise(col("ida")).as("train_id"),
        col("max_run"), col("n_spans"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val direct = SparkEntry.queries("q216_span_decontamination")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(direct == viaShared, s"direct=${direct.size} viaShared=${viaShared.size}")
    assert(direct.nonEmpty, "no cross-set span at this sf — gate would be vacuous")
  }

  test("spanCoverage merges overlapping leak intervals, never double-counting") {
    // train doc 1: 40 tokens; two eval docs leak OVERLAPPING spans
    // (train positions 1..20 and 11..30) plus doc 100's tail also
    // appears disjointly at 31..40 — union = [1,30] + [31,40]... which
    // itself touches, so expect ONE region iff contiguous, else two.
    // Build it exactly: t = w1..w40; e1 = w1..w20; e2 = w11..w30.
    // Regions: [1,30] merged from the two overlapping spans -> covered 30.
    val train = docs(1L -> span(1, 40))
    val ev = docs(100L -> span(1, 20), 101L -> span(11, 30))
    val out = Dedup.spanCoverage(train, ev, k = 8, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
                           r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 1L, 30L, 40L, 0.75)))
  }

  test("spanCoverage reports full coverage for a verbatim copy, none below minRun") {
    val train = docs(
      1L -> span(1, 25),                       // verbatim subset of eval
      2L -> s"${span(1, 9)} a1 a2 a3 a4 a5")   // 9-token overlap < minRun
    val ev = docs(100L -> span(1, 25))
    val out = Dedup.spanCoverage(train, ev, k = 8, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(out.toSeq == Seq((1L, 25L, 25L, 1.0)))
  }

  test("spanScrub excises exactly the merged regions; fully-covered docs vanish") {
    val train = docs(
      1L -> s"a1 a2 a3 ${span(1, 15)} b1 b2",  // leak at positions 4..18
      2L -> span(1, 20),                       // fully covered -> vanishes
      3L -> "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")  // clean -> not emitted here
    val ev = docs(100L -> span(1, 20))
    val out = Dedup.spanScrub(train, ev, k = 8, minRun = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq((1L, 5L, "a1 a2 a3 b1 b2")))
  }

  test("span family rejects undetectable contracts loudly") {
    val d = docs(1L -> span(1, 12))
    intercept[IllegalArgumentException](Dedup.sharedSpans(d, k = 8, minRun = 7))
    intercept[IllegalArgumentException](Dedup.sharedSpans(d, k = 1, minRun = 20))
    intercept[IllegalArgumentException](Dedup.sharedSpans(d, k = 8, minRun = 20, dfCap = 1))
    intercept[IllegalArgumentException](Dedup.spanContamination(d, d, k = 8, minRun = 7))
  }

  test("gate row q215 reports exactly the eligible planted twins, closed form") {
    // a twin embeds tokens 5..34 of its base: the shared run is
    // min(30, ntok - 4) tokens, reported iff >= minRun 20 (ntok >= 24)
    val ntok = Tables.documents(spark, sf)
      .filter(col("doc_id") % 50 === 0)
      .select(col("doc_id"), size(split(trim(col("text")), " +")).as("ntok"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = ntok.collect { case (id, n) if n >= 24 =>
      id -> math.min(30, n - 4).toLong }
    assert(expected.nonEmpty, "corpus too short to plant any twin — gate would be vacuous")
    val out = SparkEntry.queries("q215_shared_spans")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = out.filter { case (a, b, _) => b == a + 1000000L }
      .map { case (a, _, run) => a -> run }.toMap
    assert(planted == expected, s"planted=$planted expected=$expected")
  }
}
