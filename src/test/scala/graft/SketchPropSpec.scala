package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Sketches

/** Property-based (scalacheck) contracts for the mergeable sketches,
  * driven on the raw Aggregator buffers (no Spark session): random
  * inputs, random partition splits, random merge trees. SketchSpec
  * covers the distributed paths; these pin the algebra itself.
  */
class SketchPropSpec extends AnyFunSuite {

  private def check(p: Prop, min: Int = 60): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(min), p)
    assert(r.passed, r.status.toString)
  }

  /** Split xs into `cuts.size + 1` consecutive chunks. */
  private def split[A](xs: List[A], cuts: List[Int]): List[List[A]] =
    if (xs.isEmpty) List(xs)
    else {
      val bounds = (cuts.map(c => math.abs(c % (xs.size + 1))).sorted :+ xs.size).distinct
      (0 :: bounds).zip(bounds).map { case (a, b) => xs.slice(a, b) }
    }

  test("KMV: any partitioning + merge order yields the single-pass sketch bit-for-bit") {
    val agg = new Sketches.KmvAgg(16)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
      reversed <- Gen.oneOf(true, false)
    } yield (xs, cuts, reversed)
    check(Prop.forAll(gen) { case (xs, cuts, reversed) =>
      val direct = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
      val chunks0 = split(xs, cuts).map(c => c.foldLeft(agg.zero)(agg.reduce))
      val chunks = if (reversed) chunks0.reverse else chunks0
      val merged = agg.finish(chunks.reduce(agg.merge))
      direct.sameElements(merged)
    })
  }

  test("KMV: the sketch is exactly the k smallest distinct sign-flipped values") {
    val k = 16
    val agg = new Sketches.KmvAgg(k)
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))) { xs =>
      val got = agg.finish(xs.foldLeft(agg.zero)(agg.reduce)).toList
      val want = xs.map(_ ^ Long.MinValue).distinct.sorted.take(k)
      got == want
    })
  }

  test("KMV merge aggregator over stored arrays equals rebuilding from raw values") {
    val k = 16
    val build = new Sketches.KmvAgg(k)
    val merge = new Sketches.KmvMergeAgg(k)
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(Long.MinValue, Long.MaxValue))
      cuts <- Gen.listOfN(2, Gen.chooseNum(0, 1000))
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val stored = split(xs, cuts).map(c => build.finish(c.foldLeft(build.zero)(build.reduce)))
      val viaMerge = merge.finish(stored.foldLeft(merge.zero)(merge.reduce))
      val direct = build.finish(xs.foldLeft(build.zero)(build.reduce))
      viaMerge.sameElements(direct)
    })
  }

  /** Tokens from a small alphabet so collisions and heavy items arise. */
  private val tokGen = Gen.frequency(
    (4, Gen.oneOf("a", "b", "c")),          // heavy candidates
    (3, Gen.choose(0, 40).map(i => s"t$i")) // long tail
  )

  test("Misra-Gries: estimates never exceed truth and undercount by at most n/(k+1)") {
    val k = 6
    val agg = new Sketches.MgAgg(k)
    val gen = for {
      xs <- Gen.listOf(tokGen)
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val chunks = split(xs, cuts).map(c => c.foldLeft(agg.zero)(agg.reduce))
      val got = agg.finish(chunks.reduce(agg.merge))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = xs.size.toLong / (k + 1)
      val sound = got.forall { case (t, c) => c <= truth(t) && c >= truth(t) - slack }
      val complete = truth.forall { case (t, c) => c <= slack || got.contains(t) }
      sound && complete && got.size <= k
    })
  }

  test("Misra-Gries regression: the mid-iteration-mutation cases the fuzzer caught") {
    // Both once produced >k survivors: the overflow paths mutated the
    // counter HashMap inside its own foreach, which can skip entries.
    val k = 6
    val agg = new Sketches.MgAgg(k)
    val cases = Seq(
      (List("a", "t7", "b", "t14", "t37", "t37", "t10", "t17", "c", "c", "t26", "t4",
            "t29", "c", "t4", "t40", "t26", "t35", "t34", "t39", "t8", "t2", "a",
            "t10", "b", "t7", "t6", "c", "a", "t6"), List(16, 23)),
      (List("a", "t9", "t38", "b", "t39", "t37", "t32", "a", "a", "t13", "t35",
            "t18", "t7"), List(3, 6)))
    for ((xs, bounds) <- cases) {
      val chunks = ((0 :: bounds) :+ xs.size).sliding(2).map {
        case List(a, b) => xs.slice(a, b)
      }.toList
      val got = agg.finish(
        chunks.map(c => c.foldLeft(agg.zero)(agg.reduce)).reduce(agg.merge))
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val slack = xs.size.toLong / (k + 1)
      assert(got.size <= k)
      assert(got.forall { case (t, c) => c <= truth(t) && c >= truth(t) - slack }, got)
      assert(truth.forall { case (t, c) => c <= slack || got.contains(t) }, got)
    }
  }

  test("Misra-Gries: capacity bound holds at every intermediate state") {
    val k = 4
    val agg = new Sketches.MgAgg(k)
    check(Prop.forAll(Gen.listOf(tokGen)) { xs =>
      var maxSize = 0 // reduce mutates in place, so track the high-water mark
      xs.foldLeft(agg.zero) { (b, x) =>
        val nb = agg.reduce(b, x); maxSize = math.max(maxSize, nb.size); nb
      }
      maxSize <= k
    }, min = 30)
  }

  test("DDSketch: any partitioning + merge order yields the single-pass map bit-for-bit") {
    val agg = new Sketches.DdAgg(0.02, 4096)
    val valGen = Gen.chooseNum(0.0, 1e9).map(v => math.abs(v))
    val gen = for {
      xs <- Gen.listOf(valGen)
      cuts <- Gen.listOfN(3, Gen.chooseNum(0, 1000))
      reversed <- Gen.oneOf(true, false)
    } yield (xs, cuts, reversed)
    check(Prop.forAll(gen) { case (xs, cuts, reversed) =>
      val single = agg.finish(xs.foldLeft(agg.zero)((b, v) => agg.reduce(b, Some(v))))
      val chunks = split(xs, cuts).map(_.foldLeft(agg.zero)((b, v) => agg.reduce(b, Some(v))))
      val ordered = if (reversed) chunks.reverse else chunks
      val merged = agg.finish(ordered.foldLeft(agg.zero)(agg.merge))
      single == merged
    })
  }

  test("DDSketch: every value's bucket representative is within alpha relative error") {
    val alpha = 0.01
    val gamma = (1 + alpha) / (1 - alpha)
    val lnGamma = math.log(gamma)
    check(Prop.forAll(Gen.chooseNum(1e-12, 1e12)) { v =>
      val i = Sketches.ddBin(v, lnGamma)
      val rep = 2 * math.pow(gamma, i) / (gamma + 1)
      math.abs(rep - v) <= alpha * v * (1 + 1e-9)
    })
  }
}
