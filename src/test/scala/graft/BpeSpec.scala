package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrainer
import graft.operators.BpeTrainer.{EndOfWord, Merge}

/** BPE trainer (operators/BpeTrainer): the distributed loop must match an
  * in-memory reference implementation merge-for-merge — the closed form
  * that substitutes for a SQL oracle on an iterative-greedy algorithm —
  * plus determinism, frequency-scale invariance, and the encode
  * round-trip contract.
  */
class BpeSpec extends AnyFunSuite {
  import TestSession._

  /** Straight-line reference BPE on a word-frequency map (the subword-nmt
    * algorithm, ~20 lines, no Spark): same tie-break (count desc, then
    * (left, right) asc) as the trainer. */
  private def referenceBpe(wordFreq: Map[String, Long], rounds: Int, minFreq: Long = 2L): Seq[Merge] = {
    var vocab: Map[IndexedSeq[String], Long] =
      wordFreq.map { case (w, f) => (w.map(_.toString).toIndexedSeq :+ EndOfWord, f) }
    val out = collection.mutable.ArrayBuffer[Merge]()
    var continue = true
    while (continue && out.length < rounds) {
      val counts = collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
      vocab.foreach { case (syms, f) =>
        syms.zip(syms.tail).foreach(p => counts(p) += f)
      }
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }
        .headOption.filter(_._2 >= minFreq)
      best match {
        case None => continue = false
        case Some(((l, r), c)) =>
          out += Merge(out.length + 1, l, r, c)
          vocab = vocab.groupMapReduce(
            { case (syms, _) => BpeTrainer.applyMerge(syms, l, r) })(_._2)(_ + _)
      }
    }
    out.toSeq
  }

  private def docsOf(texts: Seq[String]) = {
    import TestSession.spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("distributed trainer matches the reference merge-for-merge on the paper corpus") {
    // the Sennrich et al. running example, plus noise words
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val docs = docsOf(Seq(corpus.mkString(" ")))
    val got = BpeTrainer.train(spark, docs, rounds = 10)
    val want = referenceBpe(corpus.groupBy(identity).map { case (w, g) => (w, g.size.toLong) }, 10)
    assert(got == want,
      s"merge sequences diverge:\n got: ${got.mkString("\n      ")}\nwant: ${want.mkString("\n      ")}")
    assert(got.nonEmpty && got.head.freq >= got.last.freq,
      "merge frequencies must be non-increasing (greedy argmax)")
  }

  test("training is deterministic and frequency-scale invariant") {
    val texts = Seq("the cat sat on the mat", "the bat sat on the cat", "a rat and a cat")
    val once = BpeTrainer.train(spark, docsOf(texts), rounds = 8)
    val again = BpeTrainer.train(spark, docsOf(texts), rounds = 8)
    assert(once == again, "same corpus, same merges — bit-deterministic")
    // 3x-duplicated corpus: same merge SEQUENCE, 3x the frequencies
    val tripled = BpeTrainer.train(spark, docsOf(texts ++ texts ++ texts), rounds = 8)
    assert(tripled.map(m => (m.left, m.right)) == once.map(m => (m.left, m.right)),
      "merge order must depend on relative frequencies only")
    assert(tripled.map(_.freq) == once.map(_.freq * 3))
  }

  test("encode round-trips: concatenated tokens reproduce the word") {
    val texts = Seq("internationalization international internal nation nationalize")
    val merges = BpeTrainer.train(spark, docsOf(texts), rounds = 12)
    assert(merges.nonEmpty)
    Seq("international", "nation", "internationalization").foreach { w =>
      val toks = BpeTrainer.encodeWord(w, merges)
      assert(toks.mkString("").stripSuffix(EndOfWord) == w,
        s"tokens $toks do not reassemble $w")
      assert(toks.last == EndOfWord || toks.mkString("").endsWith(EndOfWord))
    }
    // learned merges actually compress: fewer symbols than characters
    val before = "international".length + 1
    assert(BpeTrainer.encodeWord("international", merges).length < before)
  }

  test("minFreq floor stops the loop before singleton merges") {
    val texts = Seq("aa bb aa bb aa zz")
    val merges = BpeTrainer.train(spark, docsOf(texts), rounds = 50, minFreq = 3L)
    assert(merges.forall(_.freq >= 3L))
    assert(merges.length < 50, "loop must terminate on the frequency floor, not the round cap")
  }
}
