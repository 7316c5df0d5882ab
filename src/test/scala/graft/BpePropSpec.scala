package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.Bpe

/** Property-based BPE invariants over arbitrary letter corpora. */
class BpePropSpec extends SparkSpec {

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val word: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.alphaChar).map(_.mkString))

  private val corpus: Gen[Array[(String, Long)]] =
    Gen
      .chooseNum(1, 30)
      .flatMap(n => Gen.listOfN(n, Gen.zip(word, Gen.chooseNum(1L, 20L))))
      .map(_.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }.toArray.sortBy(_._1))

  test("applyMerge preserves the character stream exactly") {
    checkProp(Prop.forAll(corpus, word, word) { (_, l, r) =>
      val syms = (l + r + l).map(_.toString).toArray
      Bpe.applyMerge(syms, l.take(1), r.take(1)).mkString == syms.mkString
    })
  }

  test("every trained word round-trips through encodeWord under its own model") {
    checkProp(Prop.forAll(corpus) { ws =>
      val merges = Bpe.learnMerges(ws, 50).map(m => (m._1, m._2))
      ws.forall { case (w, _) => Bpe.encodeWord(w, merges).mkString == w }
    })
  }

  test("encoding length is non-increasing in the number of merges applied") {
    checkProp(Prop.forAll(corpus, word) { (ws, w) =>
      val merges = Bpe.learnMerges(ws, 50).map(m => (m._1, m._2))
      val lens   = (0 to merges.length).map(k => Bpe.encodeWord(w, merges.take(k)).length)
      lens.zip(lens.tail).forall { case (a, b) => b <= a }
    })
  }

  test("merge learning is independent of word-table order") {
    checkProp(Prop.forAll(corpus) { ws =>
      Bpe.learnMerges(ws, 50).toSeq == Bpe.learnMerges(ws.reverse, 50).toSeq
    })
  }
}
