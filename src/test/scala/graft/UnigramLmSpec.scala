package graft

import graft.operators.UnigramLm

/** Unigram-LM tokenizer: Viterbi segmentation, hard-EM learning,
  * determinism, corpus invariants.
  */
class UnigramLmSpec extends SparkSpec {

  private def lpOf(pairs: (String, Long)*): java.util.HashMap[String, Double] = {
    val m   = new java.util.HashMap[String, Double]()
    val tot = pairs.map(_._2).sum.toDouble
    pairs.foreach { case (p, c) => m.put(p, math.log(math.max(c, 1L) / tot)) }
    m
  }

  test("viterbi picks the max-likelihood segmentation, not the greedy one") {
    // greedy longest-match would take "ab" + "c" + "d"; the model makes
    // "a" + "bcd" far more likely
    val lp = lpOf("a" -> 50L, "b" -> 1L, "c" -> 1L, "d" -> 1L, "ab" -> 2L, "bcd" -> 40L)
    assert(UnigramLm.viterbi("abcd", lp).toSeq == Seq("a", "bcd"))
  }

  test("viterbi tie-break prefers the longer trailing piece; unsegmentable input fails loudly") {
    // p("xy") == p("x")·p("y")·tot/… engineered equal-score tie: with
    // equal counts the single long piece always wins (one factor < 1
    // beats two)
    val lp = lpOf("x" -> 4L, "y" -> 4L, "xy" -> 4L)
    assert(UnigramLm.viterbi("xy", lp).toSeq == Seq("xy"))
    val ex = intercept[IllegalArgumentException](UnigramLm.viterbi("xz", lp))
    assert(ex.getMessage.contains("unsegmentable"))
  }

  test("learn keeps high-value substrings, stays char-closed, and respects the vocab bound") {
    val words = Array(("inter", 30L), ("internal", 20L), ("nation", 25L), ("international", 15L), ("q", 1L))
    val vocab = UnigramLm.learn(words, vocabSize = 8, seedSize = 64, emRounds = 3, minCount = 2L)
    val pieces = vocab.map(_._1).toSet
    // every character of the corpus survives as a piece
    "internalqo".foreach(ch => assert(pieces.contains(ch.toString), s"char $ch lost"))
    assert(vocab.count(_._1.length > 1) <= 8)
    // a frequent substring family must have produced at least one real multi-char piece
    assert(vocab.exists(p => p._1.length > 1 && p._2 > 0))
  }

  test("training is deterministic and the corpus encode round-trips under the trained vocab") {
    val a = UnigramLm.train(spark, sfDir).collect().toSeq
    val b = UnigramLm.train(spark, sfDir).collect().toSeq
    assert(a == b, "two trainings must be byte-identical")
    val row = graft.operators.Checks.unigramInvariants(spark, sfDir).collect().head
    assert(row.getLong(0) == 0L, "roundtrip violations")
    assert(row.getBoolean(1), "corpus must compress below the char baseline")
    assert(row.getBoolean(2), "every emitted piece must be in the vocabulary")
    assert(row.getBoolean(3), "every corpus char must be in the vocabulary")
  }
}
