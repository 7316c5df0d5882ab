package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer: merge learning, encoding, determinism. */
class BpeSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("learnMerges on the classic toy corpus reproduces the known merge sequence") {
    // Sennrich's running example family: counts force es > est-ish order;
    // here: low(5) lower(2) newest(6) widest(3)
    val words = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(words, 4).map(m => (m._1, m._2))
    // pair counts round 1: es=9, st=9, ... tie (e,s) vs (s,t) → lexicographic: (e,s)
    assert(merges(0) == ("e", "s"))
    assert(merges(1) == ("es", "t")) // est = 9 after es merged
    assert(merges.length == 4)
  }

  test("applyMerge is a left-to-right non-overlapping pass") {
    assert(Bpe.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(Bpe.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(Bpe.applyMerge(Array("x", "a", "b", "y", "a", "b"), "a", "b").toSeq == Seq("x", "ab", "y", "ab"))
  }

  test("encodeWord reproduces the training segmentation of every training word") {
    val words  = Array(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val merges = Bpe.learnMerges(words, 10).map(m => (m._1, m._2))
    // training applies merges in order to the corpus; encodeWord must agree
    words.foreach { case (w, _) =>
      var segs = w.map(_.toString).toArray
      merges.foreach { case (l, r) => segs = Bpe.applyMerge(segs, l, r) }
      assert(Bpe.encodeWord(w, merges).toSeq == segs.toSeq, s"word $w")
    }
  }

  test("training is deterministic: two runs produce byte-identical merge tables") {
    val a = Bpe.train(spark, sfDir, 50).collect().toSeq
    val b = Bpe.train(spark, sfDir, 50).collect().toSeq
    assert(a == b)
  }

  test("merge pair counts are the true weighted corpus pair frequencies at selection time (rank 1)") {
    val merges = Bpe.train(spark, sfDir, 1).collect()
    val (l, r, c) = (merges(0).getString(1), merges(0).getString(2), merges(0).getLong(3))
    // recompute rank-1 pair count distributedly from raw bigrams of chars
    val words = Bpe.wordCounts(Tables.documents(spark, sfDir)).as[(String, Long)]
    val pairCount = words
      .flatMap { case (w, n) => w.sliding(2).filter(_.length == 2).map(p => (p, n)) }
      .toDF("pair", "n")
      .filter(col("pair") === l + r)
      .agg(coalesce(sum("n"), lit(0L)))
      .head()
      .getLong(0)
    assert(c == pairCount, s"rank-1 merge ($l,$r) count $c vs corpus bigram count $pairCount")
  }

  test("corpus round trip and compression on real data (the check_bpe surface)") {
    val inv = graft.operators.Checks.bpeInvariants(spark, sfDir, numMerges = 64).head()
    assert(inv.getLong(0) == 0L)     // roundtrip_violations
    assert(inv.getBoolean(1))        // compressed
    assert(inv.getBoolean(2))        // vocab_closed
    assert(inv.getBoolean(3))        // merges_ok
  }

  test("tokenCounts: every document's BPE token count is <= its character token expansion") {
    val tc = Bpe.tokenCounts(spark, sfDir, numMerges = 32)
    val chars = graft.operators.TextJobs
      .tokenized(Tables.documents(spark, sfDir), "text", "word")
      .groupBy("doc_id")
      .agg(sum(length(col("word"))).as("n_chars"))
    val bad = tc.join(chars, "doc_id").filter(col("n_bpe_tokens") > col("n_chars"))
    assert(bad.isEmpty)
    assert(tc.count() > 0)
  }
}
