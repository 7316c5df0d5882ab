package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Unigram language-model subword tokenizer (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram model), hard-EM
  * edition: the second of the two production subword families, built
  * beside [[Bpe]] so the pipeline can train either. Where BPE grows a
  * vocabulary bottom-up by merging, the unigram model starts from an
  * over-complete substring vocabulary and SHRINKS it, keeping the
  * pieces a Viterbi segmentation actually uses.
  *
  * Scale split — identical stance to [[Bpe]] (and the PQ codebooks):
  * the corpus-sized work (word-frequency aggregation, per-document
  * encoding) is fully distributed; EM runs driver-side over the
  * bounded top-`maxWords` word-frequency table, which is the
  * sublinear state every production trainer operates on. The 100 TB
  * corpus is touched once by the distributed count and once by the
  * distributed encode.
  *
  * Determinism (the property every oracle here depends on): hard EM
  * uses Viterbi (argmax) segmentation, not expected counts — piece
  * counts are then INTEGER word-frequency sums, immune to float
  * summation order. The only floats are per-word DP scores computed
  * in a fixed left-to-right fold (deterministic IEEE on every JVM);
  * ties break by preferring the LONGER trailing piece, then the
  * lexicographically smaller one. Training twice is byte-identical
  * (spec-pinned), and [[encodeWord]] is the same function training
  * segments with, so encode ≡ training segmentation.
  */
object UnigramLm {

  final val MaxPieceLen = 6

  /** Viterbi-segment `word` under log-score `lp` (pieces absent from
    * the map are unusable; single chars are always present in a
    * closed vocabulary). Returns the argmax segmentation.
    */
  private[graft] def viterbi(word: String, lp: java.util.HashMap[String, Double]): Array[String] = {
    val n     = word.length
    val best  = Array.fill(n + 1)(Double.NegativeInfinity)
    val back  = Array.fill(n + 1)(-1) // start index of the piece ending here
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      // j ascends, incumbents win ties ⇒ on equal score the SMALLER j
      // (the longer trailing piece) is kept — the deterministic break
      var j = math.max(0, i - MaxPieceLen)
      while (j < i) {
        if (best(j) != Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          if (lp.containsKey(piece)) {
            val cand = best(j) + lp.get(piece)
            if (cand > best(i)) { best(i) = cand; back(i) = j }
          }
        }
        j += 1
      }
      i += 1
    }
    require(best(n) != Double.NegativeInfinity, s"unsegmentable word '$word' — vocabulary lost a character")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var k   = n
    while (k > 0) {
      val j = back(k)
      out += word.substring(j, k)
      k = j
    }
    out.reverse.toArray
  }

  /** Hard-EM training over a word-frequency table: seed with the
    * weighted top substrings (≤ [[MaxPieceLen]] chars, single chars
    * always kept for closure), then alternate Viterbi segmentation
    * and integer count re-estimation, pruning unused/rare pieces each
    * round. Returns (piece, cnt) for the final vocabulary, ordered
    * (cnt DESC, piece ASC), truncated to `vocabSize` with single
    * chars exempt from truncation.
    */
  private[graft] def learn(
      words: Array[(String, Long)],
      vocabSize: Int,
      seedSize: Int,
      emRounds: Int,
      minCount: Long
  ): Array[(String, Long)] = {
    // seed: every substring occurrence weighted by word frequency
    val seedCounts = new java.util.HashMap[String, Long]()
    for ((w, c) <- words) {
      var i = 0
      while (i < w.length) {
        var j = i + 1
        while (j <= math.min(w.length, i + MaxPieceLen)) {
          seedCounts.merge(w.substring(i, j), c, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
    }
    val chars = seedCounts.keySet().toArray(Array.empty[String]).filter(_.length == 1).toSet
    def top(counts: java.util.HashMap[String, Long], n: Int): Array[(String, Long)] = {
      val all = counts.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
        .map(e => (e.getKey, e.getValue))
      val multi = all
        .filter(_._1.length > 1)
        .sortBy { case (p, c) => (-c, p) }
        .take(n)
      val singles = all.filter(_._1.length == 1)
      (multi ++ singles).sortBy { case (p, c) => (-c, p) }
    }
    var vocab = top(seedCounts, seedSize)
    for (_ <- 1 to emRounds) {
      val lp  = new java.util.HashMap[String, Double]()
      val tot = vocab.map(_._2).sum.toDouble
      vocab.foreach { case (p, c) => lp.put(p, math.log(math.max(c, 1L) / tot)) } // max(c,1): count-0 closure chars must stay usable
      val counts = new java.util.HashMap[String, Long]()
      for ((w, c) <- words)
        viterbi(w, lp).foreach(p => counts.merge(p, c, (a, b) => a + b))
      // closure: a char never chosen by Viterbi must survive at count 0
      chars.foreach(ch => counts.merge(ch, 0L, (a, b) => a + b))
      vocab = counts.entrySet().toArray(Array.empty[java.util.Map.Entry[String, Long]])
        .map(e => (e.getKey, e.getValue))
        .filter { case (p, c) => p.length == 1 || c >= minCount }
        .sortBy { case (p, c) => (-c, p) }
    }
    val multi   = vocab.filter(_._1.length > 1).take(vocabSize)
    val singles = vocab.filter(_._1.length == 1)
    (multi ++ singles).sortBy { case (p, c) => (-c, p) }
  }

  /** Train on a corpus directory: distributed word count → bounded
    * top-`maxWords` table → driver-side hard EM. Output: (rank,
    * piece, cnt), rank 1-based in (cnt DESC, piece ASC) order.
    */
  def train(
      spark: SparkSession,
      dir: String,
      vocabSize: Int = 400,
      seedSize: Int = 4000,
      emRounds: Int = 3,
      maxWords: Int = 50000
  ): DataFrame = {
    import spark.implicits._
    require(maxWords <= 2000000, s"driver-side EM is bounded; got maxWords=$maxWords")
    val words = Bpe
      .wordCounts(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    learn(words, vocabSize, seedSize, emRounds, minCount = 2L).zipWithIndex
      .map { case ((p, c), i) => (i + 1L, p, c) }
      .toSeq
      .toDF("rank", "piece", "cnt")
  }

  /** Encode one word under a trained vocabulary — the SAME Viterbi
    * training used, so segmentations match training exactly.
    */
  private[graft] def encodeWord(word: String, vocab: Array[(String, Long)]): Array[String] = {
    val lp  = new java.util.HashMap[String, Double]()
    val tot = vocab.map(_._2).sum.toDouble
    vocab.foreach { case (p, c) => lp.put(p, math.log(math.max(c, 1L) / tot)) } // max(c,1): count-0 closure chars must stay usable
    viterbi(word, lp)
  }

  /** Distributed encoding: every (doc_id, word) token → its unigram
    * piece array. Same broadcast + per-partition memo shape as
    * [[Bpe.encodeDocs]] (the Zipfian cache-hit argument holds
    * unchanged).
    */
  def encodeDocs(spark: SparkSession, docs: DataFrame, vocab: DataFrame): DataFrame = {
    import spark.implicits._
    val vs = vocab.orderBy("rank").select("piece", "cnt").as[(String, Long)].collect()
    val bc = spark.sparkContext.broadcast(vs)
    val toks = TextJobs
      .tokenized(docs.select(col("doc_id"), col("text")), "text", "word")
      .select(col("doc_id").cast("long"), col("word"))
      .as[(Long, String)]
    toks
      .mapPartitions { it =>
        val vocabArr = bc.value
        val lp       = new java.util.HashMap[String, Double]()
        val tot      = vocabArr.map(_._2).sum.toDouble
        vocabArr.foreach { case (p, c) => lp.put(p, math.log(math.max(c, 1L) / tot)) }
        val memo = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, w) =>
          var t = memo.get(w)
          if (t == null) {
            t = viterbi(w, lp)
            memo.put(w, t)
          }
          (id, w, t)
        }
      }
      .toDF("doc_id", "word", "pieces")
  }

  /** Corpus-coverage statistics of the learned MULTI-char pieces over
    * the top-`topWords` word table: per piece, in how many distinct
    * top words it occurs and its total weighted occurrence count
    * (non-overlapping, counted by length arithmetic — pure integers,
    * so the DuckDB oracle replays it exactly from the dumped piece
    * table). This is the SQL-checkable validation surface for the
    * learned vocabulary: Viterbi itself argmaxes float log-probs (a
    * 1-ulp cross-engine hazard), but a piece table whose entries
    * cover the corpus with these exact integer counts is pinned
    * against both the dump and the raw corpus. The piece×word pairing
    * is a bounded MODEL×SAMPLE cross join (≤ vocabSize × topWords
    * rows, both sides tiny and broadcast) — never data×data.
    */
  def pieceCoverage(
      spark: SparkSession,
      dir: String,
      vocab: DataFrame,
      topWords: Int = 1000
  ): DataFrame = {
    val words = Bpe
      .wordCounts(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topWords)
      .select(col("word"), col("cnt"))
    val pieces = vocab.filter(length(col("piece")) > 1).select(col("rank"), col("piece"))
    pieces
      .crossJoin(broadcast(words))
      .withColumn(
        "occ",
        expr("CAST((length(word) - length(replace(word, piece, ''))) DIV length(piece) AS BIGINT)")
      )
      .groupBy("rank", "piece")
      .agg(
        count(when(col("occ") > 0L, 1)).as("n_words"),
        sum(col("occ") * col("cnt")).cast("long").as("total_occ")
      )
      .orderBy("rank")
  }
}
