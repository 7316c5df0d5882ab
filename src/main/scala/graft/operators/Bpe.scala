package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Byte-pair-encoding tokenizer training and encoding (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the real subword-tokenizer-building step of a training
  *-data pipeline, upgrading the whitespace/regex token counting the
  * quality scores use.
  *
  * Scale split (the same stance as the PQ codebooks' driver-side Lloyd
  * fit): the CORPUS-sized work — word-frequency aggregation and
  * per-document encoding — is fully distributed; merge LEARNING runs
  * driver-side over the bounded top-`maxWords` word-frequency table.
  * That bound is principled, not a shortcut: BPE training operates on
  * the word-frequency table (vocabulary grows ~sublinearly in corpus
  * size and frequency-truncating it is what every production BPE
  * trainer does), so the driver holds O(maxWords) state while the
  * 100 TB corpus is touched exactly once, by the distributed count.
  *
  * Determinism: pair selection breaks ties by (count DESC, left ASC,
  * right ASC); the word table is ordered (count DESC, word ASC) before
  * truncation. Training twice yields byte-identical merge tables
  * (spec-pinned), and encoding applies merges in learned order with
  * the SAME left-to-right application function training used, so the
  * encoder reproduces training segmentations exactly.
  */
object Bpe {

  /** Distributed word-frequency table: (word, cnt) under the engine's
    * reference tokenizer ([[TextJobs.TokenSep]]).
    */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    TextJobs
      .tokenized(docs.select(textCol), textCol, "word")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** One left-to-right greedy pass merging every non-overlapping
    * occurrence of `pair` — shared by training (corpus re-segmentation
    * after a merge is chosen) and encoding, which is what makes
    * encode ≡ training segmentation.
    */
  private[graft] def applyMerge(syms: Array[String], left: String, right: String): Array[String] = {
    val out    = Array.newBuilder[String]
    var i      = 0
    val merged = left + right
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == left && syms(i + 1) == right) {
        out += merged
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Learn `numMerges` merges from a word-frequency table. Returns the
    * ordered merge list; stops early when no adjacent pair occurs in
    * ≥ 2 weighted positions (merging a count-1 pair memorizes noise).
    */
  private[graft] def learnMerges(
      words: Array[(String, Long)],
      numMerges: Int
  ): Array[(String, String, Long)] = {
    var segs   = words.map { case (w, _) => w.map(_.toString).toArray }
    val counts = words.map(_._2)
    val out    = Array.newBuilder[(String, String, Long)]
    var k      = 0
    var done   = false
    while (k < numMerges && !done) {
      val pairCounts = new java.util.HashMap[(String, String), Long]()
      var i          = 0
      while (i < segs.length) {
        val s = segs(i)
        val c = counts(i)
        var j = 0
        while (j + 1 < s.length) {
          val p = (s(j), s(j + 1))
          pairCounts.merge(p, c, (a, b) => a + b)
          j += 1
        }
        i += 1
      }
      var best: ((String, String), Long) = (null, 0L)
      val it                             = pairCounts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val better = e.getValue > best._2 ||
          (e.getValue == best._2 && best._1 != null && {
            val cl = e.getKey._1.compareTo(best._1._1)
            cl < 0 || (cl == 0 && e.getKey._2.compareTo(best._1._2) < 0)
          })
        if (better) best = (e.getKey, e.getValue)
      }
      if (best._1 == null || best._2 < 2) done = true
      else {
        val (l, r) = best._1
        out += ((l, r, best._2))
        segs = segs.map(s => if (s.length < 2) s else applyMerge(s, l, r))
        k += 1
      }
    }
    out.result()
  }

  /** Train on a corpus directory: distributed word count → bounded
    * top-`maxWords` table → driver-side merge learning. Output:
    * (rank, left, right, pair_count), rank 1-based in learned order.
    */
  def train(spark: SparkSession, dir: String, numMerges: Int = 200, maxWords: Int = 50000): DataFrame = {
    import spark.implicits._
    require(maxWords <= 2000000, s"driver-side merge learning is bounded; got maxWords=$maxWords")
    val words = wordCounts(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)
      .as[(String, Long)]
      .collect()
    learnMerges(words, numMerges).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, c) }
      .toSeq
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Encode one word under the learned merges (rank order, same
    * application function as training). Exposed for the spec.
    */
  private[graft] def encodeWord(word: String, merges: Array[(String, String)]): Array[String] = {
    var syms = word.map(_.toString).toArray
    var i    = 0
    while (i < merges.length && syms.length >= 2) {
      syms = applyMerge(syms, merges(i)._1, merges(i)._2)
      i += 1
    }
    syms
  }

  /** Distributed encoding: every (doc_id, word) token of the corpus →
    * its BPE token array. The merge list rides a broadcast; a
    * per-partition word→tokens memo exploits the Zipfian repetition
    * (the cache hit rate IS the word-frequency skew), so the per-word
    * cost amortizes to a hash lookup.
    */
  def encodeDocs(spark: SparkSession, docs: DataFrame, merges: DataFrame): DataFrame = {
    import spark.implicits._
    val ms = merges
      .orderBy("rank")
      .select("left", "right")
      .as[(String, String)]
      .collect()
    val bc = spark.sparkContext.broadcast(ms)
    val toks = TextJobs
      .tokenized(docs.select(col("doc_id"), col("text")), "text", "word")
      .select(col("doc_id").cast("long"), col("word"))
      .as[(Long, String)]
    toks
      .mapPartitions { it =>
        val merges = bc.value
        val memo   = new java.util.HashMap[String, Array[String]]()
        it.map { case (id, w) =>
          var t = memo.get(w)
          if (t == null) {
            t = encodeWord(w, merges)
            memo.put(w, t)
          }
          (id, w, t)
        }
      }
      .toDF("doc_id", "word", "tokens")
  }

  /** Encode the corpus's top-`topWords` words (by cnt DESC, word ASC —
    * a total, cross-engine-replayable order) under freshly trained
    * merges: (word, toks, n_toks) with `toks` the space-joined
    * segmentation. This is the encode-replay surface the DuckDB oracle
    * verifies END-TO-END against the dumped merge table: the oracle
    * re-applies every merge in rank order with a bar-delimited
    * `replace` whose non-overlapping left-to-right semantics equal
    * [[applyMerge]] exactly (each match consumes only the INNER bars
    * of its boundary delimiters, so adjacent occurrences still merge —
    * `||a||a||a||a||` → `||aa||aa||`), making the learned model's
    * semantics — not just its bytes — hash-checkable cross-engine.
    */
  def encodeTopWords(
      spark: SparkSession,
      dir: String,
      merges: DataFrame,
      topWords: Int = 300
  ): DataFrame = {
    import spark.implicits._
    val ms = merges
      .orderBy("rank")
      .select("left", "right")
      .as[(String, String)]
      .collect()
    val bc = spark.sparkContext.broadcast(ms)
    wordCounts(Tables.documents(spark, dir))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topWords)
      .select("word")
      .as[String]
      .map { w =>
        val t = encodeWord(w, bc.value)
        (w, t.mkString(" "), t.length.toLong)
      }
      .toDF("word", "toks", "n_toks")
      .orderBy("word")
  }

  /** Per-document BPE token counts — the downstream budget/packing
    * input once a real tokenizer exists.
    */
  def tokenCounts(spark: SparkSession, dir: String, numMerges: Int = 200): DataFrame = {
    val docs   = Tables.documents(spark, dir)
    val merges = train(spark, dir, numMerges)
    encodeDocs(spark, docs, merges)
      .groupBy("doc_id")
      .agg(sum(size(col("tokens"))).cast("long").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }
}
