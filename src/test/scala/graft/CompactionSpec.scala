package graft

import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Compaction coverage for the standing-index families beyond BM25 and
  * the dedup gram index (those live in TextAnalysisSpec): LSH bands,
  * semantic cells, IVF×PQ codes, phrase grams. Contract per family:
  * the probe is byte-identical before/after compaction, the file count
  * folds (appends leave small files per bucket; compaction resets
  * them), and the write-aside-then-swap protocol recovers a crash
  * between drop and rename (shared implementation —
  * [[graft.sources.Bucketing.swapInCompacted]] — so one adoption test
  * per distinct table-shape family suffices alongside the BM25 one).
  */
class CompactionSpec extends SparkSpec {

  test("compactLshIndex: incremental probe identical before/after, files folded") {
    val docs  = Tables.documents(spark, sfDir).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    Dedup.buildLshIndex(docs.filter(col("doc_id") % 10 === 1), "t_lsh_cpt")
    Dedup.appendLshIndex(docs.filter(col("doc_id") % 10 > 1), "t_lsh_cpt")
    val filesBefore = spark.table("t_lsh_cpt_bands").inputFiles.length
    val before      = Dedup.incrementalMinhashLsh(spark, "t_lsh_cpt", batch).collect().toSeq
    Dedup.compactLshIndex(spark, "t_lsh_cpt")
    val after = Dedup.incrementalMinhashLsh(spark, "t_lsh_cpt", batch).collect().toSeq
    assert(after == before, "compaction changed LSH probe results")
    val filesAfter = spark.table("t_lsh_cpt_bands").inputFiles.length
    assert(filesAfter < filesBefore, s"bands files not folded: $filesBefore -> $filesAfter")
  }

  test("compactSemanticIndex: incremental probe identical before/after, files folded") {
    val e     = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val batch = e.filter(col("vec_id") % 10 === 0)
    Similarity.buildSemanticIndex(e.filter(col("vec_id") % 10 === 1), "t_sem_cpt")
    Similarity.appendSemanticIndex(e.filter(col("vec_id") % 10 > 1), "t_sem_cpt")
    val filesBefore = spark.table("t_sem_cpt_cells").inputFiles.length
    val before      = Similarity.incrementalSemantic(spark, "t_sem_cpt", batch).collect().toSeq
    Similarity.compactSemanticIndex(spark, "t_sem_cpt")
    val after = Similarity.incrementalSemantic(spark, "t_sem_cpt", batch).collect().toSeq
    assert(after == before, "compaction changed semantic probe results")
    val filesAfter = spark.table("t_sem_cpt_cells").inputFiles.length
    assert(filesAfter < filesBefore, s"cells files not folded: $filesBefore -> $filesAfter")
  }

  test("compactIvfPqIndex: probe identical before/after, files folded, geometry intact") {
    val e       = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val queries = e.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("embedding"))
    Similarity.buildIvfPqIndex(e.filter(col("vec_id") % 10 =!= 0), "t_ivfpq_cpt")
    Similarity.appendIvfPqIndex(e.filter(col("vec_id") % 10 === 0), "t_ivfpq_cpt")
    val filesBefore = spark.table("t_ivfpq_cpt_codes").inputFiles.length
    val before      = Similarity.ivfPqProbe(spark, "t_ivfpq_cpt", queries, excludeSelf = true).collect().toSeq
    Similarity.compactIvfPqIndex(spark, "t_ivfpq_cpt")
    val after = Similarity.ivfPqProbe(spark, "t_ivfpq_cpt", queries, excludeSelf = true).collect().toSeq
    assert(after == before, "compaction changed IVF×PQ probe results")
    val filesAfter = spark.table("t_ivfpq_cpt_codes").inputFiles.length
    assert(filesAfter < filesBefore, s"codes files not folded: $filesBefore -> $filesAfter")
  }

  test("compactPhraseIndex: probe identical before/after, rows folded to one per (gram, doc)") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    TextAnalysis.buildPhraseIndex(docs.filter(col("doc_id") % 3 === 0), "t_phrase_cpt")
    TextAnalysis.appendPhraseIndex(docs.filter(col("doc_id") % 3 === 1), "t_phrase_cpt")
    TextAnalysis.appendPhraseIndex(docs.filter(col("doc_id") % 3 === 2), "t_phrase_cpt")
    val before = TextAnalysis.phraseIndexSearch(spark, "t_phrase_cpt").collect().toSeq
    TextAnalysis.compactPhraseIndex(spark, "t_phrase_cpt")
    val after = TextAnalysis.phraseIndexSearch(spark, "t_phrase_cpt").collect().toSeq
    assert(after == before, "compaction changed phrase probe results")
    // appends can duplicate a (g, doc_id) only across disjoint doc
    // batches — they can't here — but the fold still guarantees one
    // row per pair afterwards; assert it held
    val grams = spark.table("t_phrase_cpt_grams")
    assert(grams.groupBy("g", "doc_id").count().filter(col("count") > 1).count() == 0,
      "multi-row (gram, doc) pairs remain after compaction")
  }

  test("LSH compaction swap recovery: a surviving __cpt copy is adopted on the next run") {
    val docs  = Tables.documents(spark, sfDir).select("doc_id", "text")
    val batch = docs.filter(col("doc_id") % 10 === 0)
    Dedup.buildLshIndex(docs.filter(col("doc_id") % 10 =!= 0), "t_lsh_rec")
    val before = Dedup.incrementalMinhashLsh(spark, "t_lsh_rec", batch).collect().toSeq
    // simulate a crash in the swap window: the live bands table is
    // gone, the complete copy survives only under __cpt
    spark.sql("ALTER TABLE t_lsh_rec_bands RENAME TO t_lsh_rec_bands__cpt")
    assert(!spark.catalog.tableExists("t_lsh_rec_bands"))
    Dedup.compactLshIndex(spark, "t_lsh_rec")
    val after = Dedup.incrementalMinhashLsh(spark, "t_lsh_rec", batch).collect().toSeq
    assert(after == before, "recovered LSH index diverged")
  }
}
