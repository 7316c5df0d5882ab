package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.streaming.IncrementalCuration

/** Continuous curation against standing indexes: exact re-uploads are
  * rejected across batches, near-dups of anything previously accepted
  * are rejected, and the streaming (foreachBatch) wrapper reaches the
  * same final corpus invariants.
  */
class IncrementalCurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sfDir).select("doc_id", "text")

  test("sequential batches: exact re-uploads rejected, near-dups of prior state rejected, indexes grow") {
    val corpus = docs.filter(col("doc_id") < 300)
    val batch1 = docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
    // batch2 re-uploads batch1's first 20 texts under fresh ids
    val reuploads = batch1
      .filter(col("doc_id") < 320)
      .select((col("doc_id") + 10000).as("doc_id"), col("text"))
    val batch2 = docs.filter(col("doc_id") >= 400).unionByName(reuploads)

    IncrementalCuration.initIndexes(corpus, "t_cur")
    val acc1 = IncrementalCuration
      .ingestBatch(spark, batch1, "t_cur", bucketCap = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val acc2 = IncrementalCuration
      .ingestBatch(spark, batch2, "t_cur", bucketCap = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet

    assert(acc1.nonEmpty && acc2.nonEmpty)
    // every re-upload of an ACCEPTED batch1 text must be rejected in batch2
    val reupOfAccepted = reuploads
      .filter((col("doc_id") - 10000).isInCollection(acc1))
      .collect().map(_.getLong(0)).toSet
    assert(reupOfAccepted.nonEmpty, "test needs accepted batch1 docs re-uploaded")
    assert(reupOfAccepted.intersect(acc2).isEmpty, "exact re-upload of accepted text got re-admitted")

    // no two texts in the final accepted state share a digest with each
    // other or with the corpus (exact tier invariant, order-independent)
    val finalCorpus = corpus.unionByName(docs.unionByName(reuploads).filter(col("doc_id").isInCollection(acc1 ++ acc2)))
    val dupDigests = finalCorpus
      .filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count().filter(col("count") > 1)
      .count()
    // the seed corpus may contain internal dups (indexed as-is); only
    // pairs involving accepted docs violate the contract
    val corpusInternalDups = corpus
      .filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count().filter(col("count") > 1)
      .count()
    assert(dupDigests == corpusInternalDups, "an accepted doc duplicates prior state")

    // near-dup invariant: no uncapped LSH pair touches an accepted doc
    // except pairs wholly inside the seed corpus
    val offenders = Dedup
      .minhashNearDups(finalCorpus, bucketCap = Int.MaxValue)
      .filter(col("a").isInCollection(acc1 ++ acc2) || col("b").isInCollection(acc1 ++ acc2))
      .count()
    assert(offenders == 0, s"$offenders near-dup pairs touch accepted docs")

    // the digest index grew by exactly the accepted counts
    val nDigests = spark.table("t_cur_digests").count()
    val nCorpusD = corpus.filter(col("text").isNotNull).select(md5(col("text"))).distinct().count()
    assert(nDigests == nCorpusD + acc1.size + acc2.size)
  }

  test("semantic tier: planted paraphrase (unique text, duplicate embedding) rejected; far control admitted") {
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id").as("doc_id"), col("embedding"))
    val docsE  = docs.join(emb, Seq("doc_id"), "left")
    val corpus = docsE.filter(col("doc_id") < 300)
    // paraphrase: novel wording, corpus doc 42's exact embedding →
    // passes exact+MinHash, only the semantic tier can reject it.
    // control: novel wording, one-hot basis embedding (measured cos
    // < 0.36 vs every synthetic vector) → must be admitted.
    val planted = spark
      .createDataFrame(Seq(
        (900001L, "utterly novel wording concerning cerulean axolotl economics and moonlit ledgers"),
        (900002L, "unique control text about quaternion bagpipe thermodynamics and silent glaciers")
      ))
      .toDF("doc_id", "text")
      .join(emb.filter(col("doc_id") === 42).select(col("embedding").as("dup_emb")), lit(true))
      .select(
        col("doc_id"),
        col("text"),
        when(col("doc_id") === 900001L, col("dup_emb"))
          .otherwise(expr("transform(sequence(1, 64), i -> cast(if(i = 1, 1.0, 0.0) as float))"))
          .as("embedding")
      )
    val batch = docsE.filter(col("doc_id") >= 300 && col("doc_id") < 350).unionByName(planted)
    IncrementalCuration.initIndexes(corpus, "t_cur_sem")
    val acc = IncrementalCuration
      .ingestBatch(spark, batch, "t_cur_sem", bucketCap = Int.MaxValue)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!acc.contains(900001L), "paraphrase with duplicate embedding was admitted past the semantic tier")
    assert(acc.contains(900002L), "semantically-distant control was wrongly rejected")
    // the semantic index grew by the accepted vectors (2 cells each)
    assert(spark.table("t_cur_sem_sem_vecs").count() ==
      corpus.filter(col("embedding").isNotNull).count() + acc.size)
  }

  test("streaming substring-dedup rewrite: later arrivals lose passages the stream has seen enough") {
    import graft.operators.TextAnalysis
    val passage = "sigma lambda kappa iota theta eta"
    val mkDocs = (rows: Seq[(Long, String)]) => spark.createDataFrame(rows).toDF("doc_id", "text")
    // the standing corpus already carries the passage once (canonical
    // doc 1) — with minDocs=2 EVERY later stream occurrence is cut,
    // regardless of which micro-batch the file source serves first
    TextAnalysis.buildGramIndex(mkDocs(Seq((1L, s"seed owner $passage canonical copy"))), "t_gram_s")

    val streamDir = java.nio.file.Files.createTempDirectory("graft_sub_in")
    val outDir    = java.nio.file.Files.createTempDirectory("graft_sub_out").resolve("cut")
    val ckpt      = java.nio.file.Files.createTempDirectory("graft_sub_ck")
    // surroundings are fully distinct across docs so the ONLY hot
    // grams are the seeded passage's (a shared junction gram would be
    // cut or kept depending on micro-batch arrival order)
    mkDocs(Seq((10L, s"north winds $passage east rains")))
      .coalesce(1).write.parquet(streamDir.resolve("b1").toString)
    mkDocs(Seq((20L, s"south hills $passage west stones"), (21L, "unrelated novel content flows on")))
      .coalesce(1).write.parquet(streamDir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(mkDocs(Seq((0L, ""))).schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/*")
    val query = IncrementalCuration.streamSubstringDedup(
      spark, stream, "t_gram_s", outDir.toString, ckpt.toString, minDocs = 2)
    try query.awaitTermination()
    finally query.stop()

    val out = spark.read.parquet(outDir.toString).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(10L) == "north winds east rains", "corpus-owned passage must be cut from doc 10")
    assert(out(20L) == "south hills west stones", "corpus-owned passage must be cut from doc 20")
    assert(out(21L) == "unrelated novel content flows on")
  }

  test("streaming foreachBatch ingest reaches the same invariants") {
    val corpus = docs.filter(col("doc_id") < 300)
    IncrementalCuration.initIndexes(corpus, "t_cur_s")

    val streamDir = java.nio.file.Files.createTempDirectory("graft_cur_in")
    val outDir    = java.nio.file.Files.createTempDirectory("graft_cur_out").resolve("accepted")
    val ckpt      = java.nio.file.Files.createTempDirectory("graft_cur_ck")
    docs.filter(col("doc_id") >= 300 && col("doc_id") < 400)
      .coalesce(1).write.parquet(streamDir.resolve("b1").toString)
    docs.filter(col("doc_id") >= 400)
      .coalesce(1).write.parquet(streamDir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/*")
    val query = IncrementalCuration.streamIngest(
      spark, stream, "t_cur_s", outDir.toString, ckpt.toString, bucketCap = Int.MaxValue)
    try query.awaitTermination()
    finally query.stop()

    val accepted = spark.read.parquet(outDir.toString)
    val acceptedIds = accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedIds.nonEmpty)
    // exact invariant: accepted digests unique and disjoint from corpus
    val finalCorpus = corpus.unionByName(accepted)
    val corpusInternalDups = corpus.filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count().filter(col("count") > 1).count()
    val dupDigests = finalCorpus.filter(col("text").isNotNull)
      .groupBy(md5(col("text"))).count().filter(col("count") > 1).count()
    assert(dupDigests == corpusInternalDups)
    // near-dup invariant, order-independent
    val offenders = Dedup
      .minhashNearDups(finalCorpus, bucketCap = Int.MaxValue)
      .filter(col("a").isInCollection(acceptedIds) || col("b").isInCollection(acceptedIds))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(offenders.isEmpty, s"near-dup pairs touch accepted docs: ${offenders.mkString(", ")}")
  }
}
