package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{Dedup, Similarity}

/** Continuous corpus curation against STANDING dedup state — the shape
  * a production training-data pipeline actually runs: documents arrive
  * in batches forever, and each batch is admitted against everything
  * ever accepted, not against a one-shot snapshot.
  *
  * Standing state per index name (all bucketed parquet tables, so every
  * probe join is exchange-free on the index side and only the incoming
  * batch shuffles):
  *   - `{name}_digests` (digest): md5 of every accepted text — the
  *     exact-dedup index;
  *   - `{name}_bands` / `{name}_sigs` ([[Dedup.buildLshIndex]]): the
  *     MinHash-LSH near-dup index;
  *   - `{name}_sem_cells` / `{name}_sem_vecs` / `{name}_sem_centroids`
  *     ([[Similarity.buildSemanticIndex]]): the embedding near-dup
  *     index — present only when the corpus carries an `embedding`
  *     column.
  *
  * Batch admission ([[ingestBatch]]):
  *   1. intra-batch exact dedup (min-id keeper) + anti-join against the
  *      digest index — byte-identical re-uploads never reach the LSH
  *      probe;
  *   2. [[Dedup.incrementalMinhashLsh]] probe: a batch doc that
  *      near-dups the standing corpus (any arrival order) or a
  *      smaller-id batch sibling is dropped — each pair's `newcomer`;
  *   3. semantic tier (when the batch carries `embedding` and the index
  *      exists): [[Similarity.incrementalSemantic]] probe over the
  *      MinHash survivors — the paraphrase that shares no shingles but
  *      sits next to an accepted doc in embedding space is dropped
  *      here. Runs AFTER the lexical tiers so a doc whose only
  *      semantic partner was itself just rejected still survives
  *      (admission is sequential, the kept set is mutually clean);
  *   4. survivors' digests, signatures, AND cell assignments are
  *      APPENDED to the indexes (frozen quantizer — cells are assigned
  *      with the index's versioned centroids, never retrained),
  *      preserving the bucket layout.
  *
  * At 100 TB the cost per batch is proportional to the BATCH (plus
  * bucketed index scans) — the corpus itself is never re-read, which is
  * the entire point of keeping indexes instead of re-deduping the
  * world.
  */
object IncrementalCuration {

  /** Initialize standing state from a seed corpus (which is indexed
    * as-is, not self-deduped — curate the seed first if needed).
    */
  def initIndexes(
      corpus: DataFrame,
      name: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      buckets: Int = 32
  ): Unit = {
    Dedup.buildLshIndex(corpus, name, k, numHashes, bands, buckets = buckets)
    graft.sources.Bucketing.writeBucketedKeys(
      corpus.filter(col("text").isNotNull).select(md5(col("text")).as("digest")).distinct(),
      s"${name}_digests",
      buckets,
      Seq("digest")
    )
    if (corpus.columns.contains("embedding"))
      Similarity.buildSemanticIndex(
        corpus.filter(col("embedding").isNotNull).select(col("doc_id").as("vec_id"), col("embedding")),
        s"${name}_sem",
        buckets = buckets
      )
  }

  /** Admit one batch against the standing indexes; returns the accepted
    * rows (batch schema preserved) and appends their state to the
    * indexes. NULL-text rows are dropped (an ingest pipeline admits
    * content, and NULL is absence of content).
    */
  def ingestBatch(
      spark: SparkSession,
      batch: DataFrame,
      name: String,
      k: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      threshold: Double = 0.5,
      bucketCap: Int = 256,
      buckets: Int = 32,
      semThreshold: Double = 0.4
  ): DataFrame = {
    // 1. exact tier: intra-batch keeper, then anti-join the digest index
    val intraDeduped = Dedup.exactDedup(batch.filter(col("text").isNotNull))
    val fresh = intraDeduped
      .join(
        spark.table(s"${name}_digests"),
        md5(intraDeduped("text")) === col("digest"),
        "left_anti"
      )
      .localCheckpoint(eager = false) // consumed by probe + anti-join + append

    // 2. near-dup tier: drop each pair's `newcomer` (the batch-side
    // member — prior acceptances are immutable regardless of id order)
    val nearDupIds = Dedup
      .incrementalMinhashLsh(spark, name, fresh, k, numHashes, bands, threshold, bucketCap = bucketCap)
      .select(col("newcomer").as("doc_id"))
      .distinct()
    val lexicalOk = fresh.join(nearDupIds, Seq("doc_id"), "left_anti")

    // 3. semantic tier over the lexical survivors: the paraphrase dup
    // (no shared shingles, near-identical embedding) is dropped here.
    // Probing only survivors keeps admission sequential — a doc whose
    // sole semantic partner was itself just rejected still gets in.
    val hasSem = batch.columns.contains("embedding") &&
      spark.catalog.tableExists(s"${name}_sem_centroids")
    val admitted =
      if (!hasSem) lexicalOk
      else {
        val semDropIds = Similarity
          .incrementalSemantic(
            spark,
            s"${name}_sem",
            lexicalOk.filter(col("embedding").isNotNull).select(col("doc_id").as("vec_id"), col("embedding")),
            semThreshold,
            // coarse cells hold ~1/nCells of the corpus — far larger
            // than shingle buckets, so the skew cap floors at the
            // operator default while an uncapped run (the equivalence
            // checks) stays uncapped
            cellCap = bucketCap.max(4096)
          )
          .select(col("newcomer").as("doc_id"))
          .distinct()
        lexicalOk.join(semDropIds, Seq("doc_id"), "left_anti")
      }
    // EAGER checkpoint: the admission decision reads the index tables,
    // and step 4 appends to those same tables — materializing first
    // severs the plan from the tables so the append never reads its own
    // write target (and the decision is frozen before state mutates)
    val accepted = admitted.localCheckpoint()

    // 4. fold the survivors into the standing state
    Dedup.appendLshIndex(accepted, name, k, numHashes, bands, buckets = buckets)
    graft.sources.Bucketing.appendBucketedKeys(
      accepted.select(md5(col("text")).as("digest")).distinct(),
      s"${name}_digests",
      buckets,
      Seq("digest")
    )
    if (hasSem)
      Similarity.appendSemanticIndex(
        accepted.filter(col("embedding").isNotNull).select(col("doc_id").as("vec_id"), col("embedding")),
        s"${name}_sem",
        buckets = buckets
      )
    // The relation (file-listing) cache is PER SESSION, and under
    // foreachBatch the micro-batch Datasets belong to a CLONED session
    // — the append above refreshes the writer's cache, not this
    // session's, so without an explicit refresh every later probe reads
    // the index as it was at first use and silently admits near-dups.
    (Seq(s"${name}_bands", s"${name}_sigs", s"${name}_digests") ++
      (if (hasSem) Seq(s"${name}_sem_cells", s"${name}_sem_vecs") else Nil))
      .foreach(spark.catalog.refreshTable)
    accepted
  }

  /** Continuous substring-dedup REWRITE: each arriving micro-batch has
    * its duplicated spans cut against the gram statistics of
    * everything that arrived before it
    * ([[graft.operators.TextAnalysis.incrementalDedupSubstrings]]),
    * then its ORIGINAL grams fold into the standing index — so a
    * passage seen often enough across the stream's history is removed
    * from every later copy, keeping the earliest (canonical)
    * occurrence intact. The rewrite twin of [[streamIngest]]'s
    * admission: admission drops whole documents, this cuts the
    * duplicated region and keeps the rest.
    *
    * The cut decision is frozen (eager checkpoint) BEFORE the gram
    * append mutates the index — same read-then-append discipline as
    * [[ingestBatch]] — and the per-session relation cache is refreshed
    * for the probing session afterwards.
    */
  def streamSubstringDedup(
      spark: SparkSession,
      docsStream: DataFrame,
      indexName: String,
      outPath: String,
      checkpoint: String,
      k: Int = 3,
      minDocs: Int = 3
  ): StreamingQuery =
    docsStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        import graft.operators.TextAnalysis
        val cut = TextAnalysis
          .incrementalDedupSubstrings(spark, indexName, batch.filter(col("text").isNotNull), k, minDocs)
          .localCheckpoint()
        TextAnalysis.appendGramIndex(batch.filter(col("text").isNotNull), indexName, k)
        spark.catalog.refreshTable(s"${indexName}_gramdf")
        cut.write.mode(SaveMode.Append).parquet(outPath)
      }
      .start()

  /** Streaming wrapper: drain a document stream through [[ingestBatch]]
    * with AvailableNow — the restartable "curate what's new" job. Each
    * micro-batch is admitted against state that includes every prior
    * batch's survivors.
    */
  def streamIngest(
      spark: SparkSession,
      docsStream: DataFrame,
      name: String,
      outPath: String,
      checkpoint: String,
      threshold: Double = 0.5,
      bucketCap: Int = 256
  ): StreamingQuery =
    docsStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        ingestBatch(spark, batch, name, threshold = threshold, bucketCap = bucketCap)
          .write
          .mode(SaveMode.Append)
          .parquet(outPath)
      }
      .start()
}
