package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** End-to-end training-corpus curation: the composition every operator
  * in this engine exists to serve. One declarative plan from raw
  * documents to a split, deduplicated, quality-filtered corpus —
  * Catalyst sees the whole pipeline, so filters push into the scan and
  * stages fuse where possible.
  *
  * Stages: exact dedup → near-dup removal (MinHash-LSH, keep the
  * smallest doc_id of each candidate pair's component) → quality
  * filter → language tag → deterministic split.
  */
object CurationPipeline {

  def curate(
      spark: SparkSession,
      dir: String,
      minTokens: Long = 5,
      maxStopwordRatio: Double = 0.9,
      nearDupThreshold: Double = 0.8
  ): DataFrame = {
    val docs = Tables.documents(spark, dir)

    // 1. exact dedup (digest shuffle, min-id keeper)
    val exact = Dedup.exactDedup(docs)

    // 2. near-dup removal: from each LSH candidate pair above the
    // threshold, drop the larger id (greedy, deterministic; transitive
    // chains collapse toward the smallest id over the pair list).
    // Runs with the default LSH bucket cap: a bucket the cap drops
    // here is templated near-identical content whose pairs are
    // sacrificed for bounded cost — monitor via Dedup.hotBuckets and
    // raise bucketCap if that trade-off is wrong for the corpus.
    val losers = Dedup
      .minhashNearDups(exact, threshold = nearDupThreshold)
      .select(col("b").as("doc_id"))
      .distinct()
    val deduped = exact.join(losers, Seq("doc_id"), "left_anti")

    // 3. quality gates on token stats (recomputed post-dedup — the
    // scan is shared and pruned by Catalyst)
    val quality = TextJobs
      .tokenized(deduped.select("doc_id", "text"), "text", "tok")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("tok").isInCollection(TextAnalysis.stopEn), 1L).otherwise(0L)).as("n_stop")
      )
      .filter(col("n_tokens") >= minTokens && col("n_stop") / col("n_tokens") <= maxStopwordRatio)
      .select("doc_id")

    // 4. split + final projection
    deduped
      .join(quality, Seq("doc_id"), "left_semi")
      .withColumn("bucket", (col("doc_id") * 2654435761L) % 100)
      .withColumn(
        "split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "valid").otherwise("test")
      )
      .select("doc_id", "text", "lang", "source", "split")
  }

  /** Curate and persist partitioned by split — the handoff layout a
    * downstream trainer reads selectively.
    */
  def curateAndWrite(spark: SparkSession, dir: String, outPath: String): Unit =
    graft.sources.Sources.writeParquet(curate(spark, dir), outPath, partitionBy = Seq("split"))

  /** Curation with observed metrics: `observe()` attaches accumulator
    * aggregates to the existing plan, so the job reports output rows
    * and per-split counts WITHOUT a second pass — at 100 TB a
    * metrics-by-recount is a second 100 TB scan. Consume via
    * `org.apache.spark.sql.Observation.get` after any action on the
    * returned frame.
    */
  def curateObserved(
      spark: SparkSession,
      dir: String,
      observation: org.apache.spark.sql.Observation
  ): DataFrame =
    curate(spark, dir).observe(
      observation,
      count(lit(1)).as("rows_out"),
      sum(when(col("split") === "train", 1L).otherwise(0L)).as("rows_train"),
      sum(when(col("split") === "valid", 1L).otherwise(0L)).as("rows_valid"),
      sum(when(col("split") === "test", 1L).otherwise(0L)).as("rows_test")
    )
}
