package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TextAnalysis

/** Streaming full-text retrieval over the STANDING BM25 postings index
  * — the text twin of [[AnnServing]]: search queries arrive in
  * micro-batches forever, each batch is answered against the persisted
  * index with cost proportional to the batch's query-term postings
  * (bucket-pruned scan + broadcast query relation), and the index is
  * read-only here — ingest grows it through
  * [[TextAnalysis.appendBm25Index]], a restarted serving job sees the
  * appended state on its next trigger.
  */
object RetrievalServing {

  /** Drain a (query_id, terms) query stream through the standing
    * `indexName` BM25 index, writing per-query top-k answer rows
    * (query_id, rnk, doc_id, score) under `outPath`.
    *
    * The batch's query set is collected to the driver before probing:
    * queries are human-issued search requests — a micro-batch holds at
    * most thousands of them, and materializing the term list as plan
    * LITERALS is what lets the postings scan bucket-prune (an `isin`
    * over literals prunes at planning time; a joined DataFrame of
    * terms cannot). This is a bounded-by-construction collect of
    * queries, never of data.
    *
    * Output is IDEMPOTENT per micro-batch — each batch overwrites its
    * own `batch=<id>/` subdirectory, the same batchId-keyed
    * exactly-once recipe as [[AnnServing.streamProbe]].
    */
  def streamBm25(
      spark: SparkSession,
      queryStream: DataFrame,
      indexName: String,
      outPath: String,
      checkpoint: String,
      k: Int = 5
  ): StreamingQuery =
    streamScored(spark, queryStream, outPath, checkpoint)(
      (qs, bid) => TextAnalysis.bm25IndexProbe(spark, indexName, qs, k)
    )

  /** Streaming Dirichlet-QL serving from the SAME standing index —
    * the second scorer gets the same online form as BM25 (a deployed
    * retrieval stack serves every scorer it offers from the index it
    * maintains). Identical micro-batch discipline: literal terms for
    * bucket pruning, batchId-keyed idempotent output.
    */
  def streamQl(
      spark: SparkSession,
      queryStream: DataFrame,
      indexName: String,
      outPath: String,
      checkpoint: String,
      k: Int = 5,
      mu: Double = 2000.0
  ): StreamingQuery =
    streamScored(spark, queryStream, outPath, checkpoint)(
      (qs, bid) => TextAnalysis.qlIndexProbe(spark, indexName, qs, k, mu)
    )

  /** Shared micro-batch drain: collect the batch's (bounded, human-
    * issued) query set to the driver as literals — an `isin` over
    * literals is what lets the postings scan bucket-prune; a joined
    * DataFrame of terms cannot prune at planning time — then answer
    * via `probe` and write idempotently under `batch=<id>/`.
    */
  private def streamScored(
      spark: SparkSession,
      queryStream: DataFrame,
      outPath: String,
      checkpoint: String
  )(probe: (Seq[(Int, Seq[String])], Long) => org.apache.spark.sql.DataFrame): StreamingQuery =
    queryStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // explicit int cast: a stream whose query_id arrives as LONG
        // (the natural id type elsewhere) would otherwise blow up with
        // a ClassCastException inside getInt at runtime
        val qs: Seq[(Int, Seq[String])] = batch
          .select(col("query_id").cast("int"), col("terms"))
          .collect()
          .toSeq
          .map(r => r.getInt(0) -> r.getSeq[String](1).toSeq)
        if (qs.nonEmpty)
          probe(qs, batchId)
            .write
            .mode(SaveMode.Overwrite)
            .parquet(s"$outPath/batch=$batchId")
      }
      .start()
}
