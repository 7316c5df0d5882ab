package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Similarity

/** Streaming ANN serving over the STANDING IVF×PQ index — the online
  * half of the build-once/probe-many contract, mirroring how
  * [[IncrementalCuration]] consumes the semantic cell index: query
  * vectors arrive in micro-batches forever, and each batch is answered
  * against the persisted index with per-batch cost proportional to the
  * BATCH (centroids + codebooks + per-query ADC tables broadcast, the
  * bucketed code table joins on cell exchange-free). The index is
  * read-only here — ingest grows it through
  * [[Similarity.appendIvfPqIndex]], and a restarted serving job picks
  * up the appended state on its next trigger.
  *
  * AvailableNow keeps the job restartable/drainable; swap the trigger
  * for `ProcessingTime` in an always-on deployment — the per-batch
  * logic is identical.
  */
object AnnServing {

  /** Drain a (qid, embedding) query stream through the standing
    * `indexName` IVF×PQ index, writing per-query top-k answer rows
    * (qid, rnk, cand, adc) under `outPath`.
    *
    * Output is IDEMPOTENT per micro-batch: each batch overwrites its
    * own `batch=<id>/` subdirectory, so foreachBatch's at-least-once
    * replay (a crash after the write but before the checkpoint
    * commits, then a restart re-running the batch) re-overwrites the
    * same directory instead of appending duplicate answer rows — the
    * standard batchId-keyed exactly-once recipe for a non-transactional
    * sink. Readers see `batch` as a partition column.
    */
  def streamProbe(
      spark: SparkSession,
      queryStream: DataFrame,
      indexName: String,
      outPath: String,
      checkpoint: String,
      k: Int = 5,
      nProbe: Int = 4,
      excludeSelf: Boolean = false
  ): StreamingQuery =
    queryStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        Similarity
          .ivfPqProbe(
            spark,
            indexName,
            batch.select(col("qid"), col("embedding")),
            k,
            nProbe,
            excludeSelf
          )
          .write
          .mode(SaveMode.Overwrite)
          .parquet(s"$outPath/batch=$batchId")
      }
      .start()
}
