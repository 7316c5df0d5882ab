package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Classify

/** Standing-model classifier serving: score an incoming document
  * stream against a fitted [[Classify.NbModel]] in bounded
  * micro-batches (foreachBatch + AvailableNow — the
  * [[EventStreams.drainToParquet]] ingest shape with scoring fused
  * in). Because NB scoring is per-doc independent
  * ([[Classify.nbScore]]), the drained output is micro-batch-invariant
  * and equals the batch classification of the same corpus — which is
  * exactly what lets the `nb_stream_classify` oracle reuse the batch
  * oracle.
  *
  * Scale: the model relations are the standing state (cache them);
  * each micro-batch pays one token-join against the model and a
  * per-doc window — no stream-side global state, so state size is
  * O(model), not O(stream).
  */
object ClassifyServing {

  def classifyStream(
      docsStream: DataFrame,
      model: Classify.NbModel,
      outPath: String,
      checkpoint: String
  ): StreamingQuery =
    docsStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        Classify.nbScore(model, batch).write.mode("append").parquet(outPath)
      }
      .start()
}
