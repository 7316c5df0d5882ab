package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.Cdc
import graft.sources.SnapshotTable

/** Continuous CDC apply: drain a stream of change batches
  * (upserts + deletes) into a [[SnapshotTable]] — the always-on form
  * of [[Cdc.mergeUpsert]], and the composition the ingest story needs:
  * every micro-batch commits one new ACID version of the table, so
  * downstream consumers read consistent snapshots (or time-travel to
  * any batch boundary) while the feed keeps flowing.
  *
  * Replay safety without a transaction coordinator: foreachBatch is
  * at-least-once, and [[Cdc.mergeUpsert]] is IDEMPOTENT by content —
  * re-applying a change batch to a snapshot that already folded it
  * reproduces the same content, so a post-restart replay commits a
  * redundant (but correct) version rather than corrupting the table.
  * The commit itself is a CAS overwrite pinned to the version the
  * batch read (`expectedBase`), so an out-of-band writer racing the
  * stream is detected loudly instead of silently lost.
  */
object ChangeFeed {

  /** Apply ONE change batch: read the current snapshot, fold, commit
    * with CAS. Exposed for the spec's replay-idempotence check.
    */
  def applyBatch(
      spark: SparkSession,
      tablePath: String,
      batch: DataFrame,
      idCol: String,
      deleteCol: String = "__delete",
      seqCol: Option[String] = None
  ): Long = {
    val base    = SnapshotTable.latestVersion(spark, tablePath)
    val current = SnapshotTable.read(spark, tablePath)
    val merged = Cdc
      .mergeUpsert(current, batch, idCol, deleteCol, seqCol)
      // materialize BEFORE the commit: the overwrite must not re-read
      // table files while replacing the manifest that references them
      .localCheckpoint(eager = true)
    SnapshotTable.overwrite(spark, tablePath, merged, expectedBase = Some(base))
  }

  /** Drain a change-batch stream into the table with AvailableNow —
    * the restartable "apply what's new" job.
    */
  def streamMerge(
      spark: SparkSession,
      changeStream: DataFrame,
      tablePath: String,
      idCol: String,
      checkpoint: String,
      deleteCol: String = "__delete",
      seqCol: Option[String] = None
  ): StreamingQuery =
    changeStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyBatch(spark, tablePath, batch.toDF(), idCol, deleteCol, seqCol)
        ()
      }
      .start()
}
