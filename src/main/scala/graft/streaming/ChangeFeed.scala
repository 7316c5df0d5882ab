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
    // without a sequence column there is no rule for picking among
    // several changes to one id — a dup-id batch would silently land
    // BOTH rows in the snapshot, so refuse loudly instead
    if (seqCol.isEmpty) requireUniqueIds(batch, idCol, "mergeUpsert batch (pass seqCol to allow multi-change batches)")
    val base    = SnapshotTable.latestVersion(spark, tablePath)
    val current = SnapshotTable.read(spark, tablePath)
    val merged = Cdc
      .mergeUpsert(current, batch, idCol, deleteCol, seqCol)
      // materialize BEFORE the commit: the overwrite must not re-read
      // table files while replacing the manifest that references them
      .localCheckpoint(eager = true)
    SnapshotTable.overwrite(spark, tablePath, merged, expectedBase = Some(base))
  }

  /** Apply ONE batch of SCD2 changes: rows carry an effective-date
    * column; a multi-day backfill batch lands as if the days had
    * arrived separately ([[Cdc.scd2ApplyBatch]] — ONE windowed pass
    * over seed + changes, not one history join per distinct date),
    * then the new history commits ONE version with CAS. Replays are
    * idempotent by content: re-applying identical changes trips the
    * no-op change detection and reproduces the history.
    */
  def applyScd2Batch(
      spark: SparkSession,
      tablePath: String,
      batch: DataFrame,
      idCol: String,
      attrCols: Seq[String],
      effDateCol: String
  ): Long = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val base = SnapshotTable.latestVersion(spark, tablePath)
    // a NULL effective date has no position in the version timeline —
    // applying it anywhere would be a guess, so refuse loudly
    require(
      batch.filter(col(effDateCol).cast("date").isNull).limit(1).isEmpty,
      s"SCD2 batch carries NULL $effDateCol values"
    )
    // two changes to one id AT THE SAME effective date have no defined
    // order; refuse loudly (one groupBy over the batch, not per-date)
    val dups = batch
      .groupBy(col(idCol), col(effDateCol).cast("date"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") > 1)
      .limit(5)
      .collect()
    require(dups.isEmpty, s"SCD2 batch carries multiple rows per (id, $effDateCol) (e.g. ${dups.map(_.get(0)).mkString(", ")})")
    val hist = Cdc.scd2ApplyBatch(SnapshotTable.read(spark, tablePath), batch, idCol, attrCols, effDateCol)
    SnapshotTable.overwrite(spark, tablePath, hist.localCheckpoint(eager = true), expectedBase = Some(base))
  }

  /** Continuous SCD2 maintenance: drain a change stream into a
    * graft-log history table — every batch commits one ACID version
    * of the full history, so `versionAsOf` reproduces the history as
    * of any batch boundary.
    */
  def streamScd2(
      spark: SparkSession,
      changeStream: DataFrame,
      tablePath: String,
      idCol: String,
      attrCols: Seq[String],
      effDateCol: String,
      checkpoint: String
  ): StreamingQuery =
    changeStream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        applyScd2Batch(spark, tablePath, batch.toDF(), idCol, attrCols, effDateCol)
        ()
      }
      .start()

  private def requireUniqueIds(df: DataFrame, idCol: String, what: String): Unit = {
    import org.apache.spark.sql.functions.{col, count, lit}
    val dups = df.groupBy(col(idCol)).agg(count(lit(1)).as("n")).filter(col("n") > 1).limit(5)
    val bad  = dups.collect()
    require(bad.isEmpty, s"$what carries multiple rows per id (e.g. ${bad.map(_.get(0)).mkString(", ")})")
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
