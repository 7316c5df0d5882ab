package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Change-data-capture apply operators: the write-side twin of
  * [[DataOps.snapshotDiff]]. A corpus at 100 TB is never rebuilt from
  * scratch — it receives change batches (upserts + deletes) that must
  * fold into the standing snapshot, and audited pipelines additionally
  * keep the full SCD2 version history (who changed, when, what was
  * current at any instant).
  *
  * Reference tie: the reference engine (SURVEY.md §1.1) has no notion
  * of mutation — every run re-reads the whole input directory. These
  * operators are the incremental generalization of that re-read, the
  * same stance as the standing retrieval/dedup indexes: pay one
  * key-partitioned join per batch instead of a full recompute.
  *
  * Scale notes: every operator here is a single equi-join + union on
  * the id column — one shuffle per side, broadcastable when the change
  * batch is small (the common case: daily deltas vs a 100 TB base),
  * exchange-free when base and batch are bucketed on the id. No
  * windows over the base, no driver-side state.
  */
object Cdc {

  /** MERGE INTO semantics: apply a change batch onto a snapshot.
    * Change rows carry the target schema plus a boolean `deleteCol`;
    * an id present in `changes` replaces (or removes) the target row,
    * any other target row survives untouched. With `seqCol` set, the
    * batch may carry several changes per id and the highest sequence
    * wins (ties broken by the delete flag, deletes last, so a
    * same-sequence upsert+delete resolves deterministically to the
    * delete).
    *
    * Result is the new snapshot — same schema as `target`. Applying
    * the same batch twice is idempotent (spec-pinned).
    */
  def mergeUpsert(
      target: DataFrame,
      changes: DataFrame,
      idCol: String,
      deleteCol: String = "__delete",
      seqCol: Option[String] = None
  ): DataFrame = {
    val latest = seqCol match {
      case None => changes
      case Some(sc) =>
        // delete flag desc: true sorts first, so a same-sequence
        // upsert+delete pair resolves to the delete
        val w = Window.partitionBy(idCol).orderBy(col(sc).desc, col(deleteCol).desc)
        changes
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1)
          .drop("__rn", sc)
    }
    val survivors = target.join(latest.select(col(idCol)), Seq(idCol), "left_anti")
    val upserts   = latest.filter(!col(deleteCol)).drop(deleteCol)
    survivors.unionByName(upserts.select(target.columns.map(col).toIndexedSeq: _*))
  }

  /** [[mergeUpsert]] with ADDITIVE schema evolution: the batch may
    * carry columns the target has never seen — the merged snapshot
    * gains them, with NULL backfill on every surviving pre-evolution
    * row (the lake-format evolution contract: old files stay valid,
    * readers see the widened schema). Strictly additive by design:
    * a batch MISSING a target column is rejected loudly — silently
    * null-filling an existing column on upserted rows would corrupt
    * data, the opposite of evolution. Column matching is by name
    * (case-sensitive), order-independent.
    */
  def mergeUpsertEvolving(
      target: DataFrame,
      changes: DataFrame,
      idCol: String,
      deleteCol: String = "__delete",
      seqCol: Option[String] = None
  ): DataFrame = {
    val changeCols = changes.columns.toSet -- Set(deleteCol) -- seqCol.toSet
    val missing    = target.columns.toSet -- changeCols
    require(
      missing.isEmpty,
      s"schema evolution is additive-only: batch is missing target columns ${missing.mkString(", ")}"
    )
    val newCols = (changeCols -- target.columns.toSet).toSeq.sorted
    val widenedTarget = newCols.foldLeft(target) { case (df, c) =>
      df.withColumn(c, lit(null).cast(changes.schema(c).dataType))
    }
    mergeUpsert(widenedTarget, changes, idCol, deleteCol, seqCol)
  }

  /** Open an SCD2 history from an initial snapshot: every row becomes
    * the first version, valid from `effDate`, open-ended
    * (`valid_to IS NULL` marks the current version).
    */
  def scd2Init(snapshot: DataFrame, idCol: String, attrCols: Seq[String], effDate: Column): DataFrame =
    snapshot.select(
      (col(idCol) +: attrCols.map(col)) ++ Seq(
        effDate.cast(DateType).as("valid_from"),
        lit(null).cast(DateType).as("valid_to")
      ): _*
    )

  /** The SCD2 read side: reconstruct the snapshot as of `asOf` — the
    * version whose interval covers the instant (`valid_from <= asOf <
    * valid_to`, open end = current). One filter, no join: this is why
    * SCD2 histories exist.
    */
  def scd2AsOf(history: DataFrame, asOf: Column): DataFrame =
    history
      .filter(col("valid_from") <= asOf.cast(DateType) && (col("valid_to").isNull || col("valid_to") > asOf.cast(DateType)))
      .drop("valid_from", "valid_to")

  /** Temporal (effective-dated) fact join — the SCD2 CONSUMPTION
    * pattern: each fact row joins the ONE dimension version whose
    * validity interval covers the fact's timestamp (`valid_from <= ts
    * < valid_to`, open end = current), so facts aggregate under the
    * attributes that were true WHEN THEY HAPPENED, not today's.
    *
    * Scale shape: a plain EQUI-join on the dimension key with the
    * interval test as a residual conjunct — versions per key are few
    * (bounded by change count), so fan-out is bounded and the join
    * partitions/broadcasts exactly like any fact-dim join; never a
    * range or nested-loop plan. Interval coverage is exclusive-end and
    * versions partition each key's timeline, so at most one version
    * matches per fact row (uniqueness inherited from the scd2Apply
    * invariants). Facts dated before their key's first version (or
    * with an unknown key) are dropped — inner semantics, documented.
    */
  def scd2FactJoin(fact: DataFrame, history: DataFrame, keyCol: String, tsCol: String): DataFrame = {
    val h = history.withColumnRenamed(keyCol, "__dim_key")
    fact.join(
      h,
      fact(keyCol) === h("__dim_key") &&
        h("valid_from") <= fact(tsCol).cast(DateType) &&
        (h("valid_to").isNull || fact(tsCol).cast(DateType) < h("valid_to"))
    ).drop("__dim_key", "valid_from", "valid_to")
  }

  /** Apply one change batch to an SCD2 history. A change row whose
    * attributes differ (null-safely, per attribute — no digest, so
    * NULL/absent can never collide) from the id's current version
    * closes that version at `effDate` and opens a new one; an
    * identical change row is a no-op; an unseen id opens its first
    * version. Ids absent from the batch are untouched — the batch is
    * a CHANGES feed, not a full snapshot, so absence means "no news",
    * never "deleted".
    *
    * History invariants preserved (spec-pinned): per-id intervals are
    * contiguous and non-overlapping, exactly one open version per id,
    * and sequentially applied batches reproduce the one-shot
    * derivation from the union of all observations.
    */
  def scd2Apply(history: DataFrame, changes: DataFrame, idCol: String, attrCols: Seq[String], effDate: Column): DataFrame = {
    val closedHist = history.filter(col("valid_to").isNotNull)
    val current    = history.filter(col("valid_to").isNull).withColumn("__pc", lit(1))
    val batch = changes
      .select(col(idCol) +: attrCols.map(c => col(c).as(s"__n_$c")): _*)
      .withColumn("__pn", lit(1))
    val j       = current.join(batch, Seq(idCol), "full")
    val changed = attrCols.map(c => !(col(c) <=> col(s"__n_$c"))).reduce(_ || _)
    val histCols = (col(idCol) +: attrCols.map(col)) ++ Seq(col("valid_from"), col("valid_to"))
    // current version survives: no change row, or a no-op change row
    val keep = j.filter(col("__pn").isNull || (col("__pc").isNotNull && !changed)).select(histCols: _*)
    // current version closed by a differing change row
    val closed = j
      .filter(col("__pc").isNotNull && col("__pn").isNotNull && changed)
      .select((col(idCol) +: attrCols.map(col)) ++ Seq(col("valid_from"), effDate.cast(DateType).as("valid_to")): _*)
    // new version opened: differing change, or first sighting of the id
    val opened = j
      .filter(col("__pn").isNotNull && (col("__pc").isNull || changed))
      .select(
        (col(idCol) +: attrCols.map(c => col(s"__n_$c").as(c))) ++ Seq(
          effDate.cast(DateType).as("valid_from"),
          lit(null).cast(DateType).as("valid_to")
        ): _*
      )
    closedHist.unionByName(keep).unionByName(closed).unionByName(opened)
  }

  /** Apply a MULTI-date change batch to an SCD2 history in ONE pass —
    * the backfill shape. Semantically identical to folding
    * [[scd2Apply]] once per distinct effective date in ascending order
    * (spec-pinned equivalence), but where the loop pays one full-outer
    * join over the ENTIRE history per date, this pays:
    *
    *   - one broadcast anti/semi join to split the current snapshot
    *     into untouched ids (carried over by reference, never
    *     shuffled — the 100 TB base) and touched ids (bounded by the
    *     batch's id set);
    *   - one window over touched-ids' seed rows + the batch, ordered
    *     (seed, then changes by effective date): a row OPENS a version
    *     iff it is the first observation of its id or differs
    *     null-safely from the previous observation — the lag-compare
    *     is exactly the loop's state compare, because a no-op row's
    *     attributes equal the state by definition;
    *   - one lead() to close each opened version at the next opening.
    *
    * An N-date backfill batch therefore costs the same as a 1-date
    * batch: two broadcast joins plus a window over batch-sized data.
    */
  def scd2ApplyBatch(
      history: DataFrame,
      changes: DataFrame,
      idCol: String,
      attrCols: Seq[String],
      effDateCol: String
  ): DataFrame = {
    val closedHist = history.filter(col("valid_to").isNotNull)
    val current    = history.filter(col("valid_to").isNull)
    val histCols   = (col(idCol) +: attrCols.map(col)) ++ Seq(col("valid_from"), col("valid_to"))
    val ids        = changes.select(col(idCol)).distinct()
    val untouched  = current.join(broadcast(ids), Seq(idCol), "left_anti").select(histCols: _*)
    val seed = current
      .join(broadcast(ids), Seq(idCol), "left_semi")
      .select((col(idCol) +: attrCols.map(col)) :+ col("valid_from"): _*)
      .withColumn("__src", lit(0))
    val obs = changes
      .select((col(idCol) +: attrCols.map(col)) :+ col(effDateCol).cast(DateType).as("valid_from"): _*)
      .withColumn("__src", lit(1))
    val w = Window.partitionBy(idCol).orderBy(col("__src"), col("valid_from"))
    // `!(a <=> lag(a))` is never NULL, so the first-row OR cannot be
    // poisoned; lag over a constant marker detects the first row
    // without confusing "no previous row" with "previous attr is NULL"
    val changedVsPrev = attrCols.map(c => !(col(c) <=> lag(col(c), 1).over(w))).reduce(_ || _)
    val opens         = lag(lit(1), 1).over(w).isNull || changedVsPrev
    val openings = seed
      .unionByName(obs)
      .withColumn("__open", opens)
      .filter(col("__open"))
    val versions = openings
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .select(histCols: _*)
    closedHist.unionByName(untouched).unionByName(versions)
  }
}
