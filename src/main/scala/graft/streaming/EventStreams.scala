package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}
import org.apache.spark.sql.types._

/** Structured Streaming surface: the batch event-time aggregations of
  * [[graft.operators.EventAnalytics]] as incremental streaming queries
  * with watermarks, plus a custom-state sessionizer via
  * `flatMapGroupsWithState`.
  *
  * The reference has no stream processing (its client→master gRPC
  * stream is pure transport, master.go:71-94), so this surface is part
  * of the engine's extended capability set; watermark + windowed state
  * is what bounds memory when the same queries run unbounded.
  */
object EventStreams {

  /** Streaming source over a directory of events parquet files.
    *
    * Streaming reads must supply the schema explicitly, but the
    * physical encoding of `ts` is not stable across testdata
    * regenerations (TIMESTAMP(NANOS)-as-BIGINT vs timestamp[us]) — so
    * the schema comes from a driver-side batch footer read of the same
    * path, and [[graft.Tables.normalizeEventTime]] adapts whichever
    * encoding showed up to the canonical (`ts` TIMESTAMP, `ts_ns`
    * LONG) pair.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val physical = spark.read.parquet(dir).schema
    graft.Tables.normalizeEventTime(spark.readStream.schema(physical).parquet(dir))
  }

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — late
    * rows beyond the watermark are dropped, state is bounded.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** Watermarked windowed top-k via the custom imperative aggregate
    * [[graft.functions.TopKAgg]]: per tumbling hour, the k
    * highest-value events. What this pins down: a custom
    * `TypedImperativeAggregate` is a MERGEABLE summary, so it composes
    * with streaming state exactly like the built-ins — each
    * micro-batch's partial buffer merges into the state store's, and
    * the window emits its bounded k-pair summary when the watermark
    * closes it. The window-FUNCTION formulation of top-k cannot run on
    * a stream at all (rank over an unbounded, still-growing partition
    * is not incremental); the bounded aggregate is the only shape that
    * can, which is the same reason it is the 100 TB batch shape.
    */
  def windowedTopK(events: DataFrame, k: Int = 3): DataFrame = {
    graft.GraftFunctions.register(events.sparkSession)
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(expr(s"topk_agg(value, event_id, $k)").as("top"))
      .select(col("window.start").as("ws"), posexplode(col("top")).as(Seq("i", "e")))
      .select(
        col("ws"),
        (col("i") + 1).cast("long").as("rnk"),
        col("e.id").as("event_id"),
        col("e.score").as("value")
      )
  }

  /** Streaming exact dedup: watermark bounds the dedup state so keys
    * older than the delay are evicted — unbounded-state dedup is the
    * classic streaming OOM. Keys default to the event id (at-least-once
    * source → exactly-once downstream).
    */
  def streamingDedup(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates(keys)

  /** EXACT streaming dedup: no watermark, so no late row is ever
    * dropped before reaching the state store and the kept key set
    * equals the batch `DISTINCT keys` regardless of how the source
    * splits into micro-batches (with a watermark, a key whose FIRST
    * arrival is late gets discarded and the stream under-counts vs
    * batch). The price is key-cardinality state — the right trade for
    * bounded key domains or backfill drains; for unbounded streams use
    * [[streamingDedup]]/[[streamingDedupWithinWatermark]].
    */
  def streamingDedupExact(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.dropDuplicates(keys)

  /** Watermark-SCOPED dedup (`dropDuplicatesWithinWatermark`): the
    * state-bounded production form. Plain dropDuplicates keeps every
    * key until its event-time window passes relative to the GLOBAL
    * watermark column semantics; the within-watermark variant
    * guarantees eviction once a key's last-seen time falls behind the
    * watermark, so redeliveries inside the delay are dropped and state
    * size is strictly bounded by the delay — the contract an
    * at-least-once source actually needs.
    */
  def streamingDedupWithinWatermark(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(keys)

  /** Start a memory-sink query (tests drive it with
    * processAllAvailable).
    */
  def startMemorySink(df: DataFrame, name: String, mode: OutputMode = OutputMode.Append): StreamingQuery =
    df.writeStream.outputMode(mode).format("memory").queryName(name).start()

  /** Stream-stream inner join: clicks joined to purchases of the same
    * user within the previous hour. Both sides carry watermarks and the
    * join condition bounds event-time distance, so Spark can evict
    * state — the unbounded-state stream join is the other classic
    * streaming OOM.
    */
  def clickPurchaseStreamJoin(events: DataFrame): DataFrame =
    clickPurchaseStreamJoinTyped(events, "inner")

  /** Stream-stream interval join with a caller-chosen type. The OUTER
    * variants are the semantically loaded ones: an unmatched left row
    * can only be emitted once the join is CERTAIN no match will ever
    * arrive — i.e. when the GLOBAL watermark (min across both sides)
    * passes the row's interval-condition expiry — so null-padded rows
    * trail the data by the watermark delay, and a test must advance
    * BOTH sides' event time to flush them (StreamingSpec does exactly
    * that). State stays bounded either way: rows expire from the join
    * state at watermark + interval, matched or not.
    */
  def clickPurchaseStreamJoinTyped(events: DataFrame, joinType: String): DataFrame = {
    val clicks = events
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "2 hours")
    val purchases = events
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user_id"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "2 hours")
    clicks.join(
      purchases,
      expr(
        """user_id = p_user_id
          |AND purchase_ts <= click_ts
          |AND purchase_ts >= click_ts - INTERVAL 1 HOUR""".stripMargin
      ),
      joinType
    )
  }

  /** Stream-static enrichment join: the streaming events join a static
    * dimension snapshot, broadcast fresh each micro-batch — stateless
    * (no watermark, no join state) because the static side is re-read,
    * which is exactly why this is THE production enrichment pattern:
    * dimension updates between batches are picked up for free.
    */
  def enrichWithCustomer(spark: SparkSession, events: DataFrame, dir: String): DataFrame =
    events.join(
      broadcast(
        graft.Tables
          .customer(spark, dir)
          .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      ),
      Seq("user_id"),
      "left"
    )

  /** foreachBatch + AvailableNow: incremental batch processing — drain
    * everything currently in the source in bounded micro-batches, apply
    * an arbitrary batch-DataFrame action (here: parquet append
    * partitioned by event_type), then stop. The restartable
    * "process-what's-new" shape of a production ingest job.
    */
  def drainToParquet(events: DataFrame, outPath: String, checkpoint: String): StreamingQuery =
    events.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write
          .mode("append")
          .partitionBy("event_type")
          .parquet(outPath)
      }
      .start()

  /** Custom stateful sessionization via flatMapGroupsWithState:
    * per-user session accumulation with an event-time timeout — the
    * hand-rolled analogue of session_window for when session logic
    * outgrows the built-in (e.g. value-dependent gaps).
    *
    * The timeout is what makes the output COMPLETE: each update arms a
    * timer at `last + gap`, so when the watermark passes it with no new
    * rows the open session provably cannot grow and is emitted on the
    * timeout invocation. Without it (NoTimeout) the last session of
    * every user sits in state forever — the output is silently short by
    * one session per user, and state never shrinks. In batch execution
    * timeouts never fire (there is no "later"), so the batch path emits
    * closed sessions only — [[sessionizeWindowed]]/session_window is
    * the batch-complete form.
    */
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Int, total_value: Double)

  def sessionizeStateful(spark: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    // the WATERMARKED timestamp column itself must reach the stateful
    // operator (casting it away strips the event-time metadata and
    // fails analysis) — truncation to seconds happens inside the lambda
    val typed = events
      .withWatermark("ts", "2 hours")
      .select(col("user_id"), col("ts"), col("value"))
      .as[(Long, java.sql.Timestamp, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Double)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new rows: the session
            // can never extend — emit it and free the state
            val st = state.get
            state.remove()
            Iterator.single(SessionOut(user, st.start, st.n, st.total))
          } else {
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            var st     = state.getOption.orNull
            val out    = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            sorted.foreach { case (_, ts, v) =>
              val tsMs = ts.getTime / 1000 * 1000
              if (st == null) st = SessionState(tsMs, tsMs, 1, v)
              else if (tsMs - st.last > gapMs) {
                out += SessionOut(user, st.start, st.n, st.total)
                st = SessionState(tsMs, tsMs, 1, v)
              } else st = st.copy(last = tsMs, n = st.n + 1, total = st.total + v)
            }
            if (st != null) {
              state.update(st)
              // rows passed the watermark filter, so last >= watermark
              // and the timestamp is legal (must exceed the watermark)
              state.setTimeoutTimestamp(st.last + gapMs)
            }
            out.iterator
          }
      }
      .toDF()
  }

  /** Sessionization via the BUILT-IN session_window — the declarative
    * twin of [[sessionizeStateful]] and the exact streaming form of the
    * batch [[graft.operators.EventAnalytics.sessionize]]: merging
    * session windows + watermark eviction come from Spark's native
    * state operator instead of hand-rolled GroupState. Append mode
    * emits a session once the watermark passes its close — the same
    * completeness contract the stateful version's timeout provides.
    */
  def sessionizeWindowed(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"), col("session_value"))
}
