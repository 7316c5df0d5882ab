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

  /** Schema of the events table as read with nanosAsLong (ts = raw
    * nanos; streaming reads must supply the schema explicitly).
    */
  val eventsSchema: StructType = StructType(
    Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)
    )
  )

  /** Streaming source over a directory of events parquet files. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventsSchema)
      .parquet(dir)
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))

  /** Tumbling 1-hour windowed counts with a 2-hour watermark — late
    * rows beyond the watermark are dropped, state is bounded.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup: watermark bounds the dedup state so keys
    * older than the delay are evicted — unbounded-state dedup is the
    * classic streaming OOM. Keys default to the event id (at-least-once
    * source → exactly-once downstream).
    */
  def streamingDedup(events: DataFrame, keys: Seq[String] = Seq("event_id")): DataFrame =
    events.withWatermark("ts", "2 hours").dropDuplicates(keys)

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
  def clickPurchaseStreamJoin(events: DataFrame): DataFrame = {
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
      )
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
    * per-user session accumulation with an explicit processing-time
    * timeout — the hand-rolled analogue of session_window for when
    * session logic outgrows the built-in (e.g. value-dependent gaps).
    */
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class SessionOut(user_id: Long, session_start: Long, n_events: Int, total_value: Double)

  def sessionizeStateful(spark: SparkSession, events: DataFrame, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events
      .select(col("user_id"), col("ts").cast("long").as("ts_s"), col("value"))
      .as[(Long, Long, Double)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long, Double)], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_._2)
          var st     = state.getOption.orNull
          val out    = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { case (_, tsSec, v) =>
            val tsMs = tsSec * 1000
            if (st == null) st = SessionState(tsMs, tsMs, 1, v)
            else if (tsMs - st.last > gapMs) {
              out += SessionOut(user, st.start, st.n, st.total)
              st = SessionState(tsMs, tsMs, 1, v)
            } else st = st.copy(last = tsMs, n = st.n + 1, total = st.total + v)
          }
          if (st != null) state.update(st)
          out.iterator
      }
      .toDF()
  }
}
