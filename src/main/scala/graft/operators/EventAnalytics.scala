package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Event-stream analytics over the `events` table: JSON extraction,
  * tumbling/sliding event-time windows, session windows. These run in
  * batch here; [[graft.streaming.EventStreams]] exposes the same
  * aggregations as Structured Streaming queries with watermarks.
  *
  * At scale: all of these aggregate after a single shuffle on the
  * grouping key; sliding windows expand each row into (len/slide)
  * window assignments *before* the partial aggregate, so the combiner
  * still collapses them map-side.
  */
object EventAnalytics {

  /** JSON scalar extraction from the `props` column — both the
    * path-extraction form (get_json_object) and the parsed-struct form
    * (from_json to a typed map).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"),
        element_at(from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.IntegerType)), "k").as("k_parsed"),
        col("event_type")
      )
      .orderBy("event_id")

  /** Malformed-record quarantine: parse the JSON payload and route
    * rows a strict parse rejects to a side channel instead of failing
    * the job or silently nulling fields — the ingestion hygiene every
    * real feed needs (a 100 TB pipeline cannot stop for one bad
    * producer, and dropping bad rows silently is worse). Corruption is
    * PLANTED deterministically here (every 97th event's payload gets a
    * LEADING brace — trailing garbage after a complete object is
    * tolerated by Spark's Jackson parser, so it wouldn't corrupt)
    * because the synthetic feed is all-valid; the routing logic is
    * exactly what production runs.
    */
  def jsonQuarantine(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .withColumn(
        "payload",
        when(col("event_id") % 97 === 0, concat(lit("{"), col("props"))).otherwise(col("props"))
      )
      .withColumn(
        "parsed",
        from_json(
          col("payload"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.IntegerType
          )
        )
      )
      .withColumn("route", when(col("parsed").isNull, "quarantine").otherwise("ok"))
      .groupBy("route")
      .agg(count(lit(1)).as("n"), sum(element_at(col("parsed"), "k").cast("long")).as("sum_k"))
      .orderBy("route")

  /** Aggregate over a JSON-extracted field. */
  def jsonAggregate(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("event_type")
      .agg(
        sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"),
        count(lit(1)).as("n")
      )
      .orderBy("event_type")

  /** Tumbling 1-hour event-time windows per event type. */
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("total_value"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"), col("total_value"))
      .orderBy("ws", "event_type")

  /** Daily event-count anomalies — the pipeline-health alarm ("did
    * ingest double or halve today?") — flagged WITHOUT any float: the
    * z-score test |x−μ| > 2σ over integer daily counts is cleared of
    * denominators into (n·x − S)²·(n−1) > 4·n·(n·Σx² − S²), pure
    * 64-bit integer algebra on both engines, so the boundary can
    * never flip on a summation-order ulp the way a float z-score
    * comparison can. One aggregation for the daily series, one for
    * the corpus moments (a broadcast single row).
    */
  def dailyCountAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(spark, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val moments = daily.agg(
      count(lit(1)).as("n"),
      sum("x").as("s"),
      sum(col("x") * col("x")).as("ss")
    )
    daily
      .crossJoin(broadcast(moments))
      .withColumn(
        "is_anomaly",
        (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")) * (col("n") - 1L) >
          lit(4L) * col("n") * (col("n") * col("ss") - col("s") * col("s"))
      )
      .select(col("day"), col("x").as("n_events"), col("is_anomaly"))
      .orderBy("day")
  }

  /** LOCF gap imputation (last observation carried forward): NULL
    * sensor/metric readings take the user's most recent non-NULL
    * value in event-time order — the standard telemetry repair before
    * any windowed aggregate (a NULL-skipping mean silently reweights
    * toward chatty periods). Leading NULLs (no prior observation)
    * stay NULL — inventing a value would be imputation fiction. One
    * user-partitioned running window, `last(ignoreNulls)` — values
    * are COPIED, never computed, so doubles replay bit-exactly. The
    * demo plants NULLs deterministically (event_id % 5 = 0) so both
    * engines repair the identical holes.
    */
  def fillForward(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("user_id")
      .orderBy("ts_ns", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(spark, dir)
      .withColumn("v", when(col("event_id") % 5 === 0, lit(null)).otherwise(col("value")))
      .withColumn("v_filled", last("v", ignoreNulls = true).over(w))
      .select(col("event_id"), col("user_id"), col("v"), col("v_filled"))
      .orderBy("event_id")
  }

  /** Trailing 7-day MOVING MEDIAN of the daily counts — the robust
    * smoother dashboards plot instead of the mean (one outage day
    * drags a moving average for a week; the median shrugs). Spark has
    * no median window aggregate; over the calendar-bounded daily
    * series the exact form is array-local: sort the trailing
    * `collect_list` frame and index the lower median — integer in,
    * integer out, identical in any engine with list functions.
    * Partial leading windows use the days available (standard
    * dashboard semantics). The window is global but its input is the
    * DAILY relation — calendar-bounded at any corpus size (the raw
    * stream contributes one aggregate), same stance as
    * [[theilSenTrendOn]].
    */
  def movingMedianDaily(spark: SparkSession, dir: String): DataFrame =
    movingMedianDailyOn(Tables.events(spark, dir))

  /** [[movingMedianDaily]] core over an explicit relation with `ts`. */
  def movingMedianDailyOn(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy("day").rowsBetween(-6, 0)
    ev.groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("arr", array_sort(collect_list("x").over(w)))
      .withColumn("med7", expr("element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))"))
      .select(col("day"), col("x").as("n_events"), col("med7"))
      .orderBy("day")
  }

  /** Trailing EWMA (α = 1/4, 8-day horizon) of the daily counts in
    * EXACT fixed-point: weight on day-lag ℓ is (3/4)^ℓ, cleared of
    * denominators as 3^ℓ·4^(7−ℓ), so the smoother is an exact
    * num/den BIGINT pair (the only float is the final int/int
    * quotient — identical IEEE division in any engine).
    *
    * Lag is measured in CALENDAR DAYS, not series rows: each daily
    * row is exploded onto the 8 target days it influences and the
    * targets aggregate — gap days neither contribute phantom zeros
    * nor shift everyone's lags the way a rows-frame would. One
    * explode (×8, calendar-bounded) + one aggregate; no window over
    * data at all, so it scales as the daily directory, not the rows.
    */
  def ewmaDaily(spark: SparkSession, dir: String): DataFrame =
    ewmaDailyOn(Tables.events(spark, dir))

  /** [[ewmaDaily]] core over an explicit relation with `ts`. */
  def ewmaDailyOn(ev: DataFrame): DataFrame = {
    val horizon = 8
    val weights = (0 until horizon).map(l => math.pow(3, l).toLong << (2 * (horizon - 1 - l)))
    val daily = ev.groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("x"))
    val contrib = daily
      .select(col("day"), col("x"), explode(sequence(lit(0), lit(horizon - 1))).as("lag"))
      .select(
        date_add(col("day"), col("lag")).as("day"),
        col("x"),
        element_at(array(weights.map(lit): _*), col("lag") + 1).as("w")
      )
    val agg = contrib
      .groupBy("day")
      .agg(sum(col("x") * col("w")).as("ewma_num"), sum("w").as("ewma_den"))
    // inner join back to the observed days: contributions exploded
    // onto gap days / past the series end are definitionally dropped
    daily
      .join(agg, "day")
      .select(
        col("day"),
        col("x").as("n_events"),
        col("ewma_num"),
        col("ewma_den"),
        (col("ewma_num").cast("double") / col("ewma_den")).as("ewma")
      )
      .orderBy("day")
  }

  /** Theil–Sen robust trend over the daily count series: the median
    * of all pairwise slopes (x_j − x_i)/(t_j − t_i) — a 29%-breakdown
    * trend estimate one outlier day cannot drag, where least squares
    * folds at a single spike. Slopes stay EXACT RATIONALS
    * (integer numerator/denominator); the median is selected by
    * ordering on the int/int double quotient (identical in any
    * engine) with (num, den) tie-breaks, and the winning slope is
    * reported as its exact pair plus the quotient. The pair space is
    * days², not rows² — the series is calendar-bounded, so the
    * self-join is a few hundred rows at any corpus size; the raw
    * stream contributes one daily aggregate.
    */
  def theilSenTrend(spark: SparkSession, dir: String): DataFrame =
    theilSenTrendOn(Tables.events(spark, dir))

  /** [[theilSenTrend]] core over an explicit relation carrying `ts`. */
  def theilSenTrendOn(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val idx = daily
      .withColumn("t", (row_number().over(Window.orderBy("day")) - 1).cast("long"))
      .localCheckpoint(eager = false)
    val slopes = idx
      .as("a")
      .join(idx.as("b"), col("a.t") < col("b.t"))
      .select((col("b.x") - col("a.x")).as("num"), (col("b.t") - col("a.t")).as("den"))
    val ranked = slopes
      .withColumn("rn", row_number().over(Window.orderBy(col("num").cast("double") / col("den"), col("num"), col("den"))).cast("long"))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()).cast("long"))
    ranked
      .filter(col("rn") === expr("(m + 1) DIV 2"))
      .crossJoin(broadcast(idx.agg(count(lit(1)).as("n_days"))))
      .select(
        col("n_days"),
        col("m").as("n_pairs"),
        col("num").as("med_num"),
        col("den").as("med_den"),
        (col("num").cast("double") / col("den")).as("slope")
      )
  }

  /** Weekday-seasonal anomaly detection — [[dailyCountAnomalies]]'
    * z-test run WITHIN each day-of-week cohort, so a naturally quiet
    * Sunday is judged against Sundays, not against the weekday mean
    * (the first seasonality any ops series has; comparing against the
    * global mean flags every weekend as an outage). Same
    * denominator-cleared PURE-INTEGER form so the flag can never flip
    * on a summation-order ulp: |x−μ_w| > 2σ_w ⟺
    * (n·x−S)²(n−1) > 4n(nQ−S²) with per-weekday n, S = Σx, Q = Σx².
    * One daily aggregate + one 7-row weekday-moment aggregate joined
    * back by weekday (broadcast) — two shuffles total at any scale.
    */
  def weekdayAnomalies(spark: SparkSession, dir: String): DataFrame =
    weekdayAnomaliesOn(Tables.events(spark, dir))

  /** [[weekdayAnomalies]] core over an explicit relation carrying a
    * `ts` timestamp column — the testable unit.
    */
  def weekdayAnomaliesOn(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
      .withColumn("wd", dayofweek(col("day")).cast("long"))
    val moments = daily
      .groupBy("wd")
      .agg(count(lit(1)).as("n"), sum("x").as("s"), sum(col("x") * col("x")).as("ss"))
    daily
      .join(broadcast(moments), Seq("wd"))
      .withColumn(
        "is_anomaly",
        (col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s")) * (col("n") - 1L) >
          lit(4L) * col("n") * (col("n") * col("ss") - col("s") * col("s"))
      )
      .select(col("day"), col("wd"), col("x").as("n_events"), col("is_anomaly"))
      .orderBy("day")
  }

  /** Sustained-level-shift detection by integer CUSUM (Page 1954):
    * where [[dailyCountAnomalies]] flags single outlier days, CUSUM
    * accumulates small persistent excesses — the "traffic has been
    * 15% up for a week" signal a per-day z-test never crosses.
    *
    * Classic slack-and-reset CUSUM `C_t = max(0, C_{t−1} + x_t − μ −
    * slack)` is replayed WITHOUT recursion via the prefix-sum
    * identity `C_t = P_t − min(0, min_{i≤t} P_i)` (reset-at-zero ==
    * drawup from the running minimum), so the whole detector is two
    * running-window passes. Everything is scaled by n to stay
    * integer: `y_t = n·x_t − S − floor(S/10)` (slack = 10% of the
    * global mean), and a day flags when the accumulated excess tops
    * two average days (`C_t > 2·S`). Pure 64-bit integers end to end
    * — the flag can never flip on a summation ulp, and the oracle
    * replays the same windows bit-exact.
    */
  def cusumShifts(spark: SparkSession, dir: String): DataFrame =
    cusumShiftsOn(Tables.events(spark, dir))

  /** [[cusumShifts]] core over an explicit relation carrying `ts`. */
  def cusumShiftsOn(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = ev
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val totals = daily.agg(count(lit(1)).as("n"), sum("x").as("s"))
    val wRun   = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .crossJoin(broadcast(totals))
      .withColumn("y", col("n") * col("x") - col("s") - expr("s DIV 10"))
      .withColumn("p", sum("y").over(wRun))
      .withColumn("c", col("p") - least(min("p").over(wRun), lit(0L)))
      .withColumn("is_shift", col("c") > lit(2L) * col("s"))
      .select(col("day"), col("x").as("n_events"), col("c").as("cusum"), col("is_shift"))
      .orderBy("day")
  }

  /** Cumulative DISTINCT event types per user over time — the
    * new-behavior-discovery curve. Spark has no DISTINCT window
    * aggregate; `size(collect_set() OVER w)` expresses it exactly
    * (the set dedups inside the running frame) and stays bounded by
    * the type vocabulary, not the frame length. Total (ts, event_id)
    * order keeps the running counts deterministic cross-engine.
    */
  def cumulativeDistinctTypes(spark: SparkSession, dir: String, maxUser: Long = 20L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window
      .partitionBy("user_id")
      .orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .events(spark, dir)
      .filter(col("user_id") < maxUser)
      .select(
        col("user_id"),
        col("ts"),
        col("event_id"),
        size(collect_set(col("event_type")).over(w)).cast("long").as("cum_types")
      )
      .orderBy("user_id", "ts", "event_id")
  }

  /** Distinct users per tumbling hour — distinct aggregation composed
    * with event-time windows (the DAU/WAU shape). Exact
    * count(DISTINCT) here; at stream scale the same query swaps in
    * `approx_count_distinct` (HLL partials merge through windows the
    * way exact distinct cannot).
    */
  def tumblingDistinctUsers(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .select(col("w.start").as("ws"), col("n_users"), col("n_events"))
      .orderBy("ws")

  /** Sliding 15-minute windows advancing every 5 minutes. */
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(window(col("ts"), "15 minutes", "5 minutes").as("w"))
      .agg(count(lit(1)).as("n"), (round(sum("value"), 4) / count(lit(1))).as("avg_value"))
      .select(col("w.start").as("ws"), col("n"), col("avg_value"))
      .orderBy("ws")

  /** Semi-structured access through Spark 4's VARIANT type: props is
    * parsed once into variant's binary encoding and fields are
    * extracted with typed paths — at scale this replaces repeated
    * JSON string re-parsing per extracted field (the
    * get_json_object trap). Missing paths yield null, not errors.
    */
  def jsonVariant(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        col("event_id"),
        expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"),
        expr("variant_get(parse_json(props), '$.missing', 'string')").as("missing")
      )
      .orderBy("event_id")

  /** Session windows per user with a 30-minute inactivity gap. */
  def sessionize(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 4).as("session_value"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"), col("session_value"))
      .orderBy("user_id", "session_start")

  /** Session INTERVALS (actual event extent, [min ts, max ts]) via the
    * lag/break/prefix-sum formulation — the interval-relation input
    * for [[concurrentSessions]]. Gap semantics match [[sessionize]]
    * (a strict >30 min silence breaks the session); integer micros
    * comparisons keep the break decision bit-exact cross-engine.
    */
  def sessionIntervals(spark: SparkSession, dir: String, maxUser: Long = 50L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts")
    Tables
      .events(spark, dir)
      .filter(col("user_id") < maxUser)
      .select("user_id", "ts")
      .withColumn(
        "brk",
        when(
          lag(col("ts"), 1).over(w).isNull ||
            unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) > 1800L * 1000000L,
          1L
        ).otherwise(0L)
      )
      .withColumn("sid", sum("brk").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
      .select("user_id", "s_start", "s_end")
  }

  /** Concurrent sessions of DIFFERENT users: the interval-overlap join
    * over [[sessionIntervals]] — "who was active at the same time" —
    * through the binned equi-join scale path
    * ([[Relational.intervalOverlapJoin]]), never a nested loop.
    */
  def concurrentSessions(spark: SparkSession, dir: String): DataFrame = {
    val sess = sessionIntervals(spark, dir).localCheckpoint(eager = false)
    Relational
      .intervalOverlapJoin(
        sess,
        sess,
        startCol = "s_start",
        endCol = "s_end",
        binSeconds = 3600L,
        extraCond = col("l.user_id") < col("r.user_id")
      )
      .select(
        col("l.user_id").as("user_a"),
        col("l.s_start").as("start_a"),
        col("r.user_id").as("user_b"),
        col("r.s_start").as("start_b"),
        col("overlap_us")
      )
      .orderBy("user_a", "start_a", "user_b", "start_b")
  }

  /** Gap-filled daily series: a generated date spine left-joined to
    * per-day aggregates so silent days appear as explicit zeros — the
    * standard densification step before any time-series modeling. The
    * spine is `sequence()`-generated (no driver loop) and tiny, so it
    * broadcasts.
    */
  def gapFilledDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables
      .events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("revenue"))
    val spine = spark
      .range(1)
      .select(
        explode(
          expr("sequence(DATE '2024-01-01', DATE '2024-01-31', interval 1 day)")
        ).as("day")
      )
    spine
      .join(daily, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("revenue"), lit(0.0)).as("revenue")
      )
      .orderBy("day")
  }

  /** Map-typed column surface: build a per-user event_type→count map,
    * then extract/inspect it with map functions. Rows-only check (map
    * construction order isn't portable SQL); the spec pins values
    * against the pivot query.
    */
  def mapFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_entries(sort_array(collect_list(struct(col("event_type"), col("cnt"))))).as("m"))
      .select(
        col("user_id"),
        size(col("m")).cast("long").as("n_types"),
        concat_ws(",", array_sort(map_keys(col("m")))).as("types"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("click_cnt"),
        coalesce(element_at(col("m"), "purchase"), lit(0L)).as("purchase_cnt"),
        aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v).as("total_events")
      )
      .orderBy("user_id")

  /** Ordered conversion funnel: per user, first view → first
    * subsequent click → first subsequent purchase; one row per funnel
    * stage with the surviving-user count (min-time comparisons — no
    * sessionization state needed for the first-touch funnel).
    */
  def conversionFunnel(spark: SparkSession, dir: String): DataFrame = {
    val firsts = Tables
      .events(spark, dir)
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "click", col("ts"))).as("t_click"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase")
      )
      .select(
        col("user_id"),
        col("t_view").isNotNull.as("s1"),
        (col("t_view").isNotNull && col("t_click") > col("t_view")).as("s2"),
        (col("t_view").isNotNull && col("t_click") > col("t_view") && col("t_purchase") > col("t_click")).as("s3")
      )
    firsts.agg(
      sum(when(col("s1"), 1L).otherwise(0L)).as("viewed"),
      sum(when(col("s2"), 1L).otherwise(0L)).as("clicked_after_view"),
      sum(when(col("s3"), 1L).otherwise(0L)).as("purchased_after_click")
    )
  }

  /** Time-constrained funnel (the product-analytics "conversion
    * within N hours" shape, Amplitude/Mixpanel semantics): a user
    * converts step k when SOME step-(k−1)-qualified event happened
    * strictly before, within `maxGapHours` — not merely first-touch
    * order. First-touch logic ([[conversionFunnel]]) misses chains
    * that restart (view@t0, click@t0+2d, view@t1, click@t1+5min), so
    * qualification is computed per EVENT with an iterated range-frame
    * window: a click qualifies when `max(view-flag)` over
    * `RANGE [ts−Δ, ts−1]` (nanosecond integers) is 1, a purchase when
    * the same frame holds a QUALIFIED click. Exists-any semantics fall
    * out of max over 0/1 flags; everything is integer event-time, so
    * the funnel replays bit-exact.
    *
    * Scale shape: two window passes over user-partitioned,
    * ts-sorted events — one shuffle total (the first sort is reused
    * by the second window, same partitioning), state bounded by the
    * frame, no self-join of the event stream.
    */
  def windowedFunnel(spark: SparkSession, dir: String, maxGapHours: Int = 24): DataFrame =
    windowedFunnelOn(Tables.events(spark, dir), maxGapHours)

  /** [[windowedFunnel]] core over an explicit `(user_id, event_type,
    * ts_ns)` relation — the testable unit.
    */
  def windowedFunnelOn(ev: DataFrame, maxGapHours: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapNs = maxGapHours.toLong * 3600L * 1000000000L
    val w = Window
      .partitionBy("user_id")
      .orderBy(col("ts_ns"))
      .rangeBetween(-gapNs, -1L)
    val flagged = ev
      .select(col("user_id"), col("event_type"), col("ts_ns"))
      .withColumn("f1", when(col("event_type") === "view", 1L).otherwise(0L))
      .withColumn(
        "f2",
        when(col("event_type") === "click" && coalesce(max(col("f1")).over(w), lit(0L)) === 1L, 1L).otherwise(0L)
      )
      .withColumn(
        "f3",
        when(col("event_type") === "purchase" && coalesce(max(col("f2")).over(w), lit(0L)) === 1L, 1L).otherwise(0L)
      )
    flagged
      .groupBy("user_id")
      .agg(max("f1").as("s1"), max("f2").as("s2"), max("f3").as("s3"))
      .agg(
        sum("s1").as("viewed"),
        sum("s2").as("clicked_within_gap"),
        sum("s3").as("purchased_within_gap")
      )
  }

  /** Weekly cohort retention: users grouped by the week of their first
    * event; for each later week, how many returned. The canonical
    * retention triangle as (cohort_week, week_offset, n_users).
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir).select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val cohorts = e.groupBy("user_id").agg(min("week").as("cohort_week"))
    e.join(cohorts, "user_id")
      .withColumn("week_offset", expr("datediff(week, cohort_week) div 7"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Per-user behavior profile: conditional aggregation (pivot-style). */
  /** Sequence pattern detection (CEP-lite, the MATCH_RECOGNIZE shape):
    * each user's event history becomes one ordered symbol string (first
    * letter of the event type — the five types are letter-distinct),
    * and a regex counts non-overlapping pattern occurrences. The
    * default `v[ce]*p` is "a view that converts to a purchase through
    * any clicks/errors". One shuffle (groupBy user); per-user state is
    * the symbol string, bounded by the user's event count — the same
    * bound any per-user CEP engine carries. Order inside the string is
    * total ((ts, event_id)) so the answer is deterministic.
    */
  def eventPatternMatches(spark: SparkSession, dir: String, pattern: String = "v[ce]*p"): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("user_id")
      .agg(
        expr(
          """array_join(
            |  transform(array_sort(collect_list(struct(ts_ns, event_id, event_type))),
            |            x -> substr(x.event_type, 1, 1)), '')""".stripMargin
        ).as("seq")
      )
      .select(
        col("user_id"),
        length(col("seq")).cast("long").as("n_events"),
        expr(s"regexp_count(seq, '$pattern')").cast("long").as("n_matches")
      )
      .orderBy("user_id")

  def userProfile(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("n_purchase"),
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_click"),
        sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_error"),
        round(sum(when(col("event_type") === "purchase", col("value")).otherwise(0.0)), 4).as("purchase_value"),
        min(col("ts")).as("first_seen"),
        max(col("ts")).as("last_seen")
      )
      .orderBy("user_id")

  /** Per-user activity STREAKS (gaps-and-islands): consecutive-day
    * runs found by the anchor identity day − row_number (constant
    * exactly within a run), then per-user longest streak with a
    * deterministic tie-break (earliest start). All integers and
    * dates; windows are partitioned per user — no global window, the
    * classic engagement metric at any scale.
    */
  def activityStreaks(spark: SparkSession, dir: String): DataFrame =
    activityStreaksOn(Tables.events(spark, dir))

  /** [[activityStreaks]] core over an explicit relation with
    * (`user_id`, `ts`).
    */
  def activityStreaksOn(ev: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val days = ev
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val streaks = days
      .withColumn("anchor", expr("date_sub(day, row_number() OVER (PARTITION BY user_id ORDER BY day))"))
      .groupBy("user_id", "anchor")
      .agg(count(lit(1)).as("len"), min("day").as("start"))
    val pick = streaks
      .withColumn("rn", row_number().over(Window.partitionBy("user_id").orderBy(col("len").desc, col("start"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("len").as("longest_streak"), col("start").as("longest_start"))
    streaks
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_streaks"), sum("len").as("n_active_days"))
      .join(pick, "user_id")
      .select("user_id", "n_active_days", "n_streaks", "longest_streak", "longest_start")
      .orderBy("user_id")
  }

  /** DAU / WAU stickiness: per calendar day, distinct daily actives
    * and distinct trailing-7-day actives, plus the exact int/int
    * stickiness quotient. WAU reuses the calendar-correct
    * explode-onto-targets shape of [[ewmaDailyOn]] — each (user, day)
    * activity row contributes to the 7 target days it keeps the user
    * "weekly active" for, then ONE distinct aggregate per target; gap
    * days are absent rather than phantom. Output days are restricted
    * to observed days (a trailing window into empty calendar would
    * otherwise invent days with dau = 0).
    */
  def dauWauStickiness(spark: SparkSession, dir: String): DataFrame = {
    val userDays = Tables
      .events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = userDays.groupBy("day").agg(countDistinct("user_id").as("dau"))
    val wau = userDays
      .select(col("user_id"), explode(sequence(lit(0), lit(6))).as("lag"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("lag")).as("day"))
      .groupBy("day")
      .agg(countDistinct("user_id").as("wau"))
    dau
      .join(wau, "day") // inner: observed days only
      .select(
        col("day"),
        col("dau"),
        col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness")
      )
      .orderBy("day")
  }

  /** RFM segmentation: each user coded 1–4 on Recency (days since
    * last purchase, vs the corpus max day — a deterministic anchor),
    * Frequency (purchase count) and Monetary (purchase cents), codes
    * assigned with NTILE semantics over TOTAL orders (metric, user_id)
    * so tied users code deterministically; 4 = best quartile on every
    * axis. All-integer metrics (cents via floor, day diffs as longs).
    *
    * Scale: one hash aggregate per user, then three
    * [[graft.operators.Relational.ntileTwoPhase]] passes over the user
    * directory — NO unpartitioned window anywhere (the old built-in
    * `ntile(4).over(Window.orderBy(...))` forced the whole directory
    * through ONE partition). Block keys: recency and frequency have
    * bounded domains with heavy tie classes, so their blocks are
    * (metric value, user_id DIV 2^20) — ties split across blocks, each
    * block ≤ 1 Mi users; monetary cents are near-unique, so its block
    * is a value range (cents DIV 100000 — a sub-block of a LATER order
    * key after a range-quantized leading key would reorder, so ranges
    * must stay unsplit; a pathological point-mass on one cents value
    * would re-create the tie skew, the stated spread assumption).
    */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir).filter(col("event_type") === "purchase")
    val anchor = ev.agg(max(to_date(col("ts"))).as("anchor_day"))
    val perUser = ev
      .groupBy("user_id")
      .agg(
        max(to_date(col("ts"))).as("last_day"),
        count(lit(1)).as("freq"),
        sum(expr("CAST(floor(value * 100) AS BIGINT)")).as("cents")
      )
      .crossJoin(broadcast(anchor))
      .select(
        col("user_id"),
        datediff(col("anchor_day"), col("last_day")).cast("long").as("recency_days"),
        col("freq"),
        col("cents")
      )
    val uidBlk = expr("user_id DIV 1048576")
    // fewer days = best = 4: rank on the negated metric (ascending)
    val withR = Relational
      .ntileTwoPhase(
        perUser.withColumn("__negr", -col("recency_days")),
        Nil,
        Seq(col("__negr"), col("user_id")),
        Seq(col("__negr"), uidBlk),
        4,
        "r"
      )
      .drop("__negr")
    val withF = Relational.ntileTwoPhase(
      withR,
      Nil,
      Seq(col("freq"), col("user_id")),
      Seq(col("freq"), uidBlk),
      4,
      "f"
    )
    val withM = Relational.ntileTwoPhase(
      withF,
      Nil,
      Seq(col("cents"), col("user_id")),
      Seq(expr("cents DIV 100000")),
      4,
      "m"
    )
    withM
      .withColumn("segment", concat(col("r"), col("f"), col("m")))
      .select("user_id", "recency_days", "freq", "cents", "r", "f", "m", "segment")
      .orderBy("user_id")
  }

  /** U-shaped (position-based) multi-touch attribution: each purchase
    * distributes 10 000 basis points of credit across the same user's
    * click/view touchpoints in the preceding `lookbackHours`. One
    * touch takes all 10 000; two split 5 000/5 000; three or more give
    * first and last 4 000 each and the middles `2000 div (n-2)` each,
    * the integer remainder going to the FIRST touch (deterministic,
    * and all-integer — no float credit anywhere, so the oracle
    * hash-compare is exact). Conversions with no touch in the window
    * earn no row (inner join; the untouched-conversion count is
    * derivable as purchases minus distinct credited conversions).
    *
    * Shape: one user-keyed equi-join with a time-band predicate (the
    * band rides the hash join as a post-filter — at TPC-ish user
    * cardinalities the per-user group is small and bounded by the
    * lookback), one window per conversion to rank touches, one final
    * aggregate. Shuffles on user_id then conversion id then
    * touch_type; nothing quadratic beyond the bounded per-user
    * click×purchase pairing every attribution model must enumerate.
    */
  def attributionUShaped(spark: SparkSession, dir: String, lookbackHours: Int = 6): DataFrame =
    uShapedCredits(Tables.events(spark, dir), lookbackHours)
      .groupBy("touch_type")
      .agg(
        sum("credit_bp").as("total_credit_bp"),
        count(lit(1)).as("n_touches"),
        countDistinct("conv_id").as("n_conversions")
      )
      .orderBy("touch_type")

  /** First-order event-type transition counts (the empirical Markov
    * chain over each user's event stream): for every consecutive pair
    * in a user's time-ordered events, count (from_type → to_type).
    * The per-user ordering key is (ts, event_id) — total, so the
    * transition matrix is a pure function of the data. One window pass
    * partitioned BY USER (parallel, no global sort) + one counting
    * aggregate; integer counts only.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables
      .events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("from_type", "to_type")
  }

  /** Stationary distribution of the empirical event-type Markov chain
    * ([[eventTransitions]]' matrix) by INTEGER-MASS power iteration —
    * the graph_pagerank discipline applied to the behavior chain: each
    * state starts with 10¹² units and each round routes
    * `mass(s) · n(s,t) DIV out(s)` to t — exact long arithmetic whose
    * sums are order-independent, floor remainders retired, so the
    * result is a PURE FUNCTION of the transition counts and the oracle
    * replays the fixed `rounds` as unrolled SQL (bit-exact). A state
    * with no outgoing transitions keeps its mass (self-loop
    * absorption); the state space is the event-type alphabet observed
    * in transitions (bounded), so after the one corpus-sized
    * transition-count aggregate every round is directory-scale. The
    * long product `m·n` stays under 2⁶³ until a single (from, to) pair
    * carries ~9×10⁶ transitions at 10¹² mass — beyond that move the
    * product to DECIMAL (documented, like aucExact).
    */
  def markovStationary(spark: SparkSession, dir: String, rounds: Int = 8): DataFrame =
    markovStationaryFromTransitions(eventTransitions(spark, dir).withColumnRenamed("n_transitions", "n"), rounds)

  /** [[markovStationary]] core over any (from_type, to_type, n)
    * transition-count relation.
    */
  private[graft] def markovStationaryFromTransitions(transitions: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"markovStationary needs >= 1 round, got $rounds")
    val spark = transitions.sparkSession
    import spark.implicits._
    // The transition matrix is ALPHABET²-bounded (event types, never
    // events), so the `rounds` mass-routing rounds run on the DRIVER
    // over the collected matrix — the bounded-state convention (BPE
    // merge tables, sketch directories). The distributed work is the
    // one aggregate that produced `transitions`; iterating a ≤|Σ|²-row
    // relation through 8 rounds of join+union+aggregate jobs paid ~17
    // scheduler round-trips for arithmetic on a few dozen longs (guide
    // §1.2: fix the algorithm's shape before its constants). Integer
    // semantics are IDENTICAL: m·n DIV outn per edge (multiplyExact
    // keeps the ANSI overflow-raise), per-state sums, absorbing states
    // keep their mass, states with out-edges but no inflow drop to 0.
    val tr = transitions
      .select(col("from_type").cast("string"), col("to_type").cast("string"), col("n").cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val outn   = tr.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val states = (tr.map(_._1) ++ tr.map(_._2)).distinct
    var mass   = states.map(_ -> 1000000000000L).toMap
    for (_ <- 1 to rounds) {
      val next = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((f, t, n) <- tr; m <- mass.get(f)) next(t) += Math.multiplyExact(m, n) / outn(f)
      for ((s, m) <- mass if !outn.contains(s)) next(s) += m
      mass = next.toMap
    }
    states.toSeq
      .map(s => (s, mass.getOrElse(s, 0L)))
      .toDF("event_type", "mass")
      .orderBy("event_type")
  }

  /** Sequential-pattern supports (the PrefixSpan/SPADE family,
    * specialized to a bounded event-type alphabet): for every length-2
    * pattern `a>b`, the number of users with an a-event STRICTLY
    * before a b-event; for every length-3 pattern `a>b>c`, the number
    * of users with a strictly increasing a,b,c chain. Patterns under
    * `minSupport` users are dropped.
    *
    * Existence reduces to integer timestamp algebra (the greedy
    * earliest-extension argument): a>b holds iff first(a) < last(b),
    * and a>b>c holds iff e_ab < last(c) where e_ab = min ts of a
    * b-event strictly after first(a) — if a chain t_a<t_b<t_c exists
    * then first(a) ≤ t_a so e_ab ≤ t_b < t_c ≤ last(c); conversely
    * (first(a), e_ab, last(c)) IS a chain. So the whole miner is two
    * joins bounded by |alphabet| per user-event — one (user, type)
    * first/last aggregate, one events⋈firsts min-aggregate, one
    * closing join — all user-hash-partitioned, never a subsequence
    * enumeration; work is O(events · |alphabet|) at any scale. Repeat
    * types (a>a, a>b>a, …) fall out of the same algebra via the
    * strict inequalities. All-integer: bit-exact cross-engine.
    */
  def sequentialPatterns(spark: SparkSession, dir: String, minSupport: Long = 10L): DataFrame =
    sequentialPatternsOn(
      Tables.events(spark, dir).select(col("user_id").as("u"), col("event_type").as("t"), col("ts_ns")),
      minSupport
    )

  /** [[sequentialPatterns]] core over an explicit `(u, t, ts_ns)`
    * relation — the testable unit.
    */
  def sequentialPatternsOn(ev: DataFrame, minSupport: Long): DataFrame = {
    val fl = ev
      .groupBy("u", "t")
      .agg(min("ts_ns").as("first_ts"), max("ts_ns").as("last_ts"))
      .localCheckpoint(eager = false)
    val sup2 = fl
      .as("a")
      .join(fl.as("b"), col("a.u") === col("b.u") && col("a.first_ts") < col("b.last_ts"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("support"))
    val eab = ev
      .as("e")
      .join(fl.as("a"), col("e.u") === col("a.u") && col("e.ts_ns") > col("a.first_ts"))
      .groupBy(col("e.u").as("u"), col("a.t").as("ta"), col("e.t").as("tb"))
      .agg(min(col("e.ts_ns")).as("e_ab"))
    val sup3 = eab
      .as("x")
      .join(fl.as("c"), col("x.u") === col("c.u") && col("x.e_ab") < col("c.last_ts"))
      .groupBy(col("x.ta").as("ta"), col("x.tb").as("tb"), col("c.t").as("tc"))
      .agg(count(lit(1)).as("support"))
    sup2
      .select(concat_ws(">", col("ta"), col("tb")).as("pattern"), lit(2L).as("len"), col("support"))
      .unionByName(
        sup3.select(concat_ws(">", col("ta"), col("tb"), col("tc")).as("pattern"), lit(3L).as("len"), col("support"))
      )
      .filter(col("support") >= minSupport)
      .orderBy("len", "pattern")
  }

  /** Per-touch credit rows for [[attributionUShaped]] — exposed so the
    * 10 000-bp-per-conversion invariant is testable at touch grain.
    */
  def uShapedCredits(ev: DataFrame, lookbackHours: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = ev
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("conv_id"), col("user_id"), col("ts").as("conv_ts"))
    val touch = ev
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_id").as("touch_id"), col("user_id"), col("ts").as("touch_ts"), col("event_type").as("touch_type"))
    val paired = conv
      .join(touch, Seq("user_id"))
      .filter(
        col("touch_ts") <= col("conv_ts") &&
          col("touch_ts") >= col("conv_ts") - expr(s"INTERVAL $lookbackHours HOURS")
      )
    val w = Window.partitionBy("conv_id").orderBy("touch_ts", "touch_id")
    paired
      .withColumn("pos", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("conv_id")))
      .withColumn(
        "credit_bp",
        expr(
          """CASE WHEN n = 1 THEN 10000L
            |     WHEN n = 2 THEN 5000L
            |     WHEN pos = 1 THEN 4000L + 2000L % (n - 2)
            |     WHEN pos = n THEN 4000L
            |     ELSE 2000L div (n - 2) END""".stripMargin
        )
      )
  }
}
