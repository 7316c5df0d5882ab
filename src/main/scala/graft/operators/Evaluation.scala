package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Exact classifier-evaluation metrics at corpus scale — the scoring
  * side of a trained-filter pipeline ([[Classify]] trains; this tier
  * grades). Everything is formulated in INTEGER arithmetic (the
  * repo-wide cross-engine float discipline): scores quantize to
  * centi-units via floor (exact IEEE), AUC is the tie-corrected
  * Mann-Whitney rank-sum kept as an exact num/den pair, and the PR
  * curve emits raw tp/fp/fn counts per threshold.
  *
  * Scale notes (100 TB):
  *   - the data-sized relation is reduced FIRST to the distinct-score
  *     directory (one hash aggregate with map-side partials); every
  *     cumulative that follows runs on the directory, never the data.
  *   - cumulative counts use the repo's two-phase global-ranking
  *     pattern (Dedup.sortedNeighborhoodPairs): a window partitioned
  *     by coarse score block plus an O(#blocks) broadcast offset
  *     directory — NO unpartitioned window over a data-sized relation.
  *   - quantization bounds the directory (#distinct centi-scores ≤
  *     score range × 100), so the curve output is bounded regardless
  *     of row count.
  *   - rank sums grow as n²: at >~2×10⁹ rows the BIGINT pair would
  *     overflow — the operator computes the rank-sum in DECIMAL(38,0)
  *     internally and refuses (loud require) rather than wrap.
  */
object Evaluation {

  /** (y, s): binary label (purchase) and exact centi-unit score.
    * floor(value*100) not round(): floor of a double is the identical
    * IEEE op in every engine; round() on raw doubles is not.
    */
  private def scoredEvents(spark: SparkSession, dir: String): DataFrame =
    Tables
      .events(spark, dir)
      .select(
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"),
        expr("CAST(floor(value * 100) AS BIGINT)").as("s")
      )

  /** Floor division matching DuckDB's `//` (Spark's `DIV` truncates
    * toward zero, so the two disagree on every negative non-multiple —
    * e.g. −150 DIV 100 = −1 vs −150 // 100 = −2). The branch form
    * avoids the `-((-s)...)` negation overflow at Long.MinValue. Used
    * for every bin id that LEAVES a query (cross-engine exactness must
    * not depend on scores happening to be non-negative) and for the
    * internal block keys (where truncation would still be monotone,
    * but one division convention keeps the engines' SQL literal).
    */
  private def floorDiv(c: String, w: Long): org.apache.spark.sql.Column = {
    require(w > 0, s"floorDiv needs a positive divisor, got $w")
    expr(s"($c DIV $w) - (CASE WHEN $c % $w <> 0 AND $c < 0 THEN 1 ELSE 0 END)")
  }

  /** Distinct-score directory with exclusive cumulative counts
    * (c_p = positives strictly below s, c_g = rows strictly below s),
    * built with the two-phase block + offset-directory pattern.
    */
  private[graft] def cumulativeByScore(scored: DataFrame, blockWidth: Long = 1000L): DataFrame = {
    val byScore = scored
      .groupBy("s")
      .agg(sum("y").as("p_s"), count(lit(1)).as("g_s"))
      .withColumn("blk", floorDiv("s", blockWidth))
    val inBlk = Window.partitionBy("blk").orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    val local = byScore
      .withColumn("lp", coalesce(sum("p_s").over(inBlk), lit(0L)))
      .withColumn("lg", coalesce(sum("g_s").over(inBlk), lit(0L)))
    // O(#blocks) directory: the only unpartitioned window runs here
    val dirW = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val offsets = byScore
      .groupBy("blk")
      .agg(sum("p_s").as("bp"), sum("g_s").as("bg"))
      .withColumn("op", coalesce(sum("bp").over(dirW), lit(0L)))
      .withColumn("og", coalesce(sum("bg").over(dirW), lit(0L)))
      .select("blk", "op", "og")
    local
      .join(broadcast(offsets), "blk")
      .select(
        col("s"),
        col("p_s"),
        col("g_s"),
        (col("op") + col("lp")).as("c_p"),
        (col("og") + col("lg")).as("c_g")
      )
  }

  /** Exact two-sample Kolmogorov–Smirnov statistic between the
    * centi-quantized `value` distributions of even- and odd-`event_id`
    * events — the drift gate's distribution-free test, computed
    * EXACTLY: D = max over distinct scores of |F1 − F2|, and since
    * both empirical CDFs are step functions changing only at observed
    * scores, the max over the distinct-score directory IS the
    * supremum. Kept as the integer pair
    * ks_num = max |n2·C1(v) − n1·C2(v)|, ks_den = n1·n2 (cross-
    * multiplied, no float CDFs), with `ks` their single IEEE division
    * — bitwise identical in any engine, the [[aucFromScored]]
    * convention.
    */
  def ksExact(spark: SparkSession, dir: String): DataFrame =
    ksFromScored(
      Tables
        .events(spark, dir)
        .select(
          when(expr("event_id % 2 = 0"), 1L).otherwise(0L).as("y"),
          expr("CAST(floor(value * 100) AS BIGINT)").as("s")
        )
    )

  /** KS over any (y ∈ {0,1} sample indicator, s: long) relation.
    * Scale: one hash aggregate to the distinct-score directory, the
    * [[cumulativeByScore]] two-phase cumulative, one max-aggregate —
    * the data-sized relation is touched once. Cross-products run in
    * DECIMAL(38,0) (n₁·n₂ wraps BIGINT near ~3×10⁹ rows/side);
    * emitted pair is guarded back to long, loud on overflow.
    */
  def ksFromScored(scored: DataFrame): DataFrame = {
    val cum = cumulativeByScore(scored)
    val tot = cum.agg(sum("p_s").as("n1"), sum("g_s").as("nt"))
    val r = cum
      .crossJoin(broadcast(tot)) // 1-row scalar aggregate (repo convention)
      .select(
        abs(
          (col("nt") - col("n1")).cast("decimal(38,0)") * (col("c_p") + col("p_s")) -
            col("n1").cast("decimal(38,0)") * (col("c_g") + col("g_s") - col("c_p") - col("p_s"))
        ).as("d"),
        (col("n1").cast("decimal(38,0)") * (col("nt") - col("n1"))).as("den")
      )
      .agg(max(col("d")).as("numd"), max(col("den")).as("dend"))
    // den = n1·(nt−n1) = 0 means one sample is EMPTY, and a fully
    // empty input leaves the agg row NULL: KS between a sample and
    // nothing is undefined — refuse loudly (repo convention) instead
    // of emitting a silent 0/0 NaN. BOTH output columns gate on the
    // denominator so the empty case always reports "sample is empty"
    // rather than tripping the overflow guard on a NULL numerator
    // (column evaluation order would otherwise surface the misleading
    // 'ks_num exceeds BIGINT' message first).
    val emptyErr =
      raise_error(lit("ksExact: sample is empty (no rows, n1 = 0, or n1 = n) — KS is undefined"))
        .cast("long")
    r.select(
      when(col("dend").isNotNull && col("dend") > 0, guardedLong(col("numd"), "ks_num", "ksExact"))
        .otherwise(emptyErr)
        .as("ks_num"),
      when(
        col("dend").isNotNull && col("dend") > 0,
        guardedLong(col("dend"), "ks_den", "ksExact")
      ).otherwise(emptyErr).as("ks_den"),
      (col("numd").cast("double") / col("dend").cast("double")).as("ks")
    )
  }

  /** Exact tie-corrected AUC (Mann-Whitney): one row
    * (auc_num, auc_den, auc) with
    * auc_num = 2·Σ_s p_s·(2·c_g(s) + g_s + 1)/2 … kept doubled so ties'
    * half-ranks stay integral: num = Σ p_s·(2c_g + g_s + 1) − P(P+1),
    * den = 2·P·N, auc = num/den (one int/int IEEE division — bitwise
    * identical across engines, left unrounded per repo convention).
    */
  def aucExact(spark: SparkSession, dir: String): DataFrame =
    aucFromScored(scoredEvents(spark, dir))

  /** AUC over any (y ∈ {0,1}, s: long) relation. */
  def aucFromScored(scored: DataFrame): DataFrame = {
    val cum = cumulativeByScore(scored)
    // DECIMAL(38,0) for the n²-growth term — the OPERANDS are cast
    // before the multiplication so the product itself runs in decimal
    // (a LONG product would silently wrap near ~2e9 rows with ANSI
    // off, and the guard below would then validate already-wrapped
    // values); totals stay long
    val parts = cum.agg(
      sum(
        col("p_s").cast("decimal(38,0)") *
          (lit(2) * col("c_g").cast("decimal(38,0)") + col("g_s") + lit(1))
      ).as("r2"),
      sum("p_s").as("p"),
      sum("g_s").as("n")
    )
    parts
      .select(
        (col("r2") - (col("p").cast("decimal(38,0)") * (col("p") + lit(1)))).as("numd"),
        (lit(2).cast("decimal(38,0)") * col("p") * (col("n") - col("p"))).as("dend")
      )
      .select(
        guardedLong(col("numd"), "auc_num", "aucExact").as("auc_num"),
        guardedLong(col("dend"), "auc_den", "aucExact").as("auc_den"),
        (col("numd").cast("double") / col("dend").cast("double")).as("auc")
      )
  }

  /** Reliability-diagram bins: per score bucket, how many rows and how
    * many positives — the calibration artifact (a well-calibrated
    * scorer has n_pos/n tracking the bucket's score). Pure integers,
    * one hash aggregate; ratio left to the consumer.
    */
  def calibrationBins(spark: SparkSession, dir: String, binWidth: Long = 5000L): DataFrame = {
    require(binWidth > 0, s"calibrationBins needs binWidth > 0, got $binWidth")
    scoredEvents(spark, dir)
      .groupBy(floorDiv("s", binWidth).as("bin"))
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
      .orderBy("bin")
  }

  /** Isotonic calibration (pool-adjacent-violators) over value-unit
    * score bins, via the closed-form identity
    * fit(i) = max_{j ≤ i} min_{k ≥ j} mean(y[j..k]) — the minimax
    * characterization of the isotonic regressor (Robertson/Wright/
    * Dykstra, "Order Restricted Statistical Inference" — public
    * knowledge), which needs NO sequential pooling loop: one pair
    * enumeration + a per-j min + a prefix max.
    *
    * Exactness: every mean is one int/int double division of exact
    * prefix-sum counts (identical IEEE op in any engine), and min/max
    * over identical double sets are exact — no accumulation, no
    * rounding, hash-stable cross-engine.
    *
    * Scale: bins are VALUE UNITS (s DIV 100), so the directory is
    * bounded by the score range (~hundreds) at ANY corpus size — the
    * pair space is bins², the Theil-Sen days² argument; the corpus
    * contributes exactly one hash aggregate.
    */
  def isotonicCalibration(spark: SparkSession, dir: String): DataFrame =
    isotonicFromScored(scoredEvents(spark, dir))

  /** [[isotonicCalibration]] core over any (y ∈ {0,1}, s: long). */
  def isotonicFromScored(scored: DataFrame): DataFrame = {
    val bins = scored
      .groupBy(floorDiv("s", 100L).as("b"))
      .agg(count(lit(1)).as("n"), sum("y").as("p"))
    val w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0) // directory-sized
    val pre = bins
      .withColumn("cn", sum("n").over(w))
      .withColumn("cp", sum("p").over(w))
      .select(col("b"), col("n"), col("p").as("n_pos"), col("cn"), col("cp"))
    val hi = pre.select(col("b").as("k"), col("cn").as("cnk"), col("cp").as("cpk"))
    val lo = pre.select(col("b").as("j"), (col("cn") - col("n")).as("cnj"), (col("cp") - col("n_pos")).as("cpj"))
    // mean(j..k) for every j <= k over the bounded directory
    val minSuffix = lo
      .join(hi, col("j") <= col("k"))
      .select(col("j"), ((col("cpk") - col("cpj")).cast("double") / (col("cnk") - col("cnj"))).as("m"))
      .groupBy("j")
      .agg(min("m").as("minavg"))
    val fit = pre
      .join(minSuffix, col("b") === col("j"))
      .withColumn("fit", max("minavg").over(Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("b").as("bin"), col("n"), col("n_pos"), col("fit"))
    fit.orderBy("bin")
  }

  /** decimal→long that REFUSES (raise_error in the row path — no extra
    * action) instead of silently nulling past ±2⁶³; auc itself stays
    * exact as a decimal/decimal double at any scale.
    */
  private def guardedLong(c: org.apache.spark.sql.Column, nm: String, op: String): org.apache.spark.sql.Column =
    when(
      c.between(lit(Long.MinValue).cast("decimal(38,0)"), lit(Long.MaxValue).cast("decimal(38,0)")),
      c.cast("long")
    ).otherwise(
      raise_error(lit(s"$op: $nm exceeds BIGINT at this row count — consume the decimal form"))
        .cast("long")
    )

  /** PR curve at every distinct centi-score threshold t (predict
    * positive when s ≥ t): exact tp/fp/fn counts per threshold,
    * ordered by threshold. Ratios are left to the consumer — counts
    * are the exact, scale-robust artifact.
    */
  def prCurve(spark: SparkSession, dir: String): DataFrame =
    prCurveFromScored(scoredEvents(spark, dir))

  /** PR curve over any (y ∈ {0,1}, s: long) relation. */
  def prCurveFromScored(sc: DataFrame): DataFrame = {
    val cum    = cumulativeByScore(sc)
    val totals = sc.agg(sum("y").as("pp"), count(lit(1)).as("nn"))
    cum
      .crossJoin(broadcast(totals))
      .select(
        col("s").as("threshold"),
        (col("pp") - col("c_p")).as("tp"),
        ((col("nn") - col("pp")) - (col("c_g") - col("c_p"))).as("fp"),
        col("c_p").as("fn")
      )
      .orderBy("threshold")
  }
}
