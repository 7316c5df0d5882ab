package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Mergeable-summary operators beyond HLL / Misra–Gries: the KMV
  * bottom-k distinct sketch ([[graft.functions.KmvSketchAgg]]), whose
  * sketch VALUE (not just its estimate) is deterministic under any
  * merge order, and which answers the set-overlap questions
  * `approx_count_distinct` cannot — union and intersection cardinality
  * across groups, datasets, or time windows from k-long summaries.
  *
  * At 100 TB this is the difference between shipping the distinct-key
  * SET across the cluster (a shuffle proportional to the key universe)
  * and shipping one k·8-byte array per group; cross-dataset overlap
  * ("how much of corpus B's vocabulary is already in A?") never
  * materializes a join at all.
  *
  * Every estimator below is pure codegen'd built-ins — the aggregate
  * stores hashes sign-flipped precisely so `array_sort` /
  * `array_intersect` / `element_at` see unsigned hash order (see
  * KmvSketchAgg's scaladoc).
  */
object Sketches {

  /** 2^64 as a double; stored values are sign-flipped hashes, so the
    * uniform (0,1) position of a stored value s is s/2^64 + 0.5.
    */
  private val Two64 = 1.8446744073709552e19

  private def uniformPos(stored: Column): Column = stored.cast("double") / lit(Two64) + lit(0.5)

  /** Distinct-count estimate from a KMV sketch built with capacity k:
    * exact size below capacity; (k−1)/u(k-th min) at capacity.
    */
  def kmvEstimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble) / uniformPos(element_at(sketch, k)))

  /** Bottom-k of the merged hash sets — exactly the sketch the union
    * of the two inputs would have produced (the semilattice property).
    */
  def kmvUnion(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Intersection-cardinality estimate (Beyer et al. 2007 §4): over
    * the combined bottom-k L, the fraction of values present in BOTH
    * sketches, scaled by the union estimate. Degenerates to the exact
    * intersection count when |L| < k (both sides exact).
    */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val l   = kmvUnion(a, b, k)
    val rho = size(array_intersect(array_intersect(l, a), b))
    when(size(l) === 0, lit(0.0))
      .otherwise(rho.cast("double") / size(l) * kmvEstimate(l, k))
  }

  /** Distinct parts per return flag — and their union — from ONE pass
    * building per-group KMV sketches. Below capacity (k ≥ the true
    * distinct count — the gate scales) every hash is retained, the
    * estimate degenerates to the exact size, and the answers are
    * DuckDB-replayable; AT capacity the sketch reports its (k−1)/u(k)
    * ESTIMATE — reporting the saturated size instead would silently
    * cap the answer at k, the failure mode the sf1 run surfaced
    * (SCALE.md: 200 k true distinct vs a 32 768 cap). The 'ALL' row is
    * the point of the exercise: per-group COUNT(DISTINCT) results
    * cannot be added (groups share parts), but group sketches merge —
    * bottom-k of the union, the same semilattice [[kmvUnion]] uses —
    * into the global answer without touching the data again: the
    * pattern that turns a daily 100 TB distinct-count job into a merge
    * of per-partition arrays. `check_kmv` pins the at-capacity
    * estimate's error bound; this query's oracle pins the exact
    * regime.
    */
  def kmvParts(spark: SparkSession, dir: String, k: Int = 32768): DataFrame = {
    graft.GraftFunctions.register(spark)
    val perFlag = Tables
      .lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr(s"kmv_agg(xxhash64(l_partkey), $k)").as("sk"))
    val groups = perFlag.select(
      col("l_returnflag").as("scope"),
      round(kmvEstimate(col("sk"), k), 0).cast("long").as("n_parts")
    )
    val all = perFlag
      .agg(collect_list("sk").as("sks"))
      .select(
        lit("ALL").as("scope"),
        round(kmvEstimate(slice(array_sort(array_distinct(flatten(col("sks")))), 1, k), k), 0)
          .cast("long")
          .as("n_parts")
      )
    groups.unionByName(all).orderBy("scope")
  }

  /** Corpus-overlap report from KMV set algebra: distinct l_suppkey
    * per half of lineitem, plus the union / intersection / Jaccard of
    * the two sides — computed ENTIRELY on the sketches ([[kmvUnion]],
    * [[kmvIntersectEstimate]]), never by re-scanning or joining the
    * data. This is the dataset-versioning primitive at 100 TB: "how
    * much does the new crawl overlap the old one" answered by merging
    * two k-sized arrays that each side computed in its own single
    * pass (and could have persisted months apart — sketches of
    * immutable corpora never expire). Sub-capacity (the gate scales:
    * suppkey ndv ≪ k) every number degenerates to the exact count, so
    * DuckDB replays the whole report; `check_kmv` pins the saturated
    * regime's error bound.
    */
  def kmvOverlap(spark: SparkSession, dir: String, k: Int = 32768): DataFrame = {
    graft.GraftFunctions.register(spark)
    val sides = Tables
      .lineitem(spark, dir)
      .select((col("l_orderkey") % 2 === 0).as("even"), col("l_suppkey"))
      .groupBy("even")
      .agg(expr(s"kmv_agg(xxhash64(l_suppkey), $k)").as("sk"))
    val a = sides.filter(col("even")).select(col("sk").as("sk_a"))
    val b = sides.filter(!col("even")).select(col("sk").as("sk_b"))
    a.crossJoin(broadcast(b))
      .select(
        round(kmvEstimate(col("sk_a"), k), 0).cast("long").as("n_even"),
        round(kmvEstimate(col("sk_b"), k), 0).cast("long").as("n_odd"),
        round(kmvEstimate(kmvUnion(col("sk_a"), col("sk_b"), k), k), 0).cast("long").as("n_union"),
        round(kmvIntersectEstimate(col("sk_a"), col("sk_b"), k), 0).cast("long").as("n_overlap")
      )
      .withColumn("jaccard", round(col("n_overlap").cast("double") / col("n_union"), 4))
  }

  /** Word counts replayed through a Count-Min sketch
    * ([[graft.functions.CmsAgg]]): one depth×width counter grid over
    * the token stream, probed per distinct term with the codegen'd
    * [[graft.functions.CmsLookup]]. Run in the collision-free regime
    * (width ≫ vocabulary), where the min-of-rows estimate IS the exact
    * count — the DuckDB-replayable configuration; `check_cms`
    * exercises the colliding regime. The sketch crosses the cluster
    * once as ONE broadcast row of depth·width longs — the exact
    * groupBy this replaces shuffles the full distinct-term table.
    */
  def cmsWordCounts(spark: SparkSession, dir: String, depth: Int = 4, width: Int = 8192): DataFrame = {
    graft.GraftFunctions.register(spark)
    val toks =
      TextJobs.tokenized(Tables.documents(spark, dir).select("text"), "text", "word")
    val sketch = toks.agg(expr(s"cms_agg(xxhash64(word), $depth, $width)").as("cms"))
    toks
      .select("word")
      .distinct()
      .crossJoin(broadcast(sketch))
      .select(col("word"), expr(s"cms_estimate(cms, xxhash64(word), $depth, $width)").as("cnt"))
      .orderBy("word")
  }

  /** Count-Min guarantee check in the COLLIDING regime (width 64
    * against ~10× more distinct custkeys, so nearly every counter is
    * shared). DuckDB states the expected constants:
    *   - under_violations = 0: est(x) ≥ c(x) for every key — the CMS
    *     hard guarantee, no probability involved;
    *   - merge_invariant: counter grids are elementwise sums, so the
    *     sketch VALUE is bit-identical under different partitionings;
    *   - bound_ok: the fraction of keys whose overcount exceeds
    *     e·N/width is below 3·e^(−depth) (the per-key Markov bound is
    *     e^(−depth); 3× head-room because K keys are not independent
    *     trials — measured, deterministic for fixed data and hashes).
    */
  def cmsCheck(spark: SparkSession, dir: String, depth: Int = 4, width: Int = 64): DataFrame = {
    graft.GraftFunctions.register(spark)
    val keys   = Tables.orders(spark, dir).select(col("o_custkey").as("key"))
    val exact  = keys.groupBy("key").agg(count(lit(1)).as("cnt"))
    val n      = keys.agg(count(lit(1)).as("n"))
    val skA    = keys.repartition(7).agg(expr(s"cms_agg(xxhash64(key), $depth, $width)").as("cms"))
    val skB    = keys.repartition(13).agg(expr(s"cms_agg(xxhash64(key), $depth, $width)").as("cms_b"))
    val eps    = math.E / width
    val maxBad = 3.0 * math.exp(-depth.toDouble)
    exact
      .crossJoin(broadcast(skA))
      .crossJoin(broadcast(n))
      .select(
        col("cnt"),
        col("n"),
        expr(s"cms_estimate(cms, xxhash64(key), $depth, $width)").as("est")
      )
      .agg(
        sum(when(col("est") < col("cnt"), 1L).otherwise(0L)).as("under_violations"),
        (sum(when(col("est") - col("cnt") > lit(eps) * col("n"), 1L).otherwise(0L)) <
          count(lit(1)) * lit(maxBad)).as("bound_ok")
      )
      .crossJoin(broadcast(skA.crossJoin(broadcast(skB)).select((col("cms") === col("cms_b")).as("merge_invariant"))))
      .select(col("under_violations"), col("bound_ok"), col("merge_invariant"))
  }

  /** CMS inner-product JOIN-SIZE estimate (Cormode–Muthukrishnan 2005
    * §4.2): |A ⋈ B| on a key equals Σ_k cntA(k)·cntB(k), and the
    * per-depth-row dot product of two CMS grids over-counts exactly by
    * non-negative collision cross-terms — so min over rows NEVER
    * under-estimates, deterministically, and over-shoots by more than
    * e·|A|·|B|/width with probability ≤ e^(−depth). This is the
    * cardinality-estimation primitive a planner wants BEFORE running a
    * join: two single-pass sketches (depth·width longs each, merged
    * commutatively from any partitioning) replace executing the join.
    * Emitted as a check row — the estimate's guarantees measured
    * against the executed join, DuckDB stating the exact size and the
    * two expected-true flags.
    */
  def cmsJoinSizeCheck(spark: SparkSession, dir: String, depth: Int = 4, width: Int = 8192): DataFrame = {
    graft.GraftFunctions.register(spark)
    val a   = Tables.orders(spark, dir).select(col("o_custkey").as("key"))
    val b   = Tables.customer(spark, dir).select(col("c_custkey").as("key"))
    val skA = a.agg(expr(s"cms_agg(xxhash64(key), $depth, $width)").as("ca"), count(lit(1)).as("na"))
    val skB = b.agg(expr(s"cms_agg(xxhash64(key), $depth, $width)").as("cb"), count(lit(1)).as("nb"))
    val exact = a.join(b, "key").agg(count(lit(1)).as("exact_join_size"))
    val estExpr =
      s"""array_min(transform(sequence(0, ${depth - 1}), d ->
         |  aggregate(zip_with(slice(ca, d * $width + 1, $width),
         |                     slice(cb, d * $width + 1, $width),
         |                     (x, y) -> x * y),
         |            cast(0 as long), (acc, v) -> acc + v)))""".stripMargin
    exact
      .crossJoin(broadcast(skA))
      .crossJoin(broadcast(skB))
      .withColumn("est", expr(estExpr))
      .select(
        col("exact_join_size"),
        (col("est") >= col("exact_join_size")).as("no_undercount"),
        (col("est") - col("exact_join_size") <=
          lit(math.E) * col("na") * col("nb") / width).as("bound_ok")
      )
  }

  /** KMV guarantee check, run in the sub-capacity regime where the
    * sketch actually estimates (k=256 against thousands of distinct
    * orderkeys / custkeys). Verifies, with DuckDB stating the
    * expected constants:
    *   - merge_invariant: the sketch ARRAY is bit-identical under
    *     different partitionings (bottom-k is a semilattice; compare
    *     Misra–Gries, where only the bounds are deterministic);
    *   - est_ok: distinct estimate within 3·RSE (relative standard
    *     error 1/√(k−2) ≈ 6.3%) of exact;
    *   - union_ok: the estimate from merged per-status sketches —
    *     never re-reading the rows — within the same bound of the
    *     global exact distinct;
    *   - intersect_ok: orders-custkey ∩ customer-custkey estimate
    *     (the "how many customers ever ordered" overlap) within 3·RSE
    *     of the union estimate's scale, per the Beyer et al. error
    *     model (absolute error scales with D_union, not D_intersect).
    */
  /** Standing KMV sketch rollup — the sketch-backed materialized view.
    * An additive parquet table of per-dim-group sketch partials
    * (MULTIPLE rows per group allowed, same contract as
    * [[graft.plans.MaterializedViews]]): maintenance is a blind append
    * of the delta's partials, readers re-MERGE (bottom-k of the union
    * — the semilattice property makes the merged sketch EXACTLY the
    * one-shot sketch, independent of batch boundaries and merge
    * order), and compaction folds rows back to one per group without
    * changing any answer. This is deliberately NOT wired into the MV
    * rewrite rule: a sketch answers COUNT(DISTINCT) approximately at
    * capacity, so substituting it for an exact aggregate must be an
    * explicit caller choice, never a silent plan rewrite.
    *
    * At 100 TB: the daily distinct-count job becomes append-one-
    * partial + merge-k-longs-per-group — the base is never rescanned,
    * and cross-group unions (the 'ALL' row) come from the same arrays.
    */
  def kmvRollupBuild(df: DataFrame, dims: Seq[String], distinctCol: String, k: Int, path: String): Unit = {
    graft.GraftFunctions.register(df.sparkSession)
    df.groupBy(dims.map(col): _*)
      .agg(expr(s"kmv_agg(xxhash64($distinctCol), $k)").as("sk"))
      .write
      .mode("overwrite")
      .parquet(path)
  }

  /** Blind-append a delta's sketch partials (additive-rows contract). */
  def kmvRollupAppend(delta: DataFrame, dims: Seq[String], distinctCol: String, k: Int, path: String): Unit = {
    graft.GraftFunctions.register(delta.sparkSession)
    delta
      .groupBy(dims.map(col): _*)
      .agg(expr(s"kmv_agg(xxhash64($distinctCol), $k)").as("sk"))
      .write
      .mode("append")
      .parquet(path)
  }

  /** Merged per-group sketches from the rollup: bottom-k of each
    * group's accumulated partials. Stored values are sign-flipped
    * hashes, so `array_sort`+`slice` IS the KMV merge.
    */
  def kmvRollupSketches(spark: SparkSession, path: String, dims: Seq[String], k: Int): DataFrame =
    spark.read
      .parquet(path)
      .select(dims.map(col) :+ explode(col("sk")).as("h"): _*)
      .groupBy(dims.map(col): _*)
      .agg(slice(array_sort(collect_set(col("h"))), 1, k).as("sk"))

  /** Distinct-count estimates served from the rollup alone (the base
    * table is never touched): one row per group plus the merged 'ALL'
    * row — per-group COUNT(DISTINCT) results cannot be added, but
    * group sketches union exactly.
    */
  def kmvRollupDistinct(spark: SparkSession, path: String, dims: Seq[String], k: Int): DataFrame = {
    val groups = kmvRollupSketches(spark, path, dims, k)
    val per = groups.select(
      concat_ws("|", dims.map(col): _*).as("scope"),
      round(kmvEstimate(col("sk"), k), 0).cast("long").as("n_distinct")
    )
    val all = groups
      .agg(collect_list("sk").as("sks"))
      .select(
        lit("ALL").as("scope"),
        round(kmvEstimate(slice(array_sort(array_distinct(flatten(col("sks")))), 1, k), k), 0)
          .cast("long")
          .as("n_distinct")
      )
    per.unionByName(all).orderBy("scope")
  }

  /** Fold accumulated partial rows to one merged row per group —
    * answers unchanged by the semilattice property; eager off-table
    * checkpoint before the overwrite (the crash-safe discipline the
    * other standing indexes use).
    */
  def kmvRollupCompact(spark: SparkSession, path: String, dims: Seq[String], k: Int): Unit =
    kmvRollupSketches(spark, path, dims, k)
      .localCheckpoint(eager = true)
      .write
      .mode("overwrite")
      .parquet(path)

  def kmvCheck(spark: SparkSession, dir: String, k: Int = 256): DataFrame = {
    graft.GraftFunctions.register(spark)
    val bound  = 3.0 / math.sqrt((k - 2).toDouble)
    val orders = Tables.orders(spark, dir)

    val skA = orders.repartition(7).agg(expr(s"kmv_agg(xxhash64(o_orderkey), $k)").as("sk"))
    val skB = orders.repartition(13).agg(expr(s"kmv_agg(xxhash64(o_orderkey), $k)").as("sk_b"))
    val exactOrders = orders.agg(countDistinct("o_orderkey").cast("double").as("exact_orders"))

    val perStatus = orders.groupBy("o_orderstatus").agg(expr(s"kmv_agg(xxhash64(o_custkey), $k)").as("sk"))
    val merged = perStatus
      .agg(collect_list("sk").as("sks"))
      .select(slice(array_sort(array_distinct(flatten(col("sks")))), 1, k).as("sk_union"))
    val exactCust = orders.agg(countDistinct("o_custkey").cast("double").as("exact_cust"))

    val custSk  = Tables.customer(spark, dir).agg(expr(s"kmv_agg(xxhash64(c_custkey), $k)").as("sk_cust"))
    val orderSk = orders.agg(expr(s"kmv_agg(xxhash64(o_custkey), $k)").as("sk_ocust"))
    val exactOverlap = Tables
      .customer(spark, dir)
      .join(orders, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(countDistinct("c_custkey").cast("double").as("exact_overlap"))

    skA
      .crossJoin(broadcast(skB))
      .crossJoin(broadcast(exactOrders))
      .crossJoin(broadcast(merged))
      .crossJoin(broadcast(exactCust))
      .crossJoin(broadcast(custSk))
      .crossJoin(broadcast(orderSk))
      .crossJoin(broadcast(exactOverlap))
      .select(
        (col("sk") === col("sk_b")).as("merge_invariant"),
        (abs(kmvEstimate(col("sk"), k) / col("exact_orders") - 1.0) < bound).as("est_ok"),
        (abs(kmvEstimate(col("sk_union"), k) / col("exact_cust") - 1.0) < bound).as("union_ok"),
        (abs(kmvIntersectEstimate(col("sk_ocust"), col("sk_cust"), k) - col("exact_overlap")) <
          greatest(kmvEstimate(kmvUnion(col("sk_ocust"), col("sk_cust"), k), k), col("exact_overlap")) * bound)
          .as("intersect_ok")
      )
  }
}
