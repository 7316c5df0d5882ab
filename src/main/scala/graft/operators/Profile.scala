package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ANALYZE-style table profiling: per-column statistics (row count,
  * null count, exact distinct count) in ONE pass over the table — the
  * stats-collection operator a warehouse runs before trusting join
  * reorder / broadcast decisions, and the health check an ingest
  * pipeline runs per batch (a null-count jump or an ndv collapse is
  * how schema drift and join-key corruption surface first).
  *
  * Shape: a single Aggregate with `count(c)` + `count(DISTINCT c)`
  * per column — Spark plans the multi-distinct via Expand (one row
  * per distinct-column per input row) with partial aggregation, which
  * distributes; the result then unpivots to one row per column. Exact
  * ndv is deliberate (this is the correctness-auditable profile; the
  * sketch-backed rollup [[Sketches.kmvRollupDistinct]] is the
  * standing approximate tier for when a full shuffle per batch is too
  * much).
  */
object Profile {

  /** Join-key skew report: the k hottest keys with exact counts plus
    * the table's total row and distinct-key counts (all integers —
    * the skew ratio cnt·n_keys/n_rows is derivable exactly, no float
    * in the artifact). This is the pre-flight check for the salting /
    * AQE-skew recipes: a top key holding >>1/n_keys of the rows is
    * the partition that stalls a 1000-executor join. Selection is
    * orderBy+limit — TakeOrderedAndProject, k rows to the driver,
    * never a global window.
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"))
    counts
      .orderBy(col("cnt").desc, col(keyCol).asc)
      .limit(k)
      .crossJoin(broadcast(totals))
      .select(col(keyCol).as("key"), col("cnt"), col("n_keys"), col("n_rows"))
      .orderBy(col("cnt").desc, col("key").asc)
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty)
    val n = count(lit(1)).as("__n")
    val aggs = cols.flatMap(c => Seq(count(col(c)).as(s"__nn_$c"), countDistinct(col(c)).as(s"__ndv_$c")))
    val wide = df.agg(n, aggs: _*)
    val stackExpr = cols
      .map(c => s"'$c', __nn_$c, __ndv_$c")
      .mkString(s"stack(${cols.length}, ", ", ", ")")
    wide
      .select(col("__n"), expr(s"$stackExpr AS (col_name, n_non_null, ndv)"))
      .select(
        col("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col("n_non_null")).as("n_nulls"),
        col("ndv")
      )
      .orderBy("col_name")
  }
}
