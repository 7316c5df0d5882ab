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
