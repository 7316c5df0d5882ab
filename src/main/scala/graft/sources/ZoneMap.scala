package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level data skipping from an explicit min/max stats manifest —
  * the zone-map layer that sits ABOVE parquet's own row-group pruning.
  * Parquet min/max can only skip row groups inside files the scan has
  * already listed and opened; at 100 TB the win is not opening (or even
  * scheduling) the files at all. The manifest is a tiny parquet table
  * (one row per data file) read driver-side in milliseconds, exactly
  * the Delta/Iceberg "data skipping" design, and it composes with
  * [[graft.operators.DataOps.zOrderWrite]]: a z-ordered layout makes
  * BOTH dimensions' per-file ranges narrow, so a 2-D rectangle
  * predicate prunes multiplicatively.
  *
  * Correctness does not depend on the layout: pruning drops a file only
  * when the predicate interval cannot intersect the file's [min, max],
  * and the exact predicate is re-applied to the surviving rows, so a
  * badly-clustered table merely prunes less. NULL handling: a file's
  * min/max ignore NULLs (Spark `min`/`max` semantics), and an
  * interval predicate never matches NULL, so all-NULL files (min IS
  * NULL in the manifest) are safely prunable for interval predicates.
  */
object ZoneMap {

  /** Cluster `df` by `clusterCols` (range partition + in-partition
    * sort, one file per range) and write it with a zone-map manifest
    * covering `statsCols`. Layout:
    * `path/data/` — the clustered parquet; `path/zonemap/` — one row
    * per data file: (file, n_rows, min_<c>, max_<c> per stats col).
    * The manifest is derived from the data actually written (grouped
    * by `input_file_name()`), so it can never disagree with the files.
    */
  def writeWithZoneMap(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      statsCols: Seq[String],
      files: Int = 16
  ): Unit = {
    require(clusterCols.nonEmpty && statsCols.nonEmpty)
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(s"$path/data")
    val aggs = statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read
      .parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/zonemap")
  }

  /** Surviving data files for a conjunction of closed-interval
    * predicates `col BETWEEN lo AND hi` (pass `None` for an open
    * side). Returns (survivors, totalFiles) — the manifest scan is
    * driver-side over one tiny parquet.
    */
  def pruneFiles(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Option[Any], Option[Any])]
  ): (Seq[String], Long) = {
    val zm = spark.read.parquet(s"$path/zonemap")
    val keep = ranges
      .map { case (c, lo, hi) =>
        // file intersects [lo, hi] iff max >= lo AND min <= hi; an
        // all-NULL file (min/max NULL) can never satisfy an interval
        val noNulls = col(s"min_$c").isNotNull
        val loOk    = lo.map(v => col(s"max_$c") >= lit(v)).getOrElse(lit(true))
        val hiOk    = hi.map(v => col(s"min_$c") <= lit(v)).getOrElse(lit(true))
        noNulls && loOk && hiOk
      }
      .reduce(_ && _)
    val total     = zm.count()
    val survivors = zm.filter(keep).select("file").collect().map(_.getString(0)).toSeq
    (survivors, total)
  }

  /** Read with file-level skipping: prune via the manifest, scan only
    * the surviving files, then re-apply the EXACT interval predicate
    * (pruning is necessary-condition only). Zero survivors short-
    * circuits to an empty frame with the data schema — no scan at all.
    */
  def prunedRead(
      spark: SparkSession,
      path: String,
      ranges: Seq[(String, Option[Any], Option[Any])]
  ): DataFrame = {
    val (survivors, _) = pruneFiles(spark, path, ranges)
    val exact = ranges
      .map { case (c, lo, hi) =>
        val loOk = lo.map(v => col(c) >= lit(v)).getOrElse(lit(true))
        val hiOk = hi.map(v => col(c) <= lit(v)).getOrElse(lit(true))
        loOk && hiOk
      }
      .reduce(_ && _)
    if (survivors.isEmpty)
      spark.read.parquet(s"$path/data").filter(lit(false))
    else
      spark.read.parquet(survivors: _*).filter(exact)
  }
}
