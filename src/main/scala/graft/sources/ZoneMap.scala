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
      files: Int = 16,
      bloomCols: Seq[String] = Nil,
      bloomItems: Long = 100000L,
      bloomBits: Long = 800000L
  ): Unit = {
    require(clusterCols.nonEmpty && statsCols.nonEmpty)
    graft.GraftFunctions.register(spark)
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write
      .mode("overwrite")
      .parquet(s"$path/data")
    val aggs = statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      // per-file bloom over the column's xxhash64 — the point-predicate
      // complement to min/max: an UNCLUSTERED column's ranges cover
      // everything, but its values still live in few files
      bloomCols.map(c => expr(s"graft_bloom_agg(xxhash64($c), ${bloomItems}L, ${bloomBits}L)").as(s"bloom_$c"))
    spark.read
      .parquet(s"$path/data")
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .coalesce(1)
      .write
      .mode("overwrite")
      .parquet(s"$path/zonemap")
  }

  /** Append a batch to a zone-mapped layout: the batch's files land
    * beside the existing ones (clustered within the batch) and their
    * stats rows APPEND to the manifest — the additive-rows contract
    * every standing structure here uses, so ingest never rewrites the
    * layout. Appended ranges may overlap old files' ranges; pruning
    * stays correct (it is a necessary condition) and merely weakens
    * until a periodic [[writeWithZoneMap]] re-cluster. The column set
    * must match the build (stats derive from the manifest schema).
    */
  def appendWithZoneMap(
      spark: SparkSession,
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      statsCols: Seq[String],
      files: Int = 4,
      bloomCols: Seq[String] = Nil,
      bloomItems: Long = 100000L,
      bloomBits: Long = 800000L
  ): Unit = {
    graft.GraftFunctions.register(spark)
    val fs = new org.apache.hadoop.fs.Path(s"$path/data")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val before = FsListing
      .listDataFiles(fs, new org.apache.hadoop.fs.Path(s"$path/data"))
      .map(_.getPath.toUri.getPath)
      .toSet
    df.repartitionByRange(files, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
      .write
      .mode("append")
      .parquet(s"$path/data")
    val newFiles = FsListing
      .listDataFiles(fs, new org.apache.hadoop.fs.Path(s"$path/data"))
      .map(_.getPath.toUri.getPath)
      .filterNot(before)
    val aggs = statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      bloomCols.map(c => expr(s"graft_bloom_agg(xxhash64($c), ${bloomItems}L, ${bloomBits}L)").as(s"bloom_$c"))
    spark.read
      .parquet(newFiles: _*)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .coalesce(1)
      .write
      .mode("append")
      .parquet(s"$path/zonemap")
  }

  /** xxhash64 of a literal under Spark's expression semantics (seed
    * 42) — evaluated through the engine itself so the probe hash can
    * never drift from the hash the bloom ingested.
    */
  private def xxhashOf(spark: SparkSession, value: Any): Long =
    spark.range(1).select(xxhash64(lit(value))).head().getLong(0)

  /** Surviving files for a point predicate `col = value`, by probing
    * each file's bloom in the manifest. A file whose bloom is NULL
    * (all-NULL column) can never match a point predicate and is
    * pruned.
    */
  def pruneFilesPoint(spark: SparkSession, path: String, column: String, value: Any): (Seq[String], Long) = {
    val h = xxhashOf(spark, value)
    val zm = spark.read.parquet(s"$path/zonemap")
    // EXECUTOR-side probe: only survivor NAMES reach the driver. The
    // 100 TB knob — 200 k files × ~100 KB of bloom is ~20 GB of filter
    // state, fine to stream through executors, fatal to collect. (A
    // UDF is honest here: the input is the manifest, never the data.)
    val mightContain = udf { (bytes: Array[Byte]) =>
      bytes != null &&
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .mightContainLong(h)
    }
    val total     = zm.count()
    val survivors = zm.filter(mightContain(col(s"bloom_$column"))).select("file").collect().map(_.getString(0)).toSeq
    (survivors, total)
  }

  /** Point-lookup read: bloom-prune files, scan survivors, re-apply
    * the exact equality (bloom skipping is a necessary condition with
    * false positives, never false negatives).
    */
  def prunedPointRead(spark: SparkSession, path: String, column: String, value: Any): DataFrame = {
    val (survivors, _) = pruneFilesPoint(spark, path, column, value)
    if (survivors.isEmpty)
      spark.read.parquet(s"$path/data").filter(lit(false))
    else
      spark.read.parquet(survivors: _*).filter(col(column) === lit(value))
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
