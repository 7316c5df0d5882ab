package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Exact secondary POINT-LOOKUP index for `graft-log` tables — the
  * third data-skipping tier next to zone-map sidecars (range
  * predicates) and bloom sidecars (probabilistic membership): an
  * exact posting relation `(value, file)` listing every data file
  * containing at least one row with `column = value`, plus a coverage
  * relation of indexed file names. This is the record-index answer to
  * "fetch THIS key from a 100 TB table": the probe reads the
  * metadata-sized postings, intersects the hits with the live
  * manifest, and scans only those files — O(files containing the key)
  * instead of O(table), with zone maps useless when the key column is
  * not the clustering order.
  *
  * Maintenance is INCREMENTAL and O(new files): data files are
  * immutable, so [[refresh]] indexes exactly the manifest files not
  * yet covered and appends their postings — appends, compactions, and
  * copy-on-write rewrites all reduce to "index the new files".
  * Entries for files no longer in the live manifest are harmless (the
  * probe intersects with the manifest), so no tombstoning is ever
  * needed; merge-on-read deletes don't touch the index at all (the
  * probe applies the version's deletion vectors after the file scan,
  * like every other read path). Like compaction, index maintenance is
  * a single-maintainer operation; probes against a stale index are
  * refused loudly by the coverage check rather than silently missing
  * rows.
  *
  * Integral key columns only (the point-lookup domain), refused
  * loudly otherwise; NULL key values are never indexed — an equality
  * probe cannot match NULL.
  */
object ValueIndex {

  private def root(path: String, column: String)  = s"$path/_idx/$column"
  private def parts(path: String, column: String) = s"${root(path, column)}/parts"
  private def filesRel(path: String, column: String) = s"${root(path, column)}/files"

  private def requireIntegral(spark: SparkSession, path: String, column: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    val v = SnapshotTable.latestVersion(spark, path)
    require(v > 0, s"no table at $path")
    val schema = SnapshotTable.schemaAsOf(spark, path, v)
      .getOrElse(SnapshotTable.read(spark, path).schema)
    val f = schema.fields
      .find(_.name == column)
      .getOrElse(throw new IllegalArgumentException(s"valueIndex: no column $column in $path"))
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    require(
      integral.contains(f.dataType),
      s"valueIndex: $column is ${f.dataType.simpleString} — integral key columns only"
    )
  }

  private def coveredFiles(spark: SparkSession, path: String, column: String): Set[String] = {
    val f = SnapshotTable.fs(spark, path)
    if (!f.exists(new Path(filesRel(path, column)))) Set.empty
    else spark.read.parquet(filesRel(path, column)).collect().map(_.getString(0)).toSet
  }

  /** Index every data file of the CURRENT version not yet covered.
    * Returns how many files were newly indexed (0 = already current).
    * Cost: one scan of the NEW files only — the incremental-
    * maintenance contract that makes the index affordable under
    * streaming appends and compactions.
    */
  def refresh(spark: SparkSession, path: String, column: String): Long = {
    requireIntegral(spark, path, column)
    val v         = SnapshotTable.latestVersion(spark, path)
    val (data, _) = SnapshotTable.splitManifest(SnapshotTable.readManifest(spark, path, v))
    val todo      = data.filterNot(coveredFiles(spark, path, column))
    if (todo.isEmpty) return 0L
    import spark.implicits._
    val schema = SnapshotTable.schemaAsOf(spark, path, v)
    SnapshotTable
      .scanWithPos(spark, path, todo, schema)
      .filter(col(column).isNotNull)
      .select(col(column).cast("long").as("value"), col("__graft_file").as("file"))
      .distinct()
      .write.mode("append").parquet(parts(path, column))
    todo.toDF("file").write.mode("append").parquet(filesRel(path, column))
    todo.length.toLong
  }

  /** Build the index from scratch over the current version (drops any
    * existing index on `column` first).
    */
  def build(spark: SparkSession, path: String, column: String): Long = {
    requireIntegral(spark, path, column)
    val f = SnapshotTable.fs(spark, path)
    f.delete(new Path(root(path, column)), true)
    refresh(spark, path, column)
  }

  /** The live files a probe for `value` must scan, and the version's
    * total data file count — exposed for engagement assertions.
    * Requires FULL coverage of the current version (a partially
    * covered index would silently miss rows — refused loudly;
    * [[refresh]] first).
    */
  def hitFiles(spark: SparkSession, path: String, column: String, value: Long): (Seq[String], Long) = {
    val v         = SnapshotTable.latestVersion(spark, path)
    require(v > 0, s"no table at $path")
    val (data, _) = SnapshotTable.splitManifest(SnapshotTable.readManifest(spark, path, v))
    val covered   = coveredFiles(spark, path, column)
    val missing   = data.filterNot(covered)
    require(
      missing.isEmpty,
      s"valueIndex on $path.$column does not cover ${missing.length} of ${data.length} live files — refresh() first"
    )
    val hits = spark.read
      .parquet(parts(path, column))
      .filter(col("value") === value)
      .select("file")
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    // intersect with the LIVE manifest: postings of vacuumed/rewritten
    // files are harmless leftovers, never scanned
    (data.filter(hits), data.length.toLong)
  }

  /** Point lookup through the index: scan only the files whose
    * postings contain `value`, apply the version's deletion vectors,
    * re-apply the exact predicate. Value-absent probes return an
    * empty (correctly-typed) relation without touching any data file.
    */
  def pointRead(spark: SparkSession, path: String, column: String, value: Long): DataFrame = {
    val (files, _) = hitFiles(spark, path, column, value)
    if (files.isEmpty) return SnapshotTable.read(spark, path).filter(lit(false))
    val v      = SnapshotTable.latestVersion(spark, path)
    val dvs    = SnapshotTable.splitManifest(SnapshotTable.readManifest(spark, path, v))._2
    val schema = SnapshotTable.schemaAsOf(spark, path, v)
    val scanned =
      if (dvs.isEmpty)
        schema
          .map(spark.read.schema)
          .getOrElse(spark.read)
          .parquet(files.map(SnapshotTable.fileRef(path, _)): _*)
      else
        SnapshotTable
          .minusDv(spark, path, SnapshotTable.scanWithPos(spark, path, files, schema), dvs)
          .drop("__graft_file", "__graft_pos")
    scanned.filter(col(column) === value)
  }
}
