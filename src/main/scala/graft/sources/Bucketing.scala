package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) tables: the co-located-join
  * answer at 100 TB. Writing both fact tables bucketed + sorted on the
  * join key lets every later join between them plan as a sort-merge
  * join with NO exchange and NO sort — the shuffle is paid once at
  * write time and amortized over every subsequent query.
  */
object Bucketing {

  /** Persist `df` as a bucketed, sorted managed table. Drops any prior
    * table AND its leftover location — an in-memory catalog from a
    * previous JVM forgets the table but leaves the files, which makes
    * CREATE TABLE AS fail with LOCATION_ALREADY_EXISTS.
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedKeys(df, table, buckets, Seq(key))

  /** Multi-column variant: bucket + sort on a composite key (e.g. the
    * LSH index's (band, bucket)).
    */
  def writeBucketedKeys(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append to an existing bucketed table with the same bucket spec —
    * new files land in the same bucket layout, so readers keep the
    * exchange-free property as the table grows (the incremental-index
    * write path).
    */
  def appendBucketedKeys(df: DataFrame, table: String, buckets: Int, keys: Seq[String]): Unit =
    df.write
      .mode(SaveMode.Append)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — exchange-free when
    * bucket counts match.
    */
  def cogroupedJoin(spark: SparkSession, leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** The write-aside-then-swap step every standing-index compaction
    * rests on: `write` materializes the compacted copy under the NEW
    * name `table__cpt` (the source table stays live and readable
    * throughout the heavy write), then two metadata operations swap it
    * in. The full data always exists in SOME table — a crash during
    * the write leaves the original untouched, and a crash between drop
    * and rename leaves the complete copy under `__cpt`, which the
    * adoption step at the top of the NEXT run renames into place
    * before compacting again. Never a self-overwriting rewrite — the
    * hazard [[graft.operators.DataOps.compactParquet]] documents. One
    * protocol for every index table (bucketed or plain) across every
    * index family (BM25 postings, gram/phrase grams, LSH bands,
    * semantic cells, IVF×PQ codes), so the recovery logic has exactly
    * one implementation.
    */
  private[graft] def swapInCompacted(spark: SparkSession, table: String)(write: String => Unit): Unit = {
    val tmp = s"${table}__cpt"
    // crash recovery: a previous run may have dropped `table` after
    // fully writing `tmp` — adopt the surviving copy before compacting
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(tmp)) {
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      spark.catalog.refreshTable(table)
    }
    write(tmp)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.catalog.refreshTable(table)
  }

  /** Compact a bucketed index table in place via [[swapInCompacted]]:
    * re-bucket the current rows into fresh files (optionally folding
    * rows first via `fold`). Probe results are unchanged by
    * construction — readers of append-accumulated tables already
    * aggregate — so this is purely a read-amplification reset. The
    * pre-write repartition keys on the BUCKET-ID EXPRESSION
    * (pmod(hash(keys), buckets)), which confines every bucket to one
    * writer task → exactly one file per non-empty bucket.
    * Repartitioning on the raw keys does NOT work here: the source is
    * itself a bucketed table, whose scan already reports the requested
    * hash partitioning, so the planner elides that shuffle and the
    * plain multi-file scan layout leaks straight into the "compacted"
    * write (measured: a 64-file table re-"compacting" to 64 files).
    */
  private[graft] def compactBucketed(
      spark: SparkSession,
      table: String,
      buckets: Int,
      keys: Seq[String],
      fold: DataFrame => DataFrame = identity
  ): Unit =
    swapInCompacted(spark, table) { tmp =>
      import org.apache.spark.sql.functions.{col, hash, lit, pmod}
      writeBucketedKeys(
        fold(spark.table(table)).repartition(buckets, pmod(hash(keys.map(col): _*), lit(buckets))),
        tmp,
        buckets,
        keys
      )
    }
}
