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
}
