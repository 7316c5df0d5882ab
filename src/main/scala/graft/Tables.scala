package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated star schema (TESTDATA.md).
  *
  * All scans are plain parquet reads so Catalyst's column pruning and
  * filter pushdown reach the file format — at 100 TB the difference
  * between a pruned scan and a full scan IS the query time. Do not
  * cache/collect here.
  */
object Tables {

  val starTables: Seq[String] =
    Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events` ships with parquet TIMESTAMP(NANOS) which Spark only
    * reads via `spark.sql.legacy.parquet.nanosAsLong=true` (set in
    * [[GraftSession]]). This loader keeps the raw nanos as `ts_ns` and
    * adds a proper microsecond `ts` timestamp (floor division, matching
    * DuckDB's TIMESTAMP_NS → TIMESTAMP cast).
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))

  /** Register every table as a temp view (SQL surface / grouping sets). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    starTables.foreach(t => load(spark, dir, t).createOrReplaceTempView(t))
}
