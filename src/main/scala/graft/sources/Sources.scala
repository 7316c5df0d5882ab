package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY.md §2.2 "Scans/sources" / "Sinks").
  *
  * Reference parity is the whole-text directory scan (main.go:94-118)
  * and the `key: value` text sink (reducer.go:113-132) — both live in
  * [[graft.operators.TextJobs]]. This module adds the analytics
  * formats: parquet (primary, splittable + predicate pushdown +
  * column pruning), CSV and JSON lines (with explicit schemas — schema
  * inference is a full extra scan and is banned at 100 TB), and
  * partitioned parquet writes for layout-aware downstream reads.
  */
object Sources {

  // ------------------------------------------------------------ readers

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema; header expected. */
  def csv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** JSON lines with explicit schema. */
  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Whole text files: (file, text) rows — one row per file. */
  def wholeText(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextJobs.corpus(spark, dir)

  /** ORC — the second splittable columnar format with predicate
    * pushdown and column pruning (same scan contract as parquet).
    */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  // ------------------------------------------------------------- sinks

  def writeParquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def writeOrc(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Reference-format sink: sorted `key: value` lines (TextJobs). */
  def writeKeyValueText(df: DataFrame, keyCol: String, valueCol: String, path: String): Unit =
    graft.operators.TextJobs.sinkText(df, keyCol, valueCol, path)

  /** Reference-format source: `key: value` text read through the
    * [[KvTextTableProvider]] DataSource V2 connector (column pruning +
    * filter + limit pushdown) — the read half of reference parity, so
    * existing reference output directories are directly queryable.
    */
  def keyValueText(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-kv").load(path)

  /** Avro container files through the [[AvroTableProvider]] V2
    * connector (schema from one container header, column pruning,
    * commit-protocol writes) — the spark-avro module isn't shipped in
    * this environment, so the connector is built on the core avro
    * runtime directly.
    */
  def avro(spark: SparkSession, path: String): DataFrame =
    spark.read.format("graft-avro").load(path)

  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.format("graft-avro").mode(SaveMode.Overwrite).save(path)
}
