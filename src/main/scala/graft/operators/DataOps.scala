package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Corpus-curation utilities for the training-data pipeline: document
  * winnowing fingerprints, deterministic dataset splits, and the
  * salted-join skew recipe.
  */
object DataOps {

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash every
    * k-gram, slide a window of `w` consecutive k-gram hashes, keep each
    * window's minimum — the classic guarantee that any match of length
    * ≥ w+k-1 shares a fingerprint. Hashes use the engine-portable
    * integer scheme (ascii/length mod p) so the DuckDB oracle can
    * replay them exactly; the narrow pass is one window over
    * (doc, position).
    */
  def winnowFingerprints(spark: SparkSession, dir: String, k: Int = 3, w: Int = 4): DataFrame = {
    require(k <= 6, "k-gram multipliers stay overflow-free up to k=6")
    val multipliers = Seq.iterate(1L, k)(_ * 131L)
    val tokVal = (j: Int) => s"(ascii(element_at(tk, i + $j)) * 131 + length(element_at(tk, i + $j))) % 1000003"
    val gramHash = (0 until k).map(j => s"(${tokVal(j)}) * ${multipliers(j)}L").mkString("(", " + ", s") % 1000000007L")
    val grams = Tables
      .documents(spark, dir)
      .select(col("doc_id"), expr(s"filter(split(text, '[^\\\\p{L}]+'), t -> t <> '')").as("tk"))
      .filter(size(col("tk")) >= k)
      .select(
        col("doc_id"),
        posexplode(expr(s"transform(sequence(1, size(tk) - ${k - 1}), i -> $gramHash)")).as(Seq("pos", "gh"))
      )
    val win = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, w - 1)
    grams
      .withColumn("winmin", min("gh").over(win))
      .groupBy(col("doc_id"), col("winmin").as("fp"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy("doc_id", "fp")
  }

  /** Deterministic train/valid/test assignment from a multiplicative
    * id hash — reproducible across engines and runs, no RNG state.
    */
  def datasetSplit(spark: SparkSession, dir: String): DataFrame =
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        ((col("doc_id") * 2654435761L) % 100).as("bucket")
      )
      .withColumn(
        "split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "valid").otherwise("test")
      )
      .select("doc_id", "split")
      .orderBy("doc_id")

  /** Sequence packing: assign documents to fixed-token-budget bins by
    * prefix-sum binning — the batch-construction step between a
    * curated corpus and a trainer. Packing runs WITHIN each source
    * shard (window partitioned by `source`), never as a global ordered
    * window: a single global prefix sum is the one window shape that
    * cannot scale, and real corpora pack per shard anyway. A document
    * straddling a boundary stays in the bin its prefix starts in
    * (contiguous-fill semantics, deterministic by doc_id order).
    */
  def packSequences(spark: SparkSession, dir: String, budgetTokens: Long = 2048L): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables
      .documents(spark, dir)
      .select(
        col("source"),
        col("doc_id"),
        size(expr(s"filter(split(text, '${TextJobs.TokenSep.replace("\\", "\\\\")}'), t -> t <> '')"))
          .cast("long")
          .as("n_tokens")
      )
      .withColumn("cum", sum("n_tokens").over(w))
      .select(
        col("source"),
        col("doc_id"),
        col("n_tokens"),
        floor((col("cum") - col("n_tokens")) / budgetTokens).cast("long").as("bin_id")
      )
      .orderBy("source", "doc_id")
  }

  /** Skew recipe: replicate the small side `salts` ways and scatter the
    * big side's hot keys across them — the manual fallback when AQE's
    * skew-join split isn't available (e.g. a non-shuffle child). Result
    * is identical to the plain join.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val saltedSmall = small.withColumn("__salt", explode(expr(s"sequence(0, ${salts - 1})")))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
