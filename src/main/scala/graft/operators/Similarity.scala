package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the embedding column (BASELINE.json north
  * star).
  *
  * Two tiers:
  *   - brute-force top-k: exact, O(|Q|·|C|) — the correctness baseline
  *     and perfectly fine when the query set is small (it broadcasts);
  *   - random-hyperplane LSH ANN: candidates restricted to shared
  *     hash buckets, so the candidate-scoring join shuffles by bucket
  *     key instead of materializing the cross product — the 100 TB
  *     path. Hyperplanes are derived deterministically from xxhash64
  *     so results are reproducible with no driver-side randomness.
  */
object Similarity {

  /** Exact brute-force top-k cosine neighbors for a query subset.
    * The query side is tiny → broadcast; the candidate scan never
    * shuffles until the final per-query top-k (window over qid).
    */
  def bruteForceTopK(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      queryFilter: String = "vec_id % 100 = 0"
  ): DataFrame = {
    graft.GraftFunctions.register(spark)
    val e       = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val queries = e.filter(expr(queryFilter)).select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val w       = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand"))
    e.select(col("vec_id").as("cand"), col("embedding").as("ce"))
      .join(broadcast(queries), col("qid") =!= col("cand"))
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cand"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rnk")
  }

  /** Sign-bit LSH codes: `numPlanes` deterministic hyperplanes; code =
    * bits of sign(dot(v, plane)). Computed fully inside codegen via
    * array lambdas (no UDF, no driver-side plane materialization —
    * the planes are hash-derived per (plane, dim) on the fly).
    */
  def hyperplaneCodes(df: DataFrame, numPlanes: Int, vecCol: String = "embedding", idCol: String = "vec_id"): DataFrame = {
    // weight(p, d) = (xxhash64(p * 4096 + d) % 10001) / 10000.0  ∈ (-1, 1)
    val code = expr(
      s"""aggregate(
         |  transform(sequence(0, ${numPlanes - 1}), p ->
         |    if(aggregate(
         |         zip_with($vecCol, sequence(0, size($vecCol) - 1),
         |                  (x, d) -> cast(x as double) * ((xxhash64(p * 4096 + d) % 10001) / 10000.0d)),
         |         0.0d, (acc, v) -> acc + v) >= 0.0d,
         |       shiftleft(1L, p), 0L)),
         |  0L, (acc, v) -> acc | v)""".stripMargin
    )
    df.select(col(idCol), col(vecCol), code.as("lsh_code"))
  }

  /** ANN via multi-probe banding of the sign bits: split the
    * `numPlanes`-bit code into `bands` sub-codes; vectors sharing any
    * sub-code are candidates, then exact cosine rescoring + top-k.
    */
  def annLshTopK(
      spark: SparkSession,
      dir: String,
      k: Int = 5,
      numPlanes: Int = 16,
      bands: Int = 4,
      queryFilter: String = "vec_id % 100 = 0"
  ): DataFrame = {
    graft.GraftFunctions.register(spark)
    val bandBits = numPlanes / bands
    val coded    = hyperplaneCodes(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")), numPlanes)
    val banded = coded.select(
      col("vec_id"),
      col("embedding"),
      posexplode(
        expr(
          s"transform(sequence(0, ${bands - 1}), c -> shiftright(lsh_code, c * $bandBits) & ${(1L << bandBits) - 1})"
        )
      ).as(Seq("band", "sub_code"))
    )
    val queries = banded
      .filter(expr(queryFilter))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"), col("band"), col("sub_code"))
    val cands = banded
      .join(queries, Seq("band", "sub_code"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("qe"), col("vec_id").as("cand"), col("embedding").as("ce"))
      .distinct()
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cand"))
    cands
      .withColumn("cos", expr("cosine_sim(qe, ce)"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("rnk"), col("cand"), round(col("cos"), 4).as("cos"))
      .orderBy("qid", "rnk")
  }
}
