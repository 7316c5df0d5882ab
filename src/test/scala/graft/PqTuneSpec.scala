package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Temporary tuning probe — prints PQ recall for candidate configs. */
class PqTuneSpec extends SparkSpec {
  test("measure pq recall configs") {
    val brute = Similarity.bruteForceTopK(spark, sfDir)
      .select(col("qid"), col("cand")).collect().map(r => (r.getLong(0), r.getLong(2 - 2))).toSet
    def recall(m: Int, k: Int): Double = {
      val pq = Similarity.pqTopK(spark, sfDir, m = m, codebookK = k)
        .select(col("qid"), col("cand")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val bruteSet = Similarity.bruteForceTopK(spark, sfDir)
        .select(col("qid"), col("cand")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      bruteSet.intersect(pq).size.toDouble / bruteSet.size
    }
    for ((m, k) <- Seq((8, 16), (8, 32), (16, 16), (16, 32), (16, 64)))
      info(f"m=$m k=$k recall=${recall(m, k)}%.3f")
  }
}
