package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** One-off sf1 timing probe for the BM25 paths (SCALE.md evidence):
  * the key-shifted sf1 corpus makes every vocabulary term hot in ~90%
  * of 50k docs, so query-term postings are candidate sets of nearly
  * the whole corpus — the adversarial (stop-word query) regime for a
  * retrieval operator. Two timed rounds each: the second
  * `bm25_index_topk` round measures the pure probe (index memoized).
  */
object Bm25Sf1Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_sf1"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    val spark = GraftSession.requiredConfs
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.prepare(spark)
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("text_bm25_topk", "bm25_index_topk", "text_bm25_topk", "bm25_index_topk")
    names.foreach { name =>
      val t0 = System.nanoTime()
      val n  = SparkEntry.queries(name)(spark, dir).collect().length
      println(f"[bm25sf1] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
