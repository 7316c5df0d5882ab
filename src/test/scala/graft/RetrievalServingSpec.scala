package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis
import graft.streaming.RetrievalServing

/** Streaming BM25 serving parity: draining a query stream through the
  * standing postings index must produce exactly the rows the batch
  * probe produces for the same query set — micro-batch boundaries must
  * be invisible (each query's answer depends only on the index, never
  * on which batch carried the query).
  */
class RetrievalServingSpec extends SparkSpec {

  test("streaming BM25 == batch probe over the same query set, across micro-batch boundaries") {
    val sess = spark
    import sess.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    TextAnalysis.buildBm25Index(docs, "t_bm25_serve")

    val queries = TextAnalysis.defaultBm25Queries
    val qdf     = queries.map { case (qid, ts) => (qid, ts) }.toDF("query_id", "terms")

    val streamDir = java.nio.file.Files.createTempDirectory("graft_bm25_in")
    val outDir    = java.nio.file.Files.createTempDirectory("graft_bm25_out").resolve("answers")
    val ckpt      = java.nio.file.Files.createTempDirectory("graft_bm25_ck")
    // two files → two micro-batches under maxFilesPerTrigger=1
    qdf.filter(col("query_id") < 2).coalesce(1).write.parquet(streamDir.resolve("b1").toString)
    qdf.filter(col("query_id") >= 2).coalesce(1).write.parquet(streamDir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(qdf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/*")
    val query = RetrievalServing.streamBm25(
      spark,
      stream,
      "t_bm25_serve",
      outDir.toString,
      ckpt.toString
    )
    try query.awaitTermination()
    finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "doc_id", "score")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val streamed = rows(spark.read.parquet(outDir.toString))
    val batch    = rows(TextAnalysis.bm25IndexProbe(spark, "t_bm25_serve", queries))
    assert(batch.nonEmpty)
    assert(streamed == batch, "streaming answers diverged from the batch probe")
    assert(
      streamed.map(_._1) == queries.map(_._1).toSet,
      "some streamed queries returned no answers"
    )
  }

  test("streaming QL == batch probe over the same query set, across micro-batch boundaries") {
    val sess = spark
    import sess.implicits._
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    TextAnalysis.buildBm25Index(docs, "t_ql_serve")

    val queries = TextAnalysis.defaultBm25Queries
    // LONG query_id on the wire: the serving drain must cast, not
    // assume int (the natural id type elsewhere in the repo is long)
    val qdf = queries.map { case (qid, ts) => (qid.toLong, ts) }.toDF("query_id", "terms")

    val streamDir = java.nio.file.Files.createTempDirectory("graft_ql_in")
    val outDir    = java.nio.file.Files.createTempDirectory("graft_ql_out").resolve("answers")
    val ckpt      = java.nio.file.Files.createTempDirectory("graft_ql_ck")
    qdf.filter(col("query_id") < 2).coalesce(1).write.parquet(streamDir.resolve("b1").toString)
    qdf.filter(col("query_id") >= 2).coalesce(1).write.parquet(streamDir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(qdf.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/*")
    val query = RetrievalServing.streamQl(
      spark,
      stream,
      "t_ql_serve",
      outDir.toString,
      ckpt.toString
    )
    try query.awaitTermination()
    finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "rnk", "doc_id", "score")
        .collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSet
    val streamed = rows(spark.read.parquet(outDir.toString))
    val batch    = rows(TextAnalysis.qlIndexProbe(spark, "t_ql_serve", queries))
    assert(batch.nonEmpty)
    assert(streamed == batch, "streaming QL answers diverged from the batch probe")
    assert(
      streamed.map(_._1) == queries.map(_._1).toSet,
      "some streamed queries returned no answers"
    )
  }
}
