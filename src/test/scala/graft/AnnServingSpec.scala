package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.streaming.AnnServing

/** Streaming ANN serving parity: draining a query stream through the
  * standing IVF×PQ index must produce exactly the rows the batch probe
  * produces for the same query set — micro-batch boundaries must be
  * invisible (each query's answer depends only on the index, never on
  * which batch carried the query).
  */
class AnnServingSpec extends SparkSpec {

  test("streaming probe == batch probe over the same query set, across micro-batch boundaries") {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.buildIvfPqIndex(e, "t_ann_serve")
    val queries = e.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("embedding"))

    val streamDir = java.nio.file.Files.createTempDirectory("graft_ann_in")
    val outDir    = java.nio.file.Files.createTempDirectory("graft_ann_out").resolve("answers")
    val ckpt      = java.nio.file.Files.createTempDirectory("graft_ann_ck")
    // two files → two micro-batches under maxFilesPerTrigger=1
    queries.filter(col("qid") < 250).coalesce(1).write.parquet(streamDir.resolve("b1").toString)
    queries.filter(col("qid") >= 250).coalesce(1).write.parquet(streamDir.resolve("b2").toString)

    val stream = spark.readStream
      .schema(queries.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$streamDir/*")
    val query = AnnServing.streamProbe(
      spark,
      stream,
      "t_ann_serve",
      outDir.toString,
      ckpt.toString,
      excludeSelf = true
    )
    try query.awaitTermination()
    finally query.stop()

    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val streamed = rows(spark.read.parquet(outDir.toString))
    val batch    = rows(Similarity.ivfPqProbe(spark, "t_ann_serve", queries, excludeSelf = true))
    assert(batch.nonEmpty)
    assert(streamed == batch, "streaming answers diverged from the batch probe")
    // every query that went in came back answered
    assert(
      streamed.map(_._1) == queries.collect().map(_.getLong(0)).toSet,
      "some streamed queries returned no answers"
    )
  }
}
