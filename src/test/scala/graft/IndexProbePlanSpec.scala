package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextAnalysis}

/** In-query plan assertions for the two hottest standing-index probes
  * (the pageRankBucketed refuse-if-degraded convention, spread per
  * VERDICT r13 item 8): the probe bodies now REQUIRE their pruned-scan
  * / broadcast-only shape and refuse to run degraded. These tests
  * re-derive the counts on the returned plans (so a future weakening
  * of the in-body assertion fails a test, not just a docstring) and
  * demonstrate the refusal on a genuinely degraded index layout.
  */
class IndexProbePlanSpec extends SparkSpec {

  test("bm25IndexProbe plan: postings scan bucket-pruned to the query terms") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    TextAnalysis.buildBm25Index(docs, "t_probe_plan")
    val ranked = TextAnalysis.bm25IndexProbe(spark, "t_probe_plan")
    val plan   = ranked.queryExecution.executedPlan.toString
    val pruned = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      .findAllMatchIn(plan)
      .map(mm => (mm.group(1).toInt, mm.group(2).toInt))
      .toSeq
    val nTerms = TextAnalysis.defaultBm25Queries.flatMap(_._2).distinct.size
    assert(
      pruned.exists { case (n, total) => n < total && n <= nTerms },
      s"expected a postings scan pruned to <= $nTerms of 32 buckets, saw $pruned\n" + plan.take(2000)
    )
    assert(ranked.count() > 0)
  }

  test("bm25IndexProbe refuses an index whose postings lost their bucket layout") {
    // simulate the degradation the assertion exists for: the same
    // three tables, but postings re-written as a PLAIN parquet table
    // (no bucket spec) — the literal filter can no longer prune, and
    // the probe must refuse rather than full-scan the standing index
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    TextAnalysis.buildBm25Index(docs, "t_probe_flat_src")
    Seq("postings", "docstats", "stats").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS t_probe_flat_$t")
      // a previous JVM's in-memory catalog forgot the table but left
      // its files — clear the location like Bucketing.writeBucketedKeys
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"t_probe_flat_$t"
      )
      loc.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(loc, true)
      spark.table(s"t_probe_flat_src_$t").write.format("parquet").saveAsTable(s"t_probe_flat_$t")
    }
    val ex = intercept[IllegalArgumentException] {
      TextAnalysis.bm25IndexProbe(spark, "t_probe_flat")
    }
    assert(ex.getMessage.contains("not bucket-pruned"), ex.getMessage)
  }

  test("ivfPqProbe plan: codes relation never shuffled — broadcasts only, candidate-grain exchanges") {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.buildIvfPqIndex(e, "t_probe_ann")
    val ranked = Similarity.ivfPqProbe(
      spark,
      "t_probe_ann",
      e.filter(col("vec_id") % 50 === 0).select(col("vec_id").as("qid"), col("embedding")),
      excludeSelf = true
    )
    val plan = ranked.queryExecution.executedPlan.toString
    assert("SortMergeJoin".r.findAllIn(plan).isEmpty, plan.take(2000))
    assert("ShuffledHashJoin".r.findAllIn(plan).isEmpty, plan.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(ranked.count() > 0)
  }
}
