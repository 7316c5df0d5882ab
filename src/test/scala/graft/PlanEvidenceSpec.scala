package graft

import org.apache.spark.sql.execution.FormattedMode

import graft.plans.ScaleDemos

/** Plan-shape evidence for the runtime optimizations the 100 TB claims
  * lean on: the runtime bloom filter must reach the fact scan, and AQE
  * must split the skewed partition at execution time.
  */
class PlanEvidenceSpec extends SparkSpec {

  test("runtime bloom filter from the selective side reaches the fact scan") {
    ScaleDemos.withBloomConfs(spark) {
      val df   = ScaleDemos.bloomFilterJoin(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan.toString
      assert(
        plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"no bloom filter injected:\n$plan"
      )
      // and the result is still correct vs the plain plan
      val n = df.collect().head.getLong(0)
      val plain = Tables
        .lineitem(spark, sfDir)
        .join(
          Tables.orders(spark, sfDir).filter(org.apache.spark.sql.functions.col("o_totalprice") > 450000.0),
          org.apache.spark.sql.functions.col("l_orderkey") === org.apache.spark.sql.functions.col("o_orderkey")
        )
        .count()
      assert(n == plain, s"bloom-filtered join changed the answer: $n vs $plain")
    }
  }

  test("bm25 executes the tokenize+tf shuffle once, reused across its consumers") {
    // the static plan shows the tf subtree (scan → tokenize → partial
    // agg → exchange) under four consumers (postings ×2, dl, token
    // total); at runtime AQE's stage cache must collapse those
    // canonically-equal exchanges to ONE executed map stage — at
    // corpus scale the difference is one tokenize pass vs four
    val df = operators.TextAnalysis.bm25TopK(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.explainString(FormattedMode)
    assert(finalPlan.contains("isFinalPlan=true"), "AQE final plan not materialized")
    // the invariant that matters is the SCAN count: with stage reuse
    // working, the executed plan holds exactly 2 scans (the tf map
    // stage and the metadata-cheap N count); without it the four tf
    // consumers each re-scan (4+). Reuse can surface as either
    // ReusedQueryStage or ReusedExchange depending on the Spark
    // version's stage-cache behavior, so the marker count itself is
    // not asserted — only its observable effect.
    val executed = finalPlan.split("== Initial Plan ==")(0)
    val scans    = "Scan parquet".r.findAllIn(executed).length
    assert(scans <= 2,
      s"expected <=2 executed documents scans (tf stage reused across consumers), found $scans:\n$executed")
  }

  test("nb_classify executes a bounded number of documents scans (model subtree reused)") {
    // the corpus tokenizes ONCE into a checkpointed token relation and
    // the doc directory is one pruned doc_id/lang scan — every fit and
    // score consumer derives from those two relations, so the executed
    // plan holds at most 2 parquet scans (it was 24 static → 4 before
    // the shared-tokenize refactor)
    val df = operators.Classify.nbClassify(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.explainString(FormattedMode)
    assert(finalPlan.contains("isFinalPlan=true"), "AQE final plan not materialized")
    val executed = finalPlan.split("== Initial Plan ==")(0)
    val scans    = "Scan parquet".r.findAllIn(executed).length
    assert(
      scans <= 2,
      s"expected <=2 executed documents scans (shared tokenize + doc directory), found $scans"
    )
  }

  test("nb_cv_accuracy executes a bounded number of corpus scans (one tokenize across folds)") {
    // 5-fold CV = 5 fits + 5 scores, but the models are fold-complement
    // rollups (total − own fold) of ONE per-(fold, class, token)
    // aggregate over ONE checkpointed token relation, and scoring is
    // one (fold, tok)-keyed join: the corpus text is tokenized exactly
    // once regardless of fold count (it was ~10 tokenize passes — the
    // single slowest bench query at both scales before the rewrite)
    val df = operators.Classify.nbCrossValidate(spark, sfDir)
    df.collect()
    val finalPlan = df.queryExecution.explainString(FormattedMode)
    assert(finalPlan.contains("isFinalPlan=true"), "AQE final plan not materialized")
    val executed = finalPlan.split("== Initial Plan ==")(0)
    val scans    = "Scan parquet".r.findAllIn(executed).length
    assert(
      scans <= 2,
      s"expected <=2 executed corpus scans (one text tokenize + one pruned doc directory), found $scans"
    )
  }

  test("AQE splits the skewed partition of a hot-key join") {
    ScaleDemos.withSkewConfs(spark) {
      val df = ScaleDemos.skewedJoin(spark)
      val expectedMatches = df.collect().head.getLong(0)
      // 60% of 2M fact rows hit key 0, which exists in the dimension →
      // 1.2M matches plus the 1-to-1 tail below 1M
      assert(expectedMatches > 1200000L, s"unexpected join size $expectedMatches")
      val finalPlan = df.queryExecution.explainString(FormattedMode)
      assert(finalPlan.contains("isFinalPlan=true"), "AQE final plan not materialized")
      assert(
        finalPlan.contains("skewed"),
        s"no skew-split in the final adaptive plan:\n$finalPlan"
      )
    }
  }

  test("ANALYZE-collected catalog stats propagate into the optimized plan under CBO") {
    import org.apache.spark.sql.functions._
    val tbl = "pe_cbo_orders"
    Tables
      .orders(spark, sfDir)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .write
      .mode("overwrite")
      .saveAsTable(tbl)
    spark.sql(s"ANALYZE TABLE $tbl COMPUTE STATISTICS FOR COLUMNS o_custkey, o_totalprice")
    val prev = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val plan   = spark.table(tbl).filter(col("o_totalprice") > 0.0).queryExecution.optimizedPlan
      val stats  = plan.stats
      val nRows  = Tables.orders(spark, sfDir).count()
      assert(stats.rowCount.isDefined, s"CBO must see a row count, stats=$stats")
      // the filter keeps everything (prices are positive): the CBO
      // estimate from column stats should be near the true count, not
      // a size-in-bytes guess
      val est = stats.rowCount.get.toLong
      assert(est > 0 && est <= 2 * nRows, s"row-count estimate $est vs true $nRows")
      // attribute-level stats made it through: distinct counts exist
      assert(stats.attributeStats.nonEmpty, "column stats must propagate into plan stats")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
        case None    => spark.conf.unset("spark.sql.cbo.enabled")
      }
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }
}
