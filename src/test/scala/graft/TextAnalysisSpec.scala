package graft

import graft.operators.TextAnalysis

/** tfIdfTopTerm contract: the oracle (text_tfidf_top) pins the values;
  * this spec pins the EXECUTION shape — building the DataFrame must be
  * lazy (the corpus size enters as a broadcast 1-row aggregate, not a
  * driver-side count), so a caller composing it into a larger plan
  * doesn't pay a hidden extra scan per call.
  */
class TextAnalysisSpec extends SparkSpec {

  test("tfIdfTopTerm builds lazily — no execution job fires at DataFrame construction") {
    // Reading parquet fires one schema-inference job per spark.read —
    // that's plan-construction cost any lazy reader pays. The contract
    // here: tfIdfTopTerm fires exactly as many build-time jobs as a
    // trivially-lazy read of the same table, i.e. no hidden count().
    def jobsDuring(body: => Unit): Int = {
      val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      body
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length - before
    }
    spark.range(1).count() // session warm
    val baseline = jobsDuring(Tables.documents(spark, sfDir).select("doc_id"))
    var df: org.apache.spark.sql.DataFrame = null
    val actual = jobsDuring { df = TextAnalysis.tfIdfTopTerm(spark, sfDir) }
    assert(
      actual <= baseline,
      s"tfIdfTopTerm fired $actual build-time jobs vs $baseline for a plain lazy read — hidden driver action"
    )
    assert(df.count() > 0)
  }

  test("tfIdfTopTerm: one row per document, deterministic top term") {
    val rows = TextAnalysis.tfIdfTopTerm(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val again = TextAnalysis.tfIdfTopTerm(spark, sfDir).collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getString(1))).toSeq)
  }
}
