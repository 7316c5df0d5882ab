package graft

import org.apache.spark.sql.functions._

import graft.operators.DataOps

/** DSIR fixed-point importance weights: hand-computed tiny corpus,
  * zero-for-unseen contract, and monotonicity toward the target
  * domain.
  */
class DsirSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val docs = Seq(
    // target docs (en): vocabulary {cat, dog}
    (1L, "cat cat dog", "en"),
    (2L, "cat", "en"),
    // raw-only docs: {dog, fish}
    (3L, "dog fish fish", "fr"),
    (4L, "fish", "de")
  ).toDF("doc_id", "text", "lang")

  test("hand-computed scores on a four-document corpus") {
    // counts: cat raw 3 / target 3 → r = 1_000_000
    //         dog raw 2 / target 1 → r =   500_000
    //         fish raw 3 / target 0 → r =        0
    val got = DataOps
      .dsirWeights(docs, col("lang") === "en")
      .as[(Long, Long, Long)]
      .collect()
      .toSeq
    assert(
      got == Seq(
        (1L, 2L * 1000000L + 1L * 500000L, 3L), // cat*2 + dog*1
        (2L, 1000000L, 1L),
        (3L, 500000L, 3L),                      // dog*1 + fish*2*0
        (4L, 0L, 1L)
      )
    )
  }

  test("a document made only of target-unseen words scores exactly zero, not absent") {
    val got = DataOps.dsirWeights(docs, col("lang") === "en")
    assert(got.filter(col("doc_id") === 4L).select("dsir_score").as[Long].head() == 0L)
  }

  test("integer division truncates: r is floor((target*scale)/raw) for mixed words") {
    // one word, target 1 of raw 3 → r = 333_333 (not 333_333.33…)
    val d = Seq((1L, "w", "en"), (2L, "w", "fr"), (3L, "w", "fr")).toDF("doc_id", "text", "lang")
    val scores = DataOps
      .dsirWeights(d, col("lang") === "en")
      .select("dsir_score")
      .as[Long]
      .collect()
      .toSet
    assert(scores == Set(333333L))
  }

  test("dsirResample: deterministic, zero-score docs ineligible, biased toward high scores") {
    val a = DataOps.dsirResample(spark, sfDir, k = 50)
    val b = DataOps.dsirResample(spark, sfDir, k = 50)
    assert(a.collect().toSeq == b.collect().toSeq)
    assert(a.filter(col("dsir_score") <= 0).count() == 0L)
    // A-ES bias: the mean score of the selected 50 beats the eligible-corpus mean
    val selMean = a.agg(avg("dsir_score")).head().getDouble(0)
    val allMean = DataOps
      .dsirWeightsEn(spark, sfDir)
      .filter(col("dsir_score") > 0)
      .agg(avg("dsir_score"))
      .head()
      .getDouble(0)
    assert(selMean > allMean, s"selection not score-biased: $selMean <= $allMean")
  }

  test("the corpus query runs on testdata and en docs dominate the top of the ranking") {
    val ranked = DataOps
      .dsirWeightsEn(spark, sfDir)
      .join(Tables.documents(spark, sfDir).select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("per_tok", col("dsir_score") / col("n_tokens"))
      .orderBy(desc("per_tok"))
      .select("lang")
      .as[String]
      .collect()
    assert(ranked.nonEmpty)
    val topHalfEn = ranked.take(ranked.length / 2).count(_ == "en")
    val botHalfEn = ranked.drop(ranked.length / 2).count(_ == "en")
    assert(topHalfEn >= botHalfEn, s"en docs should rank high: top=$topHalfEn bot=$botHalfEn")
  }
}
