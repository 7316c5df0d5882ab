package graft

import org.apache.spark.sql.functions._

import graft.operators.{MapReduce, TextJobs}

/** The generalized map-reduce API must agree with the declarative
  * DataFrame plans for the two reference jobs, and support arbitrary
  * user jobs (SURVEY.md §7.2 M3).
  */
class MapReduceSpec extends SparkSpec {

  test("typed wordCount == DataFrame wordCount") {
    import SparkSpec.spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val api = MapReduce
      .wordCount(docs.select("text").as[String])
      .collect()
      .toMap
    val df = TextJobs.wordCount(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(api == df)
  }

  test("typed invertedIndex == DataFrame invertedIndex") {
    import SparkSpec.spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val api = MapReduce
      .invertedIndex(docs.select($"text", $"source").as[(String, String)])
      .collect()
      .toMap
    val df = TextJobs
      .invertedIndex(docs, "text", "source")
      .collect()
      .map(r => r.getString(0) -> r.getString(2).split(",").toSeq)
      .toMap
    assert(api.keySet == df.keySet)
    api.foreach { case (w, files) => assert(files == df(w), s"posting list mismatch for $w") }
  }

  test("custom user job: per-language char sum") {
    import SparkSpec.spark.implicits._
    val docs = Tables.documents(spark, sfDir).select($"lang", $"n_chars").as[(String, Long)]
    val got  = MapReduce.mapReduce(docs)(r => Iterator(r._1 -> r._2))(_ + _).collect().toMap
    val want = Tables
      .documents(spark, sfDir)
      .groupBy("lang")
      .agg(sum("n_chars"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == want)
  }

  test("partial aggregation happens (no raw-pair shuffle): plan has two aggregate stages") {
    import SparkSpec.spark.implicits._
    val ds   = Tables.documents(spark, sfDir).select("text").as[String]
    val plan = MapReduce.wordCount(ds).queryExecution.executedPlan.toString
    // reduceGroups plans partial + final (ObjectHashAggregate/SortAggregate x2)
    val aggs = "Aggregate\\(".r.findAllIn(plan).size +
      "ObjectHashAggregate".r.findAllIn(plan).size + "SortAggregate".r.findAllIn(plan).size
    assert(aggs >= 2, s"expected partial+final aggregation, got plan:\n$plan")
  }
}
