package graft

import org.apache.spark.sql.functions._

import graft.operators.CurationPipeline
import graft.streaming.EventStreams

class CurationPipelineSpec extends SparkSpec {

  test("curated corpus: unique texts, quality-gated, deterministic split") {
    val out = CurationPipeline.curate(spark, sfDir).cache()
    val n   = out.count()
    assert(n > 0)
    // no exact duplicates survive
    assert(out.select("text").distinct().count() == n)
    // split column is total and deterministic
    val again = CurationPipeline.curate(spark, sfDir)
    assert(
      out.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
        again.select("doc_id", "split").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    )
    // quality gate: no doc below the token floor
    val tokenCounts = operators.TextJobs
      .tokenized(out.select("doc_id", "text"), "text", "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") < 5)
    assert(tokenCounts.count() == 0)
  }

  test("observed curation reports split counts without a second pass") {
    val obs = org.apache.spark.sql.Observation("curation_metrics")
    val df  = CurationPipeline.curateObserved(spark, sfDir, obs)
    df.write.format("noop").mode("overwrite").save() // one action, metrics ride along
    val m       = obs.get
    val rowsOut = m("rows_out").asInstanceOf[Long]
    assert(rowsOut > 0)
    assert(
      m("rows_train").asInstanceOf[Long] + m("rows_valid").asInstanceOf[Long] +
        m("rows_test").asInstanceOf[Long] == rowsOut
    )
    // metrics agree with an independent recount
    assert(rowsOut == CurationPipeline.curate(spark, sfDir).count())
  }

  test("curateAndWrite lays out split partitions readable in isolation") {
    val out = java.nio.file.Files.createTempDirectory("graft_curated").toString
    CurationPipeline.curateAndWrite(spark, sfDir, s"$out/corpus")
    val train = spark.read.parquet(s"$out/corpus").filter(col("split") === "train")
    assert(train.count() > 0)
    val plan = train.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("split"), s"no partition pruning:\n$plan")
  }

  test("AvailableNow drain processes the backlog and stops on its own") {
    val src = java.nio.file.Files.createTempDirectory("graft_drain_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), src.resolve("events.parquet"))
    val out  = java.nio.file.Files.createTempDirectory("graft_drain_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_drain_ckpt").toString
    val q = EventStreams.drainToParquet(
      EventStreams.readEvents(spark, src.toString).select("event_id", "event_type", "value"),
      s"$out/events", ckpt)
    q.awaitTermination(120000)
    assert(!q.isActive, "AvailableNow query should terminate after draining")
    val written = spark.read.parquet(s"$out/events")
    assert(written.count() == Tables.events(spark, sfDir).count())
    assert(written.select("event_type").distinct().count() == 5)
  }
}
