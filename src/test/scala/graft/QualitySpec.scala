package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Data-quality rules engine: planted violations and the real report. */
class QualitySpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  test("rowRules: one pass, exact violation counts incl. NULL semantics per rule") {
    val df = Seq(
      (Some(1L), Some(5.0), Some("A")),
      (None, Some(-2.0), Some("B")),     // null key, negative, bad value
      (Some(3L), None, None),            // null measure (violates range), null value (violates accepted)
      (Some(4L), Some(100.0), Some("A")) // 100 out of [0,10]
    ).toDF("k", "m", "v")
    val report = Quality
      .rowRules(df, "t", Seq(Quality.notNull("k"), Quality.inRange("m", 0.0, 10.0), Quality.acceptedValues("v", Seq("A"))))
      .collect()
      .map(r => r.getString(1) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(report("not_null(k)") == ((4L, 1L)))
    assert(report("in_range(m)") == ((4L, 3L)), "NULL, negative and 100 all violate the range")
    assert(report("accepted_values(v)") == ((4L, 2L)))
    // all row rules fold into ONE aggregate over the table — a single scan
    val plan = Quality
      .rowRules(df, "t", Seq(Quality.notNull("k"), Quality.inRange("m", 0.0, 10.0)))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"row rules must not join per rule:\n$plan")
  }

  test("uniqueKey and referentialIntegrity count planted duplicates and orphans (null child key = orphan)") {
    val dup = Seq((1L, "a"), (1L, "b"), (2L, "c"), (2L, "d"), (2L, "e"), (3L, "f")).toDF("id", "x")
    val u   = Quality.uniqueKey(dup, "t", Seq("id")).collect().head
    assert((u.getLong(2), u.getLong(3)) == ((6L, 3L)), "1 extra for id=1 + 2 extra for id=2")

    val parent = Seq(1L, 2L).toDF("pid")
    val child  = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val r = Quality
      .referentialIntegrity(child.withColumnRenamed("fk", "fk"), "c", "fk", parent, "pid")
      .collect()
      .head
    assert((r.getLong(2), r.getLong(3)) == ((4L, 2L)), "unknown parent and NULL key are both orphans")
  }

  test("streaming gate routes rows exactly as the batch tagger; accepted + quarantine partition the stream") {
    val base = java.nio.file.Files.createTempDirectory("q_gate").toString
    val docs = Tables.documents(spark, sfDir).select("doc_id", "lang", "n_chars")
    docs.write.parquet(s"$base/in")
    val rules = Seq(Quality.inRange("n_chars", 64.0, 512.0), Quality.acceptedValues("lang", Seq("en", "de", "fr")))
    val q = Quality.streamGate(
      spark.readStream.schema(docs.schema).parquet(s"$base/in"),
      rules,
      s"$base/accept",
      s"$base/quarantine",
      s"$base/ckpt"
    )
    q.awaitTermination()
    val accepted   = spark.read.parquet(s"$base/accept")
    val quarantine = spark.read.parquet(s"$base/quarantine")
    val wantBad    = Quality.tagViolations(docs, rules).filter(size(col("failed_rules")) > 0)
    assert(accepted.count() + quarantine.count() == docs.count(), "gate must partition the stream")
    assert(quarantine.count() == wantBad.count() && quarantine.count() > 0)
    // per-row failed-rule lists match the batch evaluation exactly
    val got  = quarantine.select(col("doc_id"), col("failed_rules")).collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val want = wantBad.select(col("doc_id"), col("failed_rules")).collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(got == want)
    val acceptedIds = accepted.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(acceptedIds.intersect(want.keySet).isEmpty, "no violating row may be accepted")
  }

  test("star-schema report: clean rules zero, strict document rules report real violations") {
    val rows = Quality
      .starSchemaReport(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(3))
      .toMap
    assert(rows(("orders", "not_null(o_orderkey)")) == 0L)
    assert(rows(("orders", "unique(o_orderkey)")) == 0L)
    assert(rows(("lineitem", "ref_integrity(l_orderkey)")) == 0L)
    assert(rows(("documents", "in_range(n_chars)")) > 0L, "strict band must catch real rows")
    assert(rows(("documents", "accepted_values(lang)")) > 0L, "es/zh docs must be flagged")
  }
}
