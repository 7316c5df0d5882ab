package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

import graft.plans.ZoneMapPruning
import graft.sources.ZoneMap

/** Transparent zone-map pruning via the Catalyst rule. */
class ZoneMapRuleSpec extends SparkSpec {

  private val path = {
    val p = "/tmp/graft_zmrule_spec/orders"
    ZoneMap.writeWithZoneMap(spark, Tables.orders(spark, sfDir), p, Seq("o_totalprice"), Seq("o_totalprice"), files = 8)
    ZoneMapPruning.register(spark, "zmrule_spec", p, Seq("o_totalprice"))
    p
  }

  private def scannedFiles(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case r: LogicalRelation =>
      r.relation.asInstanceOf[HadoopFsRelation].location.inputFiles.length
    }.sum

  private def plain = spark.read.parquet(s"$path/data")

  test("a plain filtered scan is rewritten onto fewer files and stays value-identical") {
    val filtered = plain.filter(col("o_totalprice").between(100000.0, 120000.0))
    assert(scannedFiles(filtered) < 8, s"rule should engage, scanned ${scannedFiles(filtered)}")
    val full = Tables.orders(spark, sfDir).filter(col("o_totalprice").between(100000.0, 120000.0))
    assert(filtered.exceptAll(full).isEmpty && full.exceptAll(filtered).isEmpty)
  }

  test("strict bounds and flipped literal-first comparisons engage too") {
    val f1 = plain.filter(col("o_totalprice") > 150000.0)
    assert(scannedFiles(f1) < 8)
    val f2 = plain.filter(lit(60000.0) > col("o_totalprice"))
    assert(scannedFiles(f2) < 8)
    val full1 = Tables.orders(spark, sfDir).filter(col("o_totalprice") > 150000.0)
    assert(f1.exceptAll(full1).isEmpty && full1.exceptAll(f1).isEmpty)
  }

  test("an impossible range collapses to an empty local relation, zero files scanned") {
    val f = plain.filter(col("o_totalprice") > 1.0e12)
    assert(scannedFiles(f) == 0)
    assert(f.isEmpty)
  }

  test("unextractable or non-stats predicates leave the plan alone (no false pruning)") {
    val f = plain.filter(col("o_custkey") === 42L) // not a registered stats col
    assert(scannedFiles(f) == 8)
    val full = Tables.orders(spark, sfDir).filter(col("o_custkey") === 42L)
    assert(f.exceptAll(full).isEmpty && full.exceptAll(f).isEmpty)
  }

  test("mixed conjunction prunes on the extractable leg and keeps the residual exact") {
    val f = plain.filter(col("o_totalprice") >= 140000.0 && col("o_orderpriority").startsWith("1"))
    assert(scannedFiles(f) < 8)
    val full = Tables
      .orders(spark, sfDir)
      .filter(col("o_totalprice") >= 140000.0 && col("o_orderpriority").startsWith("1"))
    assert(f.exceptAll(full).isEmpty && full.exceptAll(f).isEmpty)
  }

  test("EqualTo on a bloom-covered column point-prunes through the rule; range+point intersect") {
    val p = "/tmp/graft_zmrule_spec/bloomrule"
    // 16 files so a ~10-row key covering EVERY file (which would flake
    // the pruning assertion) is vanishingly unlikely
    ZoneMap.writeWithZoneMap(
      spark,
      Tables.orders(spark, sfDir),
      p,
      Seq("o_totalprice"),
      Seq("o_totalprice"),
      files = 16,
      bloomCols = Seq("o_custkey")
    )
    ZoneMapPruning.register(spark, "zmrule_bloom", p, Seq("o_totalprice"))
    val data = spark.read.parquet(s"$p/data")
    val f1   = data.filter(col("o_custkey") === 42L)
    assert(scannedFiles(f1) < 16, s"bloom point pruning should engage, scanned ${scannedFiles(f1)}")
    val full1 = Tables.orders(spark, sfDir).filter(col("o_custkey") === 42L)
    assert(f1.exceptAll(full1).isEmpty && full1.exceptAll(f1).isEmpty)
    // combined: range on the clustered col AND point on the bloom col
    val f2 = data.filter(col("o_totalprice") >= 50000.0 && col("o_custkey") === 42L)
    assert(scannedFiles(f2) <= scannedFiles(f1))
    val full2 = Tables.orders(spark, sfDir).filter(col("o_totalprice") >= 50000.0 && col("o_custkey") === 42L)
    assert(f2.exceptAll(full2).isEmpty && full2.exceptAll(f2).isEmpty)
  }

  test("unregistered paths are never touched") {
    val other = "/tmp/graft_zmrule_spec/other"
    Tables.orders(spark, sfDir).write.mode("overwrite").parquet(other)
    val n = spark.read.parquet(other).inputFiles.length
    val f = spark.read.parquet(other).filter(col("o_totalprice") > 150000.0)
    assert(scannedFiles(f) == n)
  }
}
