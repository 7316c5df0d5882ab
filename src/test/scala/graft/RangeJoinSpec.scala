package graft

import org.apache.spark.sql.functions._

import graft.plans.RangeJoinOps

/** Custom range-join operator: result equivalence with the naive
  * theta-join, null handling, and plan shape.
  */
class RangeJoinSpec extends SparkSpec {

  private def bands = {
    import SparkSpec.spark.implicits._
    Seq((0.0, 150000.0, "low"), (150000.0, 300000.0, "mid"), (300000.0, 1.0e12, "high"),
      (100000.0, 200000.0, "overlap")) // overlapping interval on purpose
      .toDF("lo", "hi", "band")
  }

  test("range join == theta join (including overlapping intervals)") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val custom = RangeJoinOps
      .rangeJoin(orders, bands, "o_totalprice", "lo", "hi")
      .select("o_orderkey", "band")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    val theta = orders
      .join(bands, col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .select("o_orderkey", "band")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(custom == theta)
    assert(custom.nonEmpty)
  }

  test("plan uses BroadcastRangeJoinExec, not BroadcastNestedLoopJoin") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val plan   = RangeJoinOps.rangeJoin(orders, bands, "o_totalprice", "lo", "hi").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastRangeJoin"), s"custom exec missing:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("filters written after the range join push below it into the scan") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val df = RangeJoinOps
      .rangeJoin(orders, bands, "o_totalprice", "lo", "hi")
      .filter(col("o_orderkey") < 100 && col("band") =!= "overlap")
    val optimized = df.queryExecution.optimizedPlan.toString
    // the probe-side conjunct moved below RangeJoin…
    val joinIdx   = optimized.indexOf("RangeJoin")
    val filterIdx = optimized.indexOf("o_orderkey#", joinIdx)
    assert(joinIdx >= 0, s"RangeJoin missing:\n$optimized")
    // …and physical planning pushed it into the parquet scan
    val physical = df.queryExecution.executedPlan.toString
    assert(
      physical.contains("LessThan(o_orderkey,100)"),
      s"probe-side filter not pushed to the scan:\n$physical"
    )
    // the band-side conjunct must NOT have moved below the join
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) < 100 && r.getString(4) != "overlap"))
    assert(filterIdx >= 0)
  }

  test("oversized build side fails fast with a clear error, not an OOM path") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    // the "interval" side here is the big table itself — the misuse the
    // guard exists for
    val bigIntervals = Tables
      .orders(spark, sfDir)
      .select(col("o_totalprice").as("lo"), (col("o_totalprice") + 1).as("hi"), col("o_orderkey").as("band"))
    spark.conf.set("spark.graft.rangeJoin.maxBuildRows", "100")
    try {
      val ex = intercept[Exception] {
        RangeJoinOps.rangeJoin(orders, bigIntervals, "o_totalprice", "lo", "hi").collect()
      }
      val msgs = Iterator
        .iterate(ex: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse(""))
        .mkString("; ")
      assert(msgs.contains("maxBuildRows"), s"expected actionable guard message, got: $msgs")
    } finally spark.conf.unset("spark.graft.rangeJoin.maxBuildRows")
    // and a compliant build side still works under the same low cap
    spark.conf.set("spark.graft.rangeJoin.maxBuildRows", "100")
    try assert(RangeJoinOps.rangeJoin(orders, bands, "o_totalprice", "lo", "hi").count() > 0)
    finally spark.conf.unset("spark.graft.rangeJoin.maxBuildRows")
  }

  test("downstream operators compose over the custom node") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
    val agg = RangeJoinOps
      .rangeJoin(orders, bands, "o_totalprice", "lo", "hi")
      .groupBy("band")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val total = Tables.orders(spark, sfDir).count()
    // every order falls in exactly one of low/mid/high + possibly overlap
    assert(agg("low") + agg("mid") + agg("high") == total)
  }
}
