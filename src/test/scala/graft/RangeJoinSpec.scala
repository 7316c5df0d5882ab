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
