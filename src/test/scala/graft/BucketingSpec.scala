package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketing

/** Bucketed co-located joins: the exchange paid at write time must not
  * reappear at query time.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans with no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Bucketing.writeBucketed(Tables.lineitem(spark, sfDir), "b_lineitem", "l_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.orders(spark, sfDir).withColumnRenamed("o_orderkey", "l_orderkey"),
        "b_orders",
        "l_orderkey",
        8
      )
      val joined = Bucketing.cogroupedJoin(spark, "b_lineitem", "b_orders", "l_orderkey")
      val plan   = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"), s"bucketed join still shuffles:\n$plan")
      // result correctness vs plain join
      val expected = Tables
        .lineitem(spark, sfDir)
        .join(Tables.orders(spark, sfDir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(joined.count() == expected)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
