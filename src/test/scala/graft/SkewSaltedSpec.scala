package graft

import org.apache.spark.sql.functions._

import graft.operators.Checks

/** Skew-stressed salted join: parity with the plain join over the same
  * hot-key remap, and the planted skew is actually planted (the hot
  * key owns ~30% of the big side — the shape the in-query spread
  * guard and the AQE probe exercise).
  */
class SkewSaltedSpec extends SparkSpec {

  test("skewSaltedJoin == plain join over the same remap; guard column is 0") {
    val salted = Checks.skewSaltedJoin(spark, sfDir).collect()
    val big = Tables
      .orders(spark, sfDir)
      .withColumn(
        "custkey",
        when(col("o_orderkey") % 10 < 3, lit(1L)).otherwise(col("o_custkey").cast("long"))
      )
    val plain = big
      .join(Tables.customer(spark, sfDir).withColumnRenamed("c_custkey", "custkey"), "custkey")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 4).as("total"))
      .orderBy("c_mktsegment")
      .collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq)
    assert(salted.forall(_.getLong(3) == 0L))
  }

  test("the planted hot key owns ~30% of the big side (the skew is real, not decorative)") {
    val big = Tables
      .orders(spark, sfDir)
      .withColumn(
        "custkey",
        when(col("o_orderkey") % 10 < 3, lit(1L)).otherwise(col("o_custkey").cast("long"))
      )
    val total = big.count().toDouble
    val hot   = big.filter(col("custkey") === 1L).count().toDouble
    assert(hot / total > 0.25 && hot / total < 0.35, s"hot share ${hot / total}")
  }
}
