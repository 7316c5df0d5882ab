package graft

import org.apache.spark.sql.functions._

import graft.operators.DataOps

class DataOpsSpec extends SparkSpec {

  test("saltedJoin result == plain join result (skew recipe is semantics-free)") {
    val big   = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k"), col("l_quantity"))
    val small = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain  = big.join(small, "k")
    val salted = DataOps.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("o_orderstatus").agg(round(sum("l_quantity"), 4).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = salted.groupBy("o_orderstatus").agg(round(sum("l_quantity"), 4).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("winnowing: guaranteed shared fingerprint for long-enough common substrings") {
    // identical documents must produce identical fingerprint sets
    val fps = DataOps
      .winnowFingerprints(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    val textOf = Tables.documents(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    textOf.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val sets = grp.keys.map(fps).toSeq
      assert(sets.distinct.size == 1, s"identical docs with different winnow sets: ${grp.keys}")
    }
    assert(fps.nonEmpty)
  }

  test("dataset split is deterministic with the expected proportions") {
    val a = DataOps.datasetSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DataOps.datasetSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac out of envelope")
  }
}
