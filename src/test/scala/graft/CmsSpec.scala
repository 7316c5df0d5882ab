package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Count-Min sketch contract ([[graft.functions.CmsAgg]] /
  * [[graft.functions.CmsLookup]]): exact in the collision-free
  * regime, never-underestimates + deterministic merge in the
  * colliding regime.
  */
class CmsSpec extends SparkSpec {

  // zipf-ish: key i appears ~2000/i times
  private def skewed(parts: Int) = {
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(i.toLong))
    spark.createDataFrame(rows.map(Tuple1(_))).toDF("key").repartition(parts)
  }

  private def withEst(depth: Int, width: Int, parts: Int) = {
    GraftFunctions.register(spark)
    val df     = skewed(parts)
    val sketch = df.agg(expr(s"cms_agg(xxhash64(key), $depth, $width)").as("cms"))
    df.groupBy("key")
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(sketch))
      .select(col("key"), col("cnt"), expr(s"cms_estimate(cms, xxhash64(key), $depth, $width)").as("est"))
  }

  test("collision-free regime: estimates are exact counts") {
    val rows = withEst(depth = 4, width = 4096, parts = 8).collect()
    assert(rows.length == 40)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(1), s"key ${r.getLong(0)}"))
  }

  test("colliding regime: never underestimates, under any partitioning") {
    for (parts <- Seq(1, 4, 13)) {
      withEst(depth = 3, width = 16, parts = parts)
        .collect()
        .foreach(r => assert(r.getLong(2) >= r.getLong(1), s"parts=$parts key ${r.getLong(0)}"))
    }
  }

  test("sketch value is identical under different partitionings") {
    GraftFunctions.register(spark)
    def sk(parts: Int) =
      skewed(parts).agg(expr("cms_agg(xxhash64(key), 4, 32)").as("cms")).collect()(0).getSeq[Long](0)
    val base = sk(1)
    assert(base.sum == 4 * skewed(1).count()) // every row lands once per grid row
    for (parts <- Seq(4, 13)) assert(sk(parts) == base, s"parts=$parts")
  }

  test("cms word counts equal the exact word count") {
    val got   = Sketches.cmsWordCounts(spark, sfDir).collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = operators.TextJobs
      .wordCount(Tables.documents(spark, sfDir).select("text"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("check_cms invariants hold on the test tables") {
    val row = Sketches.cmsCheck(spark, sfDir).collect()(0)
    assert(row.getLong(0) == 0L, s"under_violations=${row.getLong(0)}")
    assert(row.getBoolean(1), "bound_ok false")
    assert(row.getBoolean(2), "merge_invariant false")
  }

  test("join-size estimate never undercounts, even collision-saturated; bound holds at working width") {
    // width 64 vs ~1500 distinct keys: nearly every counter is shared —
    // the hard no-undercount guarantee must survive saturation
    for (w <- Seq(64, 1024, 8192)) {
      val row = Sketches.cmsJoinSizeCheck(spark, sfDir, depth = 4, width = w).collect()(0)
      assert(row.getBoolean(1), s"width=$w: estimate undercut the exact join size")
    }
    val row = Sketches.cmsJoinSizeCheck(spark, sfDir).collect()(0)
    assert(row.getLong(0) > 0L)
    assert(row.getBoolean(2), "estimate exceeded the e*|A|*|B|/width bound at working width")
  }
}
