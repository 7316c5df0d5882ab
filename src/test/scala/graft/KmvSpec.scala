package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** KMV bottom-k sketch contract ([[graft.functions.KmvSketchAgg]]):
  * exact below capacity, deterministic sketch value under any
  * partitioning (semilattice), estimation error within 3·RSE in the
  * sub-capacity regime, and union/intersection estimators that match
  * the from-scratch sketch / controlled ground truth.
  */
class KmvSpec extends SparkSpec {

  private def ids(from: Int, until: Int, parts: Int) =
    spark.range(from, until).select(col("id")).repartition(parts)

  private def sketchOf(df: org.apache.spark.sql.DataFrame, k: Int): Seq[Long] = {
    GraftFunctions.register(spark)
    df.agg(expr(s"kmv_agg(xxhash64(id), $k)").as("sk")).collect()(0).getSeq[Long](0)
  }

  test("capacity >= distinct: size is the exact distinct count, duplicates ignored") {
    GraftFunctions.register(spark)
    val df = ids(0, 500, 8).union(ids(0, 500, 3)) // every id twice
    val sk = sketchOf(df, 1024)
    assert(sk.size == 500)
    assert(sk == sk.sorted)
  }

  test("sketch value is identical under different partitionings") {
    val base = sketchOf(ids(0, 20000, 1), 256)
    for (parts <- Seq(4, 13, 32)) {
      assert(sketchOf(ids(0, 20000, parts), 256) == base, s"parts=$parts")
    }
  }

  test("sub-capacity estimate within 3/sqrt(k-2) relative error") {
    val k     = 256
    val exact = 20000.0
    val df    = ids(0, 20000, 8)
    GraftFunctions.register(spark)
    val est = df
      .agg(expr(s"kmv_agg(xxhash64(id), $k)").as("sk"))
      .select(Sketches.kmvEstimate(col("sk"), k).as("est"))
      .collect()(0)
      .getDouble(0)
    assert(math.abs(est / exact - 1.0) < 3.0 / math.sqrt((k - 2).toDouble), s"est=$est")
  }

  test("kmvUnion of two sketches equals the sketch of the unioned data") {
    val k   = 256
    val a   = ids(0, 8000, 4)
    val b   = ids(5000, 15000, 7)
    GraftFunctions.register(spark)
    val skA = a.agg(expr(s"kmv_agg(xxhash64(id), $k)").as("a"))
    val skB = b.agg(expr(s"kmv_agg(xxhash64(id), $k)").as("b"))
    val merged = skA
      .crossJoin(skB)
      .select(Sketches.kmvUnion(col("a"), col("b"), k).as("u"))
      .collect()(0)
      .getSeq[Long](0)
    val direct = sketchOf(a.union(b), k)
    assert(merged == direct)
  }

  test("intersection estimate tracks controlled overlap") {
    val k = 512
    GraftFunctions.register(spark)
    // |A|=10000, |B|=10000, |A∩B|=4000, |A∪B|=16000
    val a = ids(0, 10000, 4).agg(expr(s"kmv_agg(xxhash64(id), $k)").as("a"))
    val b = ids(6000, 16000, 7).agg(expr(s"kmv_agg(xxhash64(id), $k)").as("b"))
    val est = a
      .crossJoin(b)
      .select(Sketches.kmvIntersectEstimate(col("a"), col("b"), k).as("i"))
      .collect()(0)
      .getDouble(0)
    // absolute error scales with D_union (Beyer et al.): 3·RSE·16000
    assert(math.abs(est - 4000.0) < 3.0 / math.sqrt((k - 2).toDouble) * 16000.0, s"est=$est")
  }

  test("kmvParts matches exact distinct parts per flag and overall") {
    val got = Sketches.kmvParts(spark, sfDir).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li  = Tables.lineitem(spark, sfDir)
    val exactPer = li
      .groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exactAll = li.agg(countDistinct("l_partkey")).collect()(0).getLong(0)
    assert(got == exactPer + ("ALL" -> exactAll))
  }

  test("kmvParts at capacity estimates instead of silently capping at k") {
    // force saturation: k far below the true distinct part count — the
    // sf1-surfaced failure mode was n_parts = k exactly (the sketch
    // SIZE) instead of the (k−1)/u(k) estimate
    val k   = 64
    val got = Sketches.kmvParts(spark, sfDir, k = k).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = Tables.lineitem(spark, sfDir).agg(countDistinct("l_partkey")).collect()(0).getLong(0)
    assert(exactAll > k, s"test needs a saturated sketch: $exactAll distinct vs k=$k")
    assert(got("ALL") != k.toLong, "saturated sketch reported its capacity, not an estimate")
    val relErr = math.abs(got("ALL").toDouble - exactAll) / exactAll
    assert(relErr < 0.4, s"ALL estimate ${got("ALL")} vs exact $exactAll (relErr $relErr)")
  }

  test("check_kmv invariants all hold on the test tables") {
    val row = Sketches.kmvCheck(spark, sfDir).collect()(0)
    for (i <- 0 until 4) assert(row.getBoolean(i), s"flag $i false: $row")
  }
}
