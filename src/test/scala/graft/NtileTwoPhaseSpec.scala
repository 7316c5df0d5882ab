package graft

import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Relational}

/** ntileTwoPhase must be NTILE, bit for bit — the two-phase block
  * ranking plus the closed-form bucket formula against the built-in
  * window function over the same total order — and the operators
  * rebuilt on it (rfmSegments, equidepthHistogram) must carry NO
  * unpartitioned window in their optimized plans (the scale defect
  * this replaces: the whole directory through one partition).
  */
class NtileTwoPhaseSpec extends SparkSpec {

  private def randomRows(seed: Long, n: Int) = {
    val rnd = new scala.util.Random(seed)
    // heavy tie classes on the metric (mod 7) — the adversarial shape
    (1 to n).map(i => (rnd.nextInt(3).toString, rnd.nextLong().abs % 7L, i.toLong))
  }

  test("ntileTwoPhase == built-in ntile over the same total order (global, heavy ties)") {
    val ss = spark; import ss.implicits._
    for (tiles <- Seq(1, 3, 4, 8); seed <- Seq(1L, 2L)) {
      val df = randomRows(seed, 257).toDF("g", "v", "id")
      val expected = df
        .withColumn("t", ntile(tiles).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .select("id", "t")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val got = Relational
        .ntileTwoPhase(
          df,
          Nil,
          Seq(col("v"), col("id")),
          // metric value + id sub-block: ties split across blocks
          Seq(col("v"), expr("id DIV 32")),
          tiles,
          "t"
        )
        .select("id", "t")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"tiles=$tiles seed=$seed mismatch")
    }
  }

  test("ntileTwoPhase == built-in ntile per group, including n < tiles") {
    val ss = spark; import ss.implicits._
    val df = randomRows(7L, 61).toDF("g", "v", "id") // ~20 rows/group, tiles up to 32
    for (tiles <- Seq(4, 32)) {
      val expected = df
        .withColumn(
          "t",
          ntile(tiles).over(Window.partitionBy("g").orderBy(col("v"), col("id"))).cast("long")
        )
        .select("id", "t")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      val got = Relational
        .ntileTwoPhase(df, Seq("g"), Seq(col("v"), col("id")), Seq(col("v")), tiles, "t")
        .select("id", "t")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .toMap
      assert(got == expected, s"tiles=$tiles grouped mismatch")
    }
  }

  test("rfmSegments and equidepthHistogram plans hold no unpartitioned window") {
    for (df <- Seq(
        EventAnalytics.rfmSegments(spark, sfDir),
        Relational.equidepthHistogram(spark, sfDir)
      )) {
      val global = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(global.isEmpty, s"unpartitioned Window survived:\n${global.mkString("\n")}")
    }
  }

  test("ntileTwoPhase refuses an oversized block directory loudly") {
    val ss = spark; import ss.implicits._
    val df = (1L to 100L).toSeq.toDF("id")
    val e = intercept[IllegalArgumentException] {
      Relational.ntileTwoPhase(df, Nil, Seq(col("id")), Seq(col("id")), 4, "t", maxBlocks = 10)
    }
    assert(e.getMessage.contains("maxBlocks"))
  }
}
