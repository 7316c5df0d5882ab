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

  test("rfm/equidepth: every unpartitioned window runs at DIRECTORY grain (above an Aggregate)") {
    // The scale defect this operator replaced was a DATA-sized window
    // through one partition. Since r12 the offset directory cumulates
    // with the cumulativeByScore convention — a window over the
    // O(#blocks) directory relation (unpartitioned only when partCols
    // is empty), never over the data. So the invariant is: any
    // unpartitioned Window in the optimized plan must sit on an
    // Aggregate's output (the bounded block directory), reachable
    // through unary nodes only — a data-sized scan below it without an
    // intervening Aggregate fails the walk.
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, UnaryNode}
    @scala.annotation.tailrec
    def directoryGrain(p: LogicalPlan): Boolean = p match {
      case _: Aggregate => true
      case u: UnaryNode => directoryGrain(u.child)
      case _            => false
    }
    for (df <- Seq(
        EventAnalytics.rfmSegments(spark, sfDir),
        Relational.equidepthHistogram(spark, sfDir)
      )) {
      val global = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      val offending = global.filterNot(w => directoryGrain(w.child))
      assert(offending.isEmpty, s"data-sized unpartitioned Window survived:\n${offending.mkString("\n")}")
    }
  }

  test("ntileTwoPhase offset directory is fully distributed (no driver-side LocalRelation offsets)") {
    // The pre-r12 implementation collect()ed the block directory and
    // re-created it as a LocalRelation; the distributed form keeps the
    // directory as an Aggregate in the same plan. equidepthHistogram
    // reads parquet, so ANY LocalRelation in its optimized plan would
    // be driver-materialized state.
    import org.apache.spark.sql.catalyst.plans.logical.LocalRelation
    val local = Relational
      .equidepthHistogram(spark, sfDir)
      .queryExecution
      .optimizedPlan
      .collect { case l: LocalRelation => l }
    assert(local.isEmpty, s"driver-side LocalRelation in the plan:\n${local.mkString("\n")}")
  }
}
