package graft

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** CEP-lite event-sequence pattern matching. */
class EventPatternSpec extends SparkSpec {

  test("planted sequences count non-overlapping conversions exactly") {
    // hand-checkable strings through the same regex semantics
    val cases = Seq(
      ("vcp", 1L),    // view, click, purchase
      ("vp", 1L),     // direct conversion
      ("vccexp", 0L), // 'x' impossible in data but proves the scan breaks
      ("vcpcvp", 2L), // two conversions
      ("pvc", 0L),    // purchase before view
      ("vcecp", 1L)   // noise tolerated
    )
    cases.foreach { case (s, want) =>
      val got = spark.range(1).select(expr(s"regexp_count('$s', 'v[ce]*p')").cast("long")).head().getLong(0)
      assert(got == want, s"sequence $s")
    }
  }

  test("per-user matches on real events are bounded by min(views, purchases) and order-deterministic") {
    val out = EventAnalytics.eventPatternMatches(spark, sfDir).cache()
    try {
      val byType = Tables
        .events(spark, sfDir)
        .groupBy("user_id")
        .agg(
          sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("views"),
          sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("buys")
        )
      val joined = out.join(byType, "user_id")
      val bad    = joined.filter(col("n_matches") > least(col("views"), col("buys")))
      assert(bad.isEmpty, "a conversion needs one view and one purchase")
      assert(out.agg(sum("n_matches")).head().getLong(0) > 0, "the corpus should contain conversions")
      // determinism across partition counts
      val again = EventAnalytics.eventPatternMatches(spark, sfDir)
      assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    } finally out.unpersist()
  }

  test("dailyCountAnomalies: integer z-score flags a planted spike and nothing on a flat series") {
    val got = EventAnalytics
      .dailyCountAnomalies(spark, sfDir)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getBoolean(2)))
    assert(got.nonEmpty && got.map(_._1).distinct.length == got.length)
    // independent float model: |x − μ| > 2σ — the integer inequality
    // must agree exactly away from the boundary, and the corpus days
    // are nowhere near an ulp of it
    val xs    = got.map(_._2.toDouble)
    val n     = xs.length
    val mean  = xs.sum / n
    val sd    = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
    got.foreach { case (d, x, flag) =>
      assert(flag == (math.abs(x - mean) > 2 * sd), s"day $d x=$x flag=$flag mean=$mean sd=$sd")
    }
  }
}
