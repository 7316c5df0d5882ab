package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** U-shaped multi-touch attribution: hand-computed credits, the
  * 10 000-bp-per-conversion conservation invariant on real data, and
  * lookback-window edges.
  */
class AttributionSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def ts(minute: Int) = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private def ev(rows: (Long, Timestamp, Long, String)*) =
    rows.toDF("event_id", "ts", "user_id", "event_type")

  test("hand-computed U-shape: 1, 2, 3 and 5 touches") {
    val events = ev(
      // user 1: one touch → 10000
      (1L, ts(0), 1L, "click"), (2L, ts(1), 1L, "purchase"),
      // user 2: two touches → 5000 each
      (3L, ts(0), 2L, "view"), (4L, ts(1), 2L, "click"), (5L, ts(2), 2L, "purchase"),
      // user 3: three touches → 4000+2000%1=4000, mid 2000, last 4000
      (6L, ts(0), 3L, "click"), (7L, ts(1), 3L, "view"), (8L, ts(2), 3L, "click"),
      (9L, ts(3), 3L, "purchase"),
      // user 4: five touches → first 4000+2000%3=4002, mids 666 each, last 4000
      (10L, ts(0), 4L, "click"), (11L, ts(1), 4L, "view"), (12L, ts(2), 4L, "click"),
      (13L, ts(3), 4L, "view"), (14L, ts(4), 4L, "click"), (15L, ts(5), 4L, "purchase")
    )
    val got = EventAnalytics
      .uShapedCredits(events)
      .select("conv_id", "touch_id", "credit_bp")
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    assert(
      got == Set(
        (2L, 1L, 10000L),
        (5L, 3L, 5000L), (5L, 4L, 5000L),
        (9L, 6L, 4000L), (9L, 7L, 2000L), (9L, 8L, 4000L),
        (15L, 10L, 4002L), (15L, 11L, 666L), (15L, 12L, 666L), (15L, 13L, 666L), (15L, 14L, 4000L)
      )
    )
  }

  test("credit conservation on real events: every credited conversion sums to exactly 10000 bp") {
    val perConv = EventAnalytics
      .uShapedCredits(Tables.events(spark, sfDir))
      .groupBy("conv_id")
      .agg(sum("credit_bp").as("total"))
    val offenders = perConv.filter(col("total") =!= 10000L).count()
    assert(offenders == 0L)
    assert(perConv.count() > 0L, "testdata should produce at least one credited conversion")
  }

  test("touches outside the lookback window or after the conversion earn nothing") {
    val events = ev(
      (1L, Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "click"), // 9h before → outside 6h window
      (2L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "purchase"),
      (3L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "click") // after conversion
    )
    assert(EventAnalytics.uShapedCredits(events).count() == 0L)
  }
}
