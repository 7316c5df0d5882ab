package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** As-of join semantics against a hand-computed oracle. */
class AsOfJoinSpec extends SparkSpec {

  test("clickToPurchase matches a driver-side point-in-time computation") {
    val events = Tables
      .events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3).getTime, r.getDouble(4)))

    val purchasesByUser = events
      .filter(_._3 == "purchase")
      .groupBy(_._2)
      .view
      .mapValues(_.sortBy(_._4))
      .toMap

    val expected = events.filter(_._3 == "click").map { case (cid, user, _, cts, _) =>
      val prior = purchasesByUser.getOrElse(user, Array.empty[(Long, Long, String, Long, Double)])
        .filter(_._4 <= cts)
      cid -> prior.lastOption.map(_._1)
    }.toMap

    val got = AsOfJoin
      .clickToPurchase(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap

    assert(got.size == expected.size)
    expected.foreach { case (cid, want) =>
      assert(got(cid) == want, s"click $cid: got ${got(cid)}, want $want")
    }
  }

  test("asOfJoin is left-outer: every left row survives exactly once") {
    val clicks = Tables.events(spark, sfDir).filter(col("event_type") === "click")
    assert(AsOfJoin.clickToPurchase(spark, sfDir).count() == clicks.count())
  }

  test("forward and nearest directions match a driver-side model; equal-time is inclusive both ways") {
    import SparkSpec.spark.implicits._
    // hand-built timeline, incl. an equal-time pair (L@50 with R@50),
    // a left before any right, and a left after every right
    val left  = Seq((1L, 10L), (1L, 50L), (1L, 95L), (2L, 5L), (3L, 7L)).toDF("k", "lt")
    val right = Seq((1L, 20L, "a"), (1L, 50L, "b"), (1L, 90L, "c"), (2L, 30L, "x")).toDF("k", "rt", "v")
    def run(dir: String) =
      AsOfJoin
        .asOfJoin(left, right, Seq("k"), "lt", "rt", direction = dir)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (if (r.isNullAt(3)) None else Some(r.getString(3))))
        .toMap
    val back = run("backward")
    assert(back == Map(
      (1L, 10L) -> None, (1L, 50L) -> Some("b"), (1L, 95L) -> Some("c"),
      (2L, 5L) -> None, (3L, 7L) -> None
    ))
    val fwd = run("forward")
    assert(fwd == Map(
      (1L, 10L) -> Some("a"), (1L, 50L) -> Some("b"), (1L, 95L) -> None,
      (2L, 5L) -> Some("x"), (3L, 7L) -> None
    ))
    // nearest: L@10 is 10 from R@20 (fwd) vs nothing backward; L@95 is
    // 5 from R@90; equal distances prefer backward (L@50 hits R@50 at 0)
    val near = run("nearest")
    assert(near == Map(
      (1L, 10L) -> Some("a"), (1L, 50L) -> Some("b"), (1L, 95L) -> Some("c"),
      (2L, 5L) -> Some("x"), (3L, 7L) -> None
    ))
    // exact midpoint tie goes backward: left at 55 is 5 from both b@50
    // and an added d@60
    val right2 = right.union(Seq((1L, 60L, "d")).toDF("k", "rt", "v"))
    val tie = AsOfJoin
      .asOfJoin(Seq((1L, 55L)).toDF("k", "lt"), right2, Seq("k"), "lt", "rt", direction = "nearest")
      .collect()
      .head
    assert(tie.getString(3) == "b", "equidistant nearest must prefer the backward match")
  }

  test("registered forward query == its DuckDB-style window restatement") {
    import SparkSpec.spark.implicits._
    val e = Tables.events(spark, sfDir)
    val c = e.filter(col("event_type") === "click").select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val p = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("pu"), col("ts").as("p_ts"), col("value").as("purchase_value"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("click_id")
      .orderBy(col("p_ts"), col("purchase_id"))
    val want = c
      .join(p, c("user_id") === p("pu") && p("p_ts") >= c("ts"), "left")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select("click_id", "purchase_id", "purchase_value")
    val got = AsOfJoin.clickToNextPurchase(spark, sfDir)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
