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
}
