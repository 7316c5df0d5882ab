package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Skyline operator: pre-filter + exact pass vs a brute-force
  * dominance check, tie/duplicate semantics, and the no-pairwise-join
  * plan shape.
  */
class SkylineSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def brute(pts: Seq[(Long, Double, Int)]): Set[(Long, Double, Int)] =
    pts.filter { p =>
      !pts.exists(q =>
        q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
      )
    }.toSet

  test("skyline matches brute-force dominance on deterministic pseudo-random points") {
    // multiplicative-hash points: varied, reproducible, with collisions
    val pts = (1L to 500L).map { i =>
      (i, ((i * 2654435761L) % 1000L).toDouble / 10.0, ((i * 40503L) % 97L).toInt)
    }
    val got = Relational
      .skyline(pts.toDF("id", "price", "size"), "price", "size", buckets = 7)
      .as[(Long, Double, Int)]
      .collect()
      .toSet
    assert(got == brute(pts))
  }

  test("exact duplicates on both dimensions all survive; a strict-one-dim point dominates ties") {
    val pts = Seq(
      (1L, 1.0, 10), (2L, 1.0, 10), // duplicates of the frontier point: both stay
      (3L, 1.0, 9),                 // dominated by 1/2 on size at same price
      (4L, 2.0, 10),                // dominated by 1/2 on price at same size
      (5L, 0.5, 1)                  // frontier: strictly cheapest
    )
    val got = Relational
      .skyline(pts.toDF("id", "price", "size"), "price", "size", buckets = 3)
      .select("id")
      .as[Long]
      .collect()
      .toSet
    assert(got == Set(1L, 2L, 5L))
  }

  test("buckets=1 degenerate and many-buckets agree") {
    val pts = (1L to 200L).map { i =>
      (i, ((i * 7919L) % 50L).toDouble, ((i * 104729L) % 50L).toInt)
    }
    val df = pts.toDF("id", "price", "size")
    val a = Relational.skyline(df, "price", "size", buckets = 1).select("id").as[Long].collect().toSet
    val b = Relational.skyline(df, "price", "size", buckets = 64).select("id").as[Long].collect().toSet
    assert(a == b && a == brute(pts).map(_._1))
  }

  test("plan has no pairwise join: only equi-joins on the group key, no cartesian/broadcast-nested-loop") {
    val plan = Relational
      .skylineParts(spark, sfDir)
      .queryExecution
      .executedPlan
      .toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in skyline plan:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested-loop join in skyline plan:\n$plan")
  }
}
