package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventAnalytics, Relational}

/** Market-basket pair mining and event-transition counts: Apriori
  * pruning correctness and window-ordering determinism.
  */
class BasketTransitionsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("basketPairs counts co-occurrences and drops infrequent items before pairing") {
    // orders: {1,2,3}, {1,2}, {1,2,4}: item 3 and 4 infrequent (support 1)
    // pairs: (1,2) x3 frequent; (1,3),(2,3),(1,4),(2,4) never formed
    val real = Relational.basketPairs(spark, sfDir, minSupport = 2L)
    val plan = real.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"basket pairing must be an equi-join:\n$plan")
    val brute = {
      val b = Tables
        .lineitem(spark, sfDir)
        .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
        .distinct()
        .as[(Long, Long)]
        .collect()
        .groupBy(_._1)
        .values
        .map(_.map(_._2).toSet)
        .toSeq
      val pairCounts = b
        .flatMap(items => for { a <- items; c <- items if a < c } yield (a, c))
        .groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
        .filter(_._2 >= 2L)
      // frequent-item pruning never changes the >=2-support pair set:
      // a pair with support 2 has both items with support >= 2
      pairCounts
    }
    val got = real.as[(Long, Long, Long)].collect().map { case (a, c, s) => (a, c) -> s }.toMap
    assert(got == brute)
  }

  test("basketRules == brute-force Apriori rules: supports, integer confidence gate, lift quotients") {
    val real = Relational.basketRules(spark, sfDir, minSupport = 2L, minConfPct = 5L)
    val plan = real.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"rule derivation must stay equi-join:\n$plan")
    val baskets = Tables
      .lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
      .as[(Long, Long)]
      .collect()
    val n       = baskets.map(_._1).distinct.length.toLong
    val itemSup = baskets.groupBy(_._2).map { case (i, v) => i -> v.length.toLong }.filter(_._2 >= 2L)
    val sets    = baskets.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val pairSup = sets
      .flatMap(s => for { a <- s; b <- s if a < b } yield (a, b))
      .groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= 2L)
    val want = pairSup.toSeq
      .flatMap { case ((a, b), ps) => Seq((a, b, ps), (b, a, ps)) }
      .filter { case (ant, _, ps) => ps * 100L >= itemSup(ant) * 5L }
      .map { case (ant, cons, ps) =>
        (ant, cons) -> (ps, itemSup(ant), itemSup(cons), n,
          ps.toDouble / itemSup(ant), (ps * n).toDouble / (itemSup(ant) * itemSup(cons)))
      }
      .toMap
    val got = real
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)]
      .collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6, r._7, r._8)))
      .toMap
    assert(got == want, s"got ${got.size} rules, want ${want.size}")
    // every pair yields both directions unless the confidence gate binds
    assert(got.nonEmpty && got.keySet.exists { case (a, b) => got.contains((b, a)) })
  }

  test("eventTransitions: hand-built stream and total-order tiebreak on equal timestamps") {
    import java.sql.Timestamp
    def t(sec: Int) = Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d")
    val ev = Seq(
      (1L, t(1), 1L, "view"), (2L, t(2), 1L, "click"), (3L, t(3), 1L, "purchase"),
      // user 2: equal timestamps — event_id breaks the tie
      (10L, t(5), 2L, "view"), (11L, t(5), 2L, "click"),
      (20L, t(9), 3L, "error") // single event: no transition
    ).toDF("event_id", "ts", "user_id", "event_type")
    // route through the same code path by building a temp table frame
    val got = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      ev.withColumn("next_type", lead("event_type", 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)]
        .collect()
        .toSet
    }
    assert(got == Set(("view", "click", 2L), ("click", "purchase", 1L)))
    // the registered operator conserves transitions: n-1 per user with n>=1 events
    val real  = EventAnalytics.eventTransitions(spark, sfDir)
    val total = real.agg(sum("n_transitions")).as[Long].head()
    val users = Tables.events(spark, sfDir).groupBy("user_id").count().as[(Long, Long)].collect()
    assert(total == users.map(_._2 - 1).sum)
  }

  test("basketTriples == brute-force triple counts; Apriori pruning loses nothing (downward closure)") {
    val got = Relational
      .basketTriples(spark, sfDir, minSupport = 2L)
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet
    val baskets = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 60000L)
      .select(col("l_orderkey").as("okey"), (col("l_partkey") % 2000L).as("item"))
      .distinct()
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .values
      .map(_.map(_._2).toSet)
      .toSeq
    val brute = baskets
      .flatMap { items =>
        val s = items.toSeq.sorted
        for { i <- s.indices; j <- (i + 1) until s.size; k <- (j + 1) until s.size } yield (s(i), s(j), s(k))
      }
      .groupBy(identity)
      .map { case (t, v) => (t._1, t._2, t._3, v.size.toLong) }
      .filter(_._4 >= 2L)
      .toSet
    assert(got == brute, s"missing=${(brute -- got).take(3)}, extra=${(got -- brute).take(3)}")
    assert(got.nonEmpty, "the corpus must produce frequent triples")
    val plan = Relational.basketTriples(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"triple mining must stay equi-joined:\n$plan")
  }

  test("itemItemNeighbors == brute-force Jaccard CF model on the real baskets (top-k, tie-breaks, symmetry)") {
    val k   = 5
    val got = Relational
      .itemItemNeighbors(spark, sfDir, k = k, minSupport = 3L)
      .as[(Long, Long, Long, Long, Double)]
      .collect()
      .toSeq
    // brute force from collected baskets
    val baskets = Tables
      .lineitem(spark, sfDir)
      .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
      .distinct()
      .as[(Long, Long)]
      .collect()
      .groupBy(_._1)
      .values
      .map(_.map(_._2).toSet)
      .toSeq
    val supp = baskets.flatMap(_.toSeq).groupBy(identity).map { case (i, v) => i -> v.size.toLong }
    val freq = supp.filter(_._2 >= 3L)
    val cooc = baskets
      .flatMap(items => for { a <- items if freq.contains(a); b <- items if freq.contains(b) && a < b } yield (a, b))
      .groupBy(identity)
      .map { case (p, v) => p -> v.size.toLong }
      .filter(_._2 >= 2L)
    val want = cooc.toSeq
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .map { case (i, n, c) => (i, n, c, c.toDouble / (freq(i) + freq(n) - c)) }
      .groupBy(_._1)
      .flatMap { case (i, rows) =>
        rows.sortBy(r => (-r._4, r._2)).take(k).zipWithIndex.map { case ((_, n, c, s), idx) =>
          (i, idx + 1L, n, c, s)
        }
      }
      .toSet
    assert(got.toSet == want, s"missing=${(want -- got.toSet).take(3)}, extra=${(got.toSet -- want).take(3)}")
    assert(got.nonEmpty, "the corpus must produce neighbor lists")
    // ranks are contiguous from 1 per item
    got.groupBy(_._1).foreach { case (i, rows) =>
      assert(rows.map(_._2).sorted == (1L to rows.length.toLong), s"item $i ranks not contiguous")
    }
    // no cartesian anywhere
    val plan = Relational.itemItemNeighbors(spark, sfDir).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"CF pairing must be an equi-join:\n$plan")
  }
}
