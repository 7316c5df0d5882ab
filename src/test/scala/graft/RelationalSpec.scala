package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Sanity + plan-shape checks for the relational surface. Value-level
  * correctness is covered by the DuckDB oracle gate (Verify +
  * tools/check_oracle.py); these specs pin invariants and the physical
  * plans we rely on at scale.
  */
class RelationalSpec extends SparkSpec {

  test("q1 groups are complete and counts sum to the filtered table") {
    val q1    = Relational.q1PricingSummary(spark, sfDir).collect()
    val total = q1.map(_.getAs[Long]("count_order")).sum
    val n = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-12-01").cast("timestamp"))
      .count()
    assert(total == n)
  }

  test("broadcast joins are planned for dimension tables in q5") {
    val plan = Relational.q5LocalSupplierVolume(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"q5 should broadcast dimensions:\n$plan")
  }

  test("filter pushdown reaches the parquet scan in q6") {
    val exec = Relational.q6ForecastRevenue(spark, sfDir).queryExecution.executedPlan.toString
    assert(exec.contains("PushedFilters: [") && exec.contains("l_shipdate"), s"q6 pushdown missing:\n$exec")
  }

  test("topn plans as TakeOrderedAndProject (no global sort at scale)") {
    val plan = Relational.topNOrders(spark, sfDir).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"limit+sort should fuse:\n$plan")
  }

  test("approx_count_distinct: emitted exact counts match a recompute, every ε verdict true") {
    val rows = Relational.approxDistinctAgg(spark, sfDir).collect()
    val exact = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val k = r.getString(0)
      assert((r.getLong(1), r.getLong(2)) == exact(k), s"$k exact counts drifted")
      assert(r.getBoolean(3) && r.getBoolean(4), s"$k: approx fell outside the ε bound")
    }
  }

  test("approx_percentile: group counts match a recompute, every ε verdict true") {
    val rows = Relational.approxQuantiles(spark, sfDir).collect()
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus")
      .count()
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getString(0)
      assert(r.getLong(1) == exact(k), s"$k group count drifted")
      assert(r.getBoolean(2) && r.getBoolean(3) && r.getBoolean(4), s"$k: approx fell outside the ε bound")
    }
  }

  test("modeAgg picks the max-count value with smallest-value tie-break") {
    val got = Relational.modeAgg(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    counts.groupBy(_._1).foreach { case (status, rows) =>
      val want = rows.map { case (_, p, n) => (-n, p) }.min
      assert(got(status) == (want._2, -want._1), s"$status mode mismatch")
    }
  }

  test("equidepthHistogram: near-equal bucket counts, exhaustive, monotone bounds") {
    val rows = Relational.equidepthHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val totals = Tables.orders(spark, sfDir).groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (status, bs) =>
      assert(bs.map(_._3).sum == totals(status), s"$status: buckets must partition the group")
      assert(bs.map(_._3).max - bs.map(_._3).min <= 1, s"$status: equi-depth means counts within 1")
      val sorted = bs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._4, s"$status: bucket bounds must be monotone")
        case _           => ()
      }
      sorted.foreach { case (_, _, _, lo, hi) => assert(lo <= hi) }
    }
  }

  test("set ops partition: union == intersect + both excepts, disjointly") {
    val rows = Relational.setOps(spark, sfDir).collect().map(r => (r.getString(0), r.getLong(1)))
    val u    = rows.filter(_._1 == "union").map(_._2).toSet
    val i    = rows.filter(_._1 == "intersect").map(_._2).toSet
    val e    = rows.filter(_._1 == "except").map(_._2).toSet
    assert((i ++ e).subsetOf(u))
    assert(i.intersect(e).isEmpty)
  }

  test("left join keeps customers without orders; anti join complements semi") {
    val left = Relational.joinLeftOrderCounts(spark, sfDir).collect()
    assert(left.length == Tables.customer(spark, sfDir).count())
    val semi  = Relational.joinSemiBigSpenders(spark, sfDir).collect().map(_.getLong(0)).toSet
    val anti  = Relational.joinAntiNoOrders(spark, sfDir).collect().map(_.getLong(0)).toSet
    val all   = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(semi.intersect(anti).isEmpty)
    assert(semi ++ anti == all)
  }

  test("TopKAgg buffer: NaN can't poison a full buffer; ties break by smaller id") {
    val buf = new graft.functions.TopKAgg.Buffer(3)
    buf.insert(Double.NaN, 9L)
    buf.insert(1.0, 1L)
    buf.insert(2.0, 2L)
    // buffer full with NaN ranked first (Double.compare total order);
    // a later high finite score must still displace the tail
    buf.insert(100.0, 3L)
    assert(buf.n == 3)
    assert(buf.scores(0).isNaN && buf.ids(0) == 9L)
    assert(buf.scores(1) == 100.0 && buf.ids(1) == 3L)
    assert(buf.scores(2) == 2.0 && buf.ids(2) == 2L)
    // tie-break: equal scores prefer the smaller id
    val t = new graft.functions.TopKAgg.Buffer(2)
    t.insert(5.0, 7L); t.insert(5.0, 3L); t.insert(5.0, 9L)
    assert(t.ids.take(2).toSeq == Seq(3L, 7L))
  }

  test("topk_agg matches the window top-k bit-for-bit and plans as partial aggregation") {
    val viaAgg = Relational
      .topkAggPerCustomer(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val viaWindow = Relational
      .windowTop3PerCustomer(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaAgg.toSeq == viaWindow.toSeq)
    val plan = Relational.topkAggPerCustomer(spark, sfDir).queryExecution.executedPlan.toString
    // partial→final ObjectHashAggregate: the shuffle carries k pairs
    // per group, not every row (the scale point of the operator)
    assert(plan.contains("ObjectHashAggregate"), s"no imperative-aggregate plan:\n$plan")
    assert(!plan.contains("Window"), s"fell back to a window plan:\n$plan")
  }

  // ------------------------------------------------ interval-overlap join

  test("intervalOverlapJoin == naive nested-loop overlap on real session intervals") {
    import graft.operators.EventAnalytics
    val sess = EventAnalytics.sessionIntervals(spark, sfDir, maxUser = 200L)
    def key(r: org.apache.spark.sql.Row) = (
      r.getStruct(0).getLong(0), r.getStruct(0).get(1).toString,
      r.getStruct(1).getLong(0), r.getStruct(1).get(1).toString, r.getLong(2)
    )
    val fast = Relational
      .intervalOverlapJoin(sess, sess, "s_start", "s_end", binSeconds = 3600L,
        extraCond = col("l.user_id") < col("r.user_id"))
      .collect().map(key).toSet
    val naive = sess.as("a")
      .crossJoin(sess.as("b"))
      .filter(col("a.user_id") < col("b.user_id") &&
        col("a.s_start") <= col("b.s_end") && col("b.s_start") <= col("a.s_end"))
      .select(
        struct(col("a.user_id"), col("a.s_start"), col("a.s_end")).as("l"),
        struct(col("b.user_id"), col("b.s_start"), col("b.s_end")).as("r"),
        (unix_micros(least(col("a.s_end"), col("b.s_end"))) -
          unix_micros(greatest(col("a.s_start"), col("b.s_start")))).as("overlap_us")
      )
      .collect().map(key).toSet
    assert(fast == naive, s"missing=${naive -- fast}, extra=${fast -- naive}")
    assert(naive.nonEmpty, "corpus must exercise the overlap join")
  }

  test("intervalOverlapJoin corner cases: touching endpoints join, disjoint do not, bins do not duplicate") {
    import SparkSpec.spark.implicits._
    val mk = (id: Long, s: String, e: String) => (id, java.sql.Timestamp.valueOf(s), java.sql.Timestamp.valueOf(e))
    val left = Seq(
      mk(1L, "2024-01-01 10:00:00", "2024-01-01 12:00:00"),  // spans 3 hour-bins
      mk(2L, "2024-01-01 13:00:00", "2024-01-01 13:10:00")
    ).toDF("id", "start", "end")
    val right = Seq(
      mk(10L, "2024-01-01 12:00:00", "2024-01-01 12:30:00"), // touches 1's end exactly
      mk(11L, "2024-01-01 10:30:00", "2024-01-01 11:30:00"), // nested in 1 (shares 2 bins)
      mk(12L, "2024-01-01 14:00:00", "2024-01-01 15:00:00")  // disjoint from both
    ).toDF("id", "start", "end")
    val got = Relational
      .intervalOverlapJoin(left, right)
      .select(col("l.id").as("a"), col("r.id").as("b"), col("overlap_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got == Set((1L, 10L, 0L), (1L, 11L, 3600L * 1000000L)), s"got $got")
  }

  test("intervalOverlapJoin plans an equi-join on the bin, not a nested loop") {
    import graft.operators.EventAnalytics
    val sess = EventAnalytics.sessionIntervals(spark, sfDir)
    val plan = Relational
      .intervalOverlapJoin(sess, sess, "s_start", "s_end",
        extraCond = col("l.user_id") < col("r.user_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      s"overlap join must be the binned equi-join:\n$plan")
  }

  test("exactKth: histogram-refinement selection == sorted index on duplicates, skew, extremes") {
    import SparkSpec.spark.implicits._
    val cases: Seq[Seq[Long]] = Seq(
      Seq(5L),
      Seq(3L, 1L, 2L),
      Seq(7L, 7L, 7L, 7L),
      (1L to 1000L) ++ Seq.fill(500)(42L),                          // heavy duplicate mass
      Seq(0L, 1L, 1000000000000L, 1000000000001L),                  // huge sparse range
      scala.util.Random.shuffle((1L to 257L).toList).toSeq
    )
    for (xs <- cases) {
      val df     = xs.toDF("v")
      val sorted = xs.sorted
      for (k <- Seq(1, (xs.size + 1) / 2, xs.size)) {
        val got = Relational.exactKth(df, "v", k.toLong)
        assert(got == sorted(k - 1), s"k=$k over ${xs.take(5)}...: got $got want ${sorted(k - 1)}")
      }
    }
    // refusals
    intercept[IllegalArgumentException](Relational.exactKth(Seq(1L).toDF("v"), "v", 2L))
    intercept[IllegalArgumentException](Relational.exactKth(Seq(1L).toDF("v"), "v", 0L))
    // real data: median of order totalprice cents == orderBy selection
    val cents = Tables.orders(spark, sfDir).select(round(col("o_totalprice") * 100).cast("long").as("v"))
    val n     = cents.count()
    val want  = cents.orderBy("v").limit(((n + 1) / 2).toInt).collect().last.getLong(0)
    assert(Relational.exactKth(cents, "v", (n + 1) / 2) == want)
  }

  test("exactKth stays exact over the FULL long domain (hi-lo overflow, >2^53 spans, MinValue/MaxValue)") {
    import SparkSpec.spark.implicits._
    // span > Long.MaxValue (sign-split round) with extremes present;
    // adjacent boundary values past 2^53 where double division mis-bins
    val cases: Seq[Seq[Long]] = Seq(
      Seq(Long.MinValue, -7L, -1L, 0L, 3L, Long.MaxValue),
      Seq(Long.MinValue, Long.MinValue + 1, Long.MaxValue - 1, Long.MaxValue),
      Seq(-(1L << 60), -(1L << 60) + 1, (1L << 60) - 1, 1L << 60),
      Seq((1L << 55), (1L << 55) + 1, (1L << 55) + 2, Long.MaxValue - 1, Long.MaxValue)
    )
    for (xs <- cases) {
      val sorted = xs.sorted
      for (k <- 1 to xs.size) {
        val got = Relational.exactKth(xs.toDF("v"), "v", k.toLong)
        assert(got == sorted(k - 1), s"k=$k over $xs: got $got want ${sorted(k - 1)}")
      }
    }
  }

  test("groupedExactKth == per-group sorted model (duplicates, skew, overflow domains); refusals loud") {
    import SparkSpec.spark.implicits._
    // groups with different sizes, duplicate mass, full-long-domain
    // extremes (one group spans MinValue..MaxValue — the sign-split)
    val data: Seq[(String, Long)] =
      (1L to 1000L).map(("a", _)) ++
        Seq.fill(500)(("a", 42L)) ++
        Seq(("b", 7L)) ++
        Seq(("c", Long.MinValue), ("c", -7L), ("c", 0L), ("c", 3L), ("c", Long.MaxValue)) ++
        (1L to 257L).map(i => ("d", (1L << 55) + i))
    val df = data.toDF("g", "v")
    val model = data.groupBy(_._1).map { case (g, xs) =>
      val sorted = xs.map(_._2).sorted
      g -> sorted(((sorted.size + 1) / 2 - 1).toInt)
    }
    val got = Relational
      .groupedExactKth(df, "g", "v", n => (n + 1) / 2)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(got == model, s"got $got want $model")
    // k = max rank too (per-group maximum)
    val gotMax = Relational
      .groupedExactKth(df, "g", "v", n => n)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(gotMax == data.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).max })
    // real data: per-status median of order price cents == window replay
    val o = Tables.orders(spark, sfDir)
      .select(col("o_orderstatus").as("g"), round(col("o_totalprice") * 100).cast("long").as("v"))
    val want = o
      .withColumn("rn", row_number().over(org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v")))
      .withColumn("n", count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("g")))
      .filter(expr("rn = (n + 1) DIV 2"))
      .select("g", "v")
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val real = Relational
      .groupedExactKth(o, "g", "v", n => (n + 1) / 2)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    assert(real == want)
    // refusals: driver-state cap, empty relation, k out of range
    val many = (1L to 100L).map(i => (s"g$i", i)).toDF("g", "v")
    val e    = intercept[IllegalArgumentException](Relational.groupedExactKth(many, "g", "v", n => 1L, maxGroups = 64))
    assert(e.getMessage.contains("maxGroups"))
    intercept[IllegalArgumentException](Relational.groupedExactKth(df.filter(lit(false)), "g", "v", n => 1L))
    intercept[IllegalArgumentException](Relational.groupedExactKth(df, "g", "v", n => n + 1))
  }

  test("itemNeighborsFrom: mega-basket fan-out is capped deterministically; TPC-H output unchanged under the cap") {
    import SparkSpec.spark.implicits._
    // one pathological 500-item basket + a few normal baskets: the cap
    // keeps the 8 highest-support items of the mega-basket, so the
    // pair stage emits <= 8*7/2 pairs for it instead of ~125k
    val normal = (1 to 6).flatMap(o => Seq((o.toLong, 1L), (o.toLong, 2L), (o.toLong, 3L)))
    val mega   = (1L to 500L).map(i => (99L, i))
    val baskets = (normal ++ mega).toDF("okey", "item")
    val capped = Relational.itemNeighborsFrom(baskets, k = 5, minSupport = 3L, maxBasketItems = 8)
    // items 1,2,3 have support 7 (6 normal + mega); every other mega item
    // has support 1 < minSupport and is pruned before the cap anyway —
    // so the surviving mega-basket rows are exactly {1,2,3} and results
    // must equal the uncapped run
    val uncapped = Relational.itemNeighborsFrom(baskets, k = 5, minSupport = 3L, maxBasketItems = 500)
    assert(capped.collect().toSeq == uncapped.collect().toSeq)
    // cap BELOW the frequent-item count per basket: with maxBasketItems=2
    // only the 2 smallest ids (support ties) survive per basket, so item 3
    // can never pair — the cap provably bites
    val tight = Relational.itemNeighborsFrom(baskets, k = 5, minSupport = 3L, maxBasketItems = 2)
      .select("item").as[Long].collect().toSet
    assert(tight == Set(1L, 2L), s"cap must bound the basket deterministically, got $tight")
    intercept[IllegalArgumentException](Relational.itemNeighborsFrom(baskets, maxBasketItems = 1))
  }

  test("basketPairsFrom: mega-basket pair fan-out is capped deterministically") {
    import SparkSpec.spark.implicits._
    // two identical 1000-item baskets (every item frequent at
    // minSupport=2): uncapped, the pair self-join would emit
    // 2·C(1000,2) ≈ 1M rows; capped at 10, each basket keeps its 10
    // highest-support items (supports all tie at 2 → ties to the
    // smaller id = items 1..10), so the output is exactly the
    // C(10,2)=45 pairs, each with pair_support 2
    val mega = (1 to 2).flatMap(o => (1L to 1000L).map(i => (o.toLong, i)))
    val got = Relational
      .basketPairsFrom(mega.toDF("okey", "item"), minSupport = 2L, maxBasketItems = 10)
      .as[(Long, Long, Long)]
      .collect()
      .toSet
    val want = (for { a <- 1L to 10L; b <- (a + 1) to 10L } yield (a, b, 2L)).toSet
    assert(got == want, s"cap must bound the mega-basket, got ${got.size} pairs")
    // the cap binds exactly at maxBasketItems and is neutral above the
    // basket size (the TPC-H shape the registered query runs with)
    val small = (1 to 6).flatMap(o => (1L to 5L).map(i => (o.toLong, i))).toDF("okey", "item")
    val at3 = Relational.basketPairsFrom(small, 2L, maxBasketItems = 3).as[(Long, Long, Long)].collect().toSet
    assert(at3 == Set((1L, 2L, 6L), (1L, 3L, 6L), (2L, 3L, 6L)), s"binding cap wrong: $at3")
    assert(
      Relational.basketPairsFrom(small, 2L, maxBasketItems = 5).collect().toSeq ==
        Relational.basketPairsFrom(small, 2L, maxBasketItems = 256).collect().toSeq
    )
    intercept[IllegalArgumentException](Relational.basketPairsFrom(small, 2L, maxBasketItems = 1))
  }

  test("groupOlsSlope: exact integer sums; slope matches an independent double OLS") {
    import SparkSpec.spark.implicits._
    val rows = Relational.groupOlsSlope(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val data = Tables
      .lineitem(spark, sfDir)
      .select(col("l_returnflag"), col("l_quantity").cast("long"), round(col("l_extendedprice") * 100).cast("long"))
      .as[(String, Long, Long)]
      .collect()
      .groupBy(_._1)
    rows.foreach { r =>
      val g  = data(r.getString(0)).map(t => (t._2, t._3))
      val n  = g.length.toLong
      assert(r.getLong(1) == n && r.getLong(2) == g.map(_._1).sum && r.getLong(3) == g.map(_._2).sum)
      assert(r.getLong(4) == g.map(t => t._1 * t._2).sum && r.getLong(5) == g.map(t => t._1 * t._1).sum)
      // independent float OLS: same value to ~1e-9 relative (the exact
      // path differs only in when the rounding to double happens)
      val (xs, ys) = (g.map(_._1.toDouble), g.map(_._2.toDouble))
      val want     = (n * xs.zip(ys).map { case (a, b) => a * b }.sum - xs.sum * ys.sum) /
        (n * xs.map(a => a * a).sum - xs.sum * xs.sum)
      val got = r.getDouble(6)
      assert(math.abs(got - want) <= math.abs(want) * 1e-9, s"${r.getString(0)}: $got vs $want")
    }
  }

  test("openOrderBacklog == brute-force sweep over collected intervals") {
    import SparkSpec.spark.implicits._
    val got = Relational
      .openOrderBacklog(spark, sfDir)
      .select(col("day").cast("string"), col("n_open"))
      .as[(String, Long)]
      .collect()
      .toSeq
    val ship = Tables
      .lineitem(spark, sfDir)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).cast("string"))
      .as[(Long, String)]
      .collect()
      .groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).max }
    val ords = Tables
      .orders(spark, sfDir)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).cast("string"))
      .as[(Long, String)]
      .collect()
    def day(s: String)  = java.time.LocalDate.parse(s)
    val deltas = scala.collection.mutable.Map.empty[java.time.LocalDate, Long].withDefaultValue(0L)
    ords.foreach { case (k, od) =>
      deltas(day(od)) += 1L
      deltas(day(ship.getOrElse(k, od)).plusDays(1)) -= 1L
    }
    var open = 0L
    val want = deltas.toSeq.sortBy(_._1.toEpochDay).map { case (d, net) => open += net; (d.toString, open) }
    assert(got == want, s"got ${got.take(3)}... want ${want.take(3)}...")
    assert(got.last._2 == 0L, "the backlog must close at zero after the last ship day")
  }
}
