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

  test("sequentialPatterns: hand-built stream — strict chains only, repeats handled, equal ts never chain") {
    import SparkSpec.spark.implicits._
    // u1: a@1 b@2 c@3      → a>b, a>c, b>c, a>b>c
    // u2: a@1 b@1          → equal ts: NO a>b (strict)
    // u3: a@1 a@5 b@3      → a>a, a>b (a@1<b@3), b>a (b@3<a@5), a>b>a (1<3<5);
    //                        a>a>b needs a<a<b: 1<5 but no b after 5 → NO
    // u4: b@1 a@2 b@9      → b>a, a>b, b>b, b>a>b
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "c", 3L),
      (2L, "a", 1L), (2L, "b", 1L),
      (3L, "a", 1L), (3L, "a", 5L), (3L, "b", 3L),
      (4L, "b", 1L), (4L, "a", 2L), (4L, "b", 9L)
    ).toDF("u", "t", "ts_ns")
    val got = graft.operators.EventAnalytics
      .sequentialPatternsOn(ev, minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val want = Set(
      ("a>b", 2L, 3L), // u1, u3, u4
      ("a>c", 2L, 1L), ("b>c", 2L, 1L),
      ("a>a", 2L, 1L), // u3
      ("b>a", 2L, 2L), // u3, u4
      ("b>b", 2L, 1L), // u4
      ("a>b>c", 3L, 1L), // u1
      ("a>b>a", 3L, 1L), // u3
      ("b>a>b", 3L, 1L) // u4
    )
    assert(got == want, s"missing=${want -- got}, extra=${got -- want}")
  }

  test("sequentialPatterns == brute-force subsequence check on real events (minSupport=1 full compare)") {
    import SparkSpec.spark.implicits._
    val evDf = Tables.events(spark, sfDir).select(col("user_id").as("u"), col("event_type").as("t"), col("ts_ns"))
    val got = graft.operators.EventAnalytics
      .sequentialPatternsOn(evDf, minSupport = 1L)
      .collect()
      .map(r => (r.getString(0), r.getLong(2)))
      .toMap
    val byUser = evDf.as[(Long, String, Long)].collect().groupBy(_._1).view.mapValues(_.map(e => (e._3, e._2)).sortBy(_._1)).toMap
    def hasSeq(evs: Array[(Long, String)], pat: Seq[String]): Boolean = {
      var lastTs = Long.MinValue
      var i      = 0
      for (p <- pat) {
        var found = false
        while (i < evs.length && !found) {
          if (evs(i)._2 == p && evs(i)._1 > lastTs) { lastTs = evs(i)._1; found = true }
          i += 1
        }
        if (!found) return false
      }
      true
    }
    val types = evDf.select("t").distinct().as[String].collect().sorted.toSeq
    val want = (for {
      a <- types; b <- types
      pat2 = Seq(a, b)
      s2   = byUser.values.count(v => hasSeq(v, pat2)).toLong
      if s2 > 0
    } yield (s"$a>$b", s2)).toMap ++ (for {
      a <- types; b <- types; c <- types
      pat3 = Seq(a, b, c)
      s3   = byUser.values.count(v => hasSeq(v, pat3)).toLong
      if s3 > 0
    } yield (s"$a>$b>$c", s3)).toMap
    assert(got == want, s"missing=${(want.toSet -- got.toSet).take(4)}, extra=${(got.toSet -- want.toSet).take(4)}")
    assert(got.nonEmpty)
  }

  test("weekdayAnomalies: a weekly low-weekend rhythm is NOT flagged; a spiked Sunday is, within its cohort") {
    import SparkSpec.spark.implicits._
    // 8 weeks starting Mon 2024-01-01: weekdays 100 events/day,
    // weekends 10/day — a rhythm the cohort test must NOT flag (every
    // cohort is internally constant). The LAST Sunday (2024-02-25)
    // spikes to 200: within the 8-Sunday cohort that clears 2σ.
    val rows = (0 until 56).flatMap { d =>
      val day   = java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      val wkend = day.getDayOfWeek.getValue >= 6
      val n     = if (day.toString == "2024-02-25") 200 else if (wkend) 10 else 100
      (0 until n).map(i => (d * 1000L + i, java.sql.Timestamp.valueOf(s"$day 12:00:00")))
    }
    val ev  = rows.toDF("event_id", "ts")
    val got = graft.operators.EventAnalytics.weekdayAnomaliesOn(ev).collect()
      .map(r => (r.getDate(0).toString, r.getBoolean(3))).toMap
    val flagged = got.filter(_._2).keySet
    assert(flagged == Set("2024-02-25"), s"only the spiked Sunday may flag, got $flagged")
    assert(got.size == 56 && got.keySet.contains("2024-01-06"), "every day reports a row")
  }

  test("windowedFunnel: restart chains convert, equal-ts never chains, gap boundary is inclusive at exactly Δ") {
    import SparkSpec.spark.implicits._
    val d  = 86400000000000L // 24h in ns
    val mn = 60000000000L    // 1min in ns
    val ev = Seq(
      // u1: first-touch chain is dead (click 2 days after view) but a
      // RESTARTED chain converts — windowed must count, first-touch misses
      (1L, "view", 0L), (1L, "click", 2 * d),
      (1L, "view", 3 * d), (1L, "click", 3 * d + 5 * mn), (1L, "purchase", 3 * d + 10 * mn),
      // u2: click at EXACTLY Δ after view (inclusive boundary);
      // purchase at Δ+1ns after the click (exclusive beyond)
      (2L, "view", 0L), (2L, "click", d), (2L, "purchase", d + d + 1L),
      // u3: click precedes any view; purchase has no qualified click
      (3L, "click", 0L), (3L, "view", mn), (3L, "purchase", 2 * mn),
      // u4: equal timestamps never chain (strictly-before semantics)
      (4L, "view", 7L), (4L, "click", 7L)
    ).toDF("user_id", "event_type", "ts_ns")
    val got = graft.operators.EventAnalytics.windowedFunnelOn(ev, 24).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == ((4L, 2L, 1L)),
      s"expected (viewed=4, clicked=2, purchased=1), got $got")
  }

  test("windowedFunnel == brute-force any-chain model on real events") {
    import SparkSpec.spark.implicits._
    val gapNs = 24L * 3600L * 1000000000L
    val evDf  = Tables.events(spark, sfDir).select(col("user_id"), col("event_type"), col("ts_ns"))
    val got   = graft.operators.EventAnalytics.windowedFunnelOn(evDf, 24).collect().head
    val byUser = evDf.as[(Long, String, Long)].collect().groupBy(_._1)
    def chain(evs: Seq[(String, Long)]): (Boolean, Boolean, Boolean) = {
      val views = evs.collect { case ("view", t) => t }
      val clicks = evs.collect { case ("click", t) => t }
      val buys = evs.collect { case ("purchase", t) => t }
      val qClicks = clicks.filter(c => views.exists(v => c - v >= 1 && c - v <= gapNs))
      val qBuys = buys.filter(p => qClicks.exists(c => p - c >= 1 && p - c <= gapNs))
      (views.nonEmpty, qClicks.nonEmpty, qBuys.nonEmpty)
    }
    val want = byUser.values.map(rows => chain(rows.map(r => (r._2, r._3)).toSeq)).toSeq
    val exp  = (want.count(_._1).toLong, want.count(_._2).toLong, want.count(_._3).toLong)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) == exp)
    assert(exp._1 > 0 && exp._2 > 0, "the corpus must exercise the funnel")
  }

  private def cusumModel(xs: Seq[Long]): Seq[(Long, Boolean)] = {
    val n = xs.size.toLong
    val s = xs.sum
    var c = 0L
    xs.map { x =>
      c = math.max(0L, c + (n * x - s - s / 10))
      (c, c > 2 * s)
    }
  }

  private def cusumRun(counts: Seq[Int]): Seq[(Long, Boolean)] = {
    import SparkSpec.spark.implicits._
    val rows = counts.zipWithIndex.flatMap { case (cnt, d) =>
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d.toLong)
      (0 until cnt).map(i => (d * 10000L + i, java.sql.Timestamp.valueOf(s"$day 12:00:00")))
    }
    graft.operators.EventAnalytics
      .cusumShiftsOn(rows.toDF("event_id", "ts"))
      .collect()
      .map(r => (r.getLong(2), r.getBoolean(3)))
      .toSeq
  }

  test("cusumShifts: window identity == recursive slack-and-reset CUSUM; shift flags, flat and lone spike don't") {
    // the prefix-sum/running-min formulation must equal the recursive
    // max(0, C + y) definition on every series
    val shift = Seq.fill(30)(100) ++ Seq.fill(10)(200) // doubled traffic for the last quarter
    val flat  = Seq.fill(30)(100)
    val spike = Seq.fill(15)(100) ++ Seq(160) ++ Seq.fill(14)(100)
    for (series <- Seq(shift, flat, spike)) {
      assert(cusumRun(series) == cusumModel(series.map(_.toLong)), s"identity failed on $series")
    }
    val shiftFlags = cusumRun(shift).map(_._2)
    assert(shiftFlags.takeWhile(!_).size == 34 && shiftFlags.drop(34).forall(identity),
      "the sustained shift must flag once ~2 mean-days of excess accumulate, then stay flagged")
    assert(!cusumRun(flat).exists(_._2), "a flat series never flags")
    // a lone spike bumps the CUSUM once but the slack drains it: no
    // sustained-shift flag (this is the signal/shape distinction vs
    // the per-day z-test, which DOES flag the spike)
    assert(!cusumRun(spike).exists(_._2), "a lone spike is not a sustained shift")
  }

  private def theilSenRun(counts: Seq[Int]): (Long, Long, Long, Long, Double) = {
    import SparkSpec.spark.implicits._
    val rows = counts.zipWithIndex.flatMap { case (cnt, d) =>
      val day = java.time.LocalDate.of(2024, 5, 1).plusDays(d.toLong)
      (0 until cnt).map(i => (d * 10000L + i, java.sql.Timestamp.valueOf(s"$day 12:00:00")))
    }
    val r = graft.operators.EventAnalytics.theilSenTrendOn(rows.toDF("event_id", "ts")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
  }

  test("theilSenTrend: exact-rational median slope survives an outlier day that wrecks the mean slope") {
    // clean +2/day trend with one massive spike: Theil-Sen stays 2
    val spiked = (0 until 15).map(d => 100 + 2 * d).updated(7, 5000)
    val (n, m, num, den, slope) = theilSenRun(spiked)
    assert(n == 15L && m == 105L)
    assert(num.toDouble / den == 2.0 && slope == 2.0, s"robust slope must stay 2, got $num/$den")
    // pure model: median of all pairwise slopes
    val want = (for { i <- spiked.indices; j <- spiked.indices if i < j }
      yield (spiked(j) - spiked(i)).toDouble / (j - i)).sorted.apply((105 + 1) / 2 - 1)
    assert(slope == want)
    // a flat series reports slope exactly 0
    assert(theilSenRun(Seq.fill(10)(50))._5 == 0.0)
  }

  test("movingMedianDaily: spike-immune smoothing == sliding-window model incl. partial leading windows") {
    import SparkSpec.spark.implicits._
    val counts = Seq(100, 102, 98, 5000, 101, 99, 103, 100, 97)
    val rows = counts.zipWithIndex.flatMap { case (cnt, d) =>
      val day = java.time.LocalDate.of(2024, 6, 1).plusDays(d.toLong)
      (0 until cnt).map(i => (d * 10000L + i, java.sql.Timestamp.valueOf(s"$day 12:00:00")))
    }
    val got = graft.operators.EventAnalytics
      .movingMedianDailyOn(rows.toDF("event_id", "ts"))
      .collect()
      .map(r => r.getLong(2))
      .toSeq
    val want = counts.indices.map { i =>
      val wdw = counts.slice(math.max(0, i - 6), i + 1).sorted
      wdw((wdw.size + 1) / 2 - 1).toLong
    }
    assert(got == want, s"got $got want $want")
    assert(!got.contains(5000L), "the spike day itself smooths away (median, not mean)")
    assert(got.head == 100L, "a 1-day leading window is its own median")
  }

  test("rfmSegments: every purchasing user coded once; quartiles balanced; segment echoes the codes") {
    val got = SparkEntry.queries("events_rfm_segments")(spark, sfDir).collect()
    val users = Tables.events(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(got.length.toLong == users, "one row per purchasing user")
    Seq(4, 5, 6).foreach { i => // r, f, m columns
      val codes = got.map(_.getLong(i))
      assert(codes.forall(c => c >= 1 && c <= 4))
      val sizes = codes.groupBy(identity).view.mapValues(_.length).values.toSeq
      assert(sizes.max - sizes.min <= 1, s"ntile(4) quartiles unbalanced: $sizes")
    }
    got.foreach { r =>
      assert(r.getString(7) == s"${r.getLong(4)}${r.getLong(5)}${r.getLong(6)}", "segment != rfm concat")
    }
  }

  test("activityStreaks: islands split on calendar gaps; ties pick the earliest start") {
    import SparkSpec.spark.implicits._
    val base = java.time.LocalDate.of(2024, 6, 1)
    def ev(u: Long, d: Int, i: Int) =
      (u * 1000 + d * 10 + i, java.sql.Timestamp.valueOf(s"${base.plusDays(d.toLong)} 0$i:00:00"), u)
    // user 1: 1,2,3 | 5,6 | 9 ; user 2: 1,2 | 4,5 (tie on length)
    val rows = Seq(1 -> 1, 1 -> 2, 1 -> 3, 1 -> 5, 1 -> 6, 1 -> 9, 2 -> 1, 2 -> 2, 2 -> 4, 2 -> 5)
      .flatMap { case (u, d) => Seq(ev(u, d, 1), ev(u, d, 2)) } // 2 events/day: distinct must collapse
      .toDF("event_id", "ts", "user_id")
    val got = graft.operators.EventAnalytics.activityStreaksOn(rows).collect()
    // columns: user_id, n_active_days, n_streaks, longest_streak, longest_start
    val m = got.map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(1), r.getLong(2), r.getDate(4).toLocalDate))).toMap
    assert(m(1L) == ((3L, 6L, 3L, base.plusDays(1))), s"user 1: ${m(1L)}")
    assert(m(2L) == ((2L, 4L, 2L, base.plusDays(1))), s"user 2 must tie-break to the EARLIEST start: ${m(2L)}")
  }

  test("dauWauStickiness: wau dominates dau, the first day has no history, stickiness in (0,1]") {
    val rows = SparkEntry.queries("events_stickiness")(spark, sfDir).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau, s) =>
      assert(wau >= dau, s"$d: wau $wau < dau $dau")
      assert(s > 0.0 && s <= 1.0 && s == dau.toDouble / wau, s"$d: stickiness mismatch")
    }
    val first = rows.minBy(_._1.toEpochDay)
    assert(first._2 == first._3, "the first observed day has no trailing history: wau must equal dau")
    // the trailing window must BIND somewhere: some day has wau > dau
    assert(rows.exists(r => r._3 > r._2), "wau never exceeded dau — fixture can't witness the window")
  }

  test("ewmaDaily: lags are CALENDAR days — a 2-day gap ages the history; exact vs hand model") {
    import SparkSpec.spark.implicits._
    // days 0,1,2 then a 2-day gap then day 5: a rows-frame would treat
    // day 2 as lag 1 of day 5; the calendar semantics make it lag 3
    val series = Seq(0 -> 100, 1 -> 102, 2 -> 98, 5 -> 200)
    val base   = java.time.LocalDate.of(2024, 6, 1)
    val rows = series.flatMap { case (d, cnt) =>
      (0 until cnt).map(i => (d * 10000L + i, java.sql.Timestamp.valueOf(s"${base.plusDays(d.toLong)} 12:00:00")))
    }
    val got = graft.operators.EventAnalytics
      .ewmaDailyOn(rows.toDF("event_id", "ts"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(2), r.getLong(3)))
    val w = (0 until 8).map(l => math.pow(3, l).toLong << (2 * (7 - l)))
    val model = series.map { case (d, _) =>
      val contrib = series.collect { case (s, x) if d - s >= 0 && d - s < 8 => (x.toLong * w(d - s), w(d - s)) }
      (base.plusDays(d.toLong), contrib.map(_._1).sum, contrib.map(_._2).sum)
    }
    assert(got.toSeq == model, s"got ${got.toSeq} want $model")
    // the gap must actually bind: day 5's denominator excludes lags 1,2,4..7
    assert(got.last._3 == w(5) + w(4) + w(3) + w(0), "gap days contributed phantom weight")
  }

  test("fillForward: holes take the latest prior observation per user; leading NULLs stay NULL") {
    val got = SparkEntry
      .queries("events_fill_forward")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(got.nonEmpty && got.exists(_._3.isEmpty), "the plant must create holes")
    // non-hole rows keep their value verbatim
    got.filter(_._3.isDefined).foreach { case (id, _, v, f) => assert(f == v, s"row $id must keep its value") }
    // model: per user in (ts, event_id) order, LOCF
    import SparkSpec.spark.implicits._
    val ordered = Tables
      .events(spark, sfDir)
      .select(col("user_id"), col("event_id"), col("ts_ns"), col("value"))
      .as[(Long, Long, Long, Double)]
      .collect()
      .groupBy(_._1)
    val model = ordered.toSeq.flatMap { case (_, rows) =>
      var lastSeen: Option[Double] = None
      rows.sortBy(r => (r._3, r._2)).toSeq.map { case (_, id, _, value) =>
        val v = if (id % 5 == 0) None else Some(value)
        if (v.isDefined) lastSeen = v
        id -> lastSeen
      }
    }.toMap
    got.foreach { case (id, _, _, f) => assert(f == model(id), s"row $id: got $f want ${model(id)}") }
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

  test("markovStationary == pure-Scala integer power iteration; absorbing state keeps mass") {
    import SparkSpec.spark.implicits._
    // chain: a->b (3), a->c (1), b->a (2), b->c (2); c absorbs
    val tr = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "a", 2L), ("b", "c", 2L))
    def model(rounds: Int): Map[String, Long] = {
      val outn = tr.groupBy(_._1).map { case (s0, es) => s0 -> es.map(_._3).sum }
      val states = tr.flatMap(e => Seq(e._1, e._2)).distinct
      var m = states.map(_ -> 1000000000000L).toMap
      for (_ <- 1 to rounds) {
        val nxt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
        for ((f, t, n) <- tr) nxt(t) += m(f) * n / outn(f)
        for (s0 <- states if !outn.contains(s0)) nxt(s0) += m(s0)
        m = states.map(s0 => s0 -> nxt(s0)).toMap
      }
      m
    }
    for (rounds <- Seq(1, 8)) {
      val got = EventAnalytics
        .markovStationaryFromTransitions(tr.toDF("from_type", "to_type", "n"), rounds)
        .as[(String, Long)]
        .collect()
        .toMap
      assert(got == model(rounds), s"rounds=$rounds: got $got want ${model(rounds)}")
    }
    // closed form at rounds=8: everything not yet in c keeps cycling a<->b,
    // and c's mass is monotone non-decreasing (it absorbs)
    val m8 = model(8)
    assert(m8("c") > 2000000000000L && m8.values.sum <= 4000000000000L)
  }
}
