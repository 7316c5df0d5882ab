package graft

import org.apache.spark.sql.functions._

import graft.operators.Evaluation

/** eval_auc_exact / eval_pr_curve values are pinned by their DuckDB
  * oracles; this spec pins the METRIC SEMANTICS on closed-form cases
  * (perfect / inverted / random ranking, tie handling) and the curve
  * invariants, plus a brute-force pair-count cross-check — evidence
  * the two-phase cumulative machinery computes Mann-Whitney exactly.
  */
class EvaluationSpec extends SparkSpec {

  private def scoredDf(rows: Seq[(Long, Long)]) = {
    val ss = spark
    import ss.implicits._
    rows.toDF("y", "s")
  }

  private def auc(rows: Seq[(Long, Long)]): (Long, Long, Double) = {
    val r = Evaluation.aucFromScored(scoredDf(rows)).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  test("closed forms: perfect separation → 1, inverted → 0, all-tied → 1/2") {
    val pos = (1L to 40L).map(i => (1L, 100L + i))
    val neg = (1L to 60L).map(i => (0L, i))
    assert(auc(pos ++ neg)._3 == 1.0)
    assert(auc(pos.map { case (y, s) => (y, -s) } ++ neg.map { case (y, s) => (y, -s) })._3 == 0.0)
    val tied = (1L to 30L).map(i => (i % 2, 7L))
    assert(auc(tied)._3 == 0.5)
  }

  test("tie correction matches brute-force pair counting on irregular ties") {
    // deterministic irregular case: score = i*i % 13 collides heavily
    val rows = (1L to 200L).map(i => ((i * 31 % 5) / 4, i * i % 13))
    val (num, den, a) = auc(rows)
    // brute force: wins + half-ties over pos×neg pairs
    val pos   = rows.filter(_._1 == 1L).map(_._2)
    val negs  = rows.filter(_._1 == 0L).map(_._2)
    val wins  = (for (p <- pos; n <- negs) yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(num == wins, s"num $num != brute-force doubled wins $wins")
    assert(den == 2L * pos.length * negs.length)
    assert(a == wins.toDouble / (2L * pos.length * negs.length))
  }

  test("two-phase cumulative is block-width invariant") {
    val rows = (1L to 500L).map(i => ((i * 17 % 3) / 2, (i * i) % 4001))
    val wide = Evaluation.cumulativeByScore(scoredDf(rows), blockWidth = 1000000L).orderBy("s").collect()
    val tiny = Evaluation.cumulativeByScore(scoredDf(rows), blockWidth = 7L).orderBy("s").collect()
    assert(wide.map(_.toSeq).toSeq == tiny.map(_.toSeq).toSeq, "block width changed cumulative counts")
  }

  test("isotonic fit: monotone, in [0,1], mass-preserving; closed forms pool exactly") {
    val fit = Evaluation.isotonicCalibration(spark, sfDir).collect()
    assert(fit.nonEmpty)
    fit.sliding(2).foreach {
      case Array(a, b) => assert(b.getDouble(3) >= a.getDouble(3), "fit must be nondecreasing")
      case _           =>
    }
    assert(fit.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // PAV preserves total mass: sum n_i * fit_i == total positives
    val mass = fit.map(r => r.getLong(1) * r.getDouble(3)).sum
    val pos  = fit.map(_.getLong(2)).sum
    assert(math.abs(mass - pos) < 1e-6 * math.max(1.0, pos), s"mass $mass != positives $pos")
    // closed forms: already-monotone input is untouched; a violation pools
    def tiny(rows: Seq[(Long, Long)]) =
      Evaluation.isotonicFromScored(scoredDf(rows)).collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    // bins 0 and 1 (scores 0, 100): rates 1/4 then 3/4 — monotone, kept
    val mono = tiny(Seq((1L, 0L), (0L, 0L), (0L, 0L), (0L, 0L), (1L, 100L), (1L, 100L), (1L, 100L), (0L, 100L)))
    assert(mono == Seq((0L, 0.25), (1L, 0.75)), s"monotone case altered: $mono")
    // rates 3/4 then 1/4 — violation pools to the global mean 1/2
    val pooled = tiny(Seq((1L, 0L), (1L, 0L), (1L, 0L), (0L, 0L), (0L, 100L), (0L, 100L), (0L, 100L), (1L, 100L)))
    assert(pooled == Seq((0L, 0.5), (1L, 0.5)), s"violation not pooled: $pooled")
  }

  test("PR curve invariants: tp+fn constant, monotone counts, extremes") {
    val curve = Evaluation.prCurve(spark, sfDir).collect()
    assert(curve.nonEmpty)
    val p = curve.head.getLong(1) + curve.head.getLong(3)
    assert(curve.forall(r => r.getLong(1) + r.getLong(3) == p), "tp+fn is not the constant positive count")
    // threshold ascending → tp and fp nonincreasing
    curve.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getLong(1) <= a.getLong(1) && b.getLong(2) <= a.getLong(2), "tp/fp not monotone in threshold")
      case _ =>
    }
    // lowest threshold admits everything
    assert(curve.head.getLong(3) == 0L, "fn at the lowest threshold must be 0")
  }

  test("ksFromScored == brute-force two-sample KS (exact integer pair), incl. negatives and ties") {
    val rnd = new scala.util.Random(3L)
    // skewed sample sizes, negative scores, heavy ties (range -25..24)
    val rows = (1 to 400).map(_ => (if (rnd.nextInt(3) == 0) 1L else 0L, rnd.nextInt(50).toLong - 25L))
    val s1 = rows.filter(_._1 == 1L).map(_._2)
    val s2 = rows.filter(_._1 == 0L).map(_._2)
    val (n1, n2) = (s1.size.toLong, s2.size.toLong)
    val num = rows.map(_._2).distinct.map { v =>
      math.abs(n2 * s1.count(_ <= v) - n1 * s2.count(_ <= v))
    }.max
    val r = Evaluation.ksFromScored(scoredDf(rows)).head()
    assert(r.getLong(0) == num, s"ks_num ${r.getLong(0)} != brute $num")
    assert(r.getLong(1) == n1 * n2)
    assert(r.getDouble(2) == num.toDouble / (n1 * n2))
    // closed forms: identical samples → 0; disjoint supports → 1
    val same = (1L to 50L).flatMap(i => Seq((1L, i % 7), (0L, i % 7)))
    assert(Evaluation.ksFromScored(scoredDf(same)).head().getDouble(2) == 0.0)
    val split = (1L to 30L).map(i => (1L, i)) ++ (1L to 30L).map(i => (0L, 100L + i))
    assert(Evaluation.ksFromScored(scoredDf(split)).head().getDouble(2) == 1.0)
  }

  test("ksFromScored refuses loudly when one sample is empty (no silent 0/0 NaN)") {
    def chain(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: chain(t.getCause)
    Seq(
      (1 to 20).map(i => (1L, i.toLong)), // all in sample 1
      (1 to 20).map(i => (0L, i.toLong))  // all in sample 2
    ).foreach { rows =>
      val ex = intercept[Exception](Evaluation.ksFromScored(scoredDf(rows)).collect())
      assert(
        chain(ex).exists(t => Option(t.getMessage).exists(_.contains("sample is empty"))),
        s"expected the empty-sample raise, got: $ex"
      )
    }
  }
}
