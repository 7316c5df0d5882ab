package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.propBoolean

import graft.operators.Evaluation

/** Property-based invariants for the evaluation tier: the distributed
  * two-phase AUC equals brute-force pair counting, and the minimax
  * isotonic fit equals classic stack-based pool-adjacent-violators,
  * over arbitrary random label/score sets (each case is a real Spark
  * job, so the case count is modest — the deterministic closed-form
  * specs carry the fast regressions).
  */
class EvaluationPropSpec extends SparkSpec {

  private def checkProp(p: Prop, cases: Int = 15): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), p)
    assert(res.passed, res.status.toString)
  }

  private val scored: Gen[List[(Long, Long)]] =
    Gen
      .chooseNum(5, 120)
      .flatMap(n => Gen.listOfN(n, Gen.zip(Gen.oneOf(0L, 1L), Gen.chooseNum(0L, 900L)))) // ~10 value-unit buckets

  private def df(rows: List[(Long, Long)]) = {
    val ss = spark
    import ss.implicits._
    rows.toDF("y", "s")
  }

  test("aucFromScored == brute-force doubled pair wins for random label/score sets") {
    checkProp(Prop.forAll(scored) { rows =>
      val pos = rows.filter(_._1 == 1L).map(_._2)
      val neg = rows.filter(_._1 == 0L).map(_._2)
      (pos.nonEmpty && neg.nonEmpty) ==> {
        val r    = Evaluation.aucFromScored(df(rows)).head()
        val wins = (for (p <- pos; n <- neg) yield if (p > n) 2L else if (p == n) 1L else 0L).sum
        r.getLong(0) == wins && r.getLong(1) == 2L * pos.length * neg.length
      }
    })
  }

  test("degreeAssortativity == independent floating Pearson over endpoint degrees") {
    val edgeGen: Gen[Set[(Long, Long)]] = Gen
      .chooseNum(8, 40)
      .flatMap(n =>
        Gen.listOfN(n * 2, Gen.zip(Gen.chooseNum(0L, 11L), Gen.chooseNum(0L, 11L)))
          .map(_.filter(e => e._1 != e._2).toSet)
      )
    checkProp(
      Prop.forAll(edgeGen) { es =>
        (es.size >= 4) ==> {
          val sym = es ++ es.map(_.swap)
          val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toDouble }
          val pts = sym.toSeq.map { case (a, b) => (deg(a), deg(b)) }
          val n   = pts.length.toDouble
          val mx  = pts.map(_._1).sum / n
          val sxy = pts.map { case (x, y) => (x - mx) * (y - mx) }.sum
          val sxx = pts.map { case (x, _) => (x - mx) * (x - mx) }.sum
          val ss  = spark
          import ss.implicits._
          val r = graft.operators.Graph.degreeAssortativity(sym.toSeq.toDF("src", "dst")).head().getDouble(4)
          if (sxx == 0.0) r.isNaN || r.isInfinite // regular graph: undefined both ways
          else math.abs(r - sxy / sxx) < 1e-9
        }
      },
      cases = 12
    )
  }

  /** Classic stack PAV over (n, sumY) bins, exact-rational merges. */
  private def modelPav(bins: Seq[(Long, Long, Long)]): Seq[(Long, Double)] = {
    // bins: (bucket, n, sumY) in bucket order
    val pools = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, List[Long])] // (n, sumY, members)
    bins.foreach { case (b, n, y) =>
      pools += ((n, y, List(b)))
      // merge while the previous pool's mean EXCEEDS the last (violation)
      while (pools.length >= 2 && {
               val a = pools(pools.length - 2); val c = pools.last
               a._2 * c._1 > c._2 * a._1 // cross-multiplied mean compare
             }) {
        val c = pools.remove(pools.length - 1)
        val a = pools.remove(pools.length - 1)
        pools += ((a._1 + c._1, a._2 + c._2, a._3 ++ c._3))
      }
    }
    pools.toSeq.flatMap { case (n, y, members) => members.map(b => b -> y.toDouble / n) }.sortBy(_._1)
  }

  test("isotonicFromScored == stack-based pool-adjacent-violators on random sets") {
    checkProp(Prop.forAll(scored) { rows =>
      val got = Evaluation
        .isotonicFromScored(df(rows))
        .collect()
        .map(r => (r.getLong(0), r.getDouble(3)))
        .toSeq
      val bins = rows
        .groupBy(_._2 / 100) // same value-unit binning as the operator (scores 0..40 -> bucket 0)
        .toSeq
        .map { case (b, xs) => (b, xs.length.toLong, xs.map(_._1).sum) }
        .sortBy(_._1)
      val want = modelPav(bins)
      got == want
    })
  }
}
