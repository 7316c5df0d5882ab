package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Exchange-free bucketed PageRank: the demonstrated form of the
  * Graph.pageRank scale claim. The plan assertion lives IN the query
  * body (join_eliminated convention) — these tests pin (1) bit-exact
  * equality with the general-path pageRank on the real graph, (2) the
  * plan shape the in-body require enforces, and (3) the loud
  * symmetry-contract refusal.
  */
class GraphBucketedSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  test("pageRankBucketed == pageRank bit-exact on the real part-supplier graph") {
    val exact    = Graph.partSupplierPageRank(spark, sfDir).collect().toSeq
    val bucketed = Graph.partSupplierPageRankBucketed(spark, sfDir).collect().toSeq
    assert(bucketed == exact)
  }

  /** Run `f` with the session shuffle-partition knob pinned to `n` —
    * the lazy iterate cores require knob == recorded bucket count.
    */
  private def withSp[T](n: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("per-iteration join is co-partitioned: exactly `iterations` hash exchanges, zero broadcasts, bucketed scans") {
    // the in-body require already enforces this (building the frame
    // would throw otherwise); re-derive the counts on the LAZY core's
    // compiled plan so a future weakening of the in-body assertion
    // fails a test, not just a docstring
    Graph.pageRankBucketedPrepare(Graph.partSupplierEdges(spark, sfDir))
    val buckets = graft.sources.Bucketing.recordedBuckets(spark, "pr_edges_bkt")
    withSp(buckets) {
      val plan = Graph.pageRankBucketedIterateLazy(spark, iterations = 5)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 5, plan.take(2000))
      assert("BroadcastExchange".r.findAllIn(plan).size == 0, plan.take(2000))
      assert("SelectedBucketsCount".r.findAllIn(plan).size >= 5, plan.take(2000))
    }
  }

  test("prepare sizes buckets from the DATA, never from the session shuffle knob") {
    // run the whole prepare+iterate under a deliberately absurd session
    // knob: the standing tables must record the data-sized count (the
    // chooseBuckets law — defaultParallelism floor at this scale), the
    // iterate must still be exchange-free (it pins its own conf from
    // the table metadata), and the result must stay bit-exact
    val edges = Graph.partSupplierEdges(spark, sfDir)
    val exact = Graph.pageRank(edges, iterations = 2).collect().toSeq
    withSp(13) {
      val got = Graph.pageRankBucketed(edges, iterations = 2).collect().toSeq
      assert(got == exact)
    }
    val recorded = graft.sources.Bucketing.recordedBuckets(spark, "pr_edges_bkt")
    val expected = graft.sources.Bucketing.chooseBuckets(spark, 0L) // floor: small data
    assert(recorded == expected && recorded != 13, s"recorded=$recorded")
    assert(
      graft.sources.Bucketing.recordedBuckets(spark, "pr_mass_bkt") == recorded,
      "edge and mass tables must share one bucket count"
    )
  }

  test("chooseBuckets: power-of-two, parallelism floor, grows with rows per the target") {
    import graft.sources.Bucketing
    val floor = Bucketing.chooseBuckets(spark, 0L)
    assert((floor & (floor - 1)) == 0 && floor >= spark.sparkContext.defaultParallelism)
    val big = Bucketing.chooseBuckets(spark, 10L * 1000 * 1000 * 1000, targetRowsPerBucket = 4L << 20)
    // 10e9 / 4Mi ≈ 2385 → next power of two
    assert(big == 4096, s"got $big")
    assert(Bucketing.chooseBuckets(spark, 1L, targetRowsPerBucket = 1L) == floor)
  }

  test("iterate refuses standing tables written by different prepares (stamp mismatch)") {
    Graph.pageRankBucketedPrepare(Graph.partSupplierEdges(spark, sfDir))
    // simulate a mass table left standing by a DIFFERENT dataset's
    // prepare sharing the warehouse: same layout, different stamp
    spark.sql("ALTER TABLE pr_mass_bkt SET TBLPROPERTIES ('graft.stamp' = 'bogus:999')")
    val ex = intercept[IllegalArgumentException](Graph.pageRankBucketedIterate(spark))
    assert(ex.getMessage.contains("disagree on graft.stamp"), ex.getMessage)
  }

  test("rebucketTo P -> 2P: recorded count doubles, results bit-exact, iteration still exchange-free") {
    import graft.sources.Bucketing
    Graph.pageRankBucketedPrepare(Graph.partSupplierEdges(spark, sfDir))
    val before = Graph.pageRankBucketedIterate(spark, iterations = 3).collect().toSeq
    val p      = Bucketing.recordedBuckets(spark, "pr_edges_bkt")
    // the lifecycle step: data outgrew the per-bucket target — both
    // standing tables rebucket together (a lone rebucket must refuse)
    Bucketing.rebucketTo(spark, "pr_edges_bkt", 2 * p, Seq("src"))
    val lone = intercept[IllegalArgumentException](Graph.pageRankBucketedIterate(spark))
    assert(lone.getMessage.contains("disagree on bucket count"), lone.getMessage)
    Bucketing.rebucketTo(spark, "pr_mass_bkt", 2 * p, Seq("node"))
    assert(Bucketing.recordedBuckets(spark, "pr_edges_bkt") == 2 * p)
    val after = Graph.pageRankBucketedIterate(spark, iterations = 3).collect().toSeq
    assert(after == before)
    withSp(2 * p) {
      val plan = Graph.pageRankBucketedIterateLazy(spark, iterations = 3)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 3, plan.take(2000))
      assert("BroadcastExchange".r.findAllIn(plan).size == 0, plan.take(2000))
    }
  }

  test("non-symmetrized edges refuse loudly (node with no in-edge)") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst") // node 1 never receives
    val ex = intercept[Exception] {
      Graph.pageRankBucketed(edges, iterations = 2).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(
      chain(ex).exists(t => Option(t.getMessage).exists(_.contains("no in-edge"))),
      s"expected the symmetry-contract raise, got: $ex"
    )
  }

  test("append path == pageRank over the union edge set; plan keeps one exchange per iteration") {
    val grown = Graph.partSupplierPageRankAppended(spark, sfDir)
    val exact = Graph.partSupplierPageRank(spark, sfDir).collect().toSeq
    assert(grown.collect().toSeq == exact)
    // the appended standing tables are left by the call above —
    // re-derive the lazy core's plan counts under the recorded bucket
    // count: 5 aggregation shuffles; 2 bucketed scans (edges+deg) per
    // iteration plus the iteration-1 bucketed mass scan
    val buckets = graft.sources.Bucketing.recordedBuckets(spark, "pr_edges_app")
    withSp(buckets) {
      val plan = Graph.pageRankAppendedIterateLazy(spark, iterations = 5)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 5, plan.take(2000))
      assert("BroadcastExchange".r.findAllIn(plan).size == 0, plan.take(2000))
      assert("SelectedBucketsCount".r.findAllIn(plan).size >= 10, plan.take(2000))
    }
  }

  test("symmetrized tiny graph matches the unbucketed integer model") {
    val und = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val sym = und.unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
    val a   = Graph.pageRank(sym, iterations = 3).collect().toSeq
    val b   = Graph.pageRankBucketed(sym, iterations = 3).collect().toSeq
    assert(a == b)
  }
}
