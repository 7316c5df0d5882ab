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

  test("per-iteration join is co-partitioned: exactly `iterations` hash exchanges, zero broadcasts, bucketed scans") {
    // the in-body require already enforces this (building the frame
    // would throw otherwise); re-derive the counts here so a future
    // weakening of the in-body assertion fails a test, not just a
    // docstring
    val df   = Graph.partSupplierPageRankBucketed(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // 5 per-iteration aggregation shuffles; the final orderBy adds a
    // RANGE exchange, not a hash one
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 5, plan.take(2000))
    assert("BroadcastExchange".r.findAllIn(plan).size == 0, plan.take(2000))
    assert("SelectedBucketsCount".r.findAllIn(plan).size >= 5, plan.take(2000))
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
    val plan  = grown.queryExecution.executedPlan.toString
    // 5 aggregation shuffles; 2 bucketed scans (edges+deg) per
    // iteration plus the iteration-1 bucketed mass scan
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 5, plan.take(2000))
    assert("BroadcastExchange".r.findAllIn(plan).size == 0, plan.take(2000))
    assert("SelectedBucketsCount".r.findAllIn(plan).size >= 10, plan.take(2000))
    val exact = Graph.partSupplierPageRank(spark, sfDir).collect().toSeq
    assert(grown.collect().toSeq == exact)
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
