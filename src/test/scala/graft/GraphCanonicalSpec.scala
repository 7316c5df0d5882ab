package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** The canonical-edges fast path (round 14): builders that construct
  * provably distinct / symmetric / min-folded edge relations let the
  * iterative operators skip the generic canonicalization — a pure
  * full-relation exchange on such input (guide §2.4, "a distinct on
  * data that is already unique"). These tests pin BOTH halves of the
  * contract on the real builders at sf0.001:
  *
  *   1. the builder guarantees hold structurally (distinct row count,
  *      symmetry, loop-freedom, one row per (src, dst) for the
  *      weighted relation);
  *   2. generic path == fast path BIT-EXACT for every operator that
  *      gained a flag, so the guarantee cannot silently rot without a
  *      red test.
  */
class GraphCanonicalSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private lazy val edges = Graph.partSupplierEdges(spark, sfDir).localCheckpoint()

  test("partSupplierEdges is distinct, symmetric and loop-free by construction") {
    val n = edges.count()
    assert(edges.distinct().count() == n, "builder output must be distinct")
    assert(edges.filter(col("src") === col("dst")).count() == 0, "loop-free")
    val sym = edges
      .select(col("dst").as("src"), col("src").as("dst"))
      .exceptAll(edges)
      .count()
    assert(sym == 0, "symmetric: swap(E) == E")
  }

  test("weightedPartSupplierEdges has exactly one row per (src, dst)") {
    val w = Graph.weightedPartSupplierEdges(spark, sfDir)
    assert(w.groupBy("src", "dst").count().filter(col("count") > 1).count() == 0)
  }

  test("generic == assumeDistinct bit-exact: pageRank / ppr / bfs / closeness / betweenness / hits") {
    val seeds = Seq(2L, 4L, 6L, 8L, 10L).toDF("node")
    assert(
      Graph.pageRank(edges, iterations = 5).collect().toSeq ==
        Graph.pageRank(edges, iterations = 5, assumeDistinct = true).collect().toSeq
    )
    assert(
      Graph.personalizedPageRank(edges, Seq(3L).toDF("node"), iterations = 4).collect().toSeq ==
        Graph
          .personalizedPageRank(edges, Seq(3L).toDF("node"), iterations = 4, assumeDistinct = true)
          .collect()
          .toSeq
    )
    assert(
      Graph.bfsDepths(edges, Seq(2L).toDF("node"), maxHops = 4).collect().toSeq ==
        Graph.bfsDepths(edges, Seq(2L).toDF("node"), maxHops = 4, assumeDistinct = true).collect().toSeq
    )
    assert(
      Graph.closeness(edges, seeds).collect().toSeq ==
        Graph.closeness(edges, seeds, assumeDistinct = true).collect().toSeq
    )
    assert(
      Graph.betweenness(edges, seeds).collect().toSeq ==
        Graph.betweenness(edges, seeds, assumeDistinct = true).collect().toSeq
    )
    val hitsIn = Tables
      .lineitem(spark, sfDir)
      .select((col("l_suppkey") * 2L + 1L).as("src"), (col("l_partkey") * 2L).as("dst"))
      .distinct()
    assert(
      Graph.hits(hitsIn, iterations = 3).collect().toSeq ==
        Graph.hits(hitsIn, iterations = 3, assumeDistinct = true).collect().toSeq
    )
  }

  test("generic == assumeMinFolded bit-exact: shortestPaths on the weighted builder") {
    val w     = Graph.weightedPartSupplierEdges(spark, sfDir)
    val seeds = Seq(2L).toDF("node")
    assert(
      Graph.shortestPaths(w, seeds, rounds = 4).collect().toSeq ==
        Graph.shortestPaths(w, seeds, rounds = 4, assumeMinFolded = true).collect().toSeq
    )
  }

  test("generic == assumeCanonical bit-exact: labelPropagation and kCore") {
    assert(
      Graph.labelPropagation(edges, iterations = 4).collect().toSeq ==
        Graph.labelPropagation(edges, iterations = 4, assumeCanonical = true).collect().toSeq
    )
    val d = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_quantity") <= 3)
      .select((col("l_partkey") * 2L).as("src"), (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct()
    val sym = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
    assert(
      Graph.kCore(d, k = 4, rounds = 5).collect().toSeq ==
        Graph.kCore(sym, k = 4, rounds = 5, assumeCanonical = true).collect().toSeq
    )
  }

  test("assumeMinFolded keeps the negative-weight refusal loud") {
    val bad = Seq((1L, 2L, -5L)).toDF("src", "dst", "w")
    val ex = intercept[Exception] {
      Graph.shortestPaths(bad, Seq(1L).toDF("node"), rounds = 1, assumeMinFolded = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("non-negative edge weights")), s"got: $ex")
  }
}
