package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph operators vs an independent pure-Scala integer model. */
class GraphSpec extends SparkSpec {

  import SparkSpec.spark.implicits._

  /** Model twin: same integer arithmetic, plain collections. */
  private def modelPageRank(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val out   = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var mass  = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) in(d) += mass(s) * 85L / (100L * out(s))
      mass = nodes.map(n => n -> (150000L + in(n))).toMap
    }
    mass
  }

  private def modelBfs(edges: Set[(Long, Long)], seeds: Set[Long], hops: Int): Map[Long, Long] = {
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to hops) {
      val next = edges.flatMap { case (s, d) => dist.get(s).map(v => d -> (v + 1L)) }
      dist = (dist.toSeq ++ next.toSeq).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).min }
    }
    dist
  }

  private val tinyEdges: Set[(Long, Long)] = Set(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), // cycle with a chord
    (1L, 4L),                               // 4 is dangling (in-edge, no out-edge)
    (5L, 1L)                                // 5 is a pure source (no in-edge)
  )

  test("pageRank == integer model on a tiny graph with dangling and source nodes") {
    val df  = tinyEdges.toSeq.toDF("src", "dst")
    val got = Graph.pageRank(df, iterations = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == modelPageRank(tinyEdges, 5))
  }

  test("pageRank == integer model on the real part-supplier graph") {
    val edges = Graph.partSupplierEdges(spark, sfDir)
    val es    = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got =
      Graph.pageRank(edges, iterations = 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = modelPageRank(es, 5)
    assert(got.size == want.size)
    assert(got == want)
    // mass conservation: base share + damped inflow can never exceed the start total
    assert(got.values.sum <= got.size * 1000000L)
    assert(got.values.forall(_ >= 150000L))
  }

  test("pageRank is partition-count invariant (integer arithmetic has no ordering drift)") {
    val edges = Graph.partSupplierEdges(spark, sfDir)
    val a     = Graph.pageRank(edges.repartition(1), 3).collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    val b     = Graph.pageRank(edges.repartition(8), 3).collect().toSeq.map(r => (r.getLong(0), r.getLong(1)))
    assert(a == b)
  }

  test("bfsDepths == model BFS; unreached nodes absent; seed depth 0") {
    val df    = tinyEdges.toSeq.toDF("src", "dst")
    val seeds = Seq(5L).toDF("node")
    val got   = Graph.bfsDepths(df, seeds, maxHops = 3).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want  = modelBfs(tinyEdges, Set(5L), 3)
    assert(got == want)
    assert(got(5L) == 0L && got(1L) == 1L && got(4L) == 2L)
    // nothing points back to 5 except itself — and nothing reaches it
    assert(!got.contains(99L))
  }

  private def modelSssp(edges: Set[(Long, Long, Long)], seeds: Set[Long], rounds: Int): Map[Long, Long] = {
    val minW = edges.groupBy(e => (e._1, e._2)).map { case (k, v) => k -> v.map(_._3).min }
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to rounds) {
      val next = scala.collection.mutable.Map.empty[Long, Long] ++ dist
      for (((s, d), w) <- minW; ds <- dist.get(s))
        if (!next.contains(d) || next(d) > ds + w) next(d) = ds + w
      dist = next.toMap
    }
    dist
  }

  test("shortestPaths == weighted model: cheap 2-hop beats expensive direct edge; negative weights refused") {
    // 1→2 w=10 direct, but 1→3→2 costs 2+3=5; 4 unreachable; multi-edge 1→2 keeps min(10, 12)
    val e = Seq((1L, 2L, 10L), (1L, 2L, 12L), (1L, 3L, 2L), (3L, 2L, 3L), (4L, 1L, 1L)).toDF("src", "dst", "w")
    val got = Graph.shortestPaths(e, Seq(1L).toDF("node"), rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 2L), s"got $got")
    assert(!got.contains(4L), "nodes not reachable FROM the seed stay absent")
    // the guard rides the row path (raise_error in the collapse
    // projection) — it fires at the first ACTION, not at plan build
    val neg = Seq((1L, 2L, -1L)).toDF("src", "dst", "w")
    val ex = intercept[Exception](Graph.shortestPaths(neg, Seq(1L).toDF("node")).collect())
    assert(ex.getMessage.contains("non-negative edge weights"), s"unexpected: ${ex.getMessage}")
  }

  test("shortestPaths == model on the real weighted graph, partition invariant; dist caps at round budget") {
    val es = Graph.weightedPartSupplierEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val seedSet = es.collect { case (s, d, _) if d == 3L => s }.take(1)
    val seeds   = seedSet.toSeq.toDF("node")
    val df      = Graph.weightedPartSupplierEdges(spark, sfDir)
    val got = Graph.shortestPaths(df.repartition(8), seeds, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == modelSssp(es, seedSet.toSet, 3))
    val single = Graph.shortestPaths(df.repartition(1), seeds, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == single, "integer min-folds are partition invariant")
    // registered query: seeds at 0, all distances non-negative, rows exist
    val reg = SparkEntry.queries("graph_sssp")(spark, sfDir)
    assert(reg.filter(col("dist") < 0).isEmpty && reg.count() > 0)
  }

  test("closeness: per-seed tagged BFS == independent per-seed model; radius bound and self-only seed honored") {
    // star: 1 is the hub; 9 is isolated-in (edge out only from 9? none) — give 9 no edges
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (4L, 5L)).flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val df = e.toDF("src", "dst")
    val got = Graph
      .closeness(df, Seq(1L, 9L).toDF("node"), maxHops = 2)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    def modelFrom(seed: Long, hops: Int): (Long, Long) = {
      val d = scala.collection.mutable.Map(seed -> 0L)
      for (_ <- 1 to hops) {
        val snap = d.toMap // frozen: relaxations within a round must not cascade
        e.foreach { case (s, t) =>
          snap.get(s).foreach(ds => if (!d.contains(t) || d(t) > ds + 1) d(t) = ds + 1)
        }
      }
      (d.size.toLong, d.values.sum)
    }
    for (seed <- Seq(1L, 9L)) {
      val (nr, sd) = modelFrom(seed, 2)
      val want     = if (sd == 0) 0.0 else (nr - 1).toDouble / sd
      assert(got(seed) == ((nr, sd, want)), s"seed $seed: got ${got(seed)} want ($nr, $sd, $want)")
    }
    // the 2-hop radius excludes node 5 (3 hops from 1)
    assert(got(1L)._1 == 4L, "hub reaches {1,2,3,4} at radius 2")
    assert(got(9L) == ((1L, 0L, 0.0)), "an isolated seed reaches only itself, closeness 0")
    // registered query: every seed present, closeness within (0, 1]
    val reg = SparkEntry.queries("graph_closeness")(spark, sfDir).collect()
    assert(reg.length == 5 && reg.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
  }

  private def modelPpr(edges: Set[(Long, Long)], seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val out  = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var mass = seeds.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges; m <- mass.get(s)) in(d) += m * 85L / (100L * out(s))
      mass = (in.keySet ++ seeds).map(n => n -> (in(n) + (if (seeds(n)) 150000L else 0L))).filter(_._2 > 0).toMap
    }
    mass
  }

  test("personalized PageRank == integer model; mass only on seed-reachable nodes") {
    val df    = tinyEdges.toSeq.toDF("src", "dst")
    val seeds = Seq(5L).toDF("node")
    val got = Graph
      .personalizedPageRank(df, seeds, iterations = 4)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == modelPpr(tinyEdges, Set(5L), 4))
    // node 5 has no in-edge: its mass is exactly the seed base share
    assert(got(5L) == 150000L)
    // everything holding mass is reachable from the seed
    assert(got.keySet.subsetOf(Set(5L, 1L, 2L, 3L, 4L)))
  }

  test("supplierAffinity on the real graph == integer model from the seed") {
    val es = Graph.partSupplierEdges(spark, sfDir).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Graph
      .supplierAffinity(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == modelPpr(es, Set(3L), 4))
    assert(got.nonEmpty && got.contains(3L))
  }

  test("triangleCounts == model on K4-plus-pendant; degree orientation loses/duplicates nothing") {
    // K4 on 1..4 (4 triangles, each node in 3) + pendant 5 (in none)
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Graph
      .triangleCounts(k4.toDF("src", "dst"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), s"K4 counts wrong: $got")
    // duplicate + reversed edges must not inflate counts
    val noisy = k4 ++ k4.map(_.swap) ++ Seq((1L, 2L), (2L, 1L))
    val got2  = Graph.triangleCounts(noisy.toDF("src", "dst")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == got)
  }

  test("triangleCounts on the real co-order graph == naive id-oriented replay") {
    val li = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 1000L)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = li
      .as("x")
      .join(li.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
    val got = Graph.triangleCounts(edges).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive twin: id-oriented 3-way join (the oracle's formulation)
    val e = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val tri = e
      .as("e1")
      .join(e.as("e2"), col("e2.a") === col("e1.b"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val want = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .toMap
    assert(got == want)
    assert(got.nonEmpty, "the bounded co-order graph must actually contain triangles")
  }

  test("partSupplierBfs: depths alternate bipartite sides and are capped by maxHops") {
    val got = Graph.partSupplierBfs(spark, sfDir).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // part nodes are even, supplier nodes odd; seeds are parts at depth 0,
    // so even depth ⇔ part node in a bipartite graph
    got.foreach { case (node, depth) =>
      assert((node % 2 == 0) == (depth % 2 == 0), s"node $node depth $depth breaks bipartite parity")
    }
    assert(got.values.max <= 4L)
  }

  private def modelHits(edges: Set[(Long, Long)], iters: Int): Map[(String, Long), Long] = {
    def half(mass: Map[Long, Long], in: Boolean): Map[Long, Long] = {
      val raw = edges.toSeq
        .flatMap { case (s, d) => mass.get(if (in) s else d).map((if (in) d else s) -> _) }
        .groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).sum }
      val tot = raw.values.sum
      raw.map { case (n, m) => n -> (m * 1000000L) / tot }
    }
    var hub  = edges.map(_._1).map(_ -> 1000000L).toMap
    var auth = Map.empty[Long, Long]
    for (_ <- 1 to iters) { auth = half(hub, in = true); hub = half(auth, in = false) }
    hub.map { case (n, m) => ("hub", n) -> m } ++ auth.map { case (n, m) => ("auth", n) -> m }
  }

  test("hits == integer model on a tiny bipartite graph and on the real supplier-part relation") {
    val tiny = Set((11L, 10L), (11L, 20L), (21L, 10L))
    val got = Graph
      .hits(tiny.toSeq.toDF("src", "dst"), iterations = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == modelHits(tiny, 3))
    // the shared authority p1 must out-score p2; its co-hub s1 out-scores s2
    assert(got(("auth", 10L)) > got(("auth", 20L)) && got(("hub", 11L)) > got(("hub", 21L)))
    val li = Tables
      .lineitem(spark, sfDir)
      .select((col("l_suppkey") * 2 + 1).cast("long").as("src"), (col("l_partkey") * 2).cast("long").as("dst"))
      .distinct()
    val es   = li.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val real = Graph.hits(li, 3).collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(real == modelHits(es, 3))
    // normalization keeps each side's mass at most the scale total
    assert(real.collect { case (("hub", _), m) => m }.sum <= 1000000L)
  }

  /** Model twin of sync LPA: most frequent neighbor label, min-label
    * ties, fixed rounds, symmetrized edges.
    */
  private def modelLpa(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und   = edges.filter(e => e._1 != e._2).flatMap(e => Seq(e, e.swap))
    val nbrs  = und.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    var label = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      label = nbrs.map { case (n, ns) =>
        val counts = ns.map(label).groupBy(identity).map { case (l, v) => l -> v.size }
        val mc     = counts.values.max
        n -> counts.collect { case (l, c) if c == mc => l }.min
      }
    }
    label
  }

  test("labelPropagation == model: two cliques with a bridge collapse to per-clique min labels") {
    val clique = (base: Long) =>
      (for { a <- 0L to 3L; b <- 0L to 3L if a < b } yield (base + a, base + b)).toSet
    val es     = clique(10L) ++ clique(20L) + ((13L, 20L)) // bridge
    val got = Graph
      .labelPropagation(es.toSeq.toDF("src", "dst"), iterations = 4)
      .as[(Long, Long)]
      .collect()
      .toMap
    assert(got == modelLpa(es, 4))
    // communities are the cliques: everyone in clique(10) shares one
    // label, clique(20)'s non-bridge members share another
    assert((10L to 13L).map(got).toSet.size == 1)
    assert((21L to 23L).map(got).toSet.size == 1)
  }

  test("labelPropagation == model on a pseudo-random graph, partition invariant") {
    val es = (1L to 300L).map { i =>
      ((i * 2654435761L) % 40L, (i * 40503L) % 40L)
    }.filter(e => e._1 != e._2).toSet
    val df    = es.toSeq.toDF("src", "dst")
    val model = modelLpa(es, 4)
    val a     = Graph.labelPropagation(df, 4).as[(Long, Long)].collect().toMap
    val b     = Graph.labelPropagation(df.repartition(17), 4).as[(Long, Long)].collect().toMap
    assert(a == model && b == model)
  }

  /** Model twin for k-core: synchronous peel to fixpoint. */
  private def modelKCore(edges: Set[(Long, Long)], k: Int): Map[Long, Long] = {
    var e = edges.filter(p => p._1 != p._2).flatMap(p => Set(p, p.swap))
    var done = false
    while (!done) {
      val deg  = e.groupBy(_._1).map { case (n, v) => n -> v.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = e.filter(p => keep(p._1) && keep(p._2))
      done = next == e
      e = next
    }
    e.groupBy(_._1).map { case (n, v) => n -> v.size.toLong }
  }

  test("kCore == fixpoint model: pendant chain peels away, cascade removes the chained triangle") {
    // K4 core {1,2,3,4}; node 5 hangs off it with degree 2; removing 5
    // drops 6's degree below 2 in turn — a 2-deep cascade
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toSet
    val es = k4 ++ Set((4L, 5L), (3L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))
    val got = Graph.kCore(es.toSeq.toDF("src", "dst"), k = 3, rounds = 5).as[(Long, Long)].collect().toMap
    assert(got == modelKCore(es, 3))
    assert(got.keySet == Set(1L, 2L, 3L, 4L) && got.values.forall(_ == 3L))
  }

  test("kCore == fixpoint model on a pseudo-random graph, partition invariant") {
    val es = (1L to 400L).map { i =>
      ((i * 2654435761L) % 60L, (i * 40503L) % 60L)
    }.filter(e => e._1 != e._2).toSet
    val df    = es.toSeq.toDF("src", "dst")
    val model = modelKCore(es, 4)
    val a     = Graph.kCore(df, 4, rounds = 8).as[(Long, Long)].collect().toMap
    val b     = Graph.kCore(df.repartition(17), 4, rounds = 8).as[(Long, Long)].collect().toMap
    assert(a == model && b == model)
  }

  test("partSupplierKCore: 5-round budget reaches the true fixpoint; every survivor keeps >= 4 in-core neighbors") {
    val at5 = Graph.partSupplierKCore(SparkSpec.spark, SparkSpec.sfDir).as[(Long, Long)].collect().toMap
    val li = Tables
      .lineitem(SparkSpec.spark, SparkSpec.sfDir)
      .filter(col("l_quantity") <= 3)
      .select((col("l_partkey") * 2L).as("src"), (col("l_suppkey") * 2L + 1L).as("dst"))
    val at6 = Graph.kCore(li, k = 4, rounds = 6).as[(Long, Long)].collect().toMap
    assert(at5 == at6, "one extra peel changed the result — round budget too small")
    assert(at5.nonEmpty && at5.values.forall(_ >= 4L))
  }

  /** Model twin of radius-bounded Brandes: plain collections. */
  private def modelBetweenness(edges: Set[(Long, Long)], seeds: Set[Long], maxHops: Int): Map[Long, Double] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val acc = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    for (s <- seeds) {
      var dist     = Map(s -> 0)
      val sigma    = scala.collection.mutable.Map(s -> 1L).withDefaultValue(0L)
      var frontier = Set(s)
      var levels   = List(Set(s)) // head = deepest
      for (d <- 1 to maxHops) {
        val nextSigma = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
        for (v <- frontier; w <- adj.getOrElse(v, Set.empty)) if (!dist.contains(w)) nextSigma(w) += sigma(v)
        val nf = nextSigma.keySet.toSet
        nf.foreach { w => dist += w -> d; sigma(w) = nextSigma(w) }
        frontier = nf
        levels = nf :: levels
      }
      val delta = scala.collection.mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (level <- levels; v <- level) {
        for (w <- adj.getOrElse(v, Set.empty) if dist.contains(w) && dist(w) == dist(v) + 1)
          delta(v) += sigma(v).toDouble / sigma(w) * (1.0 + delta(w))
      }
      for ((v, _) <- dist if v != s) acc(v) += delta(v)
    }
    acc.toMap
  }

  test("betweenness: distributed result equals the in-memory Brandes model on pseudo-random graphs") {
    val rnd = new scala.util.Random(0xb7e15163)
    for (trial <- 1 to 3) {
      val n = 24 + trial * 8
      val es = (1 to n * 3).map { _ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong) }
        .filter(e => e._1 != e._2).toSet
      val sym   = es ++ es.map(_.swap)
      val seeds = Set(0L, 3L, 7L)
      val model = modelBetweenness(sym, seeds, maxHops = 3)
        .map { case (k, v) => k -> math.rint(v * 1e4) / 1e4 }
      val got = Graph
        .betweenness(sym.toSeq.toDF("src", "dst"), seeds.toSeq.toDF("node"), maxHops = 3)
        .as[(Long, Double)].collect().toMap
      assert(got == model, s"trial $trial: got ${got.toSeq.sortBy(_._1)} want ${model.toSeq.sortBy(_._1)}")
    }
  }

  test("degreeAssortativity: a star is exactly -1; moments match hand values") {
    val n = 4
    val es  = (1 to n).map(i => (0L, i.toLong))
    val sym = (es ++ es.map(_.swap)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(sym).collect().head
    assert(r.getLong(0) == 2L * n, "m must be the symmetric edge count")
    assert(r.getLong(1) == n.toLong * (n + 1), "S_x")
    assert(r.getLong(2) == 2L * n * n, "S_xy")
    assert(r.getLong(3) == n.toLong * (n * n + 1), "S_xx")
    assert(r.getDouble(4) == -1.0, s"star assortativity must be exactly -1, got ${r.getDouble(4)}")
  }

  test("betweenness: closed forms — path chain accumulates 3,2,1; diamond splits sigma 0.5/0.5") {
    def sym(es: Seq[(Long, Long)]) = (es ++ es.map(_.swap)).toDF("src", "dst")
    // path 1-2-3-4-5, seed 1: delta(2)=3, delta(3)=2, delta(4)=1, delta(5)=0
    val chain = Graph
      .betweenness(sym(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)), Seq(1L).toDF("node"), maxHops = 4)
      .as[(Long, Double)].collect().toMap
    assert(chain == Map(2L -> 3.0, 3L -> 2.0, 4L -> 1.0, 5L -> 0.0), s"chain gave $chain")
    // diamond 1-{2,3}-4, seed 1: sigma(4)=2, so 2 and 3 each carry 1/2
    val diamond = Graph
      .betweenness(sym(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L)), Seq(1L).toDF("node"), maxHops = 3)
      .as[(Long, Double)].collect().toMap
    assert(diamond == Map(2L -> 0.5, 3L -> 0.5, 4L -> 0.0), s"diamond gave $diamond")
    // radius bound binds: the chain at maxHops=2 must not see node 5's pressure
    val bounded = Graph
      .betweenness(sym(Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 5L)), Seq(1L).toDF("node"), maxHops = 2)
      .as[(Long, Double)].collect().toMap
    assert(bounded == Map(2L -> 1.0, 3L -> 0.0), s"bounded gave $bounded")
  }

  /** Model twin of the synchronous k-truss peel: per round, support =
    * |N(a) ∩ N(b)| over surviving edges, then drop sup < k−2.
    */
  private def modelKTruss(edges: Set[(Long, Long)], k: Int, rounds: Int): Map[(Long, Long), Long] = {
    def canon(e: (Long, Long)) = (math.min(e._1, e._2), math.max(e._1, e._2))
    var cur                            = edges.map(canon).filter(e => e._1 != e._2)
    var sup: Map[(Long, Long), Long]   = Map.empty
    for (_ <- 1 to rounds) {
      val nbrs = cur.toSeq
        .flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1)
        .map { case (n, vs) => n -> vs.map(_._2).toSet }
      sup = cur.iterator.map { case (a, b) => (a, b) -> (nbrs(a) & nbrs(b)).size.toLong }.toMap
      cur = sup.filter(_._2 >= (k - 2).toLong).keySet
    }
    sup.filter(_._2 >= (k - 2).toLong)
  }

  test("k-truss == pure-Scala synchronous peel on a seeded random graph (k=3 and k=4)") {
    val rnd = new scala.util.Random(11L)
    val edges = (1 to 160)
      .map(_ => (rnd.nextInt(24).toLong, rnd.nextInt(24).toLong))
      .filter(e => e._1 != e._2)
      .toSet
    val df = edges.toSeq.toDF("src", "dst")
    for (k <- Seq(3, 4); rounds <- Seq(1, 3)) {
      val want = modelKTruss(edges, k, rounds)
      val got = Graph
        .ktrussEdges(df, k, rounds)
        .as[(Long, Long, Long)]
        .collect()
        .map { case (a, b, s) => (a, b) -> s }
        .toMap
      assert(got == want, s"k=$k rounds=$rounds: got ${got.size} edges, want ${want.size}")
    }
  }

  test("registered graph_ktruss peel budget reaches the fixpoint (round 3 == round 4)") {
    // the kcore convention: the FIXED synchronous round count is part
    // of the contract (the oracle unrolls it), and this pins that the
    // budget suffices on the registered instance — a 4th peel removes
    // nothing more
    import graft.Tables
    val li = Tables
      .lineitem(spark, sfDir)
      .filter(col("l_orderkey") < 10000L)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = li
      .as("x")
      .join(li.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
      .select(col("x.p").as("src"), col("y.p").as("dst"))
      .localCheckpoint(eager = true)
    val r3 = Graph.ktrussEdges(edges, 4, 3).as[(Long, Long, Long)].collect().toSet
    val r4 = Graph.ktrussEdges(edges, 4, 4).as[(Long, Long, Long)].collect().toSet
    assert(r3 == r4, s"peel budget 3 not a fixpoint: ${r3.size} vs ${r4.size} edges")
  }

  test("linkPrediction == brute-force common-neighbor/Jaccard; the top-k cut is a total order") {
    val rnd = new scala.util.Random(5L)
    val edges = (1 to 120)
      .map(_ => (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(e => e._1 != e._2)
      .toSet
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val nbrs = canon.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1)
      .map { case (n, vs) => n -> vs.map(_._2).toSet }
    val nodes = nbrs.keySet.toSeq
    val want = (for {
      a <- nodes; b <- nodes if a < b && !canon((a, b))
      cn = (nbrs(a) & nbrs(b)).size.toLong if cn >= 3L
    } yield {
      val (da, db) = (nbrs(a).size.toLong, nbrs(b).size.toLong)
      (a, b) -> ((cn, da, db, cn.toDouble / (da + db - cn)))
    }).toMap
    val df = edges.toSeq.toDF("src", "dst")
    val got = Graph
      .linkPrediction(df, minCommon = 3L, topK = 1000000)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6)))
      .toMap
    assert(got == want, s"got ${got.size} candidates, want ${want.size}")
    // the bounded cut is the PREFIX of the (cn desc, a, b) total order
    val full = Graph.linkPrediction(df, 3L, 1000000).as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    val cut  = Graph.linkPrediction(df, 3L, 5).as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(cut == full.take(5), "topK must cut the deterministic prefix")
  }

  test("linkPrediction: hub-bounded default caps a 10^4-degree hub; equals exact when no center exceeds the cap") {
    // star graph, hub 0 — leaves 1..10000 all at degree 1. The exact
    // enumeration would emit C(10^4,2) ≈ 5·10^7 wedges at the hub; the
    // bounded path keeps the hub's 8 lowest-degree neighbors (all tie
    // at d=1 → ids 1..8) and emits exactly C(8,2)=28 candidates, each
    // with cn=1, true degrees 1/1, jaccard 1.0.
    val star = (1L to 10000L).map(i => (0L, i)).toDF("src", "dst")
    val got = Graph
      .linkPrediction(star, minCommon = 1L, topK = 1000000, maxNeighbors = 8)
      .as[(Long, Long, Long, Long, Long, Double)]
      .collect()
    assert(got.length == 28, s"hub cap must bound the wedge fan-out, got ${got.length} candidates")
    assert(got.forall { case (a, b, cn, da, db, j) =>
      a >= 1L && b <= 8L && a < b && cn == 1L && da == 1L && db == 1L && j == 1.0
    })
    // equivalence: on a graph where no center exceeds the default cap,
    // the bounded path IS the exact enumeration
    val rnd = new scala.util.Random(11L)
    val edges = (1 to 150)
      .map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(e => e._1 != e._2)
      .toDF("src", "dst")
    val bounded = Graph.linkPrediction(edges, 2L, 1000000).collect().toSeq // default maxNeighbors = 1024
    val exact   = Graph.linkPrediction(edges, 2L, 1000000, Int.MaxValue).collect().toSeq
    assert(bounded == exact, "default cap must be semantics-neutral below the cap")
  }

  test("resourceAllocation == brute-force integer-quantized RA") {
    val rnd = new scala.util.Random(9L)
    val raw = (1 to 140)
      .map(_ => (rnd.nextInt(22).toLong, rnd.nextInt(22).toLong))
      .filter(e => e._1 != e._2)
      .toSet
    val canon = raw.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val nbrs = canon.toSeq
      .flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1)
      .map { case (n, vs) => n -> vs.map(_._2).toSet }
    val nodes = nbrs.keySet.toSeq
    val want = (for {
      a <- nodes; b <- nodes if a < b && !canon((a, b))
      common = nbrs(a) & nbrs(b) if common.size >= 2
    } yield (a, b, common.size.toLong, common.toSeq.map(c => 1000000L / nbrs(c).size).sum)).toSet
    val got = Graph
      .resourceAllocation(raw.toSeq.toDF("src", "dst"), minCommon = 2L, topK = 1000000, maxNeighbors = Int.MaxValue)
      .as[(Long, Long, Long, Long)]
      .collect()
      .toSet
    assert(got == want, s"got ${got.size} scored pairs, want ${want.size}")
  }
}
