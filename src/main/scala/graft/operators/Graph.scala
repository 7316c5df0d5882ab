package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over edge relations — the link-analysis tier of the
  * curation surface (web-crawl PageRank weighting and hub/authority
  * style quality signals are standard corpus-selection inputs; the
  * reference's closest shape is the inverted index's word→files edge
  * relation, SURVEY.md reference services/reducer.go:172-186, here
  * generalized to iterative message passing like
  * [[Dedup.connectedComponents]]).
  *
  * All scores use INTEGER mass arithmetic (initial mass 1e6 per node,
  * floor division on every split): long sums are order-independent and
  * floor-div is bit-exact in every engine, so 5 iterations of power
  * method replay EXACTLY in the DuckDB oracle as unrolled SQL — no
  * float summation-order drift, ever. The integer ranks order nodes
  * identically to float PageRank down to sub-ppm mass differences.
  *
  * Scale design: the edge relation is joined with out-degrees ONCE and
  * lazily checkpointed (read every iteration); each iteration is one
  * hash join (mass onto edges by src) + one aggregation shuffle
  * (contributions by dst). On a real cluster, bucketing both the edge
  * table and the mass table by node id makes the per-iteration join
  * exchange-free — the iteration cost is then a single aggregation
  * shuffle of (dst, contrib) longs, never the payload. Per-iteration
  * lazy checkpoints keep the plan linear in iteration count.
  */
object Graph {

  /** Run independent Spark jobs (e.g. two standing-table writes that
    * share only already-materialized checkpoints) CONCURRENTLY from
    * driver threads, so the second job's tasks back-fill the executor
    * slots the first job's stage tail leaves idle (guide §2.6). The
    * first failure is rethrown after all tasks settle.
    */
  private def runConcurrently(tasks: (() => Unit)*): Unit = {
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = tasks.map { t =>
      val th = new Thread(() => try t() catch { case e: Throwable => errs.add(e) })
      th.setDaemon(true)
      th.start()
      th
    }
    threads.foreach(_.join())
    if (!errs.isEmpty) throw errs.peek()
  }

  /** Cast an edge relation to the canonical (long src, long dst) form
    * every iterative operator runs on, deduping UNLESS the caller
    * guarantees the relation is already distinct. A `distinct` on data
    * that is already unique is a pure full-relation exchange (guide
    * §2.4) — and every graph query here pays it on its largest
    * relation, so builders that construct provably distinct edge sets
    * pass `assumeDistinct = true`:
    *
    *   - [[partSupplierEdges]] unions two per-direction DISTINCT halves
    *     whose src namespaces are disjoint (part nodes even, supplier
    *     nodes odd), so the union is distinct, symmetric and loop-free;
    *   - [[weightedPartSupplierEdges]] min-folds per (part, supplier)
    *     before mirroring the same way (one row per (src, dst));
    *   - [[supplierPartHits]] passes a `.distinct()` projection.
    *
    * GraphCanonicalSpec pins generic == assumeDistinct output equality
    * on the real builders, so the guarantee cannot silently rot.
    */
  private def canonLongEdges(edges: DataFrame, assumeDistinct: Boolean): DataFrame = {
    val cast = edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
    if (assumeDistinct) cast else cast.distinct()
  }

  /** Damped PageRank with integer mass. Each node starts with
    * `initMass`; per iteration every node keeps the base share
    * floor(initMass·(den−num)/den) and receives
    * floor(mass·num / (den·outdeg)) along each out-edge. Nodes with no
    * out-edges (dangling) leak their damped share — the standard
    * simplified treatment; pass a symmetrized edge set for the
    * leak-free variant. Output: (node, mass) for every node, total
    * order by node.
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    require(iterations >= 0 && dampNum >= 0 && dampNum <= dampDen, "invalid damping")
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    // ONE aggregate over the endpoint union yields the whole node
    // directory: out-degree (= count of rows where the node appears as
    // src) and the has-inflow flag — replacing three separate passes
    // (nodes distinct, out-degree groupBy, no-inflow anti-join) and
    // their exchanges with a single union+aggregate (guide §2.4:
    // operations keyed the same way share one exchange). Same values:
    // sum of is-src indicators IS the out-degree, max of is-dst
    // indicators IS inflow existence.
    val nodeInfo = e
      .select(col("src").as("node"), lit(1L).as("__s"), lit(0L).as("__d"))
      .unionByName(e.select(col("dst").as("node"), lit(0L).as("__s"), lit(1L).as("__d")))
      .groupBy("node")
      .agg(sum("__s").as("outdeg"), max("__d").as("has_in"))
      .localCheckpoint(eager = false) // consumers: degree join, no-inflow rows, initial mass
    val withDeg = e
      .join(nodeInfo.select(col("node").as("src"), col("outdeg")), "src")
      .localCheckpoint(eager = false)

    val baseMass = initMass * (dampDen - dampNum) / dampDen
    // nodes with no in-edge hold exactly baseMass from iteration 1 on,
    // and that set is STATIC (it depends only on the edge relation) —
    // union the constant rows instead of left-joining all nodes every
    // iteration: one shuffle less per iteration
    val noInflow = nodeInfo
      .filter(col("has_in") === 0L)
      .select(col("node"))
      .withColumn("mass", lit(baseMass))
      .localCheckpoint(eager = false)
    // NO checkpoint on the evolving mass relation: the plan stays
    // linear in iteration count (each iteration consumes the previous
    // once), and keeping the lineage visible lets AQE see that the
    // per-iteration mass table is node-count-sized — on graphs whose
    // node table fits the broadcast threshold the edge join then runs
    // broadcast, shuffling only (dst, contrib) longs. The static
    // relations (edges+degrees, no-inflow rows) ARE checkpointed —
    // they are read every iteration.
    var mass = nodeInfo.select(col("node")).withColumn("mass", lit(initMass))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(mass, col("src") === col("node"))
        .select(col("dst").as("node"), expr(s"(mass * $dampNum) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("node")
        .agg((lit(baseMass) + sum("c")).as("mass"))
      mass = contrib.unionByName(noInflow)
    }
    mass.orderBy("node")
  }

  /** PERSONALIZED PageRank: the restart mass lands only on `seeds`
    * (each seed holds the base share every iteration; non-seeds keep
    * only damped inflow) — related-entity scoring around a query set,
    * the recommendation/affinity variant of [[pageRank]]. Same
    * integer-mass discipline: bit-exact replay as unrolled SQL. Seeds
    * start with `initMass`, non-seeds with 0, so after any number of
    * iterations all mass traces back to the seed set.
    */
  def personalizedPageRank(
      edges: DataFrame,
      seeds: DataFrame,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    require(iterations >= 0 && dampNum >= 0 && dampNum <= dampDen, "invalid damping")
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    val nodes = e
      .select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    val seedNodes = nodes
      .join(seeds.select(col("node").cast("long").as("node")).distinct(), Seq("node"), "left_semi")
      .localCheckpoint(eager = false)
    val withDeg = e
      .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
      .localCheckpoint(eager = false)
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var mass     = seedNodes.withColumn("mass", lit(initMass))
    for (_ <- 1 to iterations) {
      val contrib = withDeg
        .join(mass, col("src") === col("node"))
        .select(col("dst").as("node"), expr(s"(mass * $dampNum) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("node")
        .agg(sum("c").as("in_mass"))
      mass = contrib
        .join(seedNodes.withColumn("__seed", lit(1L)), Seq("node"), "full_outer")
        .select(
          col("node"),
          (coalesce(col("in_mass"), lit(0L)) +
            when(col("__seed").isNotNull, lit(baseMass)).otherwise(lit(0L))).as("mass")
        )
        .filter(col("mass") > 0L)
    }
    mass.orderBy("node")
  }

  /** `graph_ppr` query body: affinity around supplier 1's namespaced
    * node, 4 damped iterations over the part↔supplier graph — only
    * nodes reachable from the seed hold mass.
    */
  def supplierAffinity(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    personalizedPageRank(partSupplierEdges(spark, dir), Seq(3L).toDF("node"), iterations = 4, assumeDistinct = true)
  }

  /** Multi-source BFS depth: minimum hop distance from any seed node,
    * by iterative min-label relaxation (one join + one min-aggregation
    * per hop — the [[Dedup.connectedComponents]] shuffle shape).
    * Unreached nodes are absent from the output. Integer distances:
    * bit-exact replay in unrolled oracle SQL.
    */
  def bfsDepths(edges: DataFrame, seeds: DataFrame, maxHops: Int = 5, assumeDistinct: Boolean = false): DataFrame = {
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    var dist = seeds.select(col("node").cast("long").as("node")).distinct().withColumn("depth", lit(0L))
    for (_ <- 1 to maxHops) {
      val next = e
        .join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("depth") + 1L).as("depth"))
      dist = dist
        .unionByName(next)
        .groupBy("node")
        .agg(min("depth").as("depth"))
        .localCheckpoint(eager = false)
    }
    dist.orderBy("node")
  }

  /** Per-node triangle counts — the local clustering signal (spam/link
    * farms cluster; organically linked pages don't), exact and
    * integer. The scalable formulation: edges are ORIENTED from the
    * lower-(degree, id) endpoint to the higher, so every wedge is
    * enumerated at its lowest-degree corner — the standard
    * compact-forward bound (wedge fan-out ≤ O(√m) per edge on any
    * graph) that keeps hub nodes from exploding the join. Each
    * triangle is produced exactly once: its corners are totally
    * ordered by (degree, id) and the wedge + closing-edge joins
    * follow that order. Output: (node, n_tri) for every node in ≥1
    * triangle, ordered by node.
    */
  /** Canonical undirected edge list (a < b, loops dropped, deduped). */
  private def canonicalEdges(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b")
      )
      .filter(col("a") =!= col("b"))
      .distinct()

  /** Every triangle of the canonical edge list `und` exactly once, as
    * (x, y, z): the degree-oriented wedge join (each edge points from
    * its lower-degree endpoint, wedges close with one hash join) — the
    * standard linear-in-wedges enumeration that never materializes a
    * high-degree node's neighbor cross product in the wrong order.
    */
  private def orientedTriangles(und: DataFrame): DataFrame = {
    val deg = und
      .select(explode(array(col("a"), col("b"))).as("n"))
      .groupBy("n")
      .agg(count(lit(1)).as("d"))
    val oriented = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(
          col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv"))
        ).otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv"))).as("e")
      )
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint(eager = false)
    oriented
      .as("e1")
      .join(
        oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          (col("e1.dv") < col("e2.dv") || (col("e1.dv") === col("e2.dv") && col("e1.v") < col("e2.v")))
      )
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
      .join(
        oriented.select(col("u").as("y"), col("v").as("z")),
        Seq("y", "z")
      )
      .select("x", "y", "z")
  }

  def triangleCounts(edges: DataFrame): DataFrame =
    orientedTriangles(canonicalEdges(edges).localCheckpoint(eager = false))
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).as("n_tri"))
      .orderBy("node")

  /** Synchronous k-truss peeling (Cohen 2008, "Trusses: cohesive
    * subgraphs for social network analysis" — public knowledge): a
    * k-truss is the maximal subgraph where every edge closes ≥ k−2
    * triangles WITHIN the subgraph. Each peel computes per-edge
    * triangle SUPPORT (one degree-oriented triangle enumeration over
    * the surviving edges, each triangle exploded onto its 3 canonical
    * edges, one counting aggregate) and drops edges below k−2; a FIXED
    * `rounds` count keeps the computation a pure function of the input
    * so the oracle replays it with unrolled CTEs (the [[graph_kcore]]
    * convention — synchronous, not converged-to-fixpoint).
    *
    * Scale: per round one wedge join + one aggregate + one semi-join,
    * everything edge-keyed (bucketing-friendly), survivors lazily
    * checkpointed so round r+1 never re-enumerates round r's plan.
    * Output: surviving (a, b) with their final-round support.
    */
  def ktrussEdges(edges: DataFrame, k: Int = 4, rounds: Int = 3): DataFrame = {
    require(k >= 3, s"k-truss needs k >= 3, got $k")
    require(rounds >= 1, s"ktrussEdges needs >= 1 peel, got $rounds")
    var cur                 = canonicalEdges(edges).localCheckpoint(eager = false)
    var sup: DataFrame      = null
    val minSup              = (k - 2).toLong
    for (_ <- 1 to rounds) {
      // orientation is by DEGREE, so triangle corners are not ordered —
      // re-canonicalize each of the 3 edges before counting
      sup = orientedTriangles(cur)
        .select(
          explode(
            array(
              struct(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b")),
              struct(least(col("x"), col("z")).as("a"), greatest(col("x"), col("z")).as("b")),
              struct(least(col("y"), col("z")).as("a"), greatest(col("y"), col("z")).as("b"))
            )
          ).as("e")
        )
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy("a", "b")
        .agg(count(lit(1)).as("sup"))
      // inner aggregate only holds triangle-closing edges — zero-support
      // edges are peeled implicitly (sup 0 < k−2 always)
      cur = sup.filter(col("sup") >= minSup).select("a", "b").localCheckpoint(eager = false)
    }
    sup.filter(col("sup") >= minSup).orderBy("a", "b")
  }

  /** Common-neighbor link prediction (Liben-Nowell–Kleinberg 2003 —
    * public knowledge): for every NON-adjacent pair with ≥ `minCommon`
    * shared neighbors, the common-neighbor count and the Jaccard
    * coefficient cn/(d_a + d_b − cn) as an exact int/int quotient.
    * Wedges enumerate with one adjacency self-join on the center
    * (pair ordered a < b so each wedge counts once), existing edges
    * leave by anti-join, degrees ride a broadcastable directory.
    *
    * The DEFAULT path is hub-BOUNDED: each center's adjacency is
    * deterministically capped to its `maxNeighbors` lowest-degree
    * neighbors (ties to the smaller id) before the wedge self-join, so
    * the per-center fan-out is ≤ maxNeighbors²/2 on ANY degree
    * distribution — a power-law hub can no longer make one task
    * quadratic in its d(c)² wedges. Low-degree neighbors are the ones
    * kept because they carry the signal: a hub shared by everyone
    * ranks every pair, a rare common neighbor separates them (the same
    * reason idf down-weights common terms). `cn` is then a LOWER bound
    * on the true common-neighbor count (exact when no center exceeds
    * the cap); degrees in the Jaccard stay the TRUE degrees. Pass
    * `maxNeighbors = Int.MaxValue` for the exact enumeration (the cap
    * window is skipped entirely) — the registered exact query runs on
    * the constant-bounded co-order graph (the [[coOrderTriangles]]
    * convention), where the exact form IS the oracle. Output is the
    * top-`topK` candidates by (cn desc, a, b) — a total order, so the
    * cut is deterministic and the artifact stays bounded on dense
    * graphs; TakeOrderedAndProject keeps the cut distributed.
    */
  def linkPrediction(
      edges: DataFrame,
      minCommon: Long = 3L,
      topK: Int = 10000,
      maxNeighbors: Int = 1024
  ): DataFrame = {
    require(maxNeighbors >= 1, s"linkPrediction needs maxNeighbors >= 1, got $maxNeighbors")
    val und = canonicalEdges(edges).localCheckpoint(eager = false)
    val adj = und
      .select(col("a").as("c"), col("b").as("n"))
      .unionByName(und.select(col("b").as("c"), col("a").as("n")))
      .localCheckpoint(eager = false) // consumers: wedge pairing + degrees
    val deg = adj.groupBy(col("n").as("node")).agg(count(lit(1)).as("d"))
    val wedgeAdj =
      if (maxNeighbors == Int.MaxValue) adj
      else
        adj
          .join(deg.select(col("node").as("n"), col("d").as("__dn")), "n")
          .withColumn(
            "__rk",
            row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("c").orderBy(col("__dn"), col("n"))
            )
          )
          .filter(col("__rk") <= maxNeighbors)
          .select("c", "n")
          // two consumers (self-join sides): without this the deg join
          // + row_number window compute twice — the exact branch reuses
          // the already-checkpointed adj for the same reason
          .localCheckpoint(eager = false)
    val cand = wedgeAdj
      .as("x")
      .join(wedgeAdj.as("y"), col("x.c") === col("y.c") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("a"), col("y.n").as("b"))
      .agg(count(lit(1)).as("cn"))
      .filter(col("cn") >= minCommon)
      .join(und, Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("node").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("d").as("db")), "b")
      .select(
        col("a"),
        col("b"),
        col("cn"),
        col("da"),
        col("db"),
        (col("cn").cast("double") / (col("da") + col("db") - col("cn"))).as("jaccard")
      )
      .orderBy(col("cn").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** `graph_link_prediction` query body over the bounded co-order
    * graph — the EXACT enumeration (the graph is constant-bounded by
    * construction, so the quadratic oracle replay is affordable and
    * the cap must not perturb the counts).
    */
  def coOrderLinkPrediction(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(coOrderEdges(spark, dir), maxNeighbors = Int.MaxValue)

  /** `graph_link_prediction_bounded` query body: the PRODUCTION
    * (hub-bounded) path with a cap that BINDS on the co-order graph
    * (maxNeighbors = 8 against centers with hundreds of neighbors), so
    * the oracle hash-verifies the cap semantics themselves — the
    * deterministic lowest-degree-first neighbor selection and the
    * lower-bound `cn` — not just the uncapped special case.
    */
  def coOrderLinkPredictionBounded(spark: SparkSession, dir: String): DataFrame =
    linkPrediction(coOrderEdges(spark, dir), minCommon = 2L, maxNeighbors = 8)

  /** Resource-allocation link score (Zhou–Lü–Zhang 2009, "Predicting
    * missing links via local information" — public knowledge):
    * RA(a,b) = Σ_{c ∈ Γ(a)∩Γ(b)} 1/d(c), here integer-quantized as
    * Σ (1000000 DIV d(c)) so the sum is exact long arithmetic in any
    * engine (the repo's graph-mass convention — no float accumulation
    * whose merge order could flip a rank). Rides [[linkPrediction]]'s
    * wedge machinery: the center's degree joins INTO the adjacency
    * before the self-join, so each wedge carries its center's 1/d
    * contribution and one counting aggregate emits both cn and the RA
    * mass. Same hub-bounded default; output top-`topK` by
    * (ra_q desc, a, b) — total order, distributed cut.
    */
  def resourceAllocation(
      edges: DataFrame,
      minCommon: Long = 2L,
      topK: Int = 10000,
      maxNeighbors: Int = 1024
  ): DataFrame = {
    require(maxNeighbors >= 1, s"resourceAllocation needs maxNeighbors >= 1, got $maxNeighbors")
    val und = canonicalEdges(edges).localCheckpoint(eager = false)
    val adj = und
      .select(col("a").as("c"), col("b").as("n"))
      .unionByName(und.select(col("b").as("c"), col("a").as("n")))
      .localCheckpoint(eager = false) // consumers: wedge pairing + degrees
    val deg = adj.groupBy(col("n").as("node")).agg(count(lit(1)).as("d"))
    val adjD = adj
      .join(deg.select(col("node").as("c"), col("d").as("dc")), "c")
    val wedgeAdj =
      // exact branch: adjD self-joins directly — checkpoint it so the
      // deg join doesn't compute once per join side (capped branch
      // consumes adjD once and checkpoints its own output below)
      if (maxNeighbors == Int.MaxValue) adjD.localCheckpoint(eager = false)
      else
        adjD
          .join(deg.select(col("node").as("n"), col("d").as("__dn")), "n")
          .withColumn(
            "__rk",
            row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy("c").orderBy(col("__dn"), col("n"))
            )
          )
          .filter(col("__rk") <= maxNeighbors)
          .select("c", "n", "dc")
          // two consumers (self-join sides) — see linkPrediction
          .localCheckpoint(eager = false)
    wedgeAdj
      .as("x")
      .join(wedgeAdj.as("y"), col("x.c") === col("y.c") && col("x.n") < col("y.n"))
      .groupBy(col("x.n").as("a"), col("y.n").as("b"))
      .agg(count(lit(1)).as("cn"), sum(expr("1000000 DIV x.dc")).as("ra_q"))
      .filter(col("cn") >= minCommon)
      .join(und, Seq("a", "b"), "left_anti")
      .orderBy(col("ra_q").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** `graph_resource_allocation` query body over the bounded co-order
    * graph (exact path — constant-bounded graph, quadratic oracle).
    */
  def coOrderResourceAllocation(spark: SparkSession, dir: String): DataFrame =
    resourceAllocation(coOrderEdges(spark, dir), maxNeighbors = Int.MaxValue)

  /** The bounded co-order edge relation shared by the triangle-family
    * queries (parts co-occurring in an order, orderkey < 10000 — a
    * CONSTANT subgraph at every scale factor, so quadratic oracle
    * replays stay affordable).
    */
  private def coOrderEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables
      .lineitem(spark, dir)
      .filter(col("l_orderkey") < 10000L)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    // within-order pairs from a per-order SORTED ARRAY instead of the
    // o-keyed self-join: the join planned the scan+distinct pipeline
    // once PER SIDE (subtrees are not shared across join aliases),
    // while the collect_list aggregate reuses the distinct's (o, p)
    // exchange and pairs in-task (guide §2.4). Items are distinct per
    // order, so the emitted (src < dst) multiset is identical.
    li.groupBy("o")
      .agg(sort_array(collect_list(col("p"))).as("ps"))
      .select(
        explode(
          expr(
            "flatten(transform(ps, (x, i) -> transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"
          )
        ).as("e")
      )
      .select(col("e.a").as("src"), col("e.b").as("dst"))
  }

  /** `graph_ktruss` query body: 4-truss (every surviving edge in ≥ 2
    * triangles among survivors), 3 synchronous peels, over the same
    * bounded co-order graph as [[coOrderTriangles]].
    */
  def coOrderKTruss(spark: SparkSession, dir: String): DataFrame =
    ktrussEdges(coOrderEdges(spark, dir), k = 4, rounds = 3)

  /** `graph_triangles` query body: triangle counts over the
    * co-purchase graph (parts appearing in the same order), bounded by
    * orderkey so the quadratic oracle replay stays constant-size
    * across scale factors.
    */
  def coOrderTriangles(spark: SparkSession, dir: String): DataFrame =
    triangleCounts(coOrderEdges(spark, dir))

  /** The part↔supplier co-purchase graph of the star schema: an edge
    * wherever a supplier ships a part (lineitem), symmetrized so
    * PageRank mass flows both ways and nothing dangles. Node ids are
    * namespaced (part → 2k, supplier → 2k+1) to keep one integer key
    * space.
    */
  def partSupplierEdges(spark: SparkSession, dir: String): DataFrame = {
    // dedup BEFORE symmetrizing: the two directions live in disjoint
    // node namespaces (part src even, supplier src odd), so the union
    // of the two distinct halves is already the distinct symmetric set
    // — the dedup shuffle carries |lineitem| rows instead of 2× them
    // (guide §2.3: shuffle fewer bytes; same edge set, bit-identical)
    val li = Tables.lineitem(spark, dir).select(
      (col("l_partkey") * 2L).as("p"),
      (col("l_suppkey") * 2L + 1L).as("s")
    ).distinct()
    li.select(col("p").as("src"), col("s").as("dst"))
      .union(li.select(col("s").as("src"), col("p").as("dst")))
  }

  /** `graph_pagerank` query body: 5 damped iterations over the
    * part↔supplier graph.
    */
  def partSupplierPageRank(spark: SparkSession, dir: String): DataFrame =
    pageRank(partSupplierEdges(spark, dir), iterations = 5, assumeDistinct = true)

  /** EXCHANGE-FREE bucketed PageRank iteration — the demonstrated form
    * of [[pageRank]]'s scale claim ("bucketing both the edge table and
    * the mass table by node id makes the per-iteration join
    * exchange-free"). The edge+degree relation and the initial mass
    * table are materialized as managed tables bucketed by the join key
    * with bucket count == `spark.sql.shuffle.partitions`; every
    * iteration's contribution aggregate then emits
    * HashPartitioning(node, P) — co-partitioned with the bucketed edge
    * scan's HashPartitioning(src, P) — so the mass⋈edges join plans
    * with ZERO Exchange on EITHER side (shuffle-hash join, mass as the
    * build side; the SHUFFLE_HASH hint keeps the demonstration off the
    * broadcast path a small graph would otherwise take). The ONLY data
    * movement per iteration is the (dst, contrib) aggregation shuffle —
    * longs, never the edge payload — which is PageRank's irreducible
    * movement. The plan is ASSERTED, not documented: the query refuses
    * to run if the 5-iteration plan holds anything but exactly
    * `iterations` hash exchanges over bucketed scans (the
    * `join_eliminated` convention). At 100 TB the bucketed write is
    * paid once and amortized over every iteration and every rerun;
    * here it rides inside the query so the measured time is honest
    * end-to-end.
    *
    * Caller contract: `edges` must be symmetrized (every node has
    * inflow) — the general [[pageRank]] handles no-inflow nodes with a
    * constant-row union, but a union would erase the aggregate's
    * partitioning and re-introduce the join exchange. The contract is
    * enforced LOUDLY in the row path of the mass-table write (zero
    * extra actions): a node with no in-edge raises.
    */
  def pageRankBucketed(
      edges: DataFrame,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen, "invalid damping")
    val spark = edges.sparkSession
    pageRankBucketedPrepare(edges, initMass, assumeDistinct)
    pageRankBucketedIterate(spark, iterations, initMass, dampNum, dampDen)
  }

  /** Phase 1 of [[pageRankBucketed]]: materialize the edge+degree and
    * initial-mass tables bucketed by the join key. On a standing graph
    * this is the write paid ONCE and amortized over every rerun and
    * every downstream bucketed consumer; the registered query runs it
    * in-query so the measured time is honest end-to-end.
    */
  def pageRankBucketedPrepare(edges: DataFrame, initMass: Long = 1000000L, assumeDistinct: Boolean = false): Unit = {
    val spark = edges.sparkSession
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false) // consumers: fingerprint + degree join + node directory
    // ONE aggregate over the (checkpointed) edges yields both halves
    // of the standing-table metadata: the row count DATA-SIZES the
    // bucket count (Bucketing.chooseBuckets — the session's shuffle
    // knob no longer enters; VERDICT r13 item 2), and the
    // order-independent content hash stamps the tables so a later
    // iterate can refuse a mass/edge pair written by different
    // prepares (the fixed-name-table hazard, ADVICE r13)
    val fp      = e.agg(count(lit(1)).as("n"), expr("bit_xor(xxhash64(src, dst))").as("h")).head()
    val stamp   = s"${fp.getLong(0)}:${if (fp.isNullAt(1)) "empty" else fp.getLong(1).toString}"
    val buckets = graft.sources.Bucketing.chooseBuckets(spark, fp.getLong(0))
    // one union+aggregate node directory (the pageRank prep shape):
    // out-degree and inflow flag in a single pass instead of a degree
    // groupBy plus a nodes-distinct plus an inflow-distinct+join.
    // EAGER checkpoint: both table writes below run concurrently, so
    // the shared directory must be materialized before forking (lazy
    // would let the racing first actions compute it twice).
    val nodeInfo = e
      .select(col("src").as("node"), lit(1L).as("__s"), lit(0L).as("__d"))
      .unionByName(e.select(col("dst").as("node"), lit(0L).as("__s"), lit(1L).as("__d")))
      .groupBy("node")
      .agg(sum("__s").as("outdeg"), max("__d").as("has_in"))
      .localCheckpoint(eager = true) // consumers: degree join + initial mass (concurrent)
    val withDeg = e.join(nodeInfo.select(col("node").as("src"), col("outdeg")), "src")
    // initial mass, bucketed by node; the symmetry contract rides the
    // write's row path — a node that never appears as dst would need
    // pageRank's constant-row union (which breaks co-partitioning)
    val mass0 = nodeInfo
      .select(
        col("node"),
        when(
          col("has_in") === 0L,
          raise_error(lit("pageRankBucketed: node with no in-edge — pass a symmetrized edge relation"))
            .cast("long")
        ).otherwise(lit(initMass)).as("mass")
      )
    // the two standing-table writes share nothing but the materialized
    // checkpoints — run them concurrently so the mass write back-fills
    // the edge write's stage tail (guide §2.6)
    runConcurrently(
      () => {
        graft.sources.Bucketing.writeBucketed(withDeg, "pr_edges_bkt", "src", buckets)
        graft.sources.Bucketing.stampBucketedTable(spark, "pr_edges_bkt", buckets, stamp)
      },
      () => {
        graft.sources.Bucketing.writeBucketed(mass0, "pr_mass_bkt", "node", buckets)
        graft.sources.Bucketing.stampBucketedTable(spark, "pr_mass_bkt", buckets, stamp)
      }
    )
  }

  /** Read + cross-check the standing-table metadata both iterate paths
    * depend on: every table must carry the SAME prepare stamp (never
    * iterate a mass table from dataset A against edges from dataset B)
    * and the SAME recorded bucket count (the co-partitioned property).
    * Returns that bucket count — the value the iteration's shuffles
    * are sized to, read from the TABLES, never from the session knob.
    */
  private def standingBuckets(spark: SparkSession, tables: Seq[String]): Int = {
    graft.sources.Bucketing.requireSameStamp(spark, tables)
    val counts = tables.map(t => t -> graft.sources.Bucketing.recordedBuckets(spark, t))
    require(
      counts.map(_._2).distinct.size == 1,
      s"standing tables disagree on bucket count — rebucket them together (Bucketing.rebucketTo): " +
        counts.map { case (t, b) => s"$t=$b" }.mkString(", ")
    )
    counts.head._2
  }

  /** Pin `spark.sql.shuffle.partitions` to the standing table's bucket
    * count for the duration of `f` (plan + execution must BOTH happen
    * inside — the eager wrappers checkpoint before restoring).
    */
  private def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Lazy core of [[pageRankBucketedIterate]]: builds (and
    * plan-asserts) the unrolled co-partitioned iteration WITHOUT
    * executing it. Contract: the session's shuffle-partition count
    * must already equal the standing tables' recorded bucket count —
    * the per-iteration aggregation exchange must land back on the
    * bucket layout for the next join to stay exchange-free. The
    * public wrapper pins the conf from the table metadata; specs call
    * this directly to count exchanges on the compiled plan.
    */
  private[graft] def pageRankBucketedIterateLazy(
      spark: SparkSession,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100
  ): DataFrame = {
    val buckets = standingBuckets(spark, Seq("pr_edges_bkt", "pr_mass_bkt"))
    val sessionP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(
      sessionP == buckets,
      s"pageRankBucketedIterate: session shuffle partitions ($sessionP) != standing bucket count " +
        s"($buckets) — the aggregation exchange would break co-partitioning; use the public " +
        "wrapper (it pins the conf from the table metadata)"
    )
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var mass     = spark.table("pr_mass_bkt")
    for (_ <- 1 to iterations) {
      mass = spark
        .table("pr_edges_bkt")
        .join(mass.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"), expr(s"(mass * $dampNum) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("node")
        .agg((lit(baseMass) + sum("c")).as("mass"))
    }
    // loud plan assertion (join_eliminated convention): the whole
    // unrolled iteration may hold ONLY the per-iteration aggregation
    // shuffles — no join-side exchange (both sides co-partitioned) and
    // no broadcast (the hint held) — and the edge side must actually
    // be the bucketed scan
    val planStr   = mass.queryExecution.executedPlan.toString
    val nHashEx   = "Exchange hashpartitioning".r.findAllIn(planStr).size
    val nBcastEx  = "BroadcastExchange".r.findAllIn(planStr).size
    val nBucketed = "SelectedBucketsCount".r.findAllIn(planStr).size
    require(
      nHashEx == iterations && nBcastEx == 0 && nBucketed >= iterations,
      s"pageRankBucketed: expected exactly $iterations aggregation exchanges over bucketed scans " +
        s"(got $nHashEx hash exchanges, $nBcastEx broadcasts, $nBucketed bucketed scans) — " +
        s"the co-partitioned iteration degraded:\n$planStr"
    )
    mass
  }

  /** Phase 2 of [[pageRankBucketed]]: the co-partitioned iteration over
    * the standing bucketed tables — the per-run cost once the graph
    * tables stand. The shuffle sizing comes from the TABLES' recorded
    * bucket count (pinned for the duration of plan + execution, then
    * restored — the node-sized result is checkpointed inside the
    * pinned window so no later re-plan can degrade under a different
    * session knob), and the stamp check refuses tables written by
    * different prepares.
    */
  def pageRankBucketedIterate(
      spark: SparkSession,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100
  ): DataFrame = {
    val buckets = standingBuckets(spark, Seq("pr_edges_bkt", "pr_mass_bkt"))
    withShufflePartitions(spark, buckets) {
      pageRankBucketedIterateLazy(spark, iterations, initMass, dampNum, dampDen)
        .localCheckpoint(eager = true) // node-sized aggregate, executed under the pinned conf
    }.orderBy("node")
  }

  /** `graph_pagerank_bucketed` query body: the exchange-free bucketed
    * iteration over the same part↔supplier graph and parameters as
    * [[partSupplierPageRank]] — same oracle, plan-asserted exchange
    * elimination.
    */
  def partSupplierPageRankBucketed(spark: SparkSession, dir: String): DataFrame =
    pageRankBucketed(partSupplierEdges(spark, dir), iterations = 5, assumeDistinct = true)

  /** `graph_pagerank_rebucketed` query body: the standing-table
    * LIFECYCLE made first-class. The data-sized bucket law fixes a
    * table's bucket count at prepare time; the day the data outgrows
    * the per-bucket row target, the remedy is a P → 2P rewrite
    * ([[graft.sources.Bucketing.rebucketTo]] — the one shuffle the
    * bucketed design otherwise never pays again, crash-safe via the
    * write-aside-then-swap protocol). This query runs that full
    * lifecycle in-line: prepare at the data-sized P, rebucket BOTH
    * standing tables to 2P, then 5 exchange-free iterations over the
    * rebucketed layout — bit-identical to [[partSupplierPageRank]]
    * under the same unrolled-SQL oracle, with the iterate's plan
    * assertion re-proving the co-partitioned property at 2P.
    */
  def partSupplierPageRankRebucketed(spark: SparkSession, dir: String): DataFrame = {
    pageRankBucketedPrepare(partSupplierEdges(spark, dir), assumeDistinct = true)
    val p = graft.sources.Bucketing.recordedBuckets(spark, "pr_edges_bkt")
    // the two rewrites touch disjoint tables — concurrent (guide §2.6),
    // so the node-sized mass rewrite back-fills the edge rewrite's tail
    runConcurrently(
      () => graft.sources.Bucketing.rebucketTo(spark, "pr_edges_bkt", 2 * p, Seq("src")),
      () => graft.sources.Bucketing.rebucketTo(spark, "pr_mass_bkt", 2 * p, Seq("node"))
    )
    pageRankBucketedIterate(spark, iterations = 5)
  }

  /** PageRank over a GROWING standing bucketed graph — the append path
    * of [[pageRankBucketed]]. A standing corpus graph is never written
    * once and frozen: crawls append edges. The bucketed-table answer:
    * new edge rows land in the SAME bucket layout
    * ([[graft.sources.Bucketing.appendBucketedKeys]]), so the
    * co-partitioned iteration keeps its exchange-free property as the
    * table grows — no re-shuffle of the standing payload, ever.
    *
    * Inline degrees (the static variant's schema) go STALE on append —
    * an appended edge changes its source's out-degree for EVERY
    * standing row of that source. So the append form keeps the edge
    * table degree-FREE and maintains degrees and mass as node-sized
    * sidecar tables REBUILT from the standing edges after each append:
    * one aggregate pass emitting node-count rows — the cheap,
    * always-correct IVM point for a quantity whose per-key value is a
    * whole-key aggregate. The iteration then chains TWO co-partitioned
    * joins (edges⋈deg by src — both bucketed by src; result⋈mass on
    * src=node — stream-side partitioning preserved), still exactly ONE
    * aggregation exchange per iteration, plan-ASSERTED like the static
    * form. Output is bit-identical to [[pageRank]] over the union edge
    * set (same integer mass, same unrolled-SQL oracle).
    */
  def pageRankBucketedAppend(
      baseEdges: DataFrame,
      newEdges: DataFrame,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100,
      assumeDistinct: Boolean = false
  ): DataFrame = {
    require(iterations >= 1 && dampNum >= 0 && dampNum <= dampDen, "invalid damping")
    val spark = baseEdges.sparkSession
    def canon(df: DataFrame) = canonLongEdges(df, assumeDistinct)
    // day 0: the standing edge table (degree-free, bucketed by src) at
    // a DATA-SIZED bucket count (the day-0 row count; appends keep the
    // layout, and when growth outruns the per-bucket target the
    // lifecycle answer is Bucketing.rebucketTo — probed in SCALE.md,
    // not implied)
    val base  = canon(baseEdges).localCheckpoint(eager = false)
    val nBase = base.count()
    val buckets = graft.sources.Bucketing.chooseBuckets(spark, nBase)
    graft.sources.Bucketing.writeBucketed(base, "pr_edges_app", "src", buckets)
    // the append: new rows land in the same bucket layout — the
    // standing payload is never re-shuffled
    graft.sources.Bucketing.appendBucketedKeys(canon(newEdges), "pr_edges_app", buckets, Seq("src"))
    // node-sized sidecars rebuilt from the standing table: degrees
    // (bucketed by src — co-partitioned with the edge scan) and mass
    // (bucketed by node), with the symmetry contract riding the mass
    // write's row path exactly as in the static form
    val standing = spark.table("pr_edges_app").localCheckpoint(eager = false)
    // stamp the GROWN relation (count + order-independent hash) onto
    // all three tables — the iterate refuses any edges/deg/mass trio
    // not written by this same prepare pass
    val fp    = standing.agg(count(lit(1)).as("n"), expr("bit_xor(xxhash64(src, dst))").as("h")).head()
    val stamp = s"${fp.getLong(0)}:${if (fp.isNullAt(1)) "empty" else fp.getLong(1).toString}"
    graft.sources.Bucketing.stampBucketedTable(spark, "pr_edges_app", buckets, stamp)
    // one union+aggregate node directory (the pageRank prep shape):
    // degrees and the inflow flag in a single pass over the standing
    // endpoints instead of a degree groupBy + nodes distinct + inflow
    // distinct+join
    val nodeInfo = standing
      .select(col("src").as("node"), lit(1L).as("__s"), lit(0L).as("__d"))
      .unionByName(standing.select(col("dst").as("node"), lit(0L).as("__s"), lit(1L).as("__d")))
      .groupBy("node")
      .agg(sum("__s").as("outdeg"), max("__d").as("has_in"))
      .localCheckpoint(eager = true) // consumers: degree sidecar + initial mass (concurrent)
    val mass0 = nodeInfo
      .select(
        col("node"),
        when(
          col("has_in") === 0L,
          raise_error(lit("pageRankBucketedAppend: node with no in-edge — pass a symmetrized edge relation"))
            .cast("long")
        ).otherwise(lit(initMass)).as("mass")
      )
    // the two node-sized sidecar writes are independent once the node
    // directory is materialized — run them concurrently (guide §2.6)
    runConcurrently(
      () => {
        graft.sources.Bucketing.writeBucketed(
          nodeInfo.filter(col("outdeg") > 0L).select(col("node").as("src"), col("outdeg")),
          "pr_deg_app",
          "src",
          buckets
        )
        graft.sources.Bucketing.stampBucketedTable(spark, "pr_deg_app", buckets, stamp)
      },
      () => {
        graft.sources.Bucketing.writeBucketed(mass0, "pr_mass_app", "node", buckets)
        graft.sources.Bucketing.stampBucketedTable(spark, "pr_mass_app", buckets, stamp)
      }
    )
    pageRankAppendedIterate(spark, iterations, initMass, dampNum, dampDen)
  }

  /** Lazy core of the appended-graph iteration — same contract as
    * [[pageRankBucketedIterateLazy]] (session shuffle partitions must
    * equal the standing bucket count; same-stamp check across all
    * three tables), with the append form's two co-partitioned joins
    * (edges⋈deg by src, result⋈mass on src=node) per iteration.
    */
  private[graft] def pageRankAppendedIterateLazy(
      spark: SparkSession,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100
  ): DataFrame = {
    val buckets  = standingBuckets(spark, Seq("pr_edges_app", "pr_deg_app", "pr_mass_app"))
    val sessionP = spark.conf.get("spark.sql.shuffle.partitions").toInt
    require(
      sessionP == buckets,
      s"pageRankAppendedIterate: session shuffle partitions ($sessionP) != standing bucket count " +
        s"($buckets) — use the public wrapper (it pins the conf from the table metadata)"
    )
    val baseMass = initMass * (dampDen - dampNum) / dampDen
    var mass     = spark.table("pr_mass_app")
    for (_ <- 1 to iterations) {
      mass = spark
        .table("pr_edges_app")
        .join(spark.table("pr_deg_app").hint("shuffle_hash"), "src")
        .join(mass.hint("shuffle_hash"), col("src") === col("node"))
        .select(col("dst").as("node"), expr(s"(mass * $dampNum) div (${dampDen}L * outdeg)").as("c"))
        .groupBy("node")
        .agg((lit(baseMass) + sum("c")).as("mass"))
    }
    // same loudness standard as the static form: only the
    // per-iteration aggregation shuffles may appear — the appended
    // files joined exchange-free or the query refuses
    val planStr   = mass.queryExecution.executedPlan.toString
    val nHashEx   = "Exchange hashpartitioning".r.findAllIn(planStr).size
    val nBcastEx  = "BroadcastExchange".r.findAllIn(planStr).size
    val nBucketed = "SelectedBucketsCount".r.findAllIn(planStr).size
    require(
      nHashEx == iterations && nBcastEx == 0 && nBucketed >= 2 * iterations,
      s"pageRankBucketedAppend: expected exactly $iterations aggregation exchanges over bucketed scans " +
        s"(got $nHashEx hash exchanges, $nBcastEx broadcasts, $nBucketed bucketed scans) — " +
        s"the appended table lost the co-partitioned property:\n$planStr"
    )
    mass
  }

  /** Public appended-graph iteration: conf pinned from the standing
    * tables' recorded bucket count, node-sized result checkpointed
    * inside the pinned window, then sorted.
    */
  def pageRankAppendedIterate(
      spark: SparkSession,
      iterations: Int = 5,
      initMass: Long = 1000000L,
      dampNum: Int = 85,
      dampDen: Int = 100
  ): DataFrame = {
    val buckets = standingBuckets(spark, Seq("pr_edges_app", "pr_deg_app", "pr_mass_app"))
    withShufflePartitions(spark, buckets) {
      pageRankAppendedIterateLazy(spark, iterations, initMass, dampNum, dampDen)
        .localCheckpoint(eager = true)
    }.orderBy("node")
  }

  /** `graph_pagerank_appended` query body: the part↔supplier graph
    * split by a src+dst predicate into a day-0 table and an appended
    * batch (disjoint halves of the distinct edge set, so base ∪ append
    * == the full relation), then 5 exchange-free iterations over the
    * GROWN standing table — bit-identical to [[partSupplierPageRank]]
    * under the same unrolled-SQL oracle.
    */
  def partSupplierPageRankAppended(spark: SparkSession, dir: String): DataFrame = {
    val edges = partSupplierEdges(spark, dir)
    // filters of a distinct relation stay distinct — both halves keep
    // the builder's guarantee, so the append path skips its dedups
    pageRankBucketedAppend(
      edges.filter((col("src") + col("dst")) % 3 =!= 0),
      edges.filter((col("src") + col("dst")) % 3 === 0),
      iterations = 5,
      assumeDistinct = true
    )
  }

  /** HITS (Kleinberg 1999) over a DIRECTED hub→authority edge
    * relation, integer-mass edition: authority = normalized inflow of
    * hub mass, hub = normalized inflow of authority mass, alternating
    * `iterations` times. Normalization is the part float HITS does
    * with an L2 norm — here it is mass-conserving floor division by
    * the round's total (a broadcast 1-row aggregate), which keeps
    * every value bounded by `scale`·degree (no overflow at any
    * iteration count) and BIT-EXACT replayable as unrolled SQL, the
    * same discipline as [[pageRank]]. Ordering agrees with float HITS
    * to sub-ppm mass.
    *
    * Per iteration: two hash joins (mass onto edges) + two (node,
    * contrib) aggregation shuffles + two 1-row totals — linear in
    * edges, bucketing-friendly on node id like every iteration here.
    */
  def hits(edges: DataFrame, iterations: Int = 3, scale: Long = 1000000L, assumeDistinct: Boolean = false): DataFrame = {
    require(iterations >= 1, "hits needs at least one iteration")
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    def half(mass: DataFrame, from: String, to: String): DataFrame = {
      // the raw inflow feeds BOTH the total and the normalization —
      // without a checkpoint the shared subtree is duplicated in the
      // plan and the duplication COMPOUNDS 2× per half-iteration
      // (unlike pageRank, whose evolving mass is consumed once); the
      // lazy checkpoint pins each half to one execution
      val raw = e
        .join(mass, col(from) === col("node"))
        .select(col(to).as("n2"), col("mass").as("m"))
        .groupBy("n2")
        .agg(sum("m").as("raw"))
        .localCheckpoint(eager = false)
      val tot = raw.agg(sum("raw").as("tot"))
      raw
        .crossJoin(broadcast(tot))
        .select(col("n2").as("node"), expr(s"(raw * ${scale}L) div tot").as("mass"))
    }
    var hub = e.select(col("src").as("node")).distinct().withColumn("mass", lit(scale))
    var auth: DataFrame = null
    for (_ <- 1 to iterations) {
      auth = half(hub, "src", "dst")
      hub = half(auth, "dst", "src")
    }
    hub
      .select(lit("hub").as("role"), col("node"), col("mass"))
      .unionByName(auth.select(lit("auth").as("role"), col("node"), col("mass")))
      .orderBy("role", "node")
  }

  /** `graph_hits` query body: suppliers as hubs, parts as authorities
    * over the directed supplier→part shipment relation (the natural
    * bipartite HITS instance of this schema).
    */
  def supplierPartHits(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir).select(
      (col("l_suppkey") * 2L + 1L).as("src"),
      (col("l_partkey") * 2L).as("dst")
    )
    hits(li.distinct(), iterations = 3, assumeDistinct = true)
  }

  /** `graph_bfs_depth` query body: hop distance from the parts shipped
    * by supplier 1 (namespaced node 3) out to 4 hops in the
    * part↔supplier graph.
    */
  def partSupplierBfs(spark: SparkSession, dir: String): DataFrame = {
    val seeds = Tables
      .lineitem(spark, dir)
      .filter(col("l_suppkey") === 1L)
      .select((col("l_partkey") * 2L).as("node"))
      .distinct()
    bfsDepths(partSupplierEdges(spark, dir), seeds, maxHops = 4, assumeDistinct = true)
  }

  /** Per-seed BFS depths — [[bfsDepths]] with the seed identity
    * CARRIED: the distance relation is keyed (seed, node), so ONE
    * relaxation loop serves every seed simultaneously (k seeds cost k×
    * state, not k passes over the edges; the join still partitions on
    * the node key). The building block for per-source reachability
    * and centrality measures.
    */
  def seededBfsDepths(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4, assumeDistinct: Boolean = false): DataFrame = {
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    var dist = seeds
      .select(col("node").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("node"), lit(0L).as("depth"))
    for (_ <- 1 to maxHops) {
      val next = e
        .join(dist, col("src") === col("node"))
        .select(col("seed"), col("dst").as("node"), (col("depth") + 1L).as("depth"))
      dist = dist
        .unionByName(next)
        .groupBy("seed", "node")
        .agg(min("depth").as("depth"))
        .localCheckpoint(eager = false)
    }
    dist
  }

  /** Bounded-radius CLOSENESS centrality for a seed set: within
    * `maxHops`, each seed's reach count and hop-distance mass, plus
    * closeness = (reached − 1) / Σd — the "how central is this
    * entity" score over the co-purchase graph, honestly documented as
    * RADIUS-BOUNDED (exact closeness needs the full diameter; the
    * bounded variant is what production graph stores compute for
    * interactive centrality). Integers end to end except the final
    * int/int quotient — identical doubles in any engine.
    */
  def closeness(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4, assumeDistinct: Boolean = false): DataFrame =
    seededBfsDepths(edges, seeds, maxHops, assumeDistinct)
      .groupBy("seed")
      .agg(count(lit(1)).as("n_reached"), sum("depth").as("sum_d"))
      .select(
        col("seed"),
        col("n_reached"),
        col("sum_d"),
        when(col("sum_d") === 0L, lit(0.0))
          .otherwise((col("n_reached") - 1L).cast("double") / col("sum_d"))
          .as("closeness")
      )
      .orderBy("seed")

  /** `graph_closeness` query body: five part seeds over the
    * part↔supplier graph, 4-hop radius.
    */
  def partCloseness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    closeness(partSupplierEdges(spark, dir), Seq(2L, 4L, 6L, 8L, 10L).toDF("node"), assumeDistinct = true)
  }

  /** Seed-set BETWEENNESS centrality (Brandes 2001, "A faster
    * algorithm for betweenness centrality", J. Math. Sociology —
    * public knowledge), radius-bounded: exact shortest-path counting
    * from each seed (σ stays a LONG — path counts are integers) and
    * level-synchronous backward dependency accumulation
    * δ(v) = Σ_{w : succ} (σ_v/σ_w)·(1+δ_w). The sampled-seed form is
    * the standard corpus-scale approximation (full betweenness is
    * all-pairs); scores are the seed-set sums, unscaled and honestly
    * radius-bounded like [[closeness]].
    *
    * Scale: forward is |levels| rounds of one equi-join + one
    * aggregate + one anti-join (settled set), all node-keyed —
    * bucketing co-partitions every one of them; backward is one
    * reversed-edge join + one aggregate per level. Levels are
    * lazily checkpointed so the plan stays linear in depth. The only
    * doubles are the σ-ratio dependency terms (rounded to 4 decimals
    * at the end, repo convention); every count is exact.
    */
  def betweenness(edges: DataFrame, seeds: DataFrame, maxHops: Int = 3, assumeDistinct: Boolean = false): DataFrame = {
    require(maxHops >= 1, "betweenness needs at least one hop")
    val e = canonLongEdges(edges, assumeDistinct)
      .localCheckpoint(eager = false)
    // forward: strict BFS levels with exact path counts
    val l0 = seeds
      .select(col("node").cast("long").as("seed"))
      .distinct()
      .select(col("seed"), col("seed").as("node"), lit(1L).as("sigma"))
      .localCheckpoint(eager = false)
    var levels  = List(l0) // head = deepest
    var settled = l0.select("seed", "node")
    for (_ <- 1 to maxHops) {
      val next = e
        .join(levels.head, col("src") === col("node"))
        .select(col("seed"), col("dst").as("node"), col("sigma"))
        .join(settled, Seq("seed", "node"), "left_anti")
        .groupBy("seed", "node")
        .agg(sum("sigma").as("sigma"))
        .localCheckpoint(eager = false)
      levels = next :: levels
      settled = settled.unionByName(next.select("seed", "node")).localCheckpoint(eager = false)
    }
    // backward: δ = 0 at the deepest level, then one reversed-edge
    // join + aggregate per level upward; seeds' own rows (level 0)
    // never enter the centrality sum
    var cur       = levels.head.withColumn("delta", lit(0.0))
    var deltaRows = cur
    for (lower <- levels.tail) {
      val fromAbove = cur
        .join(e, cur("node") === e("dst"))
        .select(col("seed"), e("src").as("node"), col("sigma").as("sig_w"), col("delta").as("del_w"))
      cur = lower
        .join(fromAbove, Seq("seed", "node"), "left")
        .groupBy(col("seed"), col("node"), col("sigma"))
        .agg(
          coalesce(
            sum(col("sigma").cast("double") / col("sig_w") * (lit(1.0) + col("del_w"))),
            lit(0.0)
          ).as("delta")
        )
        .localCheckpoint(eager = false)
      deltaRows = deltaRows.unionByName(cur)
    }
    deltaRows
      .filter(col("node") =!= col("seed"))
      .groupBy("node")
      .agg(round(sum("delta"), 4).as("bc"))
      .orderBy("node")
  }

  /** Degree ASSORTATIVITY (Newman 2002, "Assortative mixing in
    * networks" — public knowledge): the Pearson correlation of
    * endpoint degrees over the symmetric edge set, computed from four
    * EXACT integer moments (m, Σd_src, Σd_src·d_dst, Σd_src²; by
    * symmetry the src and dst marginals coincide) —
    * r = (m·S_xy − S_x²) / (m·S_xx − S_x²). The moments are emitted
    * as BIGINTs; r itself is assembled with a FIXED operation order
    * (cast-then-multiply-then-subtract-then-divide), so the double is
    * bit-identical in any engine. One degree aggregate + one edge
    * join + one moment aggregate — no windows, no iteration.
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .distinct()
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val joined = e
      .join(deg.select(col("src"), col("d").as("dx")), "src")
      .join(deg.select(col("src").as("dst"), col("d").as("dy")), "dst")
    joined
      .agg(
        count(lit(1)).as("m"),
        sum("dx").as("s_x"),
        sum(col("dx") * col("dy")).as("s_xy"),
        sum(col("dx") * col("dx")).as("s_xx")
      )
      .select(
        col("m"),
        col("s_x"),
        col("s_xy"),
        col("s_xx"),
        ((col("m").cast("double") * col("s_xy") - col("s_x").cast("double") * col("s_x")) /
          (col("m").cast("double") * col("s_xx") - col("s_x").cast("double") * col("s_x"))).as("r")
      )
  }

  /** `graph_assortativity` query body: the part↔supplier graph —
    * strongly disassortative by construction (hub suppliers attach to
    * low-degree parts).
    */
  def partAssortativity(spark: SparkSession, dir: String): DataFrame =
    degreeAssortativity(partSupplierEdges(spark, dir))

  /** `graph_betweenness` query body: five part seeds over the
    * part↔supplier graph, 3-hop radius.
    */
  def partBetweenness(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    betweenness(partSupplierEdges(spark, dir), Seq(2L, 4L, 6L, 8L, 10L).toDF("node"), assumeDistinct = true)
  }

  /** Weighted single-source(-set) shortest paths by bounded
    * SYNCHRONOUS Bellman–Ford relaxation: `rounds` rounds, each
    * relaxing EVERY edge once (one hash join of the distance relation
    * onto edges by src + one min-aggregate by node — the
    * [[bfsDepths]] shuffle shape with the hop counter replaced by an
    * integer weight sum). After r rounds the relation holds the exact
    * minimum-weight path using ≤ r edges — a pure function of the
    * edge set (synchronous rounds, integer arithmetic, min-folds), so
    * the DuckDB oracle replays it BIT-EXACT as unrolled SQL; with
    * `rounds` ≥ the graph's hop diameter it is exact SSSP. Negative
    * weights are refused loudly (bounded-round relaxation over a
    * negative cycle would silently report a non-distance). Multi-edges
    * collapse to their minimum weight before iterating. Unreached
    * nodes are absent from the output.
    *
    * Scale: per round one equi-join + one aggregate, both
    * node-hash-partitioned (bucketing co-partitions the join on a
    * cluster); the static edge relation is checkpointed once; per-round
    * lazy checkpoints keep the plan linear in round count.
    */
  def shortestPaths(
      edges: DataFrame,
      seeds: DataFrame,
      rounds: Int = 4,
      assumeMinFolded: Boolean = false
  ): DataFrame = {
    require(rounds >= 1, "shortestPaths needs at least one relaxation round")
    // the negative-weight guard rides the collapse pass the operator
    // already makes (a per-row branch in the projection, thrown on
    // first evaluation) — a separate `filter(w<0).count()` pre-scan
    // paid a full pass over the edge relation in the common GOOD case
    val w = col("w").cast("long")
    val guardedW = when(
      w < 0L,
      raise_error(concat(
        lit("shortestPaths requires non-negative edge weights, got w="),
        w.cast("string")
      )).cast("long")
    ).otherwise(w)
    val guarded = edges
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"), guardedW.as("w"))
    // callers whose builder already min-folded per (src, dst)
    // ([[weightedPartSupplierEdges]]: one row per mirrored pair by
    // construction) skip the collapse aggregate — a full-relation
    // shuffle that is the identity on such input (guide §2.4); the
    // negative-weight guard stays in the projection either way
    val e = (if (assumeMinFolded) guarded
             else guarded.groupBy("src", "dst").agg(min("w").as("w")))
      .localCheckpoint(eager = false)
    var dist = seeds.select(col("node").cast("long").as("node")).distinct().withColumn("dist", lit(0L))
    for (_ <- 1 to rounds) {
      val relaxed = e
        .join(dist, col("src") === col("node"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist
        .unionByName(relaxed)
        .groupBy("node")
        .agg(min("dist").as("dist"))
        .localCheckpoint(eager = false)
    }
    dist.orderBy("node")
  }

  /** The part↔supplier graph of [[partSupplierEdges]] weighted by the
    * MINIMUM shipped quantity over the relation's lineitems — a
    * deterministic integer weight both engines derive identically.
    */
  def weightedPartSupplierEdges(spark: SparkSession, dir: String): DataFrame = {
    // min-fold BEFORE symmetrizing (the partSupplierEdges argument:
    // disjoint src namespaces make the mirrored halves collision-free,
    // and min per (p, s) equals min per mirrored key) — the aggregate
    // shuffles |lineitem| rows instead of 2× them; same weighted edge
    // set, bit-identical
    val li = Tables
      .lineitem(spark, dir)
      .select(
        (col("l_partkey") * 2L).as("p"),
        (col("l_suppkey") * 2L + 1L).as("s"),
        col("l_quantity").cast("long").as("w")
      )
      .groupBy("p", "s")
      .agg(min("w").as("w"))
    li.select(col("p").as("src"), col("s").as("dst"), col("w"))
      .unionByName(li.select(col("s").as("src"), col("p").as("dst"), col("w")))
  }

  /** `graph_sssp` query body: 4 Bellman–Ford rounds from supplier 1's
    * parts over the quantity-weighted part↔supplier graph.
    */
  def partSupplierSssp(spark: SparkSession, dir: String): DataFrame = {
    val seeds = Tables
      .lineitem(spark, dir)
      .filter(col("l_suppkey") === 1L)
      .select((col("l_partkey") * 2L).as("node"))
      .distinct()
    shortestPaths(weightedPartSupplierEdges(spark, dir), seeds, rounds = 4, assumeMinFolded = true)
  }

  /** Community detection by SYNCHRONOUS label propagation (Raghavan/
    * Albert/Kumara, Phys. Rev. E 2007), determinized: labels start as
    * node ids; each round every node adopts the most frequent label
    * among its neighbors, ties to the SMALLEST label; exactly
    * `iterations` rounds. The async/random-order variants of the paper
    * converge faster but are run-order dependent — a fixed round count
    * with min-label tie-breaks makes the output a pure function of the
    * edge set, so the DuckDB oracle replays it as unrolled SQL like
    * [[pageRank]] (no floats anywhere to drift).
    *
    * Per round: one hash join (labels onto edges by src), one
    * (node, label) counting aggregate, one per-node max, one min-label
    * fold — all hash-partitioned on node id, bucketing-friendly,
    * linear in edges; per-round lazy checkpoints keep the plan linear
    * in round count.
    */
  def labelPropagation(edges: DataFrame, iterations: Int = 4, assumeCanonical: Boolean = false): DataFrame = {
    require(iterations >= 1, "labelPropagation needs at least one round")
    // assumeCanonical: the caller guarantees `edges` is ALREADY the
    // canonical undirected relation — distinct, loop-free and
    // symmetric (swap(E) == E). The generic build below is then the
    // identity at 2× the cost of the whole relation: it unions the
    // symmetric set with its own mirror (4×|E| rows) and dedups back
    // to |E| — the single most expensive no-op in the graph family.
    // [[partSupplierEdges]] qualifies by construction (two mirrored
    // distinct halves over disjoint even/odd namespaces).
    val e = (if (assumeCanonical)
               edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
             else {
               val dir = edges
                 .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
                 .filter(col("src") =!= col("dst"))
               dir
                 .union(dir.select(col("dst").as("src"), col("src").as("dst")))
                 .distinct()
             })
      .localCheckpoint(eager = false)
    var lab = e.select(col("src").as("node")).distinct().withColumn("label", col("node"))
    for (_ <- 1 to iterations) {
      // alias both sides: in round 1 `lab` shares lineage with `e`
      // (labels seeded from the edge set) and an unaliased self-join
      // would be ambiguous
      // ONE exchange per round instead of two: hash-repartition the
      // neighbor-label stream by node BEFORE the (node, label) count —
      // HashPartitioning(node) satisfies the clustering of BOTH the
      // (node, label) count and the following per-node argmax (the
      // partitioning-subset rule), so the count and the fold run in the
      // same stage with no further exchange (guide §2.4: two operations
      // keyed the same way share one exchange). Bytes are a wash (the
      // (node, label) pairs are mostly unique, so the old partial
      // aggregation barely combined before its exchange).
      val counts = e
        .alias("e")
        .join(lab.alias("l"), col("e.src") === col("l.node"))
        .select(col("e.dst").as("node"), col("l.label").as("label"))
        .repartition(col("node"))
        .groupBy("node", "label")
        .agg(count(lit(1)).as("cnt"))
      // one-shot argmax: max over (cnt, -label) structs picks the
      // highest count and, among ties, the smallest label — same
      // semantics as max-count + min-label, one aggregation instead of
      // agg + join + filter + agg (a join and a shuffle saved per
      // round; labels are non-negative node ids, so negation is safe)
      lab = counts
        .groupBy("node")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("node"), (-col("m.nl")).as("label"))
        .localCheckpoint(eager = false)
    }
    lab.orderBy("node")
  }

  /** `graph_lpa` query body: 4 deterministic rounds over the
    * part↔supplier graph.
    */
  def partSupplierLpa(spark: SparkSession, dir: String): DataFrame =
    labelPropagation(partSupplierEdges(spark, dir), iterations = 4, assumeCanonical = true)

  /** k-core subgraph by BOUNDED synchronous peeling (Seidman 1983;
    * the Batagelj–Zaveršnik sequential peel is inherently ordered —
    * the synchronous variant deletes ALL sub-k nodes each round, which
    * is a pure function of the edge set and replays as unrolled SQL
    * like [[labelPropagation]]). Exactly `rounds` rounds: when the
    * peel has converged (spec-asserted for the registered instance;
    * cascades die off in O(log n) synchronous rounds on real graphs)
    * the result IS the k-core — the maximal subgraph where every node
    * keeps >= k neighbors. Output: surviving (node, deg) with the
    * IN-CORE degree, total order by node. Integer-only — nothing to
    * drift.
    *
    * Per round: one degree aggregation + two semi-joins of the
    * (monotonically shrinking) edge set against survivors — all
    * hash-partitioned on node id, bucketing-friendly, linear in
    * surviving edges; per-round lazy checkpoints keep the plan linear
    * in round count. The first peel usually removes most of the graph,
    * so later rounds run on a small residual.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 5, assumeCanonical: Boolean = false): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCore needs k >= 1 and rounds >= 1")
    // assumeCanonical: caller guarantees a distinct, loop-free,
    // symmetric relation — the generic symmetrize+distinct below is
    // then a pure 2× shuffle of the edge relation (the LPA argument)
    var e = (if (assumeCanonical)
               edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
             else {
               val dir0 = edges
                 .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
                 .filter(col("src") =!= col("dst"))
               dir0
                 .union(dir0.select(col("dst").as("src"), col("src").as("dst")))
                 .distinct()
             })
      .localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      val survivors = e
        .groupBy("src")
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .select(col("src").as("node"))
      e = e
        .join(survivors, e("src") === survivors("node"), "left_semi")
        .join(survivors, e("dst") === survivors("node"), "left_semi")
        .localCheckpoint(eager = false)
    }
    e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .orderBy("node")
  }

  /** `graph_kcore` query body: the 4-core of the small-quantity
    * (l_quantity <= 3) part↔supplier shipment graph — peeling the
    * casual co-occurrences away leaves the densely-coupled
    * supplier/part cluster, the corpus analogue of trimming low-degree
    * crawl pages before link analysis. Converges in 3 synchronous
    * rounds at sf0.01/0.1/1 (5 budgeted, fixpoint spec-asserted).
    */
  def partSupplierKCore(spark: SparkSession, dir: String): DataFrame = {
    // dedup BEFORE symmetrizing (the partSupplierEdges argument): the
    // directed (part, supplier) pairs are deduped at |filtered
    // lineitem| grain, and the mirrored union is then distinct by the
    // disjoint even/odd src namespaces — so kCore's generic
    // symmetrize+distinct (a 2× shuffle of raw multi-shipment rows)
    // is skipped outright
    val d = Tables
      .lineitem(spark, dir)
      .filter(col("l_quantity") <= 3)
      .select((col("l_partkey") * 2L).as("src"), (col("l_suppkey") * 2L + 1L).as("dst"))
      .distinct()
    kCore(
      d.union(d.select(col("dst").as("src"), col("src").as("dst"))),
      k = 4,
      rounds = 5,
      assumeCanonical = true
    )
  }
}
