package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Similarity-search correctness: brute force is the ground truth;
  * ANN is judged by recall against it.
  */
class SimilaritySpec extends SparkSpec {

  test("brute-force top-k matches a driver-side exact computation for one query") {
    val vecs = Tables
      .embeddings(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x * y; na += x * x; nb += y * y; i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val q = vecs(0L)
    val expect = vecs.toSeq
      .filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }
      .take(5)
      .map(_._1)
    val got = Similarity
      .bruteForceTopK(spark, sfDir, k = 5, queryFilter = "vec_id = 0")
      .filter(col("qid") === 0L)
      .orderBy("rnk")
      .collect()
      .map(_.getLong(2))
      .toSeq
    assert(got == expect)
  }

  test("searchByVector: searching an indexed vector returns itself first") {
    val v = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 7L).head().getSeq[Float](1).toArray
    val hits = Similarity.searchByVector(spark, sfDir, v, k = 3).collect()
    assert(hits.head.getLong(0) == 7L, s"self should rank first, got ${hits.head}")
    assert(math.abs(hits.head.getDouble(1) - 1.0) < 1e-9)
    assert(hits.length == 3 && hits(1).getDouble(1) <= hits.head.getDouble(1))
  }

  test("IVF top-k: valid ranks, exact scores, reasonable recall vs brute force") {
    val brute = Similarity
      .bruteForceTopK(spark, sfDir, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val ivf = Similarity.ivfTopK(spark, sfDir, k = 5, nCells = 16, nProbe = 4).collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
    }
    val hit = ivf.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains)
    val recall = hit.toDouble / brute.size
    assert(recall >= 0.3, s"IVF recall@5 degraded to $recall")
  }

  test("IVF×PQ: valid ranks, recall holds, candidates scanned are a fraction of queries × corpus") {
    val brute = Similarity
      .bruteForceTopK(spark, sfDir, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .toSet
    val ivfpq = Similarity.ivfPqTopK(spark, sfDir, k = 5).collect()
    assert(ivfpq.nonEmpty)
    ivfpq.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
    }
    val recall = ivfpq.map(r => (r.getLong(0), r.getLong(2))).count(brute.contains).toDouble / brute.size
    // the work-reduction half: the candidate stream ADC scores is the
    // probed-cells fraction of the full cross product plain PQ scans
    val e     = Tables.embeddings(spark, sfDir).select("vec_id")
    val n     = e.count().toDouble
    val nQ    = e.filter(col("vec_id") % 100 === 0).count().toDouble
    val nCand = Similarity.ivfPqCandidates(spark, sfDir).count().toDouble
    val frac  = nCand / (nQ * (n - 1.0))
    info(f"ivfpq recall@5=$recall%.3f candidate_fraction=$frac%.3f")
    assert(recall >= 0.2, s"IVF×PQ recall@5 degraded to $recall")
    assert(frac <= 0.6, s"IVF restriction not reducing work: fraction $frac")
  }

  test("standing IVF×PQ index probe returns exactly the self-contained ivfPqTopK result") {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.buildIvfPqIndex(e, "t_ivfpq")
    val probe = Similarity
      .ivfPqProbe(
        spark,
        "t_ivfpq",
        e.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("embedding")),
        excludeSelf = true
      )
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val oneShot = Similarity
      .ivfPqTopK(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(probe.toSeq == oneShot.toSeq, "index probe diverged from the self-contained computation")
  }

  test("IVF×PQ append: build+append equals a frozen-model encode of the union, probe stays valid") {
    val e      = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch  = e.filter(col("vec_id") % 10 === 0)
    Similarity.buildIvfPqIndex(corpus, "t_ivfpq_app")
    Similarity.appendIvfPqIndex(batch, "t_ivfpq_app")

    // reference: encode + assign EVERYTHING with the index's frozen
    // model (the append path must be indistinguishable from it)
    val cbDf  = spark.table("t_ivfpq_app_codebooks")
    val cents = spark
      .table("t_ivfpq_app_centroids")
      .orderBy("cell")
      .collect()
      .toSeq
      .map(r => r.getSeq[Float](r.fieldIndex("centroid")))
    val ref = Similarity
      .encodeWithCodebooks(Similarity.l2Normalize(e, 64, "spec"), cbDf, 16, 4)
      .join(Similarity.assignNearestCell(e, cents).select("vec_id", "cell"), Seq("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSet
    val got = spark
      .table("t_ivfpq_app_codes")
      .select("vec_id", "sub_idx", "code", "cell")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.length == got.toSet.size, "append produced duplicate (vec_id, sub_idx) code rows")
    assert(got.toSet == ref, "appended index diverged from the frozen-model encode of corpus ∪ batch")

    // the appended index serves probes: valid contiguous ranks per query
    val probe = Similarity
      .ivfPqProbe(
        spark,
        "t_ivfpq_app",
        e.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("embedding")),
        excludeSelf = true
      )
      .collect()
    assert(probe.nonEmpty)
    probe.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq == (1L to rows.length))
    }
  }

  test("IVF×PQ probe plan: code-table side reads its buckets with no shuffle exchange") {
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    Similarity.buildIvfPqIndex(e, "t_ivfpq_plan")
    val probe = Similarity.ivfPqProbe(
      spark,
      "t_ivfpq_plan",
      e.filter(col("vec_id") % 100 === 0).select(col("vec_id").as("qid"), col("embedding"))
    )
    val plan = probe.queryExecution.executedPlan.toString
    // the probed joins (cell restriction, ADC lookup) must both be
    // broadcasts — any hashpartitioning exchange upstream of the
    // final per-query aggregate means the corpus-sized code table
    // is being shuffled, which is exactly what the index exists to
    // avoid. The only legal exchanges are the top-k window's and the
    // (qid, cand) aggregate's over ALREADY-REDUCED candidate rows.
    assert(plan.contains("t_ivfpq_plan_codes"), s"code table scan missing from plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"probe joins are not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"code table shuffled into a non-broadcast join:\n$plan")
  }

  test("kmeansCells clamps duplicate-padded centroids when the sample is smaller than k") {
    import SparkSpec.spark.implicits._
    val tiny = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val (assigned, centDf) = Similarity.kmeansCells(tiny, nCells = 8)
    val cents = centDf.collect().map(_.getSeq[Float](1).toList)
    assert(cents.length == cents.distinct.length, "duplicate centroids survived the clamp")
    assert(cents.length <= 3, s"effective nCells should clamp to the distinct sample, got ${cents.length}")
    assert(assigned.count() == 3L)
  }

  test("embedding near-dup LSH finds a usable fraction of true pairs, all above threshold") {
    val exact = graft.operators.Dedup
      .embeddingNearDups(spark, sfDir, 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    val lsh = Similarity.embeddingNearDupLsh(spark, sfDir, 0.4).collect()
    lsh.foreach(r => assert(r.getDouble(2) >= 0.4))
    val pairs = lsh.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(exact), "LSH must never report a below-threshold pair")
    if (exact.nonEmpty) {
      val recall = pairs.size.toDouble / exact.size
      assert(recall >= 0.3, s"near-dup LSH recall degraded to $recall (found ${pairs.size}/${exact.size})")
    }
  }

  test("semantic near-dups: zero false positives vs exact cosine, deterministic across runs") {
    import graft.operators.Dedup
    val sem = Similarity.semanticNearDups(spark, sfDir, threshold = 0.4).collect()
    val exact = Dedup.embeddingNearDups(spark, sfDir, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // cell blocking only ever REMOVES pairs; the exact rescoring means
    // everything that survives is a true >=-threshold pair
    sem.foreach { r =>
      assert(exact.contains((r.getLong(0), r.getLong(1))), s"false positive pair (${r.getLong(0)},${r.getLong(1)})")
      assert(r.getDouble(2) >= 0.4)
    }
    // fixed seed + hash-mod sample -> same cells, same pairs, every run
    val again = Similarity.semanticNearDups(spark, sfDir, threshold = 0.4).collect()
    assert(sem.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      again.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("incremental semantic probe == fixed-quantizer from-scratch, newcomer marks the batch doc") {
    import org.apache.spark.sql.functions._
    import graft.operators.Dedup
    val e      = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val corpus = e.filter(col("vec_id") % 10 =!= 0)
    val batch  = e.filter(col("vec_id") % 10 === 0)
    Similarity.buildSemanticIndex(corpus, "spec_sem_idx")
    val inc = Similarity.incrementalSemantic(spark, "spec_sem_idx", batch).collect()
    // every pair touches the batch, and newcomer is a batch member
    inc.foreach { r =>
      val (a, b, newcomer) = (r.getLong(0), r.getLong(1), r.getLong(3))
      assert(a % 10 == 0 || b % 10 == 0)
      assert(newcomer % 10 == 0, s"newcomer $newcomer is a corpus doc — admission would reject an accepted doc")
      assert(newcomer == a || newcomer == b)
    }
    // equality with assigning everything under the index's frozen centroids
    val centDf   = spark.table("spec_sem_idx_centroids")
    val assigned = Similarity.assignCells(e, centDf, nAssign = 2)
    val ref = Dedup
      .bucketPairs(assigned.select(col("cell"), col("vec_id")), Seq("cell"), col("vec_id"), Int.MaxValue)
      .distinct()
      .join(e.select(col("vec_id").as("a"), col("embedding").as("ea")), "a")
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")), "b")
      .filter(expr("cosine_sim(ea, eb)") >= 0.4)
      .filter(col("a") % 10 === 0 || col("b") % 10 === 0)
      .select("a", "b")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    assert(inc.map(r => (r.getLong(0), r.getLong(1))).toSet == ref)
  }

  test("ANN LSH returns valid ranked candidates with real cosine scores") {
    val brute = Similarity
      .bruteForceTopK(spark, sfDir, k = 5)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val ann = Similarity.annLshTopK(spark, sfDir, k = 5).collect()
    assert(ann.nonEmpty)
    // every ANN hit's score must equal the exact cosine (same expression)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      brute.get(key).foreach(exact => assert(math.abs(exact - r.getDouble(3)) < 1e-9))
    }
    // recall@5 against brute force (deterministic hashes → stable value;
    // 16 hyperplanes over 64-dim near-orthogonal vectors is a coarse
    // quantization, so the bound is intentionally loose)
    val bruteSets = brute.keys.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val annSets   = ann.map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recalls = bruteSets.map { case (q, exp) =>
      annSets.getOrElse(q, Set.empty).intersect(exp).size.toDouble / exp.size
    }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.15, s"ANN mean recall@5 degraded to $meanRecall")
  }

  test("knn label-noise shortlist flags the planted mislabel and spares clean clusters") {
    import SparkSpec.spark.implicits._
    // two tight clusters on orthogonal axes, per-id jitter kills ties;
    // id 4 sits in cluster A but carries cluster B's label
    def vec(axis: Int, id: Long): Array[Float] = {
      val v = new Array[Float](4)
      v(axis) = 1f
      v(3) = 0.001f * id
      v
    }
    val rows = (1L to 5L).map(i => (i, vec(0, i), if (i == 4L) 1 else 0)) ++
      (6L to 10L).map(i => (i, vec(1, i), 1))
    val e = rows.toDF("vec_id", "embedding", "label")
    val flagged = graft.operators.Similarity
      .knnLabelDisagreementOn(e, k = 3, queryFilter = "vec_id >= 0")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(flagged.toSeq == Seq((4L, 1, 0)), s"only the planted mislabel may be flagged, got ${flagged.toSeq}")
  }

  test("centroid classifier == pure-Scala model twin; accuracy well above chance; partition-invariant") {
    import org.apache.spark.sql.functions._
    val e = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"), col("label"))
    val got = graft.operators.Similarity
      .centroidPredictions(e)
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
      .toMap
    // independent model: same bounded sample rule, plain collections
    val all = e.collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    // xxhash64 isn't replicated in plain Scala; the sample rule only
    // needs the SAME selection both sides, so Spark picks the ids
    val sampleIds = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("label").orderBy(pmod(xxhash64(col("vec_id")), lit(1000003L)), col("vec_id"))
      e.withColumn("rk", row_number().over(w)).filter(col("rk") <= 256).select("vec_id").collect().map(_.getLong(0)).toSet
    }
    val cents = all
      .filter(v => sampleIds.contains(v._1))
      .groupBy(_._3)
      .toSeq
      .sortBy(_._1)
      .map { case (l, vs) =>
        val sorted = vs.sortBy(_._1)
        val dim    = sorted.head._2.length
        val acc    = new Array[Double](dim)
        sorted.foreach { case (_, vec, _) => var i = 0; while (i < dim) { acc(i) += vec(i); i += 1 } }
        l -> acc.map(_ / sorted.length)
      }
    val want = all.map { case (id, vec, label) =>
      val pred = cents
        .map { case (l, c) =>
          var d2 = 0.0; var i = 0
          while (i < vec.length) { val d = vec(i).toDouble - c(i); d2 += d * d; i += 1 }
          (d2, l)
        }
        .min
        ._2
      id -> (label, pred)
    }.toMap
    assert(got == want, "Spark predictions must equal the model twin bit-for-bit")
    val acc = got.values.count { case (l, p) => l == p }.toDouble / got.size
    val nLabels = all.map(_._3).distinct.length
    assert(acc > 2.0 / nLabels, s"accuracy $acc not above 2x chance for $nLabels labels")
    val again = graft.operators.Similarity
      .centroidPredictions(e.repartition(7))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2)))
      .toMap
    assert(again == got, "partitioning must not change driver-fit centroids or predictions")
  }

  test("centroid fit refuses a high-cardinality label column loudly instead of collecting it") {
    import org.apache.spark.sql.functions._
    // every row its own label: the per-label cap no longer bounds the
    // driver collect, so the fit-budget guard must throw
    val e = Tables
      .embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("vec_id").cast("int").as("label"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Similarity.centroidPredictions(e, samplePerLabel = 4, maxFitRows = 64).collect()
    }
    assert(ex.getMessage.contains("exceeds"), s"guard must name the budget, got: ${ex.getMessage}")
  }

  test("clusterTopTerms: every doc in exactly one summarized cell, deterministic across runs") {
    val s1 = graft.operators.Similarity.clusterTopTerms(spark, sfDir).collect()
    assert(s1.nonEmpty && s1.length <= 16)
    assert(s1.map(_.getLong(1)).sum == 500L, "n_docs must partition the corpus")
    assert(s1.map(_.getInt(0)).distinct.length == s1.length, "one summary per cell")
    assert(s1.forall(_.getDouble(3) >= 0.0), "tfidf is non-negative by construction (dfc <= nCells)")
    val s2 = graft.operators.Similarity.clusterTopTerms(spark, sfDir).collect()
    assert(s1.map(_.toString).toSeq == s2.map(_.toString).toSeq, "summaries must replay bit-identically")
  }

  test("mmrRerank == pure-Scala greedy model; rank 1 is the relevance top-1; refusals") {
    import SparkSpec.spark.implicits._
    def cosD(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) { val x = a(i).toDouble; val y = b(i).toDouble; dot += x * y; na += x * x; nb += y * y; i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val vecs = Tables
      .embeddings(spark, sfDir)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])]
      .collect()
      .toMap
    val model = vecs.keys.filter(_ % 100 == 0).toSeq.sorted.flatMap { qid =>
      val rels = vecs.collect { case (c, e) if c != qid => (c, cosD(vecs(qid), e)) }.toSeq
      val shortlist = rels.sortBy { case (c, r) => (-r, c) }.take(20)
      var selected  = List.empty[(Long, Double)]
      var remaining = shortlist
      for (_ <- 1 to 5) {
        val scored =
          if (selected.isEmpty) remaining.map { case (c, r) => (c, r) }
          else
            remaining.map { case (c, r) =>
              (c, r - selected.map(s => cosD(vecs(c), vecs(s._1))).max)
            }
        val pick = scored.minBy { case (c, s) => (-s, c) }
        selected = selected :+ pick
        remaining = remaining.filterNot(_._1 == pick._1)
      }
      selected.zipWithIndex.map { case ((c, s), i) => (qid, i + 1L, c, s) }
    }
    val got = graft.operators.Similarity
      .mmrRerank(spark, sfDir)
      .as[(Long, Long, Long, Double)]
      .collect()
      .toSeq
    assert(got == model, s"first diff: ${got.zip(model).find { case (a, b) => a != b }}")
    // rank 1 == plain relevance top-1
    val top1 = graft.operators.Similarity
      .bruteForceTopK(spark, sfDir, k = 1)
      .select("qid", "cand")
      .as[(Long, Long)]
      .collect()
      .toMap
    got.filter(_._2 == 1L).foreach { case (qid, _, cand, _) => assert(top1(qid) == cand) }
    intercept[IllegalArgumentException](graft.operators.Similarity.mmrRerank(spark, sfDir, n = 3, k = 5))
  }
}
