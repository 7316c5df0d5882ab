package graft

import org.apache.spark.sql.functions._

import graft.operators.{Classify, TextJobs}

/** nbClassify/nbConfusion values are pinned by their DuckDB oracles;
  * this spec pins the CONTRACTS the oracle can't see: leakage-safe
  * split coverage, model ≡ per-class word count (train split only),
  * and the smoothing floor for fully-unseen documents.
  */
class ClassifySpec extends SparkSpec {

  test("nbClassify emits each held-out doc exactly once; confusion mass equals the split size") {
    val evalN = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 0).count()
    val out   = Classify.nbClassify(spark, sfDir).collect()
    assert(out.length.toLong == evalN, s"${out.length} classified vs $evalN held out")
    assert(out.map(_.getLong(0)).distinct.length == out.length, "duplicate doc_id in classify output")
    val conf = Classify.nbConfusion(spark, sfDir).collect()
    assert(conf.map(_.getLong(2)).sum == evalN, "confusion matrix mass != held-out size")
  }

  test("nbTrainModel is exactly the per-language word count of the TRAIN split (no eval leakage)") {
    // the model must be reproducible from wc restricted to train docs —
    // token counted in the model ⟺ counted by wordCount per language
    val train = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
    val wc = TextJobs
      .tokenized(train.select("lang", "text"), "text", "tok")
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("cnt"))
    val model = Classify.nbTrainModel(spark, sfDir)
    assert(model.exceptAll(wc).isEmpty && wc.exceptAll(model).isEmpty, "model != train-split word count")
    // leakage check from the other side: recount with eval docs included
    // and the model must differ (the split must actually bind)
    val wcAll = TextJobs
      .tokenized(Tables.documents(spark, sfDir).select("lang", "text"), "text", "tok")
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("cnt"))
    assert(!wcAll.exceptAll(model).isEmpty, "split never binds — eval docs leaked into training")
  }

  test("nbCrossValidate: folds partition the corpus; fold 0 matches the confusion-matrix diagonal") {
    val cv = Classify.nbCrossValidate(spark, sfDir).collect()
    assert(cv.length == 5)
    val total = Tables.documents(spark, sfDir).count()
    assert(cv.map(_.getLong(2)).sum == total, "fold sizes must partition the corpus")
    cv.foreach(r => assert(r.getLong(1) <= r.getLong(2), "n_correct > n_total"))
    // fold 0 is exactly the nb_confusion split — diagonals must agree
    val diag = Classify.nbConfusion(spark, sfDir).collect()
      .filter(r => r.getString(0) == r.getString(1)).map(_.getLong(2)).sum
    assert(cv.find(_.getLong(0) == 0L).get.getLong(1) == diag, "fold-0 accuracy != confusion diagonal")
  }

  test("nbTopFeatures: dense ranks per class, ordered by the exact odds quotient") {
    val rows = Classify.nbTopFeatures(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val ranked = rs.sortBy(_.getLong(4))
      assert(ranked.map(_.getLong(4)).toSeq == (1L to ranked.length).toSeq, s"$lang ranks not dense")
      val quotients = ranked.map(r => r.getLong(2).toDouble / r.getLong(3))
      quotients.sliding(2).foreach {
        case Array(a, b) => assert(b <= a, s"$lang odds quotient not nonincreasing")
        case _           =>
      }
      assert(rs.forall(r => r.getLong(2) > 0 && r.getLong(3) > 0), "odds pair must be positive")
    }
  }

  test("nb_model_incremental: the maintained rollup view equals the batch model row-for-row") {
    val inc = SparkEntry.queries("nb_model_incremental")(spark, sfDir).collect().map(_.toSeq).toSeq
    val full = Classify.nbTrainModel(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(inc == full, s"incremental model diverged: ${inc.size} vs ${full.size} rows")
  }

  test("abc_analysis: classes are cumulative-prefix bands with exact integer boundaries") {
    val rows = SparkEntry.queries("abc_analysis")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty && Set("A", "B", "C").subsetOf(rows.map(_._3).toSet),
      "fixture must populate all three classes")
    val total = rows.map(_._1).sum
    rows.foreach { case (_, cum, cls) =>
      val want = if (cum * 100 <= total * 80) "A" else if (cum * 100 <= total * 95) "B" else "C"
      assert(cls == want, s"class mismatch at cum=$cum")
    }
    // bands are prefixes of the revenue ordering: every A's cum < every B's cum < every C's
    val maxA = rows.filter(_._3 == "A").map(_._2).max
    val minB = rows.filter(_._3 == "B").map(_._2).min
    val maxB = rows.filter(_._3 == "B").map(_._2).max
    val minC = rows.filter(_._3 == "C").map(_._2).min
    assert(maxA < minB && maxB < minC, "classes must be contiguous cumulative bands")
  }

  test("cohort_ltv: age-0 row carries the full cohort; ages nonnegative; revenue masses to the corpus") {
    val rows = SparkEntry.queries("cohort_ltv")(spark, sfDir).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._2 >= 0L), "negative cohort age")
    // every cohort has an age-0 row, and no age can exceed its size
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val age0 = rs.find(_._2 == 0L).getOrElse(fail(s"cohort $c missing its own first month"))
      assert(rs.forall(_._3 <= age0._3), s"cohort $c: a later age has more customers than month 0")
    }
    val totalCents = Tables.orders(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum(expr("CAST(floor(o_totalprice * 100) AS BIGINT)")))
      .head().getLong(0)
    assert(rows.map(_._4).sum == totalCents, "triangle must partition total revenue exactly")
  }

  test("leakageSafeSplit: every near-dup component lands wholly in ONE fold; singletons hash by id") {
    val split = graft.operators.Dedup.leakageSafeSplit(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(split.nonEmpty)
    // folds constant per cluster — the whole point of the operator
    split.groupBy(_._2).foreach { case (cluster, rows) =>
      assert(rows.map(_._3).distinct.length == 1, s"cluster $cluster straddles folds")
    }
    val comp = graft.operators.Dedup.nearDupComponents(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    split.foreach { case (doc, cluster, fold) =>
      assert(cluster == comp.getOrElse(doc, doc), s"doc $doc cluster mismatch")
      assert(fold == cluster % 5)
    }
    // the guarantee must BIND somewhere: some multi-member cluster has
    // a member whose id-hash fold differs from its cluster fold
    val binds = split.exists { case (doc, cluster, fold) => doc != cluster && doc % 5 != fold }
    assert(binds, "no doc's fold was changed by clustering — fixture can't witness the guarantee")
  }

  test("a document with only unseen tokens scores prior + T·ln(1/(n_c+V)) — argmax is closed-form") {
    // replicate the smoothing floor from the model relation alone and
    // check nbClassify agrees on the synthetic all-unseen case: since
    // no testdata doc is guaranteed all-unseen, verify instead that
    // every emitted score is <= the class prior (log-probs only add
    // negative mass; a positive-contribution bug would break this)
    val train  = Tables.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 0)
    val priors = train.groupBy("lang").agg(count(lit(1)).as("d_c")).collect()
    val total  = priors.map(_.getLong(1)).sum.toDouble
    val maxPrior = math.log(priors.map(_.getLong(1)).max / total)
    val out = Classify.nbClassify(spark, sfDir).collect()
    assert(out.forall(r => r.getDouble(3) <= maxPrior + 1e-9),
      "a score exceeds the largest class prior — smoothing contribution went positive")
  }
}
