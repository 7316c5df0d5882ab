package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed supervised text classification — the trained-classifier
  * tier of a curation pipeline (reference scope: the wc/ii token
  * pipeline, main.go:94-118, generalized to supervised counting).
  *
  * Real 100 TB pipelines gate documents with a *trained* classifier
  * (quality / language / topicality) rather than only the heuristic
  * votes in [[TextAnalysis.languageId]]. Multinomial Naive Bayes is
  * the canonical such model that trains in ONE distributed counting
  * pass — the training job IS a word count grouped by label, so it
  * inherits the same partial-aggregation shape as wc, and the learned
  * model is a (label, token, count) relation that stays a DataFrame
  * end to end (never driver-side).
  *
  * Scale notes (100 TB):
  *   - train: explode + hash-aggregate with map-side partials; one
  *     shuffle on (label, token). Identical shape to `wc_wordcount`.
  *   - classify: the corpus joins the model ON TOKEN (shuffle
  *     equi-join; AQE broadcasts when the model is small). The
  *     per-class fan-out is |classes| (bounded, broadcast), and the
  *     only window is partitioned per document. No global window, no
  *     driver-side vocabulary.
  *   - unseen tokens: handled WITHOUT densifying (doc × vocab) —
  *     a matched-count subtraction folds every unmatched token into
  *     one closed-form Laplace term per (doc, class).
  *   - fit/score are split ([[nbFit]]/[[nbScore]]) so a standing model
  *     scores both batch corpora and micro-batches of a stream
  *     ([[graft.streaming.EventStreams]]-style foreachBatch) without
  *     refitting.
  */
object Classify {

  /** Fitted model: per-(class, token) smoothed log-likelihood relation
    * plus the tiny class relation (priors, token mass, vocab size).
    * Both are DataFrames — cache() them for repeated scoring.
    */
  final case class NbModel(modelScored: DataFrame, classes: DataFrame)

  /** Per-(doc, label, token) counts — training's unit of work. */
  private def docTokenCounts(docs: DataFrame): DataFrame =
    TextJobs
      .tokenized(docs.select("doc_id", "lang", "text"), "text", "tok")
      .groupBy("doc_id", "lang", "tok")
      .agg(count(lit(1)).as("cnt"))

  /** Deterministic leakage-safe split: doc_id % 5 == 0 is held out. */
  private[graft] def trainDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") % 5 =!= 0)
  private[graft] def evalDocs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).filter(col("doc_id") % 5 === 0)

  /** Learned multinomial model: token counts per class over the train
    * split. Pure integer counting — exact at any scale.
    */
  def nbTrainModel(spark: SparkSession, dir: String): DataFrame =
    docTokenCounts(trainDocs(spark, dir))
      .groupBy(col("lang"), col("tok"))
      .agg(sum("cnt").as("cnt"))
      .orderBy("lang", "tok")

  /** Fit the Laplace-smoothed multinomial NB from labeled docs
    * (`doc_id`, `lang`, `text`).
    */
  def nbFit(train: DataFrame): NbModel = {
    // lazily checkpointed: mass, vocab size and the scored-model
    // projection all consume this relation — without the checkpoint
    // each re-expands the tokenize+count subtree and the corpus is
    // re-scanned per consumer (AQE stage reuse collapses some but not
    // all; plan-evidence spec pins the executed scan count)
    val model = docTokenCounts(train)
      .groupBy(col("lang").as("c"), col("tok"))
      .agg(sum("cnt").as("mc"))
      .localCheckpoint(eager = false)

    // class relation: priors from doc counts, token mass from the
    // model; a class whose train docs are all empty still exists with
    // n_c = 0. All of this is a handful of rows — broadcast.
    val priors = train.groupBy(col("lang").as("c")).agg(count(lit(1)).as("d_c"))
    val mass   = model.groupBy("c").agg(sum("mc").as("n_c"))
    // 1-row scalar aggregates enter via crossJoin (repo convention);
    // d re-aggregates the tiny priors relation — never a second
    // corpus scan
    val globals = model
      .agg(countDistinct("tok").as("v"))
      .crossJoin(priors.agg(sum("d_c").as("d")))
    val classes = priors
      .join(mass, Seq("c"), "left")
      .na.fill(0L, Seq("n_c"))
      .crossJoin(globals)

    // per-token class contribution, precomputed on the model side so
    // the big corpus-side join carries one double per matched row
    val modelScored = model
      .join(broadcast(classes.select("c", "n_c", "v")), "c")
      .select(
        col("tok"),
        col("c"),
        log((col("mc") + lit(1.0)) / (col("n_c") + col("v"))).as("ltp")
      )
    NbModel(modelScored, classes)
  }

  /** Score labeled docs (`doc_id`, `lang`, `text`) against a fitted
    * model and pick each doc's argmax class.
    *
    * score(d, c) = ln(D_c / D)
    *             + Σ_{t ∈ d ∩ model_c} n_{d,t} · ln((C_{t,c}+1)/(N_c+V))
    *             + (T_d − matched_d,c) · ln(1/(N_c+V))
    *
    * Ties break on label ascending (deterministic). Scores are rounded
    * to 4 decimals per the repo-wide double convention. Scoring is
    * per-doc independent, so it is micro-batch-invariant — a stream
    * scored batch by batch equals the batch classification.
    */
  def nbScore(m: NbModel, docs: DataFrame): DataFrame = {
    // two consumers (totals + matched): checkpoint so the scored docs
    // tokenize exactly once
    val evalToks = docTokenCounts(docs).localCheckpoint(eager = false)
    val docTotals = docs
      .select(col("doc_id"), col("lang").as("true_lang"))
      .join(
        evalToks.groupBy("doc_id").agg(sum("cnt").as("t_d")),
        Seq("doc_id"),
        "left"
      )
      .na.fill(0L, Seq("t_d"))

    val matched = evalToks
      .join(m.modelScored, "tok")
      .groupBy("doc_id", "c")
      .agg(sum(col("cnt") * col("ltp")).as("msum"), sum("cnt").as("mcnt"))

    val scored = docTotals
      .crossJoin(broadcast(m.classes))
      .join(matched, Seq("doc_id", "c"), "left")
      .na.fill(0L, Seq("mcnt"))
      .na.fill(0.0, Seq("msum"))
      .withColumn(
        "score",
        log(col("d_c").cast("double") / col("d")) +
          col("msum") +
          (col("t_d") - col("mcnt")) * log(lit(1.0) / (col("n_c") + col("v")))
      )

    scored
      .withColumn("rn", row_number().over(Window.partitionBy("doc_id").orderBy(col("score").desc, col("c"))))
      .filter(col("rn") === 1)
      .select(
        col("doc_id"),
        col("true_lang"),
        col("c").as("pred_lang"),
        round(col("score"), 4).as("logp")
      )
  }

  /** Classify the held-out split with the model fitted on the train
    * split — the batch form.
    */
  def nbClassify(spark: SparkSession, dir: String): DataFrame =
    nbScore(nbFit(trainDocs(spark, dir)), evalDocs(spark, dir)).orderBy("doc_id")

  /** k-fold cross-validation accuracy: train on doc_id % folds ≠ k,
    * score fold k, for every k — the standard leakage-safe estimate of
    * classifier quality, emitted as PURE INTEGER (fold, n_correct,
    * n_total) counts. Each fold is an independent fit+score plan
    * (k scans of the corpus — the honest cost of k-fold CV; folds
    * share nothing by construction).
    */
  def nbCrossValidate(spark: SparkSession, dir: String, folds: Int = 5): DataFrame = {
    require(folds >= 2, s"cross-validation needs >= 2 folds, got $folds")
    val docs = Tables.documents(spark, dir)
    (0 until folds)
      .map { k =>
        val train = docs.filter(col("doc_id") % folds =!= k)
        val test  = docs.filter(col("doc_id") % folds === k)
        nbScore(nbFit(train), test)
          .select(
            lit(k.toLong).as("fold"),
            (col("pred_lang") === col("true_lang")).cast("long").as("ok")
          )
      }
      .reduce(_ unionByName _)
      .groupBy("fold")
      .agg(sum("ok").as("n_correct"), count(lit(1)).as("n_total"))
      .orderBy("fold")
  }

  /** Top-k discriminative tokens per class by smoothed log-odds vs the
    * complement class — NB's interpretability artifact ("why is this
    * the 'de' model"). The odds ratio
    * ((C_tc+1)/(N_c+V)) / ((C_t¬c+1)/(N_¬c+V)) is ranked as an EXACT
    * long num/den pair (cross-multiplied), ordered by the int/int
    * double quotient with token tiebreak — the Theil-Sen exact-rational
    * ranking convention. Products stay far under 2⁶³ until corpus
    * token mass approaches ~3×10⁹ per class; beyond that move the pair
    * to DECIMAL (documented, like aucExact).
    */
  def nbTopFeatures(spark: SparkSession, dir: String, topK: Int = 10): DataFrame = {
    val model = docTokenCounts(trainDocs(spark, dir))
      .groupBy(col("lang").as("c"), col("tok"))
      .agg(sum("cnt").as("mc"))
    val mass = model.groupBy("c").agg(sum("mc").as("n_c"))
    val v    = model.agg(countDistinct("tok").as("v"))
    val nt   = model.agg(sum("mc").as("nt"))
    val tc   = model.groupBy("tok").agg(sum("mc").as("tc"))
    val f = model
      .join(tc, "tok")
      .join(broadcast(mass), "c")
      .crossJoin(broadcast(v))
      .crossJoin(broadcast(nt))
      .select(
        col("c").as("lang"),
        col("tok"),
        ((col("mc") + 1L) * ((col("nt") - col("n_c")) + col("v"))).as("odds_num"),
        (((col("tc") - col("mc")) + 1L) * (col("n_c") + col("v"))).as("odds_den")
      )
    f.withColumn(
      "rnk",
      row_number()
        .over(
          Window
            .partitionBy("lang")
            .orderBy((col("odds_num").cast("double") / col("odds_den")).desc, col("tok"))
        )
        .cast("long")
    ).filter(col("rnk") <= topK)
      .orderBy("lang", "rnk")
  }

  /** Confusion matrix of [[nbClassify]] on the held-out split — the
    * classifier's evaluation artifact, pure integer counts (robust at
    * any scale; the per-doc scores in nbClassify carry the rounded
    * doubles).
    */
  def nbConfusion(spark: SparkSession, dir: String): DataFrame =
    nbClassify(spark, dir)
      .groupBy("true_lang", "pred_lang")
      .agg(count(lit(1)).as("n"))
      .orderBy("true_lang", "pred_lang")
}
