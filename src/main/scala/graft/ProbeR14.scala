package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-14 scale probes (transient dev main; numbers land in SCALE.md):
  *
  *   substrings <sf10Dir>            — text_dedup_substrings at 100×: growth
  *                                     law of the from-scratch pass (the #2
  *                                     sf1 cost) + the standing-gram-index
  *                                     probe-vs-rebuild split
  *   setsim <sf0.1Dir> <copies> <dupBp> — prefix-filtered set-similarity join
  *                                     over a copy-local-token corpus with
  *                                     PLANTED near-dup mass (dupBp basis
  *                                     points of docs get a one-token-off
  *                                     twin): candidate/verified counts and
  *                                     wall vs planted rate — the
  *                                     output-proportionality evidence the
  *                                     scan-side-only caveat lacked
  *   rebucket <sf10Dir>              — the standing bucketed graph's
  *                                     lifecycle cost: data-sized prepare,
  *                                     iterate, P→2P rebucketTo of both
  *                                     tables, iterate again
  */
object ProbeR14 {

  def main(args: Array[String]): Unit = {
    System.setProperty("graft.oracle.dump", "off")
    val mode = args(0)
    val dir  = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp   = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = GraftSession.builder(s"local[$cpus]", sp.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val probe = new TaskMetricsProbe
    spark.sparkContext.addSparkListener(probe)

    def residue(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    def timed[T](label: String)(f: => T): T = {
      org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
      probe.snapshotAndReset()
      val t0 = System.nanoTime()
      val r  = f
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
      val (ms, ds, pk) = probe.snapshotAndReset()
      println(
        f"PROBE $label dt=$dt%.2f spill_mem=$ms spill_disk=$ds peak_task_mem=${pk / 1024 / 1024}MB"
      )
      r
    }
    def time(label: String, reps: Int = sys.env.getOrElse("PROBE_REPS", "3").toInt)(f: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        timed(label)(f)
        val dt = (System.nanoTime() - t0) / 1e9
        residue()
        dt
      }
      println(f"PROBE $label median=${ts.sorted.apply(ts.size / 2)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit = df.write.format("noop").mode("overwrite").save()

    mode match {
      case "substrings" =>
        // growth-law probe: from-scratch substring dedup over the full
        // corpus at this scale (sf10 documents = 100x), then the
        // standing-index split — gram index built over a 99% standing
        // corpus (the amortized write), incremental probe over the 1%
        // arriving batch (the per-ingest cost)
        val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        println(s"PROBE substrings corpus_docs=${docs.count()}")
        time("substrings_fromscratch")(noop(operators.TextAnalysis.dedupSubstringsDf(docs)))
        val standing = docs.filter(col("doc_id") % 100 =!= 0)
        val batch    = docs.filter(col("doc_id") % 100 === 0)
        time("substrings_index_build", reps = 1)(
          operators.TextAnalysis.buildGramIndex(standing, "probe_sub_idx")
        )
        time("substrings_incremental_probe")(
          noop(operators.TextAnalysis.incrementalDedupSubstrings(spark, "probe_sub_idx", batch))
        )

      case "setsim" =>
        // corpus: `copies` key-shifted copies of the sf0.1 documents
        // with COPY-LOCAL tokens (every token prefixed by a letters-only
        // copy tag, so cross-copy Jaccard is exactly 0 and the corpus
        // has no accidental duplicate mass), plus a PLANTED twin (one
        // extra token => Jaccard = n/(n+1) >= 0.5) for dupBp basis
        // points of the docs. Candidate count, verified-pair count and
        // wall are then functions of the planted rate — the
        // output-proportionality measurement.
        val copies = args(2).toInt
        val dupBp  = args(3).toInt // planted twins per 10 000 docs
        val base   = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        val tagged = base
          .crossJoin(spark.range(copies).select(col("id").as("copy")))
          .select(
            (col("doc_id") + col("copy") * 5000L).as("doc_id"),
            concat_ws(
              " ",
              transform(
                split(col("text"), "[^\\p{L}]+"),
                t =>
                  concat(
                    lit("q"),
                    translate(col("copy").cast("string"), "0123456789", "abcdefghij"),
                    t
                  )
              )
            ).as("text")
          )
        val corpus =
          if (dupBp == 0) tagged
          else
            tagged.unionByName(
              tagged
                .filter(pmod(col("doc_id"), lit(10000L / dupBp)) === 0)
                .select((col("doc_id") + 100000000L).as("doc_id"), concat(col("text"), lit(" qzzzzq")).as("text"))
            )
        val frozen = corpus.localCheckpoint() // untimed corpus construction
        println(s"PROBE setsim copies=$copies dup_bp=$dupBp corpus_docs=${frozen.count()}")
        val elements = frozen.select(
          col("doc_id").as("id"),
          explode(expr("filter(split(text, '[^\\\\p{L}]+'), t -> t <> '')")).as("tok")
        )
        val (_, cand) = operators.Dedup.setSimCandidates(elements, 0.5)
        timed("setsim_candidates")(println(s"PROBE setsim candidate_pairs=${cand.count()}"))
        residue()
        time("setsim_join", reps = 2) {
          val out = operators.Dedup.setSimJoinOnSets(elements, 0.5)
          println(s"PROBE setsim verified_pairs=${out.count()}")
        }

      case "rebucket" =>
        // lifecycle cost of the data-sized standing bucketed graph:
        // what does outgrowing the per-bucket target actually cost?
        val edges = operators.Graph.partSupplierEdges(spark, dir)
        timed("rebucket_prepare")(operators.Graph.pageRankBucketedPrepare(edges))
        val p = graft.sources.Bucketing.recordedBuckets(spark, "pr_edges_bkt")
        println(s"PROBE rebucket data_sized_buckets=$p")
        residue()
        time("rebucket_iterate_P")(noop(operators.Graph.pageRankBucketedIterate(spark)))
        timed("rebucket_edges_P_to_2P")(
          graft.sources.Bucketing.rebucketTo(spark, "pr_edges_bkt", 2 * p, Seq("src"))
        )
        timed("rebucket_mass_P_to_2P")(
          graft.sources.Bucketing.rebucketTo(spark, "pr_mass_bkt", 2 * p, Seq("node"))
        )
        residue()
        time("rebucket_iterate_2P")(noop(operators.Graph.pageRankBucketedIterate(spark)))

      case "ab_lpa" =>
        // in-JVM A/B: the two-exchange LPA round (old) vs the
        // repartition-by-node single-exchange round (new), alternating
        // reps so ambient drift hits both arms equally
        val edges = operators.Graph.partSupplierEdges(spark, dir)
        val dirE = edges
          .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
        val e = dirE
          .union(dirE.select(col("dst").as("src"), col("src").as("dst")))
          .distinct()
          .localCheckpoint(eager = true)
        def round(old: Boolean): DataFrame = {
          var lab = e.select(col("src").as("node")).distinct().withColumn("label", col("node"))
          for (_ <- 1 to 4) {
            val stream = e
              .alias("e")
              .join(lab.alias("l"), col("e.src") === col("l.node"))
              .select(col("e.dst").as("node"), col("l.label").as("label"))
            val counts =
              (if (old) stream else stream.repartition(col("node")))
                .groupBy("node", "label")
                .agg(count(lit(1)).as("cnt"))
            lab = counts
              .groupBy("node")
              .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
              .select(col("node"), (-col("m.nl")).as("label"))
              .localCheckpoint(eager = false)
          }
          lab
        }
        for (i <- 1 to 3) {
          timed(s"lpa_old_$i")(noop(round(old = true)))
          timed(s"lpa_new_$i")(noop(round(old = false)))
        }

      case "phases" =>
        // where does the time go INSIDE the slow iterative queries?
        // (optimization-round triage: prep passes vs per-iteration cost)
        val edges = operators.Graph.partSupplierEdges(spark, dir)
        time("pagerank_prep_only", reps = 2)(noop(operators.Graph.pageRank(edges, iterations = 0)))
        time("pagerank_iter5", reps = 2)(noop(operators.Graph.pageRank(edges, iterations = 5)))
        time("lpa_iter1", reps = 2)(noop(operators.Graph.labelPropagation(edges, iterations = 1)))
        time("lpa_iter4", reps = 2)(noop(operators.Graph.labelPropagation(edges, iterations = 4)))
        val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        val toks = "filter(split(text, '[^\\\\p{L}]+'), t -> t <> '')"
        val inst = docs
          .select(col("doc_id"), expr(toks).as("tk"))
          .filter(size(col("tk")) >= 3)
          .select(
            col("doc_id"),
            posexplode(
              expr("transform(sequence(1, size(tk) - 2), i -> concat_ws(' ', slice(tk, i, 3)))")
            ).as(Seq("__p", "g"))
          )
          .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"), col("g"))
        time("substr_gram_stream", reps = 2)(noop(inst))
        time("substr_hot_agg", reps = 2)(
          noop(
            inst
              .groupBy("g")
              .agg(countDistinct("doc_id").as("df_docs"), min("doc_id").as("canon"))
              .filter(col("df_docs") >= 3)
          )
        )
        time("substr_full", reps = 2)(noop(operators.TextAnalysis.dedupSubstrings(spark, dir)))
        time("snm_full", reps = 2)(noop(operators.Dedup.snmDocumentPairs(spark, dir)))

      case "ab_canon" =>
        // in-JVM A/B: generic canonicalization (distinct/symmetrize)
        // vs the assume-canonical fast path, alternating reps so
        // ambient drift hits both arms equally
        import spark.implicits._
        val edges = operators.Graph.partSupplierEdges(spark, dir)
        val seeds = Seq(2L, 4L, 6L, 8L, 10L).toDF("node")
        for (i <- 1 to 3) {
          timed(s"btw_generic_$i")(noop(operators.Graph.betweenness(edges, seeds)))
          residue()
          timed(s"btw_fast_$i")(noop(operators.Graph.betweenness(edges, seeds, assumeDistinct = true)))
          residue()
          timed(s"pr_generic_$i")(noop(operators.Graph.pageRank(edges, iterations = 5)))
          residue()
          timed(s"pr_fast_$i")(noop(operators.Graph.pageRank(edges, iterations = 5, assumeDistinct = true)))
          residue()
        }

      case "ab_phrase" =>
        // text_phrase_search read 1.23 s on the pre-dffbb1d tree and
        // 5.5-7.1 s after — the only candidate change is gramInstances'
        // doc-grain split (Project(transform) + Generate(posexplode(attr))
        // vs the old single Generate(posexplode(transform(...)))). A/B
        // the two inline shapes on the same corpus.
        import org.apache.spark.sql.expressions.Window
        val docs = graft.Tables.documents(spark, dir).select("doc_id", "text")
        val toksE = "filter(split(text, '[^\\\\p{L}]+'), t -> t != '')"
        def oldPhrase(): DataFrame = {
          val phrases = operators.TextAnalysis.defaultPhrases
          val norm = phrases.map { case (pid, p) => (pid, p.trim.split("\\s+").toSeq) }
          val hits = norm
            .groupBy(_._2.length)
            .toSeq
            .map { case (len, ps) =>
              import spark.implicits._
              val pdf = ps.map { case (pid, ts) => (pid, ts.mkString(" ")) }.toDF("phrase_id", "g")
              val inst = docs
                .select(col("doc_id"), expr(toksE).as("tk"))
                .filter(size(col("tk")) >= len)
                .select(
                  col("doc_id"),
                  posexplode(
                    expr(s"transform(sequence(1, size(tk) - ${len - 1}), i -> concat_ws(' ', slice(tk, i, $len)))")
                  ).as(Seq("__p", "g"))
                )
                .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"), col("g"))
              inst
                .where(col("g").isin(ps.map(_._2.mkString(" ")): _*))
                .join(broadcast(pdf), "g")
                .groupBy("phrase_id", "doc_id")
                .agg(count(lit(1)).as("n_hits"))
            }
            .reduce(_ unionByName _)
          val w = Window.partitionBy("phrase_id").orderBy(col("n_hits").desc, col("doc_id"))
          hits
            .withColumn("rnk", row_number().over(w).cast("long"))
            .filter(col("rnk") <= 10)
            .select("phrase_id", "rnk", "doc_id", "n_hits")
            .orderBy("phrase_id", "rnk")
        }
        for (i <- 1 to 3) {
          timed(s"phrase_old_$i")(noop(oldPhrase())); residue()
          timed(s"phrase_new_$i")(noop(operators.TextAnalysis.phraseSearch(spark, dir))); residue()
        }

      case "snm_phases" =>
        // split the SNM cost: ranked-relation build vs pair join+verify,
        // old (full-norm) vs new (projected) forms
        import org.apache.spark.sql.expressions.Window
        val dfD = graft.Tables.documents(spark, dir)
        def oldRanked(): DataFrame = {
          val n = dfD.select(col("doc_id").cast("long").as("id"), operators.Dedup.normalizedText("text").as("norm"))
          val keyed = n.select(
            col("id"), col("norm"),
            substring(col("norm"), 1, 24).as("sk"),
            substring(col("norm"), 1, 4).as("blk"))
          val inBlock = keyed.withColumn("rnb", row_number().over(Window.partitionBy("blk").orderBy("sk", "id")))
          val offsets = keyed.groupBy("blk").agg(count(lit(1)).as("cnt"))
            .withColumn("off", coalesce(sum("cnt").over(Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .select("blk", "off")
          inBlock.join(broadcast(offsets), "blk")
            .select(col("id"), col("norm"), (col("off") + col("rnb")).as("rn"))
        }
        def newRanked(): DataFrame = {
          val keyed = dfD.select(col("doc_id").cast("long").as("id"), operators.Dedup.normalizedText("text").as("norm"))
            .select(col("id"),
              substring(col("norm"), 1, 24).as("sk"),
              substring(col("norm"), 1, 4).as("blk"),
              substring(col("norm"), 1, 80).as("v"))
          val inBlock = keyed.withColumn("rnb", row_number().over(Window.partitionBy("blk").orderBy("sk", "id")))
          val offsets = keyed.groupBy("blk").agg(count(lit(1)).as("cnt"))
            .withColumn("off", coalesce(sum("cnt").over(Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
            .select("blk", "off")
          inBlock.join(broadcast(offsets), "blk")
            .select(col("id"), col("v"), (col("off") + col("rnb")).as("rn"))
        }
        def pairsFrom(ranked0: DataFrame, vcol: String): DataFrame = {
          val ranked = ranked0.localCheckpoint(eager = false)
          val probes = ranked.select(
            col("id").as("id_a"),
            substring(col(vcol), 1, 80).as("va"),
            explode(sequence(col("rn") + 1, col("rn") + 7)).as("rn"))
          probes
            .join(ranked.select(col("id").as("id_b"), substring(col(vcol), 1, 80).as("vb"), col("rn")), "rn")
            .withColumn("dist", levenshtein(col("va"), col("vb"), 8).cast("long"))
            .filter(col("dist") >= 0L)
            .select(least(col("id_a"), col("id_b")).as("id_a"), greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
            .orderBy("id_a", "id_b")
        }
        def pairsMerge(ranked0: DataFrame, vcol: String): DataFrame = {
          val ranked = ranked0.localCheckpoint(eager = false)
          val probes = ranked.select(
            col("id").as("id_a"),
            substring(col(vcol), 1, 80).as("va"),
            explode(sequence(col("rn") + 1, col("rn") + 7)).as("rn"))
          probes
            .join(ranked.select(col("id").as("id_b"), substring(col(vcol), 1, 80).as("vb"), col("rn")).hint("merge"), "rn")
            .withColumn("dist", levenshtein(col("va"), col("vb"), 8).cast("long"))
            .filter(col("dist") >= 0L)
            .select(least(col("id_a"), col("id_b")).as("id_a"), greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
            .orderBy("id_a", "id_b")
        }
        for (i <- 1 to 2) {
          timed(s"ranked_old_$i")(noop(oldRanked())); residue()
          timed(s"ranked_new_$i")(noop(newRanked())); residue()
          timed(s"full_old_$i")(noop(pairsFrom(oldRanked(), "norm"))); residue()
          timed(s"full_new_$i")(noop(pairsFrom(newRanked(), "v"))); residue()
          timed(s"full_new_merge_$i")(noop(pairsMerge(newRanked(), "v"))); residue()
        }

      case "snm_explain" =>
        val newPlan = operators.Dedup
          .snmDocumentPairs(spark, dir)
          .queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/snm_new_plan.txt"), newPlan)
        println("wrote /tmp/snm_new_plan.txt")

      case "ab_grain" =>
        // checkpoint-grain A/B for the two-consumer gram stream:
        // instance-grain (pre-dffbb1d) vs doc-grain arrays (current),
        // measured on duplicatedSpans (same two-consumer shape as the
        // substring dedup)
        import org.apache.spark.sql.expressions.Window
        val docsG  = graft.Tables.documents(spark, dir).select("doc_id", "text")
        val toksG  = "filter(split(text, '[^\\\\p{L}]+'), t -> t != '')"
        val kG     = 3
        def oldSpans(): DataFrame = {
          val inst = docsG
            .select(col("doc_id"), expr(toksG).as("tk"))
            .filter(size(col("tk")) >= kG)
            .select(
              col("doc_id"),
              posexplode(
                expr(s"transform(sequence(1, size(tk) - ${kG - 1}), i -> concat_ws(' ', slice(tk, i, $kG)))")
              ).as(Seq("__p", "g"))
            )
            .select(col("doc_id"), (col("__p") + 1).cast("long").as("pos"), col("g"))
            .localCheckpoint(eager = false)
          val hot = inst
            .groupBy("g")
            .agg(countDistinct("doc_id").as("df_docs"))
            .filter(col("df_docs") >= 3)
            .select("g")
          val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
          val per = inst
            .join(hot, Seq("g"), "left_semi")
            .withColumn("e", col("pos") + (kG - 1))
            .withColumn("prev_e", max(col("e")).over(w))
            .withColumn(
              "cov",
              greatest(lit(0L), col("e") - greatest(col("pos"), coalesce(col("prev_e"), lit(0L)) + 1) + 1)
            )
            .groupBy("doc_id")
            .agg(sum("cov").as("covered_tokens"))
          docsG
            .select(col("doc_id"), size(expr(toksG)).cast("long").as("n_tokens"))
            .join(per, Seq("doc_id"), "left")
            .select(
              col("doc_id"),
              col("n_tokens"),
              coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"),
              when(col("n_tokens") > 0, coalesce(col("covered_tokens"), lit(0L)) / col("n_tokens").cast("double"))
                .as("covered_ratio")
            )
            .orderBy("doc_id")
        }
        for (i <- 1 to 3) {
          timed(s"spans_old_$i")(noop(oldSpans())); residue()
          timed(s"spans_new_$i")(noop(operators.TextAnalysis.duplicatedSpansDf(docsG))); residue()
        }

      case "ab_b3" =>
        // in-JVM alternating A/B for the batch-3 rewrites (ambient
        // drift on this host makes cross-run minis useless): each OLD
        // arm is a faithful probe-local copy of the pre-rewrite
        // formulation over the same tables
        import org.apache.spark.sql.expressions.Window

        def oldBasketPairs(): DataFrame = {
          val baskets = graft.Tables
            .lineitem(spark, dir)
            .select(col("l_orderkey").as("okey"), col("l_partkey").as("item"))
            .distinct()
          val itemSup = baskets.groupBy("item").agg(count(lit(1)).as("s")).filter(col("s") >= 2L)
          val pruned = baskets
            .join(itemSup.select(col("item"), col("s").as("__s")), Seq("item"))
            .withColumn("__bk", row_number().over(Window.partitionBy("okey").orderBy(col("__s").desc, col("item"))))
            .filter(col("__bk") <= 256)
            .select("okey", "item")
          pruned
            .alias("x")
            .join(pruned.alias("y"), col("x.okey") === col("y.okey") && col("x.item") < col("y.item"))
            .groupBy(col("x.item").as("item_a"), col("y.item").as("item_b"))
            .agg(count(lit(1)).as("pair_support"))
            .filter(col("pair_support") >= 2L)
            .orderBy("item_a", "item_b")
        }

        def oldCoOrderKTruss(): DataFrame = {
          val li = graft.Tables
            .lineitem(spark, dir)
            .filter(col("l_orderkey") < 10000L)
            .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
            .distinct()
          val edges = li
            .as("x")
            .join(li.as("y"), col("x.o") === col("y.o") && col("x.p") < col("y.p"))
            .select(col("x.p").as("src"), col("y.p").as("dst"))
          operators.Graph.ktrussEdges(edges, k = 4, rounds = 3)
        }

        def oldSnm(): DataFrame = {
          val df = graft.Tables.documents(spark, dir)
          val (w, keyLen, blockLen, verifyLen, maxDist) = (8, 24, 4, 80, 8)
          val n = df.select(col("doc_id").cast("long").as("id"), operators.Dedup.normalizedText("text").as("norm"))
          val keyed = n.select(
            col("id"),
            col("norm"),
            substring(col("norm"), 1, keyLen).as("sk"),
            substring(col("norm"), 1, blockLen).as("blk")
          )
          val inBlock = keyed.withColumn("rnb", row_number().over(Window.partitionBy("blk").orderBy("sk", "id")))
          val offsets = keyed
            .groupBy("blk")
            .agg(count(lit(1)).as("cnt"))
            .withColumn(
              "off",
              coalesce(sum("cnt").over(Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            )
            .select("blk", "off")
          val ranked = inBlock
            .join(broadcast(offsets), "blk")
            .select(col("id"), col("norm"), (col("off") + col("rnb")).as("rn"))
            .localCheckpoint(eager = false)
          val probes = ranked.select(
            col("id").as("id_a"),
            substring(col("norm"), 1, verifyLen).as("va"),
            explode(sequence(col("rn") + 1, col("rn") + (w - 1))).as("rn")
          )
          probes
            .join(ranked.select(col("id").as("id_b"), substring(col("norm"), 1, verifyLen).as("vb"), col("rn")), "rn")
            .withColumn("dist", levenshtein(col("va"), col("vb"), maxDist).cast("long"))
            .filter(col("dist") >= 0L)
            .select(least(col("id_a"), col("id_b")).as("id_a"), greatest(col("id_a"), col("id_b")).as("id_b"), col("dist"))
            .orderBy("id_a", "id_b")
        }

        def oldNbClassify(): DataFrame = {
          val docs = graft.Tables.documents(spark, dir)
          def dtc(d: DataFrame) = operators.TextJobs
            .tokenized(d.select("doc_id", "lang", "text"), "text", "tok")
            .groupBy("doc_id", "lang", "tok")
            .agg(count(lit(1)).as("cnt"))
          val toks = dtc(docs).localCheckpoint(eager = false)
          val meta = docs.select("doc_id", "lang").localCheckpoint(eager = false)
          val m = operators.Classify.nbFitCounts(
            toks.filter(col("doc_id") % 5 =!= 0),
            meta.filter(col("doc_id") % 5 =!= 0)
          )
          val evalToks = toks.filter(col("doc_id") % 5 === 0).select("doc_id", "tok", "cnt")
          val evalMeta = meta.filter(col("doc_id") % 5 === 0).select(col("doc_id"), col("lang").as("true_lang"))
          val docTotals = evalMeta
            .join(evalToks.groupBy("doc_id").agg(sum("cnt").as("t_d")), Seq("doc_id"), "left")
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
            .withColumn(
              "rn",
              row_number().over(Window.partitionBy("doc_id").orderBy(round(col("score"), 6).desc, col("c")))
            )
            .filter(col("rn") === 1)
            .select(col("doc_id"), col("true_lang"), col("c").as("pred_lang"), round(col("score"), 4).as("logp"))
            .orderBy("doc_id")
        }

        for (i <- 1 to 3) {
          timed(s"basket_old_$i")(noop(oldBasketPairs())); residue()
          timed(s"basket_new_$i")(noop(operators.Relational.basketPairs(spark, dir))); residue()
          timed(s"ktruss_old_$i")(noop(oldCoOrderKTruss())); residue()
          timed(s"ktruss_new_$i")(noop(operators.Graph.coOrderKTruss(spark, dir))); residue()
          timed(s"snm_old_$i")(noop(oldSnm())); residue()
          timed(s"snm_new_$i")(noop(operators.Dedup.snmDocumentPairs(spark, dir))); residue()
          timed(s"nb_old_$i")(noop(oldNbClassify())); residue()
          timed(s"nb_new_$i")(noop(operators.Classify.nbClassify(spark, dir))); residue()
        }

      case "ab_rrf" =>
        // decompose retrieval_rrf_fusion: each probe alone vs the
        // fused query (is the extra cost planning, probing, or fusion?)
        val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
        operators.TextAnalysis.buildBm25Index(docs.filter(col("doc_id") % 10 =!= 0), "probe_rrf_idx")
        operators.TextAnalysis.appendBm25Index(docs.filter(col("doc_id") % 10 === 0), "probe_rrf_idx")
        for (i <- 1 to 3) {
          timed(s"bm25probe_$i")(noop(operators.TextAnalysis.bm25IndexProbe(spark, "probe_rrf_idx")))
          timed(s"qlprobe_$i")(noop(operators.TextAnalysis.qlIndexProbe(spark, "probe_rrf_idx")))
          timed(s"rrf_fused_$i")(
            noop(
              operators.TextAnalysis.rrfFusion(
                operators.TextAnalysis.bm25IndexProbe(spark, "probe_rrf_idx"),
                operators.TextAnalysis.qlIndexProbe(spark, "probe_rrf_idx")
              )
            )
          )
          residue()
        }

      case other =>
        sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
