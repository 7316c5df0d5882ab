package graft
import org.apache.spark.sql.SparkSession

/** Per-query task-metrics probe: accumulates spill bytes and the
  * largest single-task peak execution memory between resets. The
  * bench drains the listener bus (GraftBenchShims) around each
  * sample so async events can't leak across query windows. The
  * per-task peak is the 100×-readiness signal wall-time can't give:
  * a query whose tasks already spill (or whose biggest task's
  * execution memory nears the per-core budget) at 10× is the first
  * thing to break at 100×.
  */
private final class TaskMetricsProbe extends org.apache.spark.scheduler.SparkListener {
  private val memSpill  = new java.util.concurrent.atomic.AtomicLong(0L)
  private val diskSpill = new java.util.concurrent.atomic.AtomicLong(0L)
  private val peakTask  = new java.util.concurrent.atomic.AtomicLong(0L)
  override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) {
      memSpill.addAndGet(m.memoryBytesSpilled)
      diskSpill.addAndGet(m.diskBytesSpilled)
      peakTask.accumulateAndGet(m.peakExecutionMemory, Math.max(_: Long, _: Long))
    }
  }
  /** (memSpillBytes, diskSpillBytes, maxTaskPeakExecMemBytes), then zero. */
  def snapshotAndReset(): (Long, Long, Long) = {
    val r = (memSpill.get(), diskSpill.get(), peakTask.get())
    memSpill.set(0L); diskSpill.set(0L); peakTask.set(0L)
    r
  }
}
/** Benchmark main: runs the headline queries at SPARK_GRAFT_SF_DIR and
  * prints one JSON line. Each query is forced through a `noop` sink so
  * the full plan (all columns, all operators) executes — `.count()`
  * would let Catalyst prune the projections being measured. */
object Bench {

  /** Everything the sf1 (10×) trend track produces for the artifact:
    * per-query (sec, task metrics), failures, the fence's raw samples,
    * debut queries the fence could not arm on, and the iterate-only
    * timings of the standing-table queries.
    */
  private final case class Sf1Result(
      sf1Dir: String,
      ok: Seq[(String, (Double, (Long, Long, Long)))],
      bad: Seq[(String, String)],
      retried: Map[String, Seq[Double]],
      noHistory: Seq[String],
      iterate: Seq[(String, Double)]
  )

  /** The headline set is PINNED in `BENCH_MANIFEST.txt` (checked in,
    * one name per line) so every bench artifact states exactly which
    * query set its total covers — the JSON line carries the manifest's
    * sha-256 and a `shared_with_prev` subtotal against the previous
    * history entry, so round-over-round deltas never silently compare
    * different sets. The baked-in list below is only the fallback when
    * the manifest file is absent (e.g. running from a bare classpath).
    */
  def manifestQueries(): (Seq[String], String) = {
    val path = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_MANIFEST",
      java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_MANIFEST.txt").toString
    )
    val p = java.nio.file.Paths.get(path)
    val names =
      if (java.nio.file.Files.exists(p)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files
          .readAllLines(p)
          .asScala
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .toSeq
      } else headline
    val digest = java.security.MessageDigest
      .getInstance("SHA-256")
      .digest(names.sorted.mkString("\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (names, digest.map("%02x".format(_)).mkString)
  }

  /** Fallback headline subset; the manifest file supersedes this. */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
    "q6_forecast_revenue", "q10_returned_items",
    "q4_order_priority", "q11_important_stock", "q13_custdist",
    "q16_supplier_counts", "q17_small_qty_avg", "q20_part_promo",
    "window_top3_per_customer", "topk_agg_per_customer", "window_running_sum",
    "wc_wordcount", "ii_inverted_index",
    "dedup_exact_groups", "dedup_minhash_lsh", "dedup_simhash", "dedup_incremental_lsh",
    "dedup_incremental_substrings",
    "dedup_semantic", "dedup_incremental_semantic",
    "sim_topk_bruteforce", "sim_ann_lsh", "sim_ivf_topk", "sim_ivfpq_topk",
    "sim_ivfpq_append",
    "text_quality", "text_tfidf_top", "text_bm25_topk", "bm25_index_topk",
    "text_ql_topk", "ql_index_topk", "text_phrase_search", "phrase_index_search",
    "text_winnow",
    "text_lm_score", "text_boilerplate", "text_freq_items", "vocab_ids",
    "text_dup_spans", "text_dedup_substrings", "text_contamination_bloom",
    "events_tumbling_hourly", "events_sessionize", "asof_click_purchase",
    "range_join_price_bands",
    "dedup_setsim_join", "mv_rollup_rewrite",
    "merge_upsert", "scd2_history", "zonemap_scan", "mv_sketch_distinct",
    "timetravel_read", "bpe_train",
    "zonemap_rule_scan", "bloom_skip_scan", "delete_rows", "table_profile",
    "key_skew_report", "events_pattern_match",
    "dedup_editdist_join", "graph_pagerank", "text_compression_ratio",
    "zonemap_metadata_agg", "graph_triangles", "retrieval_rrf_fusion",
    "dedup_containment_join", "sessions_overlap_join", "timetravel_pruned_read",
    "retrieval_rm3_topk", "retrieval_snippets", "sim_centroid_classify",
    "sim_knn_label_noise", "governed_ingest", "graph_ppr",
    "window_cumulative_distinct"
  )
  def main(args: Array[String]): Unit = {
    // never overwrite the Verify-time oracle dumps (SparkEntry's
    // fixed-path frozen-model dumps) from a bench at a different sfDir
    System.setProperty("graft.oracle.dump", "off")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Shuffle partitions default to the core count (the sf0.1 bench
    // convention), but the 100× probes must size partitions to the
    // DATA, not the local core count — a real 100× cluster runs ~100×
    // the partitions, and pinning 32 partitions onto 100× data makes
    // each one 100× the target size (observed: graph_pagerank's
    // per-iteration aggregate OOMs at sf10 under 32 partitions, and
    // passes with partitions scaled to keep the per-task working set
    // at its sf1 level).
    val shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.ui.enabled", "false")
      // shuffle files are reaped by the ContextCleaner only when a GC
      // actually enqueues the dead ShuffleDependency weak refs, and the
      // default periodicGC.interval (30 min) never fires inside a
      // ~16-min bench run — without this, 196 queries × 3 reps of
      // shuffle files accumulate in the local dirs for the whole run
      // (the residue channel dropStorageResidue()'s unpersist cannot
      // touch). The explicit System.gc() below is the per-query fence;
      // this interval is the backstop between fences.
      .config("spark.cleaner.periodicGC.interval", "60s")
    val spark = GraftSession.requiredConfs
      .foldLeft(builder) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    // Storage hygiene between timed units: every query body lazily
    // localCheckpoints its shared sub-relations, and those blocks stay
    // resident until explicitly unpersisted — across a 190-query track
    // (and especially across the 10× sf1 track that runs FIRST) the
    // residue competes with execution memory. r11's final sample showed
    // a CONCENTRATED 2–9× inflation on the highest-memory main-track
    // queries (pagerank, betweenness, winnow, stream-dedup) with small
    // queries simultaneously faster — the storage-residue signature.
    // Drop all persistent RDDs + the SQL cache after each timed unit:
    // nothing is reused across queries (every rep rebuilds its plan),
    // so this frees memory without changing what any timing measures.
    // Shuffle-file residue is the channel unpersist/clearCache can NOT
    // free: shuffle files die only when the ContextCleaner processes
    // the dead ShuffleDependency refs, which requires a GC to enqueue
    // them. System.gc() here (untimed — always after the clock stops)
    // makes the cleaner actually run between timed units, so local-dir
    // bytes stay bounded across the 196-query run instead of
    // accumulating all run long (r12's unfenced suspect for the
    // concentrated graph-family inflation in the final sample).
    def dropStorageResidue(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    def localDirBytes(): Long =
      try org.apache.spark.GraftBenchShims.localDirBytes(spark.sparkContext)
      catch { case scala.util.control.NonFatal(_) => -1L }
    // Untimed warmup: trigger codegen/JIT and page-cache the inputs so
    // timed numbers measure the queries, not JVM cold start. One cheap
    // query per family so every base table (lineitem/orders, documents,
    // embeddings, events) and operator family (agg/join, text pipeline,
    // LSH + custom expressions, event-time windows) is warm before its
    // first timed run — warming only q6 left the first text/LSH/event
    // queries paying page-cache and codegen cost that read as noise.
    Seq(
      "q6_forecast_revenue",     // lineitem scan + agg
      "q3_shipping_priority",    // orders/customer joins
      "text_quality",            // documents + tokenize pipeline
      "dedup_simhash",           // LSH machinery + custom aggregates
      "sim_topk_bruteforce",     // embeddings + vector expressions
      "events_tumbling_hourly",  // events + event-time windows
      "text_top_bigrams",        // gram/bigram explode family (spans/LM/boilerplate)
      "text_contamination_bloom",// bloom build + probe path
      "sim_ivf_topk"             // spark.ml KMeans fit + centroid broadcast (semantic/IVF/PQ)
    ).foreach { name =>
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    }
    dropStorageResidue() // warmup residue must not ride into the sf1 track
    // local-dir (shuffle file) bytes sampled at three points: the
    // artifact-level proof that shuffle residue stays bounded across
    // the run now that the GC fence lets the ContextCleaner fire
    val ldAfterWarmup = localDirBytes()
    // MEDIAN of three timed runs per query: this host shows ±20–60%
    // noise spikes on sub-second queries, and both a single run and
    // min-of-2 let one spike (or one lucky cache hit) misrepresent the
    // round — the median needs two bad samples out of three to move,
    // and the method rides along in the artifact so readers know what
    // the number is.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    require(reps >= 1, s"SPARK_GRAFT_BENCH_REPS must be >= 1, got $reps")
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    // A rep that THROWS is not a timing: time-to-exception (~0.07 s for
    // an analysis error) polluting the artifact reads as a 40× speedup.
    // Failed queries go to an `errors` map and are excluded from
    // `queries`/`total`, so a schema drift shows up as an error count —
    // never as a fake number.
    def jsonEscape(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ").replace("\r", " ").take(160)
    val (manifest, manifestSha) = manifestQueries()
    // previous round's per-query map (last history entry) BEFORE this
    // run appends — the like-for-like comparison base
    val hist = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_HISTORY",
      java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_HISTORY.jsonl").toString
    )
    // Last TWO history entries, each with its recorded launch cpus.
    // `prev`/`prevSf1` (the LAST entry) stay the shared_with_prev /
    // ratio_shape comparison base; the sf1 TREND FENCE baselines come
    // from the min over BOTH entries, and ONLY entries whose cpus
    // matches the current launch arm the fence — a baseline taken at
    // different parallelism causes spurious retries or masks a real
    // regression (the exact local[4]-vs-CPUS=8 mismatch the `cpus`
    // field was added to catch), and a single inflated prior record
    // would otherwise loosen the fence exactly where it regressed
    // last round (r12's graph family).
    final case class HistEntry(cpus: Int, main: Map[String, Double], sf1: Map[String, Double])
    val histEntries: Seq[HistEntry] =
      try {
        val p = java.nio.file.Paths.get(hist)
        if (!java.nio.file.Files.exists(p)) Nil
        else {
          import scala.jdk.CollectionConverters._
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          java.nio.file.Files.readAllLines(p).asScala.filter(_.nonEmpty).takeRight(2).toSeq.map { l =>
            val root = om.readTree(l)
            def qmap(n: com.fasterxml.jackson.databind.JsonNode): Map[String, Double] =
              if (n == null) Map.empty
              else n.properties().asScala.map(e => e.getKey -> e.getValue.asDouble()).toMap
            val sf1Node = root.get("sf1")
            HistEntry(
              if (root.get("cpus") == null) -1 else root.get("cpus").asInt(),
              qmap(root.get("queries")),
              qmap(if (sf1Node == null) null else sf1Node.get("queries"))
            )
          }
        }
      } catch { case scala.util.control.NonFatal(_) => Nil }
    val prev: Map[String, Double]    = histEntries.lastOption.map(_.main).getOrElse(Map.empty)
    val prevSf1: Map[String, Double] = histEntries.lastOption.map(_.sf1).getOrElse(Map.empty)
    val sf1FenceBase: Map[String, Double] = histEntries
      .filter(_.cpus == cpus.toInt)
      .flatMap(_.sf1.toSeq)
      .groupMapReduce(_._1)(_._2)(math.min)
    // ---- pinned sf1 heavy-family track (BENCH_MANIFEST_SF1.txt) ----
    // One timed run per query at 10x the bench scale, serialized
    // BEFORE the main track on the still-clean JVM so trend points
    // never inherit main-track storage/GC residue. (A suspected 2x
    // after-main inflation turned out to be a LAUNCH mismatch - sf1
    // points taken at local[4] vs the conventional CPUS=8; the JSON
    // now records "cpus" so a sample can never hide its parallelism
    // again.) Cold standing state: this is a round-over-round TREND
    // LINE for the scale claims, not a latency number. TREND FENCE
    // (r12 item 1): the single-run track let a degraded final sample
    // become the durable record twice in two rounds (r11 250.3 s,
    // r12 272.3 s — both concentrated 2-3x on the same queries while
    // same-code samples an hour apart sat at band). Any query reading
    // > 2x its fence baseline re-runs in-JVM (up to 3 samples total).
    // Since r14 the baseline is min(last TWO same-cpus rounds) — a
    // single inflated prior record loosened r13's fence exactly on
    // the previously-inflated graph family — and the recorded value
    // is the lower-MEDIAN sample, not the minimum: keeping minima
    // ratcheted the baseline toward fastest-ever and recorded an
    // intermittent regression at its one fast sample. A genuine
    // regression still shows (all samples high, all in `retried`),
    // but a one-off ambient/GC excursion can no longer misstate the
    // engine in the durable artifact. Skipped silently when the sf1
    // corpus or manifest is absent (e.g. a fresh driver host).
    val sf1Res: Option[Sf1Result] = {
      val sf1Dir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft_sf1")
      val mPath = java.nio.file.Paths.get(
        sys.env.getOrElse(
          "SPARK_GRAFT_BENCH_MANIFEST_SF1",
          java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_MANIFEST_SF1.txt").toString
        )
      )
      val haveData = java.nio.file.Files.exists(java.nio.file.Paths.get(sf1Dir, "lineitem.parquet"))
      if (!haveData || !java.nio.file.Files.exists(mPath)) None
      else {
        import scala.jdk.CollectionConverters._
        val names = java.nio.file.Files
          .readAllLines(mPath)
          .asScala
          .map(_.trim)
          .filter(l => l.nonEmpty && !l.startsWith("#"))
          .toSeq
        // task-metrics probe: per-query spill + max single-task peak
        // execution memory ride along in the sf1 block (the scale
        // signal wall-time can't give) — bus drained around each
        // query so events attribute to the right window
        val probe = new TaskMetricsProbe
        spark.sparkContext.addSparkListener(probe)
        def runOnce(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, name: String)
            : Either[String, (Double, (Long, Long, Long))] = {
          org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
          probe.snapshotAndReset()
          val t0 = System.nanoTime()
          val r =
            try {
              fn(spark, sf1Dir).write.format("noop").mode("overwrite").save()
              val dt = (System.nanoTime() - t0) / 1e9
              org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
              Right((dt, probe.snapshotAndReset())): Either[String, (Double, (Long, Long, Long))]
            } catch {
              case e: Throwable =>
                System.err.println(s"[bench] sf1 $name failed: ${e.getMessage}")
                Left(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
            }
          dropStorageResidue() // untimed: after the clock stops
          r
        }
        val retried   = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
        val noHistory = scala.collection.mutable.ArrayBuffer.empty[String]
        val t1: Seq[(String, Either[String, (Double, (Long, Long, Long))])] = names.flatMap { name =>
          SparkEntry.queries.get(name).map { fn =>
            // fence baseline: min over the last two rounds' recorded
            // values, cpus-matched (sf1FenceBase). A query with no
            // matching history CANNOT be fenced in its debut round —
            // recorded in `no_history` so the artifact says so itself.
            val base = sf1FenceBase.get(name).filter(_ > 0)
            if (base.isEmpty) noHistory += name
            val samples  = scala.collection.mutable.ArrayBuffer.empty[(Double, (Long, Long, Long))]
            var firstErr = Option.empty[String]
            def attempt(): Unit = runOnce(fn, name) match {
              case Right(s) => samples += s
              case Left(m)  => if (firstErr.isEmpty) firstErr = Some(m)
            }
            attempt()
            // trend fence: re-run while the BEST reading still exceeds
            // 2x baseline (up to 3 attempts total). The recorded value
            // is the lower-MEDIAN sample, not the minimum — keeping
            // minima let the baseline ratchet toward fastest-ever and
            // recorded an intermittent regression at its one fast
            // sample; every raw sample still lands in `retried`.
            var attempts = 1
            while (
              samples.nonEmpty && attempts < 3 &&
              base.exists(b => samples.map(_._1).min > 2 * b)
            ) { attempts += 1; attempt() }
            if (samples.size > 1) retried(name) = samples.map(_._1).toSeq
            val rec: Either[String, (Double, (Long, Long, Long))] =
              if (samples.isEmpty) Left(firstErr.getOrElse("failed"))
              else Right(samples.sortBy(_._1).apply((samples.size - 1) / 2))
            name -> rec
          }
        }
        val ok  = t1.collect { case (k, Right(v)) => k -> v }
        val bad = t1.collect { case (k, Left(m)) => k -> m }
        // iterate-only twins (standing tables left by the full runs
        // above): one timed run each — the per-run cost the in-query
        // writes mask in the end-to-end trend rows
        val okNames = ok.map(_._1).toSet
        val iter: Seq[(String, Double)] = SparkEntry.iterateOnly.toSeq
          .filter { case (name, _) => okNames.contains(name) }
          .flatMap { case (name, fn) =>
            runOnce(fn, s"$name (iterate-only)") match {
              case Right((dt, _)) => Some(name -> dt)
              case Left(_)        => None
            }
          }
        spark.sparkContext.removeSparkListener(probe)
        Some(Sf1Result(sf1Dir, ok, bad, retried.toMap, noHistory.toSeq, iter))
      }
    }
    val ldAfterSf1 = localDirBytes()
    // full sf1 JSON (with the per-query task-metrics map) for the
    // BENCH_LATEST/history artifacts; a TRIMMED variant for stdout —
    // the ~1.4 KB metrics map riding in the stdout line is what
    // overflowed the driver's 2 000-char tail window in r11 and left
    // BENCH_r11.json `parsed: null`.
    val sf1Field: String = sf1Res
      .map { case Sf1Result(sf1Dir, ok, bad, retried, noHistory, iter) =>
        val qj = ok.map { case (k, (v, _)) => "\"" + k + "\":" + (math.rint(v * 1e4) / 1e4) }.mkString("{", ",", "}")
        val mj = ok
          .map { case (k, (_, (ms, ds, pk))) =>
            "\"" + k + s"""\":{"spill_bytes":$ms,"disk_spill_bytes":$ds,"peak_task_mem_bytes":$pk}"""
          }
          .mkString("{", ",", "}")
        val ej = bad.map { case (k, m) => "\"" + k + "\":\"" + jsonEscape(m) + "\"" }.mkString("{", ",", "}")
        val rj = retried
          .map { case (k, ss) => "\"" + k + "\":" + ss.map(v => math.rint(v * 1e4) / 1e4).mkString("[", ",", "]") }
          .mkString("{", ",", "}")
        val nh = noHistory.map("\"" + _ + "\"").mkString("[", ",", "]")
        val ij = iter.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1e4) / 1e4) }.mkString("{", ",", "}")
        s""","sf1":{"sf":"$sf1Dir","value":${math.rint(ok.map(_._2._1).sum * 1e4) / 1e4},"unit":"sec","method":"cold standing state, residue dropped per query; trend fence: reading >2x min(last two same-cpus rounds) re-runs (<=3 attempts), lower-median sample kept, all samples in `retried`; debut queries in `no_history`; `iterate` = iterate-only runs over the standing tables the full queries left","n":${ok.size},"error_count":${bad.size},"errors":$ej,"retried":$rj,"no_history":$nh,"iterate":$ij,"queries":$qj,"metrics":$mj}"""
      }
      .getOrElse("")
    val sf1StdoutField: String = sf1Res
      .map { case Sf1Result(sf1Dir, ok, bad, retried, _, iter) =>
        val top = ok.sortBy(-_._2._1).take(6)
        val qj  = top.map { case (k, (v, _)) => "\"" + k + "\":" + (math.rint(v * 1e4) / 1e4) }.mkString("{", ",", "}")
        val ij  = iter.map { case (k, v) => "\"" + k + "\":" + (math.rint(v * 1e4) / 1e4) }.mkString("{", ",", "}")
        s""","sf1":{"sf":"$sf1Dir","value":${math.rint(ok.map(_._2._1).sum * 1e4) / 1e4},"unit":"sec","n":${ok.size},"error_count":${bad.size},"retried_n":${retried.size},"iterate":$ij,"queries_omitted":${ok.size - top.size},"queries":$qj}"""
      }
      .getOrElse("")
    val timed: Seq[(String, Either[String, Double])] = manifest.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        var err: Option[String] = None
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              err = Some(s"${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
              System.err.println(s"[bench] $name failed: ${e.getMessage}")
              None
          }
        }
        val r = name -> (if (times.isEmpty) Left(err.getOrElse("failed")) else Right(median(times)))
        dropStorageResidue() // untimed: after the query's reps finish
        r
      }
    }
    val ldEnd   = localDirBytes()
    val results = timed.collect { case (k, Right(v)) => k -> v }
    val errors  = timed.collect { case (k, Left(m)) => k -> m }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, m) => "\"" + k + "\":\"" + jsonEscape(m) + "\"" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // like-for-like subtotal over the queries BOTH this run and the
    // previous history entry measured — the number to compare across
    // rounds when the manifest grows
    val resultMap = results.toMap
    val sharedKeys = resultMap.keySet & prev.keySet
    val sharedNow  = sharedKeys.toSeq.map(resultMap).sum
    val sharedPrev = sharedKeys.toSeq.map(prev).sum
    def r4(v: Double): Double = math.rint(v * 1e4) / 1e4
    // iterate-only twins at bench scale (standing tables left by the
    // main-track reps above) — same median-of-reps method as the main
    // rows; recorded in a separate `iterate` map so the end-to-end
    // trend rows (dominated by in-query standing-table writes) can't
    // mask a regression in the per-run iterate path
    val iterMain: Seq[(String, Double)] = SparkEntry.iterateOnly.toSeq
      .filter { case (n, _) => resultMap.contains(n) }
      .flatMap { case (n, fn) =>
        val times = (1 to reps).flatMap { _ =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            Some((System.nanoTime() - t0) / 1e9)
          } catch {
            case e: Throwable =>
              System.err.println(s"[bench] iterate-only $n failed: ${e.getMessage}")
              None
          }
        }
        dropStorageResidue()
        if (times.isEmpty) None else Some(n -> median(times))
      }
    val iterMainJson =
      iterMain.map { case (k, v) => "\"" + k + "\":" + r4(v) }.mkString("{", ",", "}")
    // ratio_shape: the ambient-vs-residue diagnosis, recorded by the
    // bench itself instead of re-derived by a reader. Per-query ratio
    // vs the previous round over the shared set; a UNIFORM shift
    // (tight p25..p75 band) is the ambient-host signature, a
    // CONCENTRATED cluster (wide spread, few big ratios) is the
    // storage-residue / real-regression signature.
    val (ratioShapeField: String, ratioShapeShort: String) = {
      val ratios = sharedKeys.toSeq.flatMap { k =>
        val p = prev(k); if (p > 0) Some(k -> resultMap(k) / p) else None
      }
      if (ratios.isEmpty)
        (""""ratio_shape":{"n":0,"shape":"none"}""", """"ratio_shape":{"n":0,"shape":"none"}""")
      else {
        val sorted = ratios.map(_._2).sorted
        def pct(q: Double) = sorted((q * (sorted.size - 1)).round.toInt)
        val med  = median(sorted)
        val p25  = pct(0.25); val p75 = pct(0.75); val p90 = pct(0.90)
        val (maxQ, maxR) = ratios.maxBy(_._2)
        val shape =
          if (med <= 1.1 && p90 <= 1.5) "stable"
          else if (p25 > 0 && p75 / p25 <= 1.5) "uniform_shift"
          else "concentrated"
        (
          s""""ratio_shape":{"n":${sorted.size},"median":${r4(med)},"p25":${r4(p25)},"p75":${r4(p75)},"p90":${r4(p90)},"max":${r4(maxR)},"max_query":"$maxQ","shape":"$shape","rule":"stable: median<=1.1 and p90<=1.5; uniform_shift (ambient-host signature): p75/p25<=1.5; else concentrated (residue or regression cluster)"}""",
          s""""ratio_shape":{"n":${sorted.size},"median":${r4(med)},"shape":"$shape"}"""
        )
      }
    }
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","method":"per-query median of $reps in-process runs after warmup; sf1 trend track precedes in the same JVM; storage residue (localCheckpoint blocks + SQL cache) dropped + System.gc() shuffle-reap untimed after every query since r13","cpus":$cpus,"manifest_sha256":"$manifestSha","manifest_n":${manifest.size},"shared_with_prev":{"n":${sharedKeys.size},"sec":$sharedNow,"prev_sec":$sharedPrev},$ratioShapeField,"iterate":$iterMainJson,"local_dir_bytes":{"after_warmup":$ldAfterWarmup,"after_sf1":$ldAfterSf1,"end":$ldEnd},"queries":$qs,"error_count":${errors.size},"errors":$errs,"sf":"$sfDir"$sf1Field}"""
    // The driver keeps only the last ~2000 chars of stdout and parses
    // the final JSON line out of that tail — a full 100+-query map
    // (~4.5 KB) overflows the window and the round artifact records
    // `parsed: null`. So stdout gets a line guaranteed to fit: same
    // metadata, `queries` trimmed to the slowest entries that fit a
    // 1 700-char budget (4-decimal secs), plus how many were omitted
    // and where the untruncated map lives. The full line still goes to
    // BENCH_LATEST.json and BENCH_HISTORY.jsonl below.
    val stdoutLine = {
      val bySlowest = results.sortBy(-_._2)
      // stdout carries the TRIMMED sf1 field (no task-metrics map, top
      // sf1 queries only — r11's full map overflowed the tail window
      // and the round artifact lost even the headline value); the
      // budget is computed on the final meta string, sf1 included, so
      // the whole line stays inside the driver's 2 000-char tail.
      val meta =
        s"""{"metric":"total","value":${math.rint(total * 1e4) / 1e4},"unit":"sec","method":"per-query median of $reps in-process runs after warmup; sf1 track precedes in-JVM; residue dropped per query; slowest-first subset, full map in BENCH_LATEST.json","cpus":$cpus,"manifest_sha256":"$manifestSha","manifest_n":${manifest.size},"shared_with_prev":{"n":${sharedKeys.size},"sec":${math.rint(sharedNow * 1e4) / 1e4},"prev_sec":${math.rint(sharedPrev * 1e4) / 1e4}},$ratioShapeShort,"iterate":$iterMainJson,"error_count":${errors.size},"errors":$errs,"sf":"$sfDir"$sf1StdoutField,"queries_omitted":NNN,"queries":"""
      val budget  = 1700 - meta.length
      val entries = scala.collection.mutable.ArrayBuffer.empty[String]
      var used    = 2 // braces
      bySlowest.foreach { case (k, v) =>
        val e = "\"" + k + "\":" + (math.rint(v * 1e4) / 1e4)
        if (used + e.length + 1 <= budget) { entries += e; used += e.length + 1 }
      }
      meta.replace("\"queries_omitted\":NNN", s""""queries_omitted":${results.size - entries.size}""") +
        entries.mkString("{", ",", "}") + "}"
    }
    println(stdoutLine)
    // the full line as a standalone machine-readable artifact — the
    // driver's round file only keeps a truncated stdout tail
    try
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(sys.props("user.dir"), "BENCH_LATEST.json"),
        line + "\n"
      )
    catch { case scala.util.control.NonFatal(_) => () }
    // per-query history for cross-round regression detection (±1s
    // single-run noise on this host makes one-off comparisons useless)
    try {
      val stamped = s"""{"ts":"${java.time.Instant.now()}",${line.drop(1)}""" + "\n"
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(hist),
        stamped,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND
      )
    } catch {
      // best-effort: never fail the bench, but don't eat fatal errors
      case scala.util.control.NonFatal(e) => System.err.println(s"[bench] history append failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
