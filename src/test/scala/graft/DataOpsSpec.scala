package graft

import org.apache.spark.sql.functions._

import graft.operators.DataOps

class DataOpsSpec extends SparkSpec {

  test("saltedJoin result == plain join result (skew recipe is semantics-free)") {
    val big   = Tables.lineitem(spark, sfDir).select(col("l_orderkey").as("k"), col("l_quantity"))
    val small = Tables.orders(spark, sfDir).select(col("o_orderkey").as("k"), col("o_orderstatus"))
    val plain  = big.join(small, "k")
    val salted = DataOps.saltedJoin(big, small, "k", salts = 8)
    assert(salted.count() == plain.count())
    val a = plain.groupBy("o_orderstatus").agg(round(sum("l_quantity"), 4).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val b = salted.groupBy("o_orderstatus").agg(round(sum("l_quantity"), 4).as("s")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }

  test("weightedMixture: epoch counts follow the weights, zero-weight sources excluded") {
    val weights = Map("src1" -> 0.5, "src2" -> 2.0, "src3" -> 2.25, "src4" -> 0.0)
    val out = DataOps.weightedMixture(spark, sfDir, weights).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(!out.exists(_._2 == "src4"), "zero-weight source leaked into the mixture")
    assert(out.forall(r => weights.contains(r._2)), "unlisted source leaked into the mixture")
    val bySrc = out.groupBy(_._2).view.mapValues(_.groupBy(_._1).view.mapValues(_.length).toMap).toMap
    // integer part: every src2 doc appears >= 2 times; src1 docs 0 or 1
    assert(bySrc("src2").values.forall(_ >= 2))
    assert(bySrc.getOrElse("src1", Map.empty).values.forall(_ == 1))
    // fractional part: src3 docs appear 2 or 3 times; some of each at 25%
    val c3 = bySrc("src3").values.toSeq
    assert(c3.forall(c => c == 2 || c == 3) && c3.contains(2) && c3.contains(3))
    // deterministic: same call, same rows
    val again = DataOps.weightedMixture(spark, sfDir, weights).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.sameElements(again))
  }

  test("z-order layout: a two-dimensional rectangle scan skips most row groups") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      val root = df.queryExecution.executedPlan
      val plan = root match { case a: AdaptiveSparkPlanExec => a.executedPlan; case p => p }
      plan.collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }.sum
    }
    val src = Tables
      .orders(spark, sfDir)
      .select(col("o_custkey").as("x"), col("o_orderkey").as("y"), col("o_totalprice"))
    val Array(xMax, yMax) = src.agg(max("x"), max("y")).collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").resolve("z").toString
    val pDir = java.nio.file.Files.createTempDirectory("graft_z").resolve("plain").toString
    DataOps.zOrderWrite(src, "x", "y", zDir, files = 16)
    // baseline: same file count, insertion order (both dims unclustered)
    src.repartition(16).write.mode("overwrite").parquet(pDir)
    def rect(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("x") <= xMax / 8 && col("y") <= yMax / 8)
    val total     = src.count()
    val zScanned  = scanOutputRows(rect(spark.read.parquet(zDir)))
    val pScanned  = scanOutputRows(rect(spark.read.parquet(pDir)))
    // same answer from both layouts…
    assert(rect(spark.read.parquet(zDir)).count() == rect(spark.read.parquet(pDir)).count())
    // …but the z-ordered layout's min/max stats skip most row groups
    // while the unclustered layout scans essentially everything
    assert(zScanned < total / 4, s"z-order scanned $zScanned of $total rows")
    assert(zScanned < pScanned / 2, s"z=$zScanned plain=$pScanned")
  }

  test("winnowing: guaranteed shared fingerprint for long-enough common substrings") {
    // identical documents must produce identical fingerprint sets
    val fps = DataOps
      .winnowFingerprints(spark, sfDir)
      .collect()
      .groupBy(_.getLong(0))
      .view
      .mapValues(_.map(_.getLong(1)).toSet)
      .toMap
    val textOf = Tables.documents(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    textOf.groupBy(_._2).values.filter(_.size > 1).foreach { grp =>
      val sets = grp.keys.map(fps).toSeq
      assert(sets.distinct.size == 1, s"identical docs with different winnow sets: ${grp.keys}")
    }
    assert(fps.nonEmpty)
  }

  test("chunking: stride overlap is exact and every token is covered") {
    val chunks = graft.operators.TextAnalysis
      .chunkDocuments(spark, sfDir, chunkSize = 50, stride = 40)
      .collect()
      .groupBy(_.getLong(0))
    chunks.foreach { case (_, rows) =>
      val byIdx = rows.sortBy(_.getLong(1)).map(r => (r.getString(2).split(" "), r.getLong(3)))
      byIdx.zipWithIndex.foreach { case ((toks, n), i) =>
        assert(toks.length == n)
        if (i < byIdx.length - 1) {
          // chunk i spans doc positions [40i, 40i + len) — the overlap
          // with chunk i+1 is len - 40 tokens (short chunks near the
          // end overlap by less than the nominal 10)
          val next = byIdx(i + 1)._1
          val o    = math.max(0, toks.length - 40)
          assert(toks.takeRight(o).sameElements(next.take(o)), s"overlap mismatch at chunk $i")
        }
      }
      // coverage: overlap-aware stitching rebuilds the document — the
      // doc's token count is 40 per non-final chunk plus the final
      // chunk's length
      val stitched = byIdx.head._1 ++ byIdx.sliding(2).collect { case Array((prev, _), (cur, _)) =>
        cur.drop(math.max(0, prev.length - 40))
      }.toSeq.flatten
      assert(stitched.length == 40 * (byIdx.length - 1) + byIdx.last._1.length)
    }
  }

  test("vocabIds: contiguous 1..V ids equal to the single-partition window formulation") {
    import org.apache.spark.sql.expressions.Window
    val got = DataOps.vocabIds(spark, sfDir, parts = 8).collect()
    // contiguous, no gaps, starts at 1
    assert(got.map(_.getLong(2)).toSeq == (1L to got.length.toLong))
    // matches the (unscalable) global-window formulation exactly —
    // the two-phase offset assignment changes the plan, not the result
    val counts = graft.operators.TextJobs
      .tokenized(Tables.documents(spark, sfDir).select("doc_id", "text"), "text", "term")
      .groupBy("term")
      .agg(count(lit(1)).as("cnt"))
    val windowed = counts
      .withColumn("vocab_id", row_number().over(Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
      .orderBy("vocab_id")
      .collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      windowed.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
  }

  test("budgetedSelection: equals the global-window prefix sum, invariant to partition count") {
    import org.apache.spark.sql.expressions.Window
    val toksE = expr("filter(split(text, '[^\\\\p{L}]+'), t -> t <> '')")
    val windowed = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("n_chars"), size(toksE).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("cum_tokens") <= 20000L)
      .select("doc_id", "n_tokens", "cum_tokens")
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq
    assert(windowed.nonEmpty, "budget admits nothing — test corpus changed?")
    Seq(1, 8, 32).foreach { parts =>
      val got = DataOps
        .budgetedSelection(spark, sfDir, budget = 20000L, parts = parts)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSeq
      assert(got == windowed, s"parts=$parts diverged from the window formulation")
    }
    // the budget is a hard ceiling and the cut is at the boundary: the
    // admitted prefix fits, adding the next-priority doc would not
    assert(windowed.map(_._2).sum <= 20000L)
  }

  test("deterministicShuffle: a permutation, stable across runs and partition counts") {
    val a = DataOps.deterministicShuffle(spark, sfDir, parts = 8).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = DataOps.deterministicShuffle(spark, sfDir, parts = 32).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq == b.toSeq, "shuffle order depends on partition count")
    // contiguous positions over exactly the corpus ids — a true permutation
    assert(a.map(_._1).toSeq == (1L to a.length.toLong))
    val ids = Tables.documents(spark, sfDir).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a.map(_._2).toSet == ids)
    // and genuinely shuffled: not the identity order
    assert(a.map(_._2).toSeq != a.map(_._2).sorted.toSeq)
  }

  test("compactParquet: fewer right-sized files, rows preserved exactly") {
    val in  = java.nio.file.Files.createTempDirectory("graft_compact_in").toString
    val out = java.nio.file.Files.createTempDirectory("graft_compact_out").resolve("c").toString
    // 32 tiny files
    Tables.documents(spark, sfDir).select("doc_id", "text").repartition(32).write.mode("overwrite").parquet(in)
    val (before, after, bytes) = DataOps.compactParquet(spark, in, out, targetBytes = bytesOf(in) / 2 + 1)
    assert(before == 32)
    assert(after == 2, s"expected 2 output files, got $after")
    assert(bytes > 0)
    val a = spark.read.parquet(in).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = spark.read.parquet(out).collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq == b.toSeq, "compaction altered the data")
  }

  private def bytesOf(dir: String): Long = {
    val p  = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(p)
      .filter(st => st.isFile && !st.getPath.getName.startsWith("_") && !st.getPath.getName.startsWith("."))
      .map(_.getLen)
      .sum
  }

  test("snapshotDiff: identity diff is empty, planted changes classify exactly") {
    val v1 = Tables.documents(spark, sfDir).select("doc_id", "text")
    assert(DataOps.snapshotDiff(v1, v1).count() == 0)
    val v2 = v1
      .filter(col("doc_id") =!= 7)
      .withColumn("text", when(col("doc_id") === 11, concat(col("text"), lit("x"))).otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") === 3).select((col("doc_id") + 9999).as("doc_id"), col("text")))
    val diff = DataOps.snapshotDiff(v1, v2).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(7L -> "removed", 11L -> "changed", 10002L -> "added"))
  }

  test("dataset split is deterministic with the expected proportions") {
    val a = DataOps.datasetSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = DataOps.datasetSplit(spark, sfDir).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac out of envelope")
  }

  test("tableChecksum: order/partition-invariant, and a one-row change flips a bucket") {
    import SparkSpec.spark.implicits._
    val base = Tables
      .documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("source"))
    val cols = Seq("doc_id", "lang", "source")
    val a = DataOps.tableChecksum(base, cols).collect().toSeq
    // same rows, different physical order and partitioning -> identical
    val b = DataOps
      .tableChecksum(base.repartition(13).sortWithinPartitions(col("lang").desc), cols)
      .collect()
      .toSeq
    assert(a == b, "checksum must be independent of row order and partitioning")
    // one mutated row flips at least one bucket's checksum, never the
    // total row count
    val mutated = base.withColumn("lang", when(col("doc_id") === 0L, lit("xx")).otherwise(col("lang")))
    val c = DataOps.tableChecksum(mutated, cols).collect().toSeq
    assert(c != a, "a single-row change must be visible")
    assert(c.map(_.getLong(1)).sum == a.map(_.getLong(1)).sum)
  }

  test("weightedSample: selection matches an independent A-ES restatement; heavy docs overrepresented") {
    val k = 25
    val got = DataOps.weightedSample(spark, sfDir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // independent restatement of the race over the collected corpus
    val corpus = Tables.documents(spark, sfDir).select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 > 0)
    def uRes(id: Long): Long = (id * 2654435761L) % 1000000007L + 1
    def rawKey(id: Long, w: Long): Double =
      -math.log(uRes(id).toDouble / 1000000008.0) / w
    // selection and rank on the RAW key; the reported key is the exact
    // integer residue (no float ever crosses the compare)
    val expect = corpus.map { case (id, w) => (id, w, rawKey(id, w)) }
      .sortBy(t => (t._3, t._1)).take(k).zipWithIndex
      .map { case ((id, w, _), i) => (i + 1L, id, w, uRes(id)) }
    assert(got.toSeq == expect.toSeq, "A-ES selection diverged from the restatement")
    // weight = n_chars → sampled docs should skew long
    val sampleMeanW = got.map(_._3).sum.toDouble / got.length
    val corpusMeanW = corpus.map(_._2).sum.toDouble / corpus.length
    assert(sampleMeanW > corpusMeanW, s"no weight bias: sample $sampleMeanW vs corpus $corpusMeanW")
    // selection is a per-partition-heap top-k, never a global sort or
    // single-partition window over the corpus
    val plan = DataOps.weightedSample(spark, sfDir, k).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrderedAndProject in:\n$plan")
  }

  test("temperatureMixture: smallest source kept whole, fractions sqrt-monotone, admission matches the hash model") {
    import SparkSpec.spark.implicits._
    val rows = DataOps
      .temperatureMixture(spark, sfDir)
      .as[(String, Long, Long, Long, Long)]
      .collect()
      .toSeq
    assert(rows.nonEmpty)
    val nMin = rows.map(_._2).min
    // fbp recomputes from counts with the exact same arithmetic
    rows.foreach { case (src, n, fbp, _, _) =>
      val want = math.floor(10000.0 * math.sqrt((nMin * n).toDouble) / n).toLong
      assert(fbp == want, s"$src: fbp $fbp != $want")
    }
    // every smallest source is fully admitted (fbp = 10000 keeps all buckets)
    rows.filter(_._2 == nMin).foreach { case (src, n, fbp, sel, _) =>
      assert(fbp == 10000L && sel == n, s"smallest source $src must be kept whole")
    }
    // monotone: bigger sources never get a larger fraction
    val sorted = rows.sortBy(_._2)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._3 >= b._3, s"fraction must not grow with size: $a vs $b")
      case _         =>
    }
    // admission replays the multiplicative-hash model doc by doc
    val docs = Tables.documents(spark, sfDir).select("doc_id", "source").as[(Long, String)].collect()
    val counts = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val wantSel = docs.groupBy(_._2).map { case (src, ds) =>
      val fbp = math.floor(10000.0 * math.sqrt((nMin * counts(src)).toDouble) / counts(src)).toLong
      src -> ds.count(d => (d._1 * 2654435761L) % 10000L < fbp).toLong
    }
    rows.foreach { case (src, _, _, sel, _) => assert(sel == wantSel(src), s"$src selection mismatch") }
  }
}
