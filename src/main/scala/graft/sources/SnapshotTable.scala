package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `graft-log`: a minimal transaction-log table format — versioned
  * manifests over immutable parquet data files, giving long-lived
  * tables the three properties a 100 TB ingest path needs and a bare
  * parquet directory cannot provide:
  *
  *   - **atomic commits**: a manifest is staged to a hidden temp name
  *     and `rename`d into place; readers either see the complete new
  *     version or the old one, never a half-written file list (the
  *     same write-aside-then-swap discipline the standing indexes use,
  *     generalized to every commit);
  *   - **snapshot isolation / time travel**: data files are immutable
  *     and append-only on disk; every version's manifest remains
  *     readable, so `read(versionAsOf = n)` reproduces any historical
  *     snapshot byte-for-byte — including across later compactions;
  *   - **optimistic concurrency**: two writers racing to commit
  *     version n+1 both stage, but `rename` onto an existing manifest
  *     fails for exactly one of them; the loser re-reads the log and
  *     retries (append) or aborts (overwrite), so lost updates are
  *     impossible without any lock service.
  *
  * Layout: `path/_log/v<%012d>.txt` (one relative data-file path per
  * line; `_`-prefixed so plain `spark.read.parquet(path)` never sees
  * it) and `path/data/c-<uuid>/part-*.parquet` (one immutable
  * directory per commit). The manifest format is deliberately plain
  * text — no schema evolution story is claimed; writers must present
  * the table's schema.
  *
  * Two manifest line extensions (both introduced for the mutation
  * tier, both invisible to older versions because every version's
  * manifest is self-contained):
  *
  *   - `dv:<rel>` — a DELETION VECTOR in effect for this version: a
  *     parquet file set under `_dv/` holding `(file, pos)` rows, where
  *     `pos` is the parquet row index within the (immutable) data
  *     file. [[deleteMor]]/[[updateMor]] commit these instead of
  *     rewriting data files — merge-on-read, the write-amplification
  *     escape hatch copy-on-write lacks: a delete of k rows writes
  *     O(k) bytes, not O(touched files). Readers subtract DV rows
  *     with one anti-join keyed on `(file, _metadata.row_index)`.
  *   - an absolute path (leading `/` or a `scheme://`) — a file
  *     referenced OUTSIDE the table directory, written by [[clone]]:
  *     a shallow clone's v1 manifest points at the source table's
  *     immutable files, so cloning 100 TB costs one manifest write
  *     and zero data movement (vacuuming the SOURCE past the cloned
  *     version breaks the clone, exactly as in the lake formats —
  *     documented, detected loudly at read time by the missing file).
  */
object SnapshotTable {

  /** Resolve a manifest data line to a readable path: relative lines
    * live under the table root; absolute lines (shallow clones) are
    * used as-is.
    */
  private[sources] def fileRef(path: String, line: String): String =
    if (line.startsWith("/") || line.contains("://")) line else s"$path/$line"

  private def isDvLine(line: String): Boolean = line.startsWith("dv:")

  /** `meta:` manifest lines carry per-commit application metadata
    * (e.g. [[JoinMv]] maintenance watermarks) ATOMICALLY with the
    * commit — the transaction-metadata pattern of log-structured table
    * formats. They are commit-scoped: readers skip them, and every
    * manifest-deriving writer strips the previous version's meta
    * instead of copying it forward (RESTORE is the deliberate
    * exception — it re-asserts the restored commit's APPLICATION meta,
    * which is exactly what a rewind means, replacing only the `op:`
    * stamp with its own). Every writer also stamps `meta:op:<name>`,
    * which is what [[history]] reads back.
    */
  private[sources] def isMetaLine(line: String): Boolean = line.startsWith("meta:")

  /** DESCRIBE HISTORY: one row per surviving version — (version,
    * operation, n_data_files, n_dvs, application meta). Reads only
    * manifests: O(versions) tiny files, metadata-sized at any table
    * size, no data touched. Versions vacuumed away are absent;
    * commits from before op-stamping show `unknown`.
    */
  def history(spark: SparkSession, path: String): DataFrame = {
    val f      = fs(spark, path)
    val latest = latestVersion(spark, path)
    require(latest > 0, s"no table at $path")
    val rows = (1L to latest).flatMap { v =>
      if (!f.exists(manifestPath(path, v))) None
      else {
        val lines        = readManifest(spark, path, v)
        val (data, dvs)  = splitManifest(lines)
        val metas        = lines.filter(isMetaLine).map(_.stripPrefix("meta:"))
        val op           = metas.collectFirst { case m if m.startsWith("op:") => m.stripPrefix("op:") }
        // op stamps and schema records are engine bookkeeping, not
        // application meta — history shows the user-meaningful payloads
        val appMeta = metas.filterNot(m => m.startsWith("op:") || m.startsWith(SchemaPrefix))
        Some((v, op.getOrElse("unknown"), data.length.toLong, dvs.length.toLong, appMeta.mkString(";")))
      }
    }
    import spark.implicits._
    rows.toDF("version", "operation", "n_data_files", "n_dvs", "app_meta").orderBy("version")
  }

  /** Split manifest lines into (data files, deletion-vector refs);
    * meta lines belong to neither.
    */
  private[sources] def splitManifest(lines: Seq[String]): (Seq[String], Seq[String]) =
    (
      lines.filterNot(l => isDvLine(l) || isMetaLine(l)),
      lines.filter(isDvLine).map(_.stripPrefix("dv:"))
    )

  /** This commit's `meta:` payloads (prefix stripped), newest commit
    * wins lookups — see [[latestMeta]].
    */
  def commitMeta(spark: SparkSession, path: String, version: Long): Seq[String] =
    readManifest(spark, path, version).filter(isMetaLine).map(_.stripPrefix("meta:"))

  /** Most recent commit ≤ `atOrBelow` (default: latest) carrying a
    * meta payload with the given prefix, walking versions downward.
    * Returns (version, payload). Loud None when no surviving manifest
    * carries one — e.g. after a vacuum reclaimed every meta-carrying
    * manifest — so consumers fail explicitly instead of acting on a
    * stale default.
    */
  def latestMeta(
      spark: SparkSession,
      path: String,
      prefix: String,
      atOrBelow: Option[Long] = None
  ): Option[(Long, String)] = {
    val f    = fs(spark, path)
    val top  = atOrBelow.getOrElse(latestVersion(spark, path))
    var v    = top
    while (v >= 1L) {
      if (f.exists(manifestPath(path, v))) {
        val hit = commitMeta(spark, path, v).find(_.startsWith(prefix))
        if (hit.isDefined) return hit.map(v -> _)
      }
      v -= 1L
    }
    None
  }

  private[sources] def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sessionState.newHadoopConf())

  private[sources] def manifestPath(path: String, version: Long): Path =
    new Path(s"$path/_log/v${"%012d".format(version)}.txt")

  /** Latest committed version, 0 if the table does not exist. */
  def latestVersion(spark: SparkSession, path: String): Long = {
    val f      = fs(spark, path)
    val logDir = new Path(s"$path/_log")
    if (!f.exists(logDir)) 0L
    else
      f.listStatus(logDir)
        .iterator
        .map(_.getPath.getName)
        .collect { case n if n.startsWith("v") && n.endsWith(".txt") => n.stripPrefix("v").stripSuffix(".txt").toLong }
        .foldLeft(0L)(math.max)
  }

  private[sources] def readManifest(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val f  = fs(spark, path)
    val in = f.open(manifestPath(path, version))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      .split("\n")
      .iterator
      .map(_.trim)
      .filter(_.nonEmpty)
      .toSeq
    finally in.close()
  }

  /** Stage `df` as a new immutable commit directory; returns the
    * relative file list. If the table has stats enabled
    * ([[enableStats]]), a per-file min/max/count sidecar for the
    * staged files is written BEFORE any commit attempt — data files
    * are immutable and stats are keyed by file, so sidecars are
    * race-free without being part of the commit point (a manifest can
    * only reference files whose stats already exist; orphaned
    * sidecars from aborted commits are inert).
    */
  private[sources] def stageData(spark: SparkSession, path: String, df: DataFrame): Seq[String] = {
    val commitDir = s"data/c-${java.util.UUID.randomUUID().toString.take(12)}"
    df.write.parquet(s"$path/$commitDir")
    val f = fs(spark, path)
    val rels = FsListing
      .listDataFiles(f, new Path(s"$path/$commitDir"))
      .map(st => s"$commitDir/${st.getPath.getName}")
    val checks = tableConstraints(spark, path)
    if (checks.nonEmpty) {
      // Enforce at the staging boundary so EVERY writer path (create /
      // append / overwrite / MERGE / copy-on-write and merge-on-read
      // mutations) upholds the invariant: no data file referenced by
      // any manifest may contain a violating row. Validation reads the
      // just-staged parquet (one columnar pass, all constraints in ONE
      // aggregate — the Quality.scala discipline) instead of
      // re-executing `df`'s plan; on violation the staged directory is
      // deleted and the commit never happens, so rejection is atomic.
      val counts = violationCounts(spark.read.parquet(s"$path/$commitDir"), checks)
      if (counts.exists(_._2 > 0L)) {
        f.delete(new Path(s"$path/$commitDir"), true)
        val msg = counts.filter(_._2 > 0L).map { case (n, c) => s"$n ($c rows)" }.mkString(", ")
        throw new IllegalStateException(s"constraint violation rejected commit to $path: $msg")
      }
    }
    val statsCols = statsConfig(spark, path)
    if (statsCols.nonEmpty) {
      import org.apache.spark.sql.functions._
      val staged = spark.read.parquet(s"$path/$commitDir")
      val aggs: Seq[org.apache.spark.sql.Column] =
        count(lit(1)).as("n_rows") +:
          statsCols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
      staged
        .groupBy(input_file_name().as("__f"))
        .agg(aggs.head, aggs.tail: _*)
        .withColumn("file", concat(lit(s"$commitDir/"), element_at(split(col("__f"), "/"), -1)))
        // which columns THIS sidecar actually recorded — readers must
        // not confuse "column not recorded here" (merged-schema NULL
        // after the stats column set changed) with "file is all-NULL
        // in this column" (safe to skip for any interval predicate)
        .withColumn("stat_cols", lit(statsCols.mkString(",")))
        .drop("__f")
        .coalesce(1)
        .write
        .parquet(s"$path/_stats/parts/${commitDir.stripPrefix("data/")}")
    }
    rels
  }

  // ----------------------------------------------------- per-file statistics

  private def statsConfig(spark: SparkSession, path: String): Seq[String] = {
    val f = fs(spark, path)
    val p = new Path(s"$path/_stats/config.txt")
    if (!f.exists(p)) Nil
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      finally in.close()
    }
  }

  /** Opt the table into per-file min/max/count statistics on
    * `statsCols`: every commit staged AFTER this call carries a stats
    * sidecar, and [[prunedRead]] uses it to skip range-disjoint files
    * — zone-map data skipping integrated with the transaction log, so
    * pruning composes with snapshot isolation and time travel (the
    * stats are per-FILE and files are immutable, so any version's
    * file list prunes with the same sidecars). Files committed before
    * enablement simply have no stats row and are read conservatively.
    */
  def enableStats(spark: SparkSession, path: String, statsCols: Seq[String]): Unit = {
    require(statsCols.nonEmpty, "enableStats needs at least one column")
    val f = fs(spark, path)
    f.mkdirs(new Path(s"$path/_stats"))
    val out = f.create(new Path(s"$path/_stats/config.txt"), true)
    try out.write(statsCols.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  // ----------------------------------------------------- CHECK constraints

  /** One aggregation pass counting, per named constraint, the rows that
    * VIOLATE it. SQL-standard CHECK semantics: a row violates only when
    * the predicate evaluates to FALSE — a NULL result passes (put an
    * explicit `x IS NOT NULL` in the predicate to forbid nulls).
    */
  private def violationCounts(df: DataFrame, checks: Seq[(String, String)]): Seq[(String, Long)] = {
    import org.apache.spark.sql.functions._
    val aggs = checks.map { case (name, pred) =>
      sum(when(expr(pred) <=> lit(false), 1L).otherwise(0L)).as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    checks.zipWithIndex.map { case ((name, _), i) => name -> (if (row.isNullAt(i)) 0L else row.getLong(i)) }
  }

  /** Declare named CHECK constraints (`name -> SQL predicate`) on the
    * table. Existing contents are validated first — like ADD
    * CONSTRAINT in ANSI SQL, declaring a constraint the current data
    * violates fails and leaves the table unconstrained. From then on
    * every staged commit is validated (see [[stageData]]) and a
    * violating write is rejected atomically, whatever the writer path.
    *
    * Scale: enforcement is one columnar aggregate over the NEW files
    * of each commit only — never a re-scan of the table — so a
    * constrained append costs one extra pass over the appended data.
    */
  def setConstraints(spark: SparkSession, path: String, checks: Seq[(String, String)]): Unit = {
    require(checks.nonEmpty, "setConstraints needs at least one (name, predicate)")
    require(
      checks.forall { case (n, p) => n.nonEmpty && !n.contains("\t") && p.nonEmpty && !p.contains("\n") },
      "constraint names must be tab-free and predicates newline-free"
    )
    if (latestVersion(spark, path) > 0L) {
      val bad = violationCounts(read(spark, path), checks).filter(_._2 > 0L)
      require(
        bad.isEmpty,
        s"existing rows violate: ${bad.map { case (n, c) => s"$n ($c rows)" }.mkString(", ")}"
      )
    }
    val f = fs(spark, path)
    f.mkdirs(new Path(s"$path/_constraints"))
    val out = f.create(new Path(s"$path/_constraints/config.txt"), true)
    try out.write(
      checks.map { case (n, p) => s"$n\t$p" }.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8)
    )
    finally out.close()
  }

  /** The table's declared CHECK constraints, empty when unconstrained. */
  def tableConstraints(spark: SparkSession, path: String): Seq[(String, String)] = {
    val f = fs(spark, path)
    val p = new Path(s"$path/_constraints/config.txt")
    if (!f.exists(p)) Nil
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .split("\n")
        .iterator
        .map(_.trim)
        .filter(_.nonEmpty)
        .map { l =>
          val i = l.indexOf('\t')
          require(i > 0, s"malformed constraint line in $p: $l")
          (l.substring(0, i), l.substring(i + 1))
        }
        .toSeq
      finally in.close()
    }
  }

  /** Remove all CHECK constraints (already-committed data keeps
    * satisfying them; future writes stop being validated).
    */
  def dropConstraints(spark: SparkSession, path: String): Unit = {
    val f = fs(spark, path)
    f.delete(new Path(s"$path/_constraints"), true)
  }

  /** Fold the accumulated per-commit stats sidecars into ONE — the
    * standing-index compaction discipline applied to the stats
    * surface: a long-lived table otherwise reads one tiny sidecar
    * directory per historical commit on every pruned read. Crash-safe
    * by write-order: the combined sidecar (restricted to files still
    * referenced by any live manifest) is written BEFORE the old
    * directories are removed, and duplicate rows for the same file
    * are harmless to readers (identical values, set-union semantics),
    * so any interruption leaves a correct, merely-uncompacted state.
    */
  def compactStats(spark: SparkSession, path: String): Unit = {
    val f     = fs(spark, path)
    val parts = new Path(s"$path/_stats/parts")
    if (!f.exists(parts)) return
    val existing = f.listStatus(parts).map(_.getPath)
    if (existing.length <= 1) return
    val latest = latestVersion(spark, path)
    val live = (1L to latest).flatMap { v =>
      if (f.exists(manifestPath(path, v))) readManifest(spark, path, v) else Nil
    }.toSet
    import org.apache.spark.sql.functions.col
    // mergeSchema: sidecars written under different enableStats column
    // sets must union their columns, not silently drop the ones absent
    // from whichever file Spark happens to sample for the schema
    val combined = spark.read
      .option("mergeSchema", "true")
      .parquet(existing.map(_.toString).toIndexedSeq: _*)
      .filter(col("file").isin(live.toSeq: _*))
      .dropDuplicates("file")
      .localCheckpoint(eager = true) // materialize fully BEFORE deleting sources
    combined
      .coalesce(1)
      .write
      .parquet(s"$path/_stats/parts/compact-${java.util.UUID.randomUUID().toString.take(12)}")
    existing.foreach(p => f.delete(p, true))
  }

  /** Survivor files of version `versionAsOf` (default latest) for the
    * interval predicate `column ∈ [lo, hi]`: a file is skipped only
    * when its recorded stats PROVE disjointness (all-NULL files can
    * never satisfy an interval and are skipped too); files with no
    * stats row are kept conservatively. Returns (survivors, total).
    */
  def pruneVersionFiles(
      spark: SparkSession,
      path: String,
      statCol: String,
      lo: Option[Any],
      hi: Option[Any],
      versionAsOf: Option[Long] = None
  ): (Seq[String], Long) = {
    import org.apache.spark.sql.functions.{array_contains, col, lit, split}
    val v     = versionAsOf.getOrElse(latestVersion(spark, path))
    require(v > 0, s"no table at $path")
    val files = splitManifest(readManifest(spark, path, v))._1
    val f     = fs(spark, path)
    val parts = new Path(s"$path/_stats/parts")
    if (!f.exists(parts) || f.listStatus(parts).isEmpty) return (files, files.length.toLong)
    // mergeSchema: sidecars written under different enableStats column
    // sets otherwise surface a missing min_<col> as NULL whenever Spark
    // samples a schema-bearing file — indistinguishable from a genuine
    // all-NULL file and silently pruning files that DO contain matches
    val st = spark.read.option("mergeSchema", "true").parquet(s"$path/_stats/parts/*")
    if (!st.columns.contains(s"min_$statCol")) return (files, files.length.toLong)
    // a NULL min proves "every row of this file is NULL in statCol"
    // ONLY when this sidecar row actually recorded statCol; legacy rows
    // without the stat_cols marker are kept conservatively
    val recorded =
      if (st.columns.contains("stat_cols"))
        col("stat_cols").isNotNull && array_contains(split(col("stat_cols"), ","), lit(statCol))
      else lit(false)
    val disjoint = col(s"min_$statCol").isNotNull &&
      (lo.map(x => col(s"max_$statCol") < lit(x)).getOrElse(lit(false)) ||
        hi.map(x => col(s"min_$statCol") > lit(x)).getOrElse(lit(false)))
    val allNullFile = col(s"min_$statCol").isNull && recorded
    // survivors by ANTI-JOIN of the manifest against the provably-
    // skippable sidecar rows (ordinal column preserves manifest
    // order): the executors hold the stats relation, the driver only
    // ever receives the survivor list it must return anyway — no
    // collected skip set, no O(#files) expression tree
    import spark.implicits._
    val filesDf = files.zipWithIndex.toDF("file", "__ord")
    val survivors = filesDf
      .join(st.filter(disjoint || allNullFile).select("file").distinct(), Seq("file"), "left_anti")
      .orderBy("__ord")
      .select("file")
      .collect()
      .map(_.getString(0))
      .toSeq
    (survivors, files.length.toLong)
  }

  /** Metadata-only COUNT(*): Σ sidecar `n_rows` over the version's
    * data files, minus the version's deletion-vector tombstones — the
    * O(manifest + DV) count a production table format serves without
    * touching a single data file. At 100 TB that is the difference
    * between an instant answer and a cluster-wide scan. REQUIRES
    * every data file of the version to carry a stats sidecar row
    * (tables that called [[enableStats]] before their first commit);
    * a partially-covered table is refused loudly — a count that is
    * silently wrong-or-slow depending on table history is worse than
    * no fast path.
    */
  def fastCount(spark: SparkSession, path: String, versionAsOf: Option[Long] = None): Long = {
    import org.apache.spark.sql.functions.{col, sum}
    val v = versionAsOf.getOrElse(latestVersion(spark, path))
    require(v > 0, s"no table at $path")
    val (files, dvLines) = splitManifest(readManifest(spark, path, v))
    if (files.isEmpty) return 0L
    val f     = fs(spark, path)
    val parts = new Path(s"$path/_stats/parts")
    require(
      f.exists(parts) && f.listStatus(parts).nonEmpty,
      s"fastCount on $path: no stats sidecars (enableStats before the first commit)"
    )
    // membership by JOIN against the manifest's file list, not an
    // `isin` literal: an In-expression over a 100 TB table's file
    // count bloats the expression tree and driver memory — the join
    // broadcasts the (tiny) local file-name relation instead
    import spark.implicits._
    val st = spark.read
      .option("mergeSchema", "true")
      .parquet(s"$path/_stats/parts/*")
      .select(col("file"), col("n_rows"))
      .join(files.toDF("file"), Seq("file"))
      .distinct()
    val rows = st.agg(sum("n_rows"), org.apache.spark.sql.functions.count(col("file"))).head()
    require(
      rows.getLong(1) == files.length.toLong,
      s"fastCount on $path: only ${rows.getLong(1)} of ${files.length} files carry sidecars — " +
        "count would silently fall back to a scan; enableStats predates no file of a fast-countable table"
    )
    val base = rows.getLong(0)
    val dvRows =
      if (dvLines.isEmpty) 0L
      else spark.read.parquet(dvLines.map(fileRef(path, _)): _*).count()
    base - dvRows
  }

  /** Stats-pruned snapshot read, optionally time-traveled: scan only
    * the surviving files of that version and re-apply the EXACT
    * interval predicate (pruning is a necessary condition only).
    */
  def prunedRead(
      spark: SparkSession,
      path: String,
      statCol: String,
      lo: Option[Any],
      hi: Option[Any],
      versionAsOf: Option[Long] = None
  ): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val (survivors, _) = pruneVersionFiles(spark, path, statCol, lo, hi, versionAsOf)
    val exact = lo.map(x => col(statCol) >= lit(x)).getOrElse(lit(true)) &&
      hi.map(x => col(statCol) <= lit(x)).getOrElse(lit(true))
    if (survivors.isEmpty) return read(spark, path, versionAsOf).filter(lit(false))
    // deletion vectors apply to pruned reads too: a DV row for a
    // pruned-away file simply never matches the anti-join
    val v   = versionAsOf.getOrElse(latestVersion(spark, path))
    val dvs = splitManifest(readManifest(spark, path, v))._2
    val schema = schemaAsOf(spark, path, v)
    val scanned =
      if (dvs.isEmpty) schema.map(spark.read.schema).getOrElse(spark.read).parquet(survivors.map(fileRef(path, _)): _*)
      else minusDv(spark, path, scanWithPos(spark, path, survivors, schema), dvs).drop("__graft_file", "__graft_pos")
    scanned.filter(exact)
  }

  /** Atomically publish `files` as version `version`. Returns false on
    * a lost race (the manifest already exists).
    *
    * The winner-selection primitive is scheme-dependent, because the
    * obvious `exists→rename` is NOT atomic everywhere: POSIX rename(2)
    * silently REPLACES an existing destination, so on `file:` two
    * racing committers would both "succeed" and one commit would
    * vanish (found by the real-concurrency stress test, not the
    * simulated races). On local filesystems the claim is therefore a
    * HARD LINK — `Files.createLink` is O_EXCL-atomic and makes the
    * complete manifest appear under the final name in one syscall; on
    * HDFS-like filesystems rename-without-replace is atomic and
    * returns false on an existing destination, which is the contract
    * the code relies on there.
    */
  private[graft] def tryCommit(spark: SparkSession, path: String, version: Long, files: Seq[String]): Boolean = {
    val f    = fs(spark, path)
    val tmp  = new Path(s"$path/_log/.tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val dest = manifestPath(path, version)
    f.mkdirs(new Path(s"$path/_log"))
    if (f.exists(dest)) return false
    val out = f.create(tmp, false)
    try out.write(files.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (f.getUri.getScheme == "file") {
      val won =
        try {
          java.nio.file.Files.createLink(
            java.nio.file.Paths.get(dest.toUri.getPath),
            java.nio.file.Paths.get(tmp.toUri.getPath)
          )
          true
        } catch {
          case _: java.nio.file.FileAlreadyExistsException => false
        }
      f.delete(tmp, false)
      won
    } else {
      val ok = f.rename(tmp, dest)
      if (!ok) f.delete(tmp, false)
      ok
    }
  }

  /** Create the table (version 1) from `df`. Fails if it exists. */
  def create(spark: SparkSession, path: String, df: DataFrame): Long = {
    require(latestVersion(spark, path) == 0L, s"table already exists at $path")
    val files = stageData(spark, path, df)
    require(
      tryCommit(spark, path, 1L, files ++ Seq(s"meta:${schemaLine(df)}", "meta:op:create")),
      s"concurrent create at $path"
    )
    1L
  }

  /** Append `df` as a new version: stage once, then commit with
    * retry — on a lost race the file list is re-derived from the NEW
    * latest version, so the append lands exactly once regardless of
    * interleaving.
    */
  def append(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      maxRetries: Int = 10,
      meta: Seq[String] = Nil
  ): Long = {
    require(meta.forall(m => m.nonEmpty && !m.contains("\n")), "meta payloads must be newline-free")
    // schema evolution gate BEFORE staging: adding columns is legal
    // (old files read them as NULL under the restamped schema); a type
    // change or drop would corrupt by-name resolution and is refused.
    // Only a CHANGED schema restamps — unchanged commits inherit via
    // the walk-down, keeping manifests lean.
    def schemaMetaAt(base: Long): Seq[String] = {
      val prior = schemaAsOf(spark, path, base).getOrElse(allNullable(read(spark, path, Some(base)).schema))
      requireEvolvable(prior, df.schema, path)
      if (allNullable(df.schema).json == prior.json) Nil else Seq(schemaLine(df))
    }
    val lv0 = latestVersion(spark, path)
    require(lv0 > 0, s"no table at $path (create first)")
    schemaMetaAt(lv0) // fast-fail BEFORE staging
    val newFiles = stageData(spark, path, df)
    var attempt  = 0
    while (attempt < maxRetries) {
      val base = latestVersion(spark, path)
      require(base > 0, s"no table at $path (create first)")
      // prior meta is commit-scoped — never copied forward; the schema
      // gate re-evaluates against THIS base so a raced widening from
      // another writer can neither be shadowed nor silently merged
      val files = readManifest(spark, path, base).filterNot(isMetaLine) ++
        newFiles ++ (("op:append" +: schemaMetaAt(base)) ++ meta).map("meta:" + _)
      if (tryCommit(spark, path, base + 1, files)) return base + 1
      attempt += 1
    }
    sys.error(s"append lost $maxRetries commit races at $path")
  }

  /** Replace the table contents (new version referencing only the new
    * files; history stays readable). NO retry on a race — an
    * overwrite that silently clobbers a concurrent commit would be a
    * lost update. Pass `expectedBase` (the version the caller READ
    * before deriving `df`) for full compare-and-swap semantics: the
    * commit refuses if anyone has advanced the table since.
    */
  def overwrite(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      expectedBase: Option[Long] = None,
      opName: String = "overwrite",
      meta: Seq[String] = Nil
  ): Long = {
    require(meta.forall(m => m.nonEmpty && !m.contains("\n")), "meta payloads must be newline-free")
    val newFiles = stageData(spark, path, df)
    val base     = latestVersion(spark, path)
    expectedBase.foreach(e =>
      require(base == e, s"concurrent commit: $path advanced from version $e to $base — re-read and retry")
    )
    // an overwrite may reshape the schema freely (its version references
    // only its own files), but then it must restamp — otherwise the
    // walk-down would serve a stale schema for this snapshot
    val schemaMeta =
      if (base > 0 && schemaAsOf(spark, path, base).exists(_.json == allNullable(df.schema).json)) Nil
      else Seq(schemaLine(df))
    val v = base + 1
    require(
      tryCommit(spark, path, v, newFiles ++ ((s"op:$opName" +: schemaMeta) ++ meta).map("meta:" + _)),
      s"overwrite of $path lost a race at version $v — re-read and retry"
    )
    v
  }

  /** Scan `dataLines` with the two merge-on-read bookkeeping columns
    * materialized from the parquet reader's metadata struct: `__file`
    * (the scheme-agnostic `data/c-<id>/<part>` suffix — stable across
    * table moves and shallow clones) and `__pos` (the row's index
    * within its immutable file). Costs nothing when unused: both are
    * per-row constants the reader already knows.
    */
  private[sources] def scanWithPos(
      spark: SparkSession,
      path: String,
      dataLines: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType] = None
  ): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    schema
      .map(spark.read.schema)
      .getOrElse(spark.read)
      .parquet(dataLines.map(fileRef(path, _)): _*)
      .withColumn("__graft_file", regexp_extract(col("_metadata.file_path"), "data/c-[^/]+/[^/]+$", 0))
      .withColumn("__graft_pos", col("_metadata.row_index"))
  }

  /** Subtract the deletion vectors `dvRels` from a [[scanWithPos]]
    * scan: ONE anti-join on `(__file, __pos)`. The DV side is
    * broadcast when its on-disk footprint is small (the common case —
    * a DV holds only deleted positions), decided from file sizes
    * alone so the plan choice costs zero jobs; a pathological
    * many-deletes DV falls back to a shuffle join that partitions on
    * the same key the scan naturally groups by.
    */
  private[sources] def minusDv(spark: SparkSession, path: String, scanned: DataFrame, dvRels: Seq[String]): DataFrame =
    if (dvRels.isEmpty) scanned
    else {
      import org.apache.spark.sql.functions.{broadcast, col}
      val f       = fs(spark, path)
      val dvPaths = dvRels.map(fileRef(path, _))
      val dvBytes = dvPaths.map(p => f.getContentSummary(new Path(p)).getLength).sum
      val dv0 = spark.read
        .parquet(dvPaths: _*)
        .select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
      val dv = if (dvBytes <= (64L << 20)) broadcast(dv0) else dv0
      scanned.join(dv, Seq("__graft_file", "__graft_pos"), "left_anti")
    }

  /** Read a snapshot: the latest version, or `versionAsOf`. Immutable
    * data files + per-version manifests make every historical snapshot
    * exactly reproducible. Deletion vectors committed by [[deleteMor]]
    * / [[updateMor]] are subtracted here (merge-on-read).
    */
  def read(spark: SparkSession, path: String, versionAsOf: Option[Long] = None): DataFrame = {
    val v = versionAsOf.getOrElse(latestVersion(spark, path))
    require(v > 0, s"no table at $path")
    val (data, dvs) = splitManifest(readManifest(spark, path, v))
    require(data.nonEmpty, s"version $v of $path is empty")
    // schema-in-log: read with THIS version's recorded schema — the
    // snapshot's schema is a property of the version, not of whichever
    // file the parquet reader samples. Files from before a widening
    // append lack the new columns and read as NULLs (by-name parquet
    // resolution); a time-traveled read below the widening gets the
    // narrow schema back. Also a scale point: zero footer inference —
    // at 100 TB, schema comes from one manifest walk, not file reads.
    val schema = schemaAsOf(spark, path, v)
    val reader = schema.map(spark.read.schema).getOrElse(spark.read)
    if (dvs.isEmpty) reader.parquet(data.map(fileRef(path, _)): _*)
    else minusDv(spark, path, scanWithPos(spark, path, data, schema), dvs).drop("__graft_file", "__graft_pos")
  }

  /** Resolve the newest version PUBLISHED at or before `tsMillis` —
    * timestamp time travel, the lake-format contract ("the table as
    * of last Tuesday 09:00"). The publication instant is the manifest
    * file's modification time: manifests are write-once (hard-link
    * publication, never rewritten), so the mtime IS the commit
    * instant, surviving restarts with zero extra bookkeeping.
    * Refuses loudly when the timestamp predates every SURVIVING
    * manifest — a vacuumed history cannot answer it, and a silent
    * clamp-to-earliest would misreport what existed then.
    * O(#versions) metadata listing, no data touched.
    */
  def versionAt(spark: SparkSession, path: String, tsMillis: Long): Long = {
    val f      = fs(spark, path)
    val logDir = new Path(s"$path/_log")
    require(f.exists(logDir), s"no table at $path")
    val stamps = f
      .listStatus(logDir)
      .iterator
      .collect {
        case st if st.getPath.getName.startsWith("v") && st.getPath.getName.endsWith(".txt") =>
          (st.getPath.getName.stripPrefix("v").stripSuffix(".txt").toLong, st.getModificationTime)
      }
      .toSeq
    require(stamps.nonEmpty, s"no table at $path")
    val eligible = stamps.filter(_._2 <= tsMillis)
    require(
      eligible.nonEmpty,
      s"timestamp $tsMillis predates the earliest surviving commit (${stamps.map(_._2).min}) of $path — " +
        "older history may have been vacuumed"
    )
    eligible.map(_._1).max
  }

  /** [[read]] at the version resolved by [[versionAt]]. */
  def readAt(spark: SparkSession, path: String, tsMillis: Long): DataFrame =
    read(spark, path, Some(versionAt(spark, path, tsMillis)))

  private val SchemaPrefix = "schema:"

  /** The schema recorded at or below version `v` (schema meta lines
    * are sticky: commits that cannot change the schema don't restamp
    * it, and [[latestMeta]] walks down to the newest one).
    */
  def schemaAsOf(spark: SparkSession, path: String, v: Long): Option[org.apache.spark.sql.types.StructType] =
    latestMeta(spark, path, SchemaPrefix, Some(v)).map { case (_, payload) =>
      org.apache.spark.sql.types.DataType
        .fromJson(payload.stripPrefix(SchemaPrefix))
        .asInstanceOf[org.apache.spark.sql.types.StructType]
    }

  // declared nullable throughout: parquet nullability is advisory on
  // read, and a widening append makes every pre-existing file NULL in
  // the new columns anyway
  private[sources] def allNullable(s: org.apache.spark.sql.types.StructType): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(s.fields.map(_.copy(nullable = true)))

  private def schemaLine(df: DataFrame): String = s"$SchemaPrefix${allNullable(df.schema).json}"

  /** Validate that `next` may follow `prior` as the table's schema:
    * columns may be ADDED (old files read them as NULL), but a shared
    * column's type can never change and existing columns can never be
    * dropped — either would silently corrupt by-name parquet
    * resolution of already-committed files.
    */
  private[sources] def requireEvolvable(
      prior: org.apache.spark.sql.types.StructType,
      next: org.apache.spark.sql.types.StructType,
      path: String
  ): Unit = {
    val nextByName = next.fields.map(f => f.name -> f.dataType).toMap
    prior.fields.foreach { f =>
      nextByName.get(f.name) match {
        case None =>
          throw new IllegalArgumentException(
            s"schema evolution on $path cannot DROP column '${f.name}' — committed files still carry it; write the full schema"
          )
        case Some(t) if t != f.dataType =>
          throw new IllegalArgumentException(
            s"schema evolution on $path cannot change '${f.name}' from ${f.dataType.simpleString} to ${t.simpleString}"
          )
        case _ => ()
      }
    }
  }

  /** Merge-on-read row DELETE: rows where `predicate` is TRUE (SQL
    * semantics — NULL keeps the row) are tombstoned by committing a
    * deletion vector of their `(file, row_index)` positions; NO data
    * file is rewritten. The copy-on-write [[delete]] pays O(size of
    * every touched file) per delete — ruinous when deletes are small
    * and scattered across a 100 TB table; this path pays O(deleted
    * rows) write + one small anti-join at read, and [[compact]]
    * materializes the tombstones away when read amplification
    * accumulates. Positions are keyed by immutable files, so a DV
    * composes safely with every later append; a delete matching
    * nothing commits nothing. History stays readable: `versionAsOf`
    * below the delete sees the rows until [[vacuum]].
    */
  def deleteMor(spark: SparkSession, path: String, predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.col
    val base = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val lines       = readManifest(spark, path, base)
    val (data, dvs) = splitManifest(lines)
    val hits = minusDv(spark, path, scanWithPos(spark, path, data, schemaAsOf(spark, path, base)), dvs)
      .filter(predicate)
      .select(col("__graft_file").as("file"), col("__graft_pos").as("pos"))
      .localCheckpoint(eager = true)
    if (hits.isEmpty) return base
    val dvRel = s"_dv/d-${java.util.UUID.randomUUID().toString.take(12)}"
    hits.coalesce(1).write.parquet(s"$path/$dvRel")
    val v = base + 1
    require(
      tryCommit(spark, path, v, lines.filterNot(isMetaLine) ++ Seq(s"dv:$dvRel", "meta:op:delete-mor")),
      s"deleteMor on $path lost a race at version $v"
    )
    v
  }

  /** Merge-on-read UPDATE: matched rows are tombstoned by a deletion
    * vector AND re-appended with each `set` column replaced (evaluated
    * on the old row) — one commit carries both, so readers atomically
    * flip from old to new rows. Same cost profile as [[deleteMor]]:
    * O(matched rows), never O(touched files). NULL predicate leaves
    * the row unchanged; a no-match update commits nothing.
    */
  def updateMor(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]
  ): Long = {
    import org.apache.spark.sql.functions.{coalesce, col, lit}
    require(set.nonEmpty, "updateMor needs at least one SET column")
    val base = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val lines       = readManifest(spark, path, base)
    val (data, dvs) = splitManifest(lines)
    val matched = minusDv(spark, path, scanWithPos(spark, path, data, schemaAsOf(spark, path, base)), dvs)
      .filter(coalesce(predicate, lit(false)))
      .localCheckpoint(eager = true)
    if (matched.isEmpty) return base
    // SET may only restate EXISTING columns: a new column here would
    // widen only the rewritten rows' files while the manifest still
    // mixes in narrow files under the unchanged recorded schema —
    // widen with append/overwrite, which restamp the schema
    require(
      set.keySet.subsetOf(matched.columns.toSet - "__graft_file" - "__graft_pos"),
      s"updateMor SET references columns not in the table: ${set.keySet -- matched.columns}"
    )
    val dvRel = s"_dv/d-${java.util.UUID.randomUUID().toString.take(12)}"
    matched.select(col("__graft_file").as("file"), col("__graft_pos").as("pos")).coalesce(1).write.parquet(s"$path/$dvRel")
    val rewritten = set.foldLeft(matched.drop("__graft_file", "__graft_pos")) { case (df, (c, e)) => df.withColumn(c, e) }
    val newFiles  = stageData(spark, path, rewritten)
    val v         = base + 1
    require(
      tryCommit(spark, path, v, data ++ newFiles ++ (dvs :+ dvRel).map("dv:" + _) :+ "meta:op:update-mor"),
      s"updateMor on $path lost a race at version $v"
    )
    v
  }

  /** ROLLBACK: commit a NEW version whose manifest is a byte-copy of
    * `version`'s — the table's latest state becomes the historical
    * snapshot again without moving a byte of data, and the rolled-back
    * versions remain readable (restore is itself just a commit, never
    * a history rewrite). Refused loudly if [[vacuum]] has already
    * reclaimed any file the target version references.
    */
  def restore(spark: SparkSession, path: String, version: Long): Long = {
    val latest = latestVersion(spark, path)
    require(version >= 1 && version <= latest, s"no version $version at $path (latest is $latest)")
    val f = fs(spark, path)
    require(
      f.exists(manifestPath(path, version)),
      s"cannot restore $path to version $version: its manifest was vacuumed"
    )
    val lines = readManifest(spark, path, version)
    val (data, dvs) = splitManifest(lines)
    (data ++ dvs).map(fileRef(path, _)).foreach { p =>
      require(f.exists(new Path(p)), s"cannot restore $path to version $version: $p was vacuumed")
    }
    val v = latest + 1
    // the restored commit's application meta (e.g. a JoinMv watermark)
    // is deliberately re-asserted; only the OP stamp describes THIS
    // commit, so the old one is replaced. The restored version's SCHEMA
    // must be re-asserted explicitly when its own manifest inherited it
    // (walk-down from the restore commit would otherwise serve a LATER
    // widening's schema for the rewound files)
    val schemaMeta =
      if (lines.exists(_.startsWith(s"meta:$SchemaPrefix"))) Nil
      else schemaAsOf(spark, path, version).map(s => s"meta:$SchemaPrefix${s.json}").toSeq
    require(
      tryCommit(
        spark,
        path,
        v,
        lines.filterNot(_.startsWith("meta:op:")) ++ schemaMeta :+ s"meta:op:restore-v$version"
      ),
      s"restore of $path lost a race at version $v"
    )
    v
  }

  /** Shallow (zero-copy) CLONE: create `dst` whose version-1 manifest
    * references `src`'s immutable files by absolute path — cloning any
    * table costs one manifest write regardless of data size, and the
    * clone immediately diverges independently (its own appends,
    * deletes, compactions land under `dst`). The clone shares fate
    * with the source's files: vacuuming `src` past the cloned version
    * breaks the clone (the lake-format contract); [[compact]] on the
    * clone localizes it, cutting the dependency.
    */
  def shallowClone(spark: SparkSession, src: String, dst: String, versionAsOf: Option[Long] = None): Long = {
    require(latestVersion(spark, dst) == 0L, s"table already exists at $dst")
    val v = versionAsOf.getOrElse(latestVersion(spark, src))
    require(v > 0, s"no table at $src")
    // a clone is a new table: the source commit's meta (watermarks etc.)
    // does not describe it and is dropped — EXCEPT the schema, which
    // describes the referenced files and must travel with them
    val abs = readManifest(spark, src, v).filterNot(isMetaLine).map { l =>
      if (isDvLine(l)) "dv:" + fileRef(src, l.stripPrefix("dv:")) else fileRef(src, l)
    }
    val schemaMeta = schemaAsOf(spark, src, v).map(s => s"meta:$SchemaPrefix${s.json}").toSeq
    require(tryCommit(spark, dst, 1L, abs ++ schemaMeta :+ "meta:op:clone"), s"concurrent create at $dst")
    1L
  }

  /** Copy-on-write row DELETE: rows where `predicate` is TRUE (SQL
    * DELETE semantics — NULL keeps the row) are removed by rewriting
    * ONLY the files that contain matches; untouched files carry over
    * into the new manifest by reference. A delete matching nothing
    * commits nothing and returns the current version, so replays are
    * free. History stays readable — the deleted rows remain visible
    * to `versionAsOf` until [[vacuum]].
    *
    * At 100 TB the touched-file discovery is one pruned scan (compose
    * with a zone-mapped layout to skip most files before even
    * looking); the rewrite cost is proportional to the touched files,
    * never the table.
    */
  def delete(spark: SparkSession, path: String, predicate: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, not}
    val base     = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val (files, dvLines) = splitManifest(readManifest(spark, path, base))
    require(
      dvLines.isEmpty,
      s"copy-on-write delete on $path: table carries deletion vectors — compact() first, or stay merge-on-read with deleteMor"
    )
    val rdr      = schemaAsOf(spark, path, base).map(spark.read.schema).getOrElse(spark.read)
    val absOf    = files.map(rel => fileRef(path, rel) -> rel).toMap
    val cur      = rdr.parquet(absOf.keys.toSeq: _*)
    val touchedAbs = cur
      .filter(predicate)
      .select(input_file_name())
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    if (touchedAbs.isEmpty) return base
    // input_file_name returns URIs (file:/...); match by suffix on the
    // known relative paths so the comparison is scheme-agnostic
    val touchedRel = files.filter(rel => touchedAbs.exists(_.endsWith(rel))).toSet
    val untouched  = files.filterNot(touchedRel)
    val kept = rdr
      .parquet(touchedRel.map(fileRef(path, _)).toSeq: _*)
      .filter(not(coalesce(predicate, lit(false))))
      .localCheckpoint(eager = true)
    val newFiles = stageData(spark, path, kept)
    val v        = base + 1
    require(tryCommit(spark, path, v, untouched ++ newFiles :+ "meta:op:delete"), s"delete on $path lost a race at version $v")
    v
  }

  /** Copy-on-write UPDATE: rows where `predicate` is TRUE get each
    * `set` column replaced by its expression (evaluated on the old
    * row); NULL predicate leaves the row unchanged (SQL semantics).
    * Same touched-file discipline as [[delete]]: only files containing
    * matches are rewritten, the rest carry over by reference, and a
    * no-match update commits nothing.
    */
  def update(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      set: Map[String, org.apache.spark.sql.Column]
  ): Long = {
    import org.apache.spark.sql.functions.{coalesce, input_file_name, lit, when}
    require(set.nonEmpty, "update needs at least one SET column")
    val base  = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val (files, dvLines) = splitManifest(readManifest(spark, path, base))
    require(
      dvLines.isEmpty,
      s"copy-on-write update on $path: table carries deletion vectors — compact() first, or stay merge-on-read with updateMor"
    )
    val rdr   = schemaAsOf(spark, path, base).map(spark.read.schema).getOrElse(spark.read)
    val cur   = rdr.parquet(files.map(fileRef(path, _)): _*)
    val touchedAbs = cur
      .filter(predicate)
      .select(input_file_name())
      .distinct()
      .collect()
      .map(_.getString(0))
      .toSet
    if (touchedAbs.isEmpty) return base
    val touchedRel = files.filter(rel => touchedAbs.exists(_.endsWith(rel))).toSet
    val untouched  = files.filterNot(touchedRel)
    val hit        = coalesce(predicate, lit(false))
    val rewritten = set
      .foldLeft(rdr.parquet(touchedRel.map(fileRef(path, _)).toSeq: _*)) { case (df, (c, e)) =>
        df.withColumn(c, when(hit, e).otherwise(org.apache.spark.sql.functions.col(c)))
      }
      .localCheckpoint(eager = true)
    val newFiles = stageData(spark, path, rewritten)
    val v        = base + 1
    require(tryCommit(spark, path, v, untouched ++ newFiles :+ "meta:op:update"), s"update on $path lost a race at version $v")
    v
  }

  /** Predicate-scoped atomic overwrite (the lake-format
    * `INSERT OVERWRITE … replaceWhere` contract, cf. Delta Lake's
    * replaceWhere option): in ONE commit, every current row matching
    * `predicate` is deleted and `rows` is inserted — the idempotent
    * backfill/refresh primitive ("swap this day's slice for the
    * recomputed one"). Every inserted row is REQUIRED to satisfy
    * `predicate` (one aggregate over `rows` before anything is
    * staged) — otherwise the op would leak rows outside its declared
    * scope and re-running the backfill would no longer be idempotent.
    * Touched-file discipline as [[delete]]: only files containing
    * matches are rewritten (their predicate-false rows kept), the
    * rest carry into the new manifest by reference — at 100 TB a
    * one-partition backfill costs O(that partition's files) +
    * O(new rows), never O(table). History stays readable
    * (time travel sees the pre-replace slice until vacuum). DV
    * tables are refused like the rest of the copy-on-write family;
    * `rows` must match the table schema exactly — a scoped replace
    * rewrites only part of the data, so it can never restamp the
    * schema the way a full [[overwrite]] may. CHECK constraints and
    * stats sidecars ride the shared staging boundary.
    */
  def replaceWhere(
      spark: SparkSession,
      path: String,
      predicate: org.apache.spark.sql.Column,
      rows: DataFrame
  ): Long = {
    import org.apache.spark.sql.functions.{coalesce, count, input_file_name, lit, not, sum, when}
    val base = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val (files, dvLines) = splitManifest(readManifest(spark, path, base))
    require(
      dvLines.isEmpty,
      s"replaceWhere on $path: table carries deletion vectors — compact() first"
    )
    val prior = schemaAsOf(spark, path, base).getOrElse(allNullable(read(spark, path, Some(base)).schema))
    require(
      allNullable(rows.schema).json == prior.json,
      s"replaceWhere on $path: inserted rows must match the table schema exactly " +
        s"(got ${rows.schema.simpleString}, table ${prior.simpleString})"
    )
    // scope gate: count rows that do NOT satisfy the predicate (NULL
    // counts as outside — it would survive the delete side untouched,
    // so admitting it would duplicate on re-run)
    val Array(nRows: Long, nOutside: Long) = rows
      .agg(
        count(lit(1)).as("n"),
        sum(when(not(coalesce(predicate, lit(false))), 1L).otherwise(0L)).as("bad")
      )
      .collect()
      .map(r => Array(r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1)))
      .head
    require(
      nOutside == 0L,
      s"replaceWhere on $path: $nOutside of $nRows inserted rows do not satisfy the replace predicate"
    )
    val rdr = spark.read.schema(prior)
    val touchedAbs =
      if (files.isEmpty) Set.empty[String]
      else
        rdr
          .parquet(files.map(fileRef(path, _)): _*)
          .filter(predicate)
          .select(input_file_name())
          .distinct()
          .collect()
          .map(_.getString(0))
          .toSet
    val touchedRel = files.filter(rel => touchedAbs.exists(_.endsWith(rel))).toSet
    val untouched  = files.filterNot(touchedRel)
    val kept =
      if (touchedRel.isEmpty) rows
      else
        rdr
          .parquet(touchedRel.map(fileRef(path, _)).toSeq: _*)
          .filter(not(coalesce(predicate, lit(false))))
          .unionByName(rows)
    val newFiles = stageData(spark, path, kept.localCheckpoint(eager = true))
    val v        = base + 1
    require(
      tryCommit(spark, path, v, untouched ++ newFiles :+ "meta:op:replace_where"),
      s"replaceWhere on $path lost a race at version $v — re-read and retry"
    )
    v
  }

  /** Incremental pull: the rows ADDED between two versions, computed
    * from the manifest diff alone (files present in `toVersion` but
    * not `fromVersion`) — the batch consumer's "what's new since my
    * last sync" read, costing one tiny manifest compare plus a scan of
    * only the new files. Exact for append-only histories; a rewrite
    * commit (overwrite/compact/delete/update) in the range makes
    * file-diff no longer mean row-diff, so those are refused loudly
    * rather than answered wrong (detected as: toVersion dropped files
    * that fromVersion had).
    */
  def changesBetween(spark: SparkSession, path: String, fromVersion: Long, toVersion: Long): DataFrame = {
    require(fromVersion <= toVersion, s"fromVersion $fromVersion > toVersion $toVersion")
    val (fromData, fromDv) =
      if (fromVersion == 0) (Set.empty[String], Set.empty[String])
      else { val (d, v) = splitManifest(readManifest(spark, path, fromVersion)); (d.toSet, v.toSet) }
    val (toData, toDv) = { val (d, v) = splitManifest(readManifest(spark, path, toVersion)); (d.toSet, v.toSet) }
    require(
      fromDv == toDv,
      s"versions $fromVersion..$toVersion of $path include a deletion-vector commit; file diff is not row diff — read snapshots instead"
    )
    require(
      fromData.subsetOf(toData),
      s"versions $fromVersion..$toVersion of $path include a rewrite commit; file diff is not row diff — read snapshots instead"
    )
    val added = (toData -- fromData).toSeq.sorted
    if (added.isEmpty) read(spark, path, Some(toVersion)).filter(org.apache.spark.sql.functions.lit(false))
    else
      schemaAsOf(spark, path, toVersion)
        .map(spark.read.schema)
        .getOrElse(spark.read)
        .parquet(added.map(fileRef(path, _)): _*)
  }

  /** Row-level CHANGE DATA FEED over `(fromVersion, toVersion]`: every
    * row change with its `_change_type` (`insert`, `delete`,
    * `update_preimage`, `update_postimage`) and `_commit_version` —
    * the log-structured-table CDF contract, derived with NO per-commit
    * change files: an append's changes are exactly its new files, and
    * a merge-on-read commit's pre-images are replayed from its
    * deletion vector against just the files the DV touches (positions
    * are keyed by IMMUTABLE files, so the pre-image read is exact at
    * any later time — this is why [[changesBetween]]'s refusal of DV
    * commits doesn't apply here). Row-preserving rewrites (op stamp
    * `compact*`: compaction, clustering, bin-packing) change files but
    * not rows and contribute nothing. Commits whose row diff is NOT
    * derivable from the manifest alone (copy-on-write
    * overwrite/delete/update, restore) are refused loudly rather than
    * answered wrong — consumers of such histories diff snapshots.
    *
    * Scale: cost is O(changed rows), never O(table) — an append
    * contributes a scan of only its appended files; a MOR commit scans
    * only its DV-touched files inner-joined to the DV (broadcast under
    * the same size heuristic as [[minusDv]]). The manifest walk is
    * O(versions) tiny text files on the driver. Downstream this is the
    * delete-aware delta source for incremental view maintenance
    * ([[DeltaRollup]]): inserts/post-images apply with weight +1,
    * deletes/pre-images with −1 — Blakeley et al.'s counting algorithm.
    */
  def rowChangesBetween(
      spark: SparkSession,
      path: String,
      fromVersion: Long,
      toVersion: Long
  ): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    require(0 <= fromVersion && fromVersion <= toVersion, s"bad version range $fromVersion..$toVersion")
    val latest = latestVersion(spark, path)
    require(toVersion <= latest, s"version $toVersion of $path does not exist (latest is $latest)")
    val f = fs(spark, path)
    ((fromVersion + 1) to toVersion).foreach { v =>
      require(f.exists(manifestPath(path, v)), s"version $v of $path was vacuumed; change feed unavailable")
    }
    val parts: Seq[DataFrame] = ((fromVersion + 1) to toVersion).flatMap { v =>
      val (pd, pv) =
        if (v == 1) (Seq.empty[String], Seq.empty[String])
        else splitManifest(readManifest(spark, path, v - 1))
      val (cd, cv)    = splitManifest(readManifest(spark, path, v))
      val addedData   = cd.filterNot(pd.toSet)
      val removedData = pd.filterNot(cd.toSet)
      val addedDv     = cv.filterNot(pv.toSet)
      val removedDv   = pv.filterNot(cv.toSet)
      val op = commitMeta(spark, path, v)
        .collectFirst { case m if m.startsWith("op:") => m.stripPrefix("op:") }
        .getOrElse("unknown")
      def stamped(df: DataFrame, tpe: String): DataFrame =
        df.withColumn("_change_type", lit(tpe)).withColumn("_commit_version", lit(v))
      def inserted(tpe: String): DataFrame =
        stamped(spark.read.parquet(addedData.map(fileRef(path, _)): _*), tpe)
      def preimages(tpe: String): DataFrame = {
        val dvPaths = addedDv.map(fileRef(path, _))
        val dv      = spark.read.parquet(dvPaths: _*)
        val touched = dv.select("file").distinct().collect().map(_.getString(0)).toSeq.sorted
        val keyed   = dv.select(col("file").as("__graft_file"), col("pos").as("__graft_pos"))
        val dvBytes = dvPaths.map(p => f.getContentSummary(new Path(p)).getLength).sum
        val side    = if (dvBytes <= (64L << 20)) broadcast(keyed) else keyed
        stamped(
          scanWithPos(spark, path, touched)
            .join(side, Seq("__graft_file", "__graft_pos"))
            .drop("__graft_file", "__graft_pos"),
          tpe
        )
      }
      if (removedData.nonEmpty || removedDv.nonEmpty) {
        if (op.startsWith("compact")) Nil // row-preserving rewrite: files change, rows don't
        else
          sys.error(
            s"rowChangesBetween $path v$v (op '$op'): rewrite commit — row diff is not derivable from the manifest; diff snapshots instead"
          )
      } else if (addedDv.nonEmpty && addedData.nonEmpty)
        Seq(preimages("update_preimage"), inserted("update_postimage"))
      else if (addedDv.nonEmpty) Seq(preimages("delete"))
      else if (addedData.nonEmpty) Seq(inserted("insert"))
      else Nil // metadata-only commit (e.g. restore to an identical manifest)
    }
    val empty = read(spark, path, Some(math.max(toVersion, 1L)))
      .filter(lit(false))
      .withColumn("_change_type", lit(""))
      .withColumn("_commit_version", lit(0L))
    parts.foldLeft(empty)(_.unionByName(_, allowMissingColumns = true))
  }

  /** The table as a STREAM of appends: every file a future commit adds
    * under `data/` becomes part of a later micro-batch (Spark's file
    * stream source tracks new files). Valid for append-only tables —
    * overwrite/compact/delete/update rewrite rows into NEW files,
    * which a file stream would re-emit as duplicates, so consumers of
    * mutating tables should read snapshots instead.
    */
  def readStream(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val (data, dvs) = splitManifest(readManifest(spark, path, latestVersion(spark, path)))
    require(
      dvs.isEmpty,
      s"streaming read of $path: table carries deletion vectors a file stream cannot subtract — compact() first"
    )
    require(
      data.forall(l => !l.startsWith("/") && !l.contains("://")),
      s"streaming read of $path: shallow clone references files outside $path/data a file stream would never see — compact() first"
    )
    val schema = read(spark, path).schema
    spark.readStream.schema(schema).parquet(s"$path/data/*")
  }

  /** Row-level SEMANTIC diff between two committed versions, computed
    * from table content alone — the audit/debug answer to "what
    * changed between v_a and v_b" for versions (or whole tables) that
    * predate a change-data feed. Multiset semantics: a row appearing
    * 3× in `toV` and 1× in `fromV` diffs as 2 inserts — `exceptAll`
    * both ways, tagged `op ∈ {delete, insert}`. Physical rewrites
    * (compaction, z-order, clustering) diff EMPTY by construction:
    * the diff is over content, never files.
    *
    * Scale: two hash-partitioned count-and-subtract aggregates over
    * the union of both versions (Spark plans exceptAll as a
    * per-row-count aggregate + replicate, one shuffle each on the full
    * row) — O(|v_a| + |v_b|), the honest cost of diffing arbitrary
    * versions without a feed. Tables WITH a change feed should use
    * [[graft.streaming.ChangeFeed]]'s O(changed rows) path instead.
    * Schema-evolved version pairs are refused loudly (a diff across a
    * schema change is not row-comparable).
    */
  def diffVersions(spark: SparkSession, path: String, fromV: Long, toV: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    require(fromV >= 1 && toV >= 1 && fromV != toV, s"diffVersions needs two distinct committed versions, got $fromV -> $toV")
    val a = read(spark, path, Some(fromV))
    val b = read(spark, path, Some(toV))
    require(
      a.schema.fields.map(f => (f.name, f.dataType)).sameElements(b.schema.fields.map(f => (f.name, f.dataType))),
      s"diffVersions on $path: schemas of v$fromV and v$toV differ — a diff across schema evolution is not row-comparable"
    )
    b.exceptAll(a)
      .withColumn("op", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("op", lit("delete")))
  }

  /** Fold the CURRENT file set into `targetFiles` compacted files and
    * commit as a new version. Old versions keep referencing the old
    * (still present) files — compaction never breaks time travel;
    * reclaiming space is [[vacuum]]'s explicitly destructive job.
    */
  def compact(spark: SparkSession, path: String, targetFiles: Int = 4): Long = {
    // CAS against the version the rewrite READ: a compaction is a
    // derived rewrite, so committing it after anyone else advanced the
    // table would silently drop their rows from the new latest (the
    // appender won its commit, then the compaction replaced the
    // contents with its pre-append snapshot). Pin the read version and
    // make overwrite refuse loudly on a raced base — the loser retries.
    val v0  = latestVersion(spark, path)
    val cur = read(spark, path, Some(v0)).coalesce(targetFiles)
    // localCheckpoint: materialize BEFORE staging so the rewrite never
    // reads files a concurrent vacuum might reclaim mid-job
    overwrite(spark, path, cur.localCheckpoint(eager = true), expectedBase = Some(v0), opName = "compact")
  }

  /** Cluster-compact: like [[compact]], but range-partitioned and
    * sorted on `clusterCols` — the OPTIMIZE-style rewrite that
    * RESTORES data-skipping power to a mutated table. Appends, MOR
    * deletes, and updates gradually interleave value ranges across
    * files until the stats sidecars prune nothing; one clustered
    * rewrite re-tightens every file's min/max (recorded at commit
    * time by [[stageData]] when stats are enabled) and folds any
    * deletion vectors away in the same commit.
    */
  def compactClustered(spark: SparkSession, path: String, clusterCols: Seq[String], targetFiles: Int = 8): Long = {
    require(clusterCols.nonEmpty, "compactClustered needs at least one cluster column")
    import org.apache.spark.sql.functions.col
    // version-pinned + CAS commit: see compact() — a clustered rewrite
    // must never silently replace a concurrently-appended version
    val v0 = latestVersion(spark, path)
    val cur = read(spark, path, Some(v0))
      .repartitionByRange(targetFiles, clusterCols.map(col): _*)
      .sortWithinPartitions(clusterCols.map(col): _*)
    overwrite(spark, path, cur.localCheckpoint(eager = true), expectedBase = Some(v0), opName = "compact-clustered")
  }

  /** OPTIMIZE ZORDER: [[compactClustered]] with a MULTI-dimensional
    * Morton (z-order) clustering key instead of a lexicographic one —
    * the lake-format `OPTIMIZE table ZORDER BY (a, b)` contract.
    * Lexicographic range clustering makes the FIRST column's
    * predicates prune and leaves the rest scattered; bit-interleaving
    * the dimensions keeps every file a small hyper-rectangle in ALL of
    * them, so per-file min/max stats sidecars prune multi-column
    * range predicates (see [[graft.operators.DataOps.zOrderValueN]]
    * and its rectangle-pruning spec). Each dimension is RANGE-
    * NORMALIZED to the full `bits`-wide domain before interleaving
    * (one min/max aggregate): raw interleaving is only balanced when
    * the dimensions have comparable magnitudes — a 50 000-id column
    * next to a 2 000-char column would own every high interleave bit
    * and the small dimension would never prune (observed at the sf1
    * gate; the production OPTIMIZE ZORDER implementations normalize
    * for exactly this reason). Integer columns only, per-dimension
    * range < 2^(63−bits) (overflow-guarded loudly); the transient z
    * column never lands in the table — partitioning and in-file order
    * are by z, the schema is unchanged. DVs are folded by the rewrite
    * exactly like [[compactClustered]]; stats sidecars re-tighten at
    * staging.
    */
  def compactZOrder(
      spark: SparkSession,
      path: String,
      zCols: Seq[String],
      targetFiles: Int = 8,
      bits: Int = 16
  ): Long = {
    require(zCols.size >= 2, s"compactZOrder needs >= 2 dimensions (use compactClustered for 1), got ${zCols.size}")
    require(zCols.size * bits <= 63, s"zCols*bits must fit a long, got ${zCols.size * bits}")
    import org.apache.spark.sql.functions.{col, expr, max, min}
    import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
    // version-pinned + CAS commit: see compact()
    val v0   = latestVersion(spark, path)
    val base = read(spark, path, Some(v0))
    // enforce the documented "integer columns only" contract loudly —
    // a float/string zCol would otherwise be silently cast to long
    // and cluster on truncated values
    val integral: Set[DataType] = Set(ByteType, ShortType, IntegerType, LongType)
    zCols.foreach { c =>
      val f = base.schema.fields
        .find(_.name == c)
        .getOrElse(throw new IllegalArgumentException(s"compactZOrder: no column $c in $path"))
      require(
        integral.contains(f.dataType),
        s"compactZOrder: $c is ${f.dataType.simpleString} — integer columns only (fixed-point your values first)"
      )
    }
    val aggs  = zCols.flatMap(c => Seq(min(col(c).cast("long")).as(s"__mn_$c"), max(col(c).cast("long")).as(s"__mx_$c")))
    val stats = base.agg(aggs.head, aggs.tail: _*).head()
    require(
      !stats.isNullAt(0),
      s"compactZOrder on $path: empty table (or all-NULL cluster column) — nothing to cluster"
    )
    val scaleMax = (1L << bits) - 1L
    val scaled = zCols.zipWithIndex.foldLeft(base) { case (df, (c, i)) =>
      require(
        !stats.isNullAt(2 * i) && !stats.isNullAt(2 * i + 1),
        s"compactZOrder on $path: cluster column $c is all-NULL — cannot range-normalize"
      )
      val mn    = stats.getLong(2 * i)
      val mx    = stats.getLong(2 * i + 1)
      val range = math.max(1L, mx - mn)
      require(
        range <= (Long.MaxValue / (scaleMax + 1)),
        s"compactZOrder: range of $c ($range) too wide for $bits-bit normalization"
      )
      df.withColumn(s"__zd$i", expr(s"CAST(((CAST($c AS BIGINT) - $mn) * $scaleMax) DIV $range AS BIGINT)"))
    }
    val zc = "__graft_z"
    val cur = scaled
      .withColumn(zc, graft.operators.DataOps.zOrderValueN(zCols.indices.map(i => s"__zd$i"), bits))
      .repartitionByRange(targetFiles, col(zc))
      .sortWithinPartitions(col(zc))
      .drop(zc +: zCols.indices.map(i => s"__zd$i"): _*)
    overwrite(spark, path, cur.localCheckpoint(eager = true), expectedBase = Some(v0), opName = "compact-zorder")
  }

  /** Bin-packing OPTIMIZE: rewrite ONLY the data files smaller than
    * `minBytes` into `targetFiles` packed files, carrying every
    * already-large file into the new manifest BY REFERENCE. This is
    * the real small-file compaction policy of production table formats
    * — after N streaming/CDC micro-commits a table holds N tiny files
    * whose per-file overhead (open, footer, task) dominates, but
    * rewriting the well-sized bulk (as [[compact]] does) would cost
    * O(table); this costs O(small files) regardless of table size.
    * Tables carrying deletion vectors are refused (a DV tombstones
    * (file, row) positions — rewriting a subset of files would
    * re-index rows out from under it); [[compact]] materializes DVs
    * away first. No-op (current version, no commit) when fewer than
    * two small files exist.
    */
  def compactSmall(
      spark: SparkSession,
      path: String,
      minBytes: Long = 8L << 20,
      targetFiles: Int = 1
  ): Long = {
    val base = latestVersion(spark, path)
    require(base > 0, s"no table at $path")
    val (files, dvLines) = splitManifest(readManifest(spark, path, base))
    require(
      dvLines.isEmpty,
      s"compactSmall on $path: table carries deletion vectors — compact() materializes them first"
    )
    val f = fs(spark, path)
    val (small, large) =
      files.partition(rel => f.getFileStatus(new Path(fileRef(path, rel))).getLen < minBytes)
    if (small.length < 2) return base
    val packed = spark.read
      .parquet(small.map(fileRef(path, _)): _*)
      .coalesce(targetFiles)
      // materialize before commit so the rewrite never reads files a
      // concurrent vacuum might reclaim mid-job (the compact() rule)
      .localCheckpoint(eager = true)
    val newFiles = stageData(spark, path, packed)
    val v        = base + 1
    require(
      tryCommit(spark, path, v, large ++ newFiles :+ "meta:op:compact-small"),
      s"compactSmall on $path lost a race at version $v — re-read and retry"
    )
    v
  }

  /** Delete data files referenced by NO version > `keepFrom` —
    * explicitly destroys time travel older than that version.
    *
    * `minAgeMs` is the concurrent-writer safety margin (the lake-format
    * retention rule): a committer STAGES its data files before its
    * manifest exists, so a vacuum racing an in-flight commit would see
    * those files as unreferenced and delete them out from under the
    * commit. Files younger than `minAgeMs` are therefore never
    * reclaimed — set it above the longest plausible staging-to-commit
    * window when writers may be live (a production default would be
    * hours); 0 keeps the single-writer immediate-reclaim behavior.
    */
  def vacuum(spark: SparkSession, path: String, keepFrom: Long, minAgeMs: Long = 0L): Unit = {
    val f      = fs(spark, path)
    val latest = latestVersion(spark, path)
    val cutoff = System.currentTimeMillis() - minAgeMs
    val live = (math.max(1L, keepFrom) to latest).flatMap { v =>
      if (f.exists(manifestPath(path, v))) readManifest(spark, path, v) else Nil
    }.toSet
    val all = FsListing.listDataFiles(f, new Path(s"$path/data"))
    all.foreach { st =>
      val p   = st.getPath
      val rel = p.toUri.getPath.stripPrefix(new Path(path).toUri.getPath).stripPrefix("/")
      if (!live.contains(rel) && st.getModificationTime <= cutoff) f.delete(p, false)
    }
    // drop manifests below keepFrom so a time-travel read fails loudly
    // instead of resolving to missing files
    (1L until math.max(1L, keepFrom)).foreach(v => f.delete(manifestPath(path, v), false))
    // reclaim stats sidecars of commits whose data files are all gone —
    // dead rows never surface in pruning (survivors start from the
    // manifest), but a long-lived table should not hoard them. Only
    // per-commit sidecars (named after their data/c-<id> directory) are
    // reclaimed by name; `compact-<id>` sidecars from [[compactStats]]
    // hold the stats of MANY live commits and must never be deleted
    // here — their dead rows are inert and the next compactStats drops
    // them.
    val parts = new Path(s"$path/_stats/parts")
    if (f.exists(parts)) {
      val liveCommits = live.map(_.split('/').take(2).mkString("/")) // data/c-<id>
      f.listStatus(parts).foreach { st =>
        val name = st.getPath.getName
        // same minAge guard: an in-flight commit writes its sidecar
        // before its manifest exists
        if (name.startsWith("c-") && !liveCommits.contains(s"data/$name") && st.getModificationTime <= cutoff)
          f.delete(st.getPath, true)
      }
    }
    // reclaim deletion vectors referenced by NO kept manifest (same
    // minAge guard: deleteMor/updateMor write the DV before the commit
    // point, so an in-flight mutation's DV must never be swept)
    val dvRoot = new Path(s"$path/_dv")
    if (f.exists(dvRoot)) {
      val liveDv = live.collect { case l if isDvLine(l) => l.stripPrefix("dv:") }
      f.listStatus(dvRoot).foreach { st =>
        if (!liveDv.contains(s"_dv/${st.getPath.getName}") && st.getModificationTime <= cutoff)
          f.delete(st.getPath, true)
      }
    }
  }
}
