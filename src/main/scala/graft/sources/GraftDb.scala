package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Multi-table ACID transactions over `graft-log` tables — the
  * catalog-pointer design (an Iceberg-REST-catalog-style database
  * root, not a lock service): a DATABASE is a directory of member
  * tables plus its own versioned manifest whose lines pin one version
  * of every member (`tbl:<name>:<version>`). The database manifest
  * commit — the same hard-link CAS primitive every `graft-log` commit
  * uses — is the ONE atomic point for the whole transaction, which
  * buys what independent per-table logs cannot:
  *
  *   - **atomic cross-table visibility**: a reader resolving tables
  *     through [[snapshot]]/[[read]] flips from one consistent cut to
  *     the next in a single CAS — it can never observe table A with a
  *     transaction's append and table B without it;
  *   - **snapshot isolation**: a transaction reads every table at its
  *     entry cut; writes build on those SAME versions (branch-base
  *     commits below), so a concurrent writer's rows never bleed into
  *     this transaction's view mid-flight;
  *   - **write-write conflict detection, first committer wins**: the
  *     database CAS validates that no table in this transaction's
  *     WRITE SET moved since the cut; on conflict the transaction
  *     aborts cleanly, on disjoint write sets the retry folds the
  *     other winner's versions in and commits.
  *
  * The subtlety is ABORT with linear per-table logs: a transaction's
  * per-table commits happen before the database commit, so an aborted
  * (or crashed) transaction leaves member versions that no database
  * manifest references. Those are harmless BY CONSTRUCTION, because a
  * transaction's table writes derive from the CUT's version, never
  * from the member log's head ([[appendAt]]/[[deleteMorAt]]): version
  * numbers are mere unique ids, lineage is the database manifest's
  * chain of cuts — debris versions are simply never built upon
  * (exactly like orphaned data files from an aborted single-table
  * commit, reclaimable the same way). The corollary, stated loudly:
  * reading a member table DIRECTLY (`SnapshotTable.read` on its path)
  * is a dirty read that may see aborted-transaction versions — the
  * database snapshot is the isolation boundary, as with reading a
  * lake table's files without its catalog.
  *
  * Scale: a transaction costs its per-table commits (each O(changed
  * data) staging + one manifest CAS) plus ONE database CAS of an
  * O(members) text file. Nothing global, no coordinator state, no
  * locks; contention cost is optimistic-retry on the tiny database
  * manifest, and the validation reads only manifest version numbers.
  */
object GraftDb {

  private val TblPrefix = "tbl:"

  private def tablePath(dbPath: String, name: String): String = s"$dbPath/tables/$name"

  private def parseCut(lines: Seq[String]): Map[String, Long] =
    lines.collect { case l if l.startsWith(TblPrefix) =>
      val rest = l.stripPrefix(TblPrefix)
      val i    = rest.lastIndexOf(':')
      rest.take(i) -> rest.drop(i + 1).toLong
    }.toMap

  private def cutLines(cut: Map[String, Long]): Seq[String] =
    cut.toSeq.sortBy(_._1).map { case (n, v) => s"$TblPrefix$n:$v" }

  /** Create the database with initial member tables (each created as a
    * normal `graft-log` table at v1) and commit database version 1
    * pinning them.
    */
  def create(spark: SparkSession, dbPath: String, tables: Map[String, DataFrame]): Long = {
    require(tables.nonEmpty, "a database needs at least one member table")
    require(
      tables.keys.forall(n => n.nonEmpty && !n.contains('/') && !n.contains(':') && !n.contains('\n')),
      "table names must be non-empty and free of '/', ':' and newlines"
    )
    require(SnapshotTable.latestVersion(spark, dbPath) == 0L, s"database already exists at $dbPath")
    val cut = tables.map { case (name, df) =>
      name -> SnapshotTable.create(spark, tablePath(dbPath, name), df)
    }
    require(
      SnapshotTable.tryCommit(spark, dbPath, 1L, cutLines(cut) :+ "meta:op:db-create"),
      s"concurrent database create at $dbPath"
    )
    1L
  }

  /** The consistent cut of database version `versionAsOf` (default
    * latest): member name → pinned table version.
    */
  def snapshot(spark: SparkSession, dbPath: String, versionAsOf: Option[Long] = None): Map[String, Long] = {
    val v = versionAsOf.getOrElse(SnapshotTable.latestVersion(spark, dbPath))
    require(v > 0, s"no database at $dbPath")
    parseCut(SnapshotTable.readManifest(spark, dbPath, v))
  }

  /** Read member `name` through the database snapshot — the isolated
    * read path (direct `SnapshotTable.read` of the member is a dirty
    * read; see the class doc).
    */
  def read(spark: SparkSession, dbPath: String, name: String, versionAsOf: Option[Long] = None): DataFrame = {
    val cut = snapshot(spark, dbPath, versionAsOf)
    require(cut.contains(name), s"no table '$name' in database $dbPath (members: ${cut.keys.toSeq.sorted.mkString(", ")})")
    SnapshotTable.read(spark, tablePath(dbPath, name), Some(cut(name)))
  }

  /** Branch-base APPEND: content derives from `baseVersion`'s manifest
    * (NOT the log head — a concurrent or aborted transaction's
    * versions must never leak into this lineage); the version NUMBER
    * is whatever the log grants next, CAS-retried. Returns it.
    */
  private def appendAt(spark: SparkSession, path: String, baseVersion: Long, df: DataFrame): Long = {
    // same schema gate as SnapshotTable.append, validated against the
    // CUT version's schema (the lineage this commit derives from).
    // Branch-base commits ALWAYS stamp their resolved schema: the
    // member log is non-linear under transactions (debris/concurrent
    // versions interleave), so the walk-down inheritance linear logs
    // use could resolve through a NON-ANCESTOR — carrying the stamp on
    // every manifest removes the ambiguity.
    val resolved = SnapshotTable.schemaAsOf(spark, path, baseVersion) match {
      case Some(prior) =>
        SnapshotTable.requireEvolvable(prior, df.schema, path)
        if (SnapshotTable.allNullable(df.schema).json == prior.json) prior else SnapshotTable.allNullable(df.schema)
      case None => SnapshotTable.allNullable(df.schema)
    }
    val newFiles = SnapshotTable.stageData(spark, path, df)
    val base     = SnapshotTable.readManifest(spark, path, baseVersion)
    val lines = base.filterNot(SnapshotTable.isMetaLine) ++ newFiles ++
      Seq(s"meta:schema:${resolved.json}", "meta:op:txn-append")
    var v = SnapshotTable.latestVersion(spark, path) + 1
    while (!SnapshotTable.tryCommit(spark, path, v, lines)) v += 1
    v
  }

  /** Branch-base merge-on-read DELETE: the deletion vector is computed
    * against `baseVersion`'s state (snapshot isolation — rows a
    * concurrent transaction appended are invisible and untouched), and
    * the new manifest derives from `baseVersion`'s lines. A no-match
    * delete still commits (the transaction's cut must advance past the
    * write-set check uniformly). Returns the granted version.
    */
  private def deleteMorAt(spark: SparkSession, path: String, baseVersion: Long, predicate: Column): Long = {
    import org.apache.spark.sql.functions.col
    val lines       = SnapshotTable.readManifest(spark, path, baseVersion)
    val (data, dvs) = SnapshotTable.splitManifest(lines)
    val hits = SnapshotTable
      .minusDv(spark, path, SnapshotTable.scanWithPos(spark, path, data, SnapshotTable.schemaAsOf(spark, path, baseVersion)), dvs)
      .filter(predicate)
      .select(col("__graft_file").as("file"), col("__graft_pos").as("pos"))
      .localCheckpoint(eager = true)
    // carry the base's schema stamp forward (see appendAt: branch-base
    // manifests always carry their own schema)
    val schemaMeta = SnapshotTable
      .schemaAsOf(spark, path, baseVersion)
      .map(s => s"meta:schema:${s.json}")
      .toSeq
    val newLines =
      if (hits.isEmpty) lines.filterNot(SnapshotTable.isMetaLine) ++ schemaMeta :+ "meta:op:txn-delete"
      else {
        val dvRel = s"_dv/d-${java.util.UUID.randomUUID().toString.take(12)}"
        hits.coalesce(1).write.parquet(s"$path/$dvRel")
        lines.filterNot(SnapshotTable.isMetaLine) ++ Seq(s"dv:$dvRel") ++ schemaMeta :+ "meta:op:txn-delete"
      }
    var v = SnapshotTable.latestVersion(spark, path) + 1
    while (!SnapshotTable.tryCommit(spark, path, v, newLines)) v += 1
    v
  }

  /** Zero-copy BRANCH of the whole database at a cut: every member is
    * shallow-cloned at its pinned version (one manifest write each —
    * no data moves at any size), and the branch's own db manifest pins
    * the clones. The branch diverges independently from the first
    * transaction on; it shares fate with the source's files exactly
    * like a single-table clone (vacuuming the source past the branched
    * cut breaks it — detected loudly at read).
    */
  def branch(spark: SparkSession, srcDb: String, dstDb: String, versionAsOf: Option[Long] = None): Long = {
    require(SnapshotTable.latestVersion(spark, dstDb) == 0L, s"database already exists at $dstDb")
    val cut = snapshot(spark, srcDb, versionAsOf)
    val newCut = cut.map { case (name, v) =>
      name -> SnapshotTable.shallowClone(spark, tablePath(srcDb, name), tablePath(dstDb, name), Some(v))
    }
    require(
      SnapshotTable.tryCommit(spark, dstDb, 1L, cutLines(newCut) :+ "meta:op:db-branch"),
      s"concurrent database create at $dstDb"
    )
    1L
  }

  /** Reclaim storage the database no longer references: member
    * versions pinned by NO surviving db manifest ≥ `keepFromDb` — i.e.
    * aborted/raced transaction debris plus history below the retention
    * point — have their manifests and their no-longer-live data/DV
    * files deleted; db manifests below `keepFromDb` are dropped so a
    * time-traveled db read fails loudly instead of resolving to
    * missing members. `minAgeMs` is the SAME in-flight guard as
    * [[SnapshotTable.vacuum]]: an open transaction commits member
    * versions BEFORE the db CAS, so production callers must pass a
    * horizon comfortably above the longest transaction (the default 0
    * is the single-writer immediate-reclaim behavior).
    *
    * Cost: O(versions) manifest reads + one file listing per member —
    * metadata-sized at any data scale, like every vacuum here.
    */
  def vacuumDb(spark: SparkSession, dbPath: String, keepFromDb: Long, minAgeMs: Long = 0L): Unit = {
    import org.apache.hadoop.fs.Path
    val f        = SnapshotTable.fs(spark, dbPath)
    val latestDb = SnapshotTable.latestVersion(spark, dbPath)
    require(latestDb > 0, s"no database at $dbPath")
    val cutoff = System.currentTimeMillis() - minAgeMs
    val keep   = math.max(1L, keepFromDb)
    val cuts = (keep to latestDb).flatMap { v =>
      if (f.exists(SnapshotTable.manifestPath(dbPath, v))) Some(snapshot(spark, dbPath, Some(v))) else None
    }
    require(cuts.nonEmpty, s"vacuumDb would reclaim every cut of $dbPath — lower keepFromDb")
    val members = cuts.flatMap(_.keys).toSet
    members.foreach { name =>
      val path = tablePath(dbPath, name)
      val refd = cuts.flatMap(_.get(name)).toSet
      val live: Set[String] = refd.flatMap { v =>
        val (data, dvs) = SnapshotTable.splitManifest(SnapshotTable.readManifest(spark, path, v))
        data.toSet ++ dvs.map("dv:" + _)
      }
      // unreferenced member manifests (debris + pre-retention history)
      (1L to SnapshotTable.latestVersion(spark, path)).foreach { v =>
        val mp = SnapshotTable.manifestPath(path, v)
        if (!refd.contains(v) && f.exists(mp) && f.getFileStatus(mp).getModificationTime <= cutoff)
          f.delete(mp, false)
      }
      // data files referenced by no surviving member manifest
      val dataRoot = new Path(s"$path/data")
      if (f.exists(dataRoot)) FsListing.listDataFiles(f, dataRoot).foreach { st =>
        val rel = st.getPath.toUri.getPath.stripPrefix(new Path(path).toUri.getPath).stripPrefix("/")
        if (!live.contains(rel) && st.getModificationTime <= cutoff) f.delete(st.getPath, false)
      }
      // deletion vectors likewise
      val dvRoot = new Path(s"$path/_dv")
      if (f.exists(dvRoot)) f.listStatus(dvRoot).foreach { st =>
        if (!live.contains(s"dv:_dv/${st.getPath.getName}") && st.getModificationTime <= cutoff)
          f.delete(st.getPath, true)
      }
    }
    (1L until keep).foreach(v => f.delete(SnapshotTable.manifestPath(dbPath, v), false))
  }

  /** Thrown when the database CAS finds a member of this transaction's
    * write set advanced past the entry cut — first committer won.
    */
  final class WriteConflict(msg: String) extends RuntimeException(msg)

  /** One open transaction: reads see the entry cut; writes are
    * branch-base commits recorded in the write set, published (or not)
    * by [[transaction]]'s single database CAS.
    */
  final class Tx private[GraftDb] (spark: SparkSession, dbPath: String, val cut: Map[String, Long]) {
    private[GraftDb] var writes = Map.empty[String, Long]

    private def baseOf(name: String): Long = {
      require(cut.contains(name), s"no table '$name' in database $dbPath")
      writes.getOrElse(name, cut(name)) // read-your-own-writes within the txn
    }

    def read(name: String): DataFrame =
      SnapshotTable.read(spark, tablePath(dbPath, name), Some(baseOf(name)))

    def append(name: String, df: DataFrame): Unit =
      writes += name -> appendAt(spark, tablePath(dbPath, name), baseOf(name), df)

    def deleteWhere(name: String, predicate: Column): Unit =
      writes += name -> deleteMorAt(spark, tablePath(dbPath, name), baseOf(name), predicate)
  }

  /** Run `body` as one transaction and commit it atomically. The
    * database CAS retries while OTHER tables move (folding their
    * versions into the new cut) and aborts with [[WriteConflict]] the
    * moment any table in THIS write set moved — optimistic
    * concurrency, first committer wins, identical in spirit to the
    * per-table append retry but validated over the whole write set.
    * An exception from `body` (or a crash anywhere before the CAS)
    * aborts: the database manifest never points at the orphaned
    * member versions. Returns the new database version.
    */
  def transaction(spark: SparkSession, dbPath: String)(body: Tx => Unit): Long = {
    val entryDb = SnapshotTable.latestVersion(spark, dbPath)
    require(entryDb > 0, s"no database at $dbPath")
    val tx = new Tx(spark, dbPath, snapshot(spark, dbPath, Some(entryDb)))
    body(tx)
    if (tx.writes.isEmpty) return entryDb // read-only txn: nothing to publish
    var dbV = entryDb
    while (true) {
      val current = snapshot(spark, dbPath, Some(dbV))
      tx.writes.keys.foreach { name =>
        if (current(name) != tx.cut(name))
          throw new WriteConflict(
            s"transaction on $dbPath lost '$name' (cut v${tx.cut(name)}, now v${current(name)}) — first committer wins"
          )
      }
      val next = current ++ tx.writes
      if (SnapshotTable.tryCommit(spark, dbPath, dbV + 1, cutLines(next) :+ "meta:op:txn"))
        return dbV + 1
      dbV = SnapshotTable.latestVersion(spark, dbPath)
    }
    sys.error("unreachable")
  }
}
