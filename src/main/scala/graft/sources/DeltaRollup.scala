package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Delete-aware incrementally-maintained ROLLUP view over one
  * `graft-log` base table — the counting algorithm (Blakeley, Larson &
  * Tompa, SIGMOD 1986; deletions per Gupta & Mumick's IVM survey):
  *
  *   V = SELECT keys, sum(m)…, count(*) FROM base GROUP BY keys
  *
  * maintained from [[SnapshotTable.rowChangesBetween]] row deltas with
  * SIGNED weights — inserts and update-postimages apply +1, deletes
  * and update-preimages −1 — so merge-on-read DELETEs and UPDATEs
  * maintain the view without ever rescanning the base (the additive
  * tier [[graft.plans.MaterializedViews]] handles blind appends only;
  * this is the mutation-complete tier).
  *
  * The view itself is a `graft-log` table of signed GROUP PARTIALS:
  * each maintenance appends one group-level partial batch (O(Δ groups)
  * rows, never O(view)), with the base-version watermark riding the
  * SAME commit as a `meta:` line — atomic, so a crash between reading
  * the feed and committing re-applies the delta exactly once, the
  * [[JoinMv]] discipline. [[readRollup]] re-aggregates the partials
  * and drops groups whose live row count hits zero — a group vanishes
  * exactly when its last base row does, which pure-additive
  * maintenance cannot express. [[compactRollup]] folds accumulated
  * partials back to one batch (already-zero groups drop out of
  * storage there).
  *
  * Scale: build scans the base ONCE; every maintenance costs
  * O(changed rows) feed + one group-cardinality-bounded append; read
  * is O(outstanding partials), amortized back to O(groups) by
  * compaction. Measures must be SUM-decomposable (sums and counts;
  * avg = sum/count downstream) — min/max are not incrementally
  * maintainable under deletes without the full group and are refused
  * by construction since only `sum` is generated here.
  */
object DeltaRollup {

  private val WmPrefix = "rollupwm:"
  private val CntCol   = "__graft_cnt"

  private final case class Cfg(basePath: String, keys: Seq[String], measures: Seq[String])

  private def cfgPath(viewPath: String): Path = new Path(s"$viewPath/_rollup/config.txt")

  private def writeCfg(spark: SparkSession, viewPath: String, cfg: Cfg): Unit = {
    val f = new Path(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    f.mkdirs(new Path(s"$viewPath/_rollup"))
    val out = f.create(cfgPath(viewPath), true)
    try out.write(
      s"${cfg.basePath}\n${cfg.keys.mkString(",")}\n${cfg.measures.mkString(",")}\n"
        .getBytes(StandardCharsets.UTF_8)
    )
    finally out.close()
  }

  private def readCfg(spark: SparkSession, viewPath: String): Cfg = {
    val f  = new Path(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    val in = f.open(cfgPath(viewPath))
    val lines =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
    Cfg(lines(0), lines(1).split(",").toSeq, lines(2).split(",").toSeq)
  }

  /** The base version the view reflects. */
  def watermark(spark: SparkSession, viewPath: String): Long =
    SnapshotTable.latestMeta(spark, viewPath, WmPrefix) match {
      case Some((_, payload)) => payload.stripPrefix(WmPrefix).toLong
      case None =>
        sys.error(
          s"rollup view at $viewPath has no surviving watermark (vacuumed past the last " +
            "maintenance commit?) — rebuild the view"
        )
    }

  /** Signed partial of `rows` under `sign` (+1 / −1): one `sum(sign*m)`
    * per measure plus the signed live-row count. Integer sums stay
    * integer — the whole view replays bit-exact.
    */
  private def partial(rows: DataFrame, cfg: Cfg, sign: Column): DataFrame = {
    val aggs: Seq[Column] =
      cfg.measures.map(m => sum(col(m) * sign).as(s"sum_$m")) :+ sum(sign).as(CntCol)
    rows.groupBy(cfg.keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create the view at `viewPath` over the base's CURRENT version.
    * v1 = empty schema commit, v2 = seed partials WITH their watermark
    * in one commit (the [[JoinMv]] crash-safety shape).
    */
  def build(
      spark: SparkSession,
      viewPath: String,
      basePath: String,
      keys: Seq[String],
      measures: Seq[String]
  ): Long = {
    require(keys.nonEmpty && measures.nonEmpty, "need group keys and sum measures")
    val baseV = SnapshotTable.latestVersion(spark, basePath)
    require(baseV > 0, s"no base table at $basePath")
    val cfg  = Cfg(basePath, keys, measures)
    val seed = partial(SnapshotTable.read(spark, basePath, Some(baseV)), cfg, lit(1L))
    writeCfg(spark, viewPath, cfg)
    SnapshotTable.create(spark, viewPath, seed.limit(0))
    SnapshotTable.append(spark, viewPath, seed, meta = Seq(s"$WmPrefix$baseV"))
  }

  /** Fold every base commit since the watermark into the view: ONE
    * signed group partial over the row change feed, appended with the
    * new watermark in the same commit. No-op when the base hasn't
    * advanced. Refuses (via the feed) histories containing rewrites
    * whose row diff is underivable — compactions pass through as
    * zero-change commits.
    */
  def maintain(spark: SparkSession, viewPath: String): Long = {
    val cfg = readCfg(spark, viewPath)
    val wm  = watermark(spark, viewPath)
    val cur = SnapshotTable.latestVersion(spark, cfg.basePath)
    if (cur == wm) return SnapshotTable.latestVersion(spark, viewPath)
    val feed = SnapshotTable.rowChangesBetween(spark, cfg.basePath, wm, cur)
    val sign = when(col("_change_type").isin("insert", "update_postimage"), lit(1L)).otherwise(lit(-1L))
    val delta = partial(feed.withColumn("__sign", sign), cfg, col("__sign"))
    SnapshotTable.append(spark, viewPath, delta, meta = Seq(s"$WmPrefix$cur"))
  }

  /** The maintained rollup: re-aggregate outstanding partials, drop
    * zero-count groups. O(partials), never touches the base.
    */
  def readRollup(spark: SparkSession, viewPath: String): DataFrame = {
    val cfg  = readCfg(spark, viewPath)
    val aggs = cfg.measures.map(m => sum(col(s"sum_$m")).as(s"sum_$m")) :+ sum(col(CntCol)).as("n_rows")
    SnapshotTable
      .read(spark, viewPath)
      .groupBy(cfg.keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n_rows") > 0L)
  }

  /** Fold accumulated partials into one batch (and shed zero-count
    * groups from storage). CAS overwrite against the version the fold
    * was read at — loses deliberately to a concurrent maintenance
    * rather than clobbering its delta; the watermark rides the SAME
    * commit (overwrite strips prior meta, so it must).
    */
  def compactRollup(spark: SparkSession, viewPath: String): Long = {
    val base   = SnapshotTable.latestVersion(spark, viewPath)
    val wm     = watermark(spark, viewPath)
    val folded = readRollup(spark, viewPath)
      .withColumnRenamed("n_rows", CntCol)
      .localCheckpoint(eager = true)
    SnapshotTable.overwrite(
      spark,
      viewPath,
      folded,
      expectedBase = Some(base),
      opName = "compact-rollup",
      meta = Seq(s"$WmPrefix$wm")
    )
  }
}
