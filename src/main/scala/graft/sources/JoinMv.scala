package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained JOIN materialized view over two `graft-log`
  * base tables (delta-join view maintenance, the append-only case of
  * Blakeley/Larson/Tompa, "Efficiently Updating Materialized Views",
  * SIGMOD 1986):
  *
  *   V = A ⋈ B       maintained by      ΔV = ΔA ⋈ B_new  ∪  A_old ⋈ ΔB
  *
  * (ΔA joins the NEW B, old A joins ΔB — that covers ΔA ⋈ ΔB exactly
  * once). The view itself is a `graft-log` table, and each maintenance
  * commit carries its source watermark (the base-table versions the
  * view now reflects) as a `meta:` manifest line — ATOMIC with the
  * appended rows, so a crash between computing the delta and
  * committing leaves either both or neither: re-running maintenance
  * can never double-apply a delta. The watermark is read back by
  * walking manifests newest-first ([[SnapshotTable.latestMeta]]); if a
  * vacuum has reclaimed every watermark-carrying manifest, maintenance
  * fails LOUDLY instead of re-appending from version zero.
  *
  * Base deltas come from [[SnapshotTable.changesBetween]], which is
  * exact for append-only histories and refuses rewrite/DV commits —
  * the same contract streaming readers of these tables have.
  *
  * Scale: each maintenance pays |ΔA| ⋈ B (broadcast ΔA when small —
  * the hint below — so B never shuffles) plus A ⋈ |ΔB| (broadcast ΔB;
  * the A-side scan is the classic IVM floor, prunable further when A
  * is stats-enabled and the join key is clustered). Nothing ever
  * recomputes A ⋈ B from scratch after build.
  */
object JoinMv {

  private def cfgPath(viewPath: String): Path = new Path(s"$viewPath/_joinmv/config.txt")

  private final case class Cfg(aPath: String, bPath: String, keys: Seq[String])

  private def writeCfg(spark: SparkSession, viewPath: String, cfg: Cfg): Unit = {
    val f = new Path(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    f.mkdirs(new Path(s"$viewPath/_joinmv"))
    val out = f.create(cfgPath(viewPath), true)
    try out.write(
      s"${cfg.aPath}\n${cfg.bPath}\n${cfg.keys.mkString(",")}\n".getBytes(StandardCharsets.UTF_8)
    )
    finally out.close()
  }

  private def readCfg(spark: SparkSession, viewPath: String): Cfg = {
    val f  = new Path(viewPath).getFileSystem(spark.sessionState.newHadoopConf())
    val in = f.open(cfgPath(viewPath))
    val lines =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8).split("\n").toSeq
      finally in.close()
    Cfg(lines(0), lines(1), lines(2).split(",").toSeq)
  }

  private val WmPrefix = "joinmv:"

  private def wmPayload(vA: Long, vB: Long): String = s"$WmPrefix$vA,$vB"

  /** The (A-version, B-version) the view reflects, from the newest
    * surviving watermark commit.
    */
  def watermark(spark: SparkSession, viewPath: String): (Long, Long) =
    SnapshotTable.latestMeta(spark, viewPath, WmPrefix) match {
      case Some((_, payload)) =>
        val Array(a, b) = payload.stripPrefix(WmPrefix).split(",")
        (a.toLong, b.toLong)
      case None =>
        sys.error(
          s"join view at $viewPath has no surviving watermark (vacuumed past the last " +
            "maintenance commit?) — rebuild the view"
        )
    }

  /** Create the view at `viewPath` as A ⋈ B over the bases' CURRENT
    * versions. Column names must be disjoint apart from the join keys.
    */
  def build(spark: SparkSession, viewPath: String, aPath: String, bPath: String, keys: Seq[String]): Long = {
    require(keys.nonEmpty, "join keys must be non-empty")
    val vA = SnapshotTable.latestVersion(spark, aPath)
    val vB = SnapshotTable.latestVersion(spark, bPath)
    require(vA > 0 && vB > 0, s"both bases must exist ($aPath v$vA, $bPath v$vB)")
    val a = SnapshotTable.read(spark, aPath, Some(vA))
    val b = SnapshotTable.read(spark, bPath, Some(vB))
    val overlap = (a.columns.toSet & b.columns.toSet) -- keys
    require(overlap.isEmpty, s"non-key column collision between bases: $overlap")
    writeCfg(spark, viewPath, Cfg(aPath, bPath, keys))
    // v1 = empty schema commit, v2 = seed rows WITH their watermark in
    // one commit — a crash in between leaves an empty watermark-less
    // view that [[watermark]] rejects loudly, never a silently
    // half-seeded one
    SnapshotTable.create(spark, viewPath, a.join(b, keys).limit(0))
    SnapshotTable.append(spark, viewPath, a.join(b, keys), meta = Seq(wmPayload(vA, vB)))
  }

  /** Fold everything committed to either base since the last
    * build/maintenance into the view: one watermark-to-latest delta
    * join per side, appended with the new watermark in the SAME
    * commit. No-op (no new version) when neither base advanced.
    */
  def maintain(spark: SparkSession, viewPath: String): Long = {
    val cfg        = readCfg(spark, viewPath)
    val (vA, vB)   = watermark(spark, viewPath)
    val wA         = SnapshotTable.latestVersion(spark, cfg.aPath)
    val wB         = SnapshotTable.latestVersion(spark, cfg.bPath)
    if (wA == vA && wB == vB) return SnapshotTable.latestVersion(spark, viewPath)
    val dA   = SnapshotTable.changesBetween(spark, cfg.aPath, vA, wA)
    val dB   = SnapshotTable.changesBetween(spark, cfg.bPath, vB, wB)
    val bNew = SnapshotTable.read(spark, cfg.bPath, Some(wB))
    val aOld = SnapshotTable.read(spark, cfg.aPath, Some(vA))
    val delta = broadcast(dA)
      .join(bNew, cfg.keys)
      .unionByName(aOld.join(broadcast(dB), cfg.keys))
    SnapshotTable.append(spark, viewPath, delta, meta = Seq(wmPayload(wA, wB)))
  }

  /** The view's current contents. */
  def read(spark: SparkSession, viewPath: String): DataFrame =
    SnapshotTable.read(spark, viewPath)
}
