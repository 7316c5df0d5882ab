package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Scale stance (SURVEY.md §7, BASELINE.json north star): AQE on for
  * runtime re-planning (skew joins, partition coalescing), shuffle
  * partitions sized for the local harness (a real cluster overrides via
  * spark-submit), nanos-as-long so the `events` table (parquet
  * TIMESTAMP(NANOS)) is readable — the engine normalizes it to a proper
  * timestamp column in [[Tables.events]].
  */
object GraftSession {

  /** Confs every entry point (Verify, Bench, tests) must share. */
  val requiredConfs: Seq[(String, String)] = Seq(
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // parquet pushdown/pruning are on by default; pinned here as a
    // statement of intent (the 100 TB design depends on them).
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true",
    // runtime bloom-filter pushdown for selective joins (AQE-era)
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    // managed tables (bucketed-join surface) live outside the repo
    "spark.sql.warehouse.dir" -> "/tmp/graft_warehouse"
  )

  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.ui.enabled", "false")
    requiredConfs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
  }

  def local(cores: Int = 32): SparkSession = {
    val spark = builder(s"local[$cores]", math.max(cores, 8)).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.register(spark)
    spark
  }

  /** Apply graft confs + custom function registration to an existing
    * session (used by Verify/Bench whose builder the driver owns).
    */
  def prepare(spark: SparkSession): SparkSession = {
    requiredConfs.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: Throwable => () } // static confs (nanosAsLong) must be set at build time
    }
    GraftFunctions.register(spark)
    spark
  }
}
