package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Plan-evidence demos for the two runtime optimizations that only
  * show up under the right data shape: runtime bloom-filter pushdown
  * (InjectRuntimeFilter) and AQE skew-join splitting. Both are pinned
  * on in [[graft.GraftSession]]; these demos arrange the data/size
  * conditions so the optimization actually fires and the plan proves
  * it (PLANS.md sections + PlanEvidenceSpec).
  *
  * The size gates are production-scale by default (10 GB application
  * side for bloom, 256 MB partitions for skew) — far above local
  * test data — so the demos lower the GATES, never change the
  * mechanism: the same plans materialize at 100 TB with default gates.
  */
object ScaleDemos {

  /** Selective-dimension fact join, broadcast disabled: the shape
    * where a runtime bloom filter built from the filtered orders keys
    * prunes lineitem AT THE SCAN before the shuffle — at 100 TB this
    * is the difference between shuffling the whole fact table and
    * shuffling the 0.1% that joins.
    */
  def bloomFilterJoin(spark: SparkSession, dir: String): DataFrame =
    Tables
      .lineitem(spark, dir)
      .join(
        Tables.orders(spark, dir).filter(col("o_totalprice") > 450000.0),
        col("l_orderkey") === col("o_orderkey")
      )
      .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 4).as("revenue"))

  /** Confs that let the bloom-filter injection fire on local-scale
    * data: broadcast off (a broadcast join needs no bloom filter) and
    * the application-side size gate at zero. Returns the previous
    * values for restoration.
    */
  def withBloomConfs[T](spark: SparkSession)(body: => T): T = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Deliberately skewed join: 60% of the fact rows share one hot key,
    * the dimension side is too big to broadcast. Without AQE skew
    * handling the hot key's shuffle partition serializes one task;
    * with it the final plan shows an AQEShuffleRead with skew-split
    * partitions. This complements [[graft.operators.DataOps.saltedJoin]] —
    * salting is the manual fix, AQE skew-split the automatic one.
    */
  def skewedJoin(spark: SparkSession, nRows: Long = 2000000L): DataFrame = {
    // payload is hash-valued and aggregated AFTER the join so column
    // pruning can't drop it: a hot partition of bare repeated keys
    // compresses to almost nothing in the shuffle files and would duck
    // under the skew size threshold — real skewed rows carry payload
    val fact = spark
      .range(nRows)
      .select(when(col("id") % 10 < 6, 0L).otherwise(col("id")).as("k"), xxhash64(col("id")).as("payload"))
    val dim = spark.range(nRows / 2).select(col("id").as("k"), (col("id") * 7).as("dval"))
    fact
      .join(dim, "k")
      .agg(count(lit(1)).as("n"), sum("dval").as("s"), avg("payload").as("p"))
  }

  /** Confs that let AQE's skew split trigger at local data volume:
    * the production 256 MB partition threshold shrinks to 1 MB (the
    * skew FACTOR, 5× median, is untouched) and broadcast is off so
    * the join shuffles. Returns previous values for restoration.
    */
  def withSkewConfs[T](spark: SparkSession)(body: => T): T = {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1MB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "64KB"
    )
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
