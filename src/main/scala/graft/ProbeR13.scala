package graft

import org.apache.spark.sql.functions._

/** Round-13 scale probes (transient dev main; numbers land in SCALE.md):
  *   pagerank / pagerank_bucketed <dir>   — wall-time pair at 10x/100x
  *   betweenness_frontier <dir> <copies>  — seeds scale WITH the data
  *   skew <dir>                           — AQE skew split vs salted join vs unfenced
  *   shotbounds <dir>                     — multimodal_shot_bounds adjudication
  */
object ProbeR13 {
  private final class TaskStats extends org.apache.spark.scheduler.SparkListener {
    val durs = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
      if (te.taskInfo != null) durs.add(te.taskInfo.duration)
    def snapshotAndReset(): (Int, Long, Long) = {
      import scala.jdk.CollectionConverters._
      val xs = durs.asScala.toSeq.sorted
      durs.clear()
      if (xs.isEmpty) (0, 0L, 0L) else (xs.size, xs(xs.size / 2), xs.last)
    }
  }

  def main(args: Array[String]): Unit = {
    System.setProperty("graft.oracle.dump", "off")
    val mode = args(0)
    val dir  = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sp   = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus)
    val spark = GraftSession.builder(s"local[$cpus]", sp.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val stats = new TaskStats
    spark.sparkContext.addSparkListener(stats)

    def residue(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc()
    }
    def time(label: String)(f: => Unit): Unit = {
      val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
      val ts = (1 to reps).map { _ =>
        org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
        stats.snapshotAndReset()
        val t0 = System.nanoTime()
        f
        val dt = (System.nanoTime() - t0) / 1e9
        org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
        val (n, med, max) = stats.snapshotAndReset()
        println(f"PROBE $label dt=$dt%.2f tasks=$n task_med_ms=$med task_max_ms=$max")
        residue()
        dt
      }
      println(f"PROBE $label median=${ts.sorted.apply(ts.size / 2)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    mode match {
      case "pagerank" =>
        time("graph_pagerank")(noop(operators.Graph.partSupplierPageRank(spark, dir)))
      case "pagerank_bucketed" =>
        time("graph_pagerank_bucketed")(noop(operators.Graph.partSupplierPageRankBucketed(spark, dir)))
      case "pagerank_bucketed_split" =>
        // separate the amortized standing-table write from the
        // per-run co-partitioned iteration
        val t0 = System.nanoTime()
        operators.Graph.pageRankBucketedPrepare(operators.Graph.partSupplierEdges(spark, dir))
        println(f"PROBE pagerank_bucketed_prepare dt=${(System.nanoTime() - t0) / 1e9}%.2f")
        residue()
        time("pagerank_bucketed_iterate")(noop(operators.Graph.pageRankBucketedIterate(spark)))
      case "betweenness_frontier" =>
        import spark.implicits._
        val copies = args(2).toInt
        val seeds  = (0 until copies).map(i => (1L + i * 20000L) * 2L).toDF("node")
        time(s"betweenness_${copies}seeds")(
          noop(operators.Graph.betweenness(operators.Graph.partSupplierEdges(spark, dir), seeds))
        )
      case "shotbounds" =>
        println(operators.Multimodal.shotBoundaries(spark, dir).queryExecution.executedPlan.toString.take(4000))
        time("multimodal_shot_bounds")(noop(operators.Multimodal.shotBoundaries(spark, dir)))
      case "skew" =>
        // planted 30%-hot key over the probe lineitem slice, with an
        // incompressible payload carried through the join (bare keys
        // compress below AQE's skewedPartitionThreshold)
        // keep the demo on the shuffle path: BOTH broadcast thresholds
        // off (AQE's own runtime conversion would otherwise broadcast
        // the 100k-row dim and dodge the skewed shuffle entirely —
        // which IS the right plan for a small dim, but the probe
        // exercises the skew machinery a non-broadcastable side needs)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        sys.env.get("PROBE_SKEW_THRESHOLD").foreach { t =>
          spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", t)
          spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", t)
        }
        val li = spark.read.parquet(s"$dir/lineitem.parquet")
        val facts = li.select(
          when(col("l_orderkey") % 10 < 3, lit(1L)).otherwise(col("l_suppkey").cast("long")).as("k"),
          md5(concat_ws("#", col("l_orderkey"), col("l_partkey"))).as("payload")
        )
        // EAGERLY materialized (rebuilt untimed per rep — residue()
        // unpersists checkpoint blocks): with the distinct-aggregate
        // left inline, the join's dim side is Sort<-Agg<-ShuffleStage
        // and OptimizeSkewedJoin cannot replicate the matching
        // partitions through the agg — the rule needs the shuffle
        // directly under the sort on BOTH sides to split one and
        // duplicate the other
        def freshDim() = li.select(col("l_suppkey").cast("long").as("k")).distinct()
          .withColumn("dpay", md5(col("k").cast("string")))
          .localCheckpoint()
        def consume(joined: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
          val out = joined.agg(count(lit(1)).as("n"), avg(length(col("payload"))).as("alen"))
          out.collect().foreach(r => println(s"PROBE skew rows=${r.getLong(0)} alen=${r.getDouble(1)}"))
          out
        }
        val reps = sys.env.getOrElse("PROBE_REPS", "3").toInt
        def timeSkew(label: String, dumpPlan: Boolean)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
          val ts = (1 to reps).map { _ =>
            val dim = freshDim() // untimed standing side
            org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
            stats.snapshotAndReset()
            val t0   = System.nanoTime()
            val out  = f(dim)
            val dt   = (System.nanoTime() - t0) / 1e9
            org.apache.spark.GraftBenchShims.drainListenerBus(spark.sparkContext)
            val (n, med, max) = stats.snapshotAndReset()
            val plan          = out.queryExecution.executedPlan.toString
            println(f"PROBE $label dt=$dt%.2f tasks=$n task_med_ms=$med task_max_ms=$max " +
              "skew_markers=" + "skew=true".r.findAllIn(plan).size +
              " skewed_reads=" + "skewed".r.findAllIn(plan).size)
            if (dumpPlan)
              java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/skew_plan.txt"), plan)
            residue()
            dt
          }
          println(f"PROBE $label median=${ts.sorted.apply(ts.size / 2)}%.2f all=${ts.map(t => f"$t%.2f").mkString(",")}")
        }
        timeSkew("skew_plain_aqe", dumpPlan = true)(dim => consume(facts.join(dim, "k")))
        timeSkew("skew_salted16", dumpPlan = false)(dim => consume(operators.DataOps.saltedJoin(facts, dim, "k", salts = 16)))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        timeSkew("skew_plain_unfenced", dumpPlan = false)(dim => consume(facts.join(dim, "k")))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        // restore ALL four conf overrides together — leaving the AQE
        // broadcast threshold / skew thresholds set is harmless while
        // skew is the last act of the main, but a trap the moment
        // another probe mode chains after it in the same session
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      case other =>
        sys.error(s"unknown probe mode $other")
    }
    spark.stop()
  }
}
