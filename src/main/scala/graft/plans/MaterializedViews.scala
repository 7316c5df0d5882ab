package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  Attribute,
  AttributeReference,
  Cast,
  EqualTo,
  Expression,
  If,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression,
  Average,
  Count,
  Max,
  Min,
  Sum
}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Aggregate navigation: rewrite matching aggregates over a base table
  * onto a much smaller standing rollup (materialized view), via a
  * Catalyst [[Rule]] — the classic warehouse optimization that turns a
  * 100 TB fact scan into a few-MB rollup scan when the query only
  * wants covered dimensions and measures.
  *
  * Design:
  *   - The MV is an ADDITIVE parquet table: per dim-group partial
  *     aggregates (`sum_m`, `min_m`, `max_m`, `cnt_m` per measure,
  *     plus row count `cnt`), allowed to hold MULTIPLE rows per group.
  *     Readers always re-aggregate (sum of sums, min of mins), so
  *     incremental maintenance is a blind APPEND of the delta's
  *     partials — no read-modify-write, no transaction needed, the
  *     same additive-rows contract as the standing BM25 index stats.
  *     [[compactMv]] folds accumulated rows back to one per group with
  *     the crash-safe write-aside-then-swap discipline.
  *   - [[MvRewriteRule]] matches `Aggregate` plans (optionally through
  *     attribute-only `Project`s and dim-only `Filter`s) whose scan is
  *     the registered base, whose grouping keys ⊆ dims, and whose
  *     aggregates are sum/min/max/count/avg over covered measures (or
  *     count(*)), and rewrites them onto the MV relation: sum(m) →
  *     sum(sum_m), count(m) → sum(cnt_m), count(*) → sum(cnt),
  *     avg(m) → sum(sum_m)/sum(cnt_m) (null on zero count, matching
  *     Average's empty-group semantics under ANSI). Output attributes
  *     keep the ORIGINAL exprIds so the surrounding plan is untouched.
  *     Anything it cannot prove equivalent it leaves alone.
  *   - Correctness boundary: distinct aggregates, FILTER clauses,
  *     non-covered columns, non-attribute groupings and DECIMAL
  *     measures (whose Sum widens precision per level) all abort the
  *     rewrite. Regrouping partial double sums can differ from the
  *     direct sum in the last ulp — exact for integer-valued doubles
  *     and all integral types; callers owning FP-exactness pick their
  *     measures accordingly (the registered demo uses `l_quantity`).
  *   - Freshness is the registration contract: the MV answers for the
  *     base AS MAINTAINED — build + every delta appended via
  *     [[appendDelta]] alongside the base append. The MV relation is
  *     re-read at every rewrite (fresh exprIds per match, appended
  *     files visible immediately).
  */
object MaterializedViews {

  final case class MvDef(
      name: String,
      baseRoots: Set[String],
      mvPath: String,
      dims: Seq[String],
      measures: Seq[String],
      session: SparkSession
  )

  @volatile private[graft] var registry: Map[String, MvDef] = Map.empty

  /** Per-thread suspension so MV maintenance itself (whose deltas may
    * legitimately scan the base table) never routes through the MV.
    */
  private val suspended = new ThreadLocal[Boolean] { override def initialValue(): Boolean = false }

  private[graft] def suspend[T](body: => T): T = {
    suspended.set(true)
    try body
    finally suspended.set(false)
  }

  private def partials(df: DataFrame, dims: Seq[String], measures: Seq[String]): DataFrame = {
    val aggCols = measures.flatMap { m =>
      Seq(
        sum(col(m)).as(s"sum_$m"),
        min(col(m)).as(s"min_$m"),
        max(col(m)).as(s"max_$m"),
        count(col(m)).as(s"cnt_$m")
      )
    } :+ count(lit(1)).as("cnt")
    df.groupBy(dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** Build the rollup, register it, and install the rewrite rule into
    * the session. `basePath` must be the path the engine's queries
    * scan (root-path identity is how the rule recognizes the base).
    * By default the rollup covers the CURRENT base content; pass
    * `initial` to seed it from a slice instead (incremental-build
    * story: the remaining slices arrive via [[appendDelta]], and the
    * MV answers for base-as-maintained).
    */
  def buildMv(
      spark: SparkSession,
      name: String,
      basePath: String,
      dims: Seq[String],
      measures: Seq[String],
      mvPath: String,
      initial: Option[DataFrame] = None
  ): MvDef = {
    require(mvPath != basePath, "an MV cannot shadow its own base path")
    val base = spark.read.parquet(basePath)
    measures.foreach { m =>
      require(
        !base.schema(m).dataType.isInstanceOf[DecimalType],
        s"decimal measure $m unsupported: Sum widens decimal precision per level, re-aggregation would change the type"
      )
    }
    suspend { partials(initial.getOrElse(base), dims, measures).write.mode("overwrite").parquet(mvPath) }
    val roots = scanRoots(analyzedPlan(spark.read.parquet(basePath)))
      .getOrElse(sys.error(s"$basePath did not analyze to a single file scan"))
    val mv = MvDef(name, roots, mvPath, dims, measures, spark)
    registry = registry.updated(name, mv)
    install(spark)
    mv
  }

  /** Incremental maintenance: append the delta's partial aggregates as
    * NEW rows (the caller appends the same delta to the base). Pure
    * blind append — correctness comes from readers re-aggregating the
    * additive rows.
    */
  def appendDelta(name: String, delta: DataFrame): Unit = {
    val mv = registry.getOrElse(name, sys.error(s"unknown MV $name"))
    suspend { partials(delta, mv.dims, mv.measures).write.mode("append").parquet(mv.mvPath) }
  }

  /** Fold append-accumulated partial rows back to one per group.
    * Results are unchanged by construction (sum of sums re-associates;
    * min/max idempotent); the swap is write-aside-then-rename so a
    * crash leaves either the old or the complete new table.
    */
  def compactMv(name: String): Unit = {
    val mv    = registry.getOrElse(name, sys.error(s"unknown MV $name"))
    val spark = mv.session
    suspend {
      val cur       = spark.read.parquet(mv.mvPath)
      val hasIngest = cur.columns.contains("__ingest")
      val aggCols = mv.measures.flatMap { m =>
        Seq(
          sum(col(s"sum_$m")).as(s"sum_$m"),
          min(col(s"min_$m")).as(s"min_$m"),
          max(col(s"max_$m")).as(s"max_$m"),
          sum(col(s"cnt_$m")).as(s"cnt_$m")
        )
      } :+ sum(col("cnt")).as("cnt")
      val folded =
        cur.groupBy(mv.dims.map(col): _*).agg(aggCols.head, aggCols.tail: _*).localCheckpoint(eager = true)
      // a streaming-maintained MV keeps its partitioned layout (folded
      // rows land in __ingest=0) — mixing flat files into a partitioned
      // root would break partition discovery
      if (hasIngest)
        folded.withColumn("__ingest", lit(0L)).write.partitionBy("__ingest").mode("overwrite").parquet(mv.mvPath)
      else folded.write.mode("overwrite").parquet(mv.mvPath)
    }
  }

  /** Continuous maintenance: keep the rollup fresh from a stream of
    * base appends. Each micro-batch's partial aggregates land in their
    * own `__ingest=<batchId+1>` partition via DYNAMIC partition
    * overwrite, so a replayed batch (foreachBatch is at-least-once)
    * overwrites its own partition instead of double-counting —
    * batchId-keyed idempotence, the same stance as the engine's other
    * streaming sinks. The build seeds `__ingest=0`; readers aggregate
    * over dims and never look at `__ingest`, so the rewrite rule works
    * unchanged over a streaming-maintained MV. Run [[compactMv]] only
    * with the stream stopped (a replay into a compacted table would
    * re-introduce folded rows — the standing-index compaction
    * discipline).
    */
  def streamMaintain(
      name: String,
      stream: DataFrame,
      checkpoint: String
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val mv = registry.getOrElse(name, sys.error(s"unknown MV $name"))
    stream.writeStream
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        appendIngestPartition(mv, batch.toDF(), id + 1)
      }
      .start()
  }

  private def appendIngestPartition(mv: MvDef, delta: DataFrame, ingestId: Long): Unit = suspend {
    val spark = delta.sparkSession
    val prior = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try
      partials(delta, mv.dims, mv.measures)
        .withColumn("__ingest", lit(ingestId))
        .write
        .partitionBy("__ingest")
        .mode("overwrite")
        .parquet(mv.mvPath)
    finally prior match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None    => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }

  /** Build an MV destined for [[streamMaintain]]: identical rollup,
    * but the initial partials live in the `__ingest=0` partition so
    * later micro-batch partitions append beside them.
    */
  def buildStreamingMv(
      spark: SparkSession,
      name: String,
      basePath: String,
      dims: Seq[String],
      measures: Seq[String],
      mvPath: String,
      initial: Option[DataFrame] = None
  ): MvDef = {
    val mv = buildMv(spark, name, basePath, dims, measures, mvPath, initial)
    // rewrite the flat build into the partitioned layout
    suspend {
      val flat = spark.read.parquet(mvPath).localCheckpoint(eager = true)
      flat
        .withColumn("__ingest", lit(0L))
        .write
        .partitionBy("__ingest")
        .mode("overwrite")
        .parquet(mvPath)
    }
    mv
  }

  def drop(name: String): Unit = registry = registry - name

  def reset(): Unit = registry = Map.empty

  /** Install [[MvRewriteRule]] into the session's experimental
    * optimizations (idempotent) — same runtime-injection idiom as
    * [[RangeJoinOps]]; [[GraftExtensions]] injects it statically for
    * `spark.sql.extensions` deployments.
    */
  def install(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(MvRewriteRule)) {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ MvRewriteRule
    }
  }

  private def analyzedPlan(df: DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  private def scanRoots(plan: LogicalPlan): Option[Set[String]] = plan match {
    case LogicalRelation(hf: HadoopFsRelation, _, _, _, _) =>
      Some(hf.location.rootPaths.map(_.toString).toSet)
    case _ => None
  }

  object MvRewriteRule extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty || suspended.get()) plan
      else
        plan.transformUp { case agg: Aggregate =>
          rewrite(agg).getOrElse(agg)
        }

    /** Peel attribute-only Projects and collect Filters down to the
      * base scan; anything else disqualifies.
      */
    private def stripToScan(p: LogicalPlan, conds: Seq[Expression]): Option[(LogicalRelation, Seq[Expression])] =
      p match {
        case r: LogicalRelation => Some((r, conds))
        case Filter(c, ch)      => stripToScan(ch, conds :+ c)
        case Project(ps, ch) if ps.forall(_.isInstanceOf[AttributeReference]) => stripToScan(ch, conds)
        case _                  => None
      }

    private def rewrite(agg: Aggregate): Option[LogicalPlan] =
      for {
        (rel, conds) <- stripToScan(agg.child, Nil)
        roots        <- scanRoots(rel)
        // several MVs can stand over one base (different dim/measure
        // cover) — take the first that can actually answer this shape
        plan <- registry.values.view
          .filter(_.baseRoots == roots)
          .flatMap(mv => translate(agg, conds, mv))
          .headOption
      } yield plan

    private def translate(agg: Aggregate, conds: Seq[Expression], mv: MvDef): Option[LogicalPlan] = {
      val dimSet = mv.dims.toSet
      val groupingNames = agg.groupingExpressions.map {
        case a: AttributeReference if dimSet.contains(a.name) => a.name
        case _                                                => return None
      }
      if (!conds.forall(_.references.forall(r => dimSet.contains(r.name)))) return None

      // fresh relation per rewrite: fresh exprIds (two rewrites in one
      // plan must not alias), appended MV files visible immediately
      val mvPlan = analyzedPlan(mv.session.read.parquet(mv.mvPath))
      val mvAttr: Map[String, Attribute] = mvPlan.output.map(a => a.name -> a).toMap

      def sumOf(c: String): Expression = Sum(mvAttr(c)).toAggregateExpression()

      def translateAgg(fnExpr: AggregateExpression): Option[Expression] = {
        if (fnExpr.isDistinct || fnExpr.filter.nonEmpty) return None
        fnExpr.aggregateFunction match {
          case Sum(a: AttributeReference, _) if mv.measures.contains(a.name) =>
            Some(sumOf(s"sum_${a.name}"))
          case Min(a: AttributeReference) if mv.measures.contains(a.name) =>
            Some(Min(mvAttr(s"min_${a.name}")).toAggregateExpression())
          case Max(a: AttributeReference) if mv.measures.contains(a.name) =>
            Some(Max(mvAttr(s"max_${a.name}")).toAggregateExpression())
          case Count(Seq(l: Literal)) if l.value != null =>
            Some(coalesceZero(sumOf("cnt")))
          case Count(Seq(a: AttributeReference)) if mv.measures.contains(a.name) =>
            Some(coalesceZero(sumOf(s"cnt_${a.name}")))
          case Average(a: AttributeReference, _) if mv.measures.contains(a.name) =>
            val n = sumOf(s"sum_${a.name}")
            val d = sumOf(s"cnt_${a.name}")
            // avg = Σsum / Σcnt in double; explicit zero-count guard so
            // the empty group returns NULL instead of tripping ANSI
            // divide-by-zero
            Some(
              If(
                EqualTo(coalesceZero(d), Literal(0L)),
                Literal(null, DoubleType),
                org.apache.spark.sql.catalyst.expressions
                  .Divide(Cast(n, DoubleType), Cast(coalesceZero(d), DoubleType))
              )
            )
          case _ => None
        }
      }

      val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
        case a: AttributeReference if dimSet.contains(a.name) =>
          Alias(mvAttr(a.name), a.name)(exprId = a.exprId, qualifier = a.qualifier)
        case al @ Alias(a: AttributeReference, _) if dimSet.contains(a.name) =>
          Alias(mvAttr(a.name), al.name)(exprId = al.exprId, qualifier = al.qualifier)
        case al @ Alias(ae: AggregateExpression, _) =>
          translateAgg(ae) match {
            case Some(e) => Alias(e, al.name)(exprId = al.exprId, qualifier = al.qualifier)
            case None    => return None
          }
        case _ => return None
      }

      val remapped = conds.map(_.transformUp { case a: AttributeReference => mvAttr(a.name) })
      val child    = remapped.foldLeft(mvPlan)((p, c) => Filter(c, p))
      Some(Aggregate(groupingNames.map(mvAttr(_): Expression), newAggExprs, child))
    }

    private def coalesceZero(e: Expression): Expression =
      org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(e, Literal(0L)))
  }
}
