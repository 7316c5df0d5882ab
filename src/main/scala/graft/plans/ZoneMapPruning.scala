package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  AttributeReference,
  EqualTo,
  Expression,
  GreaterThan,
  GreaterThanOrEqual,
  LessThan,
  LessThanOrEqual,
  Literal,
  NamedExpression
}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.ZoneMap

/** Transparent file skipping: a Catalyst [[Rule]] that recognizes
  * range/point filters over a REGISTERED zone-mapped layout and swaps
  * the relation for one over only the surviving files — the explicit
  * [[ZoneMap.prunedRead]] API elevated to an automatic plan rewrite,
  * the same design as [[MaterializedViews.MvRewriteRule]]: queries
  * keep reading the plain data path; registration makes the manifest
  * an optimizer asset.
  *
  * Matching: `Filter` directly over the registered scan (where
  * Catalyst's own pushdown leaves it), conjuncts of
  * `attr {=, <, <=, >, >=} literal` (either side) on NUMERIC or
  * STRING stats columns. `<`/`>` widen to closed bounds — pruning
  * only needs a necessary condition — and the original Filter stays
  * on top of the rewritten scan, so unmatched conjuncts, residual
  * exactness, and NULL semantics are untouched. Output attributes
  * keep their exprIds via an aliasing Project, so the surrounding
  * plan never notices. The rewritten relation's root paths are the
  * survivor files, not the registered data root, so the rule cannot
  * re-fire on its own output.
  */
object ZoneMapPruning {

  final case class ZmDef(name: String, dataRoots: Set[String], path: String, statsCols: Set[String], session: SparkSession)

  @volatile private[graft] var registry: Map[String, ZmDef] = Map.empty

  /** Register a layout written by [[ZoneMap.writeWithZoneMap]] so the
    * rule recognizes scans of `<path>/data`.
    */
  def register(spark: SparkSession, name: String, path: String, statsCols: Seq[String]): ZmDef = {
    val roots = analyzed(spark.read.parquet(s"$path/data")) match {
      case LogicalRelation(hf: HadoopFsRelation, _, _, _, _) => hf.location.rootPaths.map(_.toString).toSet
      case other                                             => sys.error(s"$path/data did not analyze to a file scan: ${other.nodeName}")
    }
    val zm = ZmDef(name, roots, path, statsCols.toSet, spark)
    registry = registry.updated(name, zm)
    install(spark)
    zm
  }

  def drop(name: String): Unit = registry = registry - name
  def reset(): Unit            = registry = Map.empty

  def install(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(ZoneMapPruneRule)) {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ ZoneMapPruneRule
    }
    if (!s.experimental.extraOptimizations.contains(ZoneMapAggRule)) {
      s.experimental.extraOptimizations = s.experimental.extraOptimizations :+ ZoneMapAggRule
    }
  }

  private def analyzed(df: org.apache.spark.sql.DataFrame): LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  object ZoneMapPruneRule extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else
        plan.transformUp { case f @ Filter(cond, rel: LogicalRelation) =>
          prune(f, cond, rel).getOrElse(f)
        }

    private def splitConjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
      case other     => Seq(other)
    }

    private def litValue(l: Literal): Option[Any] = l.value match {
      case null           => None
      case u: UTF8String  => Some(u.toString)
      case v              => Some(v)
    }

    /** (col, isLower, value) bounds from one conjunct, if extractable. */
    private def bounds(e: Expression, stats: Set[String]): Seq[(String, Boolean, Any)] = {
      def ok(a: AttributeReference) =
        // DecimalType is excluded although numeric: its literal values
        // are catalyst Decimals that `lit()` cannot re-wrap inside the
        // probe, and throwing INSIDE an optimizer rule would break the
        // query instead of just skipping the pruning
        stats.contains(a.name) &&
        ((a.dataType.isInstanceOf[NumericType] && !a.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType]) ||
          a.dataType == StringType)
      e match {
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) if ok(a) =>
          litValue(l).map(v => (a.name, true, v)).toSeq
        case GreaterThan(a: AttributeReference, l: Literal) if ok(a) =>
          litValue(l).map(v => (a.name, true, v)).toSeq
        case LessThanOrEqual(a: AttributeReference, l: Literal) if ok(a) =>
          litValue(l).map(v => (a.name, false, v)).toSeq
        case LessThan(a: AttributeReference, l: Literal) if ok(a) =>
          litValue(l).map(v => (a.name, false, v)).toSeq
        case EqualTo(a: AttributeReference, l: Literal) if ok(a) =>
          litValue(l).toSeq.flatMap(v => Seq((a.name, true, v), (a.name, false, v)))
        // flipped literal-first forms
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) if ok(a) =>
          litValue(l).map(v => (a.name, false, v)).toSeq
        case GreaterThan(l: Literal, a: AttributeReference) if ok(a) =>
          litValue(l).map(v => (a.name, false, v)).toSeq
        case LessThanOrEqual(l: Literal, a: AttributeReference) if ok(a) =>
          litValue(l).map(v => (a.name, true, v)).toSeq
        case LessThan(l: Literal, a: AttributeReference) if ok(a) =>
          litValue(l).map(v => (a.name, true, v)).toSeq
        case EqualTo(l: Literal, a: AttributeReference) if ok(a) =>
          litValue(l).toSeq.flatMap(v => Seq((a.name, true, v), (a.name, false, v)))
        case _ => Nil
      }
    }

    /** Equality conjuncts on bloom-covered columns, for point pruning
      * beyond what min/max can do on unclustered columns.
      */
    private def pointPredicates(e: Expression, bloomCols: Set[String]): Seq[(String, Any)] = e match {
      case EqualTo(a: AttributeReference, l: Literal) if bloomCols.contains(a.name) =>
        litValue(l).map(v => (a.name, v)).toSeq
      case EqualTo(l: Literal, a: AttributeReference) if bloomCols.contains(a.name) =>
        litValue(l).map(v => (a.name, v)).toSeq
      case _ => Nil
    }

    private def prune(f: Filter, cond: Expression, rel: LogicalRelation): Option[LogicalPlan] = {
      val roots = rel.relation match {
        case hf: HadoopFsRelation => hf.location.rootPaths.map(_.toString).toSet
        case _                    => return None
      }
      val zm        = registry.values.find(_.dataRoots == roots).getOrElse(return None)
      val conjuncts = splitConjuncts(cond)
      val bs        = conjuncts.flatMap(bounds(_, zm.statsCols))
      // bloom columns are discovered from the manifest schema, so a
      // layout built without blooms simply contributes no point pruning
      val bloomCols = zm.session.read
        .parquet(s"${zm.path}/zonemap")
        .columns
        .collect { case c if c.startsWith("bloom_") => c.stripPrefix("bloom_") }
        .toSet
      val points = conjuncts.flatMap(pointPredicates(_, bloomCols))
      if (bs.isEmpty && points.isEmpty) return None
      // conservative interval per column: ANY lower bound and ANY upper
      // bound are each necessary, so pass one of each (tightest would
      // need type-aware max/min; a single bound per side already prunes)
      val ranges: Seq[(String, Option[Any], Option[Any])] = bs
        .groupBy(_._1)
        .toSeq
        .map { case (c, xs) =>
          (c, xs.find(_._2).map(_._3), xs.find(!_._2).map(_._3))
        }
      val (rangeSurvivors, total) =
        if (ranges.nonEmpty) ZoneMap.pruneFiles(zm.session, zm.path, ranges)
        else {
          val all = zm.session.read.parquet(s"${zm.path}/zonemap").select("file").collect().map(_.getString(0)).toSeq
          (all, all.length.toLong)
        }
      // every point predicate is independently necessary: intersect
      val survivors = points.foldLeft(rangeSurvivors) { case (acc, (c, v)) =>
        val (pointSurv, _) = ZoneMap.pruneFilesPoint(zm.session, zm.path, c, v)
        acc.filter(pointSurv.toSet)
      }
      if (survivors.length >= total) None
      else if (survivors.isEmpty) Some(LocalRelation(rel.output))
      else {
        val newPlan = analyzed(zm.session.read.parquet(survivors: _*))
        val byName  = newPlan.output.map(a => a.name -> a).toMap
        val aliases: Seq[NamedExpression] = rel.output.map { o =>
          Alias(byName(o.name), o.name)(exprId = o.exprId, qualifier = o.qualifier)
        }
        Some(Filter(cond, Project(aliases, newPlan)))
      }
    }
  }

  /** Metadata-only aggregation: a GLOBAL (no GROUP BY) Aggregate of
    * only `count(*)` / `min(statsCol)` / `max(statsCol)` over a
    * registered zone-mapped scan is answered from the standing
    * manifest alone — count(*) = Σ n_rows, min(c) = min(min_c),
    * max(c) = max(max_c). The OptimizeMetadataOnlyQuery idea
    * generalized to the explicit manifest: at 100 TB with millions of
    * files even parquet aggregate pushdown still opens every footer;
    * the manifest answer is ONE tiny scan, independent of data size.
    *
    * Strictly semantics-preserving by construction: count(*) counts
    * all rows and so does n_rows; min/max ignore NULLs and so does
    * the manifest (per-file min_c/max_c are NULL for all-NULL files,
    * the outer min/max skips them); an empty layout yields count 0
    * (coalesce over the empty sum) and NULL min/max. Anything else —
    * grouping, DISTINCT, agg FILTER, count(col), other functions,
    * expression inputs, a Filter below the aggregate — leaves the
    * plan untouched: the rewrite is all-or-nothing, never partial.
    */
  object ZoneMapAggRule extends Rule[LogicalPlan] {

    private sealed trait Spec
    private case object CountAll              extends Spec
    private final case class MinOf(c: String) extends Spec
    private final case class MaxOf(c: String) extends Spec

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else
        plan.transformUp { case agg @ Aggregate(Seq(), aggExprs, child, _) =>
          rewrite(aggExprs, child).getOrElse(agg)
        }

    /** The registered relation under an optional attribute-only
      * Project (where column pruning leaves the scan).
      */
    private def dataRel(p: LogicalPlan): Option[ZmDef] = {
      val rel = p match {
        case r: LogicalRelation                                                           => Some(r)
        case Project(pl, r: LogicalRelation) if pl.forall(_.isInstanceOf[AttributeReference]) => Some(r)
        case _                                                                            => None
      }
      rel.flatMap { r =>
        r.relation match {
          case hf: HadoopFsRelation =>
            val roots = hf.location.rootPaths.map(_.toString).toSet
            registry.values.find(_.dataRoots == roots)
          case _ => None
        }
      }
    }

    private def specOf(e: NamedExpression, stats: Set[String]): Option[Spec] = e match {
      case Alias(AggregateExpression(fn, Complete, false, None, _), _) =>
        fn match {
          // non-null literal only: count(NULL) must answer 0, not n_rows
          case Count(Seq(Literal(v, _))) if v != null                     => Some(CountAll)
          case Min(a: AttributeReference) if stats.contains(a.name)       => Some(MinOf(a.name))
          case Max(a: AttributeReference) if stats.contains(a.name)       => Some(MaxOf(a.name))
          case _                                                          => None
        }
      case _ => None
    }

    private def rewrite(aggExprs: Seq[NamedExpression], child: LogicalPlan): Option[LogicalPlan] = {
      val zm    = dataRel(child).getOrElse(return None)
      val specs = aggExprs.map(e => specOf(e, zm.statsCols).getOrElse(return None))
      if (specs.isEmpty) return None
      import org.apache.spark.sql.functions.{coalesce, col, lit, max => fmax, min => fmin, sum}
      val zdf      = zm.session.read.parquet(s"${zm.path}/zonemap")
      val manifest = zdf.schema.fieldNames.toSet
      val cols = specs.zipWithIndex.map {
        case (CountAll, i) => coalesce(sum(col("n_rows")), lit(0L)).as(s"__agg_$i")
        case (MinOf(c), i) =>
          if (!manifest.contains(s"min_$c")) return None
          fmin(col(s"min_$c")).as(s"__agg_$i")
        case (MaxOf(c), i) =>
          if (!manifest.contains(s"max_$c")) return None
          fmax(col(s"max_$c")).as(s"__agg_$i")
      }
      val newPlan = analyzed(zdf.agg(cols.head, cols.tail: _*))
      // the manifest answer must be type-identical to the data answer
      if (newPlan.output.map(_.dataType) != aggExprs.map(_.dataType)) return None
      val aliases: Seq[NamedExpression] = aggExprs.zip(newPlan.output).map { case (o, na) =>
        Alias(na, o.name)(exprId = o.exprId, qualifier = o.qualifier)
      }
      Some(Project(aliases, newPlan))
    }
  }
}
