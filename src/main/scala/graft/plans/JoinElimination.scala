package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  Attribute,
  AttributeReference,
  AttributeSet,
  EqualNullSafe,
  EqualTo,
  Expression,
  NamedExpression
}
import org.apache.spark.sql.catalyst.plans.LeftOuter
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** LEFT-JOIN ELIMINATION over provably-unique right sides — the
  * constraint-based join pruning mature warehouses do from declared
  * primary keys, done here from a STRUCTURAL uniqueness proof (Spark
  * has no PK metadata, but an `Aggregate`'s grouping keys are unique
  * in its output by construction — `Distinct` lowers to exactly that
  * shape before user rules run).
  *
  * A `LEFT OUTER` join is a no-op on the left rows whenever
  *
  *   1. nothing above the join references the right side, and
  *   2. each left row can match AT MOST ONE right row,
  *
  * because left-outer keeps every left row regardless of matching, a
  * unique right bounds fan-out at one, and the dropped right columns
  * are the only thing matching could have produced. (2) holds when the
  * right plan is an `Aggregate` and the equi-conjuncts of the join
  * condition pin ALL of its grouping attributes to deterministic
  * left-side expressions — extra non-equi conjuncts only shrink
  * matching and stay safe. This is the "defensive join" shape semantic
  * layers and generated SQL emit constantly (join every fact to every
  * deduplicated dimension, read two columns); at 100 TB the eliminated
  * join is an entire shuffle+build of the dimension that never runs.
  *
  * Soundness is purely row-algebraic — no statistics, no hints — so
  * the rule fires session-wide from [[GraftExtensions]] with no
  * registration step.
  */
object EliminateUniqueLeftJoin extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, Join(left, right, LeftOuter, cond, _))
        if projList.forall(_.references.subsetOf(left.outputSet)) &&
          projList.forall(_.deterministic) &&
          rightUniquePerLeftRow(cond, left, right) =>
      Project(projList, left)
    // aggregation straight over the join (column pruning prunes the
    // join's children and leaves no intermediate Project)
    case agg: Aggregate =>
      agg.child match {
        case Join(left, right, LeftOuter, cond, _)
            if agg.references.subsetOf(left.outputSet) &&
              rightUniquePerLeftRow(cond, left, right) =>
          agg.copy(child = left)
        case _ => agg
      }
  }

  /** True iff `right` provably yields at most one match per left row:
    * it is an Aggregate whose EVERY grouping expression surfaces as an
    * output attribute pinned by an equi-conjunct to a deterministic
    * expression over `left`.
    */
  private def rightUniquePerLeftRow(
      cond: Option[Expression],
      left: LogicalPlan,
      right: LogicalPlan
  ): Boolean = right match {
    case agg: Aggregate =>
      // right output attrs that ARE grouping expressions (directly or
      // via alias) — the unique key of the aggregate's output
      val groupOut: Map[Expression, Attribute] = agg.aggregateExpressions.collect {
        case a: AttributeReference if agg.groupingExpressions.exists(_.semanticEquals(a)) =>
          (a: Expression) -> a.toAttribute
        case al @ Alias(child, _) if agg.groupingExpressions.exists(_.semanticEquals(child)) =>
          child -> al.toAttribute
      }.toMap
      // every grouping expression must surface (else the key is not
      // fully observable in the output, and uniqueness can't be pinned)
      if (!agg.groupingExpressions.forall(g => groupOut.keys.exists(_.semanticEquals(g)))) return false
      val keyAttrs = AttributeSet(groupOut.values)
      // right attrs pinned by equi-conjuncts to deterministic left exprs
      val pinned = AttributeSet(splitConjuncts(cond).flatMap {
        case EqualTo(l, r: Attribute) if pinsRight(l, r, left, right)       => Some(r)
        case EqualTo(r: Attribute, l) if pinsRight(l, r, left, right)       => Some(r)
        case EqualNullSafe(l, r: Attribute) if pinsRight(l, r, left, right) => Some(r)
        case EqualNullSafe(r: Attribute, l) if pinsRight(l, r, left, right) => Some(r)
        case _                                                              => None
      })
      keyAttrs.subsetOf(pinned)
    case _ => false
  }

  private def pinsRight(l: Expression, r: Attribute, left: LogicalPlan, right: LogicalPlan): Boolean =
    l.deterministic && l.references.subsetOf(left.outputSet) && right.outputSet.contains(r)

  private def splitConjuncts(cond: Option[Expression]): Seq[Expression] = cond match {
    case None             => Nil
    case Some(And(a, b))  => splitConjuncts(Some(a)) ++ splitConjuncts(Some(b))
    case Some(e)          => Seq(e)
  }
}
