package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.DoubleType

/** Custom whole-operator extension (the "(c)" rung of the extension
  * ladder): an inner range join `left.value ∈ [right.lo, right.hi)`.
  *
  * Spark plans this predicate as BroadcastNestedLoopJoin — O(|L|·|R|)
  * per partition. With the (small) interval side broadcast and sorted
  * by `lo`, each probe row binary-searches the last interval with
  * `lo <= v` and only scans the prefix that can match: O(|L|·log|R| +
  * matches) for banding-style dimension tables.
  *
  * Wiring: [[RangeJoin]] logical node (constructed already-resolved
  * from analyzed children) → [[RangeJoinStrategy]] (injected via
  * `spark.experimental.extraStrategies` by [[RangeJoinOps.rangeJoin]])
  * → [[BroadcastRangeJoinExec]].
  */
case class RangeJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    value: Expression,
    lo: Expression,
    hi: Expression
) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoin =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoin(l, r, v, lo, hi) =>
      BroadcastRangeJoinExec(planLater(l), planLater(r), v, lo, hi) :: Nil
    case _ => Nil
  }
}

case class BroadcastRangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    value: Expression,
    lo: Expression,
    hi: Expression
) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    // Build-side guard: this operator is documented for SMALL interval
    // dimensions (price bands, time buckets). A user handing it a large
    // right side would otherwise hit a silent driver OOM inside
    // executeCollect — fail fast with an actionable message instead.
    // executeTake(limit + 1) collects incrementally, so the CHECK
    // itself never materializes more than one row past the cap.
    val maxBuildRows = math.min(
      conf.getConfString("spark.graft.rangeJoin.maxBuildRows", "1000000").toLong,
      Int.MaxValue - 1L
    ).toInt
    val collected = right.executeTake(maxBuildRows + 1)
    if (collected.length > maxBuildRows)
      throw new IllegalStateException(
        s"BroadcastRangeJoinExec build (right) side exceeds $maxBuildRows rows " +
          "(spark.graft.rangeJoin.maxBuildRows). The interval side is broadcast " +
          "to every task and must be a small dimension table — swap the sides, " +
          "pre-aggregate the intervals, or raise the threshold if the driver " +
          "has the memory."
      )
    // build side: evaluate bounds, sort by lo
    val boundLo = BindReferences.bindReference(lo, right.output)
    val boundHi = BindReferences.bindReference(hi, right.output)
    val build = collected
      .flatMap { row =>
        val l = boundLo.eval(row)
        val h = boundHi.eval(row)
        if (l == null || h == null) None
        else Some((l.asInstanceOf[Double], h.asInstanceOf[Double], row.copy()))
      }
      .sortBy(_._1)
    val los = build.map(_._1)
    val bc  = sparkContext.broadcast((build, los))

    val boundValue = BindReferences.bindReference(value, left.output)
    val outAttrs   = output
    left.execute().mapPartitions { iter =>
      val (bands, loKeys) = bc.value
      val joined          = new JoinedRow
      val toUnsafe        = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val vAny = boundValue.eval(lrow)
        if (vAny == null || bands.isEmpty) Iterator.empty
        else {
          val v = vAny.asInstanceOf[Double]
          // last index with lo <= v (exclusive upper bound of candidates)
          var a = 0; var b = loKeys.length
          while (a < b) { val m = (a + b) >>> 1; if (loKeys(m) <= v) a = m + 1 else b = m }
          val limit = a
          val lcopy = lrow
          (0 until limit).iterator.collect {
            case i if v < bands(i)._2 => toUnsafe(joined(lcopy, bands(i)._3))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Custom-operator optimizer rule (the `Rule[LogicalPlan]` rung of the
  * extension ladder): a custom logical node is invisible to Catalyst's
  * built-in PushPredicateThroughJoin, so a filter written AFTER a
  * range join would sit above it forever — scanning and range-probing
  * rows the filter immediately discards. This rule re-enables the
  * optimization for [[RangeJoin]]: deterministic conjuncts that
  * reference only probe-side (left) columns commute with the inner
  * range join and move below it, where physical planning then pushes
  * them all the way into the scan. At 100 TB this is the difference
  * between range-probing the whole fact table and the selected slice.
  */
object PushFilterThroughRangeJoin
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {

  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rj @ RangeJoin(l, _, _, _, _)) =>
      val leftOut      = AttributeSet(l.output)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(leftOut))
      if (push.isEmpty) f
      else {
        val pushed = rj.copy(left = Filter(push.reduce(And), l))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** User-facing API. Columns are referenced by name and resolved against
  * the analyzed children, so the logical node enters the analyzer
  * already resolved (no custom resolution rule needed).
  */
object RangeJoinOps {

  def rangeJoin(left: DataFrame, right: DataFrame, valueCol: String, loCol: String, hiCol: String): DataFrame = {
    val spark   = left.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy)) {
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ RangeJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushFilterThroughRangeJoin)) {
      spark.experimental.extraOptimizations = spark.experimental.extraOptimizations :+ PushFilterThroughRangeJoin
    }
    val lPlan = left.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
    val rPlan = right.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(sys.error(s"column $name not found in ${plan.output.map(_.name)}"))
    def asDouble(a: Attribute): Expression =
      if (a.dataType == DoubleType) a else org.apache.spark.sql.catalyst.expressions.Cast(a, DoubleType)
    org.apache.spark.sql.GraftShims.ofRows(
      spark,
      RangeJoin(lPlan, rPlan, asDouble(attr(lPlan, valueCol)), asDouble(attr(rPlan, loCol)), asDouble(attr(rPlan, hiCol)))
    )
  }
}
