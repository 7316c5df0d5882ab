package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a single
  * imperative aggregate: a depth×width counter grid over a 64-bit
  * base-hash column (feed `xxhash64(col)`), answering point-frequency
  * queries from O(depth·width) memory when the exact per-key aggregate
  * is itself the scale problem. Complements the Misra–Gries sketch
  * ([[FreqItemsAgg]]): MG returns the heavy-hitter SET, CMS answers
  * "how often did THIS key occur" for any key, including ones below
  * the heavy-hitter threshold.
  *
  * The depth row hashes are derived splitmix64(base + d·GOLDEN) — the
  * same in-loop derivation [[MinhashAgg]] uses, and the same one
  * [[CmsLookup]] replays at probe time, which is what makes the probe
  * a pure expression over the sketch array.
  *
  * Guarantees (for true count c(x), total mass N):
  *   - never under-estimates: est(x) ≥ c(x), deterministically;
  *   - est(x) ≤ c(x) + e·N/width with probability ≥ 1 − e^(−depth)
  *     per key (probabilistic — `check_cms` asserts the measured
  *     violation rate, plus the two hard invariants);
  *   - merge is elementwise counter addition: fully commutative /
  *     associative, so the SKETCH VALUE is deterministic under any
  *     partitioning, and the shuffle ships depth·width longs per
  *     group instead of the distinct-key table.
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
  require(width >= 16 && width <= (1 << 20), s"width in [16,2^20], got $width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other    => TypeCheckResult.TypeCheckFailure(s"cms_agg expects a 64-bit hash column, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var d    = 0
      while (d < depth) {
        buffer(d * width + CmsLookup.bucket(base, d, width)) += 1L
        d += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Long](depth * width)
    var i   = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** Point-frequency probe against a [[CmsAgg]] sketch: the minimum of
  * the depth counters the key hashes to. Codegen'd via a static helper
  * so probes of a joined key column stay inside whole-stage codegen.
  */
case class CmsLookup(left: Expression, right: Expression, depth: Int, width: Int) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(s"cms_estimate expects (array<bigint>, bigint), got $other")
  }

  override protected def nullSafeEval(sketch: Any, base: Any): Any =
    CmsLookup.estimate(sketch.asInstanceOf[ArrayData], base.asInstanceOf[Long], depth, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (sketch, base) => s"${ev.value} = graft.functions.CmsLookup.estimate($sketch, $base, $depth, $width);"
    )

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CmsLookup {

  /** Row-d bucket of a base hash — MUST stay in lockstep with
    * CmsAgg.update's derivation.
    */
  def bucket(base: Long, d: Int, width: Int): Int =
    java.lang.Math.floorMod(MinhashAgg.mix(base + d * 0x9e3779b97f4a7c15L), width.toLong).toInt

  def estimate(sketch: ArrayData, base: Long, depth: Int, width: Int): Long = {
    var min = Long.MaxValue
    var d   = 0
    while (d < depth) {
      val c = sketch.getLong(d * width + bucket(base, d, width))
      if (c < min) min = c
      d += 1
    }
    min
  }
}
