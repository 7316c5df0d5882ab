package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) distinct sketch as a single
  * imperative aggregate: the k smallest distinct hash values of a
  * column, the classic mergeable answer to COUNT(DISTINCT) when the
  * distinct universe itself is shuffle-scale (Bar-Yossef et al. 2002;
  * Beyer et al., "On Synopses for Distinct-Value Estimation Under
  * Multiset Operations", SIGMOD 2007).
  *
  * Input is a 64-bit base hash (feed `xxhash64(col)`); one splitmix64
  * avalanche decorrelates it from other xxhash uses, then the value is
  * stored SIGN-FLIPPED (+Long.MinValue), so signed order == unsigned
  * hash order. That storage choice is what keeps every estimator
  * downstream in codegen'd built-ins: `array_sort` / `array_intersect`
  * / `element_at` on the sketch array operate in the correct order
  * with no custom comparator, and the uniform position of hash h is
  * simply `stored/2^64 + 0.5`.
  *
  * Properties (unlike the Misra–Gries counter set, which is only
  * bound-deterministic):
  *   - bottom-k of a set is a semilattice — the sketch is EXACTLY
  *     deterministic under any merge tree / partitioning;
  *   - with k ≥ true distinct count the sketch holds every hash, so
  *     `size(sketch)` IS the exact distinct count (oracle regime) and
  *     `array_distinct(flatten(...))` of group sketches is the exact
  *     union;
  *   - sub-capacity, (k−1)/u(k-th min) estimates the distinct count
  *     with relative standard error ≈ 1/√(k−2), and bottom-k of two
  *     merged sketches is exactly the sketch of the union — which is
  *     what makes union AND intersection estimation sound (Beyer et
  *     al. §4: ρ/k · D_union over the combined bottom-k).
  *
  * The shuffle ships at most k longs per group instead of the distinct
  * value set — the same reduction that makes `approx_count_distinct`
  * scale, but with a reusable sketch that also answers set-overlap
  * questions HLL cannot.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[KmvSketchAgg.Buffer] {

  require(k >= 16 && k <= 65536, s"k in [16,65536], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other    => TypeCheckResult.TypeCheckFailure(s"kmv_agg expects a 64-bit hash column, got $other")
  }

  override def createAggregationBuffer(): KmvSketchAgg.Buffer = new KmvSketchAgg.Buffer(k)

  override def update(buffer: KmvSketchAgg.Buffer, input: InternalRow): KmvSketchAgg.Buffer = {
    val v = child.eval(input)
    if (v != null) buffer.add(MinhashAgg.mix(v.asInstanceOf[Long]) + Long.MinValue)
    buffer
  }

  override def merge(b1: KmvSketchAgg.Buffer, b2: KmvSketchAgg.Buffer): KmvSketchAgg.Buffer = {
    val it = b2.set.iterator()
    while (it.hasNext) b1.add(it.next())
    b1
  }

  override def eval(buffer: KmvSketchAgg.Buffer): Any = {
    val out = new Array[Long](buffer.set.size())
    val it  = buffer.set.iterator()
    var i   = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvSketchAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.set.size() * 8)
    bb.putInt(buffer.set.size())
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvSketchAgg.Buffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = new KmvSketchAgg.Buffer(k)
    var i   = 0
    while (i < n) { buf.add(bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object KmvSketchAgg {

  /** Bounded sorted set of the k smallest (sign-flipped) hashes. The
    * cached `last` check makes the steady-state update O(1) once the
    * buffer is full — most rows hash above the current k-th min and
    * never touch the tree.
    */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()

    def add(flipped: Long): Unit = {
      if (set.size() < k) { set.add(flipped); () }
      else if (flipped < set.last()) {
        if (set.add(flipped)) { set.pollLast(); () }
      }
    }
  }
}
