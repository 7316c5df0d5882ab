package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** k-function MinHash signature as a single imperative aggregate.
  *
  * Input is a 64-bit base hash per shingle; the k hash functions are
  * derived in-loop via splitmix64(base + i·GOLDEN) — one cheap integer
  * mix per function instead of re-evaluating an expression-tree hash k
  * times per row. Buffer = Array[Long](k) of running minima;
  * partial→final merge via ObjectHashAggregate is elementwise min, so
  * the shuffle carries k longs per group, never the shingles.
  */
case class MinhashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  require(numHashes >= 1 && numHashes <= 512, s"numHashes in [1,512], got $numHashes")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val base = v.asInstanceOf[Long]
      var i    = 0
      while (i < numHashes) {
        val h = MinhashAgg.mix(base + i * 0x9e3779b97f4a7c15L)
        if (h < buffer(i)) buffer(i) = h
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b2(i) < b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer.clone())

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Long](numHashes)
    var i   = 0
    while (i < numHashes) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinhashAgg {

  /** splitmix64 finalizer — a full-avalanche 64-bit mix. */
  def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}
