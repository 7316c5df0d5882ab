package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** 64-bit SimHash as a single imperative aggregate: the buffer is one
  * Array[Int] of per-bit votes; each input token-hash adds ±1 per bit;
  * the final signature sets bit b iff votes(b) > 0.
  *
  * Replaces the declarative formulation of 64 separate
  * `sum(when(bit(th, b), 1, -1))` aggregate columns, which blows past
  * codegen width limits and pays 64 case-when evaluations per row —
  * here it's one tight 64-iteration loop over a mutable buffer, and
  * ObjectHashAggregateExec still gives partial→final merge (map-side
  * combining) for free.
  */
case class SimhashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean         = false
  override def dataType: DataType        = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val th = v.asInstanceOf[Long]
      var b  = 0
      while (b < 64) {
        buffer(b) += (if (((th >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var b   = 0
    while (b < 64) { if (buffer(b) > 0) sig |= (1L << b); b += 1 }
    java.lang.Long.valueOf(sig)
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb  = ByteBuffer.wrap(bytes)
    val out = new Array[Int](64)
    var i   = 0
    while (i < 64) { out(i) = bb.getInt(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
