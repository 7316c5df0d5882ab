package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters sketch as a single imperative aggregate:
  * a bounded map of `capacity` counters over a string column, the
  * classic one-pass answer to "most frequent items" when the exact
  * per-item aggregate is itself the scale problem (a groupBy over a
  * 100 TB token stream shuffles the full distinct-item table; this
  * ships ONE `capacity`-entry summary per partition).
  *
  * Guarantees (Misra–Gries 1982; mergeable under any merge tree per
  * Agarwal/Cormode/Huang/Phillips/Wei/Yi, "Mergeable Summaries", PODS
  * 2012 — the property that makes the sketch safe for Spark's
  * partial→final aggregation, where merge order is scheduler-driven):
  * with n total items,
  *   - estimates never exceed true counts: est(x) ≤ c(x);
  *   - undercount is bounded: c(x) − est(x) ≤ n/(capacity+1);
  *   - hence every item with c(x) > n/(capacity+1) is present.
  * The surviving COUNTER SET may differ between merge orders for items
  * near the threshold — only the bounds above are deterministic, which
  * is exactly what `check_freq_items` verifies. With capacity ≥ the
  * true distinct-item count the sketch degenerates to exact counts
  * (no decrement ever fires), which is the oracle-comparable regime.
  *
  * Update is amortized O(1): a decrement-all event costs O(capacity)
  * but consumes capacity+1 units of stream mass, so at most
  * n/(capacity+1) events fire over n updates.
  */
case class FreqItemsAgg(
    itemExpr: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FreqItemsAgg.Buffer] {

  require(capacity >= 1 && capacity <= 65536, s"capacity in [1,65536], got $capacity")

  override def children: Seq[Expression] = Seq(itemExpr)
  override def nullable: Boolean         = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    itemExpr.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"freq_items_agg expects a string item column, got $other"
        )
    }

  override def dataType: DataType =
    ArrayType(
      StructType(
        Seq(StructField("item", StringType, nullable = false), StructField("est", LongType, nullable = false))
      ),
      containsNull = false
    )

  override def createAggregationBuffer(): FreqItemsAgg.Buffer = new FreqItemsAgg.Buffer(capacity)

  override def update(buffer: FreqItemsAgg.Buffer, input: InternalRow): FreqItemsAgg.Buffer = {
    val v = itemExpr.eval(input)
    // String key, not the UTF8String: eval may hand back a view into a
    // reused row buffer, and a stored reference would mutate under us
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString, 1L)
    buffer
  }

  override def merge(b1: FreqItemsAgg.Buffer, b2: FreqItemsAgg.Buffer): FreqItemsAgg.Buffer = {
    b2.counters.foreach { case (item, est) => b1.counters.updateWith(item)(c => Some(c.getOrElse(0L) + est)) }
    b1.shrinkToCapacity()
    b1
  }

  override def eval(buffer: FreqItemsAgg.Buffer): Any = {
    // deterministic output order given the counter set: est desc, item asc
    val sorted = buffer.counters.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) => InternalRow(UTF8String.fromString(item), est) })
  }

  override def serialize(buffer: FreqItemsAgg.Buffer): Array[Byte] = {
    val entries = buffer.counters.toArray
    val payload = entries.map { case (item, _) => item.getBytes(StandardCharsets.UTF_8) }
    val bb      = ByteBuffer.allocate(4 + payload.map(_.length + 12).sum)
    bb.putInt(entries.length)
    entries.zip(payload).foreach { case ((_, est), bytes) =>
      bb.putInt(bytes.length)
      bb.put(bytes)
      bb.putLong(est)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqItemsAgg.Buffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = new FreqItemsAgg.Buffer(capacity)
    var i   = 0
    while (i < n) {
      val len = bb.getInt()
      val arr = new Array[Byte](len)
      bb.get(arr)
      buf.counters.put(new String(arr, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(itemExpr = newChildren(0))
}

object FreqItemsAgg {

  final class Buffer(val capacity: Int) {
    val counters: mutable.HashMap[String, Long] = mutable.HashMap.empty

    def add(item: String, weight: Long): Unit = {
      counters.get(item) match {
        case Some(c) => counters.put(item, c + weight)
        case None if counters.size < capacity => counters.put(item, weight)
        case None =>
          // decrement-all: the incoming item's weight and one unit of
          // every counter annihilate (weight is 1 on the update path)
          val dead = counters.iterator.collect { case (k, c) if c <= weight => k }.toList
          counters.mapValuesInPlace((_, c) => c - weight)
          dead.foreach(counters.remove)
      }
    }

    /** Mergeable-summaries reduction: after a merge the map can hold up
      * to 2·capacity entries; subtract the (capacity+1)-th largest
      * value from everything and drop the non-positive remainder —
      * at most `capacity` survive, and total subtracted mass stays
      * within the n/(capacity+1) error budget.
      */
    def shrinkToCapacity(): Unit = {
      if (counters.size <= capacity) return
      val values = counters.values.toArray
      java.util.Arrays.sort(values)
      val pivot = values(values.length - capacity - 1)
      val dead  = counters.iterator.collect { case (k, c) if c <= pivot => k }.toList
      counters.mapValuesInPlace((_, c) => c - pivot)
      dead.foreach(counters.remove)
    }
  }
}
