package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Grouped top-k as a single imperative aggregate: each group keeps a
  * bounded, sorted (score desc, id asc) buffer of k (score, id) pairs.
  *
  * This is the scale answer to "top-k per group": the window-function
  * formulation (`row_number() <= k`) sorts EVERY row of every group,
  * so the shuffle carries the whole table; this aggregate's
  * partial→final merge (ObjectHashAggregate) ships exactly k pairs
  * per group per mapper — at 100 TB the difference between shuffling
  * the fact table and shuffling k·|groups| fixed-size rows.
  *
  * Ties break deterministically: equal scores prefer the smaller id
  * (matching `ORDER BY score DESC, id ASC`), so results are
  * partitioning-invariant and oracle-comparable.
  */
case class TopKAgg(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKAgg.Buffer] {

  require(k >= 1 && k <= 1024, s"k in [1,1024], got $k")

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr)
  override def nullable: Boolean         = false

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val scoreOk = scoreExpr.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
      case _                                                                      => false
    }
    val idOk = idExpr.dataType match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _                                             => false
    }
    if (scoreOk && idOk) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_agg expects (non-decimal numeric score, integral id), got ${scoreExpr.dataType} / ${idExpr.dataType}"
      )
  }
  override def dataType: DataType =
    ArrayType(
      StructType(Seq(StructField("score", DoubleType, nullable = false), StructField("id", LongType, nullable = false))),
      containsNull = false
    )

  override def createAggregationBuffer(): TopKAgg.Buffer = new TopKAgg.Buffer(k)

  override def update(buffer: TopKAgg.Buffer, input: InternalRow): TopKAgg.Buffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val score = s match {
        case d: java.lang.Double  => d.doubleValue()
        case f: java.lang.Float   => f.doubleValue()
        case l: java.lang.Long    => l.doubleValue()
        case n: java.lang.Integer => n.doubleValue()
        case other                => other.asInstanceOf[Number].doubleValue()
      }
      buffer.insert(score, i.asInstanceOf[Number].longValue())
    }
    buffer
  }

  override def merge(b1: TopKAgg.Buffer, b2: TopKAgg.Buffer): TopKAgg.Buffer = {
    var i = 0
    while (i < b2.n) { b1.insert(b2.scores(i), b2.ids(i)); i += 1 }
    b1
  }

  override def eval(buffer: TopKAgg.Buffer): Any = {
    val rows = new Array[Any](buffer.n)
    var i    = 0
    while (i < buffer.n) {
      rows(i) = InternalRow(buffer.scores(i), buffer.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: TopKAgg.Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.n * 16)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.scores(i)); bb.putLong(buffer.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Buffer = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt()
    val buf = new TopKAgg.Buffer(k)
    var i   = 0
    // entries arrive already sorted; insert preserves order
    while (i < n) { buf.insert(bb.getDouble(), bb.getLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(scoreExpr = newChildren(0), idExpr = newChildren(1))
}

object TopKAgg {

  /** Bounded sorted buffer (score desc, id asc). k is small, so
    * linear insertion into flat primitive arrays beats a heap on
    * constant factors and serializes trivially.
    */
  final class Buffer(val k: Int) {
    val scores: Array[Double] = new Array[Double](k)
    val ids: Array[Long]      = new Array[Long](k)
    var n: Int                = 0

    /** (s1,id1) ranks before (s2,id2)? score desc, then id asc.
      * Double.compare gives a TOTAL order (NaN greatest — matching
      * Spark's descending sort, where NaN ranks first): with raw `>`
      * a NaN in the last slot would reject every later insert, since
      * all NaN comparisons are false.
      */
    private def beats(s1: Double, id1: Long, s2: Double, id2: Long): Boolean = {
      val cmp = java.lang.Double.compare(s1, s2)
      cmp > 0 || (cmp == 0 && id1 < id2)
    }

    def insert(score: Double, id: Long): Unit = {
      if (n == k && !beats(score, id, scores(n - 1), ids(n - 1))) return
      // find insertion point (buffer is small; linear scan)
      var pos = if (n == k) n - 1 else n
      while (pos > 0 && beats(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
      val last = math.min(n, k - 1)
      var j    = last
      while (j > pos) { scores(j) = scores(j - 1); ids(j) = ids(j - 1); j -= 1 }
      scores(pos) = score
      ids(pos) = id
      if (n < k) n += 1
    }
  }
}
