package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator

/** The honest generalization of the reference's closed 2-entry function
  * registry (mapper.go:40-44, reducer.go:120-124): a typed map-reduce
  * surface where the user passes Scala closures instead of picking from
  * {"wc","ii"}.
  *
  * Execution maps onto Spark's standard machinery: `flatMap` →
  * `groupByKey` → `reduceGroups`/`agg(Aggregator)`. Both plan as
  * partial + final aggregation, so map-side combining happens
  * automatically — unlike the reference, which shuffles every raw pair
  * (mapper.go:62-83; SURVEY.md §4.1).
  */
object MapReduce {

  /** mapReduce with a commutative+associative value combiner.
    *
    * @param mapFn    emits zero or more (key, value) pairs per input —
    *                 the reference's mapper fn shape
    * @param reduceFn combines two values for the same key — the
    *                 reference's reducer fn shape (restricted to a
    *                 semigroup so partial aggregation is legal)
    */
  def mapReduce[I, K, V](ds: Dataset[I])(mapFn: I => IterableOnce[(K, V)])(reduceFn: (V, V) => V)(implicit
      kEnc: Encoder[K],
      kvEnc: Encoder[(K, V)]
  ): Dataset[(K, V)] =
    ds.flatMap(mapFn)(kvEnc)
      .groupByKey(_._1)(kEnc)
      .reduceGroups((a: (K, V), b: (K, V)) => (a._1, reduceFn(a._2, b._2)))
      .map(_._2)(kvEnc)

  /** mapReduce where reduction is a full [[Aggregator]] (non-semigroup
    * reductions: distinct-collect, top-k, sketches…).
    */
  def mapAggregate[I, K, V, B, O](
      ds: Dataset[I]
  )(mapFn: I => IterableOnce[(K, V)])(agg: Aggregator[V, B, O])(implicit
      kEnc: Encoder[K],
      vEnc: Encoder[V],
      kvEnc: Encoder[(K, V)]
  ): Dataset[(K, O)] =
    ds.flatMap(mapFn)(kvEnc)
      .groupByKey(_._1)(kEnc)
      .mapValues((kv: (K, V)) => kv._2)(vEnc)
      .agg(agg.toColumn)

  /** Typed two-sided cogroup: per-customer order-gap analysis — the
    * `KeyValueGroupedDataset.cogroup` rung of the typed surface, for
    * per-key merge logic that joins can't express (here: the maximum
    * gap in days between a customer's CONSECUTIVE orders, which needs
    * the sorted order sequence per key, not a pairwise condition).
    * Customers with no orders emit n_orders = 0 and a NULL gap — the
    * left-outer shape. Both sides shuffle once on the key; the
    * per-group closure sees one customer's orders only, so memory is
    * bounded by the largest single group.
    */
  def customerOrderGaps(spark: SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val customers = graft.Tables
      .customer(spark, dir)
      .select(col("c_custkey"), col("c_name"))
      .as[(Long, String)]
    val orders = graft.Tables
      .orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate").cast("date"))
      .as[(Long, java.sql.Date)]
    customers
      .groupByKey(_._1)
      .cogroup(orders.groupByKey(_._1)) { (key, cs, os) =>
        if (!cs.hasNext) Iterator.empty
        else {
          val name = cs.next()._2
          val days = os.map(_._2.toLocalDate.toEpochDay).toArray.sorted
          val maxGap =
            if (days.length < 2) None
            else Some((1 until days.length).map(i => days(i) - days(i - 1)).max)
          Iterator.single((key, name, days.length.toLong, maxGap))
        }
      }
      .toDF("c_custkey", "c_name", "n_orders", "max_gap_days")
      .orderBy("c_custkey")
  }

  /** Distinct-sorted-collect aggregator — the reference's ii reduce fn
    * (reducer.go:172-186) as a reusable, partially-aggregatable
    * [[Aggregator]] with a bounded-ish Set buffer.
    */
  class DistinctSortedList extends Aggregator[String, Set[String], Seq[String]] {
    override def zero: Set[String]                                     = Set.empty
    override def reduce(b: Set[String], a: String): Set[String]        = b + a
    override def merge(b1: Set[String], b2: Set[String]): Set[String]  = b1 ++ b2
    override def finish(r: Set[String]): Seq[String]                   = r.toSeq.sorted
    override def bufferEncoder: Encoder[Set[String]]                   = Encoders.kryo[Set[String]]
    override def outputEncoder: Encoder[Seq[String]] = {
      implicit val se: Encoder[String] = Encoders.STRING
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
    }
  }

  /** Word count via the generalized API — the reference's `wc` job
    * expressed as user code against [[mapReduce]].
    */
  def wordCount(texts: Dataset[String]): Dataset[(String, Long)] = {
    implicit val kEnc: Encoder[String]          = Encoders.STRING
    implicit val kvEnc: Encoder[(String, Long)] = Encoders.tuple(Encoders.STRING, Encoders.scalaLong)
    mapReduce(texts)(text => text.split(TextJobs.TokenSep).iterator.filter(_.nonEmpty).map(w => (w, 1L)))(_ + _)
  }

  /** Inverted index via the generalized API: map emits (word, file),
    * reduction is the [[DistinctSortedList]] aggregator.
    */
  def invertedIndex(docs: Dataset[(String, String)]): Dataset[(String, Seq[String])] = {
    implicit val kEnc: Encoder[String]            = Encoders.STRING
    implicit val kvEnc: Encoder[(String, String)] = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    mapAggregate(docs) { case (text, file) =>
      text.split(TextJobs.TokenSep).iterator.filter(_.nonEmpty).map(w => (w, file))
    }(new DistinctSortedList)(kEnc, kEnc, kvEnc)
  }
}
