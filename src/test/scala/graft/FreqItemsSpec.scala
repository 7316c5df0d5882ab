package graft

import org.apache.spark.sql.functions._

/** Misra–Gries sketch contract ([[graft.functions.FreqItemsAgg]]):
  * exactness when capacity covers the item universe, and the
  * guaranteed-presence / bounded-undercount properties in the
  * decrementing regime — under different partitionings, since merge
  * order is exactly what the mergeable-summaries property must absorb.
  */
class FreqItemsSpec extends SparkSpec {

  // zipf-ish skewed stream: item i appears ~N/i times
  private def skewed(parts: Int) = {
    val rows = (1 to 40).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    spark.createDataFrame(rows.map(Tuple1(_))).toDF("item").repartition(parts)
  }

  test("capacity >= distinct items: estimates are exact counts") {
    val df     = skewed(8)
    val sketch = df
      .agg(expr("freq_items_agg(item, 64)").as("fi"))
      .select(explode(col("fi")).as("e"))
      .select(col("e.item").as("item"), col("e.est").as("est"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
    val exact = df.groupBy("item").agg(count(lit(1)).as("cnt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sketch == exact)
  }

  test("sub-capacity regime: MG guarantees hold under different partitionings") {
    for (parts <- Seq(1, 4, 13)) {
      val df  = skewed(parts)
      val cap = 5
      val n   = df.count()
      val bound = n.toDouble / (cap + 1)
      val sketch = df
        .agg(expr(s"freq_items_agg(item, $cap)").as("fi"))
        .select(explode(col("fi")).as("e"))
        .select(col("e.item").as("item"), col("e.est").as("est"))
        .collect()
        .map(r => r.getString(0) -> r.getLong(1))
        .toMap
      assert(sketch.size <= cap)
      val exact = df.groupBy("item").agg(count(lit(1)).as("cnt")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (item, cnt) =>
        if (cnt > bound)
          assert(sketch.contains(item), s"parts=$parts: heavy item $item (cnt=$cnt > $bound) missing")
      }
      sketch.foreach { case (item, est) =>
        val cnt = exact(item)
        assert(est <= cnt, s"parts=$parts: $item overestimated ($est > $cnt)")
        assert(cnt - est <= bound, s"parts=$parts: $item undercount ${cnt - est} beyond budget $bound")
      }
    }
  }

  test("nulls are skipped, empty input yields an empty summary") {
    val df = spark.createDataFrame(Seq(Tuple1("a"), Tuple1(null.asInstanceOf[String]), Tuple1("a"))).toDF("item")
    val out = df.agg(expr("freq_items_agg(item, 4)").as("fi"))
      .select(explode(col("fi")).as("e")).select(col("e.item"), col("e.est")).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 2L)))
    val empty = df.filter(col("item").isNull && col("item").isNotNull)
      .agg(expr("freq_items_agg(item, 4)").as("fi")).select(size(col("fi"))).collect()
    assert(empty.head.getInt(0) == 0)
  }
}
