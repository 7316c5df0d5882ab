package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Implemented by composition (preference (a) of the extension ladder):
  * tag both inputs, union them, and carry the latest right-side payload
  * forward with `last(_, ignoreNulls)` over a per-key time-ordered
  * window. This costs exactly ONE shuffle (the window partitioning) —
  * the same lower bound a dedicated sort-merge as-of operator would
  * pay — and inherits spill-safe window execution, AQE, and codegen.
  *
  * Right rows sort before left rows at equal timestamps, giving the
  * standard `right.time <= left.time` inclusive-match semantics
  * (equivalent to DuckDB's ASOF LEFT JOIN, which the oracle uses).
  */
object AsOfJoin {

  /** For each left row, attach the payload of the latest right row with
    * `right[rightTime] <= left[leftTime]` on the same key (null payload
    * when no such row exists — left-outer semantics).
    *
    * Column names of `left` and `right` must be disjoint apart from
    * `keys`. All right non-key columns (including `rightTime`) come
    * back as the matched payload.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String
  ): DataFrame = {
    val lPay = left.columns.toSeq.filterNot(keys.contains)
    val rPay = right.columns.toSeq.filterNot(keys.contains)
    require(lPay.intersect(rPay).isEmpty, s"column clash: ${lPay.intersect(rPay)}")

    val rStructType = org.apache.spark.sql.types.StructType(rPay.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"), lit(null).cast(rStructType).as("__r")) ++
        lPay.map(col): _*
    )
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__side"), struct(rPay.map(col): _*).as("__r")) ++
        lPay.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(keys.map(col) ++ lPay.map(col) ++ rPay.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Query-surface instance: for every click, the user's most recent
    * prior (or simultaneous) purchase.
    */
  def clickToPurchase(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"), col("value").as("purchase_value"))
    asOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts")
      .select("click_id", "purchase_id", "purchase_value")
      .orderBy("click_id")
  }
}
