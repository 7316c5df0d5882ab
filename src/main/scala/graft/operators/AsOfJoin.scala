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

  /** For each left row, attach the payload of the matching right row on
    * the same key (null payload when none exists — left-outer
    * semantics), where "matching" is picked by `direction`:
    *
    *   - `"backward"` (default): LATEST right with
    *     `right[rightTime] <= left[leftTime]` — the point-in-time
    *     lookup;
    *   - `"forward"`: EARLIEST right with `rightTime >= leftTime` —
    *     the what-happened-next lookup (both bounds inclusive: the
    *     union tag makes equal-time rights sort on the matching side);
    *   - `"nearest"`: whichever of the two is closer in time, ties to
    *     backward — still ONE shuffle: both candidate matches come
    *     from frames over the same window partitioning.
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
      rightTime: String,
      direction: String = "backward"
  ): DataFrame = {
    require(Set("backward", "forward", "nearest").contains(direction), s"unknown direction '$direction'")
    val lPay = left.columns.toSeq.filterNot(keys.contains)
    val rPay = right.columns.toSeq.filterNot(keys.contains)
    require(lPay.intersect(rPay).isEmpty, s"column clash: ${lPay.intersect(rPay)}")

    // equal-time tie layout: backward/nearest sort rights BEFORE left
    // (tag 0 < 1) so the preceding frame includes them; forward sorts
    // rights AFTER left (tag 2) so the following frame includes them
    val rightTag    = if (direction == "forward") 2 else 0
    val rStructType = org.apache.spark.sql.types.StructType(rPay.map(c => right.schema(c)))
    val l = left.select(
      keys.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__side"), lit(null).cast(rStructType).as("__r")) ++
        lPay.map(col): _*
    )
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTime).as("__t"), lit(rightTag).as("__side"), struct(rPay.map(col): _*).as("__r")) ++
        lPay.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*
    )
    val ord  = Window.partitionBy(keys.map(col): _*).orderBy(col("__t"), col("__side"))
    val prec = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val foll = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val matched = direction match {
      case "backward" =>
        l.unionByName(r).withColumn("__match", last(col("__r"), ignoreNulls = true).over(prec))
      case "forward" =>
        l.unionByName(r).withColumn("__match", first(col("__r"), ignoreNulls = true).over(foll))
      case "nearest" =>
        // double cast: µs-precision comparison is exact to ~2^53 —
        // choosing the closer side never needs more
        val lt = col("__t").cast("double")
        val bt = col("__b").getField(rightTime).cast("double")
        val ft = col("__f").getField(rightTime).cast("double")
        l.unionByName(r)
          .withColumn("__b", last(col("__r"), ignoreNulls = true).over(prec))
          .withColumn("__f", first(col("__r"), ignoreNulls = true).over(foll))
          .withColumn(
            "__match",
            when(col("__b").isNull, col("__f"))
              .when(col("__f").isNull, col("__b"))
              .when(abs(lt - bt) <= abs(ft - lt), col("__b"))
              .otherwise(col("__f"))
          )
      }
    matched
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

  /** Forward variant: for every click, the user's NEXT purchase at or
    * after the click — the attribution ("did the click convert")
    * direction of the same operator.
    */
  def clickToNextPurchase(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val e = graft.Tables.events(spark, dir)
    val clicks = e
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = e
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"), col("value").as("purchase_value"))
    asOfJoin(clicks, purchases, Seq("user_id"), "ts", "p_ts", direction = "forward")
      .select("click_id", "purchase_id", "purchase_value")
      .orderBy("click_id")
  }
}
