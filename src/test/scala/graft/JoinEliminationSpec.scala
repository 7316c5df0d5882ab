package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Left-join elimination over structurally-unique right sides
  * (plans/JoinElimination.scala): fires on the defensive-join shape,
  * refuses every shape where elimination would change results.
  */
class JoinEliminationSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def facts = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 20L, 300L), (4L, 99L, 400L))
    .toDF("fact_id", "dim_key", "amount")
  // dims carries DUPLICATE keys — uniqueness must come from the
  // aggregate shape, not the data
  private def dims = Seq((10L, "a"), (10L, "a2"), (20L, "b"), (30L, "c")).toDF("k", "name")

  private def joins(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }.size

  test("defensive left join to a distinct/grouped dimension is eliminated; results identical") {
    val f    = facts
    val uniq = dims.groupBy("k").agg(max("name").as("name"))
    val q    = f.join(uniq, f("dim_key") === uniq("k"), "left").select("fact_id", "amount")
    assert(joins(q) == 0, s"join must be eliminated:\n${q.queryExecution.optimizedPlan}")
    assert(q.as[(Long, Long)].collect().toSet == facts.select("fact_id", "amount").as[(Long, Long)].collect().toSet)
    // Distinct lowers to Aggregate — eliminable too
    val qd = f.join(dims.select("k").distinct(), f("dim_key") === col("k"), "left").select("fact_id")
    assert(joins(qd) == 0, s"distinct right side must eliminate:\n${qd.queryExecution.optimizedPlan}")
    assert(qd.as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // count(*) above the eliminated join is the left count
    assert(q.count() == 4L)
  }

  test("extra non-equi conjuncts only shrink matching — still eliminable") {
    val f    = facts
    val uniq = dims.groupBy("k").agg(max("name").as("name"))
    val q = f
      .join(uniq, f("dim_key") === uniq("k") && f("amount") > 150L, "left")
      .select("fact_id")
    assert(joins(q) == 0)
    assert(q.count() == 4L)
  }

  test("aggregate straight over the defensive join (no intermediate Project) is eliminated too") {
    val f    = facts
    val uniq = dims.groupBy("k").agg(max("name").as("name"))
    val q = f
      .join(uniq, f("dim_key") === uniq("k"), "left")
      .groupBy("dim_key")
      .agg(sum("amount").as("total"))
    assert(joins(q) == 0, s"aggregate-over-join must eliminate:\n${q.queryExecution.optimizedPlan}")
    assert(
      q.as[(Long, Long)].collect().toSet == Set((10L, 300L), (20L, 300L), (99L, 400L)),
      "eliminated plan must aggregate the bare left side"
    )
  }

  test("NOT eliminated: right columns used, non-unique right, partial key pin, inner join") {
    val f     = facts
    val uniq  = dims.groupBy("k").agg(max("name").as("name"))
    val pair  = dims.groupBy("k", "name").agg(count(lit(1)).as("c")) // unique on (k, name), not k
    val used  = f.join(uniq, f("dim_key") === uniq("k"), "left").select("fact_id", "name")
    val raw   = f.join(dims, f("dim_key") === col("k"), "left").select("fact_id")
    val part  = f.join(pair, f("dim_key") === pair("k"), "left").select("fact_id")
    val inner = f.join(uniq, f("dim_key") === uniq("k"), "inner").select("fact_id")
    assert(joins(used) == 1, "right column referenced — must keep the join")
    assert(joins(raw) == 1, "bare (duplicate-keyed) right — must keep the join")
    assert(joins(part) == 1, "equi-keys cover only part of the grouping key — must keep the join")
    assert(joins(inner) == 1, "inner join can drop left rows — must keep the join")
    // and the kept joins answer correctly (duplicate keys fan out)
    assert(raw.count() == 6L)
    assert(inner.count() == 3L)
  }
}
