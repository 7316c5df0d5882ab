package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SQL TABLE functions for the graft-log tier — the lake-format
  * surface a SQL-only user needs as plain FROM clauses:
  *
  * {{{
  * SELECT * FROM graft_table('/data/events')              -- latest
  * SELECT * FROM graft_table('/data/events', 3)           -- versionAsOf
  * SELECT * FROM graft_table_at('/data/events', 1718000000000) -- timestampAsOf
  * SELECT * FROM graft_history('/data/events')            -- DESCRIBE HISTORY
  * }}}
  *
  * Arguments must be foldable literals (resolved at analysis time,
  * as in every lake format's TVFs). Each builder returns the SAME
  * analyzed plan the programmatic API produces, so column pruning,
  * zone-map skipping and DV subtraction behave identically in SQL.
  * Registered both by [[GraftExtensions]] (spark.sql.extensions) and
  * [[graft.GraftFunctions.register]] (programmatic sessions).
  */
object GraftTableFunctions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(GraftTableFunctions.getClass.getName, name)

  private def strArg(es: Seq[Expression], i: Int, fn: String): String = {
    require(i < es.length && es(i).foldable, s"$fn: argument ${i + 1} must be a literal")
    String.valueOf(es(i).eval())
  }

  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] = Seq(
    (
      FunctionIdentifier("graft_history"),
      info("graft_history"),
      (es: Seq[Expression]) => {
        require(es.length == 1, "graft_history(path)")
        graft.sources.SnapshotTable
          .history(SparkSession.active, strArg(es, 0, "graft_history"))
          .queryExecution
          .analyzed
      }
    ),
    (
      FunctionIdentifier("graft_table"),
      info("graft_table"),
      (es: Seq[Expression]) => {
        require(es.length == 1 || es.length == 2, "graft_table(path[, versionAsOf])")
        val v = if (es.length == 2) Some(strArg(es, 1, "graft_table").toLong) else None
        graft.sources.SnapshotTable
          .read(SparkSession.active, strArg(es, 0, "graft_table"), v)
          .queryExecution
          .analyzed
      }
    ),
    (
      FunctionIdentifier("graft_table_at"),
      info("graft_table_at"),
      (es: Seq[Expression]) => {
        require(es.length == 2, "graft_table_at(path, timestampMillis)")
        graft.sources.SnapshotTable
          .readAt(
            SparkSession.active,
            strArg(es, 0, "graft_table_at"),
            strArg(es, 1, "graft_table_at").toLong
          )
          .queryExecution
          .analyzed
      }
    )
  )

  /** Programmatic registration into an existing session. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (id, inf, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, inf, builder)
    }
}
