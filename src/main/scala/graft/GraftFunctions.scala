package graft

import org.apache.spark.sql.SparkSession

import graft.functions.{CosineSimilarity, DotProduct, HyperplaneCode, MinhashAgg, ShingleHashes, SimhashAgg}

/** Registry of graft's native Catalyst expressions, exposed as SQL
  * functions so they compose with `expr(...)` / `selectExpr` / pure SQL
  * and stay inside whole-stage codegen.
  */
object GraftFunctions {

  /** Idempotent per-session: createOrReplaceTempFunction logs a
    * replace warning on every re-registration, and operators call
    * register defensively — skip sessions already done.
    */
  private val registered =
    java.util.Collections.newSetFromMap(new java.util.concurrent.ConcurrentHashMap[SparkSession, java.lang.Boolean]())

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_sim", exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "hyperplane_code",
      exprs => HyperplaneCode(exprs(0), exprs(1).eval().toString.toInt),
      "built-in"
    )
    reg.createOrReplaceTempFunction("simhash_agg", exprs => SimhashAgg(exprs(0)), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_agg",
      exprs => MinhashAgg(exprs(0), exprs(1).eval().toString.toInt),
      "built-in"
    )
    reg.createOrReplaceTempFunction(
      "shingle_hashes",
      exprs => ShingleHashes(exprs(0), exprs(1).eval().toString.toInt),
      "built-in"
    )
  }
}
