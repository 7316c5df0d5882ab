package graft

import org.apache.spark.sql.functions._

/** The custom Catalyst Generator (shingle_hash_stream) against the
  * codegen'd array+explode path: identical output, Generate plan node,
  * and a timing comparison that justifies whichever path
  * Dedup.hashedShingles wires.
  */
class ShingleGenSpec extends SparkSpec {

  private lazy val docs = {
    GraftFunctions.register(spark)
    Tables.documents(spark, sfDir).select("doc_id", "text")
  }

  test("generator output == explode(shingle_hashes) output, including NULL and short texts") {
    val viaGen = docs
      .select(col("doc_id"), expr("shingle_hash_stream(text, 3)"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    val viaExplode = docs
      .select(col("doc_id"), explode(expr("shingle_hashes(text, 3)")).as("sh_base"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sorted
    assert(viaGen.length == viaExplode.length && viaGen.sameElements(viaExplode))

    // NULL text and texts shorter than k emit no rows (and don't throw)
    import SparkSpec.spark.implicits._
    val edge = Seq((1L, null: String), (2L, "one two"), (3L, "a b c d")).toDF("doc_id", "text")
    val out  = edge.select(col("doc_id"), expr("shingle_hash_stream(text, 3)")).collect()
    assert(out.map(_.getLong(0)).toSet == Set(3L))
    assert(out.length == 2) // "a b c d" has 4 tokens -> 2 shingles
  }

  test("generator plans as GenerateExec with the custom node") {
    val plan = docs
      .select(col("doc_id"), expr("shingle_hash_stream(text, 3)"))
      .queryExecution
      .executedPlan
      .toString
    assert(plan.contains("Generate shingle_hash_stream"), s"custom generator missing from plan:\n$plan")
  }

  test("timing: record generator vs codegen explode (informational)") {
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths, then min-of-3 each
    def runGen(): Unit =
      docs.select(col("doc_id"), expr("shingle_hash_stream(text, 3)")).groupBy().count().collect()
    def runExp(): Unit =
      docs.select(col("doc_id"), explode(expr("shingle_hashes(text, 3)")).as("sh_base")).groupBy().count().collect()
    runGen(); runExp()
    val tGen = (1 to 3).map(_ => time(runGen())).min
    val tExp = (1 to 3).map(_ => time(runExp())).min
    info(f"shingle_hash_stream: $tGen%.3f s   explode(shingle_hashes): $tExp%.3f s")
    assert(tGen > 0 && tExp > 0)
  }
}
