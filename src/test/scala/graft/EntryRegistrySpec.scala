package graft

/** Registry-level contracts that individual operator specs can't see:
  * the standing-index queries memoize their index PER DATA DIR, so one
  * JVM serving two corpora must keep them isolated — the regression
  * here is a fixed table name + per-dir memo, which silently probes
  * dir A against dir B's index.
  */
class EntryRegistrySpec extends SparkSpec {

  test("every registered query analyzes against the current testdata") {
    // Round-7 postmortem: a testdata regeneration changed events.ts
    // from TIMESTAMP(NANOS)-as-BIGINT to timestamp[us] and 15 queries
    // started throwing AT ANALYSIS TIME — the correctness driver drops
    // throwers instead of recording err, so the oracle file silently
    // shrank from 164 to 149 entries with "0 failures". This smoke
    // forces analysis (not execution) of the full registry so any
    // schema drift fails `sbt test` with a named count instead.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).queryExecution.analyzed
        None
      } catch {
        case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString
          Some(s"$name: ${e.getClass.getSimpleName}: $msg")
      }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${SparkEntry.queries.size} queries failed analysis:\n${failures.mkString("\n")}"
    )
  }

  test("every oracleSql key has a matching queries entry") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracleSql keys without a query: ${orphaned.toSeq.sorted.mkString(", ")}")
  }

  test("standing-index queries stay correct across two data dirs in one JVM") {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    // First pass primes the memos in dir order; second pass re-queries
    // the FIRST dir after the second dir's index was built — under the
    // fixed-name bug this probed the wrong corpus.
    def run(name: String, dir: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).toSeq

    Seq("dedup_incremental_lsh", "dedup_incremental_semantic", "sim_ivfpq_topk").foreach { name =>
      val first  = dirs.map(d => d -> run(name, d)).toMap
      val replay = run(name, dirs.head)
      assert(
        replay == first(dirs.head),
        s"$name: re-querying ${dirs.head} after building ${dirs(1)}'s index changed the result"
      )
    }
  }
}
