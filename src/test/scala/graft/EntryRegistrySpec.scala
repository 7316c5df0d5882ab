package graft

/** Registry-level contracts that individual operator specs can't see:
  * the standing-index queries memoize their index PER DATA DIR, so one
  * JVM serving two corpora must keep them isolated — the regression
  * here is a fixed table name + per-dir memo, which silently probes
  * dir A against dir B's index.
  */
class EntryRegistrySpec extends SparkSpec {

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
