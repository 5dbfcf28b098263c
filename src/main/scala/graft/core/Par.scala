package graft.core

/** Concurrent Spark-job submission for INDEPENDENT eager sub-builds of
  * one query (optimization guide §2.6: the scheduler happily runs several
  * jobs at once inside one application; actions are only sequential
  * because driver code calls them sequentially). A panel query whose
  * arms each run eager work — artifact warm-ups (`warmed`), fixed-round
  * beam-search checkpoints — pays sum(arms) wall-clock when the arms are
  * built one after another, while each arm's small stages leave most of
  * the 32 cores idle; submitting the builds from a bounded pool
  * back-fills those cores and the wall-clock drops toward max(arm).
  *
  * Correctness: only use for thunks whose RESULTS are independent
  * (no shared mutable frames being persisted by two thunks). Results are
  * deterministic regardless of interleaving — each thunk's output is a
  * function of its inputs only; scheduling order never reaches any
  * query result. Artifact builds stay safe: `Artifacts.materialize`
  * holds its build lock (reentrant), and `warmed`/`persist` on distinct
  * frames are independent CacheManager entries.
  */
object Par {

  /** Run `thunks` concurrently on a bounded pool, return results in
    * input order, rethrow the first failure's cause. Degenerates to
    * sequential execution for 0/1 thunks. */
  def run[A](thunks: Seq[() => A], parallelism: Int = 8): Seq[A] = {
    if (thunks.sizeIs <= 1) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, thunks.size))
    try {
      val futures = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futures.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
    } finally pool.shutdown()
  }
}
