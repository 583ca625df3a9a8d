package graft.functions

/** Driver-thread fan-out for INDEPENDENT Spark actions — the q216
  * discipline (IndexAudit round-11) factored out for every latency-bound
  * maintenance verb whose legs write DISJOINT tables: Spark's scheduler
  * interleaves the legs' jobs across the same executors, so N
  * driver-synchronous actions cost ~max(leg) instead of Σ(leg). Use ONLY
  * for legs with no ordering contract between them (disjoint tables,
  * independent materializations); anything whose relative order a crash
  * story depends on stays sequential at the call site.
  *
  * Threads are created on the CALLER's thread, so an armed
  * [[graft.sink.CrashPoints]] budget is inherited by design (the sweep
  * still counts and crashes inside fanned legs — `hits` is atomic);
  * production threads see a no-op. */
object Par {

  /** FAIL-SLOW: every leg runs to completion (success or failure) before
    * the first failure rethrows. Fail-fast would return control to the
    * caller while sibling legs' Spark jobs are still writing — a
    * crash-sweep recovery (or any caller's next verb) would then race an
    * in-flight write on the same tables (TASK_WRITE_FAILED). An injected
    * CrashPoints budget makes every over-budget leg throw on its own
    * reached(), so the "crash" still fells all legs — after their durable
    * effects land, exactly like a real process death with in-flight
    * writes. */
  def inParallel(bodies: Seq[() => Unit]): Unit =
    if (bodies.size <= 1) bodies.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(bodies.size)
      try {
        // Manual try/catch per leg: Future/Try only capture NonFatal, so a
        // fatal leg error (OutOfMemoryError, StackOverflowError) would kill
        // the pool thread without completing its Future and the Inf await
        // below would hang the caller forever. Materializing EVERY
        // Throwable keeps the fail-slow contract even for fatal errors.
        val done = bodies.map { b =>
          pool.submit(new java.util.concurrent.Callable[Option[Throwable]] {
            def call(): Option[Throwable] =
              try { b(); None } catch { case t: Throwable => Some(t) }
          })
        }
        done.flatMap(_.get()).headOption.foreach(e => throw e)
      } finally pool.shutdown()
    }
}
