package graft.sink

import java.util.concurrent.atomic.AtomicLong

/** Crash-point instrumentation for the retention state machine — the
  * mechanism behind CrashSweepSpec's every-prefix kill test.
  *
  * Each durable operation in the swap/compact/delete/heal sequences calls
  * [[reached]] right AFTER its side effect lands (a catalog op or a
  * completed table write — Spark's committer makes the write itself
  * all-or-nothing, so the seams BETWEEN operations are the real crash
  * windows). In production the call is one atomic increment against an
  * unreachable budget — never throws, no synchronization beyond the
  * counter. A spec arms a budget of k: the first k points pass, the
  * (k+1)-th throws [[CrashPoints.CrashInjected]], simulating a process
  * death with exactly k durable operations completed. Sweeping k over
  * 0..N−1 (N from an unarmed rehearsal) kills the REAL code path at every
  * prefix — no hand-modeled step list to drift from the implementation.
  */
object CrashPoints {

  final class CrashInjected(val point: String)
    extends RuntimeException(s"injected crash at $point")

  private val budget = new AtomicLong(Long.MaxValue)
  private val hits = new AtomicLong(0L)

  /** Allow `n` points, then throw on the next. Resets the counter. */
  private[graft] def arm(n: Long): Unit = { hits.set(0L); budget.set(n) }

  /** Back to production behavior (counter keeps counting, never throws). */
  private[graft] def disarm(): Unit = { budget.set(Long.MaxValue); hits.set(0L) }

  /** Points reached since the last arm/disarm — the sweep's N. */
  private[graft] def count: Long = hits.get()

  def reached(point: String): Unit =
    if (hits.incrementAndGet() > budget.get()) throw new CrashInjected(point)
}
