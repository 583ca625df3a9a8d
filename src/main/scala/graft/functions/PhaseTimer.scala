package graft.functions

/** Opt-in wall-clock attribution for multi-leg maintenance verbs.
  *
  * The scale rehearsal needs PER-LEG growth curves (round-12 VERDICT
  * item 3: cluster extend stepped 4.7 s → 9.0 s from 20× to 50× while its
  * probe file I/O stayed constant — WHICH leg grew?), but the verbs are
  * single calls whose legs interleave materializations and appends.
  * Production must not pay for the bookkeeping and must not see stale
  * state: disarmed (the default) [[timed]] is the body itself; the
  * rehearsal arms, runs one verb, and drains.
  *
  * Accumulation is keyed by phase and thread-safe (legs fan out on driver
  * threads via [[Par]]); overlapping phases each record their own wall
  * time, so fanned legs can sum past the verb's wall clock — the curve
  * that matters is per-leg growth ACROSS scales, not the within-scale
  * sum. */
object PhaseTimer {

  @volatile private var armed = false
  private val acc = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  def arm(): Unit = { acc.clear(); armed = true }

  /** Stop recording and return the accumulated seconds per phase. */
  def drain(): Map[String, Double] = {
    armed = false
    import scala.jdk.CollectionConverters._
    val out = acc.asScala.map { case (k, v) => k -> v.get() / 1e9 }.toMap
    acc.clear()
    out
  }

  def timed[T](phase: String)(body: => T): T =
    if (!armed) body
    else {
      val t0 = System.nanoTime()
      try body
      finally acc.computeIfAbsent(phase,
          _ => new java.util.concurrent.atomic.AtomicLong())
        .addAndGet(System.nanoTime() - t0)
    }
}
