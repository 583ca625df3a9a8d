package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins graft.functions.Par's two contracts:
  *  - FAIL-SLOW: every leg quiesces before the first failure rethrows
  *    (a fail-fast return races a sibling's in-flight Spark write);
  *  - FATAL-SAFE: a fatal leg error (OutOfMemoryError and kin escape
  *    both Try and Future's NonFatal handler) must still complete the
  *    leg and rethrow — not leave the caller awaiting a Future that
  *    will never finish (round-12 ADVICE). */
class ParSpec extends AnyFunSuite {

  test("fail-slow: a failing leg does not return control before siblings finish") {
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[RuntimeException] {
      graft.functions.Par.inParallel(Seq(
        () => throw new RuntimeException("fast failure"),
        () => { Thread.sleep(300); slowDone.set(true) }))
    }
    assert(e.getMessage == "fast failure")
    assert(slowDone.get(), "inParallel rethrew before the slow sibling quiesced")
  }

  test("a fatal leg error rethrows instead of hanging the caller") {
    val sibling = new java.util.concurrent.atomic.AtomicBoolean(false)
    // run with a watchdog: the pre-fix behavior is an infinite await, so a
    // plain intercept would hang the suite instead of failing it
    val t = new Thread(() =>
      try graft.functions.Par.inParallel(Seq(
        () => throw new OutOfMemoryError("synthetic — not a real allocation failure"),
        () => sibling.set(true)))
      catch { case _: OutOfMemoryError => () })
    t.setDaemon(true)
    t.start()
    t.join(10000)
    assert(!t.isAlive, "fatal leg error hung inParallel (Future never completed)")
    assert(sibling.get(), "sibling leg lost under a fatal error")
  }

  test("the fatal error itself is the one rethrown") {
    val e = intercept[OutOfMemoryError] {
      graft.functions.Par.inParallel(Seq(
        () => throw new OutOfMemoryError("synthetic"),
        () => ()))
    }
    assert(e.getMessage == "synthetic")
  }
}
