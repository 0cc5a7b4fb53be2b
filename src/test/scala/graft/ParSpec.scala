package graft

import java.util.concurrent.atomic.AtomicInteger

import graft.operators.Par

/** The concurrent-action helper under the micro-batch store fan-outs:
  * all bodies must run (even when one fails — a commit point sequenced
  * after the fan-out must never run before every supporting write has
  * finished, successfully or not), the first failure by submission
  * order is the one rethrown, and null slots (conditionally absent
  * writes) are skipped.
  */
class ParSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("runs every body concurrently and returns after all complete") {
    val started = new java.util.concurrent.CountDownLatch(3)
    val done = new AtomicInteger(0)
    Par.actions(
      Seq.fill(3)(() => {
        started.countDown()
        // deadlocks (and fails the 10s wait) unless all three bodies
        // are genuinely in flight at once
        assert(started.await(10, java.util.concurrent.TimeUnit.SECONDS))
        done.incrementAndGet(): Unit
      }): _*)
    assert(done.get() == 3)
  }

  test("every body runs even when an earlier one fails; first failure rethrown") {
    val ran = new AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Par.actions(
        () => { ran.incrementAndGet(); throw new IllegalStateException("a") },
        () => { ran.incrementAndGet(); throw new IllegalStateException("b") },
        () => { ran.incrementAndGet(): Unit })
    }
    assert(e.getMessage == "a") // first by submission order
    assert(ran.get() == 3)
  }

  test("null slots are skipped; single body runs inline") {
    val ran = new AtomicInteger(0)
    Par.actions(null, () => { ran.incrementAndGet(): Unit }, null)
    assert(ran.get() == 1)
  }

  test("an interrupted caller leaves no body running detached") {
    // the r18 advisor finding: an InterruptedException while draining
    // futures used to propagate immediately with pool.shutdown() only
    // — still-running bodies kept writing after the caller unwound.
    // Par must cancel + drain before rethrowing, so a body that
    // swallows its cancellation interrupt is still COMPLETE (never
    // in-flight) by the time the call exits.
    val bodyDone = new AtomicInteger(0)
    val bodyEntered = new java.util.concurrent.CountDownLatch(1)
    val outcome =
      new java.util.concurrent.atomic.AtomicReference[Throwable](null)
    val caller = new Thread(() => {
      try Par.actions(
        () => {
          bodyEntered.countDown()
          // simulate a write that ignores interrupts for a while
          val t0 = System.nanoTime()
          while (System.nanoTime() - t0 < 700L * 1000 * 1000) {}
          bodyDone.incrementAndGet(): Unit
        },
        () => {
          val t0 = System.nanoTime()
          while (System.nanoTime() - t0 < 700L * 1000 * 1000) {}
          bodyDone.incrementAndGet(): Unit
        })
      catch { case t: Throwable => outcome.set(t) }
    })
    caller.start()
    assert(bodyEntered.await(10, java.util.concurrent.TimeUnit.SECONDS))
    caller.interrupt() // lands in f.get() while bodies still run
    caller.join(10000)
    assert(!caller.isAlive, "caller must return")
    assert(outcome.get().isInstanceOf[InterruptedException],
      s"interrupt must rethrow, got ${outcome.get()}")
    // the drain ran: both bodies finished before the call exited
    // (they ignore the cancellation interrupt, so "finished" is the
    // only way out — a detached body would still be mid-spin here)
    assert(bodyDone.get() == 2,
      s"bodies must not outlive the call: ${bodyDone.get()} of 2 done")
  }
}
