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
}
