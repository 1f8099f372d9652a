package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench battery's load-gated self-adjudication machinery (r14):
  * pure-function tests with PLANTED load traces — no real minutes, no
  * real box load. The r13 protocol hole this closes: the adjudication
  * child launched inside the battery's own throttle window and
  * "confirmed" flags that cleared trivially once the box drained. */
class BenchSpec extends AnyFunSuite {

  private def trace(vals: Double*): () => Double = {
    val it = Iterator(vals: _*) ++ Iterator.continually(vals.last)
    () => it.next()
  }

  test("waitForLoadBelow: a draining box is waited out, then the child may launch") {
    var slept = 0L
    val (load, waited, recovered) = Bench.waitForLoadBelow(
      threshold = 4.0, maxWaitMs = 600000L,
      poll = trace(9.2, 7.5, 5.1, 3.4),
      sleepMs = 10000L, sleep = slept += _)
    assert(recovered, "the gate must open once load drops below the threshold")
    assert(load == 3.4)
    assert(waited == 30000L && slept == 30000L,
      "exactly three poll intervals were needed")
  }

  test("waitForLoadBelow: an immediately-idle box launches with zero wait") {
    var slept = 0L
    val (load, waited, recovered) = Bench.waitForLoadBelow(
      threshold = 4.0, maxWaitMs = 600000L,
      poll = trace(0.8), sleepMs = 10000L, sleep = slept += _)
    assert(recovered && load == 0.8 && waited == 0L && slept == 0L)
  }

  test("waitForLoadBelow: a box that never drains gives up at the bound and reports under-load") {
    var slept = 0L
    val (load, waited, recovered) = Bench.waitForLoadBelow(
      threshold = 4.0, maxWaitMs = 25000L,
      poll = trace(9.0), sleepMs = 10000L, sleep = slept += _)
    assert(!recovered, "a never-draining box must NOT report recovered")
    assert(load == 9.0)
    assert(waited == 25000L && slept == 25000L,
      "the wait must stop exactly at the bound (last interval clamped)")
  }

  test("waitForLoadBelow: an unreadable load (-1.0) opens the gate — no wait on boxes the JVM cannot meter") {
    val (load, waited, recovered) = Bench.waitForLoadBelow(
      threshold = 4.0, maxWaitMs = 600000L,
      poll = trace(-1.0), sleepMs = 10000L, sleep = _ => ())
    assert(recovered && load == -1.0 && waited == 0L,
      "getSystemLoadAverage returns -1.0 where unsupported; the gate must not spin on it")
  }
}
