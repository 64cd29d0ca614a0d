package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** The fixture-time accumulator behind Bench's cold_engine /
  * cold_fixtures decomposition: nested timed sections must count
  * once (outermost-per-thread), concurrent outermost sections
  * accumulate independently, and `memo` attributes only the MISS. */
class FixtureClockSpec extends AnyFunSuite {

  test("nested timed sections accumulate the outermost span once") {
    val t0 = FixtureClock.totalNanos
    FixtureClock.timed {
      FixtureClock.timed { Thread.sleep(25) }
      Thread.sleep(25)
    }
    val dt = FixtureClock.totalNanos - t0
    // ≥ the real ~50ms wall span, and nowhere near the ~75ms a
    // double-counted inner section would add
    assert(dt >= 45e6, s"outermost span under-counted: ${dt / 1e6}ms")
    assert(dt < 70e6, s"nested section double-counted: ${dt / 1e6}ms")
  }

  test("memo attributes the builder miss only; hits are free") {
    val m = new java.util.concurrent.ConcurrentHashMap[String, String]()
    val t0 = FixtureClock.totalNanos
    val v1 = FixtureClock.memo(m, "k") { _ => Thread.sleep(30); "built" }
    val afterMiss = FixtureClock.totalNanos - t0
    assert(v1 == "built" && afterMiss >= 25e6,
      s"miss not attributed: ${afterMiss / 1e6}ms")
    val t1 = FixtureClock.totalNanos
    val v2 = FixtureClock.memo(m, "k") { _ => Thread.sleep(30); "rebuilt" }
    val hitCost = FixtureClock.totalNanos - t1
    assert(v2 == "built", "memo re-ran a cached builder")
    assert(hitCost < 10e6, s"cache hit charged fixture time: ${hitCost / 1e6}ms")
  }

  test("concurrent outermost sections on distinct threads both count") {
    val t0 = FixtureClock.totalNanos
    val ts = (1 to 2).map(_ => new Thread(() =>
      FixtureClock.timed { Thread.sleep(30) }))
    ts.foreach(_.start()); ts.foreach(_.join())
    val dt = FixtureClock.totalNanos - t0
    // two overlapping 30ms spans accumulate ~60ms of fixture time
    // (wall-clock per builder, like the memoized twins they wrap)
    assert(dt >= 50e6, s"concurrent spans lost: ${dt / 1e6}ms")
  }
}
