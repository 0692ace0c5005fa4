package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the opt-in bench heap pre-touch (r15 advice + r16
  * verdict item 8). The session-exists refusal is the load-bearing
  * pin: a multi-GiB touch at this VM's page-supply rate takes
  * minutes, long enough to starve the executor heartbeat and kill a
  * live SparkContext (the observed r15 failure mode — every warm-up
  * query dying on a stopped context). */
class BenchPreTouchSpec extends AnyFunSuite with SparkSessionFixture {

  test("parseGib: malformed, off, absent, and non-positive all map to None") {
    assert(BenchPreTouch.parseGib(None).isEmpty)
    assert(BenchPreTouch.parseGib(Some("off")).isEmpty)
    assert(BenchPreTouch.parseGib(Some("banana")).isEmpty)
    assert(BenchPreTouch.parseGib(Some("12.5")).isEmpty)
    assert(BenchPreTouch.parseGib(Some("0")).isEmpty)
    assert(BenchPreTouch.parseGib(Some("-4")).isEmpty)
    assert(BenchPreTouch.parseGib(Some("16")).contains(16))
  }

  test("run refuses while a SparkSession is live (the heartbeat-starvation path)") {
    // the fixture's session is active — the touch must decline
    // instantly rather than stall the executor heartbeat
    assert(spark.sparkContext.isStopped === false)
    val t0 = System.nanoTime()
    val out = BenchPreTouch.run(8)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(out.isEmpty, "pre-touch ran despite a live session")
    assert(sec < 1.0, f"refusal must be fail-fast, took $sec%.1fs")
    // and the session is still usable afterwards
    assert(spark.range(10).count() === 10L)
  }
}
