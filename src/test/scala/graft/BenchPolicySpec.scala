package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench retry contract (no SparkSession needed): transient
  * failures get exactly one retry; double failures stay the -1.0
  * sentinel; suspected outliers re-run up to best-of-3 with early
  * stop under the cutoff; cutoffs anchor to the recorded reference
  * time when one exists; normal times never re-run. */
class BenchPolicySpec extends AnyFunSuite {

  private def counting(results: Double*): (() => Double, () => Int) = {
    var calls = 0
    (() => { val r = results(calls.min(results.length - 1)); calls += 1; r },
      () => calls)
  }

  test("outlier cutoff: 3x median of successes, 5s floor") {
    assert(BenchPolicy.outlierCutoff(Seq(0.2, 0.4, 0.6)) == 5.0)
    assert(BenchPolicy.outlierCutoff(Seq(2.0, 3.0, 4.0)) == 9.0)
    // failures are excluded from the median
    assert(BenchPolicy.outlierCutoff(Seq(-1.0, 2.0, 3.0, 4.0)) == 9.0)
    assert(BenchPolicy.outlierCutoff(Seq.empty[Double]) == 5.0)
  }

  test("reference cutoff: 1.5x the recorded time, same 5s floor") {
    assert(BenchPolicy.refCutoff(6.0) == 9.0)
    // with a reference the median cutoff is ignored; without, used
    assert(BenchPolicy.cutoffFor(Some(6.0), 30.0) == 9.0)
    assert(BenchPolicy.cutoffFor(None, 30.0) == 30.0)
  }

  test("secondary small-query cutoff: >3x ref AND >0.5s retries, noise does not") {
    // r14 artifact: q8_semi_join 0.87s vs ref 0.197 (4.4x) rode the
    // 5s floor — 3x·ref with the 0.5s floor now catches it
    assert(math.abs(BenchPolicy.refCutoff(0.197) - 0.591) < 1e-9)
    assert(0.87 > BenchPolicy.refCutoff(0.197)) // q8 would now retry
    // tiny refs: the 0.5s floor keeps micro-query jitter exempt
    assert(BenchPolicy.refCutoff(0.05) == 0.5)
    // mid-size: whichever bound is tighter applies, never below 0.5
    assert(BenchPolicy.refCutoff(1.0) == 3.0)
    assert(BenchPolicy.refCutoff(2.0) == 5.0)  // 1.5x floor regime
    // large refs unchanged: 1.5x dominates past ref >= 3.33s
    assert(BenchPolicy.refCutoff(4.0) == 6.0)
  }

  test("forced transient failure: one retry, retry time reported") {
    val (retry, calls) = counting(2.5)
    assert(BenchPolicy.finalTime(-1.0, 5.0, retry) == ((2.5, 1)))
    assert(calls() == 1)
  }

  test("real failure: fails twice, sentinel stands, one retry only") {
    val (retry, calls) = counting(-1.0)
    assert(BenchPolicy.finalTime(-1.0, 5.0, retry) == ((-1.0, 1)))
    assert(calls() == 1)
  }

  test("outlier landing under cutoff on first retry stops early") {
    val (retry, calls) = counting(3.0, 99.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retry) == ((3.0, 1)))
    assert(calls() == 1)
  }

  test("outlier staying above cutoff takes best-of-3 and reports min") {
    // the r5/r6 artifact failure mode: retry #1 inflates too
    val (retry, calls) = counting(12.0, 6.5)
    assert(BenchPolicy.finalTime(13.0, 9.0, retry) == ((6.5, 2)))
    assert(calls() == 2)
    // all three inflated: min of the three stands, exactly 2 extras
    val (retryUp, callsUp) = counting(90.0, 80.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retryUp) == ((60.0, 2)))
    assert(callsUp() == 2)
  }

  test("failed retry during outlier re-run keeps the measured min") {
    val (retry, calls) = counting(-1.0, 3.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retry) == ((3.0, 2)))
    assert(calls() == 2)
  }

  test("normal time: no retry at all") {
    var calls = 0
    val (t, extra) = BenchPolicy.finalTime(1.2, 5.0, () => { calls += 1; 0.0 })
    assert(t == 1.2 && extra == 0 && calls == 0)
  }

  test("reference map parse: flat pairs, junk keys harmless, bad input empty") {
    val m = BenchPolicy.parseRefTimes(
      """{"metric":"total","value":145.1,"unit":"sec","queries":{"q1_agg":0.5,"q38_pagerank":6.08},"sf":"/x"}""")
    assert(m("q1_agg") == 0.5 && m("q38_pagerank") == 6.08)
    assert(m.get("sf").isEmpty) // string-valued keys don't parse as refs
    assert(BenchPolicy.parseRefTimes("not json at all").isEmpty)
  }

  test("reference map parse: scoped to the queries object — retries/value pairs never shadow times") {
    // the natural curation workflow copies bench_out.json verbatim;
    // its trailing retries object must NOT overwrite q38's real time
    val m = BenchPolicy.parseRefTimes(
      """{"metric":"total","value":191.1,"unit":"sec","queries":{"q38_pagerank":4.97,"d13_dedup_policies":6.22},"sf":"/x","retries":{"d13_dedup_policies":1,"q38_pagerank":2},"failed":[],"first_pass":{"q38_pagerank":8.73,"d13_dedup_policies":6.3}}""")
    assert(m("q38_pagerank") == 4.97 && m("d13_dedup_policies") == 6.22)
    assert(m.get("value").isEmpty) // top-level numerics stay outside scope
    // a flat map with no "queries" key still parses whole
    assert(BenchPolicy.parseRefTimes("""{"q1":1.5,"q2":2.5}""") ==
      Map("q1" -> 1.5, "q2" -> 2.5))
  }

  test("canary JSON: fixed keys, 3-decimal values, parseable as a flat map") {
    val j = BenchCanary.json(5.456789, 0.1234, 0.07111, 2.5)
    assert(j ==
      """{"page_touch_gibps_pre":5.457,"trivial_sum_sec_pre":0.123,""" +
      """"page_touch_gibps_post":0.071,"trivial_sum_sec_post":2.500}""")
    // and the canary must NEVER leak into parsed reference times when
    // a full bench_out.json line is used as bench_ref.json — the
    // queries-scope rule covers it
    val line = s"""{"metric":"total","value":9.9,"queries":{"q1":1.5},""" +
      s""""canary":$j}"""
    assert(BenchPolicy.parseRefTimes(line) == Map("q1" -> 1.5))
  }

  test("canary page-touch measurement is finite and positive") {
    val v = BenchCanary.pageTouchGibps(1)
    assert(v > 0.0 && java.lang.Double.isFinite(v), s"got $v")
    // the knob is bounded — an 0/oversized request is a coding error
    intercept[IllegalArgumentException](BenchCanary.pageTouchGibps(0))
    intercept[IllegalArgumentException](BenchCanary.pageTouchGibps(99))
  }
}
