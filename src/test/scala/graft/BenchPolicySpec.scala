package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench retry contract (no SparkSession needed): transient
  * failures and VM outliers get exactly one retry; double failures
  * stay the -1.0 sentinel; normal times never re-run. */
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

  test("forced transient failure: one retry, retry time reported") {
    val (retry, calls) = counting(2.5)
    assert(BenchPolicy.finalTime(-1.0, 5.0, retry) == 2.5)
    assert(calls() == 1)
  }

  test("real failure: fails twice, sentinel stands, one retry only") {
    val (retry, calls) = counting(-1.0)
    assert(BenchPolicy.finalTime(-1.0, 5.0, retry) == -1.0)
    assert(calls() == 1)
  }

  test("outlier: one retry, min reported; failed retry keeps first") {
    val (retry, calls) = counting(3.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retry) == 3.0)
    assert(calls() == 1)
    val (retryUp, _) = counting(90.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retryUp) == 60.0)
    val (retryFail, _) = counting(-1.0)
    assert(BenchPolicy.finalTime(60.0, 5.0, retryFail) == 60.0)
  }

  test("normal time: no retry at all") {
    var calls = 0
    val t = BenchPolicy.finalTime(1.2, 5.0, () => { calls += 1; 0.0 })
    assert(t == 1.2 && calls == 0)
  }
}
