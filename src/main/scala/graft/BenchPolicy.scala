package graft

/** Pure retry policy for [[Bench]], extracted so the retry semantics
  * are unit-testable without a SparkSession: this VM's GC/steal noise
  * hits one random query per run with a 10-100x spike, and a one-off
  * environment hiccup can fail a working query's first pass — both
  * get exactly ONE retry; a real failure fails twice and is reported
  * failed (-1.0), never as a normal-looking time. */
object BenchPolicy {

  /** First-pass time above which a query is a suspected VM outlier:
    * 3x the median of successful times, floored at 5s (the VM also
    * inflates mid-size queries 2-3x, so a lower floor would retry
    * half the suite). */
  def outlierCutoff(firstPass: Iterable[Double]): Double = {
    val ok = firstPass.filter(_ >= 0).toSeq.sorted
    val median = if (ok.isEmpty) 0.0 else ok(ok.size / 2)
    math.max(5.0, 3 * median)
  }

  /** Reported time for a query given its first-pass time: invokes
    * `retry` at most once — for outliers (report the min: reproducible
    * work, not collector luck) and transient first-pass failures
    * (report the retry; if it fails again the -1.0 sentinel stands). */
  def finalTime(t: Double, cutoff: Double, retry: () => Double): Double =
    if (t > cutoff) { val r = retry(); if (r >= 0) math.min(t, r) else t }
    else if (t < 0) retry()
    else t
}
