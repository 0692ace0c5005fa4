package graft

/** Self-calibration canary for the bench artifact (r16 verdict #6):
  * the r16 artifact read 1.98× while three same-binary idle passes
  * read 1.46–1.58× — a host page-supply collapse that needed
  * OUT-OF-BAND evidence to interpret. The artifact now carries its
  * own host multiplier: two fixed, code-independent measurements
  * taken immediately before and after the timed region, so a reader
  * can attribute a uniform per-query inflation to the host without
  * any external run.
  *
  *  - `pageTouchGibps`: first-touch rate of a fresh anonymous
  *    buffer, GiB/s — the exact resource whose collapse inflated
  *    r16 (observed 5.5 → 0.07 GiB/s across curation days). Fresh
  *    allocation each call: re-touching warm pages would measure
  *    memory bandwidth, not page supply.
  *  - a trivial fixed Spark query (timed in [[Bench]] itself — it
  *    needs the session): sum over range(2e8), a pure whole-stage-
  *    codegen loop with no I/O, no shuffle, and data-independent
  *    cost — the per-query floor the sub-second suite tail rides.
  *
  * Neither value feeds the retry policy (BenchPolicy stays anchored
  * to bench_ref.json); they are evidence, not control. */
object BenchCanary {

  /** GiB/s of first-touch over `gib` GiB of freshly allocated heap,
    * touching one byte per 4 KiB page. Returns a finite positive
    * value; the buffer is released on return. */
  def pageTouchGibps(gib: Int = 1): Double = {
    require(gib >= 1 && gib <= 8, "canary touch size in [1, 8] GiB")
    var total = 0L
    val t0 = System.nanoTime()
    var g = 0
    while (g < gib) {
      // 1 GiB chunks: a single multi-GiB array would need a long
      // index and G1 humongous regions; chunking measures the same
      // first-touch path
      val a = new Array[Byte](1 << 30)
      var i = 0
      while (i < a.length) { a(i) = 1; i += 4096 }
      total += a.length
      g += 1
    }
    val sec = (System.nanoTime() - t0) / 1e9
    (total.toDouble / (1L << 30)) / math.max(sec, 1e-9)
  }

  /** The artifact's `"canary"` JSON object from (pre, post) pairs of
    * (pageTouchGibps, trivialQuerySec). 3-decimal fixed point, same
    * formatter discipline as the rest of the Bench line. */
  def json(prePage: Double, preTrivial: Double,
           postPage: Double, postTrivial: Double): String = {
    def f3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    s"""{"page_touch_gibps_pre":${f3(prePage)},""" +
      s""""trivial_sum_sec_pre":${f3(preTrivial)},""" +
      s""""page_touch_gibps_post":${f3(postPage)},""" +
      s""""trivial_sum_sec_post":${f3(postTrivial)}}"""
  }
}
