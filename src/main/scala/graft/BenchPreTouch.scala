package graft

import org.apache.spark.sql.SparkSession

/** The opt-in heap pre-touch behind `SPARK_GRAFT_PRETOUCH` (round 15;
  * hardened round 16). Extracted from [[Bench]] so the guards are
  * spec-testable:
  *
  *  - `parseGib` never throws on a malformed value (a bad env var
  *    must not abort the bench) and treats "off" as silence;
  *  - `run` refuses to touch when ANY SparkSession is already live:
  *    on this VM a multi-GiB touch takes minutes at the host's
  *    page-supply rate, long enough to starve the executor heartbeat
  *    and kill a live context (observed in round 15: every warm-up
  *    query failing on a stopped SparkContext). Strictly pre-session
  *    or not at all;
  *  - the requested size clamps to half of max heap: a touch at or
  *    over the heap OOMs the toucher threads (uncaught, stderr-only)
  *    while silently under-touching before timing begins.
  */
object BenchPreTouch {

  /** None for absent/malformed/"off"/non-positive values. */
  def parseGib(raw: Option[String]): Option[Int] = raw.flatMap { v =>
    val parsed = v.toIntOption
    if (parsed.isEmpty && v != "off")
      System.err.println(s"[bench] ignoring malformed SPARK_GRAFT_PRETOUCH='$v'")
    parsed.filter(_ > 0)
  }

  /** Touch `askGib` GiB of heap (clamped) and return the wall seconds,
    * or None if a SparkSession is already live (fail fast, loudly). */
  def run(askGib: Int): Option[Double] = {
    if (SparkSession.getActiveSession.nonEmpty ||
        SparkSession.getDefaultSession.nonEmpty) {
      System.err.println(
        "[bench] REFUSING heap pre-touch: a SparkSession is already live " +
          "and a multi-minute touch would starve the executor heartbeat " +
          "(r15 observed failure mode); run the touch strictly pre-session")
      return None
    }
    val maxGib = (Runtime.getRuntime.maxMemory() / 2 / (1L << 30)).toInt
    val gib = math.min(askGib, maxGib)
    if (gib < askGib)
      System.err.println(
        s"[bench] clamping pre-touch $askGib GiB to $gib GiB (half of max heap)")
    if (gib <= 0) return None
    val t0 = System.nanoTime()
    val threads = 16
    val perThreadLongs = gib.toLong * (1L << 30) / threads / 8
    val pool = (0 until threads).map { _ =>
      new Thread(() => {
        val chunk = 1 << 20 // 8 MiB arrays
        // hold every array until the thread ends so pages are
        // distinct regions, not GC-recycled ones
        val keep = scala.collection.mutable.ArrayBuffer.empty[Array[Long]]
        var remaining = perThreadLongs
        while (remaining > 0) {
          val n = math.min(chunk.toLong, remaining).toInt
          val a = new Array[Long](n)
          var i = 0
          while (i < n) { a(i) = 1L; i += 512 }
          keep += a
          remaining -= n
        }
        keep.clear()
      })
    }
    pool.foreach(_.start())
    pool.foreach(_.join())
    System.gc() // drop the toucher arrays; pages stay materialized
    val sec = (System.nanoTime() - t0) / 1e9
    System.err.println(f"[bench] heap pre-touch $gib GiB in $sec%.1fs")
    Some(sec)
  }
}
