package graft

/** Opt-in structured phase recorder for the iterative operators
  * (pagerank build/iterations, connected-components rounds).
  *
  * Purpose (r11 verdict #2): the bench ARTIFACT — not just stderr —
  * must carry per-phase evidence for q38-family runs, so when the
  * driver's environment inflates a first pass that every idle run
  * completes in a third of the time, the artifact itself shows WHICH
  * phase absorbed the difference (build vs a specific iteration)
  * instead of leaving a bare retry count to interpret.
  *
  * Disabled (the default) this is one volatile-read per phase — a
  * library operator must not accumulate state in embedding apps.
  * [[graft.Bench]] enables it and drains per timed run. Thread-safe:
  * operators may record from whatever thread runs the driver-side
  * loop; drain snapshots and clears atomically per call. */
object PhaseLog {
  @volatile var enabled = false
  private val buf =
    new java.util.concurrent.ConcurrentLinkedQueue[(String, Double)]()

  /** Record `label` taking `sec` seconds, if enabled. */
  def add(label: String, sec: Double): Unit =
    if (enabled) buf.add((label, sec))

  /** Snapshot and clear everything recorded since the last drain,
    * in recording order. */
  def drain(): Seq[(String, Double)] = {
    val out = Seq.newBuilder[(String, Double)]
    var e = buf.poll()
    while (e != null) { out += e; e = buf.poll() }
    out.result()
  }
}
