package graft

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.StreamPipeline

/** [[StreamPipeline.sourceQuotaStream]] — the per-key fairness gate.
  * Pins per-window caps (hot key clipped, quiet keys untouched),
  * quota carry across micro-batches within one window, and the lazy
  * window reset (a huge window never resets; a 1 ms window resets
  * after any sleep). Same harness as TtlDedupStreamSpec: RocksDB
  * provider, 50 ms trigger, progress-listener batch separation. */
class SourceQuotaStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def waitFor(what: String)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + 60000
    while (!cond) {
      assert(System.currentTimeMillis < end, s"timeout waiting for $what")
      Thread.sleep(50)
    }
  }

  /** Drives `groups` of (source, id, text) rows batch-by-batch;
    * returns admitted ids per source. */
  private def run(groups: Seq[Seq[(String, Long, String)]], name: String,
                  maxPerWindow: Int, window: java.time.Duration,
                  interBatchSleepMs: Long = 0): Map[String, Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val consumed = new AtomicLong(0)
    val listener = new StreamingQueryListener {
      override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.name == name)
          consumed.addAndGet(e.progress.numInputRows)
      override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      val input = MemoryStream[(String, Long, String)]
      val out = StreamPipeline.sourceQuotaStream(
        input.toDF().toDF("source", "doc_id", "text"),
        "source", "doc_id", "text", maxPerWindow, window)
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        var added = 0L
        groups.foreach { g =>
          if (interBatchSleepMs > 0) Thread.sleep(interBatchSleepMs)
          input.addData(g)
          added += g.size
          val target = added
          waitFor(s"$target rows consumed")(consumed.get >= target)
        }
      } finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted.toSeq }
    } finally {
      spark.streams.removeListener(listener)
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("hot key clipped at the cap; quiet keys untouched") {
    val batch = (1L to 6L).map(i => ("hot", i, s"h$i")) ++
      Seq(("quiet", 10L, "q1"), ("quiet", 11L, "q2"))
    val got = run(Seq(batch), "quota_clip", maxPerWindow = 3,
      window = java.time.Duration.ofHours(1))
    assert(got("hot").size === 3)
    assert(got("quiet") === Seq(10L, 11L))
  }

  test("quota carries across micro-batches within one window") {
    val groups = Seq(
      Seq(("hot", 1L, "a"), ("hot", 2L, "b")),
      Seq(("hot", 3L, "c"), ("hot", 4L, "d")),
      Seq(("hot", 5L, "e")))
    val got = run(groups, "quota_carry", maxPerWindow = 3,
      window = java.time.Duration.ofHours(1))
    // 2 + 1 admitted, then the window's budget is spent
    assert(got("hot").size === 3)
  }

  test("window reset: a new window refills the budget") {
    val groups = Seq(
      Seq(("hot", 1L, "a"), ("hot", 2L, "b"), ("hot", 3L, "c")),
      Seq(("hot", 4L, "d"), ("hot", 5L, "e")))
    val got = run(groups, "quota_reset", maxPerWindow = 2,
      window = java.time.Duration.ofMillis(1), interBatchSleepMs = 200)
    // each batch lands in its own 1 ms window: 2 admitted, then 2
    assert(got("hot").size === 4)
    assert(got("hot").take(2) === Seq(1L, 2L))
  }
}
