package graft

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.StreamPipeline

/** [[StreamPipeline.ttlDedupStream]] — the transformWithState
  * first-seen admission gate. ProcessingTime TimeMode schedules
  * batches CONTINUOUSLY to advance the TTL clock (probed: batch ids
  * climb with no input, so `processAllAvailable` never latches — a
  * deployment sets a trigger interval); the spec therefore drives
  * batch separation through a progress listener counting consumed
  * input rows, under a 50 ms trigger. Pins cross-batch admission
  * (first occurrence in, repeats dropped), state bounded by distinct
  * fingerprints, and batch-split invariance of the admitted KEY SET.
  * Runs under the RocksDB state store provider the API requires. */
class TtlDedupStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private val docs: Seq[(Long, String)] = Seq(
    1L -> "alpha text", 2L -> "beta text", 3L -> "alpha text",
    4L -> "gamma text", 5L -> "beta text", 6L -> "alpha text",
    7L -> "delta text")

  private def waitFor(what: String)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + 60000
    while (!cond) {
      assert(System.currentTimeMillis < end, s"timeout waiting for $what")
      Thread.sleep(50)
    }
  }

  /** Returns (admitted (id, text) rows, final state rows). */
  private def run(batches: Int, name: String): (Seq[(Long, String)], Long) = {
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
      val input = MemoryStream[(Long, String)]
      val out = StreamPipeline.ttlDedupStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text",
        md5(col("text")), java.time.Duration.ofHours(1))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        var added = 0L
        val size = math.max(1, (docs.size + batches - 1) / batches)
        docs.grouped(size).foreach { b =>
          input.addData(b)
          added += b.size
          val target = added
          waitFor(s"$target rows consumed")(consumed.get >= target)
        }
        val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        (spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSeq, state)
      } finally q.stop()
    } finally {
      spark.streams.removeListener(listener)
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("first occurrence admitted, repeats dropped across batches") {
    val (rows, state) = run(batches = 7, name = "ttl_one_by_one")
    // one doc per batch: the admitted ids are exactly first arrivals
    assert(rows.sortBy(_._1) === Seq(1L -> "alpha text",
      2L -> "beta text", 4L -> "gamma text", 7L -> "delta text"))
    assert(state === 4L, "one state row per distinct live fingerprint")
  }

  test("admitted key set is batch-split invariant") {
    val keys3 = run(batches = 3, name = "ttl_three")._1.map(_._2).sorted
    val keys1 = run(batches = 1, name = "ttl_single")._1.map(_._2).sorted
    assert(keys3 === Seq("alpha text", "beta text", "delta text",
      "gamma text"))
    assert(keys1 === keys3)
  }
}
