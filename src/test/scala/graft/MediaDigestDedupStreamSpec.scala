package graft

import java.util.concurrent.atomic.AtomicLong

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{StreamingQueryListener, Trigger}

import graft.streaming.StreamPipeline

/** [[StreamPipeline.mediaDigestDedupStream]] — the streaming twin of
  * the v3 batch digest-dedup query, run over the SAME committed media
  * fixture v3's oracle covers (media_videos.parquet, which plants
  * exact payload twins). Pins:
  *  - the admitted id set equals the batch keeper set (min-id per
  *    sha256 digest class) when input arrives id-ordered — i.e. the
  *    stream gate and the batch query compute the same partition of
  *    rows and the same representatives;
  *  - cross-batch drops: a twin arriving in a LATER micro-batch than
  *    its original is still dropped (state, not per-batch dedup);
  *  - emitted digests are the real sha256 hex (independently
  *    recomputed with java.security.MessageDigest, not Spark);
  *  - state is bounded by distinct digests, not rows.
  * RocksDB provider as transformWithState requires; batch separation
  * driven through a progress listener (the TtlDedupStreamSpec
  * device — ProcessingTime TimeMode never latches processAllAvailable).
  */
class MediaDigestDedupStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def sha256Hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map(x => f"$x%02x").mkString

  private def waitFor(what: String)(cond: => Boolean): Unit = {
    val end = System.currentTimeMillis + 60000
    while (!cond) {
      assert(System.currentTimeMillis < end, s"timeout waiting for $what")
      Thread.sleep(50)
    }
  }

  test("admitted set equals the batch min-id digest partition; twins drop cross-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    // id-ordered fixture rows — the order under which the stream's
    // first-seen keeper IS the batch min-id keeper
    val rows = spark.read
      .parquet(s"${SparkEntry.FixtureDir}/media_videos.parquet")
      .select("media_id", "payload").collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      .sortBy(_._1).toSeq
    assert(rows.nonEmpty)

    val byDigest = rows.groupBy { case (_, p) => sha256Hex(p) }
    val expectKeep = byDigest.map { case (d, g) => (g.map(_._1).min, d) }.toSet
    assert(byDigest.exists(_._2.size > 1),
      "fixture must plant at least one exact payload twin")
    // at least one twin pair must straddle the 3-batch split below,
    // or the cross-batch claim tests nothing
    val size = math.max(1, (rows.size + 2) / 3)
    val batchOf = rows.grouped(size).zipWithIndex
      .flatMap { case (b, i) => b.map { case (id, _) => id -> i } }.toMap
    assert(byDigest.values.exists(g =>
      g.map(x => batchOf(x._1)).distinct.size > 1),
      "twins must straddle micro-batches for the cross-batch pin")
    // The admitted-set == min-id-keeper equality below additionally
    // relies on intra-batch ORDER never deciding a keeper: value order
    // after the groupByKey shuffle is not guaranteed, so if a digest
    // class had two members in the same micro-batch with no
    // earlier-batch keeper, first-seen could pick the higher id and
    // flake. Make the assumption explicit — every multi-member class's
    // min-id member must sit in a strictly earlier batch than ALL its
    // twins; a future fixture violating this must fail loudly here,
    // not intermittently at the equality.
    byDigest.values.filter(_.size > 1).foreach { g =>
      val minId = g.map(_._1).min
      g.map(_._1).filter(_ != minId).foreach { id =>
        assert(batchOf(id) > batchOf(minId),
          s"fixture/batching invariant broken: twin $id (batch " +
            s"${batchOf(id)}) must arrive strictly after keeper $minId " +
            s"(batch ${batchOf(minId)})")
      }
    }

    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    val consumed = new AtomicLong(0)
    val name = "media_digest_dedup_stream"
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
      val input = MemoryStream[(Long, Array[Byte])]
      val out = StreamPipeline.mediaDigestDedupStream(
        input.toDF().toDF("media_id", "payload"), "media_id", "payload",
        java.time.Duration.ofHours(1))
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.ProcessingTime("50 milliseconds")).start()
      try {
        var added = 0L
        rows.grouped(size).foreach { b =>
          input.addData(b)
          added += b.size
          val target = added
          waitFor(s"$target rows consumed")(consumed.get >= target)
        }
        waitFor("all admissions emitted")(
          spark.table(name).count() >= expectKeep.size)
        val got = spark.table(name).collect()
          .map(r => (r.getLong(0), r.getString(1))).toSet
        assert(got === expectKeep)
        val state = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
        assert(state === byDigest.size.toLong)
      } finally q.stop()
    } finally {
      spark.streams.removeListener(listener)
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
