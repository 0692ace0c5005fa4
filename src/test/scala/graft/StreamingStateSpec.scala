package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** Stateful streaming operators: watermarked windows, late-data
  * eviction, dedup-within-watermark. */
class StreamingStateSpec extends AnyFunSuite with SparkSessionFixture {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("watermarked tumbling window aggregates by event time; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val counts = StreamPipeline.windowedCounts(
      input.toDF().toDF("ts", "k"), "ts", "k", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()

    input.addData((ts(1), "a"), (ts(2), "a"), (ts(11), "b"))
    q.processAllAvailable()
    // advance watermark beyond 10:10 so the first window finalizes
    input.addData((ts(21), "c"))
    q.processAllAvailable()
    // a record for the already-finalized 10:00 window arrives too late
    input.addData((ts(3), "a"))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_counts")
      .select(col("bucket").cast("string"), col("k"), col("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    // the finalized 10:00 window holds exactly the 2 on-time 'a' rows —
    // the late third 'a' was dropped by the watermark
    assert(rows.contains(("2026-01-01 10:00:00", "a", 2L)), rows.toString)
    assert(!rows.exists(r => r._2 == "a" && r._3 == 3L))
  }

  test("dropDuplicatesWithinWatermark evicts dup ids inside the horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val dedup = StreamPipeline.dedupWithinWatermark(
      input.toDF().toDF("ts", "id"), "id", "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()

    input.addData((ts(1), "x"), (ts(2), "x"), (ts(3), "y"))
    q.processAllAvailable()
    input.addData((ts(4), "x")) // still within horizon → dropped
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("id").collect().map(_.getString(0))
    assert(ids.sorted.toSeq == Seq("x", "y"))
  }

  test("streaming minhash dedup drops signature-identical near-dups") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val dedup = StreamPipeline.minhashDedupWithinWatermark(
      input.toDF().toDF("ts", "text"), "text", "ts", "10 minutes")
    val q = dedup.writeStream.format("memory").queryName("mh_dedup_out")
      .outputMode("append").start()

    // same trigram set after lowercasing → same signature → near-dup,
    // even though the raw strings differ (exact dedup would keep both)
    input.addData(
      (ts(1), "The quick brown fox jumps over the lazy dog"),
      (ts(2), "THE QUICK BROWN FOX JUMPS OVER THE LAZY DOG"),
      (ts(3), "a completely different document about spark engines"))
    q.processAllAvailable()
    input.addData((ts(4), "the quick brown fox jumps over the lazy dog"))
    q.processAllAvailable()
    q.stop()

    val texts = spark.table("mh_dedup_out").select("text").collect()
      .map(_.getString(0))
    assert(texts.length == 2, texts.mkString("; "))
    assert(texts.count(_.toLowerCase.contains("quick brown fox")) == 1)
    // signature helper columns must not leak into the output
    assert(spark.table("mh_dedup_out").columns.toSet == Set("ts", "text"))
  }
}
