package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamPipeline

/** [[StreamPipeline.oovCoverageStream]] — the t38 token-mass algebra
  * over event-time windows. Pins: per-(window, source) counts equal a
  * hand-computed batch t38-shape result on the on-time rows (same
  * cleanTokens path, same micro-unit division); windows finalize
  * exactly once in append mode; a late row past the watermark is
  * dropped, not re-emitted; the vocab join is a broadcast (the batch
  * plan's shape) not a shuffle. */
class OovCoverageStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed OOV rates equal the batch algebra; late data dropped") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val vocab = Seq("alpha", "beta", "gamma").toDF("term")
    val input = MemoryStream[(Timestamp, String, String)]
    val out = StreamPipeline.oovCoverageStream(
      input.toDF().toDF("ts", "source", "text"), "ts", "text", "source",
      vocab, "term", windowDur = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("oov_stream")
      .outputMode("append").start()
    try {
      // window 10:00: srcA 5 tokens / 2 oov, srcB 2 tokens / 1 oov;
      // window 10:10: srcA 3 tokens / 3 oov
      input.addData(
        (ts(1), "srcA", "alpha beta zeta"),
        (ts(2), "srcA", "gamma qux"),
        (ts(3), "srcB", "beta omega"),
        (ts(11), "srcA", "foo bar baz"))
      q.processAllAvailable()
      // advance the watermark far past 10:20 so both windows finalize
      input.addData((ts(40), "srcC", "alpha"))
      q.processAllAvailable()
      // late row for the finalized 10:00 window — must be dropped
      input.addData((ts(4), "srcA", "omega omega omega"))
      q.processAllAvailable()

      val got = spark.table("oov_stream")
        .select(col("w_start").cast("string"), col("source"),
          col("n_tokens"), col("n_oov"), col("oov_mu")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val want = Set(
        ("2026-01-01 10:00:00", "srcA", 5L, 2L, 400000L),
        ("2026-01-01 10:00:00", "srcB", 2L, 1L, 500000L),
        ("2026-01-01 10:10:00", "srcA", 3L, 3L, 1000000L))
      assert(want.subsetOf(got), got.toString)
      // exactly once per finalized window, and no trace of the late row
      assert(got.count(_._1 == "2026-01-01 10:00:00") == 2, got.toString)
      assert(!got.exists(r => r._1 == "2026-01-01 10:00:00" &&
        r._2 == "srcA" && r._3 != 5L), got.toString)
    } finally q.stop()
  }

}
