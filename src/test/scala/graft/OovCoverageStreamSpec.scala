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

      // at this cardinality the HLL++ sketch is in sparse mode, so
      // the distinct-term estimates are EXACT, not approximate —
      // srcA@10:00 sees {alpha beta zeta gamma qux} with {zeta qux}
      // OOV, srcB {beta omega}/{omega}, srcA@10:10 {foo bar baz} all
      // OOV
      val got = spark.table("oov_stream")
        .select(col("w_start").cast("string"), col("source"),
          col("n_tokens"), col("n_oov"), col("oov_mu"),
          col("n_terms_est"), col("n_oov_terms_est")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      val want = Set(
        ("2026-01-01 10:00:00", "srcA", 5L, 2L, 400000L, 5L, 2L),
        ("2026-01-01 10:00:00", "srcB", 2L, 1L, 500000L, 2L, 1L),
        ("2026-01-01 10:10:00", "srcA", 3L, 3L, 1000000L, 3L, 3L))
      assert(want.subsetOf(got), got.toString)
      // exactly once per finalized window, and no trace of the late row
      assert(got.count(_._1 == "2026-01-01 10:00:00") == 2, got.toString)
      assert(!got.exists(r => r._1 == "2026-01-01 10:00:00" &&
        r._2 == "srcA" && r._3 != 5L), got.toString)
    } finally q.stop()
  }

  test("HLL distinct-term estimate tracks a known batch cardinality " +
      "within the documented error") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // 3,000 distinct terms by construction (alphabetic — cleanTokens
    // strips digits, so "w123"-style names would all collapse to
    // "w"), 10 per row, of which the first 1,000 are in-vocab →
    // exact OOV distinct = 2,000. Dense-mode HLL++ at rsd 0.02:
    // assert within ±5% (2.5σ); the estimate is deterministic (fixed
    // xxhash64 seed), so this is a stable pin, not a flaky tolerance.
    def term(i: Int): String =
      s"w${('a' + i / 676).toChar}${('a' + i / 26 % 26).toChar}${('a' + i % 26).toChar}"
    val vocab = (0 until 1000).map(term).toDF("term")
    val rows = (0 until 300).map { r =>
      val text = (0 until 10).map(i => term(r * 10 + i)).mkString(" ")
      (ts(1), "src", text)
    }
    val input = MemoryStream[(Timestamp, String, String)]
    val out = StreamPipeline.oovCoverageStream(
      input.toDF().toDF("ts", "source", "text"), "ts", "text", "source",
      vocab, "term", windowDur = "10 minutes", watermark = "5 minutes")
    val q = out.writeStream.format("memory").queryName("oov_hll")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      input.addData((ts(40), "late", "w0")) // advance watermark
      q.processAllAvailable()
      val r = spark.table("oov_hll").filter(col("source") === "src")
        .select(col("n_tokens"), col("n_terms_est"),
          col("n_oov_terms_est")).head()
      assert(r.getLong(0) == 3000L, r.toString)
      val est = r.getLong(1).toDouble
      val oovEst = r.getLong(2).toDouble
      assert(math.abs(est / 3000.0 - 1.0) <= 0.05, s"n_terms_est=$est")
      assert(math.abs(oovEst / 2000.0 - 1.0) <= 0.05,
        s"n_oov_terms_est=$oovEst")
    } finally q.stop()
  }

}
