package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** [[CorpusOps.readability]] — FRE / FK grade. Hand-computed docs pin
  * the vowel-group syllable heuristic (incl. the y-as-vowel and
  * vowelless-word floors), the sentence floor for unpunctuated text,
  * and both formula spellings end-to-end; plus the stateless streaming
  * face. */
class ReadabilitySpec extends AnyFunSuite with SparkSessionFixture {

  private val corpus: Seq[(Long, String)] = Seq(
    // 9 words, all monosyllabic, 2 sentences
    1L -> "The cat sat on the mat. It was flat.",
    // no terminal punctuation (sentence floor), vowelless word floor
    2L -> "xyz 123",
    // polysyllabic: 5+4+4+5+5 = 23 syllables, 5 words, 1 sentence
    3L -> "University education cultivates extraordinary capabilities.",
    4L -> "   ") // no words -> excluded

  private def run(): Map[Long, Seq[Long]] = {
    import spark.implicits._
    CorpusOps.readability(corpus.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> Seq(r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
  }

  test("easy text: monosyllables, two sentences") {
    val m = run()
    // fre = 206.835 - 1.015*(9/2) - 84.6*(9/9); fk = .39*4.5 + 11.8 - 15.59
    assert(m(1L) === Seq(9L, 2L, 9L, 117667500L, -2035000L))
  }

  test("sentence floor and vowelless-word floor") {
    val m = run()
    assert(m(2L) === Seq(2L, 1L, 2L, 120205000L, -3010000L))
    assert(!m.contains(4L))
  }

  test("hard text: FRE goes negative, FK grade high") {
    val m = run()
    assert(m(3L) === Seq(5L, 1L, 23L, -187400000L, 40640000L))
  }

  test("stateless: runs unchanged on a stream, batch-equal, no state") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val out = CorpusOps.readability(input.toDF().toDF("doc_id", "text"),
      "doc_id", "text")
    val q = out.writeStream.format("memory").queryName("read_stream")
      .outputMode("append").start()
    try {
      corpus.grouped(2).foreach { b => input.addData(b); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty)
    } finally q.stop()
    val streamed = spark.table("read_stream").collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("fre_mu")).toMap
    assert(streamed === run().map { case (k, v) => k -> v(3) })
  }
}
