package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.streaming.StreamPipeline

/** [[StreamPipeline.gopherQualityStream]] — the stateless ingest twin
  * of the batch t25 rule table ([[CorpusOps.gopherQuality]]). The
  * batch side derives duplicate-line stats via a (doc, line) keyed
  * agg; the twin folds them in-row over the distinct-line array. Pins:
  * full row equality on a corpus that exercises every rule (dup
  * lines, bullets, ellipsis, verdict both ways), equality on the real
  * single-line corpus, micro-batch split invariance, zero streaming
  * state. */
class GopherStreamSpec extends AnyFunSuite with SparkSessionFixture {

  // a doc passing every Gopher rule: >= 50 words, sane word length,
  // stop words, unique lines, no bullets/ellipsis, alphabetic
  private val passing: String = {
    val stop = "the quick brown fox and the lazy dog have come to rest of it that day with ease"
    (1 to 4).map(i => s"$stop line number variant $i indeed").mkString("\n")
  }
  private val corpus: Seq[(Long, String)] = Seq(
    1L -> passing,
    2L -> "dup line\ndup line\ndup line\nunique line here", // dup-line heavy
    3L -> "- bullet one\n- bullet two\nplain line",          // bullets
    4L -> "so it goes...\nand on...\nfin",                   // ellipsis
    5L -> "short doc",                                       // < 50 words
    6L -> "  \n \n",                                         // no words -> dropped
    7L -> "a b 12345 #### the line\na b 12345 #### the line")

  private val cols = Seq("doc_id", "n_words", "mean_wlen_mu", "n_req_stop",
    "dup_line_mu", "dup_char_mu", "bullet_mu", "ellipsis_mu", "alpha_mu",
    "pass_gopher")

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.select(cols.map(col): _*).collect()
      .map(r => r.getLong(0) -> (1 until cols.size).map(r.getLong)).toMap

  private def batch(rows: Seq[(Long, String)]): Map[Long, Seq[Long]] = {
    import spark.implicits._
    asMap(CorpusOps.gopherQuality(rows.toDF("doc_id", "text"), "doc_id", "text"))
  }

  private def streamed(batches: Seq[Seq[(Long, String)]], name: String)
      : Map[Long, Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    val out = StreamPipeline.gopherQualityStream(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty,
        "gopher twin must not allocate streaming state")
    } finally q.stop()
    asMap(spark.table(name))
  }

  test("stream twin equals the batch rule table on a rule-exercising corpus") {
    val b = batch(corpus)
    assert(!b.contains(6L)) // wordless doc dropped on both sides
    assert(b(1L).last === 1L, s"doc 1 should pass: ${b(1L)}")
    assert(b(2L).last === 0L) // dup-line fraction over threshold
    assert(b(5L).last === 0L) // word-count floor
    assert(streamed(Seq(corpus), "gq_stream_one") === b)
  }

  test("split invariance: any micro-batch partition gives the batch rows") {
    val b = batch(corpus)
    val split = streamed(
      Seq(corpus.take(2), corpus.slice(2, 5), corpus.drop(5)),
      "gq_stream_split")
    assert(split === b)
  }

  test("stream twin matches batch on the real (single-line) corpus") {
    import spark.implicits._
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .collect().toSeq
    assert(streamed(Seq(docs), "gq_stream_real") === batch(docs))
  }
}
