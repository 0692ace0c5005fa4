package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** The streaming face of [[CorpusOps.repetitionSignals]]: because the
  * whole table is one stateless narrow projection (the
  * [[graft.plans.RepetitionStats]] expression — no agg, no join), the
  * SAME operator runs unchanged on a streaming DataFrame; no twin
  * spelling exists to drift. Pins: stream == batch row-for-row on a
  * corpus exercising both n-gram families, micro-batch split
  * invariance, and zero streaming state. */
class RepStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val corpus: Seq[(Long, Seq[String])] = Seq(
    1L -> Seq("a", "b", "a", "b", "a", "b"),
    2L -> Seq("a", "b", "c", "d", "e", "f", "g", "h",
      "a", "b", "c", "d", "e", "i", "j"),
    3L -> ('a' to 'z').map(_.toString),
    4L -> Seq("solo"))

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map { r =>
      r.getLong(0) -> (1 until r.size).map(r.getLong)
    }.toMap

  private def batch(): Map[Long, Seq[Long]] = {
    import spark.implicits._
    asMap(CorpusOps.repetitionSignals(
      corpus.toDF("doc_id", "toks"), "doc_id", col("toks")))
  }

  private def streamed(batches: Seq[Seq[(Long, Seq[String])]], name: String)
      : Map[Long, Seq[Long]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, Seq[String])]
    val out = CorpusOps.repetitionSignals(
      input.toDF().toDF("doc_id", "toks"), "doc_id", col("toks"))
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty,
        "repetition signals must not allocate streaming state")
    } finally q.stop()
    asMap(spark.table(name))
  }

  test("the batch operator runs unchanged on a stream and agrees") {
    assert(streamed(Seq(corpus), "rep_stream_one") === batch())
  }

  test("micro-batch splits cannot move any value") {
    val split = corpus.grouped(1).toSeq
    assert(streamed(split, "rep_stream_split") === batch())
  }
}
