package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** Streaming dictionary encode: tokenizeToIds' frozen-dictionary
  * overload applied to an unbounded stream must produce exactly the
  * batch encoding, independent of micro-batch split, with no
  * streaming state (the tokenize-once contract's stream side —
  * ingest encodes arriving docs against the batch-frozen vocab). */
class TokenIdsStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val texts =
    Seq("the cat sat", "sat on the mat", "a cat and a dog", "the end")
  private val terms = Seq("the", "cat", "sat", "on")

  private def toks = graft.functions.TextOps.cleanTokens(col("text"))

  private def streamEncode(batches: Seq[Seq[String]], name: String)
      : Map[String, Seq[Int]] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val enc = CorpusOps.tokenizeToIds(
      input.toDF().toDF("text"), toks, terms, "token_ids")
    val q = enc.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty,
        "dictionary encode must not allocate streaming state")
    } finally q.stop()
    spark.table(name).select("text", "token_ids").as[(String, Seq[Int])]
      .collect().toMap
  }

  test("stream encode equals batch encode under any micro-batch split") {
    import spark.implicits._
    val batch = CorpusOps.tokenizeToIds(
        texts.toDF("text"), toks, terms, "token_ids")
      .select("text", "token_ids").as[(String, Seq[Int])]
      .collect().toMap
    assert(batch("the cat sat") == Seq(1, 2, 3))
    assert(batch("a cat and a dog") == Seq(0, 2, 0, 0, 0)) // OOV -> 0
    val oneShot = streamEncode(Seq(texts), "tid_stream_one")
    val split = streamEncode(
      Seq(texts.take(2), texts.slice(2, 3), texts.drop(3)),
      "tid_stream_split")
    assert(oneShot == batch)
    assert(split == batch)
  }
}
