package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.streaming.StreamPipeline

/** Streaming twin of the t18 BPE-encode census: a batch-trained merge
  * table applied map-side to an unbounded stream must census exactly
  * like the batch encode, independent of how the stream is split into
  * micro-batches (the operator is stateless, so split-invariance is
  * the whole correctness claim). */
class BpeStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val texts = Seq(
    "abab abab ac", "the cat sat", "abab the ac ac", "cat cat abab")

  private def batchDocs = {
    import spark.implicits._
    texts.toDF("text")
  }

  private def toks = graft.functions.TextOps.cleanTokens(col("text"))

  private def streamCensus(batches: Seq[Seq[String]],
                           merges: Seq[(String, String)],
                           name: String): Map[String, Long] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val census = StreamPipeline
      .bpeEncodeStream(input.toDF().toDF("text"), "text", merges)
      .groupBy(col("sym")).count()
    val q = census.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()
    spark.table(name).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("stream census equals batch t18 census, any micro-batch split") {
    val merges = CorpusOps.bpeFit(batchDocs, toks, nMerges = 3)
      .orderBy("merge_rank").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.nonEmpty)
    val batch = CorpusOps.bpeEncode(batchDocs, toks, nMerges = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oneShot = streamCensus(Seq(texts), merges, "bpe_census_one")
    val split = streamCensus(
      Seq(texts.take(1), texts.slice(1, 3), texts.drop(3)),
      merges, "bpe_census_split")
    assert(oneShot == batch, s"one-shot stream diverged:\n$oneShot\n$batch")
    assert(split == batch, s"split stream diverged:\n$split\n$batch")
  }

  test("encode stream stays stateless: no state store in the plan") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[String]
    val enc = StreamPipeline.bpeEncodeStream(
      input.toDF().toDF("text"), "text", Seq(("a", "b")))
    val q = enc.writeStream.format("memory").queryName("bpe_plain")
      .outputMode("append").start()
    try {
      input.addData(Seq("abab ab"))
      q.processAllAvailable()
      val plan = q.lastProgress.sources.length // query ran at all
      assert(plan == 1)
      assert(q.lastProgress.stateOperators.isEmpty,
        "map-side encode must not allocate streaming state")
    } finally q.stop()
    val syms = spark.table("bpe_plain").collect().map(_.getString(0))
    // "abab" -> ab ab, "ab" -> ab under the single (a,b) merge
    assert(syms.sorted.toSeq == Seq("ab", "ab", "ab"))
  }
}
