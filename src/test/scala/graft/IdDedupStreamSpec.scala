package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps
import graft.streaming.StreamPipeline

/** Streaming id-dedup twin of batch d17
  * (StreamPipeline.idDedupWithinWatermark): exact-dup admission keyed
  * on the encoded token-id sequence over the batch-frozen dictionary.
  * Proven split-invariant against the batch d17 grouping on the same
  * corpus, with bounded (per-distinct-sequence, watermark-evicted)
  * state. */
class IdDedupStreamSpec extends AnyFunSuite with SparkSessionFixture {

  private val terms = Seq("the", "cat", "sat", "on", "mat")

  // doc 2 is doc 1's case/punct variant (identical encode — the class
  // d1's raw-text equality misses); docs 5/6 are token-free and must
  // collapse together; doc 7 repeats doc 3 verbatim
  private val texts = Seq(
    "the cat sat",        // 1: keeper of {1,2}
    "The Cat SAT!!!",     // 2: encodes == 1
    "sat on the mat",     // 3: keeper of {3,7}
    "a dog appeared",     // 4: all-OOV (0,0,0) — its own group
    "12345",              // 5: zero tokens -> empty ids
    "...",                // 6: zero tokens -> collapses with 5
    "sat on the mat")     // 7: encodes == 3

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 1000L)

  private def streamSurvivors(batches: Seq[Seq[(String, Timestamp)]],
                              name: String): (Seq[String], Long) = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(String, Timestamp)]
    val out = StreamPipeline.idDedupWithinWatermark(
      input.toDF().toDF("text", "ts"), "text", "ts", terms, "10 seconds")
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    val stateRows =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      } finally q.stop()
    (spark.table(name).select("text").as[String].collect().toSeq, stateRows)
  }

  test("survivors match batch d17 grouping, split-invariant, bounded state") {
    import spark.implicits._
    // batch d17 grouping on the same corpus: distinct encoded
    // sequences with their first (min-index) representative
    val batchGroups = CorpusOps.tokenizeToIds(
        texts.zipWithIndex.toDF("text", "i"),
        graft.functions.TextOps.cleanTokens(col("text")), terms, "ids")
      .groupBy(col("ids"))
      .agg(min(col("i")).as("keeper"), count(lit(1)).as("n"))
      .select(col("keeper"), col("n")).as[(Int, Long)].collect().toMap
    assert(batchGroups.keySet == Set(0, 2, 3, 4)) // 1-dups-0, 6-dups-2, 5-dups-4
    assert(batchGroups(0) == 2 && batchGroups(2) == 2 && batchGroups(4) == 2)

    val docs = texts.zipWithIndex.map { case (t, i) => (t, ts(i)) }
    // one doc per micro-batch: arrival order is fully determined, so
    // the survivor of each group must be its FIRST (= batch keeper)
    val (perDoc, statePerDoc) = streamSurvivors(docs.map(Seq(_)), "idd_perdoc")
    assert(perDoc.sorted == batchGroups.keySet.toSeq.map(texts).sorted,
      s"survivors $perDoc")
    // state: one row per distinct sequence inside the horizon
    assert(statePerDoc == batchGroups.size.toLong)

    // split-invariance: any batching yields the same survivor KEY set
    // and count (same-batch duplicate groups may elect a different
    // representative; the admitted id-sequences are invariant)
    def keysOf(survivors: Seq[String]): Set[Seq[Int]] =
      CorpusOps.tokenizeToIds(survivors.toDF("text"),
          graft.functions.TextOps.cleanTokens(col("text")), terms, "ids")
        .select("ids").as[Seq[Int]].collect().toSet
    val (oneShot, _) = streamSurvivors(Seq(docs), "idd_oneshot")
    val (halves, _) = streamSurvivors(
      Seq(docs.take(4), docs.drop(4)), "idd_halves")
    assert(oneShot.size == batchGroups.size && halves.size == batchGroups.size)
    assert(keysOf(oneShot) == keysOf(perDoc) && keysOf(halves) == keysOf(perDoc))
  }

  test("null text and zero-token text stay distinct groups (batch d17 parity)") {
    // batch groupBy(token_ids) keeps null (null text) and [] (tokens
    // all stripped) as TWO groups; the stream key must too — a bare
    // concat_ws would conflate them (review finding, round 8)
    val docs = Seq((null: String, ts(0)), ("12345", ts(1)),
      (null: String, ts(2)), ("...", ts(3)))
    val (survivors, state) = streamSurvivors(docs.map(Seq(_)), "idd_null")
    assert(survivors.size == 2, s"survivors $survivors")
    assert(state == 2L)
    assert(survivors.contains(null))
    assert(survivors.exists(s => s == "12345" || s == "..."))
  }
}
