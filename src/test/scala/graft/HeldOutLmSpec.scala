package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.CorpusOps

/** Held-out bigram-LM banding (CorpusOps.heldOutLmBands): backoff
  * penalty for unseen bigrams, tercile cutoff semantics, and
  * determinism across runs. */
class HeldOutLmSpec extends AnyFunSuite with SparkSessionFixture {

  import spark.implicits._

  // train rows repeat a fluent pattern; the held-out row shares NO
  // bigram with the train mass, so every bigram backs off to the
  // smoothing floor
  private def corpus = Seq(
    (1L, "en", "train", "the cat sat on the mat"),
    (2L, "en", "train", "the cat sat on the rug"),
    (3L, "en", "train", "the dog sat on the mat"),
    (4L, "en", "test",  "zx qv plorp wumble frib"),
    (5L, "en", "test",  "the cat sat on the mat"),
    (6L, "en", "test",  "xy zz"),
  ).toDF("doc_id", "lang", "split", "text")

  private def run = CorpusOps.heldOutLmBands(
    corpus, "doc_id", "lang", TextOps.cleanTokens(col("text")),
    col("split") === "train")

  test("unseen-bigram doc scores strictly worse than an in-domain doc") {
    val m = run.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Long]("nlp_mu")).toMap
    // doc 4 (all bigrams unseen) must carry a larger mean neg-logp
    // than doc 5 (every bigram seen in training)
    assert(m(4L) > m(5L))
    // and doc 5, identical to train doc 1, scores identically to it
    assert(m(5L) === m(1L))
  }

  test("bands partition docs per language and order by score") {
    val rows = run.collect()
    assert(rows.length === 6) // all docs have >= 2 tokens
    val byBand = rows.groupBy(_.getAs[Int]("band"))
    assert(byBand.keySet.subsetOf(Set(1, 2, 3)))
    // band ordering is consistent with nlp_mu ordering: every band-1
    // doc scores <= every band-3 doc
    for {
      b1 <- byBand.getOrElse(1, Array.empty)
      b3 <- byBand.getOrElse(3, Array.empty)
    } assert(b1.getAs[Long]("nlp_mu") <= b3.getAs[Long]("nlp_mu"))
    // the unseen-bigram doc lands in the worst band
    assert(rows.find(_.getAs[Long]("doc_id") == 4L).get
      .getAs[Int]("band") === 3)
  }

  test("deterministic across repeated runs") {
    val a = run.orderBy("doc_id").collect().toSeq
    val b = run.orderBy("doc_id").collect().toSeq
    assert(a === b)
  }
}
