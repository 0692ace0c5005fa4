package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.TopNgramCount]] — the r17 in-row bigram-max must
  * stay VALUE-identical to t9's retired explode → (doc, bigram)
  * census → per-doc max/sum → join-back spelling, including the NULL
  * for docs with fewer than n tokens (no gram rows → left-join NULL)
  * and the exact double division (maxc / (len − 1) ≡ maxc / sumc,
  * since every bigram row counts once). Adversarial shapes: empty
  * and single-token docs, all-identical tokens, ties, repeated
  * bigrams that sort non-adjacent, multi-byte tokens, and tokens
  * containing no separator ambiguity (space-joined identity). */
class TopBigramSpec extends AnyFunSuite with SparkSessionFixture {

  /** t9's retired census spelling, verbatim. */
  private def censusTopBigram(d: DataFrame): DataFrame = {
    val bi = d.select(col("doc_id"),
        graft.plans.NgramGenerate.of(col("toks"), 2).as("bg"))
      .groupBy(col("doc_id"), col("bg")).agg(count(lit(1)).as("cnt"))
      .groupBy(col("doc_id"))
      .agg(max(col("cnt")).as("maxc"), sum(col("cnt")).as("sumc"))
    d.select(col("doc_id"))
      .join(bi, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("maxc").cast("double") / col("sumc")).as("top_bigram_frac"))
  }

  private def inRow(d: DataFrame): DataFrame =
    d.select(col("doc_id"),
      (graft.plans.TopNgramCount.of(col("toks"), 2).cast("double") /
        (size(col("toks")) - lit(1))).as("top_bigram_frac"))

  private def rows(df: DataFrame): Seq[(Long, Option[Double])] =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSeq.sortBy(_._1)

  test("in-row bigram share equals the census spelling") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq.empty[String]),
      (2L, Seq("solo")),
      (3L, Seq("a", "a", "a", "a")),          // one bigram repeated
      (4L, Seq("a", "b", "a", "b", "a")),     // tie "a b" vs "b a"
      (5L, Seq("x", "y")),                    // single bigram
      (6L, Seq("é", "日", "é", "日")),         // multi-byte tokens
      (7L, Seq("the", "cat", "sat", "on", "the", "cat", "sat")),
      (8L, (1 to 200).map(i => s"w${i % 13}")) // long cyclic doc
    ).toDF("doc_id", "toks")
    assert(rows(inRow(docs)) === rows(censusTopBigram(docs)))
    val nulls = rows(inRow(docs)).filter(_._2.isEmpty).map(_._1)
    assert(nulls === Seq(1L, 2L)) // < 2 tokens => NULL, as before
  }

  test("NULL array elements render concat_ws-style, matching " +
      "NgramGenerate (r17 advice: unreachable from t9's cleanTokens, " +
      "but the two gram identities must agree by definition)") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq[Option[String]](Some("a"), None, Some("a"), None)),
      (2L, Seq[Option[String]](None, None, None)),
      (3L, Seq[Option[String]](Some("x"), Some("null"), None, Some("x")))
    ).toDF("doc_id", "toks")
    assert(rows(inRow(docs)) === rows(censusTopBigram(docs)))
  }
}
