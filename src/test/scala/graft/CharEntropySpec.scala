package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.operators.CorpusOps

/** [[CorpusOps.charEntropy]] — the r17 in-row rewrite (zero
  * exchanges) must stay VALUE-identical to the retired explode →
  * (doc, ch) census → doc-window → doc-agg spelling it replaced
  * (t11_char_entropy's oracle shape): identical n_scored_chars and
  * BIT-identical char_entropy doubles, because both sides quantize
  * the identical `c · round(ln(c/n), 6)::DECIMAL(18,6)` term per
  * distinct character and decimal addition is exact either way.
  * Adversarial shapes: single-char docs, one-run docs, runs that
  * sort non-adjacent in text order, multi-byte code points that
  * share a leading UTF-8 byte (the collision a first-byte `ascii`
  * bucket proxy would have introduced), and empty text (excluded by
  * both spellings). */
class CharEntropySpec extends AnyFunSuite with SparkSessionFixture {

  /** The retired census spelling, verbatim from r16 TextQueries. */
  private def censusEntropy(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("doc_id"))
    docs
      .filter(length(col("text")) >= 1)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), length(col("text")))).as("i"))
      .select(col("doc_id"), expr("substring(text, i, 1)").as("ch"))
      .groupBy(col("doc_id"), col("ch")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(w))
      .select(col("doc_id"), col("n"),
        (col("c") * round(log(col("c").cast("double") / col("n")), 6)
          .cast("decimal(18,6)")).as("term"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("term")).as("st"))
      .select(col("doc_id"), col("n").as("n_scored_chars"),
        (lit(0.0) - (col("st").cast("double") / col("n"))).as("char_entropy"))
  }

  private def rows(df: DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)

  test("in-row spelling is value-identical to the census spelling") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a"),                       // single char: entropy 0
      (2L, "aaaaaaa"),                 // one run
      (3L, "abcabcabc"),               // runs non-adjacent in text
      (4L, "the quick brown fox jumps over the lazy dog"),
      (5L, "ééèèééèè"),                // multi-byte, shared lead byte
      (6L, "日本語テキスト日本語"),      // CJK multi-byte
      (7L, ""),                        // excluded by both spellings
      (8L, "  \t\n mixed WS \n"),      // whitespace chars count
      (9L, "0123456789" * 50)          // longer uniform-ish doc
    ).toDF("doc_id", "text")
    val expected = rows(censusEntropy(docs))
    val actual = rows(CorpusOps.charEntropy(docs, "doc_id", "text"))
    assert(actual === expected)
    assert(!actual.exists(_._1 == 7L)) // empty text excluded
  }

  test("wide high-cardinality doc is exact (the explode worst case)") {
    import spark.implicits._
    // 2k distinct code points, each 1-3 times, shuffled determin-
    // istically — exercises deep fold recursion and decimal sums
    val sb = new StringBuilder
    var seed = 12345L
    (0 until 2000).foreach { i =>
      val ch = (0x100 + i).toChar
      seed = seed * 6364136223846793005L + 1442695040888963407L
      val reps = 1 + (math.abs(seed) % 3).toInt
      (0 until reps).foreach(_ => sb.append(ch))
    }
    val docs = Seq((1L, sb.toString)).toDF("doc_id", "text")
    assert(rows(CorpusOps.charEntropy(docs, "doc_id", "text")) ===
      rows(censusEntropy(docs)))
  }

  test("randomized corpora match bit-for-bit (round/cast replication)") {
    import spark.implicits._
    // 300 docs over random small alphabets — many distinct (c, n)
    // pairs exercise the Round-on-double + double→DECIMAL(18,6)
    // replication inside CharEntropyHelper against the engine's own
    // census arithmetic
    val rnd = new scala.util.Random(421701L)
    val alphabets = Seq("ab", "abcde", "aàbéc日", " eto.ainshr", "01")
    val docs = (1L to 300L).map { id =>
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val len = 1 + rnd.nextInt(400)
      val sb = new StringBuilder
      (0 until len).foreach { _ =>
        val cp = alpha.codePointAt(
          alpha.offsetByCodePoints(0,
            rnd.nextInt(alpha.codePointCount(0, alpha.length))))
        sb.appendAll(Character.toChars(cp))
      }
      (id, sb.toString)
    }.toDF("doc_id", "text")
    assert(rows(CorpusOps.charEntropy(docs, "doc_id", "text")) ===
      rows(censusEntropy(docs)))
  }
}
