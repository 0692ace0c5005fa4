package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Tokenizer parity with the reference cleaning UDF
  * (`consumer_local.py:46-48`):
  * `re.sub(r"[^A-Za-z\n ]|(http\S+)|(www.\S+)", "", s.lower().strip()).split()`
  * including the F5/F6 edge cases from SURVEY.md §2g. */
class TextOpsSpec extends AnyFunSuite with SparkSessionFixture {

  /** Reference semantics re-implemented in plain Scala (the oracle). */
  private def pyClean(s: String): Seq[String] = {
    val lowered = s.toLowerCase.trim
    val re = "[^A-Za-z\\n ]|(http\\S+)|(www.\\S+)".r
    re.replaceAllIn(lowered, "").split("\\s+").filter(_.nonEmpty).toSeq
  }

  private def sparkClean(ss: Seq[String]): Seq[Seq[String]] = {
    import spark.implicits._
    ss.toDF("text")
      .select(TextOps.cleanTokens(col("text")).as("toks"))
      .collect().map(_.getSeq[String](0)).toSeq
  }

  private val cases = Seq(
    "Hello World, check https://t.co/xyz #AI!",
    "  Visit www.example.com NOW!!  ",
    "wwwX rest of text",               // unescaped dot in www.\S+
    "http alone and httpfoo",          // http\S+ needs \S+ nonempty
    "line1\nline2\nline3",             // \n kept by char class, then split
    "UPPER lower MiXeD 123 456",
    "",
    "   ",
    ",,,!!!",
    "a,b.c;d",
    "émojis 😀 and ünïcödé",
    "tab\tseparated\ttokens",
    "{\"message\": \"json envelope text\"}",
  )

  test("clean+tokenize matches Python reference semantics on edge cases") {
    val got = sparkClean(cases)
    cases.zip(got).foreach { case (in, out) =>
      assert(out == pyClean(in), s"input: <$in>")
    }
  }

  test("property: no empty tokens, only [a-z\\n] chars survive") {
    val gen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(' ', '\n', '\t', ',', '.', '!', 'é'),
      Gen.alphaLowerChar)).map(_.mkString)
    (1 to 200).foreach { _ =>
      gen.sample.foreach { s =>
        val toks = pyClean(s)
        assert(toks.forall(_.nonEmpty))
        assert(toks.forall(_.forall(c => (c >= 'a' && c <= 'z') || c == '\n')))
      }
    }
  }

  test("property: spark impl == scala oracle on random strings") {
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaChar, Gen.oneOf(' ', '\n', ',', '!', '3', 'h', 't', 'p', 'w', '.', ':', '/')))
      .map(_.mkString)
    val samples = Gen.listOfN(60, gen).sample.get
    val got = sparkClean(samples)
    samples.zip(got).foreach { case (in, out) =>
      assert(out == pyClean(in), s"input: <$in>")
    }
  }

  test("stop-word removal matches the model's 181-word list, case-insensitive") {
    import spark.implicits._
    val toks = Seq(Seq("i", "am", "THE", "best", "day", "ourselves", "spark"))
    val got = toks.toDF("toks")
      .select(TextOps.removeStopWords(col("toks")).as("w"))
      .head().getSeq[String](0)
    assert(got == Seq("best", "day", "spark"))
    assert(TextOps.englishStopWords.length == 181)
  }

  test("comma scrub") {
    import spark.implicits._
    val got = Seq("a,b,,c").toDF("t")
      .select(TextOps.scrubCommas(col("t"))).head().getString(0)
    assert(got == "abc")
  }
}
