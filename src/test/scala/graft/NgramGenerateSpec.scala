package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.NgramGenerate

/** Value parity of the streamed n-gram generator against the built-in
  * spelling `explode(transform(sequence(..), i -> concat_ws(' ',
  * slice(toks, i, n))))` it replaces on the d8/d9/t9 paths. */
class NgramGenerateSpec extends AnyFunSuite with SparkSessionFixture {

  private def builtinSpelling(df: DataFrame, n: Int): Seq[(Long, String)] = {
    df.select(col("id"),
        explode(when(size(col("toks")) >= n,
          transform(sequence(lit(1), size(col("toks")) - (n - 1)),
            i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
          .otherwise(array().cast("array<string>"))).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
  }

  private def generated(df: DataFrame, n: Int): Seq[(Long, String)] =
    df.select(col("id"), NgramGenerate.of(col("toks"), n).as("g"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted

  test("matches the built-in spelling on real corpus tokens, n=2,5,8") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), TextOps.cleanTokens(col("text")).as("toks"))
    for (n <- Seq(2, 5, 8))
      assert(generated(docs, n) == builtinSpelling(docs, n), s"n=$n")
  }

  test("edge cases: short arrays, empty, null array, single token") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("only")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]),
      (5L, Seq("x", "y"))).toDF("id", "toks")
    assert(generated(df, 2) == Seq((1L, "a b"), (1L, "b c"), (5L, "x y")))
    assert(generated(df, 4) == Seq.empty)
    // n=1 degenerates to explode(toks)
    assert(generated(df, 1) ==
      Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "only"), (5L, "x"), (5L, "y")))
  }

  test("SQL registration plans as a generator") {
    import spark.implicits._
    GraftExtensions.register(spark)
    Seq((1L, Seq("a", "b", "c"))).toDF("id", "toks")
      .createOrReplaceTempView("ngram_gen_in")
    val got = spark.sql(
      "SELECT id, ngram FROM ngram_gen_in LATERAL VIEW ngram_generate(toks, 2) AS ngram")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(got == Seq((1L, "a b"), (1L, "b c")))
  }
}
