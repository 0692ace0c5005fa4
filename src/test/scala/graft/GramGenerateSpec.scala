package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.plans.{GramHashGenerate, GramHashSweepGenerate}

/** Byte-exact value parity of the streamed gram-hash generators
  * against the built-in spellings they replaced inside the
  * ExactSubstr span family (d27/d31/d32/d33 gram tables): the
  * generators must emit EXACTLY `unhex(md5(concat_ws(' ',
  * slice(toks, i+1, W))))` at every position, or every span-family
  * hash would silently move. Also pins the bounded-allocation
  * contract on a single very long document — the reason the
  * generators exist. */
class GramGenerateSpec extends AnyFunSuite with SparkSessionFixture {

  private def builtin(df: DataFrame, w: Int): Seq[(Long, Int, Seq[Byte])] =
    df.filter(size(col("toks")) >= w)
      .select(col("id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - w),
          i => unhex(md5(concat_ws(" ", slice(col("toks"), i + 1, lit(w)))))))
          .as(Seq("pos", "gh")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))

  private def generated(df: DataFrame, w: Int): Seq[(Long, Int, Seq[Byte])] =
    df.select(col("id"), GramHashGenerate.of(col("toks"), w).as(Seq("pos", "gh")))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq))
      .toSeq.sortBy(t => (t._1, t._2))

  test("single-window parity vs the built-in spelling on corpus tokens") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), TextOps.cleanTokens(col("text")).as("toks"))
    for (w <- Seq(2, 10, 20))
      assert(generated(docs, w) == builtin(docs, w), s"w=$w")
  }

  test("edge cases: short, empty, null array, null tokens skipped") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq("a", "b", "c")),
      (2L, Seq("only")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]),
      // null token inside a window: concat_ws skips it, so must we
      (5L, Seq("x", null, "y"))).toDF("id", "toks")
    for (w <- Seq(1, 2, 3))
      assert(generated(df, w) == builtin(df, w), s"w=$w")
    assert(generated(df, 4) == Seq.empty)
  }

  test("sweep generator equals the union of single-window runs") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815)
    val docs = (0 until 25).map { i =>
      (i.toLong, (0 until rnd.nextInt(40)).map(_ => s"w${rnd.nextInt(5)}"))
    }.toDF("id", "toks")
    val ws = Seq(3, 7, 12)
    val got = docs
      .select(col("id"),
        GramHashSweepGenerate.of(col("toks"), ws).as(Seq("w", "pos", "gh")))
      .collect()
      .map(r => (r.getInt(1), r.getLong(0), r.getInt(2),
        r.getAs[Array[Byte]](3).toSeq))
      .toSeq.sortBy(t => (t._1, t._2, t._3))
    val want = ws.flatMap { w =>
      generated(docs, w).map { case (id, p, gh) => (w, id, p, gh) }
    }.sortBy(t => (t._1, t._2, t._3))
    assert(got == want)
  }

  test("one very long document streams without a per-doc gram buffer") {
    // 2·10⁵ tokens in ONE row: the built-in spelling would buffer the
    // whole gram array (and the d33 sweep Σ_W of them) inside a single
    // row value before exploding; the generator emits row-by-row. The
    // correctness pin is the aggregate over all emitted rows — count
    // and distinct-hash count — computed WITHOUT collecting the grams.
    import spark.implicits._
    val n = 200000
    val doc = Seq((1L, (0 until n).map(i => s"t${i % 1000}")))
      .toDF("id", "toks")
    val agg = doc
      .select(GramHashGenerate.of(col("toks"), 20).as(Seq("pos", "gh")))
      .agg(count(lit(1)), count_distinct(col("gh")))
      .head()
    assert(agg.getLong(0) === (n - 19).toLong)
    // period-1000 token stream: every 20-gram repeats with period 1000
    assert(agg.getLong(1) === 1000L)
    val sweep = doc
      .select(GramHashSweepGenerate.of(col("toks"), Seq(10, 20, 40))
        .as(Seq("w", "pos", "gh")))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sweep === Map(10 -> (n - 9).toLong, 20 -> (n - 19).toLong,
      40 -> (n - 39).toLong))
  }
}
