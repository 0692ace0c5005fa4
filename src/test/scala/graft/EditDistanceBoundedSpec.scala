package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.EditDistanceBounded

/** Myers bit-parallel thresholded edit distance vs the built-in
  * banded-DP `levenshtein(a, b, k)` — value-identical on real corpus
  * pairs, adversarial randomized pairs (crossing the 64/128-char block
  * boundaries), and edge cases. The d6 oracle SQL is written against
  * the built-in spelling, so parity here is what keeps d6 matching. */
class EditDistanceBoundedSpec extends AnyFunSuite with SparkSessionFixture {

  private def check(df: org.apache.spark.sql.DataFrame, k: Int): Unit = {
    val bad = df.select(
        col("a"), col("b"),
        EditDistanceBounded.of(col("a"), col("b"), k).as("fast"),
        levenshtein(col("a"), col("b"), k).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .collect()
    assert(bad.isEmpty, s"k=$k: " + bad.take(3).mkString("; "))
  }

  test("parity with built-in levenshtein(k) on real document pairs") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    // all consecutive-id pairs: realistic lengths (up to ~600 chars)
    val pairs = docs.as("l").join(docs.as("r"),
        col("l.doc_id") + 1 === col("r.doc_id"))
      .select(col("l.text").as("a"), col("r.text").as("b"))
    Seq(0, 5, 100, 1000).foreach(check(pairs, _))
  }

  test("parity on randomized pairs across block boundaries") {
    import spark.implicits._
    // deterministic pseudo-random strings over a 4-letter alphabet:
    // high collision rate stresses the bit-vector carry logic; lengths
    // straddle 0/1/63/64/65/127/128/129 (the 64-bit block edges)
    val rng = new scala.util.Random(42)
    val lens = Seq(0, 1, 2, 63, 64, 65, 127, 128, 129, 300)
    def mk(len: Int): String =
      (0 until len).map(_ => "abcd"(rng.nextInt(4))).mkString
    val pairs = (for {
      la <- lens; lb <- lens
      _ <- 0 until 3
    } yield (mk(la), mk(lb))).toDF("a", "b")
    Seq(0, 1, 3, 64, 200, 500).foreach(check(pairs, _))
    // near-identical pairs: small true distances must be exact
    val base = mk(200)
    val edits = (0 until 50).map { i =>
      val pos = rng.nextInt(200)
      val mutated = base.updated(pos, "abcd"(rng.nextInt(4)))
      (base, mutated.take(rng.nextInt(3) match {
        case 0 => 200
        case 1 => 199 // deletion at the tail
        case _ => 200
      }))
    }.toDF("a", "b")
    Seq(0, 1, 2, 10).foreach(check(edits, _))
  }

  test("parity on unicode (multi-byte code points) and nulls") {
    import spark.implicits._
    val pairs = Seq(
      ("héllo wörld", "hello world"),
      ("日本語のテキスト", "日本語のテクスト"),
      ("émoji 😀 text", "emoji 😀 test"),
      ("", "abc"), ("abc", ""), ("", ""),
      ("same", "same"),
      (null, "x"), ("x", null), (null, null))
      .toDF("a", "b")
    Seq(0, 2, 10).foreach(check(pairs, _))
  }

  test("sql registration: edit_distance_bounded matches the Column API") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("kitten", "sitting")).toDF("a", "b").createOrReplaceTempView("edb_t")
    val r = spark.sql(
      "SELECT edit_distance_bounded(a, b, 5) AS d FROM edb_t").head()
    assert(r.getInt(0) == 3)
  }
}
