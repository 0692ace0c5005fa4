package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.plans.{HashedTrigrams32, SortedIntersectCount}

/** Merge-scan intersection count vs `size(array_intersect(..))` on
  * sorted distinct inputs — the d4 verify-stage swap. */
class SortedIntersectCountSpec extends AnyFunSuite with SparkSessionFixture {

  test("parity with size(array_intersect) on real sorted trigram sets") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"),
        array_sort(HashedTrigrams32(col("text"))).as("tgh"))
    val pairs = docs.as("l").join(docs.as("r"),
        col("l.doc_id") < col("r.doc_id"))
      .select(col("l.tgh").as("a"), col("r.tgh").as("b"))
    val bad = pairs.select(
        SortedIntersectCount.of(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("slow"))
      .filter(not(col("fast") <=> col("slow")))
      .count()
    assert(bad == 0L)
  }

  test("edge cases: empty, disjoint, identical, subset, null input") {
    import spark.implicits._
    def s(xs: Long*): Seq[Long] = xs.sorted
    val df = Seq(
        (1, s(), s(1L, 2L)),
        (2, s(1L, 3L, 5L), s(2L, 4L, 6L)),
        (3, s(1L, 2L, 3L), s(1L, 2L, 3L)),
        (4, s(1L, 2L, 3L, 9L), s(2L, 9L)),
        (5, s(-5L, 0L, 7L), s(-5L, 7L, 8L)))
      .toDF("id", "a", "b")
    val rows = df.select(col("id"),
        SortedIntersectCount.of(col("a"), col("b")).as("fast"),
        size(array_intersect(col("a"), col("b"))).as("slow"))
      .orderBy("id").collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id=${r.getInt(0)}"))
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 0, 3, 2, 2))
    // null input array → null (parity with the built-in chain)
    val nr = Seq((null: Seq[Long], s(1L))).toDF("a", "b")
      .select(SortedIntersectCount.of(col("a"), col("b"))).head()
    assert(nr.isNullAt(0))
  }
}
