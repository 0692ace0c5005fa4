package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.TextOps
import graft.operators.CorpusOps

/** [[CorpusOps.filterFunnel]] — sequential attrition through Gopher →
  * +repetition → +C4. The real corpus fails the rule stacks outright
  * (the driver oracle proves hash parity on that), so the three paths
  * that need crafting are pinned here: a document that SURVIVES the
  * whole funnel, a document each family's own base filter excludes
  * (empty text — the left-join coalesce must count it as failing,
  * not drop or null it), and a partial failure (fails Gopher, passes
  * repetition). */
class FilterFunnelSpec extends AnyFunSuite with SparkSessionFixture {

  // 50 distinct 4-letter alpha words + stop words + two more lines:
  // 69 words, mean length ~4.1, 3 terminal periods, 3 required stop
  // words, no duplicate lines/n-grams -> passes all three stacks
  private val goodText: String = {
    val ws = (0 until 50).map(i =>
      s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}ov")
    ws.mkString(" ") + " the and more.\n" +
      "this second line carries five proper words.\n" +
      "a third line with yes more said done fine."
  }

  private val docs = Seq(
    (1L, goodText, "s1"),
    (2L, "", "s1"), // excluded by every family's base filter
    (3L, "short words here.", "s2")) // fails Gopher, passes rep

  private def run(): Map[String, Seq[Long]] = {
    import spark.implicits._
    CorpusOps.filterFunnel(docs.toDF("doc_id", "text", "source"),
        "doc_id", "text", TextOps.cleanTokens(col("text")), "source")
      .collect()
      .map(r => r.getString(0) -> Seq(r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toMap
  }

  test("a crafted document survives the whole funnel") {
    val m = run()
    // s1: good doc kept; empty doc counted (coalesced to fail), so
    // kept_mu is 1-of-2
    assert(m("s1") === Seq(2L, 1L, 1L, 1L, 500000L))
  }

  test("base-filter dropouts count as failures, not nulls") {
    val m = run()
    // the empty doc appears in n_docs with zero passes — if the left
    // joins dropped or nulled it, s1 would read 1 doc or crash
    assert(m("s1").head === 2L)
    assert(m.values.flatten.forall(_ >= 0L))
  }

  test("partial failure: Gopher gate zeroes the downstream stages") {
    val m = run()
    // 3 words: repetition would pass or fail independently, but the
    // funnel is sequential — n_gopher = 0 forces every later count 0
    assert(m("s2") === Seq(1L, 0L, 0L, 0L, 0L))
  }
}
