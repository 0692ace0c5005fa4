package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** [[CorpusOps.boilerplateLines]] — the cross-document frequent-line
  * census. The synthetic corpus is single-line (the census degenerates
  * to whole-doc ranks there, hash-checked by the driver), so the
  * multi-line semantics — distinct-doc vs occurrence counting, the
  * in-doc duplicate, trim/empty handling, the rank order, the limit —
  * are pinned here. */
class BoilerplateSpec extends AnyFunSuite with SparkSessionFixture {

  private val docs = Seq(
    (1L, "Cookie notice\nreal content one\nFooter Inc"),
    (2L, "Cookie notice\n  real content two  \nFooter Inc"),
    (3L, "Cookie notice\nreal content three\n\n   "),
    (4L, "Cookie notice\nCookie notice\nunique line"))

  private def run(limit: Int): Seq[(String, Long, Long, Long)] = {
    import spark.implicits._
    CorpusOps.boilerplateLines(docs.toDF("doc_id", "text"),
        "doc_id", "text", limit)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
  }

  test("rank: distinct docs first, then occurrences, then line") {
    val rows = run(50)
    // "Cookie notice": 4 docs, 5 occurrences (doc 4 carries it twice)
    assert(rows.head === (("Cookie notice", 4L, 5L, 13L)))
    assert(rows(1) === (("Footer Inc", 2L, 2L, 10L)))
    // singles sort lexicographically; trimming unified doc 2's line
    assert(rows.drop(2).map(_._1) === Seq("real content one",
      "real content three", "real content two", "unique line"))
    assert(rows.forall(r => r._4 === r._1.length.toLong))
  }

  test("empty/whitespace lines never enter the census") {
    assert(run(50).map(_._1).forall(_.nonEmpty))
    assert(run(50).map(_._2).sum === 4L + 2L + 1L + 1L + 1L + 1L)
  }

  test("limit is a rank cutoff") {
    assert(run(3) === run(50).take(3))
  }

  private def strip(minDocs: Int): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    CorpusOps.stripBoilerplateStats(docs.toDF("doc_id", "text"),
        "doc_id", "text", minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("strip: >= 2-doc lines drop with every occurrence counted") {
    val m = strip(2)
    // docs 1-2: 3 lines, keep the content line, lose 13 + 10 chars
    assert(m(1L) === ((3L, 1L, 23L)))
    assert(m(2L) === ((3L, 1L, 23L)))
    // doc 3: no Footer; doc 4: BOTH in-doc copies of the shared line
    // drop (boilerplate is a line property, not a per-doc one)
    assert(m(3L) === ((2L, 1L, 13L)))
    assert(m(4L) === ((3L, 1L, 26L)))
  }

  test("strip threshold: raising minDocs spares rarer lines") {
    val m = strip(3) // only "Cookie notice" (4 docs) qualifies
    assert(m(1L) === ((3L, 2L, 13L)))
    assert(m(2L) === ((3L, 2L, 13L)))
    val all = strip(5) // nothing qualifies
    assert(all.values.forall(_._3 === 0L))
  }
}
