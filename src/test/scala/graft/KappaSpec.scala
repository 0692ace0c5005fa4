package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** [[CorpusOps.cohensKappaFromMatrix]] — hand-computed matrices pin
  * the chance correction, the negative-kappa (worse-than-chance)
  * path, perfect agreement, and the degenerate pe = 1 convention. */
class KappaSpec extends AnyFunSuite with SparkSessionFixture {

  private def kappa(cells: Seq[(String, String, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = CorpusOps.cohensKappaFromMatrix(
      cells.toDF("act", "prd", "n"), "act", "prd", "n").collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("skewed mix: accuracy 2/3 corrects to kappa 1/3") {
    // rows en=3 de=3, cols en=5 de=1: po=4/6, pe=(15+3)/36=1/2
    val k = kappa(Seq(("en", "en", 3L), ("de", "en", 2L), ("de", "de", 1L)))
    assert(k === ((6L, 4L, 333333L)))
  }

  test("systematic disagreement: kappa -1") {
    val k = kappa(Seq(("en", "de", 1L), ("de", "en", 1L)))
    assert(k === ((2L, 0L, -1000000L)))
  }

  test("perfect agreement: kappa 1") {
    val k = kappa(Seq(("en", "en", 7L), ("de", "de", 3L)))
    assert(k === ((10L, 10L, 1000000L)))
  }

  test("degenerate one-cell matrix (pe = 1) reports 0 by convention") {
    val k = kappa(Seq(("en", "en", 5L)))
    assert(k === ((5L, 5L, 0L)))
  }

  test("a predicted class absent from actuals still enters pe") {
    // pred 'und' never occurs as actual: its column joins no row,
    // contributing 0 to rc — chance agreement on an impossible
    // class is zero, which is exactly what the inner join encodes
    val k = kappa(Seq(("en", "en", 2L), ("en", "und", 2L)))
    // n=4 diag=2; rows en=4; cols en=2, und=2; rc=8
    // kappa = (4*2-8)*1e6 / (16-8) = 0
    assert(k === ((4L, 2L, 0L)))
  }
}
