package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

/** [[CorpusOps.logisticFitWeightsNested]] — the r17 one-pass-per-
  * iteration multi-fold fit must produce BIT-IDENTICAL weights and
  * fold counts to fitting each `subsetCol < T` fold separately with
  * [[CorpusOps.logisticFitWeights]] (m16's retired spelling): the
  * per-row DECIMAL(28,12) gradient contributions are unchanged and
  * conditional decimal sums are exact and order-free. Exercised on a
  * deterministic pseudo-random pool with uneven folds, several
  * iterations, and a fold boundary with no rows between thresholds. */
class NestedFitSpec extends AnyFunSuite with SparkSessionFixture {

  private val featureCols = Seq("xb", "x1", "x2", "x3")

  test("nested fit weights and counts equal the sequential per-fold fit") {
    import spark.implicits._
    var seed = 99L
    def next(): Double = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 11).toDouble / (1L << 53).toDouble) * 2.0 - 1.0
    }
    val pool = (1 to 500).map { i =>
      val x1 = next(); val x2 = next(); val x3 = next()
      val y = if (x1 + 0.5 * x2 - 0.25 * x3 + 0.1 * next() > 0) 1.0 else 0.0
      // uneven sub spread incl. a gap: nothing lands in [60, 80)
      val sub = { val s = math.abs(seed % 100).toInt; if (s >= 60 && s < 80) s - 60 else s }
      (y, 1.0, x1, x2, x3, sub)
    }.toDF("y", "xb", "x1", "x2", "x3", "sub")
      .persist()
    try {
      val thresholds = Seq(25, 50, 80, 100) // 80 == the gap edge
      val nested = CorpusOps.logisticFitWeightsNested(
        pool, "y", featureCols, "sub", thresholds, iters = 3, lr = 0.5)
      thresholds.zip(nested).foreach { case (t, (tOut, n, w)) =>
        assert(tOut === t)
        val fold = pool.filter(col("sub") < t)
        assert(n === fold.count())
        val seqW = CorpusOps.logisticFitWeights(
          fold, "y", featureCols, iters = 3, lr = 0.5)
        assert(w.toSeq === seqW.toSeq, s"threshold $t")
      }
    } finally { pool.unpersist(blocking = false); () }
  }

  test("empty fold fails loudly, like the sequential spelling") {
    import spark.implicits._
    val pool = Seq((1.0, 1.0, 0.1, 0.2, 0.3, 50))
      .toDF("y", "xb", "x1", "x2", "x3", "sub")
    val e = intercept[IllegalArgumentException] {
      CorpusOps.logisticFitWeightsNested(
        pool, "y", featureCols, "sub", Seq(10, 100), iters = 1, lr = 0.5)
    }
    assert(e.getMessage.contains("empty fold"))
  }
}
