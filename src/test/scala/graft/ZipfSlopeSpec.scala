package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.CorpusOps

/** [[CorpusOps.zipfSlope]] — OLS Zipf slope over the ranked term
  * census. Pins (1) bit-parity of the integer pipeline (micro-nat
  * quantization, exact sums, DECIMAL(38,0) combination) against an
  * independent scalar reference, (2) the diagnostic's point: a
  * freq ∝ 1/rank corpus lands at slope ≈ -1 (neg_slope_mu ≈ 1e6),
  * a uniform corpus at 0, and (3) tie-order invariance (tied
  * frequencies share y, so the fit can't depend on how ties rank). */
class ZipfSlopeSpec extends AnyFunSuite with SparkSessionFixture {

  import org.apache.spark.sql.{DataFrame, Row}
  import org.apache.spark.sql.types._

  private def corpus(freqs: Map[String, Int]): DataFrame = {
    // one doc per occurrence — doc structure is irrelevant to the census
    val toks = freqs.toSeq.flatMap { case (t, n) => Seq.fill(n)(t) }
    val schema = StructType(Seq(StructField("toks", ArrayType(StringType))))
    spark.createDataFrame(
      spark.sparkContext.parallelize(toks.map(t => Row(Seq(t))), 4), schema)
  }

  private def run(freqs: Map[String, Int], limit: Int = 500): (Long, Long) = {
    val r = CorpusOps.zipfSlope(corpus(freqs), col("toks"), limit).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  /** Scalar twin of the operator's exact integer pipeline. */
  private def reference(freqs: Map[String, Int], limit: Int): (Long, Long) = {
    def mu(v: Double): Long =
      (BigDecimal(math.log(v)).setScale(6, BigDecimal.RoundingMode.HALF_UP) *
        1000000).toLongExact
    val ranked = freqs.toSeq.map { case (t, n) => (n.toLong, t) }
      .sortBy { case (n, t) => (-n, t) }.take(limit).zipWithIndex
      .map { case ((n, _), i) => (mu((i + 1).toDouble), mu(n.toDouble)) }
    val n = BigInt(ranked.size)
    val sx = BigInt(ranked.map(_._1).sum)
    val sy = BigInt(ranked.map(_._2).sum)
    val sxy = BigInt(ranked.map(p => p._1 * p._2).sum)
    val sxx = BigInt(ranked.map(p => p._1 * p._1).sum)
    val num = BigInt(1000000) * (sx * sy - n * sxy)
    val den = n * sxx - sx * sx
    (n.toLong, (num / den).toLong)
  }

  test("bit-parity with the scalar reference on an irregular census") {
    val freqs = Map("a" -> 977, "b" -> 310, "c" -> 299, "d" -> 120,
      "e" -> 120, "f" -> 45, "g" -> 17, "h" -> 17, "i" -> 5, "j" -> 1)
    assert(run(freqs) === reference(freqs, 500))
  }

  test("freq ~ 1/rank lands near slope -1; uniform lands at 0") {
    val zipf = (1 to 50).map(r => s"t$r" -> (100000 / r)).toMap
    val (n, neg) = run(zipf)
    assert(n === 50L)
    // quantized-rank harmonic series: slope within 2% of -1
    assert(math.abs(neg - 1000000L) < 20000L, s"neg_slope_mu was $neg")
    val (_, flat) = run((1 to 40).map(r => s"u$r" -> 7).toMap)
    assert(flat === 0L)
  }

  test("tied frequencies cannot move the fit") {
    // 6 terms, three tie groups; permuting names permutes rank order
    // within ties but the slope must be identical
    val a = Map("aa" -> 90, "ab" -> 90, "b" -> 30, "c" -> 30, "d" -> 10,
      "e" -> 10)
    val b = Map("zz" -> 90, "zy" -> 90, "y" -> 30, "x" -> 30, "w" -> 10,
      "v" -> 10)
    assert(run(a)._2 === run(b)._2)
  }
}
